"""A/B: slab-bucketed interval containment join vs the naive range join.

The operator under test (operators/temporal.py interval_point_join)
claims the slab formulation avoids the nested-loop plan a naive
``ON key AND s <= t AND t <= e`` join degenerates to. This microbench
measures both on the same synthetic spans/points at
``$SPARK_GRAFT_SF_DIR`` (default sf0.1) and prints one JSON line:

    {"slab_sec": ..., "naive_sec": ..., "rows": ..., "speedup": ...}

Both sides are materialized through the noop sink (full-column
materialization; count() would let Catalyst prune the join payload).
Result parity is asserted before timing. The naive side is labeled a
BASELINE — it is the shape the operator exists to avoid.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from ophois_spark.operators.temporal import interval_point_join
    from ophois_spark.session import get_spark

    spark = get_spark(
        "bench-interval", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    spans = e.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("span_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s_us"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + (F.col("event_id") % 30 + 1) * F.lit(60 * 1000000).cast("long")
        ).alias("e_us"),
    )
    points = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
    )
    spans.persist().count()
    points.persist().count()

    slab = interval_point_join(spans, points, "user_id", 600 * 1000000).select(
        "user_id", "span_id", "click_id", "t_us"
    )
    naive = (
        spans.alias("s")
        .join(
            points.alias("p"),
            (F.col("s.user_id") == F.col("p.user_id"))
            & (F.col("p.t_us") >= F.col("s.s_us"))
            & (F.col("p.t_us") <= F.col("s.e_us")),
        )
        .select(F.col("s.user_id"), "span_id", "click_id", "t_us")
    )

    # parity before timing
    n_slab = slab.count()
    n_naive = naive.count()
    assert n_slab == n_naive, (n_slab, n_naive)
    assert slab.exceptAll(naive).count() == 0

    def run(df) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    t_slab = run(slab)
    t_naive = run(naive)
    plan = slab._jdf.queryExecution().executedPlan().toString()
    out = {
        "slab_sec": round(t_slab, 3),
        "naive_sec": round(t_naive, 3),
        "rows": n_slab,
        "speedup": round(t_naive / t_slab, 2) if t_slab > 0 else None,
        "slab_plan_has_nested_loop": "BroadcastNestedLoopJoin" in plan,
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
