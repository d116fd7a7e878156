"""A/B: slab-bucketed interval containment join vs the naive range join.

The operator under test (operators/temporal.py interval_point_join)
bounds the candidate set of a containment join. What the naive
``ON key AND s <= t AND t <= e`` actually plans (measured here, not
assumed): WITH the equi-key Catalyst uses a hash join on the key and
evaluates the range as a residual condition over the PER-KEY CROSS
PRODUCT — cheap at moderate key cardinality, quadratic on hot keys;
with no key at all it is a pure broadcast nested loop. This microbench
measures the sf0.1 events leg (tiny; naive wins — reported honestly)
AND a hot-key leg (2 users, 1e10 naive pair evaluations) and prints
one JSON line with both.

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

    # -- scale leg: the events table at sf0.1 is tiny (98 pairs), and
    # with an equi-key present Catalyst plans the naive join as a hash
    # join on the key with the range as a residual condition -- fine
    # until keys are HOT: the per-key cross product is what explodes
    # (and with no key at all it degenerates to a pure nested loop).
    # Measure the hot-key case with SHORT spans (1 s in 60 s slabs, so
    # matches are rare and output volume doesn't mask the join cost):
    # 2 users, 1M points, 20k spans -> the naive key join evaluates
    # 1e10 (span, point) pairs; the slab join's candidate set is ~1e7.
    users = 2
    big_pt = spark.range(1_000_000).select(
        (F.col("id") % users).alias("user_id"),
        F.col("id").alias("click_id"),
        (((F.col("id") * 1_000_003) % 86_400) * 1_000_000).alias("t_us"),
    )
    big_iv = spark.range(20_000).select(
        (F.col("id") % users).alias("user_id"),
        F.col("id").alias("span_id"),
        (((F.col("id") * 104_729) % 86_399) * 1_000_000).alias("s_us"),
    ).withColumn("e_us", F.col("s_us") + 1_000_000)
    big_pt.persist().count()
    big_iv.persist().count()
    big_slab = interval_point_join(big_iv, big_pt, "user_id", 60_000_000)
    big_naive = big_iv.alias("s").join(
        big_pt.alias("p"),
        (F.col("s.user_id") == F.col("p.user_id"))
        & (F.col("p.t_us") >= F.col("s.s_us"))
        & (F.col("p.t_us") <= F.col("s.e_us")),
    )
    nb = big_slab.count()
    assert nb == big_naive.count()
    tb_slab = run(big_slab)
    tb_naive = run(big_naive)

    out = {
        "sf_slab_sec": round(t_slab, 3),
        "sf_naive_sec": round(t_naive, 3),
        "sf_rows": n_slab,
        "hot_slab_sec": round(tb_slab, 3),
        "hot_naive_sec": round(tb_naive, 3),
        "hot_rows": nb,
        "hot_speedup": round(tb_naive / tb_slab, 2) if tb_slab > 0 else None,
        "slab_plan_has_nested_loop": "BroadcastNestedLoopJoin" in plan,
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
