"""A/B: grid-cover point-to-edge snapping vs the brute-force cross join.

The operator under test (operators/spatial.py snap_points_to_edges)
bounds map-matching candidates with a radius-dilated bbox grid cover;
the baseline is the all-pairs cross join the oracle uses. Row-count
parity is asserted on BOTH legs before timing (full value parity is
pinned by the trace_snap oracle gate and tests/test_spatial.py); both
sides materialize through the noop sink under the SAME protocol:
one count() (parity + warm-up) then best-of-2 timed runs, identical
for operator and baseline, so neither arm pays JVM/codegen cold-start
the other doesn't.

Two legs:
- sf leg: the registry overlay at $SPARK_GRAFT_SF_DIR scale
  (customer-derived segments x every-4th-order points);
- dense leg: 50k points x 5k SHORT segments in the same city window
  (the 100 TB-relevant shape: segments a few x smaller than grid
  cells) -> brute force evaluates 2.5e8 point-segment distances, the
  grid join's candidate set stays ~1e7.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from ophois_spark.operators.spatial import snap_points_to_edges
    from ophois_spark.session import get_spark

    spark = get_spark(
        "bench-snap", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    # the brute BASELINE's nested-loop stream side is a few MB of
    # points; AQE would coalesce it to ONE partition and serialize the
    # whole cross product onto one core -- keep the fan-out honest
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    import ophois_spark.queries as Q

    def brute(points, segments, radius_m, k):
        # identical math, candidate set = ALL pairs (the oracle's shape)
        from pyspark.sql import Window

        # broadcast the SEGMENT side explicitly: left alone Spark broadcasts
        # whichever side is smaller (often the points), which makes the
        # repartition(64) moot and streams the whole cross product through
        # the segment side's single cached partition
        j = points.repartition(64).crossJoin(F.broadcast(segments))
        cosq = F.cos(F.radians(F.col("lat_d")))
        M = F.lit(__import__("ophois_spark.operators.spatial", fromlist=["M_PER_DEG"]).M_PER_DEG)
        ax = (F.col("alon") - F.col("lon_d")) * cosq * M
        ay = (F.col("alat") - F.col("lat_d")) * M
        bx = (F.col("blon") - F.col("lon_d")) * cosq * M
        by = (F.col("blat") - F.col("lat_d")) * M
        j = (
            j.withColumn("_ax", ax).withColumn("_ay", ay)
            .withColumn("_dx", bx - ax).withColumn("_dy", by - ay)
        )
        len2 = F.col("_dx") * F.col("_dx") + F.col("_dy") * F.col("_dy")
        dot = -(F.col("_ax") * F.col("_dx") + F.col("_ay") * F.col("_dy"))
        t = F.when(len2 > 0, F.greatest(F.lit(0.0), F.least(F.lit(1.0), dot / len2))).otherwise(F.lit(0.0))
        cx = F.col("_ax") + t * F.col("_dx")
        cy = F.col("_ay") + t * F.col("_dy")
        d = F.round(F.sqrt(cx * cx + cy * cy), 6)
        # rand()*0.0 is a value no-op but marks dist_m non-deterministic,
        # so Catalyst cannot push the radius filter into the BNLJ join
        # condition (which Spark evaluates interpreted, row-at-a-time —
        # measured 240s vs 88s for the same pair volume). The filter
        # stays a codegen'd post-join stage; the baseline gets its fair
        # vectorized execution.
        d = d + F.rand(7) * F.lit(0.0)
        return (
            j.withColumn("dist_m", d)
            .filter(F.col("dist_m") <= radius_m)
            .withColumn("rank", F.row_number().over(Window.partitionBy("qid").orderBy("dist_m", "edge_id")))
            .filter(F.col("rank") <= k)
            .select("qid", F.col("rank").cast("int").alias("rank"), "edge_id", "dist_m")
        )

    def run(df) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    # -- sf leg: the registry overlay at sf scale
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    ck = F.col("c_custkey")
    alat = F.lit(45.0) + (ck % 200).cast("double") * F.lit(1e-4)
    alon = F.lit(5.0) + ((ck * 7) % 200).cast("double") * F.lit(1e-4)
    segments = c.select(
        ck.cast("long").alias("edge_id"), alat.alias("alat"), alon.alias("alon"),
        (alat + ((ck * 3) % 5 - 2).cast("double") * F.lit(1e-4)).alias("blat"),
        (alon + ((ck * 11) % 5 - 2).cast("double") * F.lit(1e-4)).alias("blon"),
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(F.col("o_orderkey") % 16 == 0)
    ok, oc = F.col("o_orderkey"), F.col("o_custkey")
    points = o.select(
        ok.cast("long").alias("qid"),
        (F.lit(45.0) + (oc % 200).cast("double") * F.lit(1e-4)
         + (ok % 21 - 10).cast("double") * F.lit(2e-6)).alias("lat_d"),
        (F.lit(5.0) + ((oc * 7) % 200).cast("double") * F.lit(1e-4)
         + ((ok * 3) % 21 - 10).cast("double") * F.lit(2e-6)).alias("lon_d"),
    )
    segments.persist().count()
    points.persist().count()
    grid = snap_points_to_edges(points, segments, Q.SNAP_RADIUS_M, Q.SNAP_GRID_DEG, Q.SNAP_K)
    base = brute(points, segments, Q.SNAP_RADIUS_M, Q.SNAP_K)
    # count = parity gate AND the symmetric warm-up for both arms
    n_grid = grid.count()
    assert n_grid == base.count()
    t_grid, t_base = run(grid), run(base)

    # -- dense leg: short segments, big volumes
    segs2 = spark.range(5_000).select(
        F.col("id").alias("edge_id"),
        (F.lit(45.0) + ((F.col("id") * 37) % 2000).cast("double") * F.lit(1e-5)).alias("alat"),
        (F.lit(5.0) + ((F.col("id") * 59) % 2000).cast("double") * F.lit(1e-5)).alias("alon"),
    ).select(
        "edge_id", "alat", "alon",
        (F.col("alat") + ((F.col("edge_id") % 5) - 2).cast("double") * F.lit(2e-5)).alias("blat"),
        (F.col("alon") + ((F.col("edge_id") % 7) - 3).cast("double") * F.lit(2e-5)).alias("blon"),
    )
    pts2 = spark.range(50_000).select(
        F.col("id").alias("qid"),
        (F.lit(45.0) + ((F.col("id") * 11) % 2000).cast("double") * F.lit(1e-5)
         + ((F.col("id") % 13) - 6).cast("double") * F.lit(1e-6)).alias("lat_d"),
        (F.lit(5.0) + ((F.col("id") * 17) % 2000).cast("double") * F.lit(1e-5)
         + ((F.col("id") % 11) - 5).cast("double") * F.lit(1e-6)).alias("lon_d"),
    )
    segs2.persist().count()
    pts2.persist().count()
    grid2 = snap_points_to_edges(pts2, segs2, 25.0, 0.001, 1)
    base2 = brute(pts2, segs2, 25.0, 1)
    n2 = grid2.count()
    assert n2 == base2.count()
    t_grid2, t_base2 = run(grid2), run(base2)

    out = {
        "sf_grid_sec": round(t_grid, 3),
        "sf_brute_sec": round(t_base, 3),
        "sf_rows": n_grid,
        "dense_grid_sec": round(t_grid2, 3),
        "dense_brute_sec": round(t_base2, 3),
        "dense_rows": n2,
        "dense_speedup": round(t_base2 / t_grid2, 2) if t_grid2 > 0 else None,
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
