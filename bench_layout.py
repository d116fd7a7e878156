"""A/B: cell-clustered parquet layout vs unclustered for bbox reads.

What the layout buys (plans/spatial_layout.py): range-clustering a
point table by its spatial cell key gives every file/row-group a tight
min/max cell range, so a bbox query's OR-of-BETWEENs prunes at the
file and row-group level — read volume scales with the query box, not
the table. The unclustered twin holds the SAME rows shuffled by id:
every row group's range spans the whole map and nothing prunes.

Protocol: both tables written once outside the timers (the clustering
write is a one-time layout cost, reported separately for honesty);
result parity asserted; reads timed best-of-2 through the noop sink.
Footer stats give the prunable-fraction numbers directly from the
parquet metadata — independent of Spark's scan metrics.

Honesty note at this scale: the whole table is a few MB and fully
OS-cached, so wall-clock deltas are bounded by decode CPU, not I/O —
the prunable-row-group fraction is the number that projects to 100 TB
(pruned row groups are never fetched at all on a real object store).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from ophois_spark.plans.spatial_layout import (
        bbox_cell_ranges,
        file_cell_stats,
        read_bbox_clustered,
        with_cell_key,
        write_cell_clustered,
    )
    from ophois_spark.queries import derived_nodes
    from ophois_spark.session import get_spark

    spark = get_spark(
        "bench-layout", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    res = 18
    nodes = derived_nodes(spark, sf_dir).select("id", "lat_d", "lon_d")
    # replicate to a size where row-group pruning is observable
    # (sf0.1 nodes alone are one row group); ids stay unique per copy
    reps = int(os.environ.get("OPHOIS_LAYOUT_REPS", "64"))
    big = nodes.crossJoin(
        spark.range(reps).select(F.col("id").alias("rep"))
    ).select(
        F.concat_ws("#", "id", "rep").alias("id"), "lat_d", "lon_d"
    )

    root = tempfile.mkdtemp(prefix="ophois_layout_")
    cpath, upath = f"{root}/clustered", f"{root}/unclustered"
    t0 = time.perf_counter()
    write_cell_clustered(big, cpath, res, n_files=64)
    t_cluster_write = time.perf_counter() - t0
    t0 = time.perf_counter()
    (
        with_cell_key(big, res)
        .repartition(64, F.col("id"))
        .write.mode("overwrite")
        .parquet(upath)
    )
    t_plain_write = time.perf_counter() - t0

    # a box ~the city-core: small fraction of the map extent
    box = dict(lat_min=45.02, lat_max=45.03, lon_min=5.02, lon_max=5.03)
    ranges = bbox_cell_ranges(res=res, **box)

    def clustered():
        return read_bbox_clustered(spark, cpath, res=res, **box)

    def unclustered():
        df = spark.read.parquet(upath)
        pred = None
        for lo, hi in ranges:
            cl = F.col("cell").between(F.lit(lo), F.lit(hi))
            pred = cl if pred is None else (pred | cl)
        return df.filter(pred).filter(
            (F.col("lat_d") >= box["lat_min"]) & (F.col("lat_d") <= box["lat_max"])
            & (F.col("lon_d") >= box["lon_min"]) & (F.col("lon_d") <= box["lon_max"])
        )

    n_c, n_u = clustered().count(), unclustered().count()
    assert n_c == n_u, (n_c, n_u)

    def mat(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    def best2(fn) -> float:
        t0 = time.perf_counter()
        mat(fn())
        t1 = time.perf_counter()
        mat(fn())
        t2 = time.perf_counter()
        return round(min(t1 - t0, t2 - t1), 3)

    t_c, t_u = best2(clustered), best2(unclustered)

    def prunable(path: str) -> float:
        stats = file_cell_stats(path)
        def hits(lo, hi):
            return any(not (hi < rlo or lo > rhi) for rlo, rhi in ranges)
        return round(
            sum(1 for _, lo, hi in stats if not hits(lo, hi)) / max(1, len(stats)), 4
        )

    out = {
        "metric": "bbox read: cell-clustered vs unclustered layout",
        "sf": sf_dir,
        "rows_table": big.count(),
        "rows_box": n_c,
        "clustered_read_s": t_c,
        "unclustered_read_s": t_u,
        "speedup": round(t_u / t_c, 2) if t_c > 0 else None,
        "file_prunable_frac_clustered": prunable(cpath),
        "file_prunable_frac_unclustered": prunable(upath),
        "cluster_write_s": round(t_cluster_write, 3),
        "plain_write_s": round(t_plain_write, 3),
        "cpus": cpus,
    }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
