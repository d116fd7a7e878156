"""Cell-clustered parquet layout: exact ranges, pushdown, pruning."""

import numpy as np
from pyspark.sql import functions as F

from ophois_spark.kernels.cells import RES_BITS, X_BITS, cell_id
from ophois_spark.plans.spatial_layout import (
    bbox_cell_ranges,
    file_cell_stats,
    read_bbox_clustered,
    write_cell_clustered,
)
from ophois_spark.queries import derived_nodes

SF = "/root/testdata/sf0.001"
RES = 18


def test_bbox_cell_ranges_exact():
    """The per-column ranges contain EXACTLY the cells whose (ix, iy)
    rectangle intersects the box — no false ids inside any range."""
    res = 6
    n = 1 << res
    lat_min, lat_max, lon_min, lon_max = 45.0, 46.2, 4.6, 5.3
    ranges = bbox_cell_ranges(lat_min, lat_max, lon_min, lon_max, res)
    want = set()
    for ix in range(n):
        for iy in range(n):
            c = (res << RES_BITS) | (ix << X_BITS) | iy
            # cell intersects box iff its index lies in the index ranges
            if (
                int(np.floor((lon_min + 180) / 360 * n)) <= ix <= int(np.floor((lon_max + 180) / 360 * n))
                and int(np.floor((lat_min + 90) / 180 * n)) <= iy <= int(np.floor((lat_max + 90) / 180 * n))
            ):
                want.add(c)
    got = set()
    for lo, hi in ranges:
        assert (lo >> X_BITS) == (hi >> X_BITS)  # one ix column per range
        got |= set(range(lo, hi + 1))
    assert got == want


def test_bbox_cell_ranges_antimeridian():
    ranges = bbox_cell_ranges(-10.0, 10.0, 170.0, -170.0, 4)
    cols = sorted((lo >> X_BITS) & ((1 << X_BITS) - 1) for lo, _ in ranges)
    n = 1 << 4
    assert cols[0] == 0 and cols[-1] == n - 1  # wraps through the seam


def test_clustered_read_matches_full_scan(spark, tmp_path):
    nodes = derived_nodes(spark, SF).select("id", "lat_d", "lon_d")
    path = str(tmp_path / "nodes_clustered")
    write_cell_clustered(nodes, path, RES, n_files=8)
    box = dict(lat_min=45.001, lat_max=45.004, lon_min=5.001, lon_max=5.004)
    got = read_bbox_clustered(spark, path, res=RES, **box)
    want = nodes.filter(
        (F.col("lat_d") >= box["lat_min"]) & (F.col("lat_d") <= box["lat_max"])
        & (F.col("lon_d") >= box["lon_min"]) & (F.col("lon_d") <= box["lon_max"])
    )
    assert sorted(r["id"] for r in got.collect()) == sorted(
        r["id"] for r in want.collect()
    )
    assert got.count() > 0  # the box actually selects something
    # the BETWEEN ranges reach the parquet scan as pushed filters
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(cell" in plan or "Or(And(" in plan


def test_clustered_layout_prunes(spark, tmp_path):
    """The written files carry tight, totally-ordered cell ranges, and
    for a small query box most files are out-of-range (file-level
    pruning evidence straight from the parquet footers — no Spark
    internals). The unclustered twin cannot prune at all: every file's
    range intersects the box."""
    nodes = derived_nodes(spark, SF).select("id", "lat_d", "lon_d")
    path = str(tmp_path / "clustered")
    write_cell_clustered(nodes, path, RES, n_files=8)
    stats = file_cell_stats(path)
    assert len(stats) >= 6
    # range-partitioned: file ranges are disjoint and ordered
    spans = sorted((lo, hi) for _, lo, hi in stats)
    for (_, h1), (l2, _) in zip(spans, spans[1:]):
        assert l2 >= h1  # boundary value may be shared, never overlap
    box = dict(lat_min=45.001, lat_max=45.004, lon_min=5.001, lon_max=5.004)
    ranges = bbox_cell_ranges(res=RES, **box)
    def hits(lo, hi):
        return any(not (hi < rlo or lo > rhi) for rlo, rhi in ranges)
    pruned = [name for name, lo, hi in stats if not hits(lo, hi)]
    assert len(pruned) >= len(stats) // 2  # most files skippable
    # unclustered control: same rows, shuffled — nothing prunable
    upath = str(tmp_path / "unclustered")
    from ophois_spark.plans.spatial_layout import with_cell_key

    (
        with_cell_key(nodes, RES)
        .repartition(8, F.col("id"))
        .write.mode("overwrite")
        .parquet(upath)
    )
    ustats = file_cell_stats(upath)
    assert len(ustats) >= 6
    assert all(hits(lo, hi) for _, lo, hi in ustats)


def test_cell_key_matches_kernel(spark):
    nodes = derived_nodes(spark, SF).select("id", "lat_d", "lon_d").limit(200)
    from ophois_spark.plans.spatial_layout import with_cell_key

    rows = with_cell_key(nodes, RES).collect()
    for r in rows:
        assert r["cell"] == int(cell_id(r["lon_d"], r["lat_d"], RES))
