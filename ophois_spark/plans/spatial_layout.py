"""Cell-clustered parquet layout: the 100 TB geospatial table trick.

A bbox query over an UNCLUSTERED table scans everything — parquet
min/max stats can't prune when every file holds points from all over
the map. Clustering the table by its spatial cell key at write time
gives each file/row-group a tight cell range, so a bbox query reads
only the files whose range intersects the box: read volume scales with
the QUERY's area, not the TABLE's size. This is what Iceberg/Delta
deployments do with Z-order clustering; here the engine's own cell id
(kernels/cells.py: ``(res << 58) | (ix << 29) | iy``) is the sort key.

Why this key range-decomposes exactly: ids are x-major — for a fixed
``ix``, the id is monotone in ``iy``. A bbox is an (ix-range ×
iy-range) rectangle, so its cell set is EXACTLY the union of one
contiguous id range per covered ``ix`` column:

    [(res<<58)|(ix<<29)|iy_lo ,  (res<<58)|(ix<<29)|iy_hi]   per ix

— O(width-in-cells) ranges with zero false ids between lo and hi of
each range (a Z/Hilbert curve needs recursive decomposition and still
emits imperfect ranges; the x-major key trades slightly coarser
1-D locality for EXACT per-column ranges). Pick the layout ``res``
coarse enough that a typical query box covers few columns (res 10-14);
the exact lat/lon predicate downstream owns the boundary.

Scale shape: the one-time clustering write is a single range
repartition + in-partition sort (the same cost class as any table
write); every subsequent bbox read prunes at three levels — file
(planner min/max), row group (parquet reader), and page — because the
sort makes cell ranges per physical unit tight and disjoint-ish. The
pruning predicate is an OR of closed BETWEENs on one int64 column:
pushed down verbatim (``PushedFilters: [Or(And(GreaterThanOrEqual(...``),
never evaluated in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ophois_spark.kernels.cells import MAX_RES, RES_BITS, X_BITS


def with_cell_key(df: DataFrame, res: int, lat: str = "lat_d", lon: str = "lon_d") -> DataFrame:
    """Attach the int64 layout key at ``res`` (pure Column arithmetic —
    the same encode the gated cell queries use)."""
    from ophois_spark.functions import cell_expr

    return df.withColumn("cell", cell_expr(F.col(lon), F.col(lat), res))


def write_cell_clustered(
    df: DataFrame,
    path: str,
    res: int,
    n_files: int = 32,
    lat: str = "lat_d",
    lon: str = "lon_d",
) -> None:
    """Write ``df`` as parquet range-clustered by its cell key: a range
    repartition on ``cell`` (each output file owns a contiguous slice
    of the key space) + an in-partition sort (tight row-group stats
    WITHIN each file). ``n_files`` sizes the layout; at production
    scale it's whatever keeps files ~128 MB-1 GB."""
    keyed = with_cell_key(df, res, lat, lon)
    (
        keyed.repartitionByRange(n_files, "cell")
        .sortWithinPartitions("cell")
        .write.mode("overwrite")
        .parquet(path)
    )


def bbox_cell_ranges(
    lat_min: float, lat_max: float, lon_min: float, lon_max: float, res: int
) -> list[tuple[int, int]]:
    """EXACT contiguous cell-id ranges covering the bbox at ``res`` —
    one closed [lo, hi] per covered ix column (see module docstring).
    The ranges contain every cell intersecting the box and no others;
    the exact coordinate filter downstream owns the boundary rows.
    Antimeridian-crossing boxes (lon_min > lon_max) wrap in x."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    n = 1 << res
    import math

    def gx(lon: float) -> int:
        return int(math.floor((lon + 180.0) / 360.0 * n)) % n

    def gy(lat: float) -> int:
        return min(max(int(math.floor((lat + 90.0) / 180.0 * n)), 0), n - 1)

    iy0, iy1 = gy(lat_min), gy(lat_max)
    ix0, ix1 = gx(lon_min), gx(lon_max)
    cols = (
        list(range(ix0, ix1 + 1))
        if ix0 <= ix1
        else list(range(ix0, n)) + list(range(0, ix1 + 1))  # wrap
    )
    base = res << RES_BITS
    return [
        (base | (ix << X_BITS) | iy0, base | (ix << X_BITS) | iy1) for ix in cols
    ]


def read_bbox_clustered(
    spark: SparkSession,
    path: str,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    res: int,
) -> DataFrame:
    """Bbox read over a cell-clustered table: OR-of-BETWEENs on the
    layout key (pushed to the parquet scan — this is what prunes files
    and row groups) + the exact coordinate predicate (owns the
    boundary). Result rows are identical to a full-scan coordinate
    filter; only the read volume differs."""
    df = spark.read.parquet(path)
    ranges = bbox_cell_ranges(lat_min, lat_max, lon_min, lon_max, res)
    pred = None
    for lo, hi in ranges:
        clause = F.col("cell").between(F.lit(lo), F.lit(hi))
        pred = clause if pred is None else (pred | clause)
    return df.filter(pred).filter(
        (F.col("lat_d") >= lat_min)
        & (F.col("lat_d") <= lat_max)
        & (F.col("lon_d") >= lon_min)
        & (F.col("lon_d") <= lon_max)
    )


def file_cell_stats(path: str) -> list[tuple[str, int, int]]:
    """Per-file (name, min_cell, max_cell) from the parquet footers —
    the physical property pruning relies on, read back for evidence
    (tests assert near-disjoint tight ranges; bench reports the
    prunable fraction for a query box)."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["cell"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            out.append((name, min(mins), max(maxs)))
    return out
