"""Graph metrics as aggregations (reference src/metrics.rs).

Every metric is a tiny shuffle-light aggregation; the reference writes
them as text files (src/metrics.rs:8-24,69-75) — the engine returns
DataFrames so callers compose, and the snapshot layer records them as
per-stage lineage metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ophois_spark.operators.graph import StreetGraph


def order_size(g: StreetGraph) -> DataFrame:
    """(n_nodes, n_links) — reference ``"{nodes} {links/2}"``
    (src/metrics.rs:55-57); canonical edges are already the /2 form."""
    n = g.nodes.select(F.count(F.lit(1)).alias("n_nodes"))
    m = g.edges.select(F.count(F.lit(1)).alias("n_links"))
    return n.crossJoin(m)


def degree_distribution(g: StreetGraph) -> DataFrame:
    """degree → node count (src/metrics.rs:26-33), incl. degree 0."""
    return (
        g.degrees()
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("degree")
    )


def length_distribution(g: StreetGraph) -> DataFrame:
    """floor(metres) → link count over canonical links (src/metrics.rs:35-53)."""
    return (
        g.edges_with_coords()
        .select(F.floor("dist_m").cast("int").alias("length_m"))
        .groupBy("length_m")
        .agg(F.count(F.lit(1)).alias("n_links"))
        .orderBy("length_m")
    )


def distribution_lines(dist: DataFrame, key: str, val: str) -> list[str]:
    """Sorted ``"k v"`` lines (reference sort_and_stringify,
    src/metrics.rs:59-67) — driver-side, distributions are tiny."""
    return [f"{r[key]} {r[val]}" for r in dist.orderBy(key).collect()]
