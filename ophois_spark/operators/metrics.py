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


def write_metrics(g: StreetGraph, param: str, directory: str = "./ophois_metrics") -> dict[str, str]:
    """File-sink parity with the reference's ``metrics`` entry point
    (src/metrics.rs:8-24,69-75): writes ``{directory}/order_size_{param}``,
    ``degrees_{param}`` and ``lengths_{param}``.

    ``order_size`` is the single line ``"{nodes} {links}"`` (canonical
    edges already ARE the reference's ``links/2``); the distributions
    are newline-terminated ``"k v"`` lines sorted by key. The
    aggregations run distributed; only the tiny final distributions are
    collected for the driver-side text write (same shape as the
    reference's stdout sink). Returns {file_name: path}.
    """
    import os

    os.makedirs(directory, exist_ok=True)
    n_nodes, n_links = g.counts()
    payloads = {
        f"order_size_{param}": f"{n_nodes} {n_links}",
        f"degrees_{param}": "".join(
            line + "\n"
            for line in distribution_lines(degree_distribution(g), "degree", "n_nodes")
        ),
        f"lengths_{param}": "".join(
            line + "\n"
            for line in distribution_lines(length_distribution(g), "length_m", "n_links")
        ),
    }
    out = {}
    for name, payload in payloads.items():
        path = os.path.join(directory, name)
        with open(path, "w") as f:
            f.write(payload)
        out[name] = path
    return out
