"""Connected components + largest-component filter.

The reference runs a sequential BFS from every unvisited node and keeps
the strictly largest component (src/heuristics.rs:10-58; ties broken by
nondeterministic HashMap order — the engine breaks ties on the smallest
component label, and the fixtures have a unique maximum).

Spark-native algorithm: iterative min-label propagation with pointer
jumping (label := label(label)) — each round is two shuffles; the
flattening step makes convergence ~O(log diameter) instead of
O(diameter), which is what survives street graphs with long chains at
10^12 scale. Lineage is truncated per round with localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ophois_spark.operators.graph import StreetGraph


def connected_components(g: StreetGraph, max_iter: int = 60) -> DataFrame:
    """→ labels DataFrame (id, comp) where comp = min node id in component."""
    labels = g.nodes.select("id", F.col("id").alias("comp")).localCheckpoint(eager=True)
    edges_bi = g.edges.select("src", "dst").unionByName(
        g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # 1. neighbor-min: the smallest label among each node's neighbors
        neigh_min = (
            edges_bi.join(
                labels.select(F.col("id").alias("dst"), F.col("comp").alias("ncomp")), "dst"
            )
            .groupBy("src")
            .agg(F.min("ncomp").alias("nmin"))
            .withColumnRenamed("src", "id")
        )
        stepped = labels.join(neigh_min, "id", "left").select(
            "id",
            F.least("comp", F.coalesce("nmin", "comp")).alias("comp"),
            F.col("comp").alias("prev"),
        )
        # 2. pointer jumping: comp := comp(comp) (labels are node ids)
        flat = (
            stepped.alias("s")
            .join(
                labels.select(F.col("id").alias("comp"), F.col("comp").alias("comp2")).alias("m"),
                "comp",
                "left",
            )
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("comp2", "comp")).alias("comp"),
                "prev",
            )
        )
        flat = flat.localCheckpoint(eager=True)
        changed = flat.filter(F.col("comp") != F.col("prev")).count()
        labels = flat.select("id", "comp")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def component_size_distribution(labels: DataFrame) -> DataFrame:
    """size → number of components (the reference computes and discards
    this, src/heuristics.rs:13,45-47 — the engine keeps it, it's free)."""
    return (
        labels.groupBy("comp")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_components"))
        .orderBy("size")
    )


def largest_component(g: StreetGraph, labels: DataFrame | None = None) -> StreetGraph:
    """Keep the largest component (ties → smallest component label).

    Pass precomputed ``labels`` (id, comp) to reuse a cached
    propagation result; they MUST come from ``connected_components`` on
    the same graph."""
    if labels is None:
        labels = connected_components(g)
    sizes = labels.groupBy("comp").agg(F.count(F.lit(1)).alias("size"))
    winner = sizes.orderBy(F.desc("size"), F.asc("comp")).limit(1).select("comp")
    keep = labels.join(F.broadcast(winner), "comp", "left_semi").select("id")
    nodes = g.nodes.join(keep, "id", "left_semi")
    # edges never cross components: filtering on src suffices
    edges = g.edges.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
    return StreetGraph(nodes, edges)
