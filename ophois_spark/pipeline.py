"""End-to-end pipelines mirroring the reference CLI entry points.

``simplify`` = the reference's main query (src/main.rs:66-74):
largest component → remove degree-2 chains → contract under-delta
nodes → contract under-delta links, then metrics.

``discretize_pipeline`` = src/main.rs:75-80.

Each stage optionally commits an Iceberg-style snapshot, making the
whole job resumable from the last completed stage with per-partition
lineage (north_rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ophois_spark.operators.components import largest_component
from ophois_spark.operators.contraction import (
    remove_degree_two_nodes,
    remove_under_delta_links,
    remove_under_delta_nodes,
)
from ophois_spark.operators.discretize import discretize
from ophois_spark.operators.extract import graph_from_pages
from ophois_spark.operators.graph import StreetGraph
from ophois_spark.operators.metrics import (
    degree_distribution,
    distribution_lines,
    length_distribution,
    order_size,
)
from ophois_spark.plans.snapshots import SnapshotLog


def graph_metrics(g: StreetGraph) -> dict:
    row = order_size(g).collect()[0]
    return {
        "order_size": f"{row['n_nodes']} {row['n_links']}",
        "degrees": distribution_lines(degree_distribution(g), "degree", "n_nodes"),
        "lengths": distribution_lines(length_distribution(g), "length_m", "n_links"),
    }


def _staged(
    spark: SparkSession, log: SnapshotLog | None, stage: str, fn, g_fn_input=None
) -> StreetGraph:
    if log is None:
        # no snapshot log: cut lineage in-session instead — the next
        # stage (and the 3-way metrics fan-out) reads the materialized
        # relations rather than replaying this stage's joins per
        # consumer (the committed-parquet path below gets the same cut
        # from load_tables)
        return fn().checkpoint()
    tables = log.run_stage(
        spark,
        stage,
        lambda: (lambda g: {"nodes": g.nodes, "edges": g.edges})(fn()),
    )
    return StreetGraph(tables["nodes"], tables["edges"])


def simplify(
    spark: SparkSession,
    g: StreetGraph,
    delta: float,
    snapshot_root: str | None = None,
) -> tuple[StreetGraph, dict]:
    """The reference's ``ophois simplify --delta D`` as staged DataFrame
    transforms; resumable per stage when ``snapshot_root`` is given."""
    log = SnapshotLog(snapshot_root) if snapshot_root else None
    g = _staged(spark, log, "largest_component", lambda: largest_component(g))
    g = _staged(spark, log, "remove_degree_two", lambda: remove_degree_two_nodes(g))
    g = _staged(
        spark, log, f"under_delta_nodes={delta}", lambda: remove_under_delta_nodes(g, delta)
    )
    g = _staged(
        spark, log, f"under_delta_links={delta}", lambda: remove_under_delta_links(g, delta)
    )
    metrics = graph_metrics(g)
    if log is not None:
        log.commit(f"simplify_metrics={delta}", {}, metrics)
    return g, metrics


def discretize_pipeline(
    spark: SparkSession,
    g: StreetGraph,
    delta: float,
    snapshot_root: str | None = None,
) -> tuple[StreetGraph, dict]:
    log = SnapshotLog(snapshot_root) if snapshot_root else None
    g = _staged(spark, log, f"discretize={delta}", lambda: discretize(g, delta))
    metrics = graph_metrics(g)
    if log is not None:
        log.commit(f"discretize_metrics={delta}", {}, metrics)
    return g, metrics


def ingest(
    spark: SparkSession,
    pages: DataFrame,
    snapshot_root: str | None = None,
    lang: str | None = "en",
) -> StreetGraph:
    """pages table → deduplicated StreetGraph (snapshot-committed)."""
    if lang is not None:
        pages = pages.filter(pages["lang"] == lang)

    def build():
        return graph_from_pages(pages)

    log = SnapshotLog(snapshot_root) if snapshot_root else None
    return _staged(spark, log, "ingest", build)
