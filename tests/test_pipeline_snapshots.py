"""End-to-end simplify + snapshot/resume tests."""

import json
import os

from ophois_spark.operators.graph import StreetGraph
from ophois_spark.pipeline import graph_metrics, simplify
from ophois_spark.plans.snapshots import SnapshotLog
from ophois_spark.sources.graph_io import graph_from_tuples
from tests.fixtures import BFS_LINKS, BFS_NODES, CAILLES_LINKS, CAILLES_NODES


def test_simplify_end_to_end(spark, tmp_path):
    """Full reference pipeline on the BFS fixture graph (delta=10)."""
    g = graph_from_tuples(spark, BFS_NODES, BFS_LINKS)
    out, metrics = simplify(spark, g, 10.0)
    n, m = out.counts()
    assert n > 0 and m > 0
    # fixpoint: no remaining link under delta
    from pyspark.sql import functions as F

    assert out.edges_with_coords().filter(F.col("dist_m") < 10.0).count() == 0
    assert metrics["order_size"] == f"{n} {m}"


def test_snapshot_commit_and_lineage(spark, tmp_path):
    root = str(tmp_path / "snap")
    log = SnapshotLog(root)
    g = graph_from_tuples(spark, CAILLES_NODES, CAILLES_LINKS)
    meta = log.commit("ingest", {"nodes": g.nodes, "edges": g.edges}, {"k": 1})
    assert meta["id"] == 1 and meta["parent_id"] is None
    assert meta["tables"]["nodes"]["row_count"] == 26
    assert meta["tables"]["edges"]["row_count"] == 30
    assert sum(meta["tables"]["nodes"]["partition_row_counts"]) == 26
    # ancestry
    meta2 = log.commit("stage2", {"nodes": g.nodes}, {})
    assert meta2["parent_id"] == 1
    # metadata files are valid json on disk
    files = sorted(os.listdir(os.path.join(root, "metadata")))
    assert files == ["v000001.json", "v000002.json"]
    with open(os.path.join(root, "metadata", files[0])) as f:
        assert json.load(f)["stage"] == "ingest"


def test_simplify_resume_skips_completed_stages(spark, tmp_path):
    root = str(tmp_path / "snap")
    g = graph_from_tuples(spark, BFS_NODES, BFS_LINKS)
    out1, m1 = simplify(spark, g, 10.0, snapshot_root=root)
    log = SnapshotLog(root)
    n_snaps = len(log.snapshots())
    stages = [s["stage"] for s in log.snapshots()]
    assert "largest_component" in stages and f"under_delta_links=10.0" in stages

    # resume: pass a BROKEN graph — completed stages must be loaded from
    # snapshots, so the result is identical and nothing recomputes
    broken = StreetGraph(g.nodes.limit(0), g.edges.limit(0))
    out2, m2 = simplify(spark, broken, 10.0, snapshot_root=root)
    assert m2["order_size"] == m1["order_size"]
    assert sorted(m2["degrees"]) == sorted(m1["degrees"])
    # only the final metrics snapshot is re-committed
    assert len(SnapshotLog(root).snapshots()) == n_snaps + 1


def test_graph_metrics_shape(spark):
    g = graph_from_tuples(spark, CAILLES_NODES, CAILLES_LINKS)
    m = graph_metrics(g)
    assert m["order_size"] == "26 30"
    assert m["degrees"] == ["1 5", "2 12", "3 5", "4 4"]
    assert len(m["lengths"]) == 16
