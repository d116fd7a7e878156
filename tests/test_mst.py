"""Boruvka MSF: hand fixtures, a randomized cross-check against
Kruskal under the same (w, src, dst) total order (including weight
ties), and disconnected-forest coverage."""

import random

import pytest
from pyspark.sql import functions as F

from ophois_spark.operators.mst import minimum_spanning_forest


def _kruskal(ids, edges):
    """Kruskal under the (w, src, dst) lexicographic total order —
    yields the identical unique MSF Boruvka must produce."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, a, b in sorted((w, a, b) for a, b, w in edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return sorted(out)


def _run(spark, ids, edges):
    nodes = spark.createDataFrame([(i,) for i in ids], "id string")
    e = spark.createDataFrame(edges, "src string, dst string, w long")
    got = minimum_spanning_forest(nodes, e)
    return sorted((r["src"], r["dst"], r["w"]) for r in got.collect())


def test_mst_hand_fixture(spark):
    # triangle with a clear cheapest pair + pendant
    edges = [("a", "b", 1), ("b", "c", 2), ("a", "c", 3), ("c", "d", 5)]
    assert _run(spark, ["a", "b", "c", "d"], edges) == [
        ("a", "b", 1),
        ("b", "c", 2),
        ("c", "d", 5),
    ]


def test_mst_disconnected_forest_and_isolated(spark):
    edges = [("a", "b", 4), ("c", "d", 7)]
    got = _run(spark, ["a", "b", "c", "d", "e"], edges)
    assert got == [("a", "b", 4), ("c", "d", 7)]  # 'e' isolated, no edge


def test_mst_all_tied_weights(spark):
    # every weight equal: tie-break is purely (src, dst) lexicographic
    ids = [str(i) for i in range(6)]
    edges = [(a, b, 9) for a in ids for b in ids if a < b]
    assert _run(spark, ids, edges) == _kruskal(ids, edges)


@pytest.mark.slow
def test_mst_matches_kruskal_random(spark):
    random.seed(11)
    for _ in range(3):
        n = 40
        ids = [str(i) for i in range(n)]
        es = set()
        for _ in range(90):
            a, b = random.sample(range(n), 2)
            es.add((str(min(a, b)), str(max(a, b))))
        edges = [(a, b, random.randint(1, 15)) for a, b in es]  # heavy ties
        assert _run(spark, ids, edges) == _kruskal(ids, edges)


@pytest.mark.slow
def test_mst_street_graph_total_weight(spark):
    """Spanning-tree invariants on the derived street graph at sf0.001:
    |MSF| = |nodes| - #components, and every MSF edge is a real edge."""
    from ophois_spark.queries import QUERIES, derived_graph

    import os

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    msf = QUERIES["mst_edges"](spark, sf_dir)
    g = derived_graph(spark, sf_dir)
    n_nodes = g.nodes.count()
    from ophois_spark.operators.components import connected_components

    n_comps = connected_components(g).select("comp").distinct().count()
    assert msf.count() == n_nodes - n_comps
    extra = msf.join(g.edges.select("src", "dst"), ["src", "dst"], "left_anti")
    assert extra.count() == 0


def test_mst_no_edges_returns_empty_forest(spark):
    nodes = spark.createDataFrame([("a",), ("b",)], "id string")
    e = spark.createDataFrame([], "src string, dst string, w long")
    out = minimum_spanning_forest(nodes, e)
    assert out.count() == 0
    assert out.columns == ["src", "dst", "w"]
