"""SCC + bowtie: hand fixtures with known answers, a randomized
cross-check against a pure-Python Tarjan, and the overlay's structure
pin (CORE 117 / IN 123 / OUT 4 / OTHER 13 at full 257-site coverage)."""

import pytest
from pyspark.sql import functions as F

from ophois_spark.operators.scc import bowtie_classes, strongly_connected_components


def _tarjan(n_ids, edge_list):
    """Iterative Tarjan, returns {node: min id of its SCC}."""
    from collections import defaultdict

    adj = defaultdict(list)
    for a, b in edge_list:
        if a != b:
            adj[a].append(b)
    idx, low, on, st, out = {}, {}, set(), [], []
    counter = [0]
    for root in n_ids:
        if root in idx:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                idx[v] = low[v] = counter[0]
                counter[0] += 1
                st.append(v)
                on.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in idx:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on:
                    low[v] = min(low[v], idx[w])
            if recurse:
                continue
            if low[v] == idx[v]:
                comp = []
                while True:
                    w = st.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                out.append(comp)
            if work and work[-1][1] > 0:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return {v: min(c) for c in out for v in c}


def _run_scc(spark, ids, edge_list):
    nodes = spark.createDataFrame([(i,) for i in ids], "id long")
    edges = spark.createDataFrame(edge_list or [(0, 0)], "src long, dst long")
    if not edge_list:
        edges = edges.limit(0)
    got = strongly_connected_components(nodes, edges)
    return {r["id"]: r["scc"] for r in got.collect()}


def test_scc_hand_fixture(spark):
    # 0↔1↔2 cycle, 3→0 (IN), 2→4→5→4 (cycle reached), 6 isolated, 7→6
    edges = [(0, 1), (1, 2), (2, 0), (3, 0), (2, 4), (4, 5), (5, 4), (7, 6)]
    ids = list(range(8))
    got = _run_scc(spark, ids, edges)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4, 6: 6, 7: 7}


def test_scc_chain_and_self_loops(spark):
    # pure chain (worst-case trim depth) + self loops ignored
    edges = [(i, i + 1) for i in range(6)] + [(2, 2)]
    got = _run_scc(spark, list(range(7)), edges)
    assert got == {i: i for i in range(7)}


@pytest.mark.slow
def test_scc_matches_tarjan_random(spark):
    # deterministic pseudo-random digraph, dense enough for big SCCs
    n = 60
    edges = []
    for s in range(n):
        for mul, add in ((7, 3), (11, 5)):
            d = (s * mul + add) % n
            if d != s:
                edges.append((s, d))
        if s % 4 == 0:
            d = (s * s + 1) % n
            if d != s:
                edges.append((s, d))
    want = _tarjan(range(n), edges)
    got = _run_scc(spark, list(range(n)), edges)
    assert got == want


def test_bowtie_hand_fixture(spark):
    # core {1,2}, IN {0}, OUT {3}, OTHER {4 (tendril off IN), 5 (island)}
    edges = [(1, 2), (2, 1), (0, 1), (2, 3), (0, 4)]
    ids = list(range(6))
    nodes = spark.createDataFrame([(i,) for i in ids], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    labels = strongly_connected_components(nodes, e)
    got = {r["id"]: r["cls"] for r in bowtie_classes(nodes, e, labels).collect()}
    assert got == {0: "IN", 1: "CORE", 2: "CORE", 3: "OUT", 4: "OTHER", 5: "OTHER"}


@pytest.mark.slow
def test_site_overlay_structure(spark):
    """Pin the 257-site overlay's published shape at full coverage."""
    from ophois_spark.queries import SITE_MOD, _site_graph, q_site_scc, q_web_bowtie

    sf_dir = "/root/testdata/sf0.001"
    import os

    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    nodes, _ = _site_graph(spark, sf_dir)
    if nodes.count() < SITE_MOD:
        pytest.skip("overlay not fully covered at this sf")
    scc = q_site_scc(spark, sf_dir)
    sizes = {
        r["scc_size"]: r["n"]
        for r in scc.groupBy("scc_size").agg(F.count_distinct("scc").alias("n")).collect()
    }
    assert sizes == {117: 1, 4: 1, 1: 136}
    bt = q_web_bowtie(spark, sf_dir)
    cls = {r["cls"]: r["n"] for r in bt.groupBy("cls").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert cls == {"CORE": 117, "IN": 123, "OUT": 4, "OTHER": 13}


def test_scc_no_edges_all_singletons(spark):
    got = _run_scc(spark, [3, 1, 2], [])
    assert got == {1: 1, 2: 2, 3: 3}
