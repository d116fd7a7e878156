"""lpa_communities pins: pure-Python sync-LPA twin + structure checks.

The registry sweep gates lpa_communities against the DuckDB R-round
unroll; these pin the per-round semantics (min tie-break, isolated
nodes, symmetric adjacency) against an independent scan-form twin and
check labels never cross a component boundary.
"""

from collections import Counter

from ophois_spark.operators.components import lpa_communities


def _py_lpa(n_ids, pairs, rounds):
    adj = {i: set() for i in n_ids}
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    lbl = {i: i for i in n_ids}
    for _ in range(rounds):
        nxt = {}
        for i in n_ids:
            if not adj[i]:
                nxt[i] = lbl[i]
                continue
            cnt = Counter(lbl[j] for j in adj[i])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[i] = best[0]
        lbl = nxt
    return lbl


def _run(spark, n_ids, pairs, rounds=4):
    nodes = spark.createDataFrame([(i,) for i in n_ids], "id long")
    edges = spark.createDataFrame(pairs or [(0, 0)], "src long, dst long")
    if not pairs:
        edges = edges.limit(0)
    out = lpa_communities(nodes, edges, rounds=rounds)
    return {r.id: r.label for r in out.collect()}


def test_two_cliques_bridge_matches_twin(spark):
    # two triangles joined by one bridge edge: LPA should settle each
    # clique on its min label; the twin is the ground truth either way
    ids = list(range(6))
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    for rounds in (1, 2, 4):
        assert _run(spark, ids, pairs, rounds) == _py_lpa(ids, pairs, rounds)


def test_isolated_node_keeps_label(spark):
    ids = [0, 1, 2, 9]
    pairs = [(0, 1), (1, 2)]
    got = _run(spark, ids, pairs)
    assert got == _py_lpa(ids, pairs, 4)
    assert got[9] == 9


def test_duplicate_and_reversed_edges_collapse(spark):
    # (a,b), (b,a) and repeats are one undirected edge — twin sees sets
    ids = [0, 1, 2]
    pairs = [(0, 1), (1, 0), (0, 1), (1, 2)]
    assert _run(spark, ids, pairs) == _py_lpa(ids, [(0, 1), (1, 2)], 4)


def test_labels_stay_inside_components(spark):
    # random-ish two-component graph: a node's label is always a node
    # id from its own component, every round count
    ids = list(range(10))
    pairs = [(i, (i * 3 + 1) % 5) for i in range(5)] + [
        (5 + i, 5 + ((i * 2 + 1) % 5)) for i in range(5)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    got = _run(spark, ids, pairs, rounds=4)
    assert got == _py_lpa(ids, pairs, 4)
    assert all((k < 5) == (v < 5) for k, v in got.items())


def test_partitioning_independence(spark):
    ids = list(range(12))
    pairs = [(i, (i * 7 + 3) % 12) for i in range(12)]
    pairs = [(a, b) for a, b in pairs if a != b]
    nodes = spark.createDataFrame([(i,) for i in ids], "id long")
    e1 = spark.createDataFrame(pairs, "src long, dst long").repartition(1)
    e7 = spark.createDataFrame(pairs, "src long, dst long").repartition(7)
    r1 = {r.id: r.label for r in lpa_communities(nodes, e1).collect()}
    r7 = {r.id: r.label for r in lpa_communities(nodes.repartition(5), e7).collect()}
    assert r1 == r7 == _py_lpa(ids, pairs, 4)
