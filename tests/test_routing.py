"""Multi-source traversal: BFS hops and bounded integer-metre shortest
paths pinned on hand graphs (the DuckDB recursive-CTE oracle gate is in
test_oracle_parity; this pins the SEMANTICS — minimality, hop bound,
unreachable absence, walk-vs-path equivalence — independently)."""

import math

from ophois_spark.kernels.geo import haversine
from ophois_spark.operators.routing import bfs_hops, bounded_dist_m
from ophois_spark.sources.graph_io import graph_from_tuples

# chain a-b-c-d-e, triangle-free branch c-f, isolated node z
NODES = [
    ("a", "45.0", "5.0"),
    ("b", "45.0", "5.001"),
    ("c", "45.0", "5.002"),
    ("d", "45.0", "5.003"),
    ("e", "45.0", "5.004"),
    ("f", "45.001", "5.002"),
    ("z", "44.0", "4.0"),
]
LINKS = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("c", "f")]


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id string")


def test_bfs_hops_single_seed(spark):
    g = graph_from_tuples(spark, NODES, LINKS)
    got = {r["id"]: r["hops"] for r in bfs_hops(g, _seeds(spark, ["a"]), 8).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3, "e": 4, "f": 3}
    # isolated node never appears
    assert "z" not in got


def test_bfs_hops_multi_seed_min(spark):
    g = graph_from_tuples(spark, NODES, LINKS)
    got = {r["id"]: r["hops"] for r in bfs_hops(g, _seeds(spark, ["a", "e"]), 8).collect()}
    # distance is the MIN over seeds
    assert got == {"a": 0, "e": 0, "b": 1, "d": 1, "c": 2, "f": 3}


def test_bfs_hop_bound_truncates(spark):
    g = graph_from_tuples(spark, NODES, LINKS)
    got = {r["id"]: r["hops"] for r in bfs_hops(g, _seeds(spark, ["a"]), 2).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def _edge_w(u, v):
    n = {i: (float(lat), float(lon)) for i, lat, lon in NODES}
    (lat1, lon1), (lat2, lon2) = n[u], n[v]
    return math.floor(haversine(lon1, lat1, lon2, lat2))


def test_bounded_dist_matches_hand_dijkstra(spark):
    g = graph_from_tuples(spark, NODES, LINKS)
    w = {frozenset(e): _edge_w(*e) for e in LINKS}
    # hand Bellman-Ford over the tiny graph, 3 rounds from seed a
    dist = {"a": 0}
    for _ in range(3):
        nxt = dict(dist)
        for e in LINKS:
            for u, v in (e, e[::-1]):
                if u in dist:
                    cand = dist[u] + w[frozenset(e)]
                    if cand < nxt.get(v, math.inf):
                        nxt[v] = cand
        dist = nxt
    got = {
        r["id"]: r["dist_m"]
        for r in bounded_dist_m(g, _seeds(spark, ["a"]), 3).collect()
    }
    assert got == dist
    # e is 4 hops out: absent under the 3-hop bound
    assert "e" not in got and "z" not in got


def test_bounded_dist_early_exit_is_fixpoint(spark):
    # max_hops far above the diameter: early exit returns true shortest
    g = graph_from_tuples(spark, NODES, LINKS)
    got = {
        r["id"]: r["dist_m"]
        for r in bounded_dist_m(g, _seeds(spark, ["a"]), 20).collect()
    }
    w = {frozenset(e): _edge_w(*e) for e in LINKS}
    path = lambda *es: sum(w[frozenset(e)] for e in es)
    assert got["e"] == path(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    assert got["f"] == path(("a", "b"), ("b", "c"), ("c", "f"))


def test_isochrone_cells_cutoff_and_cell_rollup(spark):
    from ophois_spark.operators.routing import isochrone_cells

    g = graph_from_tuples(spark, NODES, LINKS)
    # chain spacing is ~78 m per 0.001 deg lon at lat 45; cutoff after
    # two hops keeps a,b,c and drops d,e,f; z is disconnected
    cutoff = int(2 * haversine(5.0, 45.0, 5.001, 45.0))
    out = isochrone_cells(
        g, _seeds(spark, ["a"]), cutoff_m=cutoff, grid_deg=0.001, max_hops=8
    ).collect()
    got = {(r["gx"], r["gy"]): (r["n_nodes"], r["min_dist_m"]) for r in out}
    # one cell per chain node at this grid: a=(5000,45000), b, c
    assert got[(5000, 45000)] == (1, 0)
    assert got[(5001, 45000)][0] == 1
    assert got[(5002, 45000)][0] == 1
    assert len(got) == 3
    # exact closest approaches: per-edge FLOORED weights, summed
    w_ab = int(haversine(5.0, 45.0, 5.001, 45.0))
    w_bc = int(haversine(5.001, 45.0, 5.002, 45.0))
    assert got[(5001, 45000)][1] == w_ab
    assert got[(5002, 45000)][1] == w_ab + w_bc


def test_cell_simpson_monoculture_and_balance(spark):
    from ophois_spark.operators.spatial import cell_simpson

    rows = [(0, 0, "en")] * 3 + [(1, 1, "en"), (1, 1, "fr")] + [
        (2, 2, "en"), (2, 2, "fr"), (2, 2, "de"), (2, 2, "de")
    ]
    cells = spark.createDataFrame(rows, "gx int, gy int, lang string")
    out = {(r["gx"], r["gy"]): r for r in cell_simpson(cells, "lang").collect()}
    assert out[(0, 0)]["simpson"] == 1.0 and out[(0, 0)]["sum_sq"] == 9
    assert out[(1, 1)]["simpson"] == 0.5
    # counts 1,1,2 over n=4: (1+1+4)/16
    assert out[(2, 2)]["simpson"] == 6 / 16
    assert out[(2, 2)]["n_rows"] == 4
