"""Triangle counting pinned on hand graphs (oracle gate in
test_oracle_parity): K4, a triangle with a pendant, a square (0), and
brute-force equivalence on a random graph."""

import itertools
import random

from ophois_spark.operators.metrics import triangle_counts
from ophois_spark.sources.graph_io import graph_from_tuples


def _mk(spark, n_ids, links):
    nodes = [(i, "45.0", "5.0") for i in n_ids]
    return graph_from_tuples(spark, nodes, links)


def _counts(g):
    return {r["id"]: r["n_triangles"] for r in triangle_counts(g).collect()}


def test_k4_every_node_in_three(spark):
    ids = ["a", "b", "c", "d"]
    links = [(u, v) for u, v in itertools.combinations(ids, 2)]
    assert _counts(_mk(spark, ids, links)) == {i: 3 for i in ids}


def test_triangle_with_pendant_and_square(spark):
    # triangle a-b-c, pendant d off a; square w-x-y-z has no triangles
    ids = ["a", "b", "c", "d", "w", "x", "y", "z"]
    links = [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d"),
             ("w", "x"), ("x", "y"), ("y", "z"), ("w", "z")]
    got = _counts(_mk(spark, ids, links))
    assert got == {"a": 1, "b": 1, "c": 1, "d": 0,
                   "w": 0, "x": 0, "y": 0, "z": 0}


def test_random_graph_matches_bruteforce(spark):
    rng = random.Random(7)
    ids = [f"n{i:02d}" for i in range(18)]
    links = sorted(
        {tuple(sorted(rng.sample(ids, 2))) for _ in range(60)}
    )
    got = _counts(_mk(spark, ids, links))
    es = set(links)
    brute = {i: 0 for i in ids}
    for x, y, z in itertools.combinations(ids, 3):
        if ((x, y) in es and (y, z) in es and (x, z) in es):
            for c in (x, y, z):
                brute[c] += 1
    assert got == brute
