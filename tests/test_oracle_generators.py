"""The H4/H6 oracle GENERATORS are load-bearing for the correctness
gate, but the gate only ever exercises them on the derived graph. This
module pins generator ≡ engine on RANDOM small graphs: the same chain
SQL that backs SQL_UNDER_DELTA_NODES/LINKS runs in DuckDB over a
VALUES-based graph and must value-match the Spark fixpoint operators.
"""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from ophois_spark.kernels.floatfmt import format_f64
from ophois_spark.operators.contraction import (
    remove_under_delta_links,
    remove_under_delta_nodes,
)
from ophois_spark.queries import _h4_chain, _h6_chain, _lc_deg2_chain
from ophois_spark.sources.graph_io import graph_from_tuples

ROUNDS = 8  # small graphs can chain deeper than the derived graph
DELTA = 9.0


def random_graph(seed):
    rng = random.Random(seed * 7919 + 3)
    n = rng.randint(8, 14)
    nodes = []
    for i in range(n):
        lat = 48.8274 + rng.randint(-40, 40) * 1e-6 * rng.randint(1, 9)
        lon = 2.3487 + rng.randint(-40, 40) * 1e-6 * rng.randint(1, 9)
        nodes.append((str(1000 + i), format_f64(lat), format_f64(lon)))
    ids = [x[0] for x in nodes]
    links = set()
    for _ in range(rng.randint(n, 2 * n)):
        u, v = rng.sample(ids, 2)
        links.add((min(u, v), max(u, v)))
    return nodes, sorted(links)


def _base_ctes(nodes, links):
    # CAST the coordinate STRINGS to DOUBLE: a bare literal becomes
    # DECIMAL, and a 17-significant-digit decimal's scaled integer
    # exceeds 2^53, so DECIMAL→DOUBLE double-rounds one ulp away from
    # the correctly-rounded string parse the engine performs
    nvals = ", ".join(
        f"('{i}', CAST('{lat}' AS DOUBLE), CAST('{lon}' AS DOUBLE))"
        for i, lat, lon in nodes
    )
    evals = ", ".join(f"('{u}', '{v}')" for u, v in links) or "(NULL, NULL)"
    ewhere = "" if links else " WHERE src IS NOT NULL"
    return [
        f"coords(id, lat_d, lon_d) AS (VALUES {nvals})",
        f"raw_e(src, dst) AS (VALUES {evals})",
    ], ewhere


@pytest.mark.parametrize("seed", range(6))
def test_h4_chain_matches_engine_on_random_graph(spark, seed):
    nodes, links = random_graph(seed)
    g = graph_from_tuples(spark, nodes, links)
    got = sorted(
        r["id"]
        for r in remove_under_delta_nodes(g, DELTA, max_iter=ROUNDS).nodes.collect()
    )
    base, ewhere = _base_ctes(nodes, links)
    parts = base + [
        "n0 AS (SELECT id FROM coords)",
        f"e0 AS (SELECT src, dst FROM raw_e{ewhere})",
    ] + _h4_chain("", ROUNDS, coords="coords", delta=DELTA)
    sql = "WITH " + ",\n".join(parts) + f"\nSELECT id FROM n{ROUNDS}"
    want = sorted(r[0] for r in duckdb.sql(sql).fetchall())
    assert got == want


def _mk_nodes(ids):
    return [
        (i, format_f64(48.8274 + k * 1e-5), format_f64(2.3487 + k * 1e-5))
        for k, i in enumerate(sorted(ids))
    ]


# corner graphs the derived data can't be relied on to contain:
# - "lollipop": a deg-2 chain whose BOTH boundary ends attach to the
#   same outside node X — the contracted edge must be dropped (min==max)
# - "cycle_wins": the largest component is a pure deg-2 cycle — after
#   contraction it vanishes entirely (empty survivors is legal)
# - "chain": plain path, contracts to one endpoint edge
_CORNER_GRAPHS = {
    "lollipop": (
        ["X", "Y1", "m", "s1", "s2"],
        [("X", "s1"), ("m", "s1"), ("m", "s2"), ("X", "s2"), ("X", "Y1")],
    ),
    "cycle_wins": (
        ["c1", "c2", "c3", "c4", "c5", "t1", "t2"],
        [("c1", "c2"), ("c2", "c3"), ("c3", "c4"), ("c4", "c5"), ("c1", "c5"), ("t1", "t2")],
    ),
    "chain": (
        ["A", "B", "s1", "s2", "s3"],
        [("A", "s1"), ("s1", "s2"), ("s2", "s3"), ("B", "s3")],
    ),
}


@pytest.mark.parametrize(
    "case",
    [
        # seed0 stays in the quick gate as the random representative;
        # the remaining random seeds are redundancy, gated behind -m slow.
        "seed0",
        *(pytest.param(f"seed{s}", marks=pytest.mark.slow) for s in range(1, 6)),
        *_CORNER_GRAPHS,
    ],
)
def test_lc_deg2_prefix_matches_engine(spark, case):
    """Pin the simplify oracle's largest-component + degree-2 closed
    form (the _lc_deg2_chain prefix of _simplify_sql) against
    largest_component + remove_degree_two_nodes on random graphs AND
    crafted corner graphs (lollipop chains, pure-cycle components) —
    the gate alone only ever exercises the closed form on the derived
    graph (ADVICE r2)."""
    from ophois_spark.operators.components import largest_component
    from ophois_spark.operators.contraction import remove_degree_two_nodes

    if case.startswith("seed"):
        nodes, links = random_graph(int(case[4:]))
    else:
        ids, links = _CORNER_GRAPHS[case]
        nodes, links = _mk_nodes(ids), sorted(links)
    g = remove_degree_two_nodes(largest_component(graph_from_tuples(spark, nodes, links)))
    got_nodes = sorted(r["id"] for r in g.nodes.collect())
    got_edges = sorted((r["src"], r["dst"]) for r in g.edges.collect())

    base, ewhere = _base_ctes(nodes, links)
    parts = base + [
        f"edges_all AS (SELECT src, dst FROM raw_e{ewhere})",
    ] + _lc_deg2_chain()
    pre = "WITH RECURSIVE " + ",\n".join(parts)
    want_nodes = sorted(r[0] for r in duckdb.sql(pre + "\nSELECT id FROM an0").fetchall())
    want_edges = sorted(
        (r[0], r[1]) for r in duckdb.sql(pre + "\nSELECT src, dst FROM ae0").fetchall()
    )
    assert got_nodes == want_nodes
    assert got_edges == want_edges


@pytest.mark.parametrize(
    "seed",
    [0, 1, *(pytest.param(s, marks=pytest.mark.slow) for s in range(2, 6))],
)
def test_h6_chain_matches_engine_on_random_graph(spark, seed):
    nodes, links = random_graph(seed)
    g = graph_from_tuples(spark, nodes, links)
    got = sorted(
        (r["id"], r["lat"], r["lon"])
        for r in remove_under_delta_links(g, DELTA, max_iter=ROUNDS).nodes.collect()
    )
    base, ewhere = _base_ctes(nodes, links)
    parts = base + [
        # graph_from_tuples keeps the fixture strings verbatim as lat/lon
        """n0 AS (SELECT id, CAST(CAST(lat_d AS DOUBLE) AS VARCHAR) AS lat,
                      CAST(CAST(lon_d AS DOUBLE) AS VARCHAR) AS lon,
                      CAST(lat_d AS DOUBLE) AS lat_d,
                      CAST(lon_d AS DOUBLE) AS lon_d FROM coords)""",
        f"e0 AS (SELECT src, dst FROM raw_e{ewhere})",
    ] + _h6_chain("", ROUNDS, delta=DELTA)
    sql = "WITH " + ",\n".join(parts) + f"\nSELECT id, lat, lon FROM n{ROUNDS}"
    want = sorted((r[0], r[1], r[2]) for r in duckdb.sql(sql).fetchall())
    assert got == want
