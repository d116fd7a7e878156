"""Golden tests for the contraction framework (reference src/heuristics.rs:206-313)."""

import pytest
from pyspark.sql import functions as F

from ophois_spark.operators.contraction import (
    contract_edges,
    remove_degree_two_nodes,
    remove_under_delta_links,
    remove_under_delta_nodes,
    replace_nodes_by_links,
)
from ophois_spark.sources.graph_io import graph_from_tuples
from tests.fixtures import (
    DEG2_LINKS,
    DEG2_NODES,
    REPLACE_LINK_LINKS,
    REPLACE_LINK_NODES,
    REPLACE_NODE_LINKS,
    REPLACE_NODE_NODES,
    UNDER_DELTA_LINKS_LINKS,
    UNDER_DELTA_LINKS_NODES,
    UNDER_DELTA_NODES_LINKS,
    UNDER_DELTA_NODES_NODES,
)


def degrees_map(g):
    return {r["id"]: r["degree"] for r in g.degrees().collect()}


def test_replace_node_by_links_golden(spark):
    # star of 4 → K4 (src/heuristics.rs:206-222)
    g = graph_from_tuples(spark, REPLACE_NODE_NODES, REPLACE_NODE_LINKS)
    victims = spark.createDataFrame([("3761637489",)], "id string")
    out = replace_nodes_by_links(g, victims)
    assert out.counts() == (4, 6)
    assert degrees_map(out) == {
        "3761637488": 3,
        "3761637486": 3,
        "3761637490": 3,
        "2268836829": 3,
    }


def test_replace_node_isolated_and_existing_edges(spark):
    # removing an isolated node; removing a node whose neighbours are
    # already linked must not duplicate the edge
    g = graph_from_tuples(
        spark,
        [("a", "48.0", "2.0"), ("b", "48.1", "2.0"), ("c", "48.2", "2.0"), ("i", "49.0", "3.0")],
        [("a", "b"), ("b", "c"), ("a", "c")],
    )
    out = replace_nodes_by_links(g, spark.createDataFrame([("i",), ("b",)], "id string"))
    assert out.counts() == (2, 1)
    assert degrees_map(out) == {"a": 1, "c": 1}


def test_remove_degree_two_nodes_golden(spark):
    # 26 → 14 nodes, 17 links (src/heuristics.rs:224-250)
    g = graph_from_tuples(spark, DEG2_NODES, DEG2_LINKS)
    out = remove_degree_two_nodes(g)
    assert out.counts() == (14, 17)
    assert degrees_map(out) == {
        "1852590201": 1, "92192237": 3, "3761637489": 4, "2268836829": 1,
        "3761637486": 3, "3761637482": 3, "2576426853": 3, "2576426850": 3,
        "3758221292": 3, "1829061614": 4, "3758221284": 1, "2576426847": 1,
        "1829061602": 3, "3761637496": 1,
    }


def test_remove_degree_two_pure_cycle_vanishes(spark):
    g = graph_from_tuples(
        spark,
        [("a", "48.0", "2.0"), ("b", "48.1", "2.0"), ("c", "48.2", "2.0"), ("d", "48.3", "2.0")],
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")],
    )
    out = remove_degree_two_nodes(g)
    assert out.counts() == (0, 0)


def test_remove_degree_two_loop_chain_vanishes(spark):
    # chain from x back to x: chain nodes vanish, no self-loop minted
    g = graph_from_tuples(
        spark,
        [
            ("x", "48.0", "2.0"), ("p", "48.1", "2.0"), ("q", "48.2", "2.0"),
            ("z", "47.0", "2.0"), ("w", "47.1", "2.0"),
        ],
        [("x", "p"), ("p", "q"), ("q", "x"), ("x", "z"), ("x", "w")],
    )
    out = remove_degree_two_nodes(g)
    assert degrees_map(out) == {"x": 2, "z": 1, "w": 1}


def test_remove_under_delta_nodes_golden(spark):
    # 14 → 9 nodes, 12 links at delta=10 (src/heuristics.rs:252-273)
    g = graph_from_tuples(spark, UNDER_DELTA_NODES_NODES, UNDER_DELTA_NODES_LINKS)
    out = remove_under_delta_nodes(g, 10.0)
    assert out.counts() == (9, 12)
    assert degrees_map(out) == {
        "3761637496": 1, "1829061602": 3, "3761637489": 3, "3761637486": 3,
        "2576426853": 3, "2576426850": 4, "1829061614": 3, "92192237": 3,
        "1852590201": 1,
    }


def test_replace_link_by_node_golden(spark):
    # star contraction → "3761637489-92192237" with degree 4
    # (src/heuristics.rs:275-292)
    g = graph_from_tuples(spark, REPLACE_LINK_NODES, REPLACE_LINK_LINKS)
    matching = spark.createDataFrame([("3761637489", "92192237")], "src string, dst string")
    out = contract_edges(g, matching)
    assert out.counts() == (5, 4)
    assert degrees_map(out) == {
        "1829061602": 1, "3761637486": 1, "1829061614": 1, "1852590201": 1,
        "3761637489-92192237": 4,
    }
    row = out.nodes.filter(F.col("id") == "3761637489-92192237").collect()[0]
    # midpoint of the two endpoints, Rust-formatted
    from ophois_spark.kernels.floatfmt import format_f64
    from ophois_spark.kernels.geo import midpoint

    s = next(n for n in REPLACE_LINK_NODES if n[0] == "3761637489")
    t = next(n for n in REPLACE_LINK_NODES if n[0] == "92192237")
    x, y = midpoint(float(s[2]), float(s[1]), float(t[2]), float(t[1]))
    assert row["lat"] == format_f64(y) and row["lon"] == format_f64(x)


def test_remove_under_delta_links_golden(spark):
    # 9 → 7 nodes, 8 links at delta=6 with exact merged ids
    # (src/heuristics.rs:294-313)
    g = graph_from_tuples(spark, UNDER_DELTA_LINKS_NODES, UNDER_DELTA_LINKS_LINKS)
    out = remove_under_delta_links(g, 6.0)
    assert out.counts() == (7, 8)
    assert degrees_map(out) == {
        "3761637496": 1, "1829061602": 3, "3761637486-3761637489": 3,
        "2576426850-2576426853": 3, "1829061614": 2, "92192237": 3,
        "1852590201": 1,
    }


def test_contract_edges_adjacent_merges_relabel_consistently(spark):
    # two disjoint contractions where one's neighbour is the other's
    # endpoint: edge between merged nodes must connect the two new ids
    g = graph_from_tuples(
        spark,
        [
            ("a", "48.0", "2.0"), ("b", "48.00001", "2.0"),
            ("c", "48.1", "2.0"), ("d", "48.10001", "2.0"),
        ],
        [("a", "b"), ("b", "c"), ("c", "d")],
    )
    matching = spark.createDataFrame([("a", "b"), ("c", "d")], "src string, dst string")
    out = contract_edges(g, matching)
    assert sorted(r["id"] for r in out.nodes.collect()) == ["a-b", "c-d"]
    assert [(r["src"], r["dst"]) for r in out.edges.collect()] == [("a-b", "c-d")]


@pytest.mark.slow
def test_oracle_unroll_depth_covers_gated_sf(spark):
    """The H4/H6 DuckDB oracles unroll _CONTRACT_ROUNDS rounds; the
    engine's true fixpoint must converge within that depth at the
    correctness-gated scale factor, else the gate would report a false
    mismatch. Running the loops with max_iter=_CONTRACT_ROUNDS raises
    RuntimeError if the unroll is too shallow."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from ophois_spark.operators.contraction import (
        remove_under_delta_links,
        remove_under_delta_nodes,
    )
    from ophois_spark.operators.graph import StreetGraph
    from ophois_spark.queries import _CONTRACT_ROUNDS, H4_DELTA, H6_DELTA, derived_graph

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata not present")
    g = derived_graph(spark, sf)
    short = g.edges_with_coords().filter(F.col("dist_m") <= 150.0).select("src", "dst")
    remove_under_delta_nodes(
        StreetGraph(g.nodes, short), H4_DELTA, max_iter=_CONTRACT_ROUNDS
    ).nodes.count()
    remove_under_delta_links(g, H6_DELTA, max_iter=_CONTRACT_ROUNDS).nodes.count()

    # the composed simplify oracle unrolls the same depth over the
    # LC+deg2 graph at SIMPLIFY_DELTA — pin that variant too
    from ophois_spark.operators.components import largest_component
    from ophois_spark.operators.contraction import remove_degree_two_nodes
    from ophois_spark.queries import SIMPLIFY_DELTA

    gs = remove_degree_two_nodes(largest_component(derived_graph(spark, sf)))
    gs = remove_under_delta_nodes(gs, SIMPLIFY_DELTA, max_iter=_CONTRACT_ROUNDS)
    remove_under_delta_links(gs, SIMPLIFY_DELTA, max_iter=_CONTRACT_ROUNDS).nodes.count()
