"""Load semantics + metrics goldens (reference src/graph.rs, src/metrics.rs)."""

import pytest

from ophois_spark.operators.metrics import (
    degree_distribution,
    distribution_lines,
    length_distribution,
    order_size,
)
from ophois_spark.sources.graph_io import graph_from_tuples, parse_records, show_records
from tests.fixtures import CAILLES_LINKS, CAILLES_NODES

SEP = "␟"


def test_load_cailles_counts(spark):
    g = graph_from_tuples(spark, CAILLES_NODES, CAILLES_LINKS)
    assert g.counts() == (26, 30)


def test_first_wins_node_dedup(spark):
    # reference src/graph.rs:82-89 — first id occurrence wins
    df = spark.createDataFrame(
        [
            (0, f"a{SEP}48.0{SEP}2.0"),
            (1, f"a{SEP}99.0{SEP}99.0"),
            (2, f"b{SEP}48.1{SEP}2.1"),
            (3, f"a{SEP}b"),
            (4, f"b{SEP}a"),  # reversed duplicate must collapse
        ],
        "seq long, line string",
    )
    g, _ = parse_records(df, ["seq"])
    rows = {r["id"]: (r["lat"], r["lon"]) for r in g.nodes.collect()}
    assert rows == {"a": ("48.0", "2.0"), "b": ("48.1", "2.1")}
    assert [(r["src"], r["dst"]) for r in g.edges.collect()] == [("a", "b")]


def test_dangling_and_selfloop_links_dropped(spark):
    df = spark.createDataFrame(
        [
            (0, f"a{SEP}48.0{SEP}2.0"),
            (1, f"a{SEP}zz"),  # dangling → dropped (reference panics)
            (2, f"a{SEP}a"),  # self-loop → dropped
        ],
        "seq long, line string",
    )
    g, _ = parse_records(df, ["seq"])
    assert g.edges.count() == 0
    with pytest.raises(ValueError):
        parse_records(df, ["seq"], strict=True)


def test_malformed_record_strict(spark):
    df = spark.createDataFrame([(0, f"a{SEP}b{SEP}c{SEP}d")], "seq long, line string")
    with pytest.raises(ValueError):
        parse_records(df, ["seq"], strict=True)


def test_degrees_golden(spark):
    # reference src/metrics.rs:80-89
    g = graph_from_tuples(spark, CAILLES_NODES, CAILLES_LINKS)
    assert distribution_lines(degree_distribution(g), "degree", "n_nodes") == [
        "1 5",
        "2 12",
        "3 5",
        "4 4",
    ]


def test_lengths_golden(spark):
    # reference src/metrics.rs:91-117
    g = graph_from_tuples(spark, CAILLES_NODES, CAILLES_LINKS)
    got = {r["length_m"]: r["n_links"] for r in length_distribution(g).collect()}
    assert got == {
        1: 5, 2: 3, 3: 1, 4: 5, 5: 2, 6: 2, 8: 2, 10: 1, 11: 1, 12: 1,
        14: 1, 15: 2, 18: 1, 22: 1, 34: 1, 87: 1,
    }


def test_order_size_golden(spark):
    # reference src/metrics.rs:119-123 — "26 30"
    g = graph_from_tuples(spark, CAILLES_NODES, CAILLES_LINKS)
    row = order_size(g).collect()[0]
    assert (row["n_nodes"], row["n_links"]) == (26, 30)


def test_write_metrics_file_sink(spark, tmp_path):
    # reference metrics() file sink (src/metrics.rs:8-24,69-75):
    # ./{dir}/{order_size,degrees,lengths}_{param} with the golden bodies
    from ophois_spark.operators.metrics import write_metrics

    g = graph_from_tuples(spark, CAILLES_NODES, CAILLES_LINKS)
    out = write_metrics(g, "cailles", str(tmp_path))
    assert sorted(out) == ["degrees_cailles", "lengths_cailles", "order_size_cailles"]
    assert (tmp_path / "order_size_cailles").read_text() == "26 30"
    assert (tmp_path / "degrees_cailles").read_text() == "1 5\n2 12\n3 5\n4 4\n"
    lengths = (tmp_path / "lengths_cailles").read_text()
    assert lengths.startswith("1 5\n2 3\n") and lengths.endswith("34 1\n87 1\n")


def test_degree_zero_counted(spark):
    g = graph_from_tuples(spark, [("i", "48.0", "2.0")], [])
    assert distribution_lines(degree_distribution(g), "degree", "n_nodes") == ["0 1"]


def test_show_roundtrip(spark):
    # show → reload is identity on (node set, canonical edge set)
    g = graph_from_tuples(spark, CAILLES_NODES, CAILLES_LINKS)
    lines = [r["line"] for r in show_records(g).collect()]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(lines)], "seq long, line string")
    g2, _ = parse_records(df, ["seq"])
    assert sorted(map(tuple, g.nodes.collect())) == sorted(map(tuple, g2.nodes.collect()))
    assert sorted(map(tuple, g.edges.collect())) == sorted(map(tuple, g2.edges.collect()))


def test_self_loop_contract(spark):
    """Pinned divergence from the reference: graph.rs:91-97 KEEPS a
    self-link `a␟a` (dedup is presence-of-either-direction only) but
    its loop bookkeeping is degenerate — insert_link((a,a)) runs twice
    so remove_node(a) panics on the second remove_link unwrap
    (graph.rs:127-136). The engine drops self-loops at load; strict
    mode raises on their presence instead of dropping silently."""
    df = spark.createDataFrame(
        [
            (0, f"a{SEP}48.0{SEP}2.0"),
            (1, f"b{SEP}48.1{SEP}2.1"),
            (2, f"a{SEP}a"),  # self-loop only — no other defects
            (3, f"a{SEP}b"),
        ],
        "seq long, line string",
    )
    g, _ = parse_records(df, ["seq"])
    assert sorted(map(tuple, g.edges.collect())) == [("a", "b")]
    assert g.nodes.count() == 2
    with pytest.raises(ValueError, match="self-loop"):
        parse_records(df, ["seq"], strict=True)
