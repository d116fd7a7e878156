"""CLI parity: the ``python -m ophois_spark`` surface composes like the
reference binary's pipes (download | format | extract | simplify)."""

import pytest
from ophois_spark import SEPARATOR
from ophois_spark.__main__ import (
    cli_discretize,
    cli_download,
    cli_extract,
    cli_format,
    cli_simplify,
)
from tests.fixtures import CAILLES_LINKS, CAILLES_NODES


def test_download_format_extract_pipe_roundtrip():
    """The synthetic download feeds format|extract into load-able
    records, byte-identical to the fused kernel."""
    from ophois_spark.kernels.osmxml import extract_records

    xml = cli_download("Pantin")
    lines = xml.splitlines()
    piped = cli_extract(cli_format(lines), SEPARATOR)
    assert piped == extract_records(lines, SEPARATOR)
    assert len(piped) > 100
    # deterministic per city, different across cities
    assert cli_download("Pantin") == xml
    assert cli_download("Tokyo") != xml


def _record_lines():
    return [SEPARATOR.join(n) for n in CAILLES_NODES] + [
        SEPARATOR.join(e) for e in CAILLES_LINKS
    ]


@pytest.mark.slow
def test_cli_simplify_matches_pipeline_and_writes_metrics(spark, tmp_path):
    out = cli_simplify(
        spark, _record_lines(), 10.0, SEPARATOR, metrics_dir=str(tmp_path)
    )
    # Rust-format param: 10.0 → "simplify=10"
    assert (tmp_path / "order_size_simplify=10").exists()
    assert (tmp_path / "degrees_simplify=10").exists()
    assert (tmp_path / "lengths_simplify=10").exists()
    n_nodes, n_links = (tmp_path / "order_size_simplify=10").read_text().split()
    node_lines = [l for l in out if len(l.split(SEPARATOR)) == 3]
    link_lines = [l for l in out if len(l.split(SEPARATOR)) == 2]
    assert (int(n_nodes), int(n_links)) == (len(node_lines), len(link_lines))
    assert len(out) == len(set(out))  # show emits each node/link once


def test_cli_discretize_show_roundtrips(spark, tmp_path):
    out = cli_discretize(
        spark, _record_lines(), 25.0, SEPARATOR, metrics_dir=str(tmp_path)
    )
    assert (tmp_path / "order_size_discretize=25").exists()
    # discretize only adds nodes/links, never loses the original nodes
    node_ids = {l.split(SEPARATOR)[0] for l in out if len(l.split(SEPARATOR)) == 3}
    assert {n[0] for n in CAILLES_NODES} <= node_ids
