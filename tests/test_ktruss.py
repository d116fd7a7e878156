"""k-truss pins: hand-built graphs + the oracle-unroll depth guard.

The registry sweep gates ktruss_edges against the DuckDB unroll; these
pin the peeling semantics and guard KTRUSS_UNROLL against the measured
convergence depth at the driver's gate scales.
"""

import os

import pytest

from ophois_spark.operators.components import ktruss


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_ktruss3_keeps_triangle_drops_tail(spark):
    # triangle 1-2-3 with a pendant chain 3-4-5: chain edges are in no
    # triangle -> dropped at k=3; the triangle survives with support 1
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    out, rounds = ktruss(e, 3)
    got = {(r.src, r.dst): r.support for r in out.collect()}
    assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 1}
    assert rounds >= 1


def test_ktruss4_cascade_peel(spark):
    # two triangles sharing edge (1,2): every edge has support >= 1 but
    # only (1,2) has 2 -> at k=4 the outer edges drop first, then (1,2)
    # loses its triangles and drops: empty 4-truss (cascade, >1 round)
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)])
    out, rounds = ktruss(e, 4)
    assert out.count() == 0
    assert rounds >= 1


def test_ktruss4_k4_clique_survives(spark):
    # K4: every edge in exactly 2 triangles -> the whole clique is a
    # 4-truss and nothing peels
    e = _edges(spark, [(a, b) for a in range(1, 5) for b in range(a + 1, 5)])
    out, rounds = ktruss(e, 4)
    got = {(r.src, r.dst): r.support for r in out.collect()}
    assert len(got) == 6 and set(got.values()) == {2}


def test_ktruss_orientation_free(spark):
    # reversed/duplicated input edges canonicalize to the same truss
    e = _edges(spark, [(2, 1), (3, 2), (1, 3), (1, 3), (5, 4)])
    out, _ = ktruss(e, 3)
    assert {(r.src, r.dst) for r in out.collect()} == {(1, 2), (2, 3), (1, 3)}


@pytest.mark.slow
@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_unroll_depth_covers_gated_sf(spark, sf_dir):
    # the SQL oracle unrolls KTRUSS_UNROLL rounds; the engine must
    # converge within that depth at both gate scales or the gate lies
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    from ophois_spark.queries import KTRUSS_K, KTRUSS_UNROLL, _link_overlay

    _nodes, edges = _link_overlay(spark, sf_dir)
    _out, rounds = ktruss(edges, KTRUSS_K)
    assert rounds <= KTRUSS_UNROLL
