"""cell_orientation pins: fold/bin rule on cardinal cases, dominant
share, source-endpoint cell assignment."""

from ophois_spark.operators.spatial import cell_orientation


def _g(spark, nodes, edges):
    n = spark.createDataFrame(nodes, "id string, lat_d double, lon_d double")
    e = spark.createDataFrame(edges, "src string, dst string")
    return n, e


def test_cardinal_bins_and_fold(spark):
    # from a hub at (0,0): due north -> bin 0; due east -> bin 2 (90//45);
    # due south folds 180 -> 0 -> bin 0; bearing 63.4 deg -> bin 1
    # (the great-circle bearing to (1,1) floors to 44 — planar 45 is a
    # trap — so the bin-1 witness uses (0.5, 1.0) instead)
    nodes = [
        ("h", 0.0, 0.0),
        ("n", 1.0, 0.0),
        ("e", 0.0, 1.0),
        ("s", -1.0, 0.0),
        ("ne", 0.5, 1.0),
    ]
    edges = [("h", "n"), ("h", "e"), ("h", "s"), ("h", "ne")]
    n, e = _g(spark, nodes, edges)
    out = cell_orientation(n, e, grid_deg=10.0).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.b0, r.b1, r.b2, r.b3) == (2, 1, 1, 0)
    assert r.n_edges == 4 and r.dom_permille == 500


def test_cell_is_source_endpoint(spark):
    # edge crossing a cell border counts in the SOURCE node's cell
    nodes = [("a", 0.5, 0.5), ("b", 0.5, 1.5)]
    n, e = _g(spark, nodes, [("a", "b")])
    out = cell_orientation(n, e, grid_deg=1.0).collect()
    assert len(out) == 1 and (out[0].gx, out[0].gy) == (0, 0)


def test_pure_grid_city_dominance(spark):
    # 3 equatorial E-W edges (bearing exactly 90 only at lat 0 — at any
    # nonzero lat the great-circle bearing floors to 89/bin 1) + 1 N-S
    # edge in one cell -> dominant share 750
    nodes = [("o%d" % i, 0.0, 0.1 * i) for i in range(3)] + [
        ("p%d" % i, 0.0, 0.1 * i + 0.05) for i in range(3)
    ] + [("q", 0.5, 0.0)]
    edges = [("o%d" % i, "p%d" % i) for i in range(3)] + [("o0", "q")]
    n, e = _g(spark, nodes, edges)
    r = cell_orientation(n, e, grid_deg=10.0).collect()[0]
    assert (r.b0, r.b1, r.b2, r.b3) == (1, 0, 3, 0)
    assert r.n_edges == 4 and r.dom_permille == 750
