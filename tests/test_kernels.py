"""Kernel unit tests — goldens ported from the reference's Rust tests."""

import math

import numpy as np
import pytest
from hypothesis import given
from hypothesis import strategies as st

from ophois_spark.kernels.cells import cell_id, cell_res, cell_xy, kring, kring_np, parent
from ophois_spark.kernels.floatfmt import format_f64
from ophois_spark.kernels.geo import haversine, haversine_np, interpolate, midpoint
from ophois_spark.kernels.osmxml import (
    extract_node,
    extract_records,
    extract_way_pairs,
    format_lines,
)

SEP = "␟"


# ---- geo (reference src/geo.rs:33-94) ----------------------------------


def test_midpoint_golden():
    # reference src/geo.rs:36-54
    a = (2.3484976, 48.8275185)
    b = (2.3486683, 48.8275416)
    assert midpoint(*a, *b) == (2.34858295, 48.82753005)
    assert midpoint(*a, *b) == interpolate(*a, *b, 1.0 / 2.0)


def test_interpolate_golden():
    # reference src/geo.rs:56-93
    assert interpolate(-4.0, 1.0, 8.0, 7.0, 1.0 / 3.0) == (0.0, 3.0)
    assert interpolate(-4.0, 1.0, 8.0, 7.0, 2.0 / 3.0) == (4.0, 5.0)
    a = (2.3484976, 48.8275185)
    b = (2.3486683, 48.8275416)
    assert interpolate(*a, *b, 1.0 / 3.0) == (2.3485545, 48.8275262)
    assert interpolate(*a, *b, 2.0 / 3.0) == (2.3486114, 48.8275339)


def test_haversine_sanity():
    # ~1° of latitude ≈ 111.195 km on the IUGG sphere
    d = haversine(0.0, 0.0, 0.0, 1.0)
    assert abs(d - 111195.0) < 1.0
    assert haversine(2.0, 48.0, 2.0, 48.0) == 0.0


def test_haversine_np_matches_scalar():
    rng = np.random.default_rng(7)
    lon1, lat1 = rng.uniform(-180, 180, 50), rng.uniform(-90, 90, 50)
    lon2, lat2 = rng.uniform(-180, 180, 50), rng.uniform(-90, 90, 50)
    vec = haversine_np(lon1, lat1, lon2, lat2)
    for i in range(50):
        # numpy SIMD trig may differ from libm by ~1 ulp; parity contract
        # is on floor(metres) distributions, not raw double bits
        assert vec[i] == pytest.approx(haversine(lon1[i], lat1[i], lon2[i], lat2[i]), rel=1e-12)


# ---- float formatting (Rust f64::to_string parity) ----------------------


def test_format_f64_goldens():
    # exact strings the reference mints (src/discretize.rs fixture,
    # src/heuristics.rs:129-135 midpoint stringification)
    assert format_f64((48.8274242 + 48.8274352) / 2.0) == "48.827429699999996"
    assert format_f64((2.3486471 + 2.348721) / 2.0) == "2.34868405"
    assert format_f64(1.0) == "1"
    assert format_f64(-0.0) == "-0"
    assert format_f64(0.00005) == "0.00005"
    assert format_f64(1e20) == "100000000000000000000"
    assert format_f64(-1.5e-7) == "-0.00000015"


@given(st.floats(allow_nan=False, allow_infinity=False))
def test_format_f64_roundtrip(x):
    s = format_f64(x)
    assert "e" not in s and "E" not in s
    assert float(s) == x


# ---- OSM XML (reference src/openstreetmap.rs:90-105) --------------------


def test_extract_node_golden():
    line = '<node id="618904" lat="50.6011263" lon="3.2519549"/>'
    assert extract_node(line, SEP) == "618904␟50.6011263␟3.2519549"


def test_extract_link_golden():
    line = (
        '<way id="951505353"><nd ref="8807254574"/><nd ref="8807254575"/>'
        '<nd ref="8507963130"/><tag k="highway" v="residential"/></way>'
    )
    assert extract_way_pairs(line, SEP) == [
        "8807254574␟8807254575",
        "8807254575␟8507963130",
    ]


def test_extract_node_attr_order_insensitive():
    line = '<node lon="3.25" id="61" lat="50.60"/>'
    assert extract_node(line, SEP) == "61␟50.60␟3.25"


def test_format_lines_multiline_and_selfclosing():
    raw = [
        '<?xml version="1.0"?>',
        "<osm>",
        '  <node id="1" lat="48.0" lon="2.0"/>',
        '  <node id="2" lat="48.1" lon="2.1">',
        '    <tag k="a" v="b"/>',
        "  </node>",
        '  <way id="9">',
        '    <nd ref="1"/>',
        '    <nd ref="2"/>',
        '    <tag k="highway" v="residential"/>',
        "  </way>",
        "</osm>",
    ]
    assert format_lines(raw) == [
        '<node id="1" lat="48.0" lon="2.0"/>',
        '<node id="2" lat="48.1" lon="2.1"><tag k="a" v="b"/></node>',
        '<way id="9"><nd ref="1"/><nd ref="2"/><tag k="highway" v="residential"/></way>',
    ]


def test_extract_records_end_to_end():
    raw = [
        '<node id="1" lat="48.0" lon="2.0"/>',
        '<way id="9">',
        '  <nd ref="1"/>',
        '  <nd ref="2"/>',
        "</way>",
        '<way id="10"><nd ref="5"/></way>',  # single-ref way → no records
    ]
    assert extract_records(raw, SEP) == ["1␟48.0␟2.0", "1␟2"]


# ---- cell index ----------------------------------------------------------


def test_cell_roundtrip_and_parent():
    c = int(cell_id(2.3486683, 48.8275416, 20))
    assert cell_res(c) == 20
    ix, iy = cell_xy(c)
    n = 1 << 20
    assert 0 <= ix < n and 0 <= iy < n
    p = int(parent(c))
    assert cell_res(p) == 19
    pix, piy = cell_xy(p)
    assert pix == ix // 2 and piy == iy // 2


def test_cell_hierarchy_prefix_stability():
    # two nearby points in the same res-15 cell share that ancestor at res 20
    a = int(cell_id(2.34858295, 48.82753005, 20))
    b = int(cell_id(2.3485545, 48.8275262, 20))
    assert int(parent(a, 5)) == int(parent(b, 5))


def test_kring_counts_and_membership():
    c = int(cell_id(2.3486683, 48.8275416, 18))
    ring = kring(c, 1)
    assert len(ring) == 9 and c in ring
    ring2 = kring(c, 2)
    assert len(ring2) == 25 and set(ring) <= set(ring2)


def test_kring_wraps_antimeridian_and_clamps_pole():
    res = 10
    c = int(cell_id(-179.999, 0.0, res))  # ix == 0 → x must wrap
    ring = kring(c, 1)
    assert len(ring) == 9
    xs = {cell_xy(r)[0] for r in ring}
    assert (1 << res) - 1 in {int(x) for x in xs}  # wrapped neighbor
    cp = int(cell_id(0.0, 89.999, res))  # top row → y clamps
    assert len(kring(cp, 1)) == 6


def test_kring_np_matches_scalar():
    cs = cell_id([2.34, -179.999, 0.0], [48.82, 0.0, 89.999], 10)
    idx, neigh = kring_np(cs, 1)
    for i, c in enumerate(cs):
        expected = sorted(kring(int(c), 1))
        got = sorted(int(x) for x in neigh[idx == i])
        assert got == expected


def test_cell_res_bounds():
    with pytest.raises(ValueError):
        cell_id(0.0, 0.0, 29)


@given(
    st.floats(min_value=-180, max_value=180, allow_nan=False),
    st.floats(min_value=-90, max_value=90, allow_nan=False),
    st.integers(min_value=1, max_value=28),
)
def test_cell_parent_contains_child(lon, lat, res):
    child = int(cell_id(lon, lat, res))
    direct = int(cell_id(lon, lat, res - 1))
    assert int(parent(child)) == direct


def test_haversine_formula_shape_matches_reference_structure():
    # spot value: Paris fixture nodes ~42 m apart (order of magnitude guard)
    d = haversine(2.3484976, 48.8275185, 2.3486683, 48.8275416)
    assert 12.0 < d < 13.0  # ~12.7 m
    assert math.isclose(d, haversine_np([2.3484976], [48.8275185], [2.3486683], [48.8275416])[0])


def test_simhash60_batch_equals_scalar():
    from ophois_spark.kernels.text import simhash60, simhash60_batch

    lists = [
        "the quick brown fox the the quick".split(),
        [],
        [""],
        "unique tokens only here".split(),
    ]
    assert simhash60_batch(lists) == [simhash60(t) for t in lists]
