"""map_match_viterbi: exact DP vs brute-force path enumeration (the
pytest gate for the one non-SQL-expressible trajectory operator), plus
hand-checkable semantics on a two-road fork."""

import itertools
import math

import pytest

from ophois_spark.operators.trajectory import map_match_viterbi

SIGMA, BETA = 5.0, 10.0
KX = math.cos(math.radians(45.0)) * 111195.07973436874
KY = 111195.07973436874


def _segments(spark, rows):
    return spark.createDataFrame(
        rows, "edge_id long, alat double, alon double, blat double, blon double"
    )


def _points(spark, rows):
    return spark.createDataFrame(
        rows, "trace_id long, step_idx long, lat_d double, lon_d double"
    )


def _brute_best(cands, gps):
    """Enumerate every candidate combination; return the argmin path.

    cands: per step, list of (edge_id, dist_m, mx_deg, my_deg);
    gps: per step, (lon_d, lat_d). Tie-break mirrors the DP: paths
    compared by (cost, edge ids) after sorting candidates by edge_id.
    """
    best = None
    for combo in itertools.product(*[sorted(c) for c in cands]):
        cost = sum((d / SIGMA) ** 2 for _, d, _, _ in combo)
        for (e0, d0, x0, y0), (e1, d1, x1, y1), (g0, g1) in zip(
            combo, combo[1:], zip(gps, gps[1:])
        ):
            gps_step = math.hypot(
                (g1[0] - g0[0]) * KX, (g1[1] - g0[1]) * KY
            )
            cand_step = math.hypot((x1 - x0) * KX, (y1 - y0) * KY)
            cost += abs(cand_step - gps_step) / BETA
        key = (cost, tuple(e for e, *_ in combo))
        if best is None or key < best[0]:
            best = (key, combo)
    return [e for e, *_ in best[1]]


def test_fork_prefers_consistent_road(spark):
    # two parallel roads ~22m apart; GPS hugs road 1 but one noisy
    # point sits exactly between them — the transition term must keep
    # the match on road 1 (pure nearest-snap would be ambiguous)
    segs = []
    for i in range(4):
        x = 5.0 + i * 0.001
        segs.append((10 + i, 45.0, x, 45.0, x + 0.001))  # road 1
        segs.append((20 + i, 45.0002, x, 45.0002, x + 0.001))  # road 2
    pts = [(1, i, 45.00003, 5.0005 + i * 0.001) for i in range(4)]
    out = map_match_viterbi(
        _points(spark, pts), _segments(spark, segs), radius_m=30.0,
        k=4, sigma_m=SIGMA, beta_m=BETA,
    ).collect()
    got = {r["step_idx"]: r["edge_id"] for r in out}
    assert got == {0: 10, 1: 11, 2: 12, 3: 13}


def test_viterbi_matches_brute_enumeration(spark):
    # irregular mesh: 12 short segments, 5-step trace weaving between
    # them; DP must equal exhaustive enumeration over candidate paths
    segs = []
    for i in range(12):
        y = 45.0 + (i % 3) * 0.0002
        x = 5.0 + (i // 3) * 0.0008 + (i % 2) * 0.0001
        segs.append((100 + i, y, x, y + 0.00005, x + 0.0004))
    pts = [
        (7, s, 45.0 + ((s * 2) % 3) * 0.0002 + 0.00002, 5.0004 + s * 0.0007)
        for s in range(5)
    ]
    sdf, pdf = _segments(spark, segs), _points(spark, pts)
    out = map_match_viterbi(
        pdf, sdf, radius_m=40.0, k=4, sigma_m=SIGMA, beta_m=BETA
    ).collect()
    got = [r["edge_id"] for r in sorted(out, key=lambda r: r["step_idx"])]

    # rebuild the same candidate sets the snap produces
    from ophois_spark.operators.spatial import snap_points_to_edges
    from pyspark.sql import functions as F

    q = pdf.select(
        (F.col("trace_id") * (1 << 20) + F.col("step_idx")).alias("qid"),
        "lat_d", "lon_d",
    )
    cand = snap_points_to_edges(q, sdf, 40.0, 0.001, 4).collect()
    mids = {e: ((y0 + y1) / 2, (x0 + x1) / 2) for e, y0, x0, y1, x1 in segs}
    by_step: dict[int, list] = {}
    for r in cand:
        s = r["qid"] % (1 << 20)
        my, mx = mids[r["edge_id"]]
        by_step.setdefault(s, []).append((r["edge_id"], r["dist_m"], mx, my))
    assert sorted(by_step) == list(range(5)), "every step must have candidates"
    gps = [(p[3], p[2]) for p in pts]
    exp = _brute_best([by_step[s] for s in range(5)], gps)
    assert got == exp


def test_gap_breaks_trace_into_chains(spark):
    # step 1 has no road within the radius -> steps 0 and 2 solve as
    # independent chains; the uncovered step emits nothing
    segs = [(1, 45.0, 5.0, 45.0, 5.001), (2, 45.0, 5.01, 45.0, 5.011)]
    pts = [
        (3, 0, 45.00001, 5.0005),
        (3, 1, 45.005, 5.005),  # ~500m from every road
        (3, 2, 45.00001, 5.0105),
    ]
    out = map_match_viterbi(
        _points(spark, pts), _segments(spark, segs), radius_m=25.0, k=2
    ).collect()
    got = {r["step_idx"]: r["edge_id"] for r in out}
    assert got == {0: 1, 2: 2}
