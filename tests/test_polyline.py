"""RDP polyline simplification semantics, pinned against a pure-Python
recursive Douglas-Peucker twin with the IDENTICAL integer contract
(strict squared-cross comparison, lowest-seq tie break, degenerate-
segment point-distance fallback). The DuckDB unrolled-oracle gate is in
test_oracle_parity; this pins the operator independently of SQL."""

from ophois_spark.operators.polyline import rdp_simplify


def _rdp_py(pts, eps):
    """Reference recursive RDP over [(seq, x, y)], returns kept seqs."""
    eps2 = eps * eps
    kept = set()

    def rec(lo, hi):
        kept.add(pts[lo][0])
        kept.add(pts[hi][0])
        if hi - lo < 2:
            return
        ax, ay = pts[lo][1], pts[lo][2]
        bx, by = pts[hi][1], pts[hi][2]
        dx, dy = bx - ax, by - ay
        best = None
        for i in range(lo + 1, hi):
            px, py = pts[i][1] - ax, pts[i][2] - ay
            if dx == 0 and dy == 0:
                lhs, rhs = px * px + py * py, eps2
            else:
                cr = dx * py - px * dy
                lhs, rhs = cr * cr, eps2 * (dx * dx + dy * dy)
            # strict max, ties to the LOWEST seq (first strict winner)
            if best is None or lhs > best[0]:
                best = (lhs, rhs, i)
        if best[0] > best[1]:
            rec(lo, best[2])
            rec(best[2], hi)

    rec(0, len(pts) - 1)
    return kept


def _walk(way_id, n, mx, my):
    """Deterministic integer random-walk way."""
    pts, x, y = [], 0, 0
    for i in range(n):
        x += ((way_id * 977 + i * mx) % 2001) - 1000
        y += ((way_id * 661 + i * my) % 2001) - 1000
        pts.append((i, x, y))
    return pts


def _run(spark, rows, eps):
    df = spark.createDataFrame(rows, "way_id long, seq long, x long, y long")
    kept, rounds = rdp_simplify(df, eps=eps)
    return {(r.way_id, r.seq) for r in kept.collect()}, rounds


def test_rdp_matches_python_twin_multiway(spark):
    ways = {w: _walk(w, 20, 2654435761, 2246822519) for w in range(5)}
    rows = [(w, s, x, y) for w, pts in ways.items() for (s, x, y) in pts]
    got, rounds = _run(spark, rows, eps=500)
    want = {(w, s) for w, pts in ways.items() for s in _rdp_py(pts, 500)}
    assert got == want
    assert 1 <= rounds <= 19


def test_rdp_collinear_drops_everything(spark):
    rows = [(1, i, i * 7, i * 3) for i in range(12)]
    got, rounds = _run(spark, rows, eps=1)
    assert got == {(1, 0), (1, 11)}
    assert rounds == 1


def test_rdp_spike_survives_any_eps(spark):
    # flat line with one huge spike: the spike splits, flats drop
    rows = [(1, i, i * 100, 0 if i != 5 else 10**6) for i in range(11)]
    got, _ = _run(spark, rows, eps=900)
    assert (1, 5) in got
    assert got == {(1, 0), (1, 5), (1, 10)}


def test_rdp_degenerate_closed_loop(spark):
    # endpoints coincide (len2 == 0): fallback is point distance to A
    rows = [(1, 0, 0, 0), (1, 1, 50, 0), (1, 2, 0, 60), (1, 3, 0, 0)]
    got, _ = _run(spark, rows, eps=55)
    # |P1| = 50 <= 55 candidate, |P2| = 60 > 55 -> split at seq 2 (max),
    # then chords (0,0)-(0,60) and (0,60)-(0,0): P1 at distance 50 < 55
    assert got == {(1, 0), (1, 2), (1, 3)}


def test_rdp_two_point_and_short_ways(spark):
    rows = [(1, 0, 0, 0), (1, 1, 9, 9), (2, 0, 5, 5)]
    got, rounds = _run(spark, rows, eps=10)
    assert got == {(1, 0), (1, 1), (2, 0)}
    assert rounds == 0
