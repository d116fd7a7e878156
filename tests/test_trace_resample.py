"""trace_resample pins: boundary inclusion rule, no extrapolation,
zero-duration pairs, exact interpolation values."""

from ophois_spark.operators.trajectory import trace_resample


def _pts(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, t_us long, lat_d double, lon_d double"
    )


def test_boundaries_and_values(spark):
    # step 10: pings at t=5 (lat 0) and t=25 (lat 2) -> boundaries 10, 20
    # f = 0.25, 0.75 -> lat 0.5, 1.5 -> mlat 500000, 1500000
    df = _pts(spark, [(1, 1, 5, 0.0, 0.0), (1, 2, 25, 2.0, 2.0)])
    got = {
        r.epoch_us: (r.mlat, r.mlon) for r in trace_resample(df, 10).collect()
    }
    assert got == {10: (500000, 500000), 20: (1500000, 1500000)}


def test_at_or_before_next_strictly_after_prev(spark):
    # ping exactly ON a boundary: t=10 emits for the (5,10] pair
    # (k1 = 1), and the next pair (10, 12] emits nothing (k0=2 > k1=1)
    df = _pts(spark, [(1, 1, 5, 0.0, 0.0), (1, 2, 10, 1.0, 1.0), (1, 3, 12, 9.0, 9.0)])
    got = {r.epoch_us: r.mlat for r in trace_resample(df, 10).collect()}
    assert got == {10: 1000000}


def test_no_extrapolation_and_empty_pairs(spark):
    # single ping -> no pairs; pair inside one step window -> nothing
    df = _pts(spark, [(1, 1, 11, 0.0, 0.0), (2, 1, 11, 0.0, 0.0), (2, 2, 14, 1.0, 1.0)])
    assert trace_resample(df, 10).count() == 0


def test_duplicate_timestamp_pair_skipped(spark):
    # equal t on consecutive pings spans no boundary -> no div-by-zero
    df = _pts(spark, [(1, 1, 10, 0.0, 0.0), (1, 2, 10, 5.0, 5.0), (1, 3, 21, 1.0, 1.0)])
    got = {r.epoch_us: r.mlat for r in trace_resample(df, 10).collect()}
    # pair (10,21] interpolates from the SECOND ping at t=10 (lag order
    # by (t, event_id)): boundary 20 -> f=10/11, lat = 5 + (1-5)*10/11
    import math

    exp = math.floor((5.0 + (1.0 - 5.0) * (10.0 / 11.0)) * 1e6)
    assert got == {20: exp}


def test_long_gap_emits_every_boundary(spark):
    df = _pts(spark, [(1, 1, 0, 0.0, 0.0), (1, 2, 100, 10.0, 0.0)])
    out = trace_resample(df, 10).collect()
    assert sorted(r.epoch_us for r in out) == [10 * k for k in range(1, 11)]
    assert {r.epoch_us: r.mlat for r in out}[50] == 5000000
