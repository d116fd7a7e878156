"""cell_trend pins: Mann-Kendall semantics on hand-built fields —
zero-filling, monotone runs, flat cells, single-day span."""

from ophois_spark.operators.trajectory import trace_resample  # noqa: F401  (fixture warm)
from ophois_spark.operators.spatial import cell_trend


def _pts(spark, rows):
    # rows: (t_us, lat_d, lon_d)
    return spark.createDataFrame(rows, "t_us long, lat_d double, lon_d double")


def test_monotone_up_and_down(spark):
    # cell A (0,0): counts 1,2,3 over days 0..2 -> S = +3 (max for n=3)
    # cell B (1,0): counts 3,0,0 (active day 0 only, ZERO-FILLED after)
    #   pairs: (3,0)-1 (3,0)-1 (0,0)0 -> S = -2
    rows = []
    day = 10  # day_us=10 for the test
    for d, n in [(0, 1), (1, 2), (2, 3)]:
        rows += [(d * day, 0.5, 0.5)] * n
    rows += [(0, 0.5, 1.5)] * 3
    out = {
        (r.gx, r.gy): (r.n_days, r.total, r.s_stat)
        for r in cell_trend(_pts(spark, rows), grid_deg=1.0, day_us=day).collect()
    }
    assert out == {(0, 0): (3, 6, 3), (1, 0): (3, 3, -2)}


def test_flat_cell_zero_stat(spark):
    day = 10
    rows = [(0, 0.5, 0.5), (day, 0.5, 0.5), (2 * day, 0.5, 0.5)]
    out = cell_trend(_pts(spark, rows), grid_deg=1.0, day_us=day).collect()
    assert len(out) == 1 and out[0].s_stat == 0 and out[0].n_days == 3


def test_single_day_span_no_pairs(spark):
    rows = [(3, 0.5, 0.5), (7, 1.5, 0.5)]
    out = cell_trend(_pts(spark, rows), grid_deg=1.0, day_us=10).collect()
    assert {(r.gx, r.gy, r.n_days, r.s_stat) for r in out} == {
        (0, 0, 1, 0),
        (0, 1, 1, 0),  # lat 1.5 -> gy 1
    }


def test_global_span_applies_to_all_cells(spark):
    # cell active only on the LAST global day must trend UP from zeros
    day = 10
    rows = [(0, 0.5, 0.5), (2 * day, 0.5, 0.5), (2 * day, 0.5, 1.5), (2 * day, 0.5, 1.5)]
    out = {
        (r.gx, r.gy): r.s_stat
        for r in cell_trend(_pts(spark, rows), grid_deg=1.0, day_us=day).collect()
    }
    # cell (1,0): 0,0,2 -> pairs +1 +1 0 -> +2
    assert out[(1, 0)] == 2
