"""colocation_pairs pins: slot distinctness, crowd cap, pair counting."""

from ophois_spark.operators.spatial import colocation_pairs


def _pts(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, t_us long, lat_d double, lon_d double"
    )


def test_repeat_pings_count_one_slot(spark):
    # users 1 and 2 both ping 3x in the same cell+bin -> n_bins = 1
    rows = [(1, t, 0.5, 0.5) for t in (0, 1, 2)] + [
        (2, t, 0.5, 0.5) for t in (3, 4, 5)
    ]
    out = colocation_pairs(_pts(spark, rows), grid_deg=1.0, bin_us=10).collect()
    assert [(r.user_a, r.user_b, r.n_bins) for r in out] == [(1, 2, 1)]


def test_multiple_shared_slots_accumulate(spark):
    # same cell in bins 0 and 2; different cells in bin 1
    rows = [
        (1, 0, 0.5, 0.5),
        (2, 1, 0.5, 0.5),
        (1, 10, 0.5, 0.5),
        (2, 10, 0.5, 9.5),
        (1, 20, 0.2, 0.2),
        (2, 25, 0.9, 0.9),
    ]
    out = colocation_pairs(_pts(spark, rows), grid_deg=1.0, bin_us=10).collect()
    assert [(r.user_a, r.user_b, r.n_bins) for r in out] == [(1, 2, 2)]


def test_crowd_slot_dropped(spark):
    # 4 users share one slot; crowd_max=3 -> slot contributes nothing,
    # but users 1,2 also share a quiet slot later -> only that survives
    rows = [(u, 0, 0.5, 0.5) for u in (1, 2, 3, 4)] + [
        (1, 10, 0.5, 0.5),
        (2, 12, 0.5, 0.5),
    ]
    out = colocation_pairs(
        _pts(spark, rows), grid_deg=1.0, bin_us=10, crowd_max=3
    ).collect()
    assert [(r.user_a, r.user_b, r.n_bins) for r in out] == [(1, 2, 1)]


def test_cell_and_bin_boundaries_separate(spark):
    rows = [(1, 9, 0.5, 0.5), (2, 10, 0.5, 0.5), (3, 9, 0.5, 1.5)]
    assert colocation_pairs(_pts(spark, rows), grid_deg=1.0, bin_us=10).count() == 0
