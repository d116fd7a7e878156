"""trip_segments semantics + slabbed == naive parity (the sessionize
discipline: the scale decomposition must be output-invisible, including
cuts that land exactly on slab boundaries)."""

from ophois_spark.kernels.geo import haversine
from ophois_spark.operators.trajectory import (
    od_matrix,
    trip_segments,
    trip_segments_naive,
)

GAP = 1_000_000  # 1 s
JUMP = 50  # m


def _pts(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, t_us long, lat_d double, lon_d double"
    )


def _collect(df):
    return sorted(
        (tuple(r) for r in df.collect()), key=lambda t: (t[0], t[1])
    )


def test_time_and_space_cuts(spark):
    # u1: two points 0.5s apart but ~111m apart -> SPATIAL cut;
    # then a third point close in space but 2s later -> TIME cut
    rows = [
        (1, 1, 0, 45.0, 5.0),
        (1, 2, 500_000, 45.001, 5.0),  # ~111 m jump > 50
        (1, 3, 2_500_000, 45.001, 5.00001),  # ~0.8 m but 2 s gap
    ]
    out = {r["trip_id"]: r for r in trip_segments(
        _pts(spark, rows), GAP, JUMP, slab_us=10_000_000
    ).collect()}
    assert len(out) == 3
    assert all(r["n_points"] == 1 and r["path_m"] == 0 for r in out.values())
    # origin == destination cell for single-point trips
    assert all(
        (r["o_gx"], r["o_gy"]) == (r["d_gx"], r["d_gy"]) for r in out.values()
    )


def test_path_sum_and_endpoints(spark):
    # 3-point trip heading north ~11m per step (within both bounds)
    rows = [
        (7, 1, 0, 45.0, 5.0),
        (7, 2, 100_000, 45.0001, 5.0),
        (7, 3, 200_000, 45.0002, 5.0),
    ]
    (r,) = trip_segments(_pts(spark, rows), GAP, JUMP, slab_us=10_000_000).collect()
    step = int(haversine(5.0, 45.0, 5.0, 45.0001))
    assert r["n_points"] == 3
    assert r["path_m"] == 2 * step
    assert (r["o_gy"], r["d_gy"]) == (45000, 45000)
    assert r["start_us"] == 0 and r["end_us"] == 200_000


def test_slabbed_equals_naive_across_boundaries(spark):
    # hot key: 400 points, mixed micro-steps and jumps, slab size chosen
    # so trips straddle slab boundaries; plus a second sparse key
    rows = []
    for i in range(400):
        jump = 0.001 if i % 37 == 0 else 0.00001
        rows.append(
            (
                9,
                i,
                i * 400_000,  # 0.4 s cadence; slab 3 s -> ~7 pts/slab
                45.0 + (i % 37) * jump,
                5.0 + ((i * 3) % 11) * 0.00001,
            )
        )
    rows += [(5, i, i * 5_000_000, 45.0, 5.0 + i * 0.00002) for i in range(10)]
    pts = _pts(spark, rows)
    slab = trip_segments(pts, GAP, JUMP, slab_us=3_000_000)
    naive = trip_segments_naive(pts, GAP, JUMP)
    assert _collect(slab) == _collect(naive)


def test_slab_boundary_head_cut_uses_previous_point(spark):
    # two points in DIFFERENT slabs, close in time+space -> ONE trip:
    # proves the head row sees the previous slab's carry point
    rows = [(3, 1, 900_000, 45.0, 5.0), (3, 2, 1_100_000, 45.00001, 5.0)]
    out = trip_segments(_pts(spark, rows), GAP, JUMP, slab_us=1_000_000).collect()
    assert len(out) == 1 and out[0]["n_points"] == 2


def test_od_matrix_rolls_up_trips(spark):
    # steps of ~39/31 m stay under JUMP, so each user walks ONE trip
    # from cell gx=5000 into gx=5001 (users 1,2) or the reverse (user 4)
    walk = [5.0004, 5.0009, 5.0013]
    rows = []
    for u, lons in ((1, walk), (2, walk), (4, walk[::-1])):
        rows += [(u, i, i * 500_000, 45.0, lon) for i, lon in enumerate(lons)]
    trips = trip_segments(_pts(spark, rows), GAP, JUMP, slab_us=10_000_000)
    od = {
        (r["o_gx"], r["d_gx"]): (r["n_trips"], r["total_path_m"])
        for r in od_matrix(trips).collect()
    }
    assert od[(5000, 5001)][0] == 2
    assert od[(5001, 5000)][0] == 1
    # forward and reverse paths have the same exact integer length
    assert od[(5000, 5001)][1] == 2 * od[(5001, 5000)][1]


def test_stay_points_between_trips(spark):
    from ophois_spark.operators.trajectory import stay_points

    # u1: trip A ends at cell (5000,45000); 10 s later trip B departs
    # from the SAME cell -> one dwell. u2: next trip departs a
    # DIFFERENT cell (teleport jump) -> no dwell.
    rows = [
        (1, 1, 0, 45.0, 5.0), (1, 2, 500_000, 45.0, 5.0001),
        (1, 3, 10_500_000, 45.0, 5.0002), (1, 4, 11_000_000, 45.0, 5.0003),
        (2, 1, 0, 45.0, 5.0), (2, 2, 10_000_000, 45.0, 5.01),
    ]
    pts = spark.createDataFrame(
        rows, "user_id long, event_id long, t_us long, lat_d double, lon_d double"
    )
    trips = trip_segments(pts, GAP, JUMP, slab_us=100_000_000)
    out = stay_points(trips, min_dwell_us=5_000_000).collect()
    assert len(out) == 1
    (r,) = out
    assert r["user_id"] == 1 and (r["gx"], r["gy"]) == (5000, 45000)
    assert r["arrive_us"] == 500_000 and r["depart_us"] == 10_500_000
    assert r["dwell_us"] == 10_000_000

    # below the dwell floor -> filtered
    assert stay_points(trips, min_dwell_us=20_000_000).count() == 0
