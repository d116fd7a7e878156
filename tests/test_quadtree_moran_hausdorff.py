"""Fast invariant pins for quadtree_bins / cell_moran / trip_hausdorff.

The registry-wide oracle sweep gates all three against DuckDB; these
pin the semantic invariants on tiny hand-built inputs.
"""

import pyspark.sql.functions as F

from ophois_spark.operators.spatial import cell_moran, quadtree_bins
from ophois_spark.operators.trajectory import trip_hausdorff


def test_quadtree_leaves_partition_input_and_respect_threshold(spark):
    # dense blob of 90 in one finest cell + a sparse spread
    rows = [(0.0005, 0.0005)] * 90
    rows += [(x * 0.013 + 0.001, y * 0.013 + 0.001) for x in range(6) for y in range(6)]
    df = spark.createDataFrame(rows, "lon_d double, lat_d double")
    out = quadtree_bins(df, grid_deg=0.001, levels=4, threshold=16).collect()
    assert sum(r.n_points for r in out) == len(rows)
    # every non-finest leaf fits the threshold; the blob exceeds it but
    # sits at the finest level (cannot split further)
    for r in out:
        assert r.lvl == 3 or r.n_points <= 16
    blob = [r for r in out if r.n_points >= 90]
    assert blob and blob[0].lvl == 3


def test_quadtree_all_coarse_when_sparse(spark):
    rows = [(x * 0.02, y * 0.02) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "lon_d double, lat_d double")
    out = quadtree_bins(df, grid_deg=0.001, levels=3, threshold=100).collect()
    assert all(r.lvl == 0 for r in out)
    assert sum(r.n_points for r in out) == 16


def test_cell_moran_deviations_sum_zero_and_clustered_positive(spark):
    # two dense cells side by side + far sparse cells: dense pair has
    # positive local_i (high next to high), sparse near dense negative
    rows = [(0.0005, 0.0005)] * 50 + [(0.0015, 0.0005)] * 50
    rows += [(0.0105, 0.0005), (0.0205, 0.0005)]
    df = spark.createDataFrame(rows, "lon_d double, lat_d double")
    out = {(r.gx, r.gy): r for r in cell_moran(df, grid_deg=0.001).collect()}
    assert sum(r.d for r in out.values()) == 0
    assert out[(0, 0)].local_i > 0 and out[(1, 0)].local_i > 0
    # isolated sparse cells surface with zero weights/lag
    assert out[(10, 0)].w_n == 0 and out[(10, 0)].local_i == 0
    r = out[(0, 0)]
    assert r.x == 50 and r.w_n == 1 and r.lag_d == out[(1, 0)].d


def test_trip_hausdorff_identical_and_shifted_routes(spark):
    # user 1: trip 0 and trip 1 retrace the same 3 points -> H = 0;
    # user 2: trip 1 shifted ~111 m north of trip 0
    pts = []
    for trip in (0, 1):
        for k in range(3):
            pts.append((1, trip, k + trip * 10, 45.0, 5.0 + k * 0.001))
    for trip in (0, 1):
        for k in range(3):
            pts.append((2, trip, k + trip * 10, 45.0 + trip * 0.001, 5.0 + k * 0.001))
    df = spark.createDataFrame(
        pts, "user_id long, trip_id long, event_id long, lat_d double, lon_d double"
    ).withColumn("t_us", F.col("event_id"))
    out = {r.user_id: r for r in trip_hausdorff(df).collect()}
    assert out[1].hausdorff_m == 0
    assert 100 <= out[2].hausdorff_m <= 120  # ~111 m per 0.001 deg lat
    assert out[2].h_ab_m == out[2].h_ba_m
    assert out[1].trip_a == 0 and out[1].trip_b == 1
