"""voronoi_assign pins: nearest-seed rule, floored-metre tie-break,
broadcast plan shape."""

from ophois_spark.operators.spatial import voronoi_assign


def _df(spark, rows, schema="id string, lon_d double, lat_d double"):
    return spark.createDataFrame(rows, schema)


def test_nearest_seed_wins(spark):
    pts = _df(spark, [("p1", 0.0, 0.0), ("p2", 1.0, 0.0)])
    seeds = _df(spark, [("sA", 0.1, 0.0), ("sB", 0.9, 0.0)])
    got = {r.id: r.seed_id for r in voronoi_assign(pts, seeds).collect()}
    assert got == {"p1": "sA", "p2": "sB"}


def test_equidistant_tie_to_smaller_seed_id(spark):
    # point exactly midway between two seeds on the equator: identical
    # floored distance -> smaller seed id
    pts = _df(spark, [("p", 0.5, 0.0)])
    seeds = _df(spark, [("sB", 0.0, 0.0), ("sA", 1.0, 0.0)])
    out = voronoi_assign(pts, seeds).collect()[0]
    assert out.seed_id == "sA"


def test_seed_assigned_to_itself_dist_zero(spark):
    pts = _df(spark, [("x", 3.0, 4.0)])
    seeds = _df(spark, [("x", 3.0, 4.0), ("y", 9.0, 9.0)])
    out = voronoi_assign(pts, seeds).collect()[0]
    assert (out.seed_id, out.dist_m) == ("x", 0)


def test_broadcast_no_shuffle_on_seed_side(spark):
    pts = _df(spark, [("p%d" % i, float(i) * 0.01, 0.0) for i in range(50)])
    seeds = _df(spark, [("s", 0.2, 0.0)])
    plan = voronoi_assign(pts, seeds)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
