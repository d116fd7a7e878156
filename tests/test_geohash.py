"""geohash_cells pins: published reference hashes, prefix-parent rule,
pole/antimeridian clamping, codegen plan shape."""

from ophois_spark.operators.spatial import geohash_cells


def _df(spark, rows):
    return spark.createDataFrame(rows, "id string, lon_d double, lat_d double")


def test_published_reference_hashes(spark):
    # Eiffel Tower and the Wikipedia geohash article's example point
    df = _df(
        spark,
        [("eiffel", 2.2945, 48.8583), ("wiki", 10.40744, 57.64911), ("origin", 0.0, 0.0)],
    )
    got = {r.id: (r.gh, r.gh_parent) for r in geohash_cells(df).collect()}
    assert got["eiffel"] == ("u09tunq", "u09tu")
    assert got["wiki"][0] == "u4pruyd"  # prefix of u4pruydqqvj
    assert got["origin"][0] == "s000000"


def test_parent_is_prefix_truncation(spark):
    df = _df(spark, [("a", -73.9857, 40.7484)])  # Empire State Building
    r = geohash_cells(df, precision=9).collect()[0]
    assert r.gh.startswith("dr5ru")
    assert r.gh_parent == r.gh[:7]


def test_edge_clamping(spark):
    df = _df(spark, [("ne", 179.9999, 89.9999), ("sw", -179.9999, -89.9999), ("over", 180.0, 90.0)])
    got = {r.id: r.gh for r in geohash_cells(df, precision=3).collect()}
    assert got["ne"] == "zzz" and got["sw"] == "000"
    assert got["over"] == "zzz"  # clamp keeps out-of-range input in-grid


def test_pure_codegen_no_python(spark):
    df = _df(spark, [("a", 1.0, 1.0)])
    plan = geohash_cells(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
