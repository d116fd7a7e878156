"""Unit pins for the round-4 zorder_cells and user_rate_outliers ops.

The registry-wide oracle sweep (test_oracle_parity.py) gates both
against DuckDB; these are the fast-path pins for the exact-bit
contracts: Morton interleave against hand-computed values, and the
integer-MAD outlier rule on a corpus with a known anomaly.
"""

import pyspark.sql.functions as F
import pytest

from ophois_spark.operators.spatial import zorder_key
from ophois_spark.operators.temporal import user_rate_outliers


def morton(ix: int, iy: int, bits: int = 12) -> int:
    k = 0
    for b in range(bits):
        k |= ((ix >> b) & 1) << (2 * b)
        k |= ((iy >> b) & 1) << (2 * b + 1)
    return k


def test_zorder_key_matches_reference_interleave(spark):
    cases = [(0, 0), (1, 0), (0, 1), (1, 1), (5, 9), (4095, 4095), (2730, 1365)]
    df = spark.createDataFrame(cases, "ix long, iy long").withColumn(
        "zkey", zorder_key(F.col("ix"), F.col("iy"))
    )
    got = {(r.ix, r.iy): r.zkey for r in df.collect()}
    for ix, iy in cases:
        assert got[(ix, iy)] == morton(ix, iy), (ix, iy)


def test_zorder_key_locality_monotone_on_quadrants(spark):
    # all keys in the lower-left quadrant of a 2-bit grid precede all
    # keys in the upper-right quadrant — the property range scans use
    lo = [morton(x, y, 2) for x in (0, 1) for y in (0, 1)]
    hi = [morton(x, y, 2) for x in (2, 3) for y in (2, 3)]
    assert max(lo) < min(hi)


def test_user_rate_outliers_flags_known_spike(spark):
    # user "a": 1 event/day for 9 days, then a 50-event day.
    # user "b": flat 2/day — never flagged.
    rows = []
    for d in range(9):
        rows.append(("a", d * 86400))
    rows += [("a", 9 * 86400 + i) for i in range(50)]
    for d in range(5):
        rows += [("b", d * 86400), ("b", d * 86400 + 1)]
    df = spark.createDataFrame(rows, "user_id string, t long").select(
        "user_id", F.from_unixtime("t").cast("timestamp").alias("ts")
    )
    out = user_rate_outliers(df).collect()
    flags = {(r.user_id, r.day): (r.n_events, r.med, r.mad, r.is_outlier) for r in out}
    assert flags[("a", 9)][0] == 50 and flags[("a", 9)][3] == 1
    assert all(v[3] == 0 for k, v in flags.items() if k != ("a", 9))
    # user a's median/MAD come from the 9 ones + one 50: lower median 1, mad 0
    assert flags[("a", 0)][1] == 1 and flags[("a", 0)][2] == 0


def test_user_rate_outliers_min_abs_floor(spark):
    # mad=0 user whose deviation is exactly OUTLIER_MIN_ABS must NOT
    # flag (rule is strict >): 3/day for 4 days then a 5-event day.
    rows = []
    for d in range(4):
        rows += [("u", d * 86400 + i) for i in range(3)]
    rows += [("u", 4 * 86400 + i) for i in range(5)]
    df = spark.createDataFrame(rows, "user_id string, t long").select(
        "user_id", F.from_unixtime("t").cast("timestamp").alias("ts")
    )
    out = {r.day: r.is_outlier for r in user_rate_outliers(df).collect()}
    assert out[4] == 0
