"""Reproduce the Spark 4 localCheckpoint statistics cliff and the
stats_barrier fix (plans/barrier.py; found while building the Boruvka
loop, operators/mst.py).

Protocol: a 64-row successor table is pointer-doubled (s := s∘s, an
aggregation-free SELF-JOIN) for N steps, each step truncated with
(a) plain eager localCheckpoint and (b) stats_barrier. Spark 4's
checkpoint PRESERVES the source plan's estimated sizeInBytes
(LogicalRDD.rewriteStatsAndConstraints), and a self-join SQUARES it,
so under (a) the BigInt estimate's bit-length doubles per step and
Catalyst's stats walk goes super-linear (BigInteger.multiplyToomCook3
in a driver jstack); under (b) it resets each step. Rows are asserted
identical between arms every step.

Prints one JSON line: per-step wall times for both arms and the
estimate bit-lengths. The plain arm stops early once a single step
exceeds STEP_LIMIT_S — the cliff is the point, not a hung benchmark.
"""

import json
import sys
import time

# py4j converts the Java BigInteger stat through CPython's guarded
# int(str) path; the estimate reaches millions of digits, so the guard
# must go before the value can even cross the bridge
sys.set_int_max_str_digits(0)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ophois_spark.plans.barrier import stats_barrier

STEPS = 24
STEP_LIMIT_S = 20.0


def _bits(df) -> int:
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    ).bit_length()


def _double(s):
    return (
        s.alias("a")
        .join(s.select(F.col("comp").alias("s"), F.col("s").alias("s2")).alias("b"), "s")
        .select("comp", F.col("s2").alias("s"))
    )


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("ophois-barrier-probe")
        .getOrCreate()
    )
    base = spark.range(64).select(
        F.col("id").alias("comp"), ((F.col("id") + 1) % 64).alias("s")
    )

    plain_t, plain_bits = [], []
    s = base.localCheckpoint(eager=True)
    for _ in range(STEPS):
        t0 = time.time()
        s = _double(s).localCheckpoint(eager=True)
        dt_ckpt = time.time() - t0
        # probing the estimate REPLAYS the stats walk — on the plain arm
        # this is the expensive call, so it is timed and limited too
        t1 = time.time()
        plain_bits.append(_bits(s))
        dt = dt_ckpt + (time.time() - t1)
        plain_t.append(round(dt, 3))
        if dt > STEP_LIMIT_S:
            break
    plain_rows = sorted(map(tuple, s.collect())) if len(plain_t) == STEPS else None

    barrier_t, barrier_bits = [], []
    b = stats_barrier(base)
    for _ in range(STEPS):
        t0 = time.time()
        b = stats_barrier(_double(b))
        barrier_t.append(round(time.time() - t0, 3))
        barrier_bits.append(_bits(b))
    if plain_rows is not None:
        assert sorted(map(tuple, b.collect())) == plain_rows

    print(
        json.dumps(
            {
                "metric": "pointer-doubling step wall time, plain localCheckpoint vs stats_barrier",
                "unit": "sec/step",
                "steps_requested": STEPS,
                "plain_steps_completed": len(plain_t),
                "plain_step_s": plain_t,
                "plain_estimate_bits": plain_bits,
                "barrier_step_s": barrier_t,
                "barrier_estimate_bits": barrier_bits,
                "rows_parity_checked": plain_rows is not None,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
