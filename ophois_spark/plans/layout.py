"""Input-layout helpers for CPU-dense per-row stages.

A projection-heavy stage (regex tokenize → shingle → md5, or the
winnowing k-gram transform) parallelizes exactly as far as its INPUT
split count: Spark cannot subdivide a running task. At production
scale that is a non-issue — a 100 TB table scans as tens of thousands
of splits — but a small benchmark/test table often lands in ONE
parquet file with one row group, and then the whole chain serializes
onto a single core no matter how many the session has (measured: the
winnowing fingerprint over 5 000 docs takes 12.7 s on the 1-split scan
vs 1.8 s after fan-out on 32 cores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# logical operators that force a shuffle downstream of the scan — a
# frame whose optimized plan contains any of these is (re)partitioned
# to spark.sql.shuffle.partitions, not to its leaf file splits
_WIDE_NODES = (
    "Aggregate",
    "Join",
    "Window",
    "Sort",
    "Repartition",
    "Deduplicate",
    "Except",
    "Intersect",
)


def _planned_splits(df: DataFrame) -> int:
    """Estimate the frame's task count WITHOUT physical planning.

    ``df.rdd.getNumPartitions()`` would force a full (non-AQE) physical
    plan per call and, behind a shuffle, report the static
    ``spark.sql.shuffle.partitions`` anyway — so read that config
    directly for wide lineages and count leaf file splits for pure
    scan lineages (a small table below ``maxPartitionBytes`` never
    splits beyond its file count, which is the case this gate exists
    for). The reading is the PRE-adaptive partition count by design:
    AQE coalesces on shuffle bytes, not CPU cost, and this gate guards
    a CPU-dense stage.
    """
    spark = df.sparkSession
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return shuffle_p
    if any(node in plan for node in _WIDE_NODES):
        return shuffle_p
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    return len(files) if files else shuffle_p


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` to the session's default
    parallelism — ONLY if its planned layout has fewer splits.

    The gate makes this a no-op (not even a shuffle in the plan) for
    any at-scale input; it only fires on few-files-small-table layouts,
    where it moves the narrow pre-projection rows once so the expensive
    stage runs on every core. Row values are never changed, so results
    are identical either way.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if _planned_splits(df) >= target:
        return df
    return df.repartition(target)
