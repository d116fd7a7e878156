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


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` to the session's default
    parallelism — ONLY if its planned partitioning has fewer splits.

    The gate makes this a no-op (not even a shuffle in the plan) for
    any at-scale input; it only fires on few-files-small-table layouts,
    where it moves the narrow pre-projection rows once so the expensive
    stage runs on every core. Row values are never changed, so results
    are identical either way.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
