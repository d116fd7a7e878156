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

import math
import re

from pyspark.sql import DataFrame

# logical operators that force a shuffle downstream of the scan — a
# frame whose optimized plan contains any of these is (re)partitioned
# to spark.sql.shuffle.partitions, not to its leaf file splits. Matched
# as the node NAME at the head of a plan line (after tree-drawing
# prefixes), never as a bare substring — a column literal containing
# "Sort" must not trip the gate.
_WIDE_NODE_RE = re.compile(
    r"^[\s:+\-*(]*(Aggregate|Join|Window|Sort|Repartition|"
    r"RepartitionByExpression|Rebalance\w*|Deduplicate|Except|Intersect)\b",
    re.M,
)


_SIZE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
}


def _size_bytes(value: str) -> int:
    """Parse a Spark byte-size config value. ``spark.conf.get`` returns
    the SET form, which may carry a JEC suffix (``"4194304b"``,
    ``"128m"``) — bare ``int()`` rejects those."""
    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]*)\s*", value)
    if not m:
        raise ValueError(f"unparseable byte size: {value!r}")
    return int(m.group(1)) * _SIZE_SUFFIX[m.group(2).lower()]


def _file_len(spark, uri: str) -> int:
    """Byte length of one leaf file via the JVM Hadoop FS (works for
    any scheme the session can read). Raises on any failure — the
    caller treats unknown sizes as 'assume at-scale, do not fire'."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(uri)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getFileStatus(path).getLen()


def _planned_splits(df: DataFrame) -> int:
    """Estimate the frame's scan task count WITHOUT physical planning.

    ``df.rdd.getNumPartitions()`` would force a full (non-AQE) physical
    plan per call and, behind a shuffle, report the static
    ``spark.sql.shuffle.partitions`` anyway — so read that config
    directly for wide lineages, and for pure scan lineages replay
    Spark's own file-split planning formula
    (``FilePartition.maxSplitBytes``):

        maxSplitBytes = min(maxPartitionBytes,
                            max(openCostInBytes, totalBytes / parallelism))
        splits ≈ ceil(totalBytes / maxSplitBytes)

    with totalBytes = Σ(file size + openCostInBytes). File COUNT alone
    is wrong in both directions: Spark range-splits one large parquet
    file into many tasks (a 10 GB single-file table must NOT be
    round-robined through a full shuffle) and bin-packs many tiny files
    toward ``defaultParallelism``. Known slack: parquet row-group
    granularity can leave some planned ranges empty — acceptable,
    because over-estimating splits only makes the gate a no-op, never
    adds a shuffle. Unknown sizes (stat failure) are treated as
    at-scale for the same reason. The stat cost is bounded: a frame
    with ≥ parallelism leaf files packs to ≥ parallelism splits under
    the same formula, so it early-exits before any stat.
    """
    spark = df.sparkSession
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return shuffle_p
    if _WIDE_NODE_RE.search(plan):
        return shuffle_p
    try:
        files = df.inputFiles()
    except Exception:
        return shuffle_p
    if not files:
        return shuffle_p
    parallelism = spark.sparkContext.defaultParallelism
    if len(files) >= parallelism:
        return len(files)
    try:
        open_cost = _size_bytes(
            spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
        )
        max_pb = _size_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
        total = sum(_file_len(spark, f) + open_cost for f in files)
    except Exception:
        return max(len(files), parallelism)  # unknown ⇒ assume at-scale
    max_split = min(max_pb, max(open_cost, total // max(1, parallelism)))
    return max(len(files), math.ceil(total / max(1, max_split)))


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
