"""Statistics-truncating checkpoint barrier for self-join fixpoints.

Spark 4's ``Dataset.localCheckpoint`` truncates LINEAGE but preserves
the source plan's estimated statistics through
``LogicalRDD.rewriteStatsAndConstraints`` (ExistingRDD.scala:263,
observed in a driver jstack). ``SizeInBytesOnlyStatsPlanVisitor``
estimates an inner join as the PRODUCT of its children's sizeInBytes,
so an iterative operator whose per-round plan joins the previous
round's result WITH ITSELF (pointer doubling: ``s := s ∘ s``) doubles
the BigInt's bit-length every round even though every round is
checkpointed. After ~20 compounded self-joins Catalyst spends minutes
inside ``BigInteger.multiplyToomCook3`` re-estimating a 15k-row
relation — measured on the Boruvka loop at sf0.01: round 2 ≈ 2 s,
round 4 ≈ 300 s, then driver OOM at default heap. Aggregation-bearing
loops (label propagation, PageRank) are unaffected because the
per-round groupBy deflates the estimate; ONLY aggregation-free
self-join chains compound.

``stats_barrier`` rebuilds the Dataset from the just-checkpointed
RDD via ``SparkSession.internalCreateDataFrame``, which assigns a
fresh ``LogicalRDD`` with default statistics — growth restarts from
``defaultSizeInBytes`` at every barrier, so the estimate stays a few
hundred bits regardless of round count. Trade-off: a barriered
relation reports an unknown (max) size and will never be chosen for
an AUTO broadcast — inside driver-loop operators that is fine (the
loops broadcast explicitly where a side is known-small, and AQE
re-measures real sizes at shuffle boundaries anyway). Falls back to
the plain checkpointed frame if the internal API is unavailable
(correct, just slower after many rounds).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)
_warned_fallback = False


def stats_barrier(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint + estimated-statistics truncation."""
    global _warned_fallback
    df = df.localCheckpoint(eager=eager)
    try:
        jdf = df._jdf
        spark = df.sparkSession
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(new_jdf, spark)
    except Exception as exc:  # pragma: no cover - internal-API drift fallback
        # A silent fallback here re-enters the documented Spark 4 stats
        # cliff (compounding sizeInBytes in aggregation-free self-join
        # chains → minutes/round, driver OOM) with no visible cause, so
        # make the degradation loud — once.
        if not _warned_fallback:
            _warned_fallback = True
            _log.warning(
                "stats_barrier: internalCreateDataFrame unavailable (%s: %s); "
                "falling back to plain localCheckpoint. Iterative self-join "
                "operators (Boruvka MSF, pointer doubling) may hit the "
                "Spark 4 statistics-compounding cliff — see module docstring.",
                type(exc).__name__,
                exc,
            )
        return df
