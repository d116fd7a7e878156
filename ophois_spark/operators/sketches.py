"""Count-Min Sketch over the corpus n-gram stream — heavy-hitter
detection at streaming/corpus scale.

A 100 TB corpus build can't hold the exact n-gram frequency table in
memory (the gram vocabulary grows super-linearly), but boilerplate /
contamination screening only needs the HEAVY grams. The CMS (Cormode &
Muthukrishnan, J.Alg'05) compresses the stream into a d×w integer
matrix: cell(r, h_r(g)) += 1 per occurrence; est(g) = min_r cell(r,
h_r(g)) ≥ true(g), with overestimate bounded by εN at probability
1-δ for w = e/ε, d = ln(1/δ).

Everything here is exact integer arithmetic on md5-derived row hashes
(the repo's standard cross-engine hash), so unusually for a sketch,
the SKETCH ITSELF is oracle-gated cell by cell — not just its
downstream decisions. The d×w matrix is produced as sparse (row, col,
cnt) rows by one explode(d) + one algebraic groupBy: hot cells
collapse map-side, the shuffle carries at most d×w rows per partial,
and the sketch build is a single pass over the gram stream.

The heavy-hitter consumer thresholds on the SKETCH estimate (the
decision available at scale) and reports the exact count next to it,
so the gate pins the overestimate property (est ≥ true) and the
false-positive surface rather than hiding them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_D = 4
CMS_W = 65536
CMS_HEX = 7  # 28-bit row hash before the mod — same budget as MinHash


def _cms_col(gram, r: int):
    """Row-r column index: first CMS_HEX md5 hex chars of 'r:gram'
    as an int, mod CMS_W — exact in Spark and ANSI SQL."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{r}:"), gram)), 1, CMS_HEX), 16, 10
        ).cast("long")
        % CMS_W
    )


def cms_table(grams: DataFrame, gram_col: str = "ngram") -> DataFrame:
    """→ sparse sketch cells (row, col, cnt) over the OCCURRENCE stream
    (one input row per gram occurrence, duplicates included)."""
    g = F.col(gram_col)
    cells = grams.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _cms_col(g, r).alias("col"),
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("rc")
    )
    return (
        cells.select("rc.row", "rc.col")
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_heavy_hitters(
    grams: DataFrame, threshold: int, gram_col: str = "ngram"
) -> DataFrame:
    """→ (ngram, n_true, n_est) for grams whose CMS ESTIMATE clears
    the threshold — the decision rule available when only the sketch
    fits. n_est = min over rows of the addressed cell (≥ n_true
    always); n_true is joined in for the gated honesty column."""
    # One aggregation collapses the occurrence stream to the (much
    # smaller) vocabulary relation, checkpointed so the sketch cells
    # AND the address probes both derive from a single stream scan —
    # cell(r,c) = Σ n_true over grams hashing there, identical to the
    # per-occurrence build (sum is associative), measured 12.1 s →
    # ~3 s at sf0.1.
    cand = (
        grams.groupBy(gram_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_true"))
        .localCheckpoint(eager=True)
    )
    cells = cand.select(
        "n_true",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _cms_col(F.col(gram_col), r).alias("col"),
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("rc"),
    )
    table = (
        cells.select("n_true", "rc.row", "rc.col")
        .groupBy("row", "col")
        .agg(F.sum("n_true").cast("long").alias("cnt"))
    )
    addressed = cand.select(
        gram_col,
        "n_true",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _cms_col(F.col(gram_col), r).alias("col"),
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("rc"),
    ).select(gram_col, "n_true", "rc.row", "rc.col")
    est = (
        addressed.join(table, ["row", "col"])
        .groupBy(gram_col, "n_true")
        .agg(F.min("cnt").cast("long").alias("n_est"))
    )
    return est.filter(F.col("n_est") >= threshold)
