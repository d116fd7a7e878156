"""End-to-end corpus construction — the webtext flagship pipeline.

Mirror of the street-graph ``simplify`` pipeline (reference
src/main.rs:66-74 composes its whole CLI from the same operator parts):
here the composed parts are the corpus ones — quality/language gating,
exact fingerprint dedup, near-dup cluster dedup — ending in the
training corpus a 100 TB Common-Crawl-style build would ship.

Stage shape at 10^12 docs:

- **Gate** (quality + language): ONE narrow whole-stage-codegen
  projection + filter. The per-doc feature operators
  (``quality_features``, ``lang_id``) exist as separate frames for
  analysis; a pipeline must FUSE them — all signals derive from the
  same tokenization, so joining the feature tables back to the corpus
  would be two needless shuffles of the full text volume. Zero
  shuffles, predicate sits directly on the scan.
- **Exact dedup**: one algebraic ``min_by`` aggregation on the
  whitespace-normalized md5 fingerprint — map-side combinable (a
  duplicate's copies collapse within each input split before the one
  hash shuffle), winner row carried in the aggregate, no join-back.
- **Near-dup dedup**: ``near_dup_clusters`` (LSH candidates →
  exact-Jaccard verify → connected components) over the exact-dedup
  SURVIVORS only; the verified-pair edge set is orders of magnitude
  smaller than the corpus.
- **Output**: surviving (doc_id, source, n_tokens) — the per-document
  membership decision, i.e. the corpus itself plus the token ledger a
  data card reports.

Nothing in the funnel is persisted except the slot-managed shingle
lineage inside the near-dup stage: re-computing the gate lineage is
scan-bound and strictly cheaper than caching the full text volume at
target scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ophois_spark.operators.dedup import NEAR_DUP_JACCARD, near_dup_clusters
from ophois_spark.operators.textops import LANG_PROFILES, _count_in, tokens_col

# funnel thresholds (shared with the SQL oracle; on the synthetic
# corpus they produce a non-trivial funnel: 500 -> 320 -> 320 -> 303)
MIN_TOKENS = 30
MIN_ALPHA = 0.815
KEEP_LANG = "en"


def corpus_pipeline(
    docs: DataFrame,
    min_tokens: int = MIN_TOKENS,
    min_alpha: float = MIN_ALPHA,
    lang: str = KEEP_LANG,
    threshold: float = NEAR_DUP_JACCARD,
) -> DataFrame:
    """quality/lang gate → exact dedup → near-dup cluster dedup →
    surviving (doc_id, source, n_tokens)."""
    text = F.col("text")
    toks = tokens_col(text)
    ltoks = tokens_col(F.lower(text))
    n_chars = F.length(text)
    n_tokens = (
        F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(toks)).cast("int")
    )
    alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", "")).cast(
        "double"
    ) / n_chars.cast("double")
    s = {lg: _count_in(ltoks, ws) for lg, ws in LANG_PROFILES.items()}
    pred = (
        F.when((s["de"] >= s["en"]) & (s["de"] >= s["fr"]), F.lit("de"))
        .when(s["en"] >= s["fr"], F.lit("en"))
        .otherwise(F.lit("fr"))
    )
    gated = docs.select(
        "doc_id",
        "source",
        "text",
        n_tokens.alias("n_tokens"),
        F.when(n_chars > 0, alpha).alias("alpha_ratio"),
        pred.alias("pred_lang"),
    ).filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("alpha_ratio") >= min_alpha)
        & (F.col("pred_lang") == lang)
    )
    # exact dedup: min-doc_id winner per normalized content fingerprint,
    # carried whole through ONE map-side-combinable aggregation
    fp = F.md5(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    reps = (
        gated.groupBy(fp.alias("fp"))
        .agg(
            F.min_by(
                F.struct("doc_id", "source", "n_tokens", "text"), F.col("doc_id")
            ).alias("w")
        )
        .select("w.doc_id", "w.source", "w.n_tokens", "w.text")
    )
    clusters = near_dup_clusters(reps.select("doc_id", "text"), threshold=threshold)
    keep = clusters.filter(F.col("is_canonical") == 1).select("doc_id")
    return reps.join(keep, "doc_id").select("doc_id", "source", "n_tokens")
