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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ophois_spark.operators.dedup import NEAR_DUP_JACCARD, near_dup_clusters
from ophois_spark.operators.textops import (
    LANG_PROFILES,
    _count_in,
    content_fingerprint_col,
    n_tokens_col,
    tokens_col,
)

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
    ltoks = tokens_col(F.lower(text))
    n_chars = F.length(text)
    n_tokens = n_tokens_col(text).cast("int")
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
    fp = content_fingerprint_col(F.col("text"))
    reps = (
        gated.groupBy(fp.alias("fp"))
        .agg(
            F.min_by(
                F.struct("doc_id", "source", "n_tokens", "text"), F.col("doc_id")
            ).alias("w")
        )
        .select("w.doc_id", "w.source", "w.n_tokens", "w.text")
    )
    # three consumers read reps (shingle lineage, component seeds, the
    # final join) — slot-cache it once instead of replaying the scan +
    # gate + dedup shuffle per consumer (slot bookkeeping as in
    # shingle_jaccard_pairs; at target scale this is a MEMORY_AND_DISK
    # block of the gated corpus, the standard materialization point of
    # a funnel)
    from ophois_spark.plans.cache import swap_cached

    reps = swap_cached("corpus.reps", reps)
    clusters = near_dup_clusters(reps.select("doc_id", "text"), threshold=threshold)
    keep = clusters.filter(F.col("is_canonical") == 1).select("doc_id")
    return reps.join(keep, "doc_id").select("doc_id", "source", "n_tokens")


# deterministic sampling: decisions are a pure function of content
# identity, never of partitioning or RNG state
SAMPLE_DENOM = 10_000  # per-myriad rates


def corpus_sample(docs: DataFrame, rates: DataFrame) -> DataFrame:
    """Stratified deterministic Bernoulli sample → kept
    (doc_id, source, rate_permyriad).

    ``rates``: small (source, rate_permyriad) dim table — the corpus
    mixture recipe (upsample encyclopedic sources, downsample spammy
    ones). A doc is kept iff
    ``md5(source ':' doc_id) mod 10000 < rate`` — a pure function of
    identity, so the sample is reproducible under any partitioning,
    any cluster size, and any retry (RNG-based sampling is none of
    these), and a re-run over an updated corpus keeps the SAME
    decisions for unchanged rows (incremental rebuild diffs stay
    minimal).

    Scale shape: the rates table broadcasts (it's one row per source);
    the hash gate is a narrow codegen projection on the scan — the
    whole operator is shuffle-free.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("source"), F.col("doc_id").cast("string"))),
            1,
            7,
        ),
        16,
        10,
    ).cast("long")
    return (
        docs.select("doc_id", "source")
        .join(F.broadcast(rates), "source")
        .withColumn("bucket", h % SAMPLE_DENOM)
        .filter(F.col("bucket") < F.col("rate_permyriad"))
        .select("doc_id", "source", "rate_permyriad")
    )


TOPN_PER_SOURCE = 10  # per-source quota (per-host cap)
TOPN_SALTS = 4  # tournament fan-out for the hot-source path


def source_topn(
    docs: DataFrame, n: int = TOPN_PER_SOURCE, salts: int = TOPN_SALTS
) -> DataFrame:
    """Per-source deterministic quota cap → kept
    (doc_id, source, sample_rank): each source's ``n`` documents with
    the smallest identity hash — the per-host cap a corpus build
    applies so no single crawl host dominates the mixture (the exact-N
    complement of ``corpus_sample``'s Bernoulli rates). The hash key
    is the same ``md5(source ':' doc_id)`` identity as corpus_sample,
    so decisions are reproducible under any partitioning, cluster
    size, or retry, and incremental rebuilds keep unchanged rows'
    decisions.

    Hot-key-safe by construction: the naive form is ONE
    ``Window.partitionBy(source)`` row_number — which serializes a
    dominant source (the Common-Crawl shape) onto a single task, the
    same trap ``pack_sequences`` documents. Instead a two-phase
    tournament: phase 1 ranks within ``(source, pmod(doc_id, salts))``
    — ``salts`` bounded groups per source — and keeps each group's
    local top-``n``; phase 2 ranks the ≤ ``salts·n`` survivors per
    source. Any doc in the global top-``n`` beats every doc below it,
    and all docs above it survive phase 1, so phase-2 ranks of the
    kept rows EQUAL the naive single-window ranks — the oracle states
    the naive form and the gate checks exact equality. The phase-2
    window's per-key group is capped at ``salts·n`` rows regardless of
    corpus skew.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("source"), F.col("doc_id").cast("string"))),
            1,
            7,
        ),
        16,
        10,
    ).cast("long")
    salted = docs.select("doc_id", "source").withColumn("hk", h).withColumn(
        "salt", F.pmod(F.col("doc_id"), F.lit(salts)).cast("int")
    )
    w1 = Window.partitionBy("source", "salt").orderBy("hk", "doc_id")
    survivors = (
        salted.withColumn("r", F.row_number().over(w1))
        .filter(F.col("r") <= n)
        .drop("r", "salt")
    )
    w2 = Window.partitionBy("source").orderBy("hk", "doc_id")
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= n)
        .select("doc_id", "source", F.col("sample_rank").cast("int").alias("sample_rank"))
    )


PACK_BUDGET = 512  # tokens per training context window
PACK_SHARDS = 8  # default pre-shard fan-out for the hot-source path


def pack_sequences(
    docs: DataFrame, budget: int = PACK_BUDGET, shards: int = 1
) -> DataFrame:
    """Concat-and-chunk sequence packing → (doc_id, source[, shard],
    start_tok, pack_id): per packing group, documents concatenate in
    doc_id order into a token stream that is cut every ``budget``
    tokens; each doc's pack is the window its FIRST token lands in.

    This is the packing semantics of an LLM pretraining loader
    (documents are concatenated, then split into fixed-length
    contexts); the assignment is a running-sum window, so it is exact
    and deterministic — no bin-packing heuristic, no RNG.

    Scale shape: one shuffle on the packing key, then a per-partition
    running sum (no per-row Python). The running sum is inherently
    sequential WITHIN its packing group, so with ``shards=1`` (group =
    source) one giant source — the Common-Crawl norm, where most of the
    corpus shares a few source values — serializes onto ONE task.
    ``shards=K`` pre-shards the group key to (source, doc_id mod K):
    offsets stay an exact deterministic function of content identity
    (never of partitioning), each shard's chunks stay full except one
    boundary chunk per (source, shard), and the hot source's sort +
    running sum spreads across K tasks. The trade is at most K-1 extra
    partially-filled boundary packs per source — at a 100 TB corpus
    with budget-512 packs that is noise, and the loader consumes packs
    per shard anyway.
    """
    from pyspark.sql import Window

    n_tokens = n_tokens_col(F.col("text"))
    d = docs.select("doc_id", "source", n_tokens.alias("n_tok"))
    if shards <= 1:
        w = (
            Window.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        start = (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start_tok")
        return d.select("doc_id", "source", start).select(
            "doc_id",
            "source",
            "start_tok",
            F.expr(f"start_tok div {budget}").cast("long").alias("pack_id"),
        )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sharded = d.withColumn("shard", F.pmod(F.col("doc_id"), F.lit(shards)).cast("int"))
    start = (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start_tok")
    return sharded.select("doc_id", "source", "shard", start).select(
        "doc_id",
        "source",
        "shard",
        "start_tok",
        F.expr(f"start_tok div {budget}").cast("long").alias("pack_id"),
    )


def data_card(docs: DataFrame) -> DataFrame:
    """Per-source DATA CARD — the artifact a 100 TB corpus build ships
    alongside the corpus: one row per source with volume, token-length
    profile, and duplication rates.

    Composes three already-gated operators through one plan:

    - volume: ``source_rollup`` (n_docs, sum_tokens, mean_tokens)
    - length profile: ``source_token_quantiles`` (exact order-statistic
      p50/p90/p99 — integers drawn from the data, cross-engine stable)
    - duplication: exact-dup rate (doc's md5(text) has a smaller
      doc_id twin anywhere in the corpus — the global groupBy-min rep,
      joined back by hash, NOT a per-source dedup) and near-dup rate
      (``near_dup_clusters`` non-canonical members per source).

    Scale shape: all four branches aggregate down to one row per
    source before any join — the joins here move ~|sources| rows, not
    documents. The exact branch is one md5 groupBy + one hash equi-join
    back; the near branch reuses the induced-subgraph component loop.
    Rates are ONE int/int double division each (order-free).
    """
    from ophois_spark.operators.textops import source_rollup, source_token_quantiles

    from ophois_spark.operators.dedup import content_hash_col, exact_dedup

    roll = source_rollup(docs)
    quant = source_token_quantiles(docs).select("source", "p50", "p90", "p99")
    reps = exact_dedup(docs).select(
        F.col("content_hash").alias("h"), F.col("rep_doc_id").alias("rep")
    )
    exact = (
        docs.select("doc_id", "source", content_hash_col(F.col("text")).alias("h"))
        .join(reps, "h")
        .groupBy("source")
        .agg(
            F.sum((F.col("doc_id") != F.col("rep")).cast("long")).alias("n_exact_dups")
        )
    )
    near = (
        near_dup_clusters(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.sum(1 - F.col("is_canonical")).cast("long").alias("n_near_dups"))
    )
    return (
        roll.join(quant, "source")
        .join(exact, "source")
        .join(near, "source")
        .select(
            "source",
            "n_docs",
            "sum_tokens",
            "mean_tokens",
            F.col("p50").cast("long").alias("p50"),
            F.col("p90").cast("long").alias("p90"),
            F.col("p99").cast("long").alias("p99"),
            "n_exact_dups",
            (F.col("n_exact_dups").cast("double") / F.col("n_docs").cast("double")).alias(
                "exact_dup_rate"
            ),
            "n_near_dups",
            (F.col("n_near_dups").cast("double") / F.col("n_docs").cast("double")).alias(
                "near_dup_rate"
            ),
        )
    )


def mixture_plan(
    docs: DataFrame, weights: DataFrame, budget: int | None = None
) -> DataFrame:
    """Training-mixture planning: per-source token acceptance rates
    that reshape the corpus toward a target weight mix under a total
    token budget → (source, weight, available_tokens, target_tokens,
    planned_tokens, rate_ppm), all int64.

    ``weights`` is a (source, weight) dimension table — the mixture
    spec a pretraining run ships (weights are relative integers, e.g.
    parts-per-anything; only ratios matter). ``budget`` is the total
    token target; ``None`` plans at constant volume (budget = total
    available tokens over the weighted sources).

    Two-pass integer waterfill, exact and order-free:

    - pass 1: ``target = budget * w div sum_w``; allocation capped at
      availability (a source cannot supply tokens it does not have);
    - pass 2: the leftover budget stranded by capped sources is
      redistributed across sources with headroom, proportional to the
      same weights, again capped. ``rate_ppm = planned * 1e6 div
      available`` is the per-source Bernoulli acceptance rate a
      downstream deterministic sampler (``corpus_sample``) consumes.

    Scale shape: ONE map-side-combinable token aggregation over the
    corpus (the only full-data pass), then all planning arithmetic on
    the |sources|-row dimension frame — the weights join and both
    1-row total frames are broadcast, so nothing after the first agg
    shuffles document-scale data. Integer div keeps every engine
    bit-identical; int64 overflows only past ~9e12 planned tokens per
    source (~36 TB of text in ONE source), noted here as the contract
    bound.
    """
    avail = (
        docs.select("source", n_tokens_col(F.col("text")).alias("_t"))
        .groupBy("source")
        .agg(F.sum("_t").cast("long").alias("available_tokens"))
    )
    d = avail.join(F.broadcast(weights), "source")
    tot = d.agg(
        F.sum("available_tokens").cast("long").alias("_tot_avail"),
        F.sum("weight").cast("long").alias("_sum_w"),
    )
    d = d.crossJoin(F.broadcast(tot)).withColumn(
        "_budget",
        F.lit(budget).cast("long") if budget is not None else F.col("_tot_avail"),
    )
    d = d.withColumn(
        "target_tokens", F.expr("_budget * weight div _sum_w").cast("long")
    ).withColumn("_a1", F.least("target_tokens", "available_tokens"))
    tot2 = d.agg(
        F.sum("_a1").cast("long").alias("_a1_sum"),
        F.sum(
            F.when(F.col("available_tokens") > F.col("_a1"), F.col("weight")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("_sum_w2"),
    )
    d = (
        d.crossJoin(F.broadcast(tot2))
        .withColumn("_leftover", F.col("_budget") - F.col("_a1_sum"))
        .withColumn(
            "_extra",
            F.when(
                (F.col("available_tokens") > F.col("_a1")) & (F.col("_sum_w2") > 0),
                F.expr("_leftover * weight div _sum_w2"),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "planned_tokens",
            F.least(F.col("available_tokens"), F.col("_a1") + F.col("_extra")),
        )
    )
    return d.select(
        "source",
        F.col("weight").cast("long").alias("weight"),
        "available_tokens",
        "target_tokens",
        F.col("planned_tokens").cast("long").alias("planned_tokens"),
        F.when(
            F.col("available_tokens") > 0,
            F.expr("planned_tokens * 1000000 div available_tokens"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rate_ppm"),
    )
