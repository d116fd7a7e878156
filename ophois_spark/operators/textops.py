"""Text analysis operators over the documents table.

Training-data-pipeline primitives (graft checklist): token counting,
quality scoring, language-ID heuristic, document fingerprinting. All
pure Column expressions (JVM-side, codegen) — no Python in the hot
path; every operator has an ANSI-SQL twin for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ophois_spark.plans.cache import swap_cached

# tiny per-language stopword profiles (n-gram/stopword heuristic)
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "eine", "mit", "von"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "fr": ["le", "la", "les", "et", "un", "une", "de", "des", "est", "que"],
}
STOPWORDS_EN = LANG_PROFILES["en"]


# Whitespace, as an EXPLICIT class identical in Java (Spark) and RE2
# (DuckDB oracles): a literal \s would diverge — Java's \s includes
# \x0B (vertical tab), RE2's does not. Java semantics are unchanged by
# spelling the class out; the oracles gain the \x0B member so both
# engines tokenize \x0B-bearing text identically.
WS_RE = r"[ \t\n\x0B\f\r]+"


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(text), WS_RE)


def content_fingerprint_col(text: Column) -> Column:
    """Whitespace-normalized md5 content fingerprint — THE exact-dedup
    identity shared by the corpus funnel, the streaming registry, and
    the fingerprint operator (one definition; copies would let the
    stream==batch contract drift silently)."""
    return F.md5(F.regexp_replace(F.trim(text), WS_RE, " "))


def n_tokens_col(text: Column) -> Column:
    """Empty-safe whitespace token count (LONG, cast at call sites if
    narrower): the single definition of the engine's token-count
    contract — ``split(trim(x))`` yields [""] on empty input, so the
    empty case must short-circuit to 0 everywhere it is counted."""
    return (
        F.when(F.trim(text) == "", F.lit(0))
        .otherwise(F.size(tokens_col(text)))
        .cast("long")
    )


def _count_in(tokens: Column, words: list[str]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality signals: sizes + stopword/alpha/punct ratios.

    Ratios are exact int/int double divisions (bit-stable across
    engines). Empty docs get 0 tokens and null ratios.
    """
    text = F.col(text_col)
    toks = tokens_col(text)
    n_chars = F.length(text)
    n_tokens = n_tokens_col(text).cast("int")
    n_alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    n_stop = _count_in(toks, STOPWORDS_EN)
    return docs.select(
        "doc_id",
        n_chars.cast("int").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.when(n_chars > 0, n_alpha.cast("double") / n_chars.cast("double")).alias(
            "alpha_ratio"
        ),
        F.when(n_tokens > 0, n_stop.cast("double") / n_tokens.cast("double")).alias(
            "stop_ratio"
        ),
        F.when(n_tokens > 0, n_chars.cast("double") / n_tokens.cast("double")).alias(
            "chars_per_token"
        ),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID with deterministic tie-break
    (profile order de > en > fr on equal scores)."""
    toks = tokens_col(F.lower(F.col(text_col)))
    s = {lang: _count_in(toks, words) for lang, words in LANG_PROFILES.items()}
    pred = (
        F.when((s["de"] >= s["en"]) & (s["de"] >= s["fr"]), F.lit("de"))
        .when(s["en"] >= s["fr"], F.lit("en"))
        .otherwise(F.lit("fr"))
    )
    return docs.select("doc_id", pred.alias("pred_lang"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical document fingerprint: md5 of the whitespace-normalized
    token stream — the exact-dedup key robust to formatting noise."""
    return docs.select(
        "doc_id", content_fingerprint_col(F.col(text_col)).alias("fp")
    )


# winnowing fingerprint constants (Schleimer/Wilkerson/Aiken, SIGMOD'03
# — the MOSS rolling-hash scheme): k-gram Karp–Rabin hashes, minimum
# per sliding window of w. Any match of >= k+w-1 canonical chars is
# GUARANTEED to share a fingerprint hash. B/P chosen so the largest
# term (B^(k-1) * ascii) stays far inside int64 on Spark and DuckDB.
WINNOW_K = 5
WINNOW_W = 4
WINNOW_B = 257
WINNOW_P = 1_000_000_007


def winnow_fingerprint(
    docs: DataFrame, text_col: str = "text", k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Rolling-hash document fingerprint by winnowing → one row per
    (doc_id, selected k-gram hash).

    Text canonicalizes to lowercase a-z0-9 (whitespace, punctuation and
    case are formatting noise). Every k-gram gets a Karp–Rabin
    polynomial hash (mod ``WINNOW_P``), computed POSITIONALLY as a
    ``transform`` over ``sequence(1, n-k+1)`` — on an engine that
    vectorizes per-row arrays, the positional form is the rolling form
    with no sequential dependency, so the whole operator is one narrow
    whole-stage-codegen projection: zero joins, zero shuffles, zero
    Python. Window minima (``array_min`` over ``slice``) then keep ~2/w
    of the hashes; ``array_distinct`` + ``explode`` emit the set.

    Docs whose canonical text is shorter than ``k + w - 1`` chars have
    no full window and emit no rows (the standard winnowing contract).
    """
    from ophois_spark.plans.layout import fan_out

    canon = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    d = fan_out(docs.select("doc_id", F.col(text_col))).select(
        "doc_id", canon.alias("_c")
    ).filter(F.length("_c") >= k + w - 1)
    pows = [pow(WINNOW_B, k - 1 - j, WINNOW_P) for j in range(k)]

    def gram_hash(i: Column) -> Column:
        # ascii and the mod-P powers are both < 2^31, but their product
        # is not — promote to long BEFORE multiplying (int32 arithmetic
        # wraps silently under non-ANSI semantics)
        h = F.lit(0).cast("long")
        for j, p in enumerate(pows):
            c = F.ascii(F.col("_c").substr(i + j, F.lit(1))).cast("long")
            h = h + c * F.lit(p).cast("long")
        return h % WINNOW_P

    hashes = F.transform(
        F.sequence(F.lit(1), F.length("_c") - (k - 1)), gram_hash
    )
    d = d.withColumn("_h", hashes)
    mins = F.transform(
        F.sequence(F.lit(1), F.size("_h") - (w - 1)),
        lambda t: F.array_min(F.slice(F.col("_h"), t, w)),
    )
    return d.select("doc_id", F.explode(F.array_distinct(mins)).alias("fp"))


WINNOW_MAX_DF = 10  # boilerplate cap: fps in more docs don't pair
WINNOW_MIN_SHARED = 2  # pair threshold: >= m shared fingerprints


def winnow_overlap_pairs(
    docs: DataFrame,
    min_shared: int = WINNOW_MIN_SHARED,
    max_df: int = WINNOW_MAX_DF,
    text_col: str = "text",
) -> DataFrame:
    """Cross-document winnowing overlap → (doc_a, doc_b, n_shared):
    document pairs sharing ≥ ``min_shared`` winnowing fingerprints —
    the overlap JOIN the fingerprint exists for (SIGMOD'03: any
    canonical-text match of ≥ k+w-1 chars is guaranteed to surface a
    shared fingerprint, so template/plagiarism overlap becomes a
    relational equi-join, never string comparison).

    ``max_df`` is part of the CONTRACT, not an optimization knob:
    fingerprints appearing in more than ``max_df`` documents are
    boilerplate (site chrome, licenses — measured df up to 394/500 docs
    on the synthetic corpus) and pair everything with everything, so
    they are excluded before pairing — the winnowing analogue of
    stop-shingle removal, and it simultaneously bounds the join: each
    surviving fingerprint bucket yields ≤ max_df·(max_df−1)/2 pairs.

    Scale shape at 10^12 docs: fingerprints are one narrow codegen
    projection (winnow_fingerprint); the df filter is one algebraic
    aggregation; pairing is a bucketed self-equi-join on fp whose
    fan-out the df cap bounds; the final count is map-side combinable.
    No all-pairs path exists.
    """
    # the fingerprint projection (regexp canonicalization + per-position
    # Karp-Rabin + window minima over every document) feeds BOTH the
    # df-cap aggregate and the a/b sides of the pair self-join — persist
    # it once or the whole fingerprint computation runs three times
    fps = swap_cached("winnow_overlap.fps", winnow_fingerprint(docs, text_col))
    keep = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fp")
    )
    rare = fps.join(keep, "fp")
    a = rare.select(F.col("fp"), F.col("doc_id").alias("doc_a"))
    b = rare.select(F.col("fp"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def source_rollup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Domain-level quality rollup → one row per source:
    (source, n_docs, sum_tokens, sum_chars, mean_tokens).

    The per-host/per-domain aggregation a webtext pipeline filters on
    (drop spammy hosts wholesale before per-doc scoring). All sums are
    exact integers; the mean is ONE int/int double division, so the
    value is bit-identical across engines regardless of aggregation
    order — never average pre-divided doubles across rows, their sum
    is order-dependent.

    Scale shape: algebraic aggregation with map-side partial combine;
    host-key skew (one giant domain) collapses to one partial row per
    input split before the shuffle.
    """
    n_tokens = n_tokens_col(F.col(text_col))
    return (
        docs.select("source", n_tokens.alias("_t"), F.col("n_chars"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_t").cast("long").alias("sum_tokens"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .select(
            "source",
            "n_docs",
            "sum_tokens",
            "sum_chars",
            (F.col("sum_tokens").cast("double") / F.col("n_docs").cast("double")).alias(
                "mean_tokens"
            ),
        )
    )


def index_postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Inverted-index postings → (term, doc_id, tf, df): per-term
    per-doc frequency plus the term's corpus document frequency — the
    build step of a search/retrieval index over the corpus (and the
    integer core of tf-idf; the idf transform is a presentation-side
    monotone map, so ranking by (tf, df) is ranking by tf-idf).

    Scale shape at 10^12 docs: the token explode is narrow; both
    aggregations are algebraic (map-side combined), so stopword-grade
    hot terms reach the reducers as one partial row per input split;
    df reuses the ALREADY-DISTINCT (term, doc_id) relation — counting
    rows per term, never count-distinct over raw tokens. The df join
    back is term-keyed on the same partitioning the second aggregation
    just produced, so AQE plans it exchange-free. Written out bucketed
    by term, the postings are the index.
    """
    from ophois_spark.plans.layout import fan_out

    tf = (
        fan_out(docs.select("doc_id", F.col(text_col)))
        .select("doc_id", F.explode(tokens_col(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return tf.join(df_, "term").select("term", "doc_id", "tf", "df")


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[tuple[int, str]],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k retrieval over the postings index → one row per
    (query_id, rank): (query_id, rank, doc_id, score). The consumer of
    ``index_postings`` — the ranking a contamination/retrieval audit of
    a training corpus actually runs (Robertson/Sparck-Jones BM25 with
    the +1 idf shift, so idf > 0 even for terms in most docs).

    Cross-engine determinism (the gate's hard part):
    - every constant reaches both engines as the SAME double — Python
      floats in Spark ``lit``s, their ``repr`` string-cast in the
      DuckDB oracle (shortest round-trip, no decimal re-rounding);
    - each per-term contribution is one fixed-shape expression tree
      (identical association both sides) rounded to 9 dp, far above
      ~1-ulp ``ln`` libm noise;
    - the per-doc score SUMS contributions in term-sorted order on
      both sides (``aggregate(array_sort(collect_list(...)))`` here,
      ``list_reduce(list(... ORDER BY term))`` in the oracle) — a bare
      SUM() is accumulation-order-dependent in the last ulp;
    - final score rounded to 6 dp; rank ties broken by doc_id.

    Scale shape at 10^12 docs: the query-term table is tiny and
    broadcast, so the postings scan prunes to matching terms with no
    shuffle; dl and the 1-row corpus stats are doc-keyed join +
    broadcast; the per-query candidate set (docs sharing ≥1 query
    term) is what shuffles, grouped by (query_id, doc_id) — bounded by
    the postings of the query's terms, never the corpus. Top-k is a
    per-query window over the already-reduced scores.
    """
    spark = docs.sparkSession
    postings = index_postings(docs, text_col)
    dl = docs.select("doc_id", n_tokens_col(F.col(text_col)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    qt = spark.createDataFrame(query_terms, "query_id int, term string")

    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b
    nd = F.col("n_docs").cast("double")
    dfd = F.col("df").cast("double")
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log((nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)) + F.lit(1.0))
    denom = tfd + F.lit(k1) * (F.lit(one_minus_b) + F.lit(b) * dld / avgdl)
    contrib = F.round(idf * (tfd * F.lit(k1p1)) / denom, 9)

    per_term = (
        postings.join(F.broadcast(qt), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", "term", contrib.alias("contrib"))
    )
    scored = per_term.groupBy("query_id", "doc_id").agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ),
            6,
        ).alias("score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("int").alias("query_id"),
            F.col("rank").cast("int").alias("rank"),
            F.col("doc_id").cast("long").alias("doc_id"),
            "score",
        )
    )


TFIDF_TOP_K = 5


def tfidf_topterms(docs: DataFrame, k: int = TFIDF_TOP_K, text_col: str = "text") -> DataFrame:
    """Per-document top-``k`` terms by smoothed tf-idf → (doc_id, rank,
    term, score): the keyword/topic digest a corpus card or a
    relevance-labeling pipeline attaches to every document
    (sklearn-style smooth idf: ln((N+1)/(df+1)) + 1, always > 0).

    Cross-engine float discipline (the bm25_topk contract, reduced to
    the no-sum case): N and df are exact integers on both sides; the
    idf is ONE fixed-shape expression rounded at 9 dp — which collapses
    the ~1-ulp libm ``ln`` divergence — and the score is the exact
    IEEE product tf × idf₉ rounded at 6 dp. No accumulation exists, so
    no ordering clause is needed. Rank ties break (score desc, term
    asc).

    Scale shape at 10^12 docs: reuses ``index_postings`` (algebraic
    aggs, map-side combined); the ranking window partitions by doc_id,
    so its sort is bounded by a single document's distinct-term count —
    a per-doc quantity, never a corpus hot key. The corpus size N is a
    1-row aggregate cross-joined as a broadcast.
    """
    postings = index_postings(docs, text_col)
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    idf9 = F.round(
        F.log(
            (F.col("n_docs").cast("double") + F.lit(1.0))
            / (F.col("df").cast("double") + F.lit(1.0))
        )
        + F.lit(1.0),
        9,
    )
    scored = (
        postings.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf").cast("double") * idf9, 6).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("rank").cast("int").alias("rank"),
            "term",
            "score",
        )
    )


DUPSPAN_W = 8


def dup_ngram_coverage(
    docs: DataFrame, w: int = DUPSPAN_W, text_col: str = "text"
) -> DataFrame:
    """Exact-substring duplication coverage (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL'22 — the exact
    complement of the MinHash near-dup leg): per document, the fraction
    of token positions covered by a ``w``-token n-gram that occurs more
    than once in the corpus (including within one document)
    → (doc_id, n_tokens, n_dup_positions, dup_fraction).

    Shape, all codegen / no UDF: rolling grams are built per row with
    ``transform(sequence) + slice + array_join`` (zero shuffle), then

      occurrences (doc, pos, md5(gram))
      → gram counts: ONE map-side-combinable groupBy on the hash
      → dup occurrences: left-semi equi-join back (only grams seen >1×)
      → covered positions: explode w per DUP occurrence only — the
        blow-up is bounded by actual duplication, not corpus size
      → distinct + per-doc count.

    At 10^12 docs every stage keys on gram-hash or doc_id (AQE splits a
    pathological boilerplate gram); dup_fraction is the per-doc signal a
    corpus build thresholds before tokenization."""
    base = docs.select(
        "doc_id", tokens_col(F.col(text_col)).alias("t")
    ).withColumn("n", F.size("t"))
    # occ (tokenize + md5 of every w-gram of every document) feeds both
    # the gram-count aggregate and the semi-join probe — persist it once
    # or the dominant tokenize/hash/explode cost runs twice
    occ = swap_cached(
        "dup_ngram.occ",
        base.filter(F.col("n") >= w).select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n") - w),
                    lambda i: F.md5(F.array_join(F.slice("t", i + 1, w), " ")),
                )
            ).alias("pos", "gh"),
        ),
    )
    dup = (
        occ.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("gh")
    )
    covered = (
        occ.join(dup, "gh", "left_semi")
        .select("doc_id", F.explode(F.sequence("pos", F.col("pos") + (w - 1))).alias("p"))
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup_positions"))
    )
    ntok = docs.select("doc_id", n_tokens_col(F.col(text_col)).alias("n_tokens"))
    return ntok.join(covered, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_dup_positions", F.lit(0)).cast("long").alias("n_dup_positions"),
        F.when(F.col("n_tokens") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.coalesce("n_dup_positions", F.lit(0)).cast("double")
                / F.col("n_tokens").cast("double"),
                9,
            )
        )
        .alias("dup_fraction"),
    )


QUANTILES = (50, 90, 99)


def source_token_quantiles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact per-source token-count quantiles → (source, n_docs, p50,
    p90, p99) — the data-card length profile.

    Quantile = ORDER-STATISTIC selection (lower/type-1: the element at
    rank ceil(q/100 * n), ties broken by the value ordering itself), so
    the result is an integer drawn FROM the data — deterministic and
    bit-identical across engines, unlike interpolated (type-7)
    quantiles whose float arithmetic no cross-engine oracle can pin.

    Scale shape: one shuffle on source + a per-partition sort for
    row_number (the same cost class as any windowed profile); the
    quantile picks are a filter on rank + one algebraic aggregation.
    Per-source data volume bounds the sort; for a giant source,
    pre-aggregate to (source, n_tokens, count) first — the ranks then
    run over the DISTINCT value histogram, not the rows.
    """
    from pyspark.sql import Window

    d = docs.select("source", n_tokens_col(F.col(text_col)).alias("n_tok"))
    w = Window.partitionBy("source").orderBy("n_tok")
    ranked = d.select(
        "source",
        "n_tok",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    # rank target in INTEGER arithmetic: ceil(q*n/100) = (q*n+99) div 100
    # (a float ceil diverges cross-engine: DuckDB parses 0.99 as exact
    # DECIMAL while Spark multiplies doubles — ceil(0.99*100) is 99 vs 100)
    picks = [
        F.max(
            F.when(
                F.col("rk") == F.expr(f"(({q} * n) + 99) div 100"), F.col("n_tok")
            )
        ).alias(f"p{q}")
        for q in QUANTILES
    ]
    return ranked.groupBy("source").agg(
        F.max("n").alias("n_docs"), *picks
    )


REP_GRAM_N = 2


def doc_repetition(docs: DataFrame, n: int = REP_GRAM_N, text_col: str = "text") -> DataFrame:
    """Within-document repetition (Rae et al., Gopher appendix A1.1 —
    the "fraction of tokens in the most-common n-gram" quality
    signal): per document the top n-gram's occurrence count and the
    token share it covers
    → (doc_id, n_tokens, top_gram_count, top_gram_share).

    Complements the CORPUS-level legs (minhash/simhash/dup-ngram
    coverage): this one needs no cross-doc state at all — rolling
    grams are zero-shuffle codegen (`transform(sequence)+slice+
    array_join`), then two map-side-combinable groupBys keyed on
    doc_id, so at 10^12 docs the stage parallelism is per-document
    with no hot key possible (a doc's gram count is bounded by its
    own length). Share = count·n / n_tokens with exact integer
    operands, so the double quotient is bit-identical cross-engine.
    """
    base = docs.select("doc_id", tokens_col(F.col(text_col)).alias("t")).withColumn(
        "n", F.size("t")
    )
    grams = base.filter(F.col("n") >= n).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("n") - n),
                lambda i: F.array_join(F.slice("t", i + 1, n), " "),
            )
        ).alias("g"),
    )
    top = (
        grams.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_gram_count"))
    )
    ntok = docs.select("doc_id", n_tokens_col(F.col(text_col)).alias("n_tokens"))
    return ntok.join(top, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("top_gram_count", F.lit(0)).cast("long").alias("top_gram_count"),
        F.when(F.col("n_tokens") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.coalesce("top_gram_count", F.lit(0)).cast("double")
                * F.lit(float(n))
                / F.col("n_tokens").cast("double"),
                9,
            )
        )
        .alias("top_gram_share"),
    )


def doc_surprisal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Integer IDF-rarity quality signal → (doc_id, n_tokens,
    surprisal, mean_x1000): per document, the sum over tokens of the
    corpus rarity of that token, with rarity the INTEGER bit-log
    ``flog2(n_docs) - flog2(df)`` (flog2 = floor(log2) = binary length
    minus one — exact on every engine, no libm). Documents made of
    common words score ~0; documents of rare tokens score high — the
    integerized tf-idf mass a corpus quality filter thresholds on,
    with the cross-engine float-idf trap removed entirely.

    ``mean_x1000`` is the per-token mean in integer permille
    (1000·surprisal div n_tokens; 0 for empty docs) — the
    length-normalized form, following the repo-wide integer-ratio
    contract.

    Scale shape at 10^12 docs: rides the postings build
    (``index_postings`` — algebraic aggs, map-side combine on
    stopword-grade hot terms); rarity is a codegen projection; the
    per-doc sum is one more algebraic agg keyed doc_id (no hot key —
    bounded by a doc's own vocabulary); the final join back to docs is
    doc-keyed. The corpus count is ONE broadcast scalar row.
    """
    from ophois_spark.plans.layout import fan_out  # noqa: F401  (postings handles it)

    post = index_postings(docs, text_col)
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    flog2 = lambda c: F.length(F.bin(c)) - F.lit(1)
    per_doc = (
        post.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            (F.col("tf") * (flog2(F.col("n_docs")) - flog2(F.col("df")))).alias("m"),
        )
        .groupBy("doc_id")
        .agg(F.sum("m").alias("surprisal"))
    )
    toks = docs.select("doc_id", n_tokens_col(F.col(text_col)).alias("n_tokens"))
    return toks.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("surprisal", F.lit(0)).alias("surprisal"),
        F.when(F.col("n_tokens") == 0, F.lit(0))
        .otherwise(
            F.expr("(1000 * coalesce(surprisal, 0)) div n_tokens")
        )
        .alias("mean_x1000"),
    )


def line_dedup(
    docs: DataFrame,
    max_df: int,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """CCNet-style boilerplate line removal → (doc_id, n_lines,
    n_kept, cleaned_text): split each document into lines, count each
    line's document frequency WITHIN its source (site chrome —
    copyright footers, nav bars, cookie banners — repeats across a
    host's pages; body text doesn't), drop lines appearing in more
    than ``max_df`` distinct documents of the same source, and rebuild
    the surviving text in original line order. The paragraph-hash
    dedup step of CCNet (Wenzek et al., LREC 2020), scoped per source
    the way production pipelines shard it.

    Scale shape at 10^12 docs: the explode is narrow; the per-
    (source, line) distinct-doc count partially dedups map-side (a
    line repeated within one doc collapses before the shuffle); the
    df join back is on the same (source, line) partitioning the
    aggregation produced; reconstruction is ONE doc_id-keyed
    aggregation whose payload is the doc's own kept lines
    (sort_array on the collected (idx, line) structs — no window, no
    per-doc task skew beyond document length, which is bounded).
    Dropping rather than rewriting keeps the operator pure-relational;
    the cleaned text is byte-reproducible, so the gate compares it
    EXACTLY.
    """
    from ophois_spark.plans.cache import swap_cached

    # the exploded line relation feeds THREE branches (df count, kept
    # join, per-doc line count) — cache it once or the explode re-runs
    # per branch (the shared-lineage rule every multi-branch operator
    # here follows)
    lines = swap_cached(
        "line_dedup.lines",
        docs.select(
            "doc_id",
            F.col(source_col).alias("source"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
        ),
    )
    ldf = lines.groupBy("source", "line").agg(
        F.countDistinct("doc_id").alias("ldf")
    )
    kept = lines.join(ldf, ["source", "line"]).filter(F.col("ldf") <= max_df)
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("cleaned_text"),
    )
    n_lines = lines.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        docs.select("doc_id")
        .join(n_lines, "doc_id")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


# --- PII scrubbing -----------------------------------------------------
# Patterns are deliberately dialect-neutral: no alternation, no
# backreferences, no \b — pure character classes + greedy quantifiers,
# on which Java's leftmost-first backtracking and RE2's
# leftmost-longest scan produce the SAME non-overlapping match set, so
# Spark (Java regex) and the DuckDB oracle (RE2) count and replace
# identically.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"[0-9]{1,3}(\.[0-9]{1,3}){3}"
PII_PHONE_RE = r"\+[0-9][0-9-]{5,}[0-9]"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction — the pass a webtext corpus runs before anything
    ships: detect emails / IPv4 addresses / international-format phone
    numbers, count them, and replace each with a typed mask token →
    (doc_id, n_emails, n_ipv4, n_phones, n_pii, scrubbed_len,
    scrubbed_md5).

    The gate asserts the FULL redacted string (md5 + length), not just
    counts, so replacement order is part of the contract: emails are
    masked first (their digit runs could otherwise feed the phone
    pattern), then IPs, then phones; counts are all taken on the
    ORIGINAL text, independent of masking.

    Scale shape: one whole-stage-codegen projection — three
    regexp_count + three chained regexp_replace, zero shuffles, zero
    Python. Columns prune to (doc_id, text) at the scan.
    """
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"),
            PII_IPV4_RE,
            "<IP>",
        ),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV4_RE)).cast("long").alias("n_ipv4"),
        F.regexp_count(t, F.lit(PII_PHONE_RE)).cast("long").alias("n_phones"),
        scrubbed.alias("_s"),
    ).select(
        "doc_id",
        "n_emails",
        "n_ipv4",
        "n_phones",
        (F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones")).alias("n_pii"),
        F.length("_s").cast("long").alias("scrubbed_len"),
        F.md5(F.encode("_s", "UTF-8")).alias("scrubbed_md5"),
    )


def doc_bigram_nll(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Bigram language-model score per document → (doc_id, n_bigrams,
    nll_bits, mean_x1000): the CCNet-style perplexity quality signal
    (score each doc under an n-gram LM trained on the corpus itself)
    in the repo's INTEGER cross-engine discipline — per-bigram cost is
    the whole-bit cross entropy ``flog2(c1 + V) − flog2(c12)`` (add-V
    denominator smoothing; flog2 exact on every engine, no libm), so
    the per-doc sum is exact int64 addition: order-independent, no
    rounding policy, no fold-ordering clause. ``mean_x1000`` is the
    per-bigram mean in integer permille.

    Scale shape at 10^12 docs: bigram rows explode from the token
    array JVM-side (zero shuffle); the count tables are algebraic
    groupBys (map-side combine absorbs stopword-pair hot keys); the
    lookup joins are key-hashed with AQE skew-split as the fallback;
    V and nothing else is a broadcast scalar. Docs with < 2 tokens
    emit (0, 0, 0) via the left join.
    """
    from ophois_spark.plans.layout import fan_out

    base = fan_out(docs.select("doc_id", F.col(text_col))).select(
        "doc_id", tokens_col(F.col(text_col)).alias("t")
    )
    bg = base.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at("t", i).alias("w1"),
                    F.element_at("t", i + 1).alias("w2"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        base.select(F.explode("t").alias("w"))
        .filter(F.col("w") != "")
        .agg(F.countDistinct("w").alias("v"))
    )
    flog2 = lambda c: F.length(F.bin(c)) - F.lit(1)  # noqa: E731
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (flog2(F.col("c1") + F.col("v")) - flog2(F.col("c12"))).alias("bits"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("bits").cast("long").alias("nll_bits"),
        )
    )
    return docs.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("nll_bits", F.lit(0)).cast("long").alias("nll_bits"),
        F.when(F.coalesce("n_bigrams", F.lit(0)) == 0, F.lit(0))
        .otherwise(F.expr("(1000 * coalesce(nll_bits, 0)) div coalesce(n_bigrams, 1)"))
        .cast("long")
        .alias("mean_x1000"),
    )


COOC_WINDOW = 2
COOC_TOP = 200


def term_cooccurrence(
    docs: DataFrame,
    window: int = COOC_WINDOW,
    top: int = COOC_TOP,
    text_col: str = "text",
) -> DataFrame:
    """Windowed term co-occurrence statistics → the top-``top``
    unordered pairs by count: (w_a, w_b, n_pairs, pmi_bits) — the
    collocation/word-vector co-occurrence table a corpus statistics
    pass builds (word2vec-style, symmetric window ≤ ``window``).

    ``pmi_bits`` is the integer whole-bit PMI proxy
    ``flog2(c_ab) + flog2(N) − flog2(c_a) − flog2(c_b)`` (flog2 =
    binary length − 1, exact on both engines — the doc_surprisal
    discipline; N = total windowed pair count). The top-k total order
    is (count desc, w_a, w_b) — no rank ties possible.

    Scale shape: pair explode is JVM ``transform(sequence)`` per
    distance (zero shuffle, bounded by window × doc length); the count
    tables are algebraic groupBys (map-side combine absorbs stopword
    pairs); the final top-k is a TakeOrdered, never a full sort.
    """
    from ophois_spark.plans.layout import fan_out

    base = fan_out(docs.select(F.col(text_col))).select(
        tokens_col(F.col(text_col)).alias("t")
    )
    empty = F.array().cast("array<struct<wa:string,wb:string>>")

    # closure factory, NOT `lambda i, d=d`: a two-parameter lambda is
    # treated by transform() as its binary (element, index) form, which
    # silently rebinds d to the 0-based position
    def pair_at(d: int):
        return lambda i: F.struct(
            F.least(F.element_at("t", i), F.element_at("t", i + d)).alias("wa"),
            F.greatest(F.element_at("t", i), F.element_at("t", i + d)).alias("wb"),
        )

    parts = []
    for d in range(1, window + 1):
        # guard: Spark sequence(1, 0) DESCENDS ([1, 0]) rather than
        # being empty, so short docs need the explicit when()
        parts.append(
            F.when(
                F.size("t") >= d + 1,
                F.transform(F.sequence(F.lit(1), F.size("t") - d), pair_at(d)),
            ).otherwise(empty)
        )
    pairs = (
        base.filter(F.size("t") >= 2)
        .select(F.explode(F.concat(*parts)).alias("p"))
        .select("p.wa", "p.wb")
        .filter((F.col("wa") != "") & (F.col("wb") != ""))
    )
    c12 = pairs.groupBy("wa", "wb").agg(F.count(F.lit(1)).alias("c12"))
    # unigram mass in PAIR SLOTS: each pair contributes one occurrence
    # to each endpoint (self-pairs contribute two) — derived from c12
    # itself so both engines share one definition
    ends = c12.select(F.col("wa").alias("w"), F.col("c12").alias("c")).union(
        c12.select(F.col("wb").alias("w"), F.col("c12").alias("c"))
    )
    c1 = ends.groupBy("w").agg(F.sum("c").alias("c1"))
    n = c12.agg(F.sum("c12").alias("n_total"))
    flog2 = lambda c: F.length(F.bin(c)) - F.lit(1)  # noqa: E731
    scored = (
        c12.join(c1.select(F.col("w").alias("wa"), F.col("c1").alias("ca")), "wa")
        .join(c1.select(F.col("w").alias("wb"), F.col("c1").alias("cb")), "wb")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("wa").alias("w_a"),
            F.col("wb").alias("w_b"),
            F.col("c12").cast("long").alias("n_pairs"),
            (
                flog2(F.col("c12"))
                + flog2(F.col("n_total"))
                - flog2(F.col("ca"))
                - flog2(F.col("cb"))
            )
            .cast("int")
            .alias("pmi_bits"),
        )
    )
    return scored.orderBy(F.desc("n_pairs"), F.asc("w_a"), F.asc("w_b")).limit(top)


def doc_quality_buckets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """CCNet-style quality bucketing → (doc_id, lang, mean_x1000,
    bucket): each document labeled head / middle / tail by per-language
    terciles of its per-bigram LM cost (``doc_bigram_nll.mean_x1000``,
    LOW cost = well-modeled = head) — the bucket split the CCNet
    pipeline ships so downstream training can sample head-heavy.

    Cuts are VALUE order statistics, not rank splits: cut1(lang) = the
    smallest cost value whose cumulative doc count reaches ceil(n/3)
    (cut2 at ceil(2n/3)); a doc is head iff cost ≤ cut1, middle iff
    ≤ cut2, else tail. Equal-cost docs therefore always share a bucket
    (no tie-break inside a value), every quantity is int64, and the
    oracle restates the identical cumulative rule.

    Scale shape: the cumulative window runs over DISTINCT (lang, cost)
    values — a relation bounded by the cost grid, orders of magnitude
    smaller than the corpus — never over docs; the per-lang cuts are a
    3-row broadcast; bucketing is one codegen projection after a
    broadcast join. No doc-level sort anywhere (the
    source_token_quantiles integer-rank discipline, value-cut form).
    """
    from pyspark.sql import Window

    nll = doc_bigram_nll(docs, text_col=text_col).select("doc_id", "mean_x1000")
    d = docs.select("doc_id", "lang").join(nll, "doc_id")
    counts = d.groupBy("lang", "mean_x1000").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("mean_x1000")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("cum", F.sum("m").over(w))
    sizes = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    k = cum.join(sizes, "lang").select(
        "lang",
        "mean_x1000",
        "cum",
        F.floor((F.col("n") + 2) / 3).cast("long").alias("k1"),
        F.floor((2 * F.col("n") + 2) / 3).cast("long").alias("k2"),
    )
    cuts = k.groupBy("lang").agg(
        F.min(F.when(F.col("cum") >= F.col("k1"), F.col("mean_x1000"))).alias("cut1"),
        F.min(F.when(F.col("cum") >= F.col("k2"), F.col("mean_x1000"))).alias("cut2"),
    )
    bucket = (
        F.when(F.col("mean_x1000") <= F.col("cut1"), F.lit("head"))
        .when(F.col("mean_x1000") <= F.col("cut2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return d.join(F.broadcast(cuts), "lang").select(
        "doc_id", "lang", "mean_x1000", bucket.alias("bucket")
    )
