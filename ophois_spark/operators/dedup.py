"""Near-duplicate detection over the documents table.

Scale-path dedup primitives (graft checklist):

- ``exact_dedup``            md5 hash-groupBy
- ``minhash_lsh_pairs``      token-shingle MinHash → banded LSH →
                             same-bucket candidate pairs
- ``shingle_jaccard_pairs``  exact n-gram Jaccard over LSH candidates
- ``simhash``                64-bit-ish (60-bit) sign-sum fingerprint

Hash portability: the only cryptographic hash is md5 (available in
Spark, DuckDB and hashlib). MinHash hashes each shingle ONCE (first 7
md5 hex chars → 28-bit int) and derives the 16 permutations as affine
maps ``(a_j·h + b_j) mod P`` with P = 2^31−1 prime — exact bijections
on [0, P), pure int64 arithmetic, bit-identical in SQL. That's 16×
less hashing than an md5-per-(seed, shingle) design, the difference
between the signature stage being hash-bound and being scan-bound at
100 TB. SimHash uses the first 15 hex chars as a 60-bit integer.

Shuffle shape at 10^12 docs: shingle explode is narrow; the signature
aggregation shuffles on doc_id (near-unique — no skew); the LSH join
shuffles on (band, band_key) whose groups are the near-dup clusters —
bounded by design, AQE splits pathological ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ophois_spark.operators.textops import tokens_col

N_HASHES = 16
BAND_ROWS = 2  # 8 bands of 2 rows


def shingles_col(tokens: Column, k: int = 3) -> Column:
    """k-token shingles as an array (empty if fewer than k tokens)."""
    idx = F.sequence(F.lit(1), F.greatest(F.lit(0), F.size(tokens) - (k - 1)))
    return F.when(F.size(tokens) >= k, F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j) for j in range(k)]
        ),
    )).otherwise(F.array().cast("array<string>"))


def doc_shingles(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) distinct rows.

    The tokenize→shingle chain is the CPU-dense stage feeding MinHash,
    LSH and Jaccard; ``fan_out`` guarantees it gets at least one input
    split per core (a no-op on any at-scale layout — see
    plans/layout.py)."""
    from ophois_spark.plans.layout import fan_out

    return (
        fan_out(docs.select("doc_id", F.col(text_col)))
        .select("doc_id", F.explode(shingles_col(tokens_col(F.col(text_col)), k)).alias("shingle"))
        .distinct()
    )


def content_hash_col(text: Column) -> Column:
    """THE exact-dup identity: raw md5 of the text bytes, no
    normalization (byte-identical contract). Single definition shared
    by ``exact_dedup`` and every consumer that joins back on the hash
    (``corpus.data_card``) — changing the identity in one place keeps
    the join keys aligned."""
    return F.md5(text)


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.groupBy(
        content_hash_col(F.col(text_col)).alias("content_hash")
    ).agg(F.min("doc_id").alias("rep_doc_id"), F.count(F.lit(1)).alias("n_docs"))


# single source of truth for the affine-permutation family: the numpy/
# hashlib kernel twin — re-exported here for the SQL oracle builder
from ophois_spark.kernels.text import MINHASH_P, minhash_affine  # noqa: E402


def _minhash_sig_cols(shingle: Column, n_hashes: int) -> list[Column]:
    """One md5 per shingle; permutation j = (a_j·h0 + b_j) mod P.
    h0 < 2^28 and a_j < 2^31 keep every product inside int64."""
    h0 = F.conv(F.substring(F.md5(shingle), 1, 7), 16, 10).cast("long")
    out = []
    for j in range(n_hashes):
        a, b = minhash_affine(j)
        out.append((F.lit(a) * h0 + F.lit(b)) % F.lit(MINHASH_P))
    return out


def _minhash_agg(
    docs: DataFrame, n_hashes: int, k: int, shingles: DataFrame | None
) -> DataFrame:
    """(doc_id, s0..s{n-1}): all signature mins in ONE pass over the
    shingle rows — n_hashes min-aggregates instead of an
    explode(n_hashes) row blowup, so the shuffle is |docs| wide rows."""
    sh = doc_shingles(docs, k) if shingles is None else shingles
    cols = _minhash_sig_cols(F.col("shingle"), n_hashes)
    return sh.groupBy("doc_id").agg(
        *[F.min(c).alias(f"s{j}") for j, c in enumerate(cols)]
    )


def minhash_signatures(
    docs: DataFrame, n_hashes: int = N_HASHES, k: int = 3, shingles: DataFrame | None = None
) -> DataFrame:
    """(doc_id, j, sig): sig_j = min over shingles of the j-th affine
    permutation of the shingle hash. Pass precomputed ``shingles`` to
    share the tokenize+shingle+distinct lineage with other consumers.
    (The row shape is unpivoted AFTER the one-pass agg — the explode
    runs on |docs| rows, not |shingles|.)"""
    agg = _minhash_agg(docs, n_hashes, k, shingles)
    pairs = F.array(
        *[
            F.struct(F.lit(j).alias("j"), F.col(f"s{j}").alias("sig"))
            for j in range(n_hashes)
        ]
    )
    return agg.select("doc_id", F.explode(pairs).alias("x")).select(
        "doc_id", F.col("x.j").cast("int").alias("j"), "x.sig"
    )


def lsh_band_keys(
    docs: DataFrame,
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
    k: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, band, band_key): band_key = the band's sigs joined with
    ':' — raw ints, no second-level hash needed for the equi-join. When
    band_rows doesn't divide n_hashes the trailing band carries the
    remaining sigs (shorter band ⇒ higher collision rate, never a
    silently dropped signature)."""
    agg = _minhash_agg(docs, n_hashes, k, shingles)
    n_bands = -(-n_hashes // band_rows)  # ceil
    bands = F.array(
        *[
            F.struct(
                F.lit(t).alias("band"),
                F.concat_ws(
                    ":",
                    *[
                        F.col(f"s{j}")
                        for j in range(
                            t * band_rows, min((t + 1) * band_rows, n_hashes)
                        )
                    ],
                ).alias("band_key"),
            )
            for t in range(n_bands)
        ]
    )
    return agg.select("doc_id", F.explode(bands).alias("x")).select(
        "doc_id", F.col("x.band").cast("int").alias("band"), "x.band_key"
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
    k: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing any LSH band bucket."""
    bands = lsh_band_keys(docs, n_hashes, band_rows, k, shingles)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def shingle_jaccard_pairs(docs: DataFrame, k: int = 3) -> DataFrame:
    """Exact shingle-set Jaccard for every LSH candidate pair — ARRAY-FREE.

    Intersections are counted on exploded (pair, shingle) rows: each
    candidate pair joins its doc_a shingles against the (doc_b,
    shingle) set and counts the matches. No ``collect_set`` arrays ever
    travel through a join, so the shuffle payload per row stays
    constant no matter how long documents get (the array formulation
    carried both docs' full shingle sets through the pair join —
    memory-quadratic in doc length at 100 TB).

    The tokenize+shingle+distinct lineage is computed ONCE (persisted,
    MEMORY_AND_DISK) feeding the MinHash signatures, the counts, and
    the intersection. The block lives in the named cache slot
    ``shingle_jaccard.shingles`` (plans/cache.py): re-invoking this
    function unpersists the previous corpus's block, so looping over
    many corpora holds at most one; ``cache.release(...)`` frees it
    explicitly.
    """
    from ophois_spark.plans.cache import swap_cached

    sh = swap_cached("shingle_jaccard.shingles", doc_shingles(docs, k))
    pairs = minhash_lsh_pairs(docs, k=k, shingles=sh)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        pairs.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .withColumn("inter", F.coalesce("inter", F.lit(0)).cast("long"))
        .join(counts.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(counts.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
    )
    return j.select(
        "doc_a",
        "doc_b",
        "inter",
        (F.col("na") + F.col("nb") - F.col("inter")).cast("long").alias("union_n"),
        (
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
        ).alias("jaccard"),
    )


CONTAINMENT_MIN = 0.9  # containment threshold shared with the oracle


def containment_pairs(docs: DataFrame, k: int = 3) -> DataFrame:
    """Asymmetric containment over LSH candidates — the doc-inside-doc
    detector exact Jaccard misses: a 50-shingle quote embedded in a
    5000-shingle page has J ≈ 0.01 but containment 1.0. Broder's
    containment C(A,B) = |A∩B| / |A| evaluated with A = the SMALLER
    shingle set of each candidate pair, emitted as (doc_contained,
    doc_container) when C >= ``CONTAINMENT_MIN`` (ties on set size
    break to the lower doc_id as the contained side, so the direction
    is deterministic).

    Same array-free execution shape as ``shingle_jaccard_pairs`` (the
    100 TB discipline: no shingle arrays ever travel through the pair
    join — intersections count exploded (pair, shingle) rows, constant
    shuffle payload per row). Candidate generation is the identical
    banded-MinHash chain, so recall is the LSH band curve evaluated at
    the pair's JACCARD, not its containment: a tiny quote inside a
    huge page has low J and will rarely share a band. That is the
    documented trade of reusing symmetric MinHash for an asymmetric
    question; the principled scale fix is a dedicated containment
    sketch (e.g. bottom-k with asymmetric band widths), out of scope
    here. The oracle replays the same LSH pair set, so both sides
    agree on WHICH pairs are scored at any sf/seed.
    """
    from ophois_spark.plans.cache import swap_cached

    sh = swap_cached("containment_pairs.shingles", doc_shingles(docs, k))
    pairs = minhash_lsh_pairs(docs, k=k, shingles=sh)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        pairs.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(
            counts.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a"
        ).join(counts.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
    )
    # contained side = smaller shingle set; tie -> lower doc_id (doc_a,
    # since pairs are emitted with doc_a < doc_b).
    a_small = (F.col("na") < F.col("nb")) | (F.col("na") == F.col("nb"))
    out = j.select(
        F.when(a_small, F.col("doc_a")).otherwise(F.col("doc_b")).alias("doc_contained"),
        F.when(a_small, F.col("doc_b")).otherwise(F.col("doc_a")).alias("doc_container"),
        F.col("inter").cast("long").alias("inter"),
        F.when(a_small, F.col("na")).otherwise(F.col("nb")).cast("long").alias("n_contained"),
        (
            F.col("inter").cast("double")
            / F.when(a_small, F.col("na")).otherwise(F.col("nb")).cast("double")
        ).alias("containment"),
    )
    return out.filter(F.col("containment") >= F.lit(CONTAINMENT_MIN))


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """60-bit SimHash over the token multiset — Arrow-batched kernel.

    Per token: h = first 15 hex chars of md5 as int (60 bits); each bit
    contributes ±1; final bit b set iff the sum is > 0 (ties → 0,
    deterministic). Executes via ``mapInPandas`` over
    ``kernels.text.simhash60`` — one vectorized pass per document with
    ZERO shuffle, instead of the explode(60)×tokens row blowup (the
    Column formulation lives on as the DuckDB oracle twin; kernel↔SQL
    equality is pinned by tests). Tokenization is the exact Python twin
    of ``textops.tokens_col``: Spark ``trim`` strips spaces only, and
    Java regex ``\\s`` is ASCII, hence ``strip(' ')`` + ASCII split.
    NULL text yields no row (explode-of-null parity).
    """
    import re
    from collections.abc import Iterator

    import pandas as pd

    from ophois_spark.kernels.text import simhash60_batch

    ws = re.compile(r"\s+", re.ASCII)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            toks: list[list[str]] = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue
                ids.append(did)
                toks.append(ws.split(text.strip(" ")))
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "simhash": pd.Series(simhash60_batch(toks), dtype="int64")})

    from ophois_spark.plans.layout import fan_out

    return fan_out(docs.select(F.col("doc_id"), F.col(text_col).alias("text"))).mapInPandas(
        gen, "doc_id long, simhash long"
    )


NEAR_DUP_JACCARD = 0.8  # verification threshold shared with the oracle


def near_dup_clusters(
    docs: DataFrame, threshold: float = NEAR_DUP_JACCARD, k: int = 3
) -> DataFrame:
    """The dedup DECISION: → (doc_id, cluster, is_canonical).

    Last stage of a corpus dedup pipeline, composed from the engine's
    own parts: LSH candidate pairs → exact shingle-Jaccard verification
    (``>= threshold`` drops LSH false positives) → connected components
    over the verified pair graph (near-duplicacy is transitive only
    through its clusters, so the cluster — not the pair — is the unit
    of removal) → cluster label = min doc_id. Every document appears
    exactly once (singletons label themselves); ``is_canonical = 1``
    marks the kept representative, so ``WHERE is_canonical = 1`` IS the
    deduplicated corpus and ``1 - sum(is_canonical)/count(*)`` the dup
    rate.

    Scale shape at 10^12 docs: verification reuses the array-free
    exploded-count join (constant shuffle payload per row); the
    component loop runs over the INDUCED pair subgraph only — both its
    edge set (verified near-dup pairs) AND its node set (their
    endpoints) are orders of magnitude smaller than the corpus, so the
    O(log diameter) label rounds never iterate over the untouched
    documents; singletons self-label through one left join at the end.
    Components reuse ``connected_components`` (numeric min label = min
    doc_id), the same operator the street graph uses.
    """
    return _clusters_from_pairs(
        docs.select(F.col("doc_id").alias("id")),
        shingle_jaccard_pairs(docs, k)
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
    ).select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster"),
        (F.col("id") == F.col("comp")).cast("int").alias("is_canonical"),
    )


def _clusters_from_pairs(ids: DataFrame, pairs: DataFrame) -> DataFrame:
    """(id) × (src, dst) → (id, comp) with comp = min id in component
    and comp = id for rows untouched by any pair.

    The label loop runs on the induced subgraph (pair endpoints only):
    at corpus scale the iterated relation shrinks from |corpus| to
    |near-dup endpoints| — typically orders of magnitude — while the
    full id set enters exactly once, through the final left join.
    """
    from ophois_spark.operators.components import connected_components
    from ophois_spark.operators.graph import StreetGraph

    # materialize the verified pairs ONCE: endpoints and the loop's
    # bidirected edge relation both derive from this (tiny) set, and
    # without the checkpoint each would independently replay the
    # expensive verification lineage upstream
    pairs = pairs.localCheckpoint(eager=True)
    endpoints = (
        pairs.select(F.col("src").alias("id"))
        .unionByName(pairs.select(F.col("dst").alias("id")))
        .distinct()
    )
    labels = connected_components(StreetGraph(nodes=endpoints, edges=pairs))
    return ids.join(labels, "id", "left").select(
        "id", F.coalesce("comp", "id").alias("comp")
    )


def ngram_topk(
    docs: DataFrame, k: int = 3, topn: int = 20, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide n-gram frequency top-N → (ngram, n), most frequent
    first, ties broken on the gram string so the selected SET is
    deterministic (repetition/boilerplate analysis over a training
    corpus).

    Scale shape: the shingle explode is narrow (no shuffle); the count
    is an algebraic aggregation, so hot grams collapse map-side to one
    partial row per input split before the shuffle — corpus-frequency
    skew never concentrates on a reducer; the global top-N executes as
    TakeOrderedAndProject (per-partition heap, driver merges topn rows
    per partition), never a full sort shuffle.
    """
    from ophois_spark.plans.layout import fan_out

    grams = fan_out(docs.select(F.col(text_col))).select(
        F.explode(shingles_col(tokens_col(F.col(text_col)), k)).alias("ngram")
    )
    counts = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("ngram")).limit(topn)


def shingle_contamination(
    train: DataFrame, eval_docs: DataFrame, k: int = 3
) -> DataFrame:
    """Train→eval contamination check → one row per eval doc:
    (doc_id, n_shingles, n_hit, hit_ratio).

    The benchmark-decontamination primitive of an LLM data pipeline:
    an eval document whose k-token shingles largely appear anywhere in
    the training corpus is contaminated (hit_ratio == 1.0 means every
    eval shingle leaks). Short docs (< k tokens) have no shingles and
    report (0, 0, NULL).

    Scale shape: both sides reduce to DISTINCT (doc_id, shingle) /
    (shingle) relations; the membership test is a left-semi equi-join
    on the shingle hash — shuffle-partitioned, broadcastable when the
    eval side is small (the usual case: eval benchmarks ≪ training
    corpus, so at 100 TB flip the join to broadcast the EVAL shingles
    and semi-join the train scan against them — same relational form).
    hit_ratio is one exact int/int division, bit-stable across engines.
    """
    tsh = doc_shingles(train, k).select("shingle").distinct()
    esh = doc_shingles(eval_docs, k)
    tot = esh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        esh.join(tsh, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        eval_docs.select("doc_id")
        .join(tot, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.coalesce("n_hit", F.lit(0)).cast("double")
                / F.col("n_shingles").cast("double"),
            ).alias("hit_ratio"),
        )
    )


SIMHASH_BANDS = 4  # 60-bit signature -> 4 bands of 15 bits
SIMHASH_BAND_BITS = 15
SIMHASH_MAX_HAMMING = 3  # pigeonhole: <= BANDS-1 differing bits guaranteed found


def simhash_hamming_pairs(
    docs: DataFrame, max_hamming: int = SIMHASH_MAX_HAMMING, text_col: str = "text"
) -> DataFrame:
    """SimHash near-dup pairs → (doc_a, doc_b, hamming) with
    ``hamming <= max_hamming`` over the 60-bit signature.

    Banded exact-recall scheme (Manku et al., WWW'07 "Detecting
    near-duplicates for web crawling"): the signature splits into
    ``SIMHASH_BANDS`` disjoint 15-bit chunks; two signatures within
    ``max_hamming <= SIMHASH_BANDS - 1`` differing bits must agree on
    at least one whole chunk (pigeonhole), so an equi-join on
    (band_index, band_value) finds EVERY qualifying pair — the oracle
    is the brute-force all-pairs scan, which also proves the recall
    guarantee, not just the refine step.

    Scale shape at 10^12 docs: signatures are 8 bytes/doc; the
    candidate step is 4 bucketed hash equi-joins (one per band) in a
    single posexplode'd self-join — never all-pairs. The refine
    (``bit_count(a XOR b)``) is a codegen'd integer op on the join
    output. Hot buckets (e.g. the all-zero signature of empty pages)
    are data skew in an equi-join — AQE skew-split applies, and a
    salt+re-check fallback is available since the refine re-verifies
    every candidate. Pairs matching in several bands are deduplicated
    by the final aggregate.
    """
    sig = simhash(docs, text_col)
    mask = (1 << SIMHASH_BAND_BITS) - 1
    bands = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * SIMHASH_BAND_BITS).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band", "bval"),
    )
    a = bands.select(
        F.col("band"),
        F.col("bval"),
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sim_a"),
    )
    b = bands.select(
        F.col("band"),
        F.col("bval"),
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sim_b"),
    )
    cand = a.join(b, ["band", "bval"]).where(F.col("doc_a") < F.col("doc_b"))
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .groupBy("doc_a", "doc_b")
        .agg(F.first("hamming").alias("hamming"))
    )


def latest_snapshot_dedup(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """Recrawl dedup: keep the newest snapshot per URL →
    (url, ts, id, n_crawls). Ties on the timestamp (two captures in
    the same instant) break to the greatest id, so the survivor is a
    deterministic function of the set, not of partitioning.

    THE first pass of any Common-Crawl-style corpus build: a URL
    crawled monthly appears dozens of times and only the freshest
    capture should enter the pipeline.

    Scale shape: a single algebraic ``max(struct(ts, id))`` aggregation
    — partial-aggregated map-side, so a URL's duplicates collapse
    within each input split before the one hash shuffle on url; no
    window (a window formulation sorts every group), no join, and
    skew from hot URLs is bounded by the per-split partial rows.
    """
    best = F.max(
        F.struct(
            F.col(ts_col).alias(ts_col), F.col(id_col).cast("long").alias(id_col)
        )
    ).alias("best")
    return (
        pages.groupBy(F.col(url_col).alias("url"))
        .agg(best, F.count(F.lit(1)).alias("n_crawls"))
        .select(
            "url",
            F.col(f"best.{ts_col}").alias(ts_col),
            F.col(f"best.{id_col}").alias(id_col),
            "n_crawls",
        )
    )


def snapshot_delta(
    captures: DataFrame,
    t1_us: int,
    t2_us: int,
    url_col: str = "url",
    ts_col: str = "us",
    id_col: str = "doc_id",
) -> DataFrame:
    """Crawl snapshot diff → (url, status, old_id, new_id): what
    changed between the corpus state as of ``t1_us`` and as of
    ``t2_us`` (integer epoch micros, both cutoffs inclusive) — the
    incremental-recrawl planning query ('what do we re-extract this
    month'). Per URL the representative capture is the max (ts, id)
    struct (the latest_snapshot_dedup survivor rule); status is
    'added' (no capture at-or-before t1), 'updated' (a newer capture
    arrived in (t1, t2]), or 'unchanged'. A capture log is append-only,
    so 'removed' cannot occur and URLs absent at t2 don't exist at t1
    either.

    Shuffle shape — the reason this isn't two snapshots + a join: BOTH
    snapshots come out of ONE aggregation pass, as a conditional
    struct-max (``max(when(ts <= t1, struct))`` next to the plain max)
    — algebraic, map-side combined, one hash shuffle on url total;
    the naive formulation pays two aggregations plus a url-keyed join.
    ``old_id`` is -1 for added URLs (the repo-wide null-free integer
    contract).
    """
    st = F.struct(
        F.col(ts_col).alias("ts"), F.col(id_col).cast("long").alias("id")
    )
    agg = (
        captures.filter(F.col(ts_col) <= t2_us)
        .groupBy(url_col)
        .agg(
            F.max(F.when(F.col(ts_col) <= t1_us, st)).alias("m1"),
            F.max(st).alias("m2"),
        )
    )
    return agg.select(
        url_col,
        F.when(F.col("m1").isNull(), F.lit("added"))
        .when(
            (F.col("m1.ts") == F.col("m2.ts")) & (F.col("m1.id") == F.col("m2.id")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("updated"))
        .alias("status"),
        F.coalesce(F.col("m1.id"), F.lit(-1)).alias("old_id"),
        F.col("m2.id").alias("new_id"),
    )


KMV_K = 256
KMV_HEX = 15  # 60-bit hash space, same md5-prefix idiom as postings
KMV_SPACE = float(16**KMV_HEX)


def shingle_cardinality_kmv(docs: DataFrame, k: int = KMV_K) -> DataFrame:
    """K-minimum-values distinct-cardinality sketch over the corpus
    shingle set → ONE row (k, n_exact, n_mins, kth_min, est_distinct).

    The sketch a 100 TB build uses where exact COUNT(DISTINCT
    3-gram) is a full-corpus string shuffle: keep the k smallest
    DISTINCT 60-bit hashes; est = (k-1)·H / h_(k) (Bar-Yossef et al.,
    RANDOM'02). Everything the estimator touches is exact integer
    state (min-k of distinct hashes), so the oracle replays it
    bit-for-bit — no sampling tolerance in the gate; the one double
    division uses a single precomputed literal numerator. When the
    distinct count is below k the sketch IS exact and falls back to
    it, per the standard small-cardinality rule.

    The exact twin (n_exact, COUNT DISTINCT over shingle STRINGS) is
    computed alongside at gate scale so the estimate is judged against
    truth; at production scale one would drop that branch — the sketch
    path's only full shuffle is the hash distinct (map-side partial
    dedup), and min-k is a TakeOrdered, driver-side k rows.
    """
    sh = doc_shingles(docs)
    hs = sh.select(
        F.conv(F.substring(F.md5("shingle"), 1, KMV_HEX), 16, 10)
        .cast("long")
        .alias("h")
    ).distinct()
    mins = hs.orderBy("h").limit(k)
    m = mins.agg(
        F.count(F.lit(1)).cast("long").alias("n_mins"),
        F.max("h").alias("kth_min"),
    )
    exact = sh.agg(F.countDistinct("shingle").cast("long").alias("n_exact"))
    num = F.lit((k - 1) * KMV_SPACE)
    return (
        m.crossJoin(exact)
        .select(
            F.lit(k).cast("long").alias("k"),
            "n_exact",
            "n_mins",
            "kth_min",
            F.when(F.col("n_mins") >= k, num / F.col("kth_min").cast("double"))
            .otherwise(F.col("n_exact").cast("double"))
            .alias("est_distinct"),
        )
    )


EDIT_MAX = 16


def edit_distance_pairs(
    docs: DataFrame, max_dist: int = EDIT_MAX, text_col: str = "text"
) -> DataFrame:
    """Exact Levenshtein verification over SimHash candidate pairs →
    (doc_a, doc_b, edit_dist) with ``edit_dist <= max_dist`` — the
    character-level near-identical check (template pages differing by
    a date stamp or a counter) that token-level Jaccard blurs.

    Scale shape: the DP runs ONLY on the banded-SimHash candidate set
    (exact recall at hamming <= 3, so character-level near-identity —
    which implies near-identical token multisets — is inside the
    candidate envelope for docs longer than a few tokens). Spark's
    thresholded ``levenshtein(l, r, threshold)`` runs the banded DP —
    O(len × max_dist) per pair, early-exit -1 above the threshold —
    so per-pair cost is linear in document length, and the join ships
    each candidate pair's two texts exactly once.
    """
    pairs = simhash_hamming_pairs(docs, text_col=text_col).select("doc_a", "doc_b")
    t = docs.select("doc_id", F.col(text_col).alias("_t"))
    j = (
        pairs.join(t.select(F.col("doc_id").alias("doc_a"), F.col("_t").alias("_ta")), "doc_a")
        .join(t.select(F.col("doc_id").alias("doc_b"), F.col("_t").alias("_tb")), "doc_b")
    )
    d = F.levenshtein(F.col("_ta"), F.col("_tb"), max_dist)
    return (
        j.select(
            F.col("doc_a").cast("long").alias("doc_a"),
            F.col("doc_b").cast("long").alias("doc_b"),
            d.cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") >= 0)
    )


MIRROR_FP_DF_MAX = 8  # fingerprints on more sources than this are chrome, not content


def source_mirror_pairs(
    docs: DataFrame,
    jac_num: int = 1,
    jac_den: int = 2,
    fp_df_max: int = MIRROR_FP_DF_MAX,
    text_col: str = "text",
) -> DataFrame:
    """Mirror-site detection → (source_a, source_b, n_a, n_b, n_shared,
    jac_pct): pairs of sources whose CONTENT fingerprint sets overlap
    with Jaccard ≥ jac_num/jac_den — the host-level dedup a crawl
    curation runs before per-document dedup ever sees the mirrored
    half (CDN aliases, www/non-www splits, scraped re-hosts).

    Exact integer gate: fingerprints are md5 of whitespace-normalized
    text (the corpus_pipeline fp), per-source set sizes and pairwise
    intersections are counts over DISTINCT (source, fp), and the
    threshold is cross-multiplied — ``jac_den·i ≥ jac_num·(n_a+n_b−i)``
    — so no float division decides membership; ``jac_pct`` is the
    floored integer percent for reading, not for the cut.

    Scale shape: candidates come from ONE fp equi-join over distinct
    (source, fp) — only sources sharing at least one fingerprint ever
    meet, never an all-pairs loop over hosts. A fingerprint present on
    > ``fp_df_max`` sources fans that join out quadratically AND says
    "boilerplate/chrome", not "mirrored content" — it is dropped
    before the join (the CCNet df-cap rationale, disclosed in the
    output semantics: shared counts are over content-discriminative
    fingerprints). The per-source size agg and the pair count are both
    map-side combinable.
    """
    fp = F.md5(F.regexp_replace(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+", " "))
    sfp = docs.select("source", fp.alias("fp")).distinct()
    from ophois_spark.plans.cache import swap_cached

    sfp = swap_cached("mirror.sfp", sfp)
    sizes = sfp.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    rare = sfp.join(
        sfp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= fp_df_max)
        .select("fp"),
        "fp",
        "left_semi",
    )
    shared = (
        rare.alias("a")
        .join(rare.alias("b"), "fp")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    out = (
        shared.join(
            sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a")),
            "source_a",
        )
        .join(
            sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b")),
            "source_b",
        )
        .filter(
            F.lit(int(jac_den)) * F.col("n_shared")
            >= F.lit(int(jac_num)) * (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
        )
    )
    return out.select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        "n_shared",
        F.floor(
            F.lit(100) * F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
        )
        .cast("long")
        .alias("jac_pct"),
    )
