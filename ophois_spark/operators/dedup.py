"""Near-duplicate detection over the documents table.

Scale-path dedup primitives (graft checklist):

- ``exact_dedup``            md5 hash-groupBy
- ``minhash_lsh_pairs``      token-shingle MinHash → banded LSH →
                             same-bucket candidate pairs
- ``shingle_jaccard_pairs``  exact n-gram Jaccard over LSH candidates
- ``simhash``                64-bit-ish (60-bit) sign-sum fingerprint

Hash portability: every hash is md5 (available in Spark, DuckDB and
hashlib), with the hex digest either compared as a string (MinHash —
the lexicographic min of md5 hexes is a valid uniform min-hash) or its
first 15 hex chars cast to a 60-bit integer (SimHash) — so each
operator has an exact ANSI-SQL oracle twin.

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
    """(doc_id, shingle) distinct rows."""
    return (
        docs.select("doc_id", F.explode(shingles_col(tokens_col(F.col(text_col)), k)).alias("shingle"))
        .distinct()
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.groupBy(F.md5(F.col(text_col)).alias("content_hash")).agg(
        F.min("doc_id").alias("rep_doc_id"), F.count(F.lit(1)).alias("n_docs")
    )


def minhash_signatures(
    docs: DataFrame, n_hashes: int = N_HASHES, k: int = 3, shingles: DataFrame | None = None
) -> DataFrame:
    """(doc_id, j, sig): sig_j = min over shingles of md5('0j§'+shingle).

    Lexicographic min over md5 hex digests — a uniform permutation min
    per seed j, portable across engines. Pass precomputed ``shingles``
    to share the tokenize+shingle+distinct lineage with other consumers.
    """
    sh = doc_shingles(docs, k) if shingles is None else shingles
    seeded = sh.withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))))
    h = F.md5(F.concat(F.lpad(F.col("j"), 2, "0"), F.lit("§"), F.col("shingle")))
    return seeded.groupBy("doc_id", "j").agg(F.min(h).alias("sig"))


def lsh_band_keys(
    docs: DataFrame,
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
    k: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, band, band_key): band_key = md5 of the band's ordered sigs."""
    sig = minhash_signatures(docs, n_hashes, k, shingles).withColumn(
        "band", (F.col("j") / band_rows).cast("int")
    )
    part = F.concat(F.lpad(F.col("j"), 2, "0"), F.lit(":"), F.col("sig"))
    return (
        sig.groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws("|", F.sort_array(F.collect_list(part)))).alias("band_key"))
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
    """Exact shingle-set Jaccard for every LSH candidate pair.

    The tokenize+shingle+distinct lineage is computed ONCE (persisted)
    and feeds both the MinHash signatures and the exact sets — without
    the share it would run twice, doubling the dominant stages.
    """
    from pyspark import StorageLevel

    sh = doc_shingles(docs, k).persist(StorageLevel.MEMORY_AND_DISK)
    pairs = minhash_lsh_pairs(docs, k=k, shingles=sh)
    sets = sh.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("s"), F.count(F.lit(1)).alias("n")
    )
    j = (
        pairs.join(sets.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"), F.col("n").alias("na")), "doc_a")
        .join(sets.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"), F.col("n").alias("nb")), "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")).cast("long"))
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


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """60-bit SimHash over the token multiset, pure DataFrame ops.

    Per token: h = first 15 hex chars of md5 as int (60 bits); each bit
    contributes ±1; final bit b set iff the sum is > 0 (ties → 0,
    deterministic). The explode(60)×tokens formulation stays JVM-side
    and mirrors 1:1 into SQL; a numpy kernel (kernels/text.py) computes
    the same value per partition for the 10^12-scale path.
    """
    toks = docs.select("doc_id", F.explode(tokens_col(F.col(text_col))).alias("tok"))
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    bits = toks.select(
        "doc_id", h.alias("h"), F.explode(F.sequence(F.lit(0), F.lit(59))).alias("b")
    ).select("doc_id", "b", F.expr("(shiftright(h, b) & CAST(1 AS BIGINT)) * 2 - 1").alias("w"))
    per_bit = bits.groupBy("doc_id", "b").agg(F.sum("w").alias("s"))
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )
