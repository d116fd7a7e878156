"""Similarity search over the embeddings table (array<float>, dim 64).

- ``cosine_topk``      exact brute-force top-k (baseline + oracle twin)
- ``lsh_buckets``      deterministic sign-projection buckets (the scale
                       path: candidate generation within buckets)
- ``ann_topk``         ANN = top-k within the query's LSH bucket

Cosine math uses ``zip_with``/``aggregate`` Column folds (JVM, double
accumulation, sequential — deterministic). Rankings use values rounded
to 1e-6 with id tie-breaks so cross-backend float noise (~1e-13) can't
reorder them.

Hyperplanes for LSH are integer-weight vectors derived from (plane j,
dim d) arithmetic — deterministic and expressible in SQL for the
oracle; no RNG anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int, id_col: str = "vec_id"
) -> DataFrame:
    """Exact brute-force cosine top-k: (qid, rank, vec_id, sim)."""
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col("embedding")).alias("v")
    )
    q = queries.select(F.col(id_col).alias("qid"), _as_double(F.col("embedding")).alias("qv"))
    sims = q.crossJoin(base).select(
        "qid", "vec_id", F.round(cosine(F.col("qv"), F.col("v")), 6).alias("sim")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("rank").cast("int").alias("rank"), "vec_id", "sim")
    )


def plane_weight(j: Column | int, d: Column | int) -> Column:
    """Deterministic integer hyperplane weight in [-3, 3]."""
    jj = F.lit(j) if isinstance(j, int) else j
    dd = F.lit(d) if isinstance(d, int) else d
    return ((dd * 31 + jj * 17) % 7 - 3).cast("double")


def bucket_col(n_planes: int = N_PLANES, emb_col: str = "embedding") -> Column:
    """The LSH bucket as a pure Column expression over the row's own
    embedding — attachable with ``withColumn`` (no join, no shuffle)."""
    v = _as_double(F.col(emb_col))
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(F.col(emb_col)) - 1),
                lambda x, d: x * plane_weight(j, d),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = (F.round(proj, 6) >= 0).cast("long")
        bucket = bucket + F.shiftleft(bit, j)
    return bucket


def lsh_buckets(embeddings: DataFrame, n_planes: int = N_PLANES, id_col: str = "vec_id") -> DataFrame:
    """(vec_id, bucket): bucket bit j = (rounded projection onto plane j) >= 0."""
    return embeddings.select(
        F.col(id_col).alias("vec_id"), bucket_col(n_planes).alias("bucket")
    )


def near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = N_PLANES,
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: same LSH bucket AND
    cosine ≥ threshold. The bucket equi-join bounds the candidate set
    (the O(N²) cross join never materializes); the exact cosine filters
    false bucket collisions."""
    base = embeddings.select(
        bucket_col(n_planes).alias("bucket"),
        F.col(id_col).alias("vid"),
        _as_double(F.col("embedding")).alias("v"),
    )
    a = base.alias("a")
    c = base.alias("b")
    return (
        a.join(c, "bucket")
        .filter(F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def ivf_centroids(
    embeddings: DataFrame, centroid_mod: int = 37, id_col: str = "vec_id"
) -> DataFrame:
    """Deterministic coarse quantizer: every ``centroid_mod``-th vector.

    (A production IVF trains k-means; the engine's contract needs a
    deterministic, SQL-expressible quantizer so the whole index is
    oracle-checkable. Swapping in trained centroids changes nothing
    downstream.)
    """
    return embeddings.filter(F.col(id_col) % centroid_mod == 0).select(
        F.col(id_col).alias("cid"), _as_double(F.col("embedding")).alias("cv")
    )


def ivf_assign(
    embeddings: DataFrame, centroids: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """(vec_id, cid): each vector → its nearest centroid (inverted list).

    The centroid set is tiny → broadcast; the argmax is a per-vector
    window over |centroids| candidates. At 10^12 scale this is the
    embarrassingly parallel "assign" step of IVF build.
    """
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col("embedding")).alias("v")
    )
    sims = base.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "cid", F.round(cosine(F.col("v"), F.col("cv")), 6).alias("sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int = 2,
    centroid_mod: int = 37,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: probe the ``nprobe`` nearest inverted lists per query,
    exact cosine re-rank inside them — the standard scale path (search
    cost ~ nprobe/|centroids| of brute force)."""
    cents = ivf_centroids(embeddings, centroid_mod, id_col)
    assign = ivf_assign(embeddings, cents, id_col)
    q = queries.select(F.col(id_col).alias("qid"), _as_double(F.col("embedding")).alias("qv"))

    qsims = q.crossJoin(F.broadcast(cents)).select(
        "qid", "cid", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("csim")
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("cid"))
    probes = (
        qsims.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("qid", "cid")
    )

    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col("embedding")).alias("v")
    )
    cand = probes.join(assign, "cid").select("qid", "vec_id")
    sims = (
        cand.join(q, "qid")
        .join(base, "vec_id")
        .select("qid", "vec_id", F.round(cosine(F.col("qv"), F.col("v")), 6).alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("rank").cast("int").alias("rank"), "vec_id", "sim")
    )


def ann_topk(
    embeddings: DataFrame, queries: DataFrame, k: int, n_planes: int = N_PLANES
) -> DataFrame:
    """Approximate top-k: brute force restricted to the query's bucket.

    At 10^12 scale the bucket join replaces the O(Q×N) cross join with
    an equi join on the bucket key; recall is tested (pytest), not
    oracled — it's approximate by construction.
    """
    base = embeddings.select(
        bucket_col(n_planes).alias("bucket"),
        "vec_id",
        _as_double(F.col("embedding")).alias("v"),
    )
    qb = queries.select(
        F.col("vec_id").alias("qid"),
        bucket_col(n_planes).alias("bucket"),
        _as_double(F.col("embedding")).alias("qv"),
    )
    sims = qb.join(base, "bucket").select(
        "qid", "vec_id", F.round(cosine(F.col("qv"), F.col("v")), 6).alias("sim")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("rank").cast("int").alias("rank"), "vec_id", "sim")
    )
