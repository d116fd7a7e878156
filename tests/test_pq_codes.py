"""pq_codes pins: exact-integer assignment vs a numpy twin, seed
determinism, and the grid-snap rule."""

import hashlib

import numpy as np

from ophois_spark.operators.similarity import PQ_SCALE, pq_codes


def _r(x):
    """Half-away-from-zero rounding — Spark/DuckDB round(), NOT python's
    banker's round()."""
    import math

    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _twin(vecs, m, k):
    """Pure-python PQ: same grid snap, same hash-sample codebook."""
    ids = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    seeds = ids[:k]
    snapped = {
        i: np.array([_r(float(x) * PQ_SCALE) for x in v], dtype=np.int64)
        for i, v in vecs.items()
    }
    dim = len(next(iter(vecs.values())))
    w = dim // m
    out = {}
    for i, v in snapped.items():
        codes = []
        for s in range(m):
            sub = v[s * w : (s + 1) * w]
            best = min(
                range(len(seeds)),
                key=lambda j: (int(((snapped[seeds[j]][s * w : (s + 1) * w] - sub) ** 2).sum()), j),
            )
            codes.append(best)
        out[i] = tuple(codes)
    return out


def test_matches_numpy_twin(spark):
    rng = np.random.RandomState(7)
    vecs = {i: rng.randn(8).astype(np.float32).tolist() for i in range(20)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    got = {
        r.vec_id: (r.c0, r.c1) for r in pq_codes(df, n_subspaces=2, n_centroids=4).collect()
    }
    assert got == _twin(vecs, 2, 4)


def test_seed_vector_codes_itself(spark):
    # every seed's subvectors are in the codebook -> distance 0 to its
    # own centroid, so a seed's code always includes its own index
    vecs = {i: [float(i)] * 8 for i in range(4)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    out = {r.vec_id: (r.c0, r.c1) for r in pq_codes(df, n_subspaces=2, n_centroids=4).collect()}
    twin = _twin(vecs, 2, 4)
    assert out == twin
    # constant-per-vector vectors: each maps to exactly its own seed slot
    ids = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    for i in vecs:
        j = ids.index(i)
        assert out[i] == (j, j)


def test_partitioning_independence(spark):
    rng = np.random.RandomState(3)
    vecs = {i: rng.randn(16).astype(np.float32).tolist() for i in range(30)}
    rows = [(i, v) for i, v in vecs.items()]
    a = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(1)
    b = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(7)
    ra = {r.vec_id: (r.c0, r.c1, r.c2, r.c3) for r in pq_codes(a).collect()}
    rb = {r.vec_id: (r.c0, r.c1, r.c2, r.c3) for r in pq_codes(b).collect()}
    assert ra == rb == _twin(vecs, 4, 16)


def test_plan_broadcast_codebook_no_python(spark):
    import numpy as np

    rng = np.random.RandomState(1)
    rows = [(i, rng.randn(16).astype(np.float32).tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = pq_codes(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_adc_seed_query_finds_itself(spark):
    from ophois_spark.operators.similarity import pq_adc_topk

    rng = np.random.RandomState(11)
    rows = [(i, rng.randn(16).astype(np.float32).tolist()) for i in range(24)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # query with every vector that IS a codebook seed: its own code
    # reconstructs it exactly, so its ADC to itself is 0 and rank 1
    # (vec_id tie-break keeps it first among exact reconstructions)
    ids = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i) for i, _ in rows
    )
    seed_ids = [i for _, i in ids[:16]]
    qset = df.filter(df.vec_id.isin(seed_ids[:3]))
    out = pq_adc_topk(df, qset, 3).collect()
    top1 = {r.qid: (r.vec_id, r.adc) for r in out if r.rank == 1}
    for q in seed_ids[:3]:
        assert top1[q] == (q, 0)


def test_adc_matches_lut_twin(spark):
    from ophois_spark.operators.similarity import pq_adc_topk

    rng = np.random.RandomState(5)
    vecs = {i: rng.randn(8).astype(np.float32).tolist() for i in range(15)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    m, k = 2, 4
    codes = _twin(vecs, m, k)
    ids = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    seeds = ids[:k]
    snap = {
        i: [_r(float(x) * PQ_SCALE) for x in v] for i, v in vecs.items()
    }
    w = len(next(iter(vecs.values()))) // m

    def adc(q, v):
        tot = 0
        for s in range(m):
            c = snap[seeds[codes[v][s]]][s * w : (s + 1) * w]
            qs = snap[q][s * w : (s + 1) * w]
            tot += sum((a - b) ** 2 for a, b in zip(qs, c))
        return tot

    qids = [0, 7]
    qset = df.filter(df.vec_id.isin(qids))
    got = {
        (r.qid, r.rank): (r.vec_id, r.adc)
        for r in pq_adc_topk(df, qset, 5, n_subspaces=m, n_centroids=k).collect()
    }
    for q in qids:
        exp = sorted(((adc(q, v), v) for v in vecs), key=lambda t: (t[0], t[1]))[:5]
        for rank, (d, v) in enumerate(exp, start=1):
            assert got[(q, rank)] == (v, d)


def test_rerank_beats_adc_and_is_exact_on_shortlist_hits(spark):
    """Two-stage rerank (round 5): any true neighbor that survives the
    ADC shortlist must rank by EXACT integer L2 — the seed query's
    nearest neighbor is itself (d2 = 0, rank 1) for every query."""
    import numpy as np
    from ophois_spark.operators.similarity import pq_rerank_topk

    rng = np.random.RandomState(7)
    rows = [(i, rng.randn(16).astype(np.float32).tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = df.filter("vec_id % 10 = 0")
    got = pq_rerank_topk(df, qs, k=3).collect()
    top1 = {r["qid"]: (r["vec_id"], r["d2"]) for r in got if r["rank"] == 1}
    for qid, (vid, d2) in top1.items():
        assert vid == qid and d2 == 0  # exact self-match survives rerank


def test_plan_ivfadc_broadcasts_and_no_python(spark):
    """The composed IVFADC plan must broadcast the small sides (coarse
    centroids, PQ codebook, LUT, query vectors) and stay JVM-side."""
    import numpy as np
    from ophois_spark.operators.similarity import ivfadc_rerank_topk

    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(16).astype(np.float32).tolist()) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = df.filter("vec_id % 20 = 0")
    plan = (
        ivfadc_rerank_topk(df, qs, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
