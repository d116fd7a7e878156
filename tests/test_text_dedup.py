"""Behavioral tests: dedup quality, ANN recall, kernel/DataFrame parity."""

from pyspark.sql import functions as F

from ophois_spark.kernels.text import hamming60, minhash_sig, simhash60
from ophois_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures, simhash
from ophois_spark.operators.similarity import ann_topk, cosine_topk, lsh_buckets

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = _docs(
        spark,
        [
            (1, base),
            (2, base.replace("today", "tonight")),  # near-dup of 1
            (3, "completely different content about spark shuffles and joins here"),
            (4, base),  # exact dup of 1
        ],
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()}
    assert (1, 4) in pairs  # exact dup always collides
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup collides in some band
    assert all(3 not in p for p in pairs)  # unrelated doc never pairs


def test_minhash_signatures_match_kernel(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(spark, [(7, text)])
    rows = minhash_signatures(docs).orderBy("j").collect()
    toks = text.split()
    shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    assert [r["sig"] for r in rows] == minhash_sig(shingles)


def test_simhash_matches_kernel_and_hamming(spark):
    t1 = "spark shuffles partition data across the cluster for joins"
    t2 = "spark shuffles partition data across the cluster for aggregations"
    t3 = "entirely unrelated words about street graphs and osm extracts"
    docs = _docs(spark, [(1, t1), (2, t2), (3, t3)])
    got = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    for did, text in [(1, t1), (2, t2), (3, t3)]:
        assert got[did] == simhash60(text.split())
    assert hamming60(got[1], got[2]) < hamming60(got[1], got[3])


def test_ann_recall_against_bruteforce(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 25 == 0)
    exact = cosine_topk(emb, q, k=10).toPandas()
    approx = ann_topk(emb, q, k=10).toPandas()
    # rank-1 self-match always survives bucketing (query is in its own bucket)
    self_hits = approx[(approx["rank"] == 1)]
    assert (self_hits["qid"] == self_hits["vec_id"]).all()
    # recall@10 of bucket-restricted search vs exact. Embeddings here are
    # RANDOM (no cluster structure), the worst case for LSH — the bar is
    # "far above the random-candidate baseline", not absolute recall.
    ex = {(r.qid, r.vec_id) for r in exact.itertuples()}
    ap = {(r.qid, r.vec_id) for r in approx.itertuples()}
    recall8 = len(ex & ap) / len(ex)
    n = emb.count()
    avg_bucket = lsh_buckets(emb).groupBy("bucket").count().agg(F.avg("count")).collect()[0][0]
    random_baseline = avg_bucket / n
    assert recall8 > 3 * random_baseline, (recall8, random_baseline)
    # fewer planes → bigger buckets → higher recall (the tuning knob)
    approx4 = ann_topk(emb, q, k=10, n_planes=4).toPandas()
    ap4 = {(r.qid, r.vec_id) for r in approx4.itertuples()}
    recall4 = len(ex & ap4) / len(ex)
    assert recall4 >= recall8


def test_ivf_kmeans_quantizer_contract(spark):
    """Trained (Lloyd) IVF centroids: well-formed centroid table seeded
    from the hash sample, and ivf_topk(trained=True) honors the top-k
    contract. Recall improvement is measured (not asserted — float-sum
    nondeterminism) in bench.py's ann_recall_at_10 report."""
    import math

    from ophois_spark.operators.similarity import ivf_centroids_kmeans, ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    cents = ivf_centroids_kmeans(emb, n_centroids=8, n_iter=2).collect()
    assert 1 <= len(cents) <= 8
    for r in cents:
        assert len(r["cv"]) == dim
        assert all(math.isfinite(x) for x in r["cv"])
    q = emb.filter(F.col("vec_id") % 25 == 0)
    out = ivf_topk(emb, q, k=5, nprobe=2, n_centroids=8, trained=True).toPandas()
    assert set(out["rank"].unique()) <= {1, 2, 3, 4, 5}
    per_q = out.groupby("qid")["rank"].apply(lambda s: sorted(s.tolist()))
    assert all(r == list(range(1, len(r) + 1)) for r in per_q)
    # rank-1 is the query itself (it lives in its own probed list)
    r1 = out[out["rank"] == 1]
    assert (r1["qid"] == r1["vec_id"]).all()


def test_lsh_buckets_distribution(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    b = lsh_buckets(emb)
    n_buckets = b.select("bucket").distinct().count()
    assert 2 <= n_buckets <= 256


def _winnow_scalar(text, k, w, B, P):
    """Straight-line reference implementation of winnowing."""
    import re

    s = re.sub(r"[^a-z0-9]", "", text.lower())
    if len(s) < k + w - 1:
        return set()
    hashes = [
        sum(ord(s[i + j]) * pow(B, k - 1 - j, P) for j in range(k)) % P
        for i in range(len(s) - k + 1)
    ]
    return {min(hashes[t : t + w]) for t in range(len(hashes) - w + 1)}


def test_winnow_matches_scalar_and_guarantee(spark):
    """winnow_fingerprint == the scalar reference on mixed random/edge
    docs, and the winnowing GUARANTEE holds: two docs sharing a
    canonical substring of >= k+w-1 chars share a fingerprint hash."""
    import random

    from ophois_spark.operators.textops import (
        WINNOW_B,
        WINNOW_K,
        WINNOW_P,
        WINNOW_W,
        winnow_fingerprint,
    )

    rng = random.Random(42)
    alpha = "abcdefgh  ,.XYZ019"
    shared = "the common stretch of text both documents quote verbatim"
    docs = [
        (0, "".join(rng.choice(alpha) for _ in range(200)) + shared),
        (1, shared + "".join(rng.choice(alpha) for _ in range(200))),
        (2, "".join(rng.choice(alpha) for _ in range(300))),
        (3, ""),              # empty -> no rows
        (4, " .,;!? "),       # canonicalizes to '' -> no rows
        (5, "abcdefg"),       # 7 canonical chars < k+w-1=8 -> no rows
        (6, "abcdefgh"),      # exactly one window -> one hash
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprint(df).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for did, text in docs:
        want = _winnow_scalar(text, WINNOW_K, WINNOW_W, WINNOW_B, WINNOW_P)
        assert got.get(did, set()) == want, f"doc {did}"
    assert got[0] & got[1], "shared substring must share a fingerprint"
    assert len(got[6]) == 1


def test_winnow_overlap_pairs_guarantee_and_boilerplate_cap(spark):
    """Pairs with a shared >= k+w-1 canonical substring surface with
    n_shared >= 1; boilerplate fingerprints (df > max_df) never pair
    documents; n_shared equals the exact capped-fp intersection."""
    import random

    from ophois_spark.operators.textops import winnow_fingerprint, winnow_overlap_pairs

    rng = random.Random(7)
    alpha = "abcdefgh  ,.XYZ019"
    shared = "the common stretch of text both documents quote verbatim"
    boiler = "standard site footer boilerplate appended to every page here"
    docs = [
        (0, "".join(rng.choice(alpha) for _ in range(200)) + shared + boiler),
        (1, shared + "".join(rng.choice(alpha) for _ in range(200)) + boiler),
    ] + [
        (i, "".join(rng.choice(alpha) for _ in range(150)) + boiler)
        for i in range(2, 9)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # max_df=2: the boilerplate fps (in all 9 docs) are excluded, the
    # shared-quote fps (in exactly docs 0 and 1) survive
    got = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow_overlap_pairs(df, min_shared=2, max_df=2).collect()
    }
    # the quote-sharing pair is found; chance single-fp collisions
    # between the random fillers are below the min_shared=2 bar, and no
    # boilerplate-only pair (df=9 > max_df) exists at all
    assert set(got) == {(0, 1)}, got
    # n_shared is the exact intersection of the df-capped fp sets
    fps: dict[int, set] = {}
    for r in winnow_fingerprint(df).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    df_count: dict[int, int] = {}
    for s in fps.values():
        for fp in s:
            df_count[fp] = df_count.get(fp, 0) + 1
    rare01 = {
        fp for fp in fps[0] & fps[1] if df_count[fp] <= 2
    }
    assert got[(0, 1)] == len(rare01) and got[(0, 1)] >= 1


def test_near_dup_clusters_transitive_and_singletons(spark):
    from ophois_spark.operators.dedup import near_dup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = _docs(
        spark,
        [
            (1, base),
            (2, base),                                   # exact dup of 1
            (3, base.replace("today", "tonight")),       # near-dup of 1 and 2
            (4, "completely different content about spark shuffles and joins"),
            (5, "another unrelated document mentioning street graphs and osm"),
        ],
    )
    got = {r["doc_id"]: (r["cluster"], r["is_canonical"])
           for r in near_dup_clusters(docs, threshold=0.5).collect()}
    assert len(got) == 5                       # every doc labeled exactly once
    # 1,2,3 form ONE cluster via transitivity, canonical = min id
    assert got[1] == (1, 1)
    assert got[2] == (1, 0)
    assert got[3] == (1, 0)
    # singletons keep themselves
    assert got[4] == (4, 1) and got[5] == (5, 1)


def test_ngram_topk_counts_and_tiebreak(spark):
    from ophois_spark.operators.dedup import ngram_topk

    docs = _docs(
        spark,
        [
            (1, "a b c a b c"),     # "a b c" x2, "b c a" x1, "c a b" x1
            (2, "a b c d"),         # "a b c" x1, "b c d" x1
            (3, "xy"),              # < 3 tokens: no grams
        ],
    )
    rows = ngram_topk(docs, topn=3).collect()
    assert [(r["ngram"], r["n"]) for r in rows] == [
        ("a b c", 3),
        ("b c a", 1),   # count ties broken on gram string ascending
        ("b c d", 1),
    ]


def test_shingle_contamination_ratios(spark):
    from ophois_spark.operators.dedup import shingle_contamination

    train = _docs(spark, [(0, "alpha beta gamma delta")])
    evals = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),   # fully contaminated (2/2)
            (2, "alpha beta gamma zeta"),    # 1 of 2 shingles leaks
            (3, "nothing shared here at all"),
            (4, "too short"),                # no shingles -> NULL ratio
        ],
    )
    got = {r["doc_id"]: r for r in shingle_contamination(train, evals).collect()}
    assert got[1]["hit_ratio"] == 1.0 and got[1]["n_shingles"] == 2
    assert got[2]["n_hit"] == 1 and got[2]["hit_ratio"] == 0.5
    assert got[3]["n_hit"] == 0 and got[3]["hit_ratio"] == 0.0
    assert got[4]["n_shingles"] == 0 and got[4]["hit_ratio"] is None


def test_source_rollup_exact_sums(spark):
    from ophois_spark.operators.textops import source_rollup

    docs = spark.createDataFrame(
        [
            (1, "one two three", "hostA", 13),
            (2, "four five", "hostA", 9),
            (3, "", "hostB", 0),
        ],
        "doc_id long, text string, source string, n_chars long",
    )
    got = {r["source"]: r for r in source_rollup(docs).collect()}
    a = got["hostA"]
    assert (a["n_docs"], a["sum_tokens"], a["sum_chars"]) == (2, 5, 22)
    assert a["mean_tokens"] == 2.5
    b = got["hostB"]
    assert (b["n_docs"], b["sum_tokens"], b["sum_chars"]) == (1, 0, 0)


def test_doc_surprisal_hand_corpus(spark):
    """flog2 rarity on a hand corpus: df(a)=3 -> rarity 1, df(b)=df(c)=1
    -> rarity 2 (n_docs=4, flog2=2); empty doc scores 0."""
    from ophois_spark.operators.textops import doc_surprisal

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "a"), (4, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.surprisal, r.mean_x1000)
        for r in doc_surprisal(docs).collect()
    }
    assert got == {
        1: (3, 4, 1333),  # 2*1 + 1*2
        2: (2, 3, 1500),  # 1 + 2
        3: (1, 1, 1000),
        4: (0, 0, 0),
    }


def test_line_dedup_cap_boundary_and_order(spark):
    """df == max_df kept, df == max_df+1 dropped, scoping per source,
    original line order preserved, all-dropped doc -> empty string."""
    from ophois_spark.operators.textops import line_dedup

    docs = spark.createDataFrame(
        [
            # 'chrome' in 3 docs of s1 (df=3 > max_df=2) -> dropped;
            # 'pair' in 2 docs (df=2 == max_df) -> kept
            (1, "s1", "chrome\npair\nbody one"),
            (2, "s1", "chrome\npair\nbody two"),
            (3, "s1", "chrome\nonly three"),
            # same 'chrome' line in ANOTHER source: df=1 there -> kept
            (4, "s2", "chrome\nbody four"),
            # doc whose every line is over the cap -> empty cleaned text
            (5, "s3", "x\nx\nx"),
            (6, "s3", "x"),
            (7, "s3", "x"),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        r.doc_id: (r.n_lines, r.n_kept, r.cleaned_text)
        for r in line_dedup(docs, max_df=2).collect()
    }
    assert got[1] == (3, 2, "pair\nbody one")
    assert got[2] == (3, 2, "pair\nbody two")
    assert got[3] == (2, 1, "only three")
    assert got[4] == (2, 2, "chrome\nbody four")
    # 'x' appears in 3 distinct docs of s3 -> dropped everywhere
    assert got[5] == (3, 0, "")
    assert got[6] == (1, 0, "")
    assert got[7] == (1, 0, "")


def test_quantize_embeddings_int8_hand_values(spark):
    """Hand-quantized vectors: per-dim scales, negative halves round
    toward +inf under floor(x+0.5), all-zero dims map to 0."""
    from ophois_spark.operators.similarity import quantize_embeddings_int8

    rows = [
        (1, [1.0, -2.0, 0.0]),
        (2, [0.5, 2.0, 0.0]),
        (3, [-1.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # dim scales: amax = (1.0, 2.0, 0.0)
    # vec 1: q = (127, -127, 0)   sum 0,    sum2 32258
    # vec 2: q = (floor(63.5+0.5)=64, 127, 0) sum 191, sum2 20225
    # vec 3: q = (-127, floor(63.5+0.5)=64, 0) sum -63, sum2 20225
    out = {r.vec_id: r for r in quantize_embeddings_int8(df).collect()}
    assert (out[1].sum_q, out[1].sum_q2, out[1].min_q, out[1].max_q) == (
        0, 32258, -127, 127,
    )
    assert (out[2].sum_q, out[2].sum_q2) == (191, 64 * 64 + 127 * 127)
    assert (out[3].sum_q, out[3].min_q, out[3].max_q) == (-63, -127, 64)
    assert all(r.n_dims == 3 for r in out.values())


def test_kmv_small_cardinality_falls_back_to_exact(spark):
    """Below k distinct shingles the sketch must BE the exact count."""
    from ophois_spark.operators.dedup import shingle_cardinality_kmv

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "s"),   # 2 shingles
            (2, "alpha beta gamma", "s"),         # 1 shingle, dup of doc 1's
        ],
        "doc_id long, text string, source string",
    )
    r = shingle_cardinality_kmv(docs, k=16).collect()[0]
    assert r.n_exact == 2            # 'alpha beta gamma', 'beta gamma delta'
    assert r.n_mins == 2
    assert r.est_distinct == 2.0     # small-cardinality rule: exact


def test_containment_detects_doc_inside_doc(spark):
    from ophois_spark.operators.dedup import containment_pairs

    quote = "the quick brown fox jumps over the lazy dog near the old river bank"
    filler = " ".join(f"w{i} token{i} extra{i}" for i in range(20))
    docs = _docs(
        spark,
        [
            (1, quote),                      # the short doc
            (2, quote + " " + quote),        # contains every shingle of 1 (J < 1 via joins)
            (3, filler),                     # unrelated
        ],
    )
    rows = containment_pairs(docs).collect()
    got = {(r["doc_contained"], r["doc_container"]): r for r in rows}
    assert (1, 2) in got
    r = got[(1, 2)]
    # every shingle of doc 1 appears in doc 2
    assert r["inter"] == r["n_contained"]
    assert r["containment"] == 1.0
    assert all(3 not in k for k in got)


def test_containment_direction_tiebreak_lower_id(spark):
    from ophois_spark.operators.dedup import containment_pairs

    # identical shingle sets: sizes tie -> contained side is the lower id
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(spark, [(5, text), (9, text)])
    rows = containment_pairs(docs).collect()
    assert len(rows) == 1
    assert (rows[0]["doc_contained"], rows[0]["doc_container"]) == (5, 9)
    assert rows[0]["containment"] == 1.0
