"""BM25 retrieval: pinned scores vs an independent pure-Python
reimplementation (the DuckDB oracle gate is in test_oracle_parity; this
pins the SEMANTICS — idf shift, length norm, tie-breaks — on a corpus
tiny enough to audit by hand)."""

import math

from ophois_spark.operators.textops import BM25_B, BM25_K1, bm25_topk

DOCS = [
    (1, "hash join hash join hash"),
    (2, "hash merge sort"),
    (3, "join order and filters"),
    (4, "unrelated words only here"),
    (5, ""),
]
QUERY = [(0, "hash"), (0, "join")]


def _expected():
    toks = {d: t.split() for d, t in DOCS}
    dl = {d: len(t) for d, t in toks.items()}
    n, avgdl = len(DOCS), sum(dl.values()) / len(DOCS)
    df = {}
    for t in {"hash", "join"}:
        df[t] = sum(1 for ts in toks.values() if t in ts)
    scores = {}
    for d, ts in toks.items():
        s = 0.0
        for t in sorted({"hash", "join"}):
            tf = ts.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            norm = tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl[d] / avgdl)
            )
            s += round(idf * norm, 9)
        if s:
            scores[d] = round(s, 6)
    return scores


def test_bm25_matches_reference_impl(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_topk(docs, QUERY, k=10).orderBy("rank").collect()
    exp = _expected()
    got = {r["doc_id"]: r["score"] for r in rows}
    assert got == exp
    # doc 1 carries both terms with the highest tf: rank 1
    assert rows[0]["doc_id"] == 1
    # docs without any query term never appear
    assert {r["doc_id"] for r in rows}.isdisjoint({4, 5})
    # ranks are dense, ordered by (score desc, doc_id)
    ordered = sorted(got.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [d for d, _ in ordered] == [r["doc_id"] for r in rows]


def test_bm25_k_truncates(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_topk(docs, QUERY, k=1).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 1 and rows[0]["rank"] == 1


def test_tfidf_topterms_hand_corpus(spark):
    import math

    from ophois_spark.operators.textops import tfidf_topterms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_topterms(docs, k=2).collect()
    got = {(r["doc_id"], r["rank"]): (r["term"], r["score"]) for r in rows}

    def idf(df):
        return round(math.log(4.0 / (df + 1.0)) + 1.0, 9)

    # doc 1: apple tf=2 df=1, banana tf=1 df=2
    assert got[(1, 1)] == ("apple", round(2 * idf(1), 6))
    assert got[(1, 2)] == ("banana", round(1 * idf(2), 6))
    # doc 3: cherry tf=3 df=2 beats durian tf=1 df=1
    assert got[(3, 1)] == ("cherry", round(3 * idf(2), 6))
    assert got[(3, 2)] == ("durian", round(1 * idf(1), 6))
    # doc 2: banana/cherry tie on tf=1 df=2 -> term-asc tiebreak
    assert got[(2, 1)][0] == "banana" and got[(2, 2)][0] == "cherry"
    assert got[(2, 1)][1] == got[(2, 2)][1]
