"""Exact-substring duplication coverage (Lee et al. ACL'22) pinned on a
hand corpus — cross-doc dup, within-doc dup, unique doc, empty doc.
The DuckDB oracle gate is in test_oracle_parity; this pins semantics."""

from ophois_spark.operators.textops import dup_ngram_coverage

DOCS = [
    # the 8-gram "a b c d e f g h" appears in docs 1 and 2
    (1, "a b c d e f g h x y"),
    (2, "z a b c d e f g h q"),
    # all grams unique
    (3, "completely unique words only here padding tokens extra"),
    # shorter than w: no grams
    (4, "tiny doc"),
    (5, ""),
    # within-doc repetition: positions 0-7 and 8-15 hold the same 8-gram
    (6, "p q r s t u v w p q r s t u v w"),
]


def test_dup_ngram_coverage_hand_corpus(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in dup_ngram_coverage(docs, w=8).collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6}

    # docs 1/2: the shared gram covers 8 of 10 positions
    for d in (1, 2):
        assert rows[d]["n_tokens"] == 10
        assert rows[d]["n_dup_positions"] == 8
        assert rows[d]["dup_fraction"] == 0.8

    # unique doc: zero coverage
    assert rows[3]["n_dup_positions"] == 0 and rows[3]["dup_fraction"] == 0.0

    # too short for any gram: zero coverage, real token count
    assert rows[4]["n_tokens"] == 2 and rows[4]["n_dup_positions"] == 0

    # empty doc: 0 tokens, fraction defined as 0.0 (not NaN/NULL)
    assert rows[5]["n_tokens"] == 0 and rows[5]["dup_fraction"] == 0.0

    # within-doc repeat: the two occurrences tile the whole doc
    assert rows[6]["n_tokens"] == 16
    assert rows[6]["n_dup_positions"] == 16
    assert rows[6]["dup_fraction"] == 1.0


def test_dup_ngram_overlapping_spans_count_once(spark):
    # doc 1 repeated verbatim as doc 2 → EVERY gram is duplicated, and
    # overlapping spans must not double-count positions
    text = "one two three four five six seven eight nine ten eleven"
    docs = spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in dup_ngram_coverage(docs, w=8).collect()}
    for d in (1, 2):
        assert rows[d]["n_tokens"] == 11
        assert rows[d]["n_dup_positions"] == 11
        assert rows[d]["dup_fraction"] == 1.0
