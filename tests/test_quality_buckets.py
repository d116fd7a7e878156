"""doc_quality_buckets pins: value-cut tercile rule, equal-cost
cohesion, per-language independence."""

from ophois_spark.operators.textops import doc_quality_buckets


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_terciles_by_value_cuts(spark):
    # 6 docs, distinct costs -> k1 = ceil(6/3) = 2, k2 = 4: two docs
    # per bucket. Texts built so bigram costs order by doc: repeated
    # common bigrams are cheap, rare bigrams expensive.
    rows = [
        (1, "en", "a b a b a b a b a b a b"),
        (2, "en", "a b a b a b a b a b"),
        (3, "en", "a b a b c d"),
        (4, "en", "a b c d e f"),
        (5, "en", "g h i j k l"),
        (6, "en", "m n o p q r"),
    ]
    out = {r.doc_id: r.bucket for r in doc_quality_buckets(_docs(spark, rows)).collect()}
    assert sorted(out.values()).count("head") == 2
    assert sorted(out.values()).count("middle") == 2
    assert sorted(out.values()).count("tail") == 2
    # the all-repetition docs are the best modeled
    assert out[1] == "head" and out[2] == "head"


def test_equal_costs_share_bucket(spark):
    # 3 identical docs + 1 different: the identical trio has one cost
    # value, so they can never split across a tercile boundary
    rows = [
        (1, "en", "x y x y"),
        (2, "en", "x y x y"),
        (3, "en", "x y x y"),
        (4, "en", "q r s t"),
    ]
    out = {r.doc_id: r.bucket for r in doc_quality_buckets(_docs(spark, rows)).collect()}
    assert out[1] == out[2] == out[3]


def test_languages_bucket_independently(spark):
    # one lang's cost scale must not leak into the other's cuts: each
    # 3-doc language gets exactly one doc per bucket
    rows = [
        (1, "en", "a b a b a b a b"),
        (2, "en", "a b c d"),
        (3, "en", "e f g h"),
        (10, "fr", "u v u v u v u v"),
        (11, "fr", "u v w x"),
        (12, "fr", "y z aa bb"),
    ]
    out = {r.doc_id: r.bucket for r in doc_quality_buckets(_docs(spark, rows)).collect()}
    for lang_ids in ([1, 2, 3], [10, 11, 12]):
        assert sorted(out[i] for i in lang_ids) == ["head", "middle", "tail"]
