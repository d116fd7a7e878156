"""corpus_pipeline: each funnel stage must act on a crafted corpus."""

from pyspark.sql import functions as F

from ophois_spark.operators.corpus import corpus_pipeline

# ~40 tokens of plain English prose: passes the token/alpha/lang gate
GOOD = (
    "the quick brown fox jumps over the lazy dog and then it runs to "
    "the river for a drink of water because the day is hot and the sun "
    "is high in the sky above the green field"
)
# same doc with one token changed -> near-dup (jaccard >= 0.8)
NEAR = GOOD.replace("green field", "green meadow")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_funnel_stages(spark):
    rows = [
        (1, GOOD, "a"),                      # survives everything
        (2, "le chat est sur le lit et il dort bien parce que la nuit "
            "est calme et que la maison est silencieuse et chaude pour "
            "tous les animaux de la famille qui dorment aussi", "a"),
        # ^ French prose, >30 tokens: dropped by the language gate
        (3, "short text only", "b"),         # dropped by min_tokens
        (4, "  " + GOOD + "  ", "b"),        # exact dup of 1 after normalize
        (5, NEAR, "c"),                      # near-dup of 1 -> cluster loses to 1
        (6, GOOD.replace("quick brown fox", "slow gray wolf")
             .replace("lazy dog", "busy cat")
             .replace("river", "lake").replace("hot", "cold")
             .replace("sun is high", "moon is low")
             .replace("green field", "wide plain"), "c"),
        # ^ distinct enough (< 0.8 jaccard): survives as its own doc
    ]
    # min_alpha lowered: short-word prose has ~20% spaces, so the
    # default 0.815 (tuned for the synthetic corpus) would drop all
    out = (
        corpus_pipeline(_docs(spark, rows), min_alpha=0.75)
        .orderBy("doc_id")
        .collect()
    )
    assert [(r.doc_id, r.source) for r in out] == [(1, "a"), (6, "c")]
    assert all(r.n_tokens >= 30 for r in out)


def test_empty_corpus_survives(spark):
    out = corpus_pipeline(_docs(spark, [(1, "", "a")]))
    assert out.count() == 0


def test_source_topn_equals_naive_window(spark):
    """The two-phase salted tournament returns EXACTLY the naive
    single-window per-source top-n (rows and ranks), on a corpus with
    one dominant source, and is partitioning-independent."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ophois_spark.operators.corpus import source_topn

    rows = [(i, f"w{i}", "commoncrawl" if i % 10 else "rare") for i in range(400)]
    docs = _docs(spark, rows)
    got = sorted(
        (r.doc_id, r.source, r.sample_rank)
        for r in source_topn(docs, n=7, salts=4).collect()
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("source"), F.col("doc_id").cast("string"))),
            1,
            7,
        ),
        16,
        10,
    ).cast("long")
    naive = (
        docs.withColumn(
            "sample_rank",
            F.row_number().over(Window.partitionBy("source").orderBy(h, "doc_id")),
        )
        .filter(F.col("sample_rank") <= 7)
        .select("doc_id", "source", "sample_rank")
    )
    want = sorted((r.doc_id, r.source, r.sample_rank) for r in naive.collect())
    assert got == want
    repart = sorted(
        (r.doc_id, r.source, r.sample_rank)
        for r in source_topn(docs.repartition(13), n=7, salts=4).collect()
    )
    assert repart == want
    # every source with >= n docs is capped at exactly n
    per_src = {}
    for _, s, _ in got:
        per_src[s] = per_src.get(s, 0) + 1
    assert per_src == {"commoncrawl": 7, "rare": 7}


def test_mixture_plan_waterfill(spark):
    """Hand-computed two-pass integer waterfill: capped sources strand
    budget, pass 2 routes it to the one source with headroom, and the
    weights join drops unweighted sources."""
    from ophois_spark.operators.corpus import mixture_plan

    def words(n):
        return " ".join(["w"] * n)

    docs = _docs(
        spark,
        [
            (1, words(4), "a"),
            (2, words(6), "a"),        # a: 10 tokens available
            (3, words(100), "b"),      # b: 100
            (4, words(400), "c"),      # c: 400
            (5, words(50), "d"),       # d: no weight row -> excluded
            (6, "", "a"),              # empty text counts 0 tokens
        ],
    )
    weights = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 1)], "source string, weight long"
    )
    # budget 200, sum_w 4: targets a=50 b=100 c=50; a caps at 10,
    # b exactly fills, leftover 200-160=40 all flows to c (headroom)
    out = {
        r.source: r
        for r in mixture_plan(docs, weights, budget=200).collect()
    }
    assert set(out) == {"a", "b", "c"}
    a, b, c = out["a"], out["b"], out["c"]
    assert (a.available_tokens, a.target_tokens, a.planned_tokens, a.rate_ppm) == (
        10, 50, 10, 1_000_000,
    )
    assert (b.available_tokens, b.target_tokens, b.planned_tokens, b.rate_ppm) == (
        100, 100, 100, 1_000_000,
    )
    assert (c.available_tokens, c.target_tokens, c.planned_tokens, c.rate_ppm) == (
        400, 50, 90, 225_000,
    )
    # the waterfill consumes the whole budget when headroom allows
    assert sum(r.planned_tokens for r in out.values()) == 200


def test_mixture_plan_default_budget_is_constant_volume(spark):
    """budget=None plans at constant volume: sum(planned) <= sum(avail)
    with equality when some source has headroom after pass 2."""
    from ophois_spark.operators.corpus import mixture_plan

    docs = _docs(
        spark,
        [(1, " ".join(["x"] * 30), "a"), (2, " ".join(["y"] * 90), "b")],
    )
    weights = spark.createDataFrame(
        [("a", 3), ("b", 1)], "source string, weight long"
    )
    # total 120, targets a=90 b=30; a caps at 30, leftover 60 -> b
    # gets min(90, 30+60) = 90: constant volume exactly preserved
    out = {r.source: r for r in mixture_plan(docs, weights).collect()}
    assert out["a"].planned_tokens == 30
    assert out["b"].planned_tokens == 90
