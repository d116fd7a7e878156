"""Unit semantics for pagerank / corpus_sample / pack_sequences."""

from pyspark.sql import functions as F

from ophois_spark.operators.corpus import corpus_sample, pack_sequences
from ophois_spark.operators.webgraph import pagerank


def test_pagerank_hand_computed_star(spark):
    # 1 -> 0 and 2 -> 0; S = 10^6, base = 150000
    # iter1: rank(0) = 150000 + 85*(10^6 + 10^6)//100 = 1850000
    # iter2: rank(0) = 150000 + 85*(150000 + 150000)//100 = 405000
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    edges = spark.createDataFrame([(1, 0), (2, 0)], "src long, dst long")
    got = {
        r.id: r.rank for r in pagerank(nodes, edges, iters=2).collect()
    }
    assert got == {0: 405000, 1: 150000, 2: 150000}


def test_pagerank_rank_independent_of_partitioning(spark):
    nodes = spark.range(40).select(F.col("id"))
    edges = nodes.select(
        F.col("id").alias("src"), ((F.col("id") * 7 + 3) % 40).alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    a = sorted((r.id, r.rank) for r in pagerank(nodes, edges).collect())
    b = sorted(
        (r.id, r.rank)
        for r in pagerank(nodes.repartition(13), edges.repartition(7)).collect()
    )
    assert a == b


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_pack_sequences_chunk_boundaries(spark):
    rows = [
        (1, " ".join(["w"] * 300), "a"),
        (2, " ".join(["w"] * 300), "a"),
        (3, " ".join(["w"] * 100), "a"),
        (4, " ".join(["w"] * 10), "b"),
    ]
    got = {
        r.doc_id: (r.start_tok, r.pack_id)
        for r in pack_sequences(_docs(spark, rows), budget=512).collect()
    }
    assert got == {1: (0, 0), 2: (300, 0), 3: (600, 1), 4: (0, 0)}


def test_corpus_sample_rates_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "t", "s%d" % (i % 3)) for i in range(300)],
        "doc_id long, text string, source string",
    )
    rates0 = spark.createDataFrame(
        [("s0", 0), ("s1", 0), ("s2", 0)], "source string, rate_permyriad int"
    )
    assert corpus_sample(docs, rates0).count() == 0
    rates_all = spark.createDataFrame(
        [("s0", 10000), ("s1", 10000), ("s2", 10000)],
        "source string, rate_permyriad int",
    )
    assert corpus_sample(docs, rates_all).count() == 300
    rates = spark.createDataFrame(
        [("s0", 5000), ("s1", 2000), ("s2", 8000)],
        "source string, rate_permyriad int",
    )
    a = sorted(r.doc_id for r in corpus_sample(docs, rates).collect())
    b = sorted(r.doc_id for r in corpus_sample(docs.repartition(17), rates).collect())
    assert a == b and 0 < len(a) < 300
