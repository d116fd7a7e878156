"""Unit semantics for pagerank / corpus_sample / pack_sequences."""

import os

import pytest
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


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.001"),
    reason="driver testdata not present",
)
def test_pagerank_converged_fixpoint_and_pin(spark):
    """The convergence loop stops at the EXACT integer fixed point, the
    measured round count matches the oracle pin at both gate scales
    (sf0.001 pytest / sf0.01 driver), and rounds past the fixpoint are
    identities (what licenses the unrolled-SQL oracle)."""
    from ophois_spark.operators.webgraph import pagerank, pagerank_converged
    from ophois_spark.queries import PAGERANK_PIN_ROUNDS, _link_overlay

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        nodes, edges = _link_overlay(spark, sf_dir)
        ranks, rounds = pagerank_converged(nodes, edges)
        assert rounds <= PAGERANK_PIN_ROUNDS, (sf_dir, rounds)
        got = sorted((r.id, r.rank) for r in ranks.collect())
        # identity past the fixpoint: a fixed unroll at the pin count
        # reproduces the converged vector exactly
        pinned = sorted(
            (r.id, r.rank)
            for r in pagerank(nodes, edges, iters=PAGERANK_PIN_ROUNDS).collect()
        )
        assert got == pinned, sf_dir


def test_pack_sequences_sharded_semantics(spark):
    """Sharded packing: shard = doc_id mod K; within each (source,
    shard) the offsets are exactly the serial packing of that shard's
    doc_id-ordered stream, and results are partitioning-independent."""
    rows = [
        (i, " ".join(["w"] * (50 + 7 * (i % 4))), "s%d" % (i % 2)) for i in range(40)
    ]
    docs = _docs(spark, rows)
    got = {
        r.doc_id: (r.shard, r.start_tok, r.pack_id)
        for r in pack_sequences(docs, budget=128, shards=4).collect()
    }
    assert set(got) == set(range(40))
    # python twin: serial running sum per (source, doc_id % 4)
    n_tok = {i: 50 + 7 * (i % 4) for i in range(40)}
    offs: dict[tuple, int] = {}
    for i in sorted(n_tok):
        key = ("s%d" % (i % 2), i % 4)
        start = offs.get(key, 0)
        assert got[i] == (i % 4, start, start // 128), i
        offs[key] = start + n_tok[i]
    # partitioning-independent
    again = {
        r.doc_id: (r.shard, r.start_tok, r.pack_id)
        for r in pack_sequences(docs.repartition(11), budget=128, shards=4).collect()
    }
    assert again == got


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


def test_integer_pagerank_tracks_float_pagerank_ordering(spark):
    """The integer truncation must not distort the ranking: on a random
    graph, compare against float power iteration (same damping, same
    iteration count, uniform init) computed in plain Python."""
    import collections

    n = 60
    edges = [(i, (i * 13 + 5) % n) for i in range(n)] + [
        (i, (i * 7 + 1) % n) for i in range(0, n, 2)
    ]
    edges = sorted({(s, d) for s, d in edges if s != d})
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges_df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.rank for r in pagerank(nodes_df, edges_df, iters=5).collect()}

    outdeg = collections.Counter(s for s, _ in edges)
    rank = {i: 1.0 for i in range(n)}
    for _ in range(5):
        sums = collections.defaultdict(float)
        for s, d in edges:
            sums[d] += rank[s] / outdeg[s]
        rank = {i: 0.15 + 0.85 * sums[i] for i in range(n)}

    int_order = sorted(range(n), key=lambda i: (-got[i], i))
    float_order = sorted(range(n), key=lambda i: (-rank[i], i))
    # identical top-10 and >= 90% pairwise agreement overall
    assert int_order[:10] == float_order[:10]
    agree = sum(a == b for a, b in zip(int_order, float_order))
    assert agree >= 0.9 * n, (agree, n)


def test_canonical_url_idempotent(spark):
    from ophois_spark.operators.urls import canonical_url

    urls = [
        "http://www.Example.com:80/a/b?b=2&a=1&utm_x=9",
        "HTTPS://EXAMPLE.COM:443#f",
        "http://e.com:8080/x?z=1",
        "https://sub.www-like.example.com/path/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonical_url(F.col("url")).alias("c"))
    twice = once.select(canonical_url(F.col("c")).alias("c"))
    assert [r.c for r in once.collect()] == [r.c for r in twice.collect()]


def test_hits_hand_computed(spark):
    # Graph: 0->1, 0->2, 3->1 (0 is the hub; 1 the authority).
    # a1 = indeg: a1(1)=2, a1(2)=1, a1(0)=a1(3)=0
    # h1(0) = a1(1)+a1(2) = 3, h1(3) = a1(1) = 2
    # a2(1) = h1(0)+h1(3) = 5, a2(2) = h1(0) = 3
    # h2(0) = a2(1)+a2(2) = 8, h2(3) = a2(1) = 5
    from ophois_spark.operators.webgraph import hits_scores

    nodes = spark.createDataFrame([(i,) for i in range(4)], "id long")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (3, 1)], "src long, dst long"
    )
    got = {r.id: (r.hub, r.auth) for r in hits_scores(nodes, edges).collect()}
    assert got == {0: (8, 0), 1: (0, 5), 2: (0, 3), 3: (5, 0)}


def test_hits_partitioning_independent(spark):
    from ophois_spark.operators.webgraph import hits_scores

    nodes = spark.range(30).select("id")
    edges = nodes.select(
        F.col("id").alias("src"), ((F.col("id") * 11 + 5) % 30).alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    a = sorted(map(tuple, hits_scores(nodes, edges).collect()))
    b = sorted(
        map(
            tuple,
            hits_scores(nodes.repartition(9), edges.repartition(5)).collect(),
        )
    )
    assert a == b


def test_reciprocal_link_share_hand_computed(spark):
    # a->b, b->a (reciprocated); a->c (not); c->b (not).
    from ophois_spark.operators.webgraph import reciprocal_link_share

    he = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "b")],
        "src string, dst string",
    )
    got = {
        r.host: (r.n_out, r.n_reciprocal, r.reciprocal_pct)
        for r in reciprocal_link_share(he).collect()
    }
    assert got == {"a": (2, 1, 50), "b": (1, 1, 100), "c": (1, 0, 0)}


def test_host_graph_dirty_urls_collapse(spark):
    # Five spellings of one host identity collapse to a single node;
    # intra-host and parallel edges collapse in the host graph.
    from ophois_spark.operators.webgraph import host_graph

    pages = spark.createDataFrame(
        [
            (0, "http://www.one.com:80/a"),
            (1, "HTTP://ONE.COM/b"),
            (2, "https://one.com:443/c"),
            (3, "http://two.com/"),
            (4, "http://www.two.com:8080/x"),
        ],
        "doc_id long, url string",
    )
    edges = spark.createDataFrame(
        [(0, 1), (0, 3), (1, 3), (2, 4), (3, 0)],
        "src long, dst long",
    )
    hosts, he = host_graph(pages, edges)
    assert sorted(r.id for r in hosts.collect()) == ["one.com", "two.com"]
    got = sorted((r.src, r.dst) for r in he.collect())
    assert got == [("one.com", "two.com"), ("two.com", "one.com")]


# ---------------------------------------------------------------------------
# k-core decomposition
# ---------------------------------------------------------------------------


def test_coreness_hand_graph(spark):
    """Triangle (2-core) + tail chain (1-core) + 4-clique (3-core) +
    isolated node (0): the textbook coreness values."""
    from ophois_spark.operators.components import coreness

    edges = [
        (1, 2), (2, 3), (1, 3),          # triangle
        (3, 4), (4, 5),                  # chain tail
        (10, 11), (10, 12), (10, 13),    # 4-clique
        (11, 12), (11, 13), (12, 13),
    ]
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 10, 11, 12, 13, 99]], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    labels, rounds_by_k = coreness(nodes, e, k_max=4)
    got = {r.id: r.coreness for r in labels.collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 1, 5: 1,
                   10: 3, 11: 3, 12: 3, 13: 3, 99: 0}
    # chain peeling at k=2 takes two rounds (5 drops, then 4)
    assert rounds_by_k[2] == 2


def test_kcore_unroll_bound_has_margin(spark):
    """The oracle unrolls KCORE_UNROLL peel rounds per k; guard that
    the measured fixpoint depth on the gated overlay keeps >= 2 rounds
    of slack at the pytest gate scale (the sf0.01 overlay shares the
    same 500-doc structure)."""
    from pyspark.sql import functions as F

    from ophois_spark.operators.components import coreness
    from ophois_spark.queries import KCORE_KMAX, KCORE_UNROLL, _link_overlay

    nodes, edges = _link_overlay(spark, "/root/testdata/sf0.001")
    und = edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    _, rounds_by_k = coreness(nodes, und, KCORE_KMAX)
    assert max(rounds_by_k.values()) + 2 <= KCORE_UNROLL, rounds_by_k


# -- resolve_redirects: pointer doubling == sequential chain walk ----------


def test_resolve_redirects_matches_walk_and_handles_fan_in(spark):
    from ophois_spark.operators.webgraph import resolve_redirects

    nxt = {}
    # chain of maximal depth 15: 115 -> 114 -> ... -> 101 -> 100 (terminal)
    for u in range(101, 116):
        nxt[u] = u - 1
    # variable-step chain with shared suffix + heavy fan-in at 200
    for u in range(300, 340):
        nxt[u] = 200
    nxt[200] = 7  # 7 terminal
    nxt[55] = 56
    nxt[56] = 57  # short chain to terminal 57
    edges = spark.createDataFrame(list(nxt.items()), "src long, dst long")
    got = {r.src: (r.final, r.hops) for r in resolve_redirects(edges, 16).collect()}
    assert len(got) == len(nxt)  # one output row per redirecting url
    for s in nxt:
        f, h = s, 0
        while f in nxt:
            f, h = nxt[f], h + 1
        assert got[s] == (f, h), s


def test_resolve_redirects_cycle_stays_bounded(spark):
    from ophois_spark.operators.webgraph import resolve_redirects

    # 3-cycle: contract is acyclic input, but cycles must neither
    # diverge nor duplicate rows — each member resolves to SOME cycle
    # node with saturated hop count, deterministically
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (9, 1)], "src long, dst long"
    )
    out = resolve_redirects(edges, 16).collect()
    assert len(out) == 4
    a = {r.src: (r.final, r.hops) for r in out}
    assert a[1][0] in (1, 2, 3) and a[9][0] in (1, 2, 3)
    b = {r.src: (r.final, r.hops) for r in resolve_redirects(edges, 16).collect()}
    assert a == b


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.001"),
    reason="driver testdata not present",
)
def test_pagerank_float_twin_matches_integer_ordering(spark):
    """The production twin (double, mean-L1 < tol stop) must stop in
    FEWER rounds than the exact-lattice recurrence rule and induce the
    same top-k ordering on the gate overlay — the documented contract
    for choosing between the two paths (webgraph.py pagerank_float)."""
    from ophois_spark.operators.webgraph import pagerank_converged, pagerank_float
    from ophois_spark.queries import _link_overlay

    nodes, edges = _link_overlay(spark, "/root/testdata/sf0.001")
    rf, rounds_f = pagerank_float(nodes, edges)
    ri, rounds_i = pagerank_converged(nodes, edges)
    assert rounds_f < rounds_i
    top_f = [r.id for r in rf.orderBy(F.desc("rank"), "id").limit(20).collect()]
    top_i = [r.id for r in ri.orderBy(F.desc("rank"), "id").limit(20).collect()]
    assert top_f == top_i
