"""asof_join semantics + plan shape, and the recrawl/hamming dedup ops."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from ophois_spark.operators.temporal import asof_join


def _asof(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "lid long, k long, t long")
    right = spark.createDataFrame(right_rows, "k long, t long, rid long, v double")
    return asof_join(
        left, right, key="k", ts="t", tie="rid", payload=["rid", "t", "v"]
    ).collect()


def test_asof_basic_latest_at_or_before(spark):
    out = _asof(
        spark,
        [(1, 10, 100), (2, 10, 50), (3, 10, 5)],
        [(10, 40, 7, 0.5), (10, 100, 8, 0.25), (10, 120, 9, 0.125)],
    )
    by = {r.lid: r for r in out}
    assert by[1].r_rid == 8  # t=100: the equal-ts right row IS visible
    assert by[2].r_rid == 7  # t=50: latest before is t=40
    assert by[3].r_rid is None and by[3].r_t is None  # nothing at-or-before


def test_asof_tie_breaks_to_max_tie_id(spark):
    # two right rows at the identical (key, ts): greatest rid wins,
    # independent of input order
    out = _asof(
        spark,
        [(1, 5, 60)],
        [(5, 60, 12, 1.0), (5, 60, 31, 2.0), (5, 59, 99, 3.0)],
    )
    assert out[0].r_rid == 31 and out[0].r_v == 2.0


def test_asof_keys_do_not_leak(spark):
    out = _asof(spark, [(1, 1, 100)], [(2, 50, 7, 1.0)])
    assert out[0].r_rid is None


def test_asof_left_rows_all_survive_with_dup_ts(spark):
    out = _asof(
        spark,
        [(1, 5, 60), (2, 5, 60), (3, 5, 61)],
        [(5, 60, 4, 1.0)],
    )
    assert sorted(r.lid for r in out) == [1, 2, 3]
    assert all(r.r_rid == 4 for r in out)


def test_asof_null_ts_rows_never_match(spark):
    """SQL comparison semantics for NULL timestamps: a NULL-ts right
    row is never 'at or before' anything (it must not become a
    t=-infinity payload via NULLS FIRST ordering), and a NULL-ts left
    row matches nothing."""
    out = _asof(
        spark,
        [(1, 10, 100), (2, 10, None)],
        [(10, None, 7, 0.5), (10, 40, 8, 0.25)],
    )
    by = {r.lid: r for r in out}
    assert by[1].r_rid == 8  # NULL-ts right row is invisible, t=40 wins
    assert by[2].r_rid is None and by[2].r_v is None  # NULL-ts left: no match
    # a key with ONLY NULL-ts right rows behaves as if right were empty
    out2 = _asof(spark, [(1, 5, 100)], [(5, None, 9, 1.0)])
    assert out2[0].r_rid is None


def test_asof_plan_has_no_join_operator(spark):
    left = spark.range(100).select(
        F.col("id").alias("lid"), (F.col("id") % 7).alias("k"), F.col("id").alias("t")
    )
    right = spark.range(50).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 2).alias("t"),
        F.col("id").alias("rid"),
        F.lit(1.0).alias("v"),
    )
    j = asof_join(left, right, key="k", ts="t", tie="rid", payload=["rid"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    for op in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoop", "Cartesian"):
        assert op not in plan, f"asof_join must not plan a {op}\n{plan}"
    assert plan.count("Exchange hashpartitioning") <= 1


def test_latest_snapshot_dedup_tie_and_count(spark):
    from ophois_spark.operators.dedup import latest_snapshot_dedup

    pages = spark.createDataFrame(
        [
            ("a", 100, 1),
            ("a", 200, 2),
            ("a", 200, 5),  # ts tie -> max doc_id
            ("b", 50, 3),
        ],
        "url string, warc_ts long, doc_id long",
    )
    out = {r.url: r for r in latest_snapshot_dedup(pages).collect()}
    assert out["a"].doc_id == 5 and out["a"].warc_ts == 200 and out["a"].n_crawls == 3
    assert out["b"].doc_id == 3 and out["b"].n_crawls == 1


def test_simhash_hamming_exact_dup_and_pigeonhole(spark):
    from ophois_spark.operators.dedup import simhash_hamming_pairs

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
            Row(doc_id=2, text="alpha beta gamma delta epsilon zeta"),  # exact dup
            Row(doc_id=3, text="totally different words entirely here now"),
        ]
    )
    pairs = simhash_hamming_pairs(docs).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs}
    assert got.get((1, 2)) == 0
    assert all(h <= 3 for h in got.values())


def test_simhash_hamming_plan_no_cartesian(spark):
    from ophois_spark.operators.dedup import simhash_hamming_pairs

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"w{i} x{i} y{i}") for i in range(20)]
    )
    plan = simhash_hamming_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_asof_join_matches_pandas_merge_asof(spark):
    """Cross-implementation reference: on a random keyed event set, the
    merge-formulation asof_join must equal pandas.merge_asof
    (direction='backward' — at-or-before, last-wins on ties), batched
    through one Spark job."""
    import random

    import pandas as pd

    rnd = random.Random(7)
    left_rows = [
        (i, rnd.randrange(5), rnd.randrange(100)) for i in range(200)
    ]
    right_rows = [
        (1000 + i, rnd.randrange(5), rnd.randrange(100), float(i))
        for i in range(300)
    ]
    left = spark.createDataFrame(left_rows, "event_id long, user_id long, t long")
    right = spark.createDataFrame(
        right_rows, "event_id long, user_id long, t long, value double"
    )
    got = (
        asof_join(
            left,
            right,
            key="user_id",
            ts="t",
            tie="event_id",
            payload=["event_id", "value"],
            prefix="r_",
        )
        .orderBy("event_id")
        .toPandas()
    )

    lp = pd.DataFrame(left_rows, columns=["event_id", "user_id", "t"]).sort_values(
        ["t", "event_id"]
    )
    rp = pd.DataFrame(
        right_rows, columns=["r_event_id", "user_id", "t", "r_value"]
    ).sort_values(["t", "r_event_id"])  # last among equal (t) = max tie
    want = pd.merge_asof(
        lp, rp, on="t", by="user_id", direction="backward"
    ).sort_values("event_id")
    g = got.set_index("event_id")
    w = want.set_index("event_id")
    for eid in w.index:
        we, ge = w.loc[eid], g.loc[eid]
        if pd.isna(we["r_event_id"]):
            assert pd.isna(ge["r_event_id"]), eid
        else:
            assert ge["r_event_id"] == we["r_event_id"], eid
            assert ge["r_value"] == we["r_value"], eid


# ---------------------------------------------------------------------------
# ordered funnel
# ---------------------------------------------------------------------------


def test_event_funnel_strictly_after_and_earliest_anchor(spark):
    from ophois_spark.operators.temporal import event_funnel

    rows = [
        # u1 converts fully: view@1, click@5, purchase@9
        (1, 1, "view"), (1, 5, "click"), (1, 9, "purchase"),
        # u2: click BEFORE view only -> stops at view
        (2, 5, "click"), (2, 6, "view"),
        # u3: click at the SAME ts as view -> strictly-after excludes it
        (3, 4, "view"), (3, 4, "click"),
        # u4: earliest-anchor matters: view@1 and view@7; click@3 counts
        # against the EARLIEST view; purchase@2 (before click) excluded
        (4, 7, "view"), (4, 1, "view"), (4, 3, "click"), (4, 2, "purchase"),
        # u5: never viewed
        (5, 1, "purchase"),
    ]
    df = spark.createDataFrame(
        [(u, f"2024-01-01 00:00:{t:02d}", ty) for u, t, ty in rows],
        "user_id long, ts_s string, event_type string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "event_type")
    got = {r.stage: r.n_users for r in
           event_funnel(df, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 4, "view > click": 2, "view > click > purchase": 1}


# ---------------------------------------------------------------------------
# slab-bucketed interval containment join
# ---------------------------------------------------------------------------


def test_interval_point_join_boundaries_and_single_match(spark):
    """Inclusive on both ends; a point inside an interval straddling
    many slabs matches exactly ONCE; key scoping respected."""
    from ophois_spark.operators.temporal import interval_point_join

    slab = 10
    iv = spark.createDataFrame(
        [(1, 100, 5, 35), (1, 200, 50, 52), (2, 300, 0, 1000)],
        "k long, span_id long, s_us long, e_us long",
    )
    pt = spark.createDataFrame(
        [(1, 7, 5), (1, 8, 35), (1, 9, 36), (1, 10, 20), (2, 11, 20), (1, 12, 51)],
        "k long, pid long, t_us long",
    )
    got = {
        (r.span_id, r.pid)
        for r in interval_point_join(iv, pt, "k", slab).collect()
    }
    # 100:[5,35] gets t=5 (start inclusive), t=35 (end inclusive),
    # t=20 (mid, interval spans slabs 0..3) -- each exactly once;
    # t=36 excluded; 300 only sees key-2 points
    assert got == {(100, 7), (100, 8), (100, 10), (200, 12), (300, 11)}
    # exactly-once: collect with duplicates preserved
    rows = interval_point_join(iv, pt, "k", slab).collect()
    assert len(rows) == len(got)


def test_interval_point_join_plan_is_hash_equi_join(spark):
    """The containment join must plan as a hash/sort-merge equi-join on
    (key, slab) -- never a broadcast nested loop or cartesian product
    (what a naive range join degenerates to)."""
    from ophois_spark.operators.temporal import interval_point_join

    iv = spark.createDataFrame([(1, 1, 0, 100)], "k long, span_id long, s_us long, e_us long")
    pt = spark.createDataFrame([(1, 2, 50)], "k long, pid long, t_us long")
    plan = interval_point_join(iv, pt, "k", 10)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# -- sessionize: two-level prefix sum == naive single window ---------------


def _sess_sorted(df):
    return sorted(
        (r.user_id if hasattr(r, "user_id") else r.k, r.session_id, r.n_events,
         r.start_us, r.end_us)
        for r in df.collect()
    )


def test_sessionize_matches_naive_on_boundary_cases(spark):
    from ophois_spark.operators.temporal import sessionize, sessionize_naive

    GAP, SLAB = 100, 1000
    rows = []
    # user 1: gap EXACTLY == GAP stays in-session; GAP+1 starts a new one
    rows += [(1, 0, 1), (1, 100, 2), (1, 201, 3)]
    # user 2: one session spanning three empty slabs (carry must hop them)
    rows += [(2, 950, 4), (2, 1000 + 3 * 1000, 5)]  # gap 3050 > GAP: 2 sessions
    rows += [(2, 4060, 6)]  # 60 after previous: same session, next slab
    # user 3: single event
    rows += [(3, 7777, 7)]
    # user 4: equal timestamps, tie order only
    rows += [(4, 500, 9), (4, 500, 8), (4, 500, 10)]
    # user 5: hot key — 400 events alternating tiny/huge gaps across slabs
    t = 0
    for i in range(400):
        t += 60 if i % 7 else 900
        rows.append((5, t, 100 + i))
    e = spark.createDataFrame(rows, "user_id long, t_us long, event_id long")
    got = _sess_sorted(sessionize(e, GAP, SLAB))
    want = _sess_sorted(sessionize_naive(e, GAP))
    assert got == want
    # exact pinned expectations for the crafted users
    by_user = {}
    for u, sid, n, s, x in got:
        by_user.setdefault(u, []).append((sid, n, s, x))
    assert by_user[1] == [(0, 2, 0, 100), (1, 1, 201, 201)]
    assert by_user[2] == [(0, 1, 950, 950), (1, 2, 4000, 4060)]
    assert by_user[3] == [(0, 1, 7777, 7777)]
    assert by_user[4] == [(0, 3, 500, 500)]


def test_sessionize_slab_size_invariance(spark):
    from ophois_spark.operators.temporal import sessionize

    import random

    rng = random.Random(7)
    rows = []
    for u in range(6):
        t = rng.randrange(1000)
        for i in range(120):
            t += rng.choice([5, 40, 99, 100, 101, 5000])
            rows.append((u, t, u * 1000 + i))
    e = spark.createDataFrame(rows, "user_id long, t_us long, event_id long")
    outs = [
        _sess_sorted(sessionize(e, 100, slab)) for slab in (1, 97, 1000, 10**9)
    ]
    assert outs[0] == outs[1] == outs[2] == outs[3]


def test_retention_cohorts_hand_matrix(spark):
    """Hand-built two-cohort matrix; duplicate same-day events must
    not inflate counts."""
    from datetime import datetime

    from ophois_spark.operators.temporal import retention_cohorts

    D = 19723  # epoch day of 2024-01-01
    rows = [
        # user 1: cohort day D, active D, D+1, D+1 (dup), D+3
        (1, datetime(2024, 1, 1, 9)), (1, datetime(2024, 1, 2, 5)),
        (1, datetime(2024, 1, 2, 23)), (1, datetime(2024, 1, 4, 1)),
        # user 2: cohort day D, active D only (twice)
        (2, datetime(2024, 1, 1, 0, 0, 1)), (2, datetime(2024, 1, 1, 12)),
        # user 3: cohort day D+1, active D+1 and D+3
        (3, datetime(2024, 1, 2, 8)), (3, datetime(2024, 1, 4, 8)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort_day, r.age_days): r.n_users
        for r in retention_cohorts(df).collect()
    }
    assert out == {
        (D, 0): 2,      # users 1, 2 on their first day
        (D, 1): 1,      # user 1 (dup same-day rows collapse)
        (D, 3): 1,      # user 1
        (D + 1, 0): 1,  # user 3
        (D + 1, 2): 1,  # user 3
    }
