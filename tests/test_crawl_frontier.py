"""crawl_frontier pins: per-host release order, round cap, tie-break."""

from ophois_spark.operators.webgraph import crawl_frontier


def test_rounds_and_order(spark):
    rows = [
        # host a: ranks 50, 40, 40, 10 (tie broken by doc_id)
        (1, "a", 50),
        (2, "a", 40),
        (3, "a", 40),
        (4, "a", 10),
        # host b: one page
        (9, "b", 99),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, rank long")
    got = {
        r.doc_id: (r.host, r.fetch_round)
        for r in crawl_frontier(df, rounds=3).collect()
    }
    assert got == {
        1: ("a", 1),
        2: ("a", 2),  # rank tie with 3 -> smaller doc_id first
        3: ("a", 3),
        9: ("b", 1),
    }  # doc 4 is round 4 -> cut


def test_custom_host_col_and_cap_one(spark):
    rows = [(1, "x", 5), (2, "x", 7), (3, "y", 1)]
    df = spark.createDataFrame(rows, "doc_id long, h string, rank long")
    got = {r.doc_id for r in crawl_frontier(df, rounds=1, host_col="h").collect()}
    assert got == {2, 3}
