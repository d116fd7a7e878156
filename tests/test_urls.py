"""canonical_url edge cases."""

from pyspark.sql import functions as F

from ophois_spark.operators.urls import canonical_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]


def test_canonical_url_variants_collapse(spark):
    variants = [
        "http://www.Example.com:80/a/b?b=2&a=1",
        "HTTP://EXAMPLE.COM/a/b?a=1&b=2#frag",
        "http://example.com/a/b?utm_source=x&utm_medium=y&b=2&a=1",
    ]
    assert set(_canon(spark, variants)) == {"http://example.com/a/b?a=1&b=2"}


def test_canonical_url_https_port_and_empty_path(spark):
    got = _canon(
        spark,
        [
            "https://www.example.com:443",
            "https://example.com/",
            "http://example.com:8080/x",  # non-default port survives
        ],
    )
    assert got[0] == "https://example.com/"
    assert got[1] == "https://example.com/"
    assert got[2] == "http://example.com:8080/x"


def test_canonical_url_all_params_tracking(spark):
    assert _canon(spark, ["http://e.com/p?utm_a=1&utm_b=2"]) == ["http://e.com/p"]


def test_canonical_url_idempotent_on_generated_corpus(spark):
    """Idempotence (canon∘canon == canon) and shape invariants over a
    400-URL generated corpus, batched through ONE Spark job."""
    import itertools

    schemes = ["http", "https", "HTTP"]
    hosts = ["www.Site.com", "site.com", "a.b.site.org:8080",
             "site.com:80", "site.com:443"]
    paths = ["", "/", "/x", "/x/y.html"]
    queries = ["", "?b=2&a=1", "?utm_s=1", "?utm_s=1&z=9&a=1"]
    frags = ["", "#top"]
    urls = [
        f"{s}://{h}{p}{q}{f}"
        for s, h, p, q, f in itertools.islice(
            itertools.product(schemes, hosts, paths, queries, frags), 400
        )
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        canonical_url(F.col("url")).alias("c1"),
    ).select("c1", canonical_url(F.col("c1")).alias("c2"))
    rows = out.collect()
    assert all(r.c1 == r.c2 for r in rows), "canonicalization not idempotent"
    assert all("#" not in r.c1 and "utm_" not in r.c1 for r in rows)
    assert all(r.c1.split("://")[0] in ("http", "https") for r in rows)


def test_robots_filter_longest_prefix_and_default(spark):
    from ophois_spark.operators.urls import robots_filter

    urls = spark.createDataFrame(
        [
            (1, "a.com", "/p/1/edit"),
            (2, "a.com", "/p/2"),
            (3, "a.com", "/other"),
            (4, "b.com", "/admin/x"),
            (5, "c.com", "/anything"),  # host with no rules at all
        ],
        "doc_id long, host string, path string",
    )
    rules = spark.createDataFrame(
        [
            ("a.com", "/", 1),
            ("a.com", "/p", 0),
            ("a.com", "/p/1", 1),  # longest match overrides the /p block
            ("b.com", "/admin", 0),
        ],
        "host string, prefix string, allow int",
    )
    got = {
        r["doc_id"]: (r["rule_prefix"], r["allowed"])
        for r in robots_filter(urls, rules).collect()
    }
    assert got[1] == ("/p/1", 1)   # most specific wins
    assert got[2] == ("/p", 0)     # blocked by /p
    assert got[3] == ("/", 1)      # falls back to the root rule
    assert got[4] == ("/admin", 0)
    assert got[5] == (None, 1)     # no rules -> robots default allow
