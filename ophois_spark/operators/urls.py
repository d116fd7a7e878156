"""URL canonicalization — the web-crawl identity primitive.

A Common-Crawl-style corpus sees the same resource under many spellings
(scheme/host case, default ports, ``www.``, fragments, tracking params,
param order). Canonicalization maps them to one key so URL-level dedup,
recrawl grouping, and host rollups all agree on identity.

Implemented as ONE narrow whole-stage-codegen projection — regexp
splits + higher-order array ops on the query string, zero Python, zero
shuffles — so at 10^12 rows it runs at scan speed and the canonical key
is available to push into the very first groupBy. The identical regex /
list pipeline is stated in ANSI SQL for the oracle gate (deliberately
NOT Spark's ``parse_url``, which has no cross-engine twin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme :// hostport path ?query #fragment
URL_RX = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)\??([^#]*)#?(.*)$"
TRACKING_PREFIX = "utm_"


def canonical_url(url: Column) -> Column:
    """Column twin: lowercase scheme+host, strip ``www.``, default
    ports, fragments and ``utm_*`` params; sort remaining params;
    empty path → ``/``."""
    scheme = F.lower(F.regexp_extract(url, URL_RX, 1))
    hostport = F.lower(F.regexp_extract(url, URL_RX, 2))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = F.when(
        (scheme == "http") & host.endswith(":80"), F.substring_index(host, ":", 1)
    ).when(
        (scheme == "https") & host.endswith(":443"), F.substring_index(host, ":", 1)
    ).otherwise(host)
    path = F.regexp_extract(url, URL_RX, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(url, URL_RX, 4)
    params = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda x: (x != "") & ~x.startswith(TRACKING_PREFIX),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def url_canonical_dedup(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """→ (canon_url, n_variants, doc_id): group by canonical URL, keep
    the smallest id as representative. One algebraic aggregation —
    map-side combinable, hot URLs collapse per input split."""
    return (
        pages.groupBy(canonical_url(F.col(url_col)).alias("canon_url"))
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("doc_id"),
        )
    )


def host_of(url: Column) -> Column:
    """Host identity key: lowercase the authority, strip ``www.`` and
    ANY port (host identity ignores ports entirely, unlike
    ``canonical_url`` which keeps non-default ones). One codegen
    projection — usable as a groupBy/join key straight off the scan."""
    hostport = F.lower(F.regexp_extract(url, URL_RX, 2))
    host = F.regexp_replace(hostport, r"^www\.", "")
    return F.substring_index(host, ":", 1)


def robots_filter(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """Crawl-policy URL filtering with robots.txt longest-prefix-match
    semantics → (doc_id, host, path, rule_prefix, allowed):
    the most-specific (longest) matching rule prefix decides; no
    matching rule means allowed (the robots default). ``urls``:
    (doc_id, host, path); ``rules``: (host, prefix, allow 0/1) with
    (host, prefix) unique — under which the longest match is provably
    unique (two equal-length prefixes of the same path are the same
    string).

    Scale shape at 10^12 URLs: ONE host-keyed equi join (rules for
    even millions of hosts are a thin table; broadcast when it fits,
    shuffle hash join otherwise — never a prefix theta-join), the
    startswith refine as a codegen predicate, and the per-URL argmax
    as ``max_by`` keyed on prefix length — NULL keys (unmatched left
    rows) are ignored by max_by, so the no-rule default falls out of
    one ``coalesce``. All algebraic: map-side combinable, no window.
    """
    m = urls.join(rules, "host", "left")
    hit = F.col("prefix").isNotNull() & F.col("path").startswith(F.col("prefix"))
    agg = m.groupBy("doc_id", "host", "path").agg(
        F.max_by(
            F.struct("prefix", "allow"), F.when(hit, F.length("prefix"))
        ).alias("r")
    )
    return agg.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "host",
        "path",
        F.col("r.prefix").alias("rule_prefix"),
        F.coalesce(F.col("r.allow"), F.lit(1)).cast("int").alias("allowed"),
    )
