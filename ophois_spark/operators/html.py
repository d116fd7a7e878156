"""HTML link extraction — the web-page parsing stage of a crawl
pipeline (input_hint: pages carry an html payload; the graph engine
consumes (src, href, anchor) triples).

Pure codegen projections: anchor tags are pulled with
``regexp_extract_all`` and split with two ``regexp_extract`` calls —
no UDF, no per-row Python, whole-stage codegen end to end. The
character classes are chosen from the Java/RE2-agreeing subset the
repo's tokenizer already pins (kernels/text.py discipline): literal
tags, ``[^"]*`` inside the href quotes, ``[^<]*`` for the anchor
body — no backtracking constructs, identical semantics in Spark
(java.util.regex) and DuckDB (RE2), which is what lets the gate
prove parse(synth(overlay)) == overlay exactly.

Scale shape: linear scan, no shuffle until the caller aggregates;
the explode multiplies rows by the per-page link count (bounded by
page size), and the downstream per-href rollup is an algebraic
two-level aggregation with map-side combine — the hot-href skew case
(everyone links to the homepage) collapses in the partial aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TAG_RE = '<a href="[^"]*">[^<]*</a>'


def extract_links(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """→ (doc_id, href, anchor), one row per <a> tag in document order."""
    tags = F.expr(
        f"regexp_extract_all({html_col}, '{_TAG_RE}', 0)"
    )
    t = pages.select("doc_id", F.explode(tags).alias("tag"))
    return t.select(
        "doc_id",
        F.regexp_extract("tag", '<a href="([^"]*)">', 1).alias("href"),
        F.regexp_extract("tag", ">([^<]*)</a>", 1).alias("anchor"),
    )


def anchor_text_rollup(links: DataFrame) -> DataFrame:
    """Per-target-URL anchor aggregation → (href, n_links, n_docs,
    top_anchor): the classic web-corpus signal (anchor text is the
    strongest ranking/description feature for the TARGET page —
    Brin & Page WWW'98). top_anchor = most frequent anchor, ties to
    the lexicographically smallest (min of (-count, anchor))."""
    per_anchor = links.groupBy("href", "anchor").agg(
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        per_anchor.groupBy("href")
        .agg(
            F.sum("cnt").cast("long").alias("n_links"),
            F.min(F.struct((-F.col("cnt")).alias("neg"), "anchor")).alias("top"),
        )
        .join(
            links.groupBy("href").agg(
                F.count_distinct("doc_id").cast("long").alias("n_docs")
            ),
            "href",
        )
        .select("href", "n_links", "n_docs", F.col("top.anchor").alias("top_anchor"))
    )
