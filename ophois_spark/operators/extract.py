"""Pages → line records → StreetGraph (the ingest stage).

Spark shape of ``ophois format | ophois extract`` (reference
src/openstreetmap.rs:24-88, src/main.rs:60-65): one narrow,
shuffle-free stage — a vectorized pandas UDF runs the fused
format+extract kernel once per page (NOT per line) and returns the
page's records as ``array<string>``; ``posexplode`` flattens with a
per-page position so downstream dedup has a deterministic arrival
order (url, pos) standing in for the reference's stdin order.

Byte parity per url is guaranteed by the kernel
(``kernels.osmxml.extract_records``) and pinned by tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from ophois_spark import SEPARATOR
from ophois_spark.kernels.osmxml import extract_records
from ophois_spark.operators.graph import StreetGraph
from ophois_spark.sources.graph_io import parse_records


def records_udf(separator: str = SEPARATOR):
    @pandas_udf(ArrayType(StringType()))
    def _extract(text: pd.Series) -> pd.Series:
        return text.map(lambda t: extract_records(t.splitlines(), separator))

    return _extract


def extract_page_records(
    pages: DataFrame, separator: str = SEPARATOR, text_col: str = "text", url_col: str = "url"
) -> DataFrame:
    """pages(url, text, …) → records(url, pos, line)."""
    recs = pages.select(
        F.col(url_col).alias("url"), records_udf(separator)(F.col(text_col)).alias("recs")
    )
    return recs.select("url", F.posexplode("recs").alias("pos", "line"))


def graph_from_pages(
    pages: DataFrame, separator: str = SEPARATOR, strict: bool = False
) -> StreetGraph:
    """Full ingest: pages table → deduplicated StreetGraph."""
    records = extract_page_records(pages, separator)
    g, _ = parse_records(records, ["url", "pos"], separator=separator, strict=strict)
    return g
