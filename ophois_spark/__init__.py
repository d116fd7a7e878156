"""ophois_spark — a from-scratch PySpark-native street-graph + spatial-tiling engine.

Re-expresses the query/data-processing capabilities of the reference
``ethicnology/ophois`` (a single-threaded Rust pipe pipeline) as an
idiomatic Spark engine: DataFrame aggregations, joins, window functions
and vectorized Arrow/pandas UDFs over an Iceberg-style table of
Common-Crawl-style web pages.

Layout
------
- ``kernels``    pure-python/numpy computational kernels (no Spark import)
- ``functions``  Spark Column-expression builders (haversine, cells, edges)
- ``sources``    synthetic pages generator + line-record graph IO
- ``operators``  the engine's relational operators (extract, components,
                 contraction, discretize, metrics, spatial, dedup, text)
- ``plans``      snapshot/lineage/resume layer (Iceberg-style, minimal)
- ``streaming``  incremental ingest helpers
"""

__version__ = "0.1.0"

SEPARATOR = "␟"  # U+241F SYMBOL FOR UNIT SEPARATOR — reference default (src/main.rs:36-37)
EARTH_RADIUS_M = 6371008.7714  # IUGG mean earth radius (reference src/geo.rs:8)
