"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship street-graph pipeline on sf0.001 —
  derived graph → largest component → degree-2 chain contraction →
  discretize(50 m) → length distribution.
- ``queries()``/``oracle_sql()``: operator registry with DuckDB parity
  oracles (see ophois_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ophois_spark.operators.components import largest_component
    from ophois_spark.operators.contraction import remove_degree_two_nodes
    from ophois_spark.operators.discretize import discretize
    from ophois_spark.operators.metrics import length_distribution
    from ophois_spark.queries import derived_graph

    g = derived_graph(spark, SF0001)
    g = largest_component(g)
    g = remove_degree_two_nodes(g)
    g = discretize(g, 50.0)
    return length_distribution(g)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from ophois_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry (parity gate)."""
    from ophois_spark.queries import ORACLES

    return dict(ORACLES)
