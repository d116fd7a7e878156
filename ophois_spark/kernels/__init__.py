"""Pure computational kernels — importable without a SparkSession."""

from ophois_spark.kernels.floatfmt import format_f64
from ophois_spark.kernels.geo import haversine, haversine_np, interpolate, midpoint

__all__ = ["format_f64", "haversine", "haversine_np", "midpoint", "interpolate"]
