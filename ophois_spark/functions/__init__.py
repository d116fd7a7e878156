"""Spark Column-expression builders.

Geometry (haversine/midpoint/interpolation) and the cell index are pure
Column arithmetic — Catalyst folds them into whole-stage codegen; no UDF
in the hot path. The only Python touchpoint is ``fmt_f64`` (Rust
``f64::to_string`` parity for minted node coordinates), an Arrow-batched
pandas UDF: JDK 17's ``Double.toString`` is not always
shortest-round-trip, so a native cast cannot guarantee byte parity.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ophois_spark.kernels.cells import MAX_RES, RES_BITS, X_BITS
from ophois_spark.kernels.floatfmt import format_f64
from ophois_spark.kernels.geo import EARTH_RADIUS_M

__all__ = [
    "haversine_m",
    "midpoint_xy",
    "interpolate_xy",
    "canonical_edge",
    "grid_coords",
    "cell_from_xy",
    "cell_expr",
    "cell_parent_expr",
    "fmt_f64",
    "bearing_deg",
]


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle metres as a native Column expression (reference src/geo.rs:7-17).

    Same formula shape and IUGG radius as the reference so doubles agree
    to the last ulp; stays inside whole-stage codegen.
    """
    d_lat = F.radians(lat2 - lat1)
    d_lon = F.radians(lon2 - lon1)
    a = (
        F.sin(d_lat / F.lit(2.0)) * F.sin(d_lat / F.lit(2.0))
        + F.sin(d_lon / F.lit(2.0))
        * F.sin(d_lon / F.lit(2.0))
        * F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
    )
    return F.lit(EARTH_RADIUS_M) * (F.lit(2.0) * F.atan2(F.sqrt(a), F.sqrt(F.lit(1.0) - a)))


def bearing_deg(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Initial great-circle bearing in degrees [0, 360), pure Column
    arithmetic (whole-stage codegen, no UDF).

    θ = atan2(sin Δλ · cos φ₂, cos φ₁ · sin φ₂ − sin φ₁ · cos φ₂ · cos Δλ),
    shifted from (−180, 180] into [0, 360). Due-north/south edges
    (Δλ = 0) hit atan2's exact 0/π results, so they land on 0°/180°
    identically on every IEEE engine; consumers floor to whole degrees
    (the floored-metre discipline) before any cross-engine comparison.
    """
    d_lon = F.radians(lon2 - lon1)
    y = F.sin(d_lon) * F.cos(F.radians(lat2))
    x = F.cos(F.radians(lat1)) * F.sin(F.radians(lat2)) - F.sin(
        F.radians(lat1)
    ) * F.cos(F.radians(lat2)) * F.cos(d_lon)
    return (F.degrees(F.atan2(y, x)) + F.lit(360.0)) % F.lit(360.0)


def midpoint_xy(x1: Column, y1: Column, x2: Column, y2: Column) -> tuple[Column, Column]:
    """Planar midpoint (reference src/geo.rs:19-24)."""
    return (x1 + x2) / F.lit(2.0), (y1 + y2) / F.lit(2.0)


def interpolate_xy(
    x1: Column, y1: Column, x2: Column, y2: Column, part: Column
) -> tuple[Column, Column]:
    """Planar interpolation a + t*(b-a) (reference src/geo.rs:26-31)."""
    return x1 + part * (x2 - x1), y1 + part * (y2 - y1)


def canonical_edge(u: Column, v: Column) -> tuple[Column, Column]:
    """Lexicographic canonical edge order (reference src/utils.rs:1-7)."""
    return F.least(u, v), F.greatest(u, v)


def grid_coords(lon: Column, lat: Column, res: int) -> tuple[Column, Column]:
    """(ix, iy) integer grid Columns at ``res``: x wrapped mod 2^res,
    y clamped to [0, 2^res-1]. THE single Column implementation of the
    cell grid math (kernels.cells.cell_id is its numpy twin, pinned
    equal by tests)."""
    n = 1 << res
    ix = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    ix = ((ix % n) + n) % n
    iy = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n)))
    iy = F.greatest(F.lit(0), F.least(F.lit(n - 1), iy))
    return ix, iy


def cell_from_xy(ix: Column, iy: Column, res: int) -> Column:
    """Encode (ix, iy, res) → 64-bit cell id (res<<58 | ix<<29 | iy)."""
    return (F.lit(res) * F.lit(1 << RES_BITS)) + ix * F.lit(1 << X_BITS) + iy


def cell_expr(lon: Column, lat: Column, res: int) -> Column:
    """64-bit hierarchical cell id — integer Column arithmetic only.

    Mirrors ``kernels.cells.cell_id``: ``res<<58 | ix<<29 | iy`` with x
    wrapped mod 2^res and y clamped. Expressed with *, +, %, floor so the
    identical computation is writable in ANSI SQL for the DuckDB oracle.
    """
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    ix, iy = grid_coords(lon, lat, res)
    return cell_from_xy(ix, iy, res)


def cell_parent_expr(cell: Column, res: int, steps: int = 1) -> Column:
    """Parent cell id, given the child's res (avoids runtime bit decode)."""
    ix = F.floor((cell % F.lit(1 << RES_BITS)) / F.lit(1 << X_BITS))
    iy = cell % F.lit(1 << X_BITS)
    d = 1 << steps
    return (
        F.lit(res - steps) * F.lit(1 << RES_BITS)
        + F.floor(ix / d) * F.lit(1 << X_BITS)
        + F.floor(iy / d)
    )


@pandas_udf(StringType())
def fmt_f64(x: pd.Series) -> pd.Series:
    """Rust ``f64::to_string`` parity formatting (Arrow-batched)."""
    return x.map(format_f64)
