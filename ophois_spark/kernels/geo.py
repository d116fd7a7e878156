"""Geometry kernels: haversine / midpoint / linear interpolation.

Scalar + numpy-vectorized forms of the reference's geometry
(reference: src/geo.rs:7-31). The haversine uses the IUGG mean earth
radius 6371008.7714 m and the exact same formula shape so results agree
to the last ulp; midpoint/interpolation are planar (NOT geodesic) by
design, matching the reference.

Spark plans should prefer the Column-expression builders in
``ophois_spark.functions`` (whole-stage codegen, no Python); these
kernels back the Arrow-UDF paths and the unit tests.
"""

from __future__ import annotations

import math

import numpy as np

EARTH_RADIUS_M = 6371008.7714  # IUGG mean earth radius (reference src/geo.rs:8)


def haversine(lon1: float, lat1: float, lon2: float, lat2: float) -> float:
    """Great-circle distance in metres (reference src/geo.rs:7-17)."""
    d_lat = math.radians(lat2 - lat1)
    d_lon = math.radians(lon2 - lon1)
    p1 = math.radians(lat1)
    p2 = math.radians(lat2)
    a = math.sin(d_lat / 2.0) ** 2 + math.sin(d_lon / 2.0) ** 2 * math.cos(p1) * math.cos(p2)
    return EARTH_RADIUS_M * (2.0 * math.atan2(math.sqrt(a), math.sqrt(1.0 - a)))


def haversine_np(lon1, lat1, lon2, lat2):
    """Vectorized haversine over numpy arrays (same formula/constant)."""
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    d_lat = np.radians(lat2 - lat1)
    d_lon = np.radians(lon2 - lon1)
    a = np.sin(d_lat / 2.0) ** 2 + np.sin(d_lon / 2.0) ** 2 * np.cos(np.radians(lat1)) * np.cos(
        np.radians(lat2)
    )
    return EARTH_RADIUS_M * (2.0 * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a)))


def midpoint(x1: float, y1: float, x2: float, y2: float) -> tuple[float, float]:
    """Arithmetic (planar) midpoint — NOT geodesic (reference src/geo.rs:19-24)."""
    return ((x1 + x2) / 2.0, (y1 + y2) / 2.0)


def interpolate(x1: float, y1: float, x2: float, y2: float, part: float) -> tuple[float, float]:
    """Planar linear interpolation a + t*(b-a) (reference src/geo.rs:26-31)."""
    return (x1 + part * (x2 - x1), y1 + part * (y2 - y1))


def monotone_chain(points) -> list[tuple[int, int]]:
    """Strict convex hull of integer lattice points (Andrew's monotone
    chain, exact int arithmetic — Python ints never overflow, so the
    cross products are exact at any lattice extent). Returns vertices
    in CCW order starting at the lexicographically smallest point;
    collinear boundary midpoints are NOT vertices (popped on
    ``cross <= 0``). Degenerate inputs: 1 point → itself, 2 points →
    both (smaller first), all-collinear → the two extreme endpoints.
    """
    pts = sorted({(int(x), int(y)) for x, y in points})
    if len(pts) <= 2:
        return pts

    def cross(o, a, b) -> int:
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[tuple[int, int]] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[tuple[int, int]] = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    if len(hull) == 2 and hull[0] == hull[1]:  # all-collinear: chains overlap
        return [hull[0]]
    return hull
