"""Spatial ST_* core — planar point geometry as pure column expressions.

Reference parity: the ST_ function family in
core/src/main/java/org/apache/calcite/runtime/GeoFunctions.java:68
(ST_AsText/ST_GeomFromText, ST_Point, ST_X/ST_Y, ST_Distance, ST_DWithin,
ST_Contains, ST_MakeEnvelope, ST_Boundary…). Calcite's implementation is
PLANAR (ESRI geometry, no geodesic math by default) — so is this one.

Scope: the point/envelope subset that covers the reference's own test
usage (core/src/test/resources/sql/spatial.iq exercises points and
envelopes almost exclusively). Geometry is represented as WKT strings
(``POINT (x y)``) built with printf-style fixed formatting so the bytes
are engine-portable (float→string shortest-roundtrip formatting is NOT
identical across engines; ``%.6f`` is). Full polygon support would ride a
Pandas-UDF shapely path — out of scope in this container (no shapely),
same stub contract as multimodal decode.

All functions are JVM-side column expressions: a 100 TB point-in-region
filter stays in whole-stage codegen, and a distance predicate against a
fixed point is pushable partition pruning material when the coordinates
are partition columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_WKT_X = r"POINT \((-?[0-9.]+) "
_WKT_Y = r"POINT \(-?[0-9.]+ (-?[0-9.]+)\)"


def st_point(x: Column, y: Column) -> Column:
    """ST_Point(x, y) → WKT text (ST_AsText ∘ ST_Point; GeoFunctions.java).

    Oracle: printf('POINT (%.6f %.6f)', x, y)
    """
    return F.format_string("POINT (%.6f %.6f)", x, y)


def st_x(wkt: Column) -> Column:
    """ST_X(point) — X coordinate of a WKT point.

    Oracle: regexp_extract(wkt, 'POINT \\((-?[0-9.]+) ', 1)::DOUBLE
    """
    return F.regexp_extract(wkt, _WKT_X, 1).cast("double")


def st_y(wkt: Column) -> Column:
    """ST_Y(point) — Y coordinate of a WKT point."""
    return F.regexp_extract(wkt, _WKT_Y, 1).cast("double")


def st_distance(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """ST_Distance between two planar points (Euclidean — Calcite's
    default non-geodesic semantics). IEEE sqrt is correctly rounded, so
    the value is bit-identical across engines.

    Oracle: sqrt((x1-x2)^2 + (y1-y2)^2) via explicit multiplication
    """
    dx, dy = x1 - x2, y1 - y2
    return F.sqrt(dx * dx + dy * dy)


def st_dwithin(x1: Column, y1: Column, x2: Column, y2: Column,
               dist: float) -> Column:
    """ST_DWithin — distance predicate. Compares SQUARED distance against
    dist² so the hot-path filter avoids the sqrt entirely."""
    dx, dy = x1 - x2, y1 - y2
    return (dx * dx + dy * dy) <= (dist * dist)


def st_contains_envelope(xmin: float, ymin: float, xmax: float, ymax: float,
                         x: Column, y: Column) -> Column:
    """ST_Contains(ST_MakeEnvelope(...), point) — closed-boundary
    rectangle containment (ESRI envelope contains its boundary)."""
    return (x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax)
