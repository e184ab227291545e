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


# ------------------------------------------------------ polygon relations
# Polygons are plan-time literal vertex rings (closed implicitly: last →
# first). Every relation below unrolls to O(V) arithmetic column
# expressions per row — pure whole-stage-codegen math at any scale, the
# same strategy as Calcite's planar ESRI backend minus the object model
# (GeoFunctions.java ST_Contains/ST_Within/ST_Distance/ST_DWithin
# overloads; exercised by core/src/test/resources/sql/spatial.iq). The
# twin ``sql_*`` generators emit the identical formula as SQL text so a
# DuckDB oracle (no spatial extension in this container) computes the
# same planar math from the same literals.

Ring = "list[tuple[float, float]]"


def _edges(vertices):
    n = len(vertices)
    return [(vertices[i], vertices[(i + 1) % n]) for i in range(n)]


def st_contains_poly(vertices, x: Column, y: Column) -> Column:
    """ST_Contains(polygon, point) via the even-odd ray cast: count edges
    whose half-open y-span covers the point and whose crossing lies right
    of it. The division-free form ``((x-x1)·dy - (x2-x1)·(y-y1)) · sign(dy)
    < 0`` avoids div-by-zero on horizontal edges (sign(dy) folds to a
    literal per edge). Works for concave rings; boundary points follow the
    half-open convention deterministically in both engines."""
    hits: Column | None = None
    for (x1, y1), (x2, y2) in _edges(vertices):
        dy = y2 - y1
        if dy == 0:
            continue  # horizontal edge never satisfies the y-span test
        s = 1.0 if dy > 0 else -1.0
        spans = (F.lit(y1) > y) != (F.lit(y2) > y)
        left = ((x - F.lit(x1)) * F.lit(dy)
                - F.lit(x2 - x1) * (y - F.lit(y1))) * F.lit(s) < 0
        term = F.when(spans & left, F.lit(1)).otherwise(F.lit(0))
        hits = term if hits is None else hits + term
    return F.pmod(hits, F.lit(2)) == 1


def sql_contains_poly(vertices, x: str, y: str) -> str:
    """The same even-odd ray cast as ``st_contains_poly``, as a SQL scalar
    expression string over column expressions ``x``/``y``."""
    terms = []
    for (x1, y1), (x2, y2) in _edges(vertices):
        dy = y2 - y1
        if dy == 0:
            continue
        s = 1.0 if dy > 0 else -1.0
        terms.append(
            f"(CASE WHEN (({y1:.1f} > {y}) != ({y2:.1f} > {y})) AND "
            f"((({x}) - {x1:.1f}) * {dy:.1f} - {x2 - x1:.1f} * (({y}) - {y1:.1f}))"
            f" * {s:.1f} < 0 THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def st_distance_poly(vertices, x: Column, y: Column) -> Column:
    """ST_Distance(polygon, point): 0 when the point is inside, else the
    minimum Euclidean distance to any boundary segment (clamped projection
    per edge, all plan-time constants folded)."""
    d2s = []
    for (x1, y1), (x2, y2) in _edges(vertices):
        ex, ey = x2 - x1, y2 - y1
        L2 = ex * ex + ey * ey
        t = ((x - F.lit(x1)) * F.lit(ex) + (y - F.lit(y1)) * F.lit(ey)) / F.lit(L2)
        tc = F.greatest(F.least(t, F.lit(1.0)), F.lit(0.0))
        dx = x - (F.lit(x1) + tc * F.lit(ex))
        dyc = y - (F.lit(y1) + tc * F.lit(ey))
        d2s.append(dx * dx + dyc * dyc)
    edge = F.sqrt(F.least(*d2s))
    return F.when(st_contains_poly(vertices, x, y), F.lit(0.0)).otherwise(edge)


def sql_distance_poly(vertices, x: str, y: str) -> str:
    """SQL twin of ``st_distance_poly``."""
    d2s = []
    for (x1, y1), (x2, y2) in _edges(vertices):
        ex, ey = x2 - x1, y2 - y1
        L2 = ex * ex + ey * ey
        t = (f"((({x}) - {x1:.1f}) * {ex:.1f} + (({y}) - {y1:.1f}) * {ey:.1f})"
             f" / {L2:.1f}")
        tc = f"greatest(least({t}, 1.0), 0.0)"
        dx = f"(({x}) - ({x1:.1f} + {tc} * {ex:.1f}))"
        dyc = f"(({y}) - ({y1:.1f} + {tc} * {ey:.1f}))"
        d2s.append(f"({dx} * {dx} + {dyc} * {dyc})")
    edge = f"sqrt(least({', '.join(d2s)}))"
    return (f"(CASE WHEN {sql_contains_poly(vertices, x, y)} THEN 0.0 "
            f"ELSE {edge} END)")
