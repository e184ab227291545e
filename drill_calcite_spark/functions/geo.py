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


def _g(v: float) -> str:
    """Emit a plan literal with full double precision (repr is
    shortest-roundtrip) so the SQL twin and the Column twin share
    bit-identical constants — '%.1f'-style formatting would silently round
    e.g. 10.25 and diverge the oracle."""
    return repr(float(v))


def _edges(vertices):
    n = len(vertices)
    return [(vertices[i], vertices[(i + 1) % n]) for i in range(n)]


def _ring_guard(vertices, op: str) -> None:
    """Translate-time validation (same fail-early contract as
    functions/pattern.py): reject rings that would make the unrolled math
    degenerate instead of silently emitting NULL/NaN columns."""
    if len(vertices) < 3:
        raise ValueError(f"{op}: ring needs >= 3 vertices, got {len(vertices)}")
    if sum(1 for (p1, p2) in _edges(vertices) if p1[1] != p2[1]) == 0:
        raise ValueError(f"{op}: ring has no non-horizontal edge (zero area)")
    if sum(1 for (p1, p2) in _edges(vertices) if p1 != p2) < 3:
        raise ValueError(f"{op}: ring collapses to < 3 distinct edges "
                         "(duplicate consecutive vertices)")


def st_contains_poly(vertices, x: Column, y: Column) -> Column:
    """ST_Contains(polygon, point) via the even-odd ray cast: count edges
    whose half-open y-span covers the point and whose crossing lies right
    of it. The division-free form ``((x-x1)·dy - (x2-x1)·(y-y1)) · sign(dy)
    < 0`` avoids div-by-zero on horizontal edges (sign(dy) folds to a
    literal per edge). Works for concave rings; boundary points follow the
    half-open convention deterministically in both engines."""
    _ring_guard(vertices, "st_contains_poly")
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
    _ring_guard(vertices, "sql_contains_poly")
    terms = []
    for (x1, y1), (x2, y2) in _edges(vertices):
        dy = y2 - y1
        if dy == 0:
            continue
        s = 1.0 if dy > 0 else -1.0
        terms.append(
            f"(CASE WHEN (({_g(y1)} > {y}) != ({_g(y2)} > {y})) AND "
            f"((({x}) - {_g(x1)}) * {_g(dy)} - {_g(x2 - x1)} * (({y}) - {_g(y1)}))"
            f" * {_g(s)} < 0 THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def st_distance_poly(vertices, x: Column, y: Column) -> Column:
    """ST_Distance(polygon, point): 0 when the point is inside, else the
    minimum Euclidean distance to any boundary segment (clamped projection
    per edge, all plan-time constants folded). Zero-length edges (duplicate
    consecutive vertices) contribute no segment — skipped, not divided by."""
    _ring_guard(vertices, "st_distance_poly")
    d2s = []
    for (x1, y1), (x2, y2) in _edges(vertices):
        ex, ey = x2 - x1, y2 - y1
        L2 = ex * ex + ey * ey
        if L2 == 0:
            continue
        t = ((x - F.lit(x1)) * F.lit(ex) + (y - F.lit(y1)) * F.lit(ey)) / F.lit(L2)
        tc = F.greatest(F.least(t, F.lit(1.0)), F.lit(0.0))
        dx = x - (F.lit(x1) + tc * F.lit(ex))
        dyc = y - (F.lit(y1) + tc * F.lit(ey))
        d2s.append(dx * dx + dyc * dyc)
    edge = F.sqrt(F.least(*d2s))
    return F.when(st_contains_poly(vertices, x, y), F.lit(0.0)).otherwise(edge)


def sql_distance_poly(vertices, x: str, y: str) -> str:
    """SQL twin of ``st_distance_poly``."""
    _ring_guard(vertices, "sql_distance_poly")
    d2s = []
    for (x1, y1), (x2, y2) in _edges(vertices):
        ex, ey = x2 - x1, y2 - y1
        L2 = ex * ex + ey * ey
        if L2 == 0:
            continue
        t = (f"((({x}) - {_g(x1)}) * {_g(ex)} + (({y}) - {_g(y1)}) * {_g(ey)})"
             f" / {_g(L2)}")
        tc = f"greatest(least({t}, 1.0), 0.0)"
        dx = f"(({x}) - ({_g(x1)} + {tc} * {_g(ex)}))"
        dyc = f"(({y}) - ({_g(y1)} + {tc} * {_g(ey)}))"
        d2s.append(f"({dx} * {dx} + {dyc} * {dyc})")
    edge = f"sqrt(least({', '.join(d2s)}))"
    return (f"(CASE WHEN {sql_contains_poly(vertices, x, y)} THEN 0.0 "
            f"ELSE {edge} END)")


# ------------------------------------------- polygon ↔ polygon relations
# The second ring is DATA-DRIVEN: a list of (x_expr, y_expr) column pairs
# (e.g. a per-row square from event coordinates). Relations decompose into
# the two classical primitives, still pure unrolled column math:
#   - segment straddle test per (edge_A × edge_B) pair — O(V_A·V_B) terms;
#   - point-in-polygon for each vertex against the other ring.
# Boundary convention: crossings are PROPER (collinear touching edges
# count as non-crossing, d == 0 → straddle false) and vertex containment
# follows the same half-open ray cast as st_contains_poly — deterministic
# and identical in both engines, which is what the oracle hash checks.
# (GeoFunctions.java ST_Intersects/ST_Contains/ST_Within polygon
# overloads; spatial.iq polygon cases.)

ColRing = "list[tuple[Column, Column]]"


def _cross(ox, oy, ax, ay, bx, by):
    """Signed cross product (a−o) × (b−o); works for Columns and floats."""
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def st_contains_colring(ring: "ColRing", x, y) -> Column:
    """Point-in-polygon where the RING is per-row column expressions.
    Horizontal edges self-exclude via the y-span test (y1 == y2 makes
    ``(y1 > y) != (y2 > y)`` false), so no per-edge literal folding is
    needed; the left-of test multiplies by signum(dy) at runtime."""
    if len(ring) < 3:
        raise ValueError("st_contains_colring: ring needs >= 3 vertices")
    hits: Column | None = None
    n = len(ring)
    for i in range(n):
        (x1, y1), (x2, y2) = ring[i], ring[(i + 1) % n]
        dy = y2 - y1
        spans = (y1 > y) != (y2 > y)
        left = ((x - x1) * dy - (x2 - x1) * (y - y1)) * F.signum(dy) < 0
        term = F.when(spans & left, F.lit(1)).otherwise(F.lit(0))
        hits = term if hits is None else hits + term
    return F.pmod(hits, F.lit(2)) == 1


def sql_contains_colring(ring: "list[tuple[str, str]]", x: str, y: str) -> str:
    """SQL twin of ``st_contains_colring`` (DuckDB sign == Spark signum)."""
    if len(ring) < 3:
        raise ValueError("sql_contains_colring: ring needs >= 3 vertices")
    terms = []
    n = len(ring)
    for i in range(n):
        (x1, y1), (x2, y2) = ring[i], ring[(i + 1) % n]
        terms.append(
            f"(CASE WHEN ((({y1}) > ({y})) != (({y2}) > ({y}))) AND "
            f"((({x}) - ({x1})) * (({y2}) - ({y1}))"
            f" - ((({x2}) - ({x1}))) * (({y}) - ({y1})))"
            f" * sign(({y2}) - ({y1})) < 0 THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def _lit_ring_cols(vertices) -> "ColRing":
    return [(F.lit(float(vx)), F.lit(float(vy))) for vx, vy in vertices]


def _lit_ring_sql(vertices) -> "list[tuple[str, str]]":
    return [(_g(vx), _g(vy)) for vx, vy in vertices]


def _any_straddle(ring_a: "ColRing", ring_b: "ColRing") -> Column:
    out: Column | None = None
    na, nb = len(ring_a), len(ring_b)
    for i in range(na):
        a1, a2 = ring_a[i], ring_a[(i + 1) % na]
        for j in range(nb):
            b1, b2 = ring_b[j], ring_b[(j + 1) % nb]
            d1 = _cross(b1[0], b1[1], b2[0], b2[1], a1[0], a1[1])
            d2 = _cross(b1[0], b1[1], b2[0], b2[1], a2[0], a2[1])
            d3 = _cross(a1[0], a1[1], a2[0], a2[1], b1[0], b1[1])
            d4 = _cross(a1[0], a1[1], a2[0], a2[1], b2[0], b2[1])
            # strict sign opposition on BOTH edges: d == 0 (an endpoint
            # exactly on the other edge's line) is never a proper crossing,
            # matching the module-head boundary convention symmetrically
            hit = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & (
                ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
            )
            out = hit if out is None else (out | hit)
    return out


def _sql_any_straddle(ring_a, ring_b) -> str:
    def cross(o, a, b):
        return (f"((({a[0]}) - ({o[0]})) * (({b[1]}) - ({o[1]}))"
                f" - (({a[1]}) - ({o[1]})) * (({b[0]}) - ({o[0]})))")

    parts = []
    na, nb = len(ring_a), len(ring_b)
    for i in range(na):
        a1, a2 = ring_a[i], ring_a[(i + 1) % na]
        for j in range(nb):
            b1, b2 = ring_b[j], ring_b[(j + 1) % nb]
            d1, d2 = cross(b1, b2, a1), cross(b1, b2, a2)
            d3, d4 = cross(a1, a2, b1), cross(a1, a2, b2)
            parts.append(
                f"(((({d1} > 0) AND ({d2} < 0)) OR (({d1} < 0) AND ({d2} > 0)))"
                f" AND ((({d3} > 0) AND ({d4} < 0))"
                f" OR (({d3} < 0) AND ({d4} > 0))))"
            )
    return "(" + " OR ".join(parts) + ")"


def st_intersects_poly_poly(lit_ring, col_ring: "ColRing") -> Column:
    """ST_Intersects(literal polygon, per-row polygon): any proper edge
    crossing, or either polygon containing a vertex of the other (covers
    full containment with no boundary crossing)."""
    _ring_guard(lit_ring, "st_intersects_poly_poly")
    lit_cols = _lit_ring_cols(lit_ring)
    crossing = _any_straddle(lit_cols, col_ring)
    b_vertex_in_a: Column | None = None
    for bx, by in col_ring:
        term = st_contains_poly(lit_ring, bx, by)
        b_vertex_in_a = term if b_vertex_in_a is None else (b_vertex_in_a | term)
    a_vertex_in_b: Column | None = None
    for ax, ay in lit_cols:
        term = st_contains_colring(col_ring, ax, ay)
        a_vertex_in_b = term if a_vertex_in_b is None else (a_vertex_in_b | term)
    return crossing | b_vertex_in_a | a_vertex_in_b


def sql_intersects_poly_poly(lit_ring, col_ring_sql) -> str:
    """SQL twin of ``st_intersects_poly_poly``."""
    _ring_guard(lit_ring, "sql_intersects_poly_poly")
    lit_sql = _lit_ring_sql(lit_ring)
    crossing = _sql_any_straddle(lit_sql, col_ring_sql)
    b_in_a = " OR ".join(sql_contains_poly(lit_ring, bx, by)
                         for bx, by in col_ring_sql)
    a_in_b = " OR ".join(sql_contains_colring(col_ring_sql, ax, ay)
                         for ax, ay in lit_sql)
    return f"({crossing} OR ({b_in_a}) OR ({a_in_b}))"


def st_contains_poly_poly(lit_ring, col_ring: "ColRing") -> Column:
    """ST_Contains(literal polygon, per-row polygon): every vertex of the
    inner ring inside the outer AND no proper edge crossing (simple-ring
    sufficient condition; Calcite ST_Contains overloads)."""
    _ring_guard(lit_ring, "st_contains_poly_poly")
    all_in: Column | None = None
    for bx, by in col_ring:
        term = st_contains_poly(lit_ring, bx, by)
        all_in = term if all_in is None else (all_in & term)
    return all_in & ~_any_straddle(_lit_ring_cols(lit_ring), col_ring)


def sql_contains_poly_poly(lit_ring, col_ring_sql) -> str:
    """SQL twin of ``st_contains_poly_poly``."""
    _ring_guard(lit_ring, "sql_contains_poly_poly")
    all_in = " AND ".join(sql_contains_poly(lit_ring, bx, by)
                          for bx, by in col_ring_sql)
    straddle = _sql_any_straddle(_lit_ring_sql(lit_ring), col_ring_sql)
    return f"(({all_in}) AND NOT {straddle})"


# --------------------------------------------------- measures / constructors
# ST_Area / ST_Centroid (shoelace formula), ST_Perimeter, ST_MakeLine /
# ST_Length / ST_NumPoints over column rings — GeoFunctions.java ST_Area/
# ST_Centroid/ST_Perimeter/ST_MakeLine/ST_Length/ST_NumPoints overloads.
# Pure per-row arithmetic; the SQL twins are built from the same vertex
# expression strings so both engines evaluate identical formulas.


def st_area_colring(ring: "ColRing") -> Column:
    """ST_Area of a simple ring via the shoelace formula:
    |Σ (x_i·y_{i+1} − x_{i+1}·y_i)| / 2. Vertex order (CW/CCW) only flips
    the sign, which abs() removes."""
    n = len(ring)
    acc: Column | None = None
    for i in range(n):
        (x1, y1), (x2, y2) = ring[i], ring[(i + 1) % n]
        term = x1 * y2 - x2 * y1
        acc = term if acc is None else acc + term
    return F.abs(acc) / 2.0


def sql_area_colring(ring: "list[tuple[str, str]]") -> str:
    n = len(ring)
    terms = []
    for i in range(n):
        (x1, y1), (x2, y2) = ring[i], ring[(i + 1) % n]
        terms.append(f"(({x1}) * ({y2}) - ({x2}) * ({y1}))")
    return f"(abs({' + '.join(terms)}) / 2.0)"


def st_centroid_colring(ring: "ColRing") -> "tuple[Column, Column]":
    """ST_Centroid of a simple ring (area-weighted polygon centroid):
    C = Σ (p_i + p_{i+1})·cross_i / (6·A_signed). Returns (cx, cy)."""
    n = len(ring)
    a6: Column | None = None
    cx: Column | None = None
    cy: Column | None = None
    for i in range(n):
        (x1, y1), (x2, y2) = ring[i], ring[(i + 1) % n]
        cross = x1 * y2 - x2 * y1
        tx, ty = (x1 + x2) * cross, (y1 + y2) * cross
        a6 = cross if a6 is None else a6 + cross
        cx = tx if cx is None else cx + tx
        cy = ty if cy is None else cy + ty
    return cx / (a6 * 3.0), cy / (a6 * 3.0)


def sql_centroid_colring(ring: "list[tuple[str, str]]") -> "tuple[str, str]":
    n = len(ring)
    crosses, txs, tys = [], [], []
    for i in range(n):
        (x1, y1), (x2, y2) = ring[i], ring[(i + 1) % n]
        cr = f"(({x1}) * ({y2}) - ({x2}) * ({y1}))"
        crosses.append(cr)
        txs.append(f"((({x1}) + ({x2})) * {cr})")
        tys.append(f"((({y1}) + ({y2})) * {cr})")
    a6 = "(" + " + ".join(crosses) + ")"
    return (f"(({' + '.join(txs)}) / ({a6} * 3.0))",
            f"(({' + '.join(tys)}) / ({a6} * 3.0))")


def st_perimeter_colring(ring: "ColRing") -> Column:
    """ST_Perimeter: Σ edge lengths around the closed ring."""
    n = len(ring)
    acc: Column | None = None
    for i in range(n):
        (x1, y1), (x2, y2) = ring[i], ring[(i + 1) % n]
        seg = F.sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))
        acc = seg if acc is None else acc + seg
    return acc


def sql_perimeter_colring(ring: "list[tuple[str, str]]") -> str:
    n = len(ring)
    terms = []
    for i in range(n):
        (x1, y1), (x2, y2) = ring[i], ring[(i + 1) % n]
        terms.append(
            f"sqrt((({x2}) - ({x1})) * (({x2}) - ({x1}))"
            f" + (({y2}) - ({y1})) * (({y2}) - ({y1})))")
    return "(" + " + ".join(terms) + ")"


def st_make_line(points: "ColRing") -> Column:
    """ST_MakeLine → LINESTRING WKT from point expressions (%.6f printf
    formatting — engine-portable bytes, same contract as st_point)."""
    parts: list[Column] = []
    for i, (x, y) in enumerate(points):
        if i:
            parts.append(F.lit(", "))
        parts.append(F.format_string("%.6f %.6f", x, y))
    return F.concat(F.lit("LINESTRING ("), *parts, F.lit(")"))


def sql_make_line(points: "list[tuple[str, str]]") -> str:
    segs = ", ".join(f"printf('%.6f %.6f', {x}, {y})" for x, y in points)
    return "('LINESTRING (' || concat_ws(', ', " + segs + ") || ')')"


def st_line_length(points: "ColRing") -> Column:
    """ST_Length of the OPEN polyline through ``points`` (no closing
    edge, unlike st_perimeter_colring)."""
    acc: Column | None = None
    for (x1, y1), (x2, y2) in zip(points, points[1:]):
        seg = F.sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))
        acc = seg if acc is None else acc + seg
    return acc


def sql_line_length(points: "list[tuple[str, str]]") -> str:
    terms = [
        f"sqrt((({x2}) - ({x1})) * (({x2}) - ({x1}))"
        f" + (({y2}) - ({y1})) * (({y2}) - ({y1})))"
        for (x1, y1), (x2, y2) in zip(points, points[1:])
    ]
    return "(" + " + ".join(terms) + ")"


def st_num_points(wkt: Column) -> Column:
    """ST_NumPoints of a LINESTRING/ring WKT: separators + 1."""
    return (F.length(wkt) - F.length(F.replace(wkt, F.lit(","), F.lit("")))
            + 1).cast("bigint")


def _unit_circle(segments: int) -> "list[tuple[float, float]]":
    """(cos, sin) pairs at the N-gon angles — plan-time Python constants,
    so Spark and the SQL twin share bit-identical trigonometry."""
    import math

    return [(math.cos(2.0 * math.pi * k / segments),
             math.sin(2.0 * math.pi * k / segments))
            for k in range(segments)]


def st_buffer_point_ring(x: Column, y: Column, r: Column,
                         segments: int = 8) -> "ColRing":
    """ST_Buffer(point, r) as the inscribed N-gon ring (the densified
    approximation ESRI's buffer also produces, at fixed N): vertex k =
    (x + r·cos θk, y + r·sin θk), θk = 2πk/N. Returns a column ring
    usable with every *_colring relation/measure; st_buffer_point_wkt
    renders it as POLYGON text."""
    return [(x + r * F.lit(ck), y + r * F.lit(sk))
            for ck, sk in _unit_circle(segments)]


def sql_buffer_point_ring(x: str, y: str, r: str,
                          segments: int = 8) -> "list[tuple[str, str]]":
    return [(f"(({x}) + ({r}) * {_g(ck)})", f"(({y}) + ({r}) * {_g(sk)})")
            for ck, sk in _unit_circle(segments)]


def _ring_wkt_body(ring: "ColRing") -> Column:
    parts: list[Column] = []
    for i, (vx, vy) in enumerate(ring + ring[:1]):  # WKT rings close
        if i:
            parts.append(F.lit(", "))
        parts.append(F.format_string("%.6f %.6f", vx, vy))
    return F.concat(*parts)


def st_polygon_wkt(ring: "ColRing") -> Column:
    """POLYGON WKT text from a column ring (closed per WKT convention)."""
    return F.concat(F.lit("POLYGON (("), _ring_wkt_body(ring), F.lit("))"))


def sql_polygon_wkt(ring: "list[tuple[str, str]]") -> str:
    pts = ring + ring[:1]
    segs = ", ".join(f"printf('%.6f %.6f', {x}, {y})" for x, y in pts)
    return "('POLYGON ((' || concat_ws(', ', " + segs + ") || '))')"


def st_union_disjoint_wkt(a: Column, b: Column) -> Column:
    """ST_Union of two DISJOINT polygons as MULTIPOLYGON text — the
    subset where union is pure composition (no boundary clipping; the
    reference delegates the general overlapping case to ESRI's clipper,
    out of scope here; disjointness is checkable first via
    st_intersects_poly_poly). Strips each 'POLYGON ' prefix, keeping the
    double-paren ring wrap WKT MULTIPOLYGON members carry."""
    def body(p: Column) -> Column:
        return F.regexp_replace(p, r"^POLYGON ", "")

    return F.concat(F.lit("MULTIPOLYGON ("), body(a), F.lit(", "),
                    body(b), F.lit(")"))


def st_geometry_type(wkt: Column) -> Column:
    """ST_GeometryType of a WKT value: the leading tag word
    (POINT / LINESTRING / POLYGON / MULTIPOLYGON / ...)."""
    return F.regexp_extract(wkt, "^[A-Z]+", 0)


def st_num_geometries(wkt: Column) -> Column:
    """ST_NumGeometries of a [MULTI]POLYGON WKT: count of '((' ring
    openings (1 for a simple POLYGON)."""
    return ((F.length(wkt) - F.length(F.replace(wkt, F.lit("(("), F.lit(""))))
            / 2).cast("bigint")


def st_within_poly_poly(lit_ring, col_ring: "ColRing") -> Column:
    """ST_Within(literal polygon, per-row polygon) — the LITERAL ring
    lies within the per-row COLUMN ring: every literal vertex inside the
    column ring AND no proper crossing. Argument order matches
    ST_Within(a, b) ≡ "a within b" ≡ ST_Contains(b, a)
    (GeoFunctions.java); the b-contains-a direction with a literal inner
    ring is the complement of st_contains_poly_poly."""
    _ring_guard(lit_ring, "st_within_poly_poly")
    all_in: Column | None = None
    for ax, ay in _lit_ring_cols(lit_ring):
        term = st_contains_colring(col_ring, ax, ay)
        all_in = term if all_in is None else (all_in & term)
    return all_in & ~_any_straddle(_lit_ring_cols(lit_ring), col_ring)


def sql_within_poly_poly(lit_ring, col_ring_sql) -> str:
    """SQL twin of ``st_within_poly_poly`` (same argument order)."""
    _ring_guard(lit_ring, "sql_within_poly_poly")
    all_in = " AND ".join(sql_contains_colring(col_ring_sql, ax, ay)
                          for ax, ay in _lit_ring_sql(lit_ring))
    straddle = _sql_any_straddle(_lit_ring_sql(lit_ring), col_ring_sql)
    return f"(({all_in}) AND NOT {straddle})"
