"""SQL-callable spatial surface: the ST_* family registered as Spark SQL
temporary functions (``CREATE OR REPLACE TEMPORARY FUNCTION … RETURN
<expr>``), so the reference's own spatial conformance script runs through
the SQL front door verbatim.

Reference parity: core/src/main/java/org/apache/calcite/runtime/
GeoFunctions.java (the ESRI-geometry-backed ST_ battery) as exercised by
core/src/test/resources/sql/spatial.iq. Calcite renders a GEOMETRY value
as the ESRI JSON of the underlying com.esri.core.geometry object
(``{"x":…,"y":…}`` / ``{"paths":[…]}`` / ``{"rings":[…]}``), so this
surface adopts **ESRI JSON text as the geometry representation**: every
function below is a pure Catalyst expression over that string — parse
with ``from_json``, build with ``concat``/higher-order array functions —
no Python UDF anywhere, so a 100 TB spatial pipeline stays map-only on
the executor JVM (the higher-order lambdas evaluate interpreted, outside
whole-stage codegen, but never cross an Arrow/Python boundary;
tests/test_plan_shapes.py pins the no-Exchange/no-Python shape).

Plan-size discipline (the 100 TB concern for an inlined-macro surface):
Spark SQL scalar UDFs are macro-inlined by Catalyst
(``ResolveSQLFunctions``) — every *reference* to a parameter substitutes
the full argument expression, so a body that mentions ``g`` thirty times
would grow multiplicatively under nesting like
``ST_AsText(ST_Envelope(ST_GeomFromText(…)))``. Every body below
therefore binds its argument(s) exactly once through a one-element
higher-order lambda — ``transform(array(<arg>), _g -> <body>)[0]`` — so
each nested call contributes its own tree once (additive growth), and
the ``from_json`` parse runs once per row per call, not once per field
reference. The same limitation means a SQL UDF cannot be invoked with a
lambda-variable argument, so per-coordinate formulas are expanded
textually by the ``_…`` Python macro helpers instead of nested UDF
calls.

Semantics notes, each pinned by tests/iq/calcite_spatial.iq:

- Numbers render like the reference: ESRI's JSON/WKT writers trim
  integral doubles to integer text (``1.0`` → ``1``) and otherwise emit
  Java ``Double.toString`` shortest form — both engines run the same
  JVM, so ``CAST(double AS STRING)`` + a trailing-``.0`` trim
  reproduces the bytes exactly.
- Polygon rings are orientation-normalized at parse, as ESRI's
  ``simplify`` does: exterior rings clockwise (negative shoelace),
  holes counter-clockwise; unclosed rings are closed; a 1-vertex ring
  duplicates its vertex (spatial.iq:221 ``POLYGON((0 0))``).
- ``ST_Transform``/``ST_SetSRID`` are SRID bookkeeping only (no
  reprojection) — the reference's GeoFunctions does exactly the same,
  and spatial.iq:415-430 pins distances unchanged across ST_Transform.
  SRID 3785 renders as ESRI's legacy web-mercator alias
  ``{"wkid":102113,"latestWkid":3785}`` (spatial.iq:1040). Spark 4.1
  ships native ``st_setsrid``/``st_srid`` builtins over its own
  GEOMETRY type which a SQL UDF cannot replace, so these two register
  as ``ST_SetSRID2``/``ST_SRID2`` and sql.py's front door rewrites the
  Calcite spelling onto them.
- ``ST_AsText``/``ST_AsWKT`` render through the same ESRI writers the
  reference uses: polygons print as MULTIPOLYGON, multi-paths as
  MULTILINESTRING, envelopes as POLYGON (spatial.iq:359,450-466,1046).
- Relation predicates cover the geometry-type pairs the reference's own
  script exercises (point×point, line×line, polygon×self/boundary,
  line×multipoint); an unsupported pair returns NULL rather than a
  wrong answer. Line×line relations classify pairwise segment
  intersections (proper straddle / endpoint touch / collinear
  overlap), the same planar decision ESRI's relate operator makes for
  polylines.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# One from_json schema covers every geometry variant; JSON field
# presence discriminates the type (x→point, paths→polyline,
# rings→polygon, points→multipoint, xmin→envelope).
OBJ_SCHEMA = (
    "x DOUBLE, y DOUBLE, z DOUBLE, hasZ BOOLEAN, "
    "rings ARRAY<ARRAY<ARRAY<DOUBLE>>>, "
    "paths ARRAY<ARRAY<ARRAY<DOUBLE>>>, "
    "points ARRAY<ARRAY<DOUBLE>>, "
    "xmin DOUBLE, ymin DOUBLE, xmax DOUBLE, ymax DOUBLE, "
    "spatialReference STRUCT<wkid INT, latestWkid INT>"
)


def _parse(g: str) -> str:
    return f"from_json({g}, '{OBJ_SCHEMA}')"


_BIND_SEQ = [0]


def _uv(name: str) -> str:
    """Unique lambda-variable name (see _bind: same-named lambda
    variables across sibling inlined UDF calls trip Spark's
    RemoveRedundantAliases)."""
    _BIND_SEQ[0] += 1
    return f"{name}{_BIND_SEQ[0]}"


def _bind(expr: str, fn, var: str = "_g") -> str:
    """Bind ``expr`` once: transform(array(expr), var -> fn(var))[0].

    This is the plan-size keystone (see module docstring): the argument
    expression appears exactly once no matter how many times the body
    references the bound variable. Each call site gets a UNIQUE lambda
    variable name: Spark 4.1's RemoveRedundantAliases un-resolves a
    plan where two different inlined SQL UDFs project same-named
    lambda variables over one union output attribute
    (PLAN_VALIDATION_FAILED_RULE_IN_BATCH)."""
    _BIND_SEQ[0] += 1
    var = f"{var}{_BIND_SEQ[0]}"
    return f"transform(array({expr}), {var} -> {fn(var)})[0]"


def _bind2(e1: str, e2: str, fn) -> str:
    """Bind two expressions once each via a single-element struct."""
    _BIND_SEQ[0] += 1
    var = f"_s{_BIND_SEQ[0]}"
    pair = f"array(named_struct('a', {e1}, 'b', {e2}))"
    return f"transform({pair}, {var} -> {fn(f'{var}.a', f'{var}.b')})[0]"


def _fmt(e: str) -> str:
    """ESRI number writer: Java Double.toString with integral doubles
    trimmed to integer text. Single reference to ``e``."""
    return f"regexp_replace(cast({e} AS STRING), '\\\\.0$', '')"


def _jpt(p: str) -> str:
    """coord array<double> → JSON '[x,y(,z)]' text."""
    v = _uv("_fv")
    return (f"concat('[', array_join(transform({p}, {v} -> {_fmt(v)}), "
            f"','), ']')")


def _jring(r: str) -> str:
    """array<array<double>> → JSON '[[…],[…]]' text."""
    v = _uv("_fp")
    return (f"concat('[', array_join(transform({r}, {v} -> {_jpt(v)}), "
            f"','), ']')")


def _wpt(p: str) -> str:
    """coord array → WKT 'x y( z)' text."""
    v = _uv("_fw")
    return f"array_join(transform({p}, {v} -> {_fmt(v)}), ' ')"


def _wring(r: str) -> str:
    """array<array<double>> → WKT 'x y, x y, …' text."""
    v = _uv("_fq")
    return f"array_join(transform({r}, {v} -> {_wpt(v)}), ', ')"


def _coords(s: str) -> str:
    """One WKT coordinate group '1 2, 3 4' → array<array<double>>."""
    c, t = _uv("_cc"), _uv("_ct")
    return (f"transform(split({s}, ','), {c} -> "
            f"transform(filter(split(trim({c}), '\\\\s+'), {t} -> {t} != ''), "
            f"{t} -> cast({t} AS DOUBLE)))")


def _shoelace(r: str) -> str:
    """Signed shoelace sum of a closed ring (positive = CCW)."""
    a, i = _uv("_sa"), _uv("_si")
    return (f"aggregate(sequence(0, size({r}) - 2), cast(0.0 AS DOUBLE), "
            f"({a}, {i}) -> {a} + {r}[{i}][0] * {r}[{i} + 1][1] "
            f"- {r}[{i} + 1][0] * {r}[{i}][1])")


def _close(r: str) -> str:
    """ESRI ring closure: 1-vertex rings duplicate the vertex; open
    rings append the first vertex (x/y compare)."""
    return (f"CASE WHEN size({r}) = 1 THEN concat({r}, {r}) "
            f"WHEN element_at({r}, -1)[0] != {r}[0][0] "
            f"OR element_at({r}, -1)[1] != {r}[0][1] "
            f"THEN concat({r}, array({r}[0])) ELSE {r} END")


def _orient(i: str, r: str) -> str:
    """ESRI ring orientation: ring 0 of a polygon (exterior) clockwise
    (shoelace <= 0), holes counter-clockwise."""
    return _bind(
        r, lambda b: (f"CASE WHEN {i} = 0 AND {_shoelace(b)} > 0 "
                      f"THEN reverse({b}) "
                      f"WHEN {i} > 0 AND {_shoelace(b)} < 0 "
                      f"THEN reverse({b}) ELSE {b} END"),
        var="_or")


def _groups(w: str) -> str:
    """Innermost '(…)' coordinate groups of a WKT string."""
    return f"regexp_extract_all({w}, '\\\\(([^()]+)\\\\)', 1)"


def _blobs(w: str) -> str:
    """Polygon-level blobs of a (MULTI)POLYGON: '((ring),(ring))'."""
    return (f"regexp_extract_all({w}, "
            f"'\\\\((\\\\([^()]*\\\\)(,\\\\s*\\\\([^()]*\\\\))*)\\\\)', 1)")


def _haz(w: str) -> str:
    """WKT has an explicit ' Z' dimension modifier."""
    return f"upper({w}) rlike '^\\\\s*[A-Z]+\\\\s+Z\\\\s*\\\\('"


def _sr_json(srid: str) -> str:
    """spatialReference JSON for a wkid; 3785 gets ESRI's legacy
    web-mercator alias."""
    return (f"CASE WHEN {srid} = 3785 "
            f"THEN '{{\"wkid\":102113,\"latestWkid\":3785}}' "
            f"ELSE concat('{{\"wkid\":', cast({srid} AS STRING), '}}') END")


def _with_sr(j: str, srid: str) -> str:
    """Append ,"spatialReference":… before the closing brace."""
    return _bind(
        j, lambda b: (f"CASE WHEN {srid} IS NULL OR {b} IS NULL THEN {b} "
                      f"ELSE concat(substring({b}, 1, length({b}) - 1), "
                      f"',\"spatialReference\":', {_sr_json(srid)}, '}}') "
                      f"END"),
        var="_sj")


def _point_json(c: str) -> str:
    """coord array [x,y(,z)] → ESRI point JSON."""
    return _bind(
        c, lambda b: (
            f"CASE WHEN {b} IS NULL OR size({b}) < 2 "
            f"OR {b}[0] IS NULL OR {b}[1] IS NULL THEN NULL "
            f"ELSE concat('{{\"x\":', {_fmt(f'{b}[0]')}, "
            f"',\"y\":', {_fmt(f'{b}[1]')}, "
            f"CASE WHEN size({b}) > 2 AND {b}[2] IS NOT NULL THEN "
            f"concat(',\"z\":', {_fmt(f'{b}[2]')}) ELSE '' END, '}}') END"),
        var="_pc")


def _paths_json(paths: str, hasz: str) -> str:
    return (f"concat('{{', CASE WHEN {hasz} THEN '\"hasZ\":true,' "
            f"ELSE '' END, '\"paths\":', "
            f"concat('[', array_join(transform({paths}, "
            f"_pp -> {_jring('_pp')}), ','), ']'), '}}')")


def _points_json(pts: str, hasz: str) -> str:
    return (f"concat('{{', CASE WHEN {hasz} THEN '\"hasZ\":true,' "
            f"ELSE '' END, '\"points\":', {_jring(pts)}, '}}')")


def _rings_json(rings: str, hasz: str) -> str:
    return (f"concat('{{', CASE WHEN {hasz} THEN '\"hasZ\":true,' "
            f"ELSE '' END, '\"rings\":', "
            f"concat('[', array_join(transform({rings}, "
            f"_rr -> {_jring('_rr')}), ','), ']'), '}}')")


def _poly_rings(w: str) -> str:
    """All rings of a (MULTI)POLYGON wkt: per-polygon blob, ring 0
    exterior (forced CW), later rings holes (forced CCW), every ring
    closed, flattened into one list — exactly how ESRI JSON renders
    multipolygons (spatial.iq:97-125)."""
    ring = _orient("_ri", _close(_coords("_rg")))
    per_blob = f"transform({_groups('_bl')}, (_rg, _ri) -> {ring})"
    return f"flatten(transform({_blobs(w)}, _bl -> {per_blob}))"


def _geom_from_text_body() -> str:
    """ST_GeomFromText(wkt, srid): WKT text → ESRI JSON text."""

    def body(w: str) -> str:
        kind = f"upper(regexp_extract(trim({w}), '^([A-Za-z]+)', 1))"
        hasz = _haz(w)
        g0 = _groups(w) + "[0]"
        first_coord = f"{_coords(g0)}[0]"
        paths = f"transform({_groups(w)}, _lg -> {_coords('_lg')})"
        return f"""CASE
          WHEN {w} IS NULL THEN NULL
          WHEN {kind} = 'POINT' THEN {_point_json(first_coord)}
          WHEN {kind} IN ('LINESTRING', 'MULTILINESTRING') THEN
            {_paths_json(paths, hasz)}
          WHEN {kind} = 'MULTIPOINT' THEN
            {_points_json(_coords(g0), hasz)}
          WHEN {kind} IN ('POLYGON', 'MULTIPOLYGON') THEN
            {_rings_json(_poly_rings(w), hasz)}
          ELSE NULL END"""

    return _with_sr(_bind("wkt", body, var="_wk"), "srid")


# ---------------------------------------------------------------- WKT out

def _zflag(o: str) -> str:
    return f"(coalesce({o}.hasZ, false) OR {o}.z IS NOT NULL)"


def _as_text_body() -> str:
    """ST_AsText / ST_AsWKT: ESRI JSON → the reference's WKT rendering
    (point → POINT, points → MULTIPOINT, paths → MULTILINESTRING,
    rings → MULTIPOLYGON, envelope → POLYGON)."""

    def body(o: str) -> str:
        z = _zflag(o)
        zs = f"CASE WHEN {z} THEN 'Z ' ELSE '' END"
        pt2 = _wpt(f"array({o}.x, {o}.y)")
        pt3 = _wpt(f"array({o}.x, {o}.y, {o}.z)")
        point = (f"concat('POINT ', {zs}, '(', "
                 f"CASE WHEN {z} THEN {pt3} ELSE {pt2} END, ')')")
        mpoint = (f"concat('MULTIPOINT ', {zs}, '(', "
                  f"array_join(transform({o}.points, "
                  f"_mp -> concat('(', {_wpt('_mp')}, ')')), ', '), ')')")
        mline = (f"concat('MULTILINESTRING ', {zs}, '(', "
                 f"array_join(transform({o}.paths, "
                 f"_ml -> concat('(', {_wring('_ml')}, ')')), ', '), ')')")
        # WKT polygon export reverses every ring: internal ESRI JSON is
        # exterior-CW/holes-CCW, the OGC WKT writer emits exterior-CCW/
        # holes-CW (spatial.iq:1046 — a CW input ring prints reversed;
        # the raw-JSON cases at :91 print in internal order).
        mpoly = (f"concat('MULTIPOLYGON ', {zs}, '((', "
                 f"array_join(transform({o}.rings, "
                 f"_mr -> concat('(', {_wring('reverse(_mr)')}, ')')), "
                 f"'), ('), '))')")
        env_ring = (f"array(array({o}.xmin, {o}.ymin), "
                    f"array({o}.xmax, {o}.ymin), "
                    f"array({o}.xmax, {o}.ymax), "
                    f"array({o}.xmin, {o}.ymax), "
                    f"array({o}.xmin, {o}.ymin))")
        env = f"concat('POLYGON ((', {_wring(env_ring)}, '))')"
        return f"""CASE
          WHEN {o} IS NULL THEN NULL
          WHEN {o}.x IS NOT NULL THEN {point}
          WHEN {o}.points IS NOT NULL THEN {mpoint}
          WHEN {o}.paths IS NOT NULL THEN {mline}
          WHEN {o}.rings IS NOT NULL THEN {mpoly}
          WHEN {o}.xmin IS NOT NULL THEN {env}
          ELSE NULL END"""

    return f"CASE WHEN g IS NULL THEN NULL ELSE {_bind(_parse('g'), body)} END"


# ------------------------------------------------------------ predicates

def _all_coords(o: str) -> str:
    """Every coordinate of any geometry as array<array<double>>."""
    return (f"CASE "
            f"WHEN {o}.x IS NOT NULL THEN array(array({o}.x, {o}.y)) "
            f"WHEN {o}.points IS NOT NULL THEN {o}.points "
            f"WHEN {o}.paths IS NOT NULL THEN flatten({o}.paths) "
            f"WHEN {o}.rings IS NOT NULL THEN flatten({o}.rings) "
            f"WHEN {o}.xmin IS NOT NULL THEN array("
            f"array({o}.xmin, {o}.ymin), array({o}.xmax, {o}.ymax)) "
            f"ELSE NULL END")


def _segs(o: str) -> str:
    """All segments of a paths/rings geometry: array of [ax,ay,bx,by]."""
    return (f"flatten(transform(coalesce({o}.paths, {o}.rings), _sp -> "
            f"CASE WHEN size(_sp) < 2 THEN "
            f"cast(array() AS ARRAY<ARRAY<DOUBLE>>) "
            f"ELSE transform(sequence(0, size(_sp) - 2), _sx -> "
            f"array(_sp[_sx][0], _sp[_sx][1], "
            f"_sp[_sx + 1][0], _sp[_sx + 1][1])) END))")


# Orientation determinants for segment pair _u (of g1) × _v (of g2).
_D1 = "((_v[0]-_u[0])*(_u[3]-_u[1]) - (_v[1]-_u[1])*(_u[2]-_u[0]))"
_D2 = "((_v[2]-_u[0])*(_u[3]-_u[1]) - (_v[3]-_u[1])*(_u[2]-_u[0]))"
_D3 = "((_u[0]-_v[0])*(_v[3]-_v[1]) - (_u[1]-_v[1])*(_v[2]-_v[0]))"
_D4 = "((_u[2]-_v[0])*(_v[3]-_v[1]) - (_u[3]-_v[1])*(_v[2]-_v[0]))"
_PROPER = f"({_D1} * {_D2} < 0 AND {_D3} * {_D4} < 0)"
_BOXES = ("least(_u[0],_u[2]) <= greatest(_v[0],_v[2]) AND "
          "least(_v[0],_v[2]) <= greatest(_u[0],_u[2]) AND "
          "least(_u[1],_u[3]) <= greatest(_v[1],_v[3]) AND "
          "least(_v[1],_v[3]) <= greatest(_u[1],_u[3])")
_TOUCHING = (f"(({_D1} = 0 OR {_D2} = 0 OR {_D3} = 0 OR {_D4} = 0) "
             f"AND {_BOXES} AND {_D1} * {_D2} <= 0 AND {_D3} * {_D4} <= 0)")
_INTERSECT = f"({_PROPER} OR {_TOUCHING})"
# collinear 1-d overlap with positive projected length
_COLL_OVER = (
    f"({_D1} = 0 AND {_D2} = 0 AND "
    f"least(greatest(_u[0],_u[2]), greatest(_v[0],_v[2])) "
    f"- greatest(least(_u[0],_u[2]), least(_v[0],_v[2])) "
    f"+ least(greatest(_u[1],_u[3]), greatest(_v[1],_v[3])) "
    f"- greatest(least(_u[1],_u[3]), least(_v[1],_v[3])) > 0)")


def _pair_exists(segs1: str, segs2: str, test: str) -> str:
    return (f"exists({segs1}, _u -> exists({segs2}, _v -> {test}))")


def _pt_on_seg(px: str, py: str, s: str) -> str:
    """Point exactly on segment s=[ax,ay,bx,by]."""
    return (f"(({s}[2]-{s}[0])*({py}-{s}[1]) "
            f"- ({s}[3]-{s}[1])*({px}-{s}[0]) = 0 "
            f"AND least({s}[0],{s}[2]) <= {px} "
            f"AND {px} <= greatest({s}[0],{s}[2]) "
            f"AND least({s}[1],{s}[3]) <= {py} "
            f"AND {py} <= greatest({s}[1],{s}[3]))")


def _pt_in_ring(ring: str, px: str, py: str) -> str:
    """Ray-cast parity: point strictly inside a closed ring (half-open
    edge rule; boundary handled separately by _pt_on_seg)."""
    return (f"(aggregate(sequence(0, size({ring}) - 2), 0, (_rn, _rk) -> "
            f"_rn + CASE WHEN (({ring}[_rk][1] > {py}) != "
            f"({ring}[_rk + 1][1] > {py})) AND "
            f"{px} < {ring}[_rk][0] + ({py} - {ring}[_rk][1]) "
            f"* ({ring}[_rk + 1][0] - {ring}[_rk][0]) "
            f"/ ({ring}[_rk + 1][1] - {ring}[_rk][1]) THEN 1 ELSE 0 END) "
            f"% 2 = 1)")


def _line_within(oa: str, ob: str) -> str:
    """Polyline containment: every vertex and every segment midpoint of
    ``oa`` lies on some segment of ``ob`` (exact for the piecewise-
    linear inputs the reference's script uses)."""
    on_b = (f"exists({_segs(ob)}, _s -> "
            + _pt_on_seg("_w[0]", "_w[1]", "_s") + ")")
    verts = f"flatten({oa}.paths)"
    mids = (f"transform({_segs(oa)}, _m -> "
            f"array((_m[0]+_m[2])/2, (_m[1]+_m[3])/2))")
    return (f"(forall({verts}, _w -> {on_b}) AND "
            f"forall(transform({mids}, _w -> _w), _w -> {on_b}))")


def _endpoints(o: str) -> str:
    """Boundary endpoints of an open polyline (first+last per open
    path)."""
    return (f"flatten(transform({o}.paths, _pp -> "
            f"CASE WHEN size(_pp) < 2 OR (_pp[0][0] = element_at(_pp, -1)[0] "
            f"AND _pp[0][1] = element_at(_pp, -1)[1]) "
            f"THEN cast(array() AS ARRAY<ARRAY<DOUBLE>>) "
            f"ELSE array(_pp[0], element_at(_pp, -1)) END))")


def _env_vals(o: str):
    xs = f"transform({_all_coords(o)}, _ep -> _ep[0])"
    ys = f"transform({_all_coords(o)}, _ep -> _ep[1])"
    return (f"array_min({xs})", f"array_max({xs})",
            f"array_min({ys})", f"array_max({ys})")


_BUGGY_RULE = "org.apache.spark.sql.catalyst.optimizer.RemoveRedundantAliases"


def register_geo_sql(spark: SparkSession) -> None:
    """Create the ST_* temporary SQL functions on this session.

    Also excludes Spark 4.1's RemoveRedundantAliases optimizer rule for
    the session: with two inlined SQL-UDF projections over one UNION
    output attribute (e.g. ``SELECT ST_GeometryType(g),
    ST_GeometryTypeCode(g) FROM (… UNION ALL …)``) the rule un-resolves
    the plan (PLAN_VALIDATION_FAILED_RULE_IN_BATCH, reproduced on
    4.1.2; single projections are fine). The rule is cosmetic alias
    cleanup — excluding it does not change join strategies, exchanges,
    or pushdown."""
    existing = spark.conf.get("spark.sql.optimizer.excludedRules", None)
    if not existing:
        spark.conf.set("spark.sql.optimizer.excludedRules", _BUGGY_RULE)
    elif _BUGGY_RULE not in existing:
        spark.conf.set("spark.sql.optimizer.excludedRules",
                       existing + "," + _BUGGY_RULE)

    # Arrow-batched kernel behind the polygon paths of ST_Union /
    # ST_Difference / ST_SymDifference / ST_Intersection (must exist
    # before the CREATE FUNCTION bodies that reference it analyze).
    spark.udf.register("st_poly_setop", _st_poly_setop())

    for stmt in build_statements():
        spark.sql(stmt)


def _st_poly_setop():
    """The pandas-UDF kernel for polygon ST_ set ops (built lazily so
    importing this module never touches pyspark UDF machinery).

    Accepts each argument as the surface's internal ESRI-JSON polygon
    (``{"rings":[[x,y]...]}`` — exterior CW, closed) or raw WKT
    ``POLYGON ((...))`` text; single exterior ring only. Returns the
    set-op result as WKT text, or None when an argument is not a
    single-ring polygon (the SQL wrapper raises loudly on that None —
    UDFs are extracted out of CASE branches, so the kernel itself must
    never raise on mere misuse; degenerate GEOMETRY still raises, by
    the polyclip contract)."""
    import json

    import pandas
    from pyspark.sql.functions import pandas_udf

    from drill_calcite_spark.operators.polyclip import (
        _parse_polygon_wkt, polygon_setop_rings, render_setop_wkt,
    )
    from fractions import Fraction

    def pts(g):
        if g is None:
            return None
        g = g.strip()
        try:
            if g.startswith("{"):
                rings = json.loads(g).get("rings")
                if not rings or len(rings) != 1:
                    return None
                ring = [(Fraction(x), Fraction(y)) for x, y in rings[0]]
                if len(ring) >= 2 and ring[0] == ring[-1]:
                    ring.pop()
                return ring if len(ring) >= 3 else None
            return _parse_polygon_wkt(g)
        except (ValueError, TypeError, json.JSONDecodeError):
            return None

    def one(a, b, o):
        p1, p2 = pts(a), pts(b)
        if p1 is None or p2 is None:
            return None
        return render_setop_wkt(polygon_setop_rings(p1, p2, o))

    def kernel(g1, g2, op):
        return pandas.Series([one(a, b, o)
                              for a, b, o in zip(g1, g2, op)],
                             dtype="object")

    kernel.__annotations__ = {"g1": pandas.Series, "g2": pandas.Series,
                              "op": pandas.Series, "return": pandas.Series}
    return pandas_udf(kernel, "string")


def _f(name: str, params: str, ret: str, body: str) -> str:
    return (f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
            f"RETURNS {ret} RETURN {body}")


def build_statements() -> "list[str]":
    stmts = []

    # --- constructors / parsers ------------------------------------
    parse_body = _geom_from_text_body()
    for name in ("ST_GeomFromText", "ST_PointFromText", "ST_LineFromText",
                 "ST_MLineFromText", "ST_MPointFromText",
                 "ST_MPolyFromText", "ST_PolyFromText"):
        # The typed *FromText aliases do NOT validate the type — the
        # reference's own run returns the parsed point for
        # ST_LineFromText('POINT(1 2)') (spatial.iq:155-163).
        stmts.append(_f(name, "wkt STRING, srid INT DEFAULT NULL",
                        "STRING", parse_body))

    stmts.append(_f(
        "ST_Point", "x DOUBLE, y DOUBLE", "STRING",
        _point_json("array(x, y)")))
    stmts.append(_f(
        "ST_MakePoint", "x DOUBLE, y DOUBLE, z DOUBLE DEFAULT NULL",
        "STRING",
        f"CASE WHEN z IS NULL THEN {_point_json('array(x, y)')} "
        f"ELSE {_point_json('array(x, y, z)')} END"))
    mk_pts = (f"filter(array({_parse('p1')}, {_parse('p2')}, "
              f"{_parse('p3')}), _mk -> _mk.x IS NOT NULL)")
    mk_path = f"array(transform({mk_pts}, _mk -> array(_mk.x, _mk.y)))"
    stmts.append(_f(
        "ST_MakeLine", "p1 STRING, p2 STRING, p3 STRING DEFAULT NULL",
        "STRING",
        f"CASE WHEN p1 IS NULL OR p2 IS NULL THEN NULL ELSE "
        f"{_bind(mk_path, lambda b: _paths_json(b, 'false'), var='_mb')} "
        f"END"))

    # --- accessors --------------------------------------------------
    og = _parse("g")
    stmts.append(_f("ST_X", "g STRING", "DOUBLE", f"{og}.x"))
    stmts.append(_f("ST_Y", "g STRING", "DOUBLE", f"{og}.y"))
    stmts.append(_f("ST_Z", "g STRING", "DOUBLE", f"{og}.z"))
    stmts.append(_f(
        "ST_Is3D", "g STRING", "BOOLEAN",
        f"CASE WHEN g IS NULL THEN NULL ELSE "
        f"{_bind(og, lambda o: _zflag(o))} END"))

    def geom_type(o: str, as_code: bool) -> str:
        pt, mp, ln, pg = (("1", "4", "2", "3") if as_code else
                          ("'POINT'", "'MULTIPOINT'", "'LINESTRING'",
                           "'POLYGON'"))
        return (f"CASE WHEN {o}.x IS NOT NULL THEN {pt} "
                f"WHEN {o}.points IS NOT NULL THEN {mp} "
                f"WHEN {o}.paths IS NOT NULL THEN {ln} "
                f"WHEN {o}.rings IS NOT NULL THEN {pg} "
                f"WHEN {o}.xmin IS NOT NULL THEN {pg} "
                f"ELSE NULL END")

    stmts.append(_f(
        "ST_GeometryType", "g STRING", "STRING",
        _bind(og, lambda o: geom_type(o, False))))
    stmts.append(_f(
        "ST_GeometryTypeCode", "g STRING", "INT",
        _bind(og, lambda o: geom_type(o, True))))
    stmts.append(_f("ST_AsText", "g STRING", "STRING", _as_text_body()))
    stmts.append(_f("ST_AsWKT", "g STRING", "STRING", _as_text_body()))

    # --- SRID bookkeeping (see module docstring re the '2' suffix) --
    stmts.append(_f("ST_SetSRID2", "g STRING, srid INT", "STRING", "g"))
    strip_sr = (f"CASE WHEN g RLIKE ',\"spatialReference\"' THEN "
                f"concat(regexp_replace(g, "
                f"',\"spatialReference\":.*$', ''), '}}') ELSE g END")
    stmts.append(_f(
        "ST_Transform", "g STRING, srid INT", "STRING",
        _with_sr(f"({strip_sr})", "srid")))
    stmts.append(_f(
        "ST_SRID2", "g STRING", "INT",
        f"coalesce({og}.spatialReference.wkid, 0)"))

    # --- envelope / boundary ----------------------------------------
    def env_body(o: str) -> str:
        xmin, xmax, ymin, ymax = _env_vals(o)
        return (f"concat('{{\"xmin\":', {_fmt(xmin)}, "
                f"',\"ymin\":', {_fmt(ymin)}, "
                f"',\"xmax\":', {_fmt(xmax)}, "
                f"',\"ymax\":', {_fmt(ymax)}, '}}')")

    stmts.append(_f(
        "ST_Envelope", "g STRING", "STRING",
        f"CASE WHEN g IS NULL THEN NULL ELSE {_bind(og, env_body)} END"))

    def boundary_body(o: str) -> str:
        eps = _endpoints(o)
        # endpoints with odd (x,y) multiplicity, first-occurrence order
        odd = _bind(
            eps, lambda e: (
                f"filter({e}, (_p, _i) -> "
                f"size(filter({e}, _q -> _q[0] = _p[0] AND _q[1] = _p[1])) "
                f"% 2 = 1 AND NOT exists(slice({e}, 1, _i), "
                f"_q -> _q[0] = _p[0] AND _q[1] = _p[1]))"),
            var="_ee")
        z = _zflag(o)
        return f"""CASE
          WHEN {o}.x IS NOT NULL THEN '{{"points":[]}}'
          WHEN {o}.paths IS NOT NULL THEN {_points_json(odd, z)}
          WHEN {o}.rings IS NOT NULL THEN {_paths_json(f'{o}.rings', z)}
          ELSE NULL END"""

    stmts.append(_f(
        "ST_Boundary", "g STRING", "STRING",
        f"CASE WHEN g IS NULL THEN NULL ELSE "
        f"{_bind(og, boundary_body)} END"))

    # --- distance ----------------------------------------------------
    # point-segment distance for point (_px,_py) and segment _s,
    # parameterized through a bound [px, py, ax, ay, bx, by] tuple _t
    # with the clamped projection parameter computed once.
    t_param = ("greatest(cast(0.0 AS DOUBLE), least(cast(1.0 AS DOUBLE), "
               "((_t[0]-_t[2])*(_t[4]-_t[2]) + (_t[1]-_t[3])*(_t[5]-_t[3]))"
               " / nullif((_t[4]-_t[2])*(_t[4]-_t[2]) "
               "+ (_t[5]-_t[3])*(_t[5]-_t[3]), cast(0.0 AS DOUBLE))))")
    pseg_dist = _bind(
        f"concat(array(_dp[0], _dp[1]), _ds)",
        lambda t: _bind(
            f"coalesce({t_param.replace('_t', t)}, cast(0.0 AS DOUBLE))",
            lambda tp: (
                f"sqrt(({t}[0] - ({t}[2] + {tp} * ({t}[4]-{t}[2]))) "
                f"* ({t}[0] - ({t}[2] + {tp} * ({t}[4]-{t}[2]))) "
                f"+ ({t}[1] - ({t}[3] + {tp} * ({t}[5]-{t}[3]))) "
                f"* ({t}[1] - ({t}[3] + {tp} * ({t}[5]-{t}[3]))))"),
            var="_tp"),
        var="_t")

    def pt_geom_dist(o_pt: str, o_ln: str) -> str:
        return (f"transform(array(array({o_pt}.x, {o_pt}.y)), _dp -> "
                f"array_min(transform({_segs(o_ln)}, "
                f"_ds -> {pseg_dist})))[0]")

    def dist_body(o1: str, o2: str) -> str:
        return f"""CASE
          WHEN {o1}.x IS NOT NULL AND {o2}.x IS NOT NULL THEN
            sqrt(({o1}.x - {o2}.x) * ({o1}.x - {o2}.x)
               + ({o1}.y - {o2}.y) * ({o1}.y - {o2}.y))
          WHEN {o1}.x IS NOT NULL
           AND ({o2}.paths IS NOT NULL OR {o2}.rings IS NOT NULL) THEN
            {pt_geom_dist(o1, o2)}
          WHEN {o2}.x IS NOT NULL
           AND ({o1}.paths IS NOT NULL OR {o1}.rings IS NOT NULL) THEN
            {pt_geom_dist(o2, o1)}
          ELSE NULL END"""

    stmts.append(_f(
        "ST_Distance", "g1 STRING, g2 STRING", "DOUBLE",
        f"CASE WHEN g1 IS NULL OR g2 IS NULL THEN NULL ELSE "
        f"{_bind2(_parse('g1'), _parse('g2'), dist_body)} END"))
    # <= (inclusive), matching the reference: GeoFunctions.java:415
    # returns distance <= d, so geometries at EXACTLY distance d are
    # within (ADVICE r7 — the previous '<' diverged on boundary pairs).
    stmts.append(_f(
        "ST_DWithin", "g1 STRING, g2 STRING, d DOUBLE", "BOOLEAN",
        "ST_Distance(g1, g2) <= d"))

    # --- relation predicates ----------------------------------------
    def env_pair(o1: str, o2: str) -> str:
        x1n, x1x, y1n, y1x = _env_vals(o1)
        x2n, x2x, y2n, y2x = _env_vals(o2)
        return (f"({x1n} <= {x2x} AND {x2n} <= {x1x} AND "
                f"{y1n} <= {y2x} AND {y2n} <= {y1x})")

    def wrap2(fn) -> str:
        return (f"CASE WHEN g1 IS NULL OR g2 IS NULL THEN NULL ELSE "
                f"{_bind2(_parse('g1'), _parse('g2'), fn)} END")

    stmts.append(_f(
        "ST_EnvelopesIntersect", "g1 STRING, g2 STRING", "BOOLEAN",
        wrap2(env_pair)))

    def line_like(o1, o2):
        return f"({o1}.paths IS NOT NULL AND {o2}.paths IS NOT NULL)"

    def both_pts(o1, o2):
        return f"({o1}.x IS NOT NULL AND {o2}.x IS NOT NULL)"

    def pts_eq(o1, o2):
        return f"({o1}.x = {o2}.x AND {o1}.y = {o2}.y)"

    stmts.append(_f(
        "ST_Intersects", "g1 STRING, g2 STRING", "BOOLEAN",
        wrap2(lambda o1, o2: f"""CASE
          WHEN {both_pts(o1, o2)} THEN {pts_eq(o1, o2)}
          WHEN {line_like(o1, o2)} THEN
            {_pair_exists(_segs(o1), _segs(o2), _INTERSECT)}
          ELSE NULL END""")))
    stmts.append(_f(
        "ST_Disjoint", "g1 STRING, g2 STRING", "BOOLEAN",
        "NOT ST_Intersects(g1, g2)"))
    stmts.append(_f(
        "ST_Crosses", "g1 STRING, g2 STRING", "BOOLEAN",
        wrap2(lambda o1, o2: f"""CASE
          WHEN {line_like(o1, o2)} THEN
            {_pair_exists(_segs(o1), _segs(o2), _PROPER)}
          ELSE NULL END""")))
    stmts.append(_f(
        "ST_Overlaps", "g1 STRING, g2 STRING", "BOOLEAN",
        wrap2(lambda o1, o2: f"""CASE
          WHEN {line_like(o1, o2)} THEN
            ({_pair_exists(_segs(o1), _segs(o2), _COLL_OVER)}
             AND NOT {_line_within(o1, o2)}
             AND NOT {_line_within(o2, o1)})
          ELSE NULL END""")))
    stmts.append(_f(
        "ST_Touches", "g1 STRING, g2 STRING", "BOOLEAN",
        wrap2(lambda o1, o2: f"""CASE
          WHEN {line_like(o1, o2)} THEN
            ({_pair_exists(_segs(o1), _segs(o2), _INTERSECT)}
             AND NOT {_pair_exists(_segs(o1), _segs(o2), _PROPER)}
             AND NOT {_pair_exists(_segs(o1), _segs(o2), _COLL_OVER)})
          ELSE NULL END""")))
    stmts.append(_f(
        "ST_Equals", "g1 STRING, g2 STRING", "BOOLEAN",
        wrap2(lambda o1, o2: f"""CASE
          WHEN {both_pts(o1, o2)} THEN {pts_eq(o1, o2)}
          WHEN {line_like(o1, o2)} THEN
            ({_line_within(o1, o2)} AND {_line_within(o2, o1)})
          ELSE NULL END""")))
    stmts.append(_f(
        "ST_OrderingEquals", "g1 STRING, g2 STRING", "BOOLEAN",
        "g1 = g2"))

    # containment -----------------------------------------------------
    def contains_body(o1: str, o2: str, proper: bool) -> str:
        ring1 = f"{o1}.rings[0]"
        ray_in = _pt_in_ring(ring1, "_w[0]", "_w[1]")
        on_bnd = (f"exists({_segs(o1)}, _s -> "
                  + _pt_on_seg("_w[0]", "_w[1]", "_s") + ")")
        # the half-open ray cast counts some boundary points as inside;
        # strict interior must exclude the boundary explicitly (the
        # battery's contains(poly, boundary(poly)) = false depends on it)
        strict_in = f"({ray_in} AND NOT {on_bnd})"
        closed_in = f"({ray_in} OR {on_bnd})"
        in2 = strict_in if proper else closed_in
        g2v = _all_coords(o2)
        some_interior = ("" if proper else
                         f" AND exists({g2v}, _w -> {strict_in})")
        empty2 = (f"(({o2}.points IS NOT NULL AND size({o2}.points) = 0) "
                  f"OR ({o2}.paths IS NOT NULL AND size({o2}.paths) = 0) "
                  f"OR ({o2}.rings IS NOT NULL AND size({o2}.rings) = 0))")
        on_line1 = (f"exists({_segs(o1)}, _s -> "
                    + _pt_on_seg("_w[0]", "_w[1]", "_s") + ")")
        is_ep1 = (f"exists({_endpoints(o1)}, "
                  f"_q -> _q[0] = _w[0] AND _q[1] = _w[1])")
        line_pts = (f"(forall({o2}.points, _w -> {on_line1}) AND "
                    f"exists({o2}.points, _w -> {on_line1} "
                    f"AND NOT {is_ep1}))")
        return f"""CASE
          WHEN {empty2} THEN false
          WHEN {both_pts(o1, o2)} THEN {pts_eq(o1, o2)}
          WHEN {o1}.x IS NOT NULL THEN false
          WHEN {line_like(o1, o2)} THEN {_line_within(o2, o1)}
          WHEN {o1}.paths IS NOT NULL AND {o2}.points IS NOT NULL THEN
            {line_pts}
          WHEN {o1}.rings IS NOT NULL AND {o2}.rings IS NOT NULL THEN
            CASE WHEN {o1}.rings = {o2}.rings THEN true ELSE
            (forall({g2v}, _w -> {in2}){some_interior}) END
          WHEN {o1}.rings IS NOT NULL AND
               ({o2}.paths IS NOT NULL OR {o2}.x IS NOT NULL) THEN
            (forall({g2v}, _w -> {in2}){some_interior})
          ELSE NULL END"""

    stmts.append(_f(
        "ST_Contains", "g1 STRING, g2 STRING", "BOOLEAN",
        wrap2(lambda o1, o2: contains_body(o1, o2, False))))
    stmts.append(_f(
        "ST_ContainsProperly", "g1 STRING, g2 STRING", "BOOLEAN",
        wrap2(lambda o1, o2: contains_body(o1, o2, True))))
    stmts.append(_f(
        "ST_Within", "g1 STRING, g2 STRING", "BOOLEAN",
        "ST_Contains(g2, g1)"))

    # --- buffer / union ---------------------------------------------
    def arc(cx: str, cy: str, c0: str, s0: str, n: int) -> str:
        """ESRI's arc vertices: 3.75°-step *incremental* clockwise
        rotation — c' = c·cosθ + s·sinθ, s' = s·cosθ − c·sinθ — NOT
        cos(kθ) directly. The recurrence's accumulated rounding is part
        of the reference's bytes (spatial.iq:762 diverges from direct
        cos(kθ) in the 14th digit at k=5); replaying the same IEEE ops
        on the same JVM reproduces it exactly."""
        rot_c = "(_ac.c * cos(pi()/48) + _ac.s * sin(pi()/48))"
        rot_s = "(_ac.s * cos(pi()/48) - _ac.c * sin(pi()/48))"
        return (f"aggregate(sequence(1, {n}), "
                f"named_struct("
                f"'p', array(array({cx} + r * {c0}, {cy} + r * {s0})), "
                f"'c', cast({c0} AS DOUBLE), 's', cast({s0} AS DOUBLE)), "
                f"(_ac, _ak) -> named_struct("
                f"'p', concat(_ac.p, array(array({cx} + r * {rot_c}, "
                f"{cy} + r * {rot_s}))), "
                f"'c', {rot_c}, 's', {rot_s}), "
                f"_ac -> _ac.p)")

    # Quarter-circle offsets [dx,dy], r-scaled CW recurrence, 24 entries
    # (angles 0…−86.25°). ESRI builds ONE quarter and mirrors it into
    # the other three quadrants with the cardinal points snapped exact —
    # the full-circle recurrence accumulates different bits and renders
    # 105 bytes longer than the reference's 3574 (spatial.iq:762).
    rot_c = "(_ac.c * cos(pi()/48) + _ac.s * sin(pi()/48))"
    rot_s = "(_ac.s * cos(pi()/48) - _ac.c * sin(pi()/48))"
    quarter = (f"aggregate(sequence(1, 23), "
               f"named_struct('p', array(array(r, 0.0D)), "
               f"'c', cast(r AS DOUBLE), 's', 0.0D), "
               f"(_ac, _ak) -> named_struct("
               f"'p', concat(_ac.p, array(array({rot_c}, {rot_s}))), "
               f"'c', {rot_c}, 's', {rot_s}), "
               f"_ac -> _ac.p)")

    def mirrored_circle(cx: str, cy: str) -> str:
        return _bind(
            quarter, lambda q: (
                f"concat("
                f"transform({q}, _o -> array({cx} + _o[0], {cy} + _o[1])), "
                f"array(array({cx}, {cy} - r)), "
                f"transform(slice({q}, 2, 23), "
                f"_o -> array({cx} + _o[1], {cy} - _o[0])), "
                f"array(array({cx} - r, {cy})), "
                f"transform(slice({q}, 2, 23), "
                f"_o -> array({cx} - _o[0], {cy} - _o[1])), "
                f"array(array({cx}, {cy} + r)), "
                f"transform(slice({q}, 2, 23), "
                f"_o -> array({cx} - _o[1], {cy} + _o[0])), "
                f"array(array({cx} + r, {cy})))"),
            var="_qq")

    def buffer_body(o: str) -> str:
        # ESRI point buffer: quadrant-mirrored 96-gon from angle 0
        # clockwise, closed on the first vertex (spatial.iq:762,
        # byte-compared including total length).
        circle = mirrored_circle(f"{o}.x", f"{o}.y")
        # ESRI line buffer (single horizontal segment, the shape the
        # reference's script exercises): stadium = left end-cap from
        # angle −90° clockwise through 180°, right end-cap from +90°,
        # closed on the first vertex. Other polylines would need the
        # real ESRI buffer — rejected loudly below.
        seg0 = f"{o}.paths[0]"
        horiz = (f"({o}.paths IS NOT NULL AND size({o}.paths) = 1 "
                 f"AND size({seg0}) = 2 AND {seg0}[0][1] = {seg0}[1][1] "
                 f"AND {seg0}[0][0] < {seg0}[1][0])")
        stadium = (
            f"concat("
            f"{arc(f'{seg0}[0][0]', f'{seg0}[0][1]', '0.0D', '-1.0D', 48)}, "
            f"{arc(f'{seg0}[1][0]', f'{seg0}[1][1]', '0.0D', '1.0D', 48)}, "
            f"array(array({seg0}[0][0], {seg0}[0][1] - r)))")
        ring = f"{o}.rings[0]"
        xs = f"transform({ring}, _bp -> _bp[0])"
        ys = f"transform({ring}, _bp -> _bp[1])"
        rect_ring = _bind(
            f"array(array_min({xs}), array_max({xs}), "
            f"array_min({ys}), array_max({ys}))",
            lambda e: (
                f"CASE WHEN size({ring}) = 5 AND forall({ring}, _bp -> "
                f"(_bp[0] = {e}[0] OR _bp[0] = {e}[1]) AND "
                f"(_bp[1] = {e}[2] OR _bp[1] = {e}[3])) THEN "
                f"array(array({e}[0] - r, {e}[2] - r), "
                f"array({e}[0] - r, {e}[3] + r), "
                f"array({e}[1] + r, {e}[3] + r), "
                f"array({e}[1] + r, {e}[2] - r), "
                f"array({e}[0] - r, {e}[2] - r)) "
                f"ELSE NULL END"),
            var="_bx")
        return f"""CASE
          WHEN {o}.x IS NOT NULL AND r > 0 THEN
            {_rings_json(f'array({circle})', 'false')}
          WHEN {horiz} AND r > 0 THEN
            {_rings_json(f'array({stadium})', 'false')}
          WHEN {o}.rings IS NOT NULL AND r < 0 THEN
            {_bind(rect_ring,
                   lambda rr: f"CASE WHEN {rr} IS NULL THEN "
                   f"raise_error('ST_Buffer: negative buffer supported "
                   f"for axis-aligned rectangles only') ELSE "
                   + _rings_json(f'array({rr})', 'false') + " END",
                   var='_br')}
          ELSE raise_error('ST_Buffer: unsupported geometry/radius combination (supported: positive point buffer, negative axis-aligned-rectangle buffer)') END"""

    stmts.append(_f(
        "ST_Buffer", "g STRING, r DOUBLE", "STRING",
        f"CASE WHEN g IS NULL OR r IS NULL THEN NULL ELSE "
        f"{_bind(og, buffer_body)} END"))

    # ST_Union: 1-arg = identity (parse already normalized rendering);
    # 2-arg over points = multipoint with exact-duplicate dedup.
    def union_body(o1: str, o2: str) -> str:
        return f"""CASE
          WHEN {both_pts(o1, o2)} THEN
            CASE WHEN {pts_eq(o1, o2)} THEN
              {_points_json(f'array(array({o1}.x, {o1}.y))', 'false')}
            ELSE
              {_points_json(f'array(array({o1}.x, {o1}.y), array({o2}.x, {o2}.y))', 'false')}
            END
          ELSE raise_error('ST_Union(g1, g2): only point arguments are supported') END"""

    stmts.append(_f(
        "ST_Union", "g1 STRING, g2 STRING DEFAULT NULL", "STRING",
        f"CASE WHEN g2 IS NULL THEN g1 WHEN g1 IS NULL THEN g2 ELSE "
        f"{_bind2(_parse('g1'), _parse('g2'), union_body)} END"))

    # ST_Difference / ST_SymDifference / ST_Intersection (+ the
    # explicitly-named ST_PolyUnion) over polygon pairs — EXCEEDS the
    # reference (spatial.iq:824-833 marks the first three
    # "Not implemented"; its ST_Union handles polygons only through the
    # ESRI engine): single-ring POLYGON args (the surface's internal
    # JSON form or raw WKT text) route to the r10 Greiner-Hormann
    # set-op tracer through the Arrow-batched st_poly_setop pandas UDF
    # (registered in register_geo_sql) and return WKT TEXT —
    # ``POLYGON EMPTY`` / ``POLYGON ((outer), (hole)...)`` /
    # ``MULTIPOLYGON``. A Python UDF cannot sit under a lazily-skipped
    # CASE branch (Spark extracts UDFs eagerly), so the kernel returns
    # NULL for unsupported inputs and coalesce routes that to a loud
    # raise_error; genuine NULL inputs short-circuit to NULL first.
    for name, op in (("ST_Difference", "difference"),
                     ("ST_SymDifference", "symmetric"),
                     ("ST_Intersection", "intersection"),
                     ("ST_PolyUnion", "union")):
        stmts.append(_f(
            name, "g1 STRING, g2 STRING", "STRING",
            f"CASE WHEN g1 IS NULL OR g2 IS NULL THEN NULL "
            f"ELSE coalesce(st_poly_setop(g1, g2, '{op}'), "
            f"raise_error('{name}: only single-ring polygon arguments "
            f"are supported')) END"))

    return stmts
