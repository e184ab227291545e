"""Geometric invariants for the convex-polygon curve buffer
(functions/geo.py st_buffer_ring_arr) — the cross-engine byte identity
is proven by the func_geo_buffer_poly oracle row; these pin that the
SHAPE is the Minkowski sum it claims to be."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from drill_calcite_spark.functions.geo import (
    sql_buffer_ring_arr,
    st_area_ring_arr,
    st_buffer_ring_arr,
    st_contains_ring_arr,
    st_perimeter_ring_arr,
)

_RING = [(10.0, 10.0), (20.0, 10.0), (23.0, 18.0), (12.0, 21.0)]
_R = 5.0
_K = 3


def _ring_df(spark, pts):
    arr = ", ".join(f"struct({x}D AS x, {y}D AS y)" for x, y in pts)
    return spark.sql(f"SELECT array({arr}) AS ring")


def _closed_form(pts, r, m):
    n = len(pts)
    area = abs(sum(pts[i][0] * pts[(i + 1) % n][1]
                   - pts[(i + 1) % n][0] * pts[i][1]
                   for i in range(n))) / 2
    perim = sum(math.dist(pts[i], pts[(i + 1) % n]) for i in range(n))
    sector = 0.0
    for i in range(n):
        e1 = (pts[i][0] - pts[i - 1][0], pts[i][1] - pts[i - 1][1])
        e2 = (pts[(i + 1) % n][0] - pts[i][0],
              pts[(i + 1) % n][1] - pts[i][1])
        ang = abs(math.atan2(e1[0] * e2[1] - e1[1] * e2[0],
                             e1[0] * e2[0] + e1[1] * e2[1]))
        sector += m * 0.5 * r * r * math.sin(ang / m)
    return area, perim, sector


def test_buffer_area_matches_minkowski_closed_form(spark):
    """area(buffer) = A + P*r + tessellated join sectors, exactly (up to
    float accumulation): the defining identity of the convex Minkowski
    sum with an m-chord disk."""
    df = _ring_df(spark, _RING)
    got = df.select(
        st_area_ring_arr(st_buffer_ring_arr(F.col("ring"), _R, _K))
        .alias("a")).collect()[0].a
    area, perim, sector = _closed_form(_RING, _R, 2 ** _K)
    assert got == pytest.approx(area + perim * _R + sector, rel=1e-12)
    # and strictly inside the true-circle bound
    assert area + perim * _R < got < area + perim * _R + math.pi * _R * _R


def test_buffer_contains_original_vertices_excludes_far_points(spark):
    df = _ring_df(spark, _RING)
    buf = st_buffer_ring_arr(F.col("ring"), _R, _K)
    checks = df.select(
        *[st_contains_ring_arr(buf, F.lit(x), F.lit(y))
          .alias(f"in_{i}") for i, (x, y) in enumerate(_RING)],
        st_contains_ring_arr(buf, F.lit(10.0 - _R - 1.0), F.lit(10.0))
        .alias("far"),
    ).collect()[0]
    assert all(checks[f"in_{i}"] for i in range(len(_RING)))
    assert not checks["far"]


def test_buffer_orientation_invariant(spark):
    """A CW input ring buffers to the same point SET as its CCW
    reversal (the sigma normalization) — up to float rounding: the CW
    pass rotates each arc from the opposite end, so matching points
    differ by ulps, never by geometry."""
    df = _ring_df(spark, _RING)
    df_cw = _ring_df(spark, list(reversed(_RING)))
    a = [(p.x, p.y) for p in df.select(
        st_buffer_ring_arr(F.col("ring"), _R, _K).alias("b"))
        .collect()[0].b]
    b = [(p.x, p.y) for p in df_cw.select(
        st_buffer_ring_arr(F.col("ring"), _R, _K).alias("b"))
        .collect()[0].b]
    assert len(a) == len(b)
    for px, py in a:
        assert any(math.isclose(px, qx, abs_tol=1e-9)
                   and math.isclose(py, qy, abs_tol=1e-9)
                   for qx, qy in b), f"({px}, {py}) has no CW twin"


def test_buffer_bit_identical_across_engines(spark):
    """The trig-free recurrence must produce the same 64-bit doubles on
    the JVM and in DuckDB — the property the oracle hash relies on."""
    df = _ring_df(spark, _RING)
    spk = [(p.x, p.y) for p in df.select(
        st_buffer_ring_arr(F.col("ring"), _R, _K).alias("b"))
        .collect()[0].b]
    ring_sql = "[" + ", ".join(
        f"struct_pack(x := {x}, y := {y})" for x, y in _RING) + "]"
    drow = duckdb.connect().execute(
        f"SELECT {sql_buffer_ring_arr(ring_sql, str(_R), _K)} AS b"
    ).fetchone()[0]
    dck = [(p["x"], p["y"]) for p in drow]
    assert len(spk) == len(dck) == len(_RING) * (2 ** _K + 1)
    assert spk == dck


def test_buffer_perimeter_approaches_true_value(spark):
    """Perimeter = P + tessellated arc length; the chord sum is below
    2*pi*r but within the m-gon bound."""
    df = _ring_df(spark, _RING)
    got = df.select(
        st_perimeter_ring_arr(st_buffer_ring_arr(F.col("ring"), _R, _K))
        .alias("p")).collect()[0].p
    _, perim, _ = _closed_form(_RING, _R, 2 ** _K)
    m = 2 ** _K
    # arc chords: per vertex, m chords of 2*r*sin(ang/2m) summed = full
    # turn worth of exterior angles (2*pi total for a convex polygon)
    assert perim + 2 * math.pi * _R * 0.97 < got < perim + 2 * math.pi * _R


def test_bind1_value_and_null_semantics(spark):
    """r15 `_bind1` (the binder-level evaluation shape of
    st_buffer_ring_arr): transform(array(v), f)[1] must equal f(v)
    exactly, including NULL propagation through the binder."""
    from pyspark.sql import functions as F

    from drill_calcite_spark.functions.geo import _bind1

    df = spark.createDataFrame([(2.0,), (None,)], "x double")
    out = df.select(
        _bind1(F.col("x") * 3.0, lambda v: v + 1.0).alias("bound"),
        (F.col("x") * 3.0 + 1.0).alias("inline"),
    ).collect()
    for r in out:
        assert r.bound == r.inline
