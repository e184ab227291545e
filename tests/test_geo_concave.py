"""Concave x concave set-op areas (functions/geo.py signed fan
decomposition): hand-computed intersection areas, the degenerate-notch
sign path, inclusion-exclusion consistency on the battery itself, and
the map-only plan shape. The cross-engine bit-identity is proven by the
func_geo_concave oracle row (test_oracle_parity / the driver hash)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

# the battery's clipper: L-shape, reflex at (4, 4), area 64
from drill_calcite_spark.queries.funcs import _CONCAVE_L, _CONCAVE_ORIGIN
from drill_calcite_spark.functions.geo import (
    fan_triangles,
    st_concave_intersection_area,
)


def _inter(spark, rows, verts_fn):
    """rows: list of param tuples -> intersection areas vs _CONCAVE_L."""
    df = spark.createDataFrame(rows, "id int, x double, y double, s double")
    verts = verts_fn(F.col("x"), F.col("y"), F.col("s"))
    out = (
        df.select(
            "id",
            st_concave_intersection_area(
                verts, _CONCAVE_L, origin=_CONCAVE_ORIGIN).alias("ia"))
        .orderBy("id").collect()
    )
    return [r.ia for r in out]


def test_fan_triangles_mixed_signs_and_area():
    tris, area = fan_triangles(_CONCAVE_L, _CONCAVE_ORIGIN)
    assert area == 64.0
    assert [s for _, s in tris] == [1.0, -1.0, 1.0, 1.0]
    # the signed triangle areas recombine to the polygon area
    def tri_area(t):
        (x1, y1), (x2, y2), (x3, y3) = t
        return abs((x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)) / 2.0
    assert sum(s * tri_area(t) for t, s in tris) == pytest.approx(64.0)


def test_fan_triangles_rejects_degenerate():
    with pytest.raises(ValueError):
        fan_triangles([(0.0, 0.0), (1.0, 0.0)])


def test_square_subject_hand_computed(spark):
    """Axis-aligned squares vs the L: inside, notch-straddling, outside,
    corner-quarter, and one covering the whole notch."""

    def sq(x, y, s):
        return [(x, y), (x + s, y), (x + s, y + s), (x, y + s)]

    areas = _inter(
        spark,
        [(1, 0.0, 0.0, 2.0),    # fully inside -> 4
         (2, 3.0, 3.0, 2.0),    # [3,5]^2 minus notch [4,5]^2 -> 3
         (3, 20.0, 20.0, 2.0),  # disjoint -> 0
         (4, -1.0, -1.0, 2.0),  # quarter overlap -> 1
         (5, 3.0, 3.0, 8.0)],   # [3,11]^2: 1x7 arm + 6x1 arm -> 13
        sq)
    assert areas == [4.0, 3.0, 0.0, 1.0, 13.0]


def test_concave_chevron_subject(spark):
    """Reflex chevron (area 6 at s=1): fully inside -> 6; translated so
    its tip pokes through the notch boundary -> strictly less."""

    def chev(x, y, s):
        return [(x, y), (x + 4 * s, y + 2 * s), (x, y + 4 * s),
                (x + s, y + 2 * s)]

    full, clipped = _inter(
        spark, [(1, 0.0, 0.0, 1.0), (2, 2.0, 2.5, 1.0)], chev)
    assert full == 6.0
    assert 0.0 < clipped < 6.0


def test_degenerate_notch_sign_drops(spark):
    """Dart whose notch vertex sits EXACTLY on the fan diagonal (the
    battery's 0.5 fraction): the middle fan triangle is degenerate,
    signum = 0 removes it, and the result equals the intersection of
    the two remaining signed triangles — here the dart is fully inside,
    so the area is the exact shoelace area of the dart."""

    def dart(x, y, s):
        # (0,0),(2s,0),(2s,2s),(s,s),(0,2s): notch ON the diagonal
        return [(x, y), (x + 2 * s, y), (x + 2 * s, y + 2 * s),
                (x + s, y + s), (x, y + 2 * s)]

    areas = _inter(spark, [(1, 0.0, 0.0, 1.0)], dart)
    # shoelace: 4 - 1 (notch triangles cancel to half the square) = 3
    assert areas == [3.0]


def test_battery_inclusion_exclusion(spark):
    """On the real battery output: 0 <= inter <= subject area, union =
    a + 64 - inter >= 63.999..., diff = a - inter >= 0, and symdiff
    consistency for the chevron columns."""
    from drill_calcite_spark.queries.funcs import func_geo_concave

    rows = func_geo_concave(spark, SF_DIR).collect()
    assert len(rows) == 3000
    saw_partial = 0
    for r in rows:
        assert -1e-9 <= r.dart_inter <= r.dart_area + 1e-9
        assert abs((r.dart_area - r.dart_inter) - r.dart_diff) < 1e-6
        assert abs((r.dart_area + 64.0 - r.dart_inter) - r.dart_union) < 1e-6
        assert r.chev_symdiff >= -1e-9
        if 1e-6 < r.dart_inter < r.dart_area - 1e-6:
            saw_partial += 1
    # the placement grid must actually exercise straddling subjects
    assert saw_partial > 100


def test_battery_map_only(spark):
    """The whole battery is column algebra: no Exchange, no Python."""
    from drill_calcite_spark.queries.funcs import func_geo_concave

    plan = (func_geo_concave(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, f"concave battery shuffles: {plan[:400]}"
    assert "Python" not in plan
