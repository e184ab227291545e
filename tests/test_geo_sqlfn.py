"""Ground-truth unit tests for the SQL-callable spatial surface
(drill_calcite_spark/functions/geo_sqlfn.py) — the edge and error paths
the quidem corpus (tests/iq/calcite_spatial.iq) does not pin:
NULL propagation, the loud-failure contract for unsupported
buffer/union shapes, SRID bookkeeping round trips, and the ring
machinery invariants (closure, orientation, single-vertex rings).
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def geo(spark):
    from drill_calcite_spark.functions.geo_sqlfn import register_geo_sql

    register_geo_sql(spark)
    yield spark


def _one(spark, expr: str):
    return spark.sql(f"SELECT {expr}").collect()[0][0]


def test_null_propagation(geo):
    for expr in (
        "ST_GeomFromText(CAST(NULL AS STRING))",
        "ST_AsText(CAST(NULL AS STRING))",
        "ST_X(CAST(NULL AS STRING))",
        "ST_Boundary(CAST(NULL AS STRING))",
        "ST_Envelope(CAST(NULL AS STRING))",
        "ST_Distance(NULL, ST_Point(1.0D, 1.0D))",
        "ST_Contains(ST_Point(1.0D, 1.0D), NULL)",
        "ST_Point(1.0D, CAST(NULL AS DOUBLE))",
        "ST_Buffer(CAST(NULL AS STRING), 5.0D)",
    ):
        assert _one(geo, expr) is None, expr


def test_unsupported_wkt_kind_is_null(geo):
    # GeoFunctions returns null for GEOMETRYCOLLECTION (spatial.iq:143)
    assert _one(geo, "ST_GeomFromText('GEOMETRYCOLLECTION EMPTY')") is None
    assert _one(geo, "ST_GeomFromText('CIRCULARSTRING(0 0, 1 1, 2 0)')") \
        is None


def test_buffer_unsupported_shapes_fail_loudly(geo):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    # positive polygon buffer needs the real ESRI curve buffer
    with pytest.raises(SparkRuntimeException, match="ST_Buffer"):
        geo.sql("SELECT ST_Buffer(ST_GeomFromText("
                "'POLYGON((0 0, 0 1, 1 1, 0 0))'), 2.0D)").collect()
    # negative buffer only supports axis-aligned rectangles
    with pytest.raises(SparkRuntimeException, match="axis-aligned"):
        geo.sql("SELECT ST_Buffer(ST_GeomFromText("
                "'POLYGON((0 0, 0 4, 4 4, 1 0, 0 0))'), -1.0D)").collect()


def test_union_non_points_fail_loudly(geo):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises(SparkRuntimeException, match="ST_Union"):
        geo.sql("SELECT ST_Union(ST_GeomFromText('LINESTRING(0 0, 1 1)'),"
                " ST_Point(1.0D, 1.0D))").collect()


def test_srid_round_trip(geo):
    g = "ST_GeomFromText('POINT(1 2)', 4326)"
    assert _one(geo, f"ST_SRID2({g})") == 4326
    assert _one(geo, "ST_SRID2(ST_Point(1.0D, 2.0D))") == 0
    # ST_Transform replaces an existing spatialReference, not appends
    assert _one(geo, f"ST_Transform({g}, 4269)") == \
        '{"x":1,"y":2,"spatialReference":{"wkid":4269}}'
    # and AsText ignores the SRID block entirely
    assert _one(geo, f"ST_AsText({g})") == "POINT (1 2)"


def test_ring_machinery_invariants(geo):
    # unclosed ring closes; CCW exterior flips CW in the internal JSON
    assert _one(geo, "ST_GeomFromText('POLYGON((0 0, 2 0, 2 2, 0 2))')") \
        == '{"rings":[[[0,0],[0,2],[2,2],[2,0],[0,0]]]}'
    # CW exterior is preserved
    assert _one(geo, "ST_GeomFromText('POLYGON((0 0, 0 2, 2 2, 2 0))')") \
        == '{"rings":[[[0,0],[0,2],[2,2],[2,0],[0,0]]]}'
    # hole (second ring) is forced CCW
    assert _one(geo, "ST_GeomFromText("
                "'POLYGON((0 0, 0 4, 4 4, 4 0), (1 1, 1 2, 2 2, 2 1))')") \
        == ('{"rings":[[[0,0],[0,4],[4,4],[4,0],[0,0]],'
            '[[1,1],[2,1],[2,2],[1,2],[1,1]]]}')


def test_makeline_three_points_and_distance_to_vertex(geo):
    line = "ST_MakeLine(ST_Point(0.0D,0.0D), ST_Point(3.0D,0.0D), " \
           "ST_Point(3.0D,4.0D))"
    assert _one(geo, line) == '{"paths":[[[0,0],[3,0],[3,4]]]}'
    # distance from a point to the polyline: perpendicular to segment 1
    assert _one(geo, f"ST_Distance(ST_Point(1.0D, 2.0D), {line})") == 2.0
    # beyond the last vertex: clamped to the endpoint
    assert _one(geo, f"ST_Distance(ST_Point(3.0D, 9.0D), {line})") == 5.0


def test_relation_predicates_unsupported_pair_is_null(geo):
    # polygon × polygon crosses: outside the implemented pair matrix —
    # NULL, never a silently wrong answer
    assert _one(geo, "ST_Crosses(ST_GeomFromText('POLYGON((0 0,1 0,1 1))'),"
                " ST_GeomFromText('POLYGON((0 0,2 0,2 2))'))") is None


def test_touches_endpoint_contact(geo):
    # T-contact: endpoint of one line in the interior of the other
    assert _one(geo, "ST_Touches(ST_GeomFromText('LINESTRING(0 0, 2 0)'),"
                " ST_GeomFromText('LINESTRING(1 0, 1 5)'))") is True
    assert _one(geo, "ST_Crosses(ST_GeomFromText('LINESTRING(0 0, 2 0)'),"
                " ST_GeomFromText('LINESTRING(1 -1, 1 5)'))") is True
    assert _one(geo, "ST_Overlaps(ST_GeomFromText('LINESTRING(0 0, 3 0)'),"
                " ST_GeomFromText('LINESTRING(1 0, 5 0)'))") is True


# ------------------------------------------- polygon set ops (round 10)
# ST_Difference / ST_SymDifference / ST_Intersection are
# "Not implemented" in the reference (spatial.iq:824-833) and its
# ST_Union handles polygons only through the ESRI engine — these
# EXCEED the reference: single-ring POLYGON args (internal JSON or raw
# WKT text) run the Greiner-Hormann set-op tracer and return WKT text.

_SQ_A = "ST_GeomFromText('POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))')"
_SQ_B = "ST_GeomFromText('POLYGON((1 1, 3 1, 3 3, 1 3, 1 1))')"


def test_setop_sql_two_squares(geo):
    assert _one(geo, f"ST_Intersection({_SQ_A}, {_SQ_B})") == \
        "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"
    assert _one(geo, f"ST_PolyUnion({_SQ_A}, {_SQ_B})") == \
        "POLYGON ((0 0, 2 0, 2 1, 3 1, 3 3, 1 3, 1 2, 0 2, 0 0))"
    assert _one(geo, f"ST_Difference({_SQ_A}, {_SQ_B})") == \
        "POLYGON ((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0))"
    assert _one(geo, f"ST_SymDifference({_SQ_A}, {_SQ_B})") == (
        "MULTIPOLYGON (((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0)), "
        "((1 2, 2 2, 2 1, 3 1, 3 3, 1 3, 1 2)))")


def test_setop_sql_raw_wkt_args_and_empty(geo):
    # raw WKT text args work too; disjoint intersection renders EMPTY
    a = "'POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'"
    far = "'POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))'"
    assert _one(geo, f"ST_Intersection({a}, {far})") == "POLYGON EMPTY"
    assert _one(geo, f"ST_PolyUnion({a}, {far})") == (
        "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
        "((10 10, 11 10, 11 11, 10 11, 10 10)))")


def test_setop_sql_union_hole(geo):
    # U-shape capped by a bar: the union's hole renders as the inner
    # ring of ONE polygon (CW, per the tracer's polarity)
    u = ("ST_GeomFromText('POLYGON((0 0, 3 0, 3 3, 2 3, 2 1, 1 1, "
         "1 3, 0 3, 0 0))')")
    bar = ("ST_GeomFromText('POLYGON((-0.5 1.5, 3.5 1.5, 3.5 2.5, "
           "-0.5 2.5, -0.5 1.5))')")
    out = _one(geo, f"ST_PolyUnion({u}, {bar})")
    assert out.startswith("POLYGON ((-0.5 1.5, 0 1.5, 0 0, 3 0, ")
    assert out.endswith(", (1 1, 1 1.5, 2 1.5, 2 1, 1 1))")


def test_setop_sql_nulls_and_misuse(geo):
    import pytest

    assert _one(geo, "ST_Intersection(CAST(NULL AS STRING), "
                "'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')") is None
    with pytest.raises(Exception, match="single-ring polygon"):
        _one(geo, "ST_Difference(ST_GeomFromText('POINT(1 2)'), "
             "'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')")
    # point ST_Union is untouched by the polygon routing
    assert _one(geo, "ST_AsText(ST_Union(ST_GeomFromText('POINT(1 2)'),"
                " ST_GeomFromText('POINT(-2 3)')))") == \
        "MULTIPOINT ((1 2), (-2 3))"
