"""Unit goldens for the Greiner-Hormann ring clipper (operators/polyclip.py).

Hand-computed expected rings; reference parity target is the ESRI-delegated
ST_Intersection ring output (GeoFunctions.java:491-497). Includes the pre-r9
crash repro: a start-node ordering where the lexicographically smallest
crossing is an EXIT node (the old tracer raised ValueError on ~half of valid
inputs; entry-only trace starts fix it).
"""

from __future__ import annotations

from fractions import Fraction

import pytest

from drill_calcite_spark.operators.polyclip import (
    clip_polygon_rings, rings_area, round_half_away_6dp,
)


def _pts(ring):
    return [(float(x), float(y)) for x, y in ring]


def test_axis_rect_overlap_smallest_crossing_is_exit():
    # the ADVICE repro: subject (0,0)-(4,4), clip (-2,2)-(2,6);
    # crossings are (0,2) and (2,4); tracing must start from the ENTRY
    # even though (0,2) sorts first.
    rings = clip_polygon_rings(
        [(0, 0), (4, 0), (4, 4), (0, 4)],
        [(-2, 2), (2, 2), (2, 6), (-2, 6)])
    assert [_pts(r) for r in rings] == [
        [(0.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0)]]


def test_axis_rect_overlap_mirrored():
    # the mirrored placement (this one already worked pre-fix)
    rings = clip_polygon_rings(
        [(0, 0), (4, 0), (4, 4), (0, 4)],
        [(2, 2), (6, 2), (6, 6), (2, 6)])
    assert [_pts(r) for r in rings] == [
        [(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0)]]


def test_orientation_invariance():
    cw = clip_polygon_rings(
        [(0, 4), (4, 4), (4, 0), (0, 0)],       # subject CW
        [(-2, 6), (2, 6), (2, 2), (-2, 2)])      # clip CW
    ccw = clip_polygon_rings(
        [(0, 0), (4, 0), (4, 4), (0, 4)],
        [(-2, 2), (2, 2), (2, 6), (-2, 6)])
    assert cw == ccw


def test_containment_both_ways_and_disjoint():
    big = [(0, 0), (10, 0), (10, 10), (0, 10)]
    small = [(2, 2), (5, 2), (5, 5), (2, 5)]
    far = [(20, 20), (22, 20), (22, 22), (20, 22)]
    assert [_pts(r) for r in clip_polygon_rings(small, big)] == [
        [(2.0, 2.0), (5.0, 2.0), (5.0, 5.0), (2.0, 5.0)]]
    assert [_pts(r) for r in clip_polygon_rings(big, small)] == [
        [(2.0, 2.0), (5.0, 2.0), (5.0, 5.0), (2.0, 5.0)]]
    assert clip_polygon_rings(big, far) == []


def test_u_shape_times_bar_two_rings():
    # U-shape arms sliced by a horizontal bar -> TWO disjoint rings
    u = [(0, 0), (5, 0), (5, 4), (4, 4), (4, 1), (1, 1), (1, 4), (0, 4)]
    bar = [(-1, 2.5), (6, 2.5), (6, 3.5), (-1, 3.5)]
    rings = clip_polygon_rings(u, bar)
    assert [_pts(r) for r in rings] == [
        [(0.0, 2.5), (1.0, 2.5), (1.0, 3.5), (0.0, 3.5)],
        [(4.0, 2.5), (5.0, 2.5), (5.0, 3.5), (4.0, 3.5)],
    ]
    assert rings_area(rings) == 2


def test_concave_dart_times_l_shape():
    # dart (square with top notch pushed down to y=1) x L-shape corner;
    # expected ring traced by hand: the dart sits in [2,6]x[-1,3], the L
    # occupies [0,10]x[0,4] except [4,10]x... use the battery's L:
    l_shape = [(0, 0), (10, 0), (10, 4), (4, 4), (4, 10), (0, 10)]
    dart = [(2, -1), (6, -1), (6, 3), (4, 1), (2, 3)]
    rings = clip_polygon_rings(dart, l_shape)
    # inside the L (y >= 0, everything here has x <= 10, the notch arm
    # x >= 4 only reaches y <= 3 < 4): the dart clipped to y >= 0 —
    # bottom edge enters at (2,0)-(6,0)
    assert len(rings) == 1
    got = _pts(rings[0])
    assert got == [(2.0, 0.0), (6.0, 0.0), (6.0, 3.0), (4.0, 1.0), (2.0, 3.0)]
    # area: dart above y=0: full dart area minus strip below y=0
    # dart area = 4x4 square minus notch triangle (base 4, height 2) = 12
    # strip below y=0: 4 wide x 1 tall = 4  ->  8
    assert rings_area(rings) == 8


def test_diagonal_crossing_exact_fractions():
    # triangle x square with non-dyadic crossing parameters stays EXACT
    tri = [(0, 0), (9, 3), (0, 6)]
    sq = [(3, -1), (7, -1), (7, 7), (3, 7)]
    rings = clip_polygon_rings(tri, sq)
    assert len(rings) == 1
    area = rings_area(rings)
    assert isinstance(area, Fraction)
    # clip of the triangle to 3 <= x <= 7: integrate width of the
    # triangle (between y = x/3 and y = 6 - x/3): h(x) = 6 - 2x/3;
    # integral from 3 to 7 = 6*4 - (49-9)/3 = 24 - 40/3 = 32/3
    assert area == Fraction(32, 3)


def test_general_position_violations_raise():
    sq = [(0, 0), (4, 0), (4, 4), (0, 4)]
    with pytest.raises(ValueError):
        # shared (collinear, overlapping) edge
        clip_polygon_rings(sq, [(4, 0), (8, 0), (8, 4), (4, 4)])
    with pytest.raises(ValueError):
        # clip vertex ON a subject edge with a proper crossing elsewhere
        clip_polygon_rings(sq, [(2, 4), (6, 2), (6, 6), (2, 6)])


def test_round_half_away_6dp():
    assert round_half_away_6dp(Fraction(1, 2) * Fraction(1, 500000)) == 1e-6
    assert round_half_away_6dp(Fraction(1, 2000000)) == 1e-6  # exact half up
    assert round_half_away_6dp(-Fraction(1, 2000000)) == -1e-6
    assert round_half_away_6dp(Fraction(0)) == 0.0
    assert round_half_away_6dp(Fraction(32, 3)) == 10.666667


# ------------------------------------------------- set-op rings (round 10)
# polygon_setop_rings extends the clipper to UNION / DIFFERENCE /
# SYMMETRIC DIFFERENCE (the reference hands all four ops to the ESRI
# GeometryEngine, GeoFunctions.java:491-497). Orientation polarity is
# the encoding: CCW = outer boundary, CW = hole.

from drill_calcite_spark.operators.polyclip import polygon_setop_rings


def _signed(ring):
    s = 0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
        s += x1 * y2 - x2 * y1
    return s


_SQ_A = [(0, 0), (2, 0), (2, 2), (0, 2)]
_SQ_B = [(1, 1), (3, 1), (3, 3), (1, 3)]


def test_setop_two_squares_union():
    rings = polygon_setop_rings(_SQ_A, _SQ_B, "union")
    assert [_pts(r) for r in rings] == [
        [(0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (3.0, 1.0), (3.0, 3.0),
         (1.0, 3.0), (1.0, 2.0), (0.0, 2.0)]]
    assert rings_area(rings) == 7  # 4 + 4 - 1


def test_setop_two_squares_difference():
    rings = polygon_setop_rings(_SQ_A, _SQ_B, "difference")
    assert [_pts(r) for r in rings] == [
        [(0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0), (1.0, 2.0),
         (0.0, 2.0)]]
    assert rings_area(rings) == 3  # 4 - 1


def test_setop_two_squares_symmetric():
    # two hexagons sharing only the crossing POINTS (2,1) and (1,2)
    rings = polygon_setop_rings(_SQ_A, _SQ_B, "symmetric")
    assert [_pts(r) for r in rings] == [
        [(0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0), (1.0, 2.0),
         (0.0, 2.0)],
        [(1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (3.0, 1.0), (3.0, 3.0),
         (1.0, 3.0)]]
    assert rings_area(rings) == 6  # 4 + 4 - 2*1


# A U-shape capped by a bar: the intersection is DISCONNECTED (two
# squares), so the union has a HOLE — the polarity case the r9
# intersection-only clipper could never produce.
_U = [(0, 0), (3, 0), (3, 3), (2, 3), (2, 1), (1, 1), (1, 3), (0, 3)]
_BAR = [(Fraction(-1, 2), Fraction(3, 2)), (Fraction(7, 2), Fraction(3, 2)),
        (Fraction(7, 2), Fraction(5, 2)), (Fraction(-1, 2), Fraction(5, 2))]


def test_setop_u_bar_intersection_two_rings():
    rings = polygon_setop_rings(_U, _BAR, "intersection")
    assert [_pts(r) for r in rings] == [
        [(0.0, 1.5), (1.0, 1.5), (1.0, 2.5), (0.0, 2.5)],
        [(2.0, 1.5), (3.0, 1.5), (3.0, 2.5), (2.0, 2.5)]]
    assert rings_area(rings) == 2


def test_setop_u_bar_union_has_cw_hole():
    rings = polygon_setop_rings(_U, _BAR, "union")
    assert len(rings) == 2
    outer = [r for r in rings if _signed(r) > 0]
    holes = [r for r in rings if _signed(r) < 0]
    assert len(outer) == 1 and len(holes) == 1
    # the hole: the notch region walled in below the bar, traced CW
    assert _pts(holes[0]) == [
        (1.0, 1.0), (1.0, 1.5), (2.0, 1.5), (2.0, 1.0)]
    assert len(outer[0]) == 16
    # signed total = |U| + |bar| - |intersection| = 7 + 4 - 2
    assert rings_area(rings) == 9


def test_setop_u_bar_difference_three_rings():
    rings = polygon_setop_rings(_U, _BAR, "difference")
    assert [_pts(r) for r in rings] == [
        [(0.0, 0.0), (3.0, 0.0), (3.0, 1.5), (2.0, 1.5), (2.0, 1.0),
         (1.0, 1.0), (1.0, 1.5), (0.0, 1.5)],
        [(0.0, 2.5), (1.0, 2.5), (1.0, 3.0), (0.0, 3.0)],
        [(2.0, 2.5), (3.0, 2.5), (3.0, 3.0), (2.0, 3.0)]]
    assert rings_area(rings) == 5  # 7 - 2


def test_setop_u_bar_symmetric_six_rings():
    rings = polygon_setop_rings(_U, _BAR, "symmetric")
    assert len(rings) == 6
    assert all(_signed(r) > 0 for r in rings)  # disjoint pieces, no holes
    assert rings_area(rings) == 7  # 7 + 4 - 2*2


def test_setop_containment_and_disjoint_tables():
    big = [(0, 0), (4, 0), (4, 4), (0, 4)]
    small = [(1, 1), (2, 1), (2, 2), (1, 2)]
    far = [(10, 10), (11, 10), (11, 11), (10, 11)]
    # small inside big: difference/symmetric carry small as a CW hole
    assert polygon_setop_rings(big, small, "intersection") == \
        polygon_setop_rings(small, big, "intersection")
    d = polygon_setop_rings(big, small, "difference")
    assert len(d) == 2 and _signed(d[0]) > 0 and _signed(d[1]) < 0
    assert rings_area(d) == 15
    assert polygon_setop_rings(small, big, "difference") == []
    s = polygon_setop_rings(big, small, "symmetric")
    assert rings_area(s) == 15 and len(s) == 2
    u = polygon_setop_rings(big, small, "union")
    assert [_pts(r) for r in u] == [
        [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]]
    # disjoint
    assert polygon_setop_rings(big, far, "intersection") == []
    assert rings_area(polygon_setop_rings(big, far, "union")) == 17
    assert rings_area(polygon_setop_rings(big, far, "difference")) == 16
    assert len(polygon_setop_rings(big, far, "symmetric")) == 2


def test_setop_inclusion_exclusion_exact_on_concave_pair():
    # dart x L-shape (concave x concave) — the driver battery's shapes;
    # all four ops tie to the EXACT inclusion-exclusion identities
    dart = [(0, 0), (4, 0), (4, 3), (2, Fraction(7, 4)), (0, 3)]
    ell = [(Fraction(1, 8), Fraction(1, 16)),
           (Fraction(41, 8), Fraction(1, 16)),
           (Fraction(41, 8), Fraction(17, 16)),
           (Fraction(17, 8), Fraction(17, 16)),
           (Fraction(17, 8), Fraction(33, 16)),
           (Fraction(1, 8), Fraction(33, 16))]
    a_d = rings_area([[(Fraction(x), Fraction(y)) for x, y in dart]])
    a_l = rings_area([[(Fraction(x), Fraction(y)) for x, y in ell]])
    i = rings_area(polygon_setop_rings(dart, ell, "intersection"))
    assert rings_area(polygon_setop_rings(dart, ell, "union")) \
        == a_d + a_l - i
    assert rings_area(polygon_setop_rings(dart, ell, "difference")) \
        == a_d - i
    assert rings_area(polygon_setop_rings(dart, ell, "symmetric")) \
        == a_d + a_l - 2 * i


def test_setop_unknown_op_raises():
    with pytest.raises(ValueError):
        polygon_setop_rings(_SQ_A, _SQ_B, "xor")


# ------------------------------------- property fuzzer (late round 10)
# Random simple (radial star) polygon pairs; every accepted sample must
# satisfy the EXACT inclusion-exclusion identities across all four set
# ops, and every non-hole ring must come out CCW with no repeated
# vertex. Samples violating the general-position precondition raise
# ValueError by contract and are skipped (the eps offset makes them
# rare); the lane asserts most samples are accepted so the identities
# are actually exercised.

def _star(rng, k, eps_x=Fraction(0), eps_y=Fraction(0), dx=0, dy=0):
    import math

    angles = sorted(rng.uniform(0, 2 * math.pi) for _ in range(k))
    pts = []
    for a in angles:
        r = rng.uniform(1, 8)
        # snap to the 2^-5 grid, then apply the (irrational-free) offset
        x = Fraction(round(r * math.cos(a) * 32), 32) + eps_x + dx
        y = Fraction(round(r * math.sin(a) * 32), 32) + eps_y + dy
        pts.append((x, y))
    # dedupe consecutive snapped duplicates
    out = [p for i, p in enumerate(pts) if p != pts[(i - 1) % len(pts)]]
    return out


def test_setop_property_fuzzer_inclusion_exclusion():
    import random

    from drill_calcite_spark.operators.polyclip import (
        _area2, polygon_setop_rings)

    rng = random.Random(20261015)
    accepted = tried = 0
    while tried < 60:
        tried += 1
        try:
            a = _star(rng, rng.randint(5, 9))
            c = _star(rng, rng.randint(5, 9),
                      eps_x=Fraction(1, 1 << 20), eps_y=Fraction(1, 1 << 21),
                      dx=rng.randint(-3, 3), dy=rng.randint(-3, 3))
            if len(a) < 3 or len(c) < 3:
                continue
            area_a = abs(_area2([(Fraction(x), Fraction(y))
                                 for x, y in a])) / 2
            area_c = abs(_area2([(Fraction(x), Fraction(y))
                                 for x, y in c])) / 2
            i = rings_area(polygon_setop_rings(a, c, "intersection"))
            u = rings_area(polygon_setop_rings(a, c, "union"))
            d = rings_area(polygon_setop_rings(a, c, "difference"))
            s = rings_area(polygon_setop_rings(a, c, "symmetric"))
        except ValueError:
            continue  # general-position rejection — loud, never wrong
        accepted += 1
        assert u == area_a + area_c - i, (a, c)
        assert d == area_a - i, (a, c)
        assert s == area_a + area_c - 2 * i, (a, c)
        assert Fraction(0) <= i <= min(area_a, area_c)
        for op in ("intersection", "difference"):
            for ring in polygon_setop_rings(a, c, op):
                assert _signed(ring) > 0, f"non-CCW {op} ring"
                assert len(set(ring)) == len(ring), "repeated vertex"
    assert accepted >= tried * 3 // 5, (accepted, tried)
