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
