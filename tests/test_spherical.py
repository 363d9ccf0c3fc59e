"""Spherical polygon algebra golden values (unit sphere)."""

import math

import pytest

from pyresample_spark.geometry import AreaDefinition
from pyresample_spark.operators.spherical import (
    arcs_intersect,
    overlap_rate,
    point_in_spherical_polygon,
    polygons_overlap,
    spherical_polygon_area,
)

OCTANT = [(0.0, 0.0), (90.0, 0.0), (0.0, 90.0)]


def test_octant_area():
    # one eighth of the sphere = 4π/8 = π/2
    assert spherical_polygon_area(OCTANT) == pytest.approx(math.pi / 2, rel=1e-9)


def test_small_square_area_matches_planar():
    sq = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    planar = math.radians(1.0) ** 2
    assert spherical_polygon_area(sq) == pytest.approx(planar, rel=1e-3)


def test_point_containment():
    assert point_in_spherical_polygon(30.0, 30.0, OCTANT)
    assert not point_in_spherical_polygon(-30.0, 30.0, OCTANT)
    assert not point_in_spherical_polygon(30.0, -30.0, OCTANT)


def test_arc_intersection():
    assert arcs_intersect((0, -10), (0, 10), (-10, 0), (10, 0))
    assert not arcs_intersect((0, -10), (0, 10), (5, -10), (5, 10))


def test_polygons_overlap():
    a = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
    b = [(5.0, 5.0), (15.0, 5.0), (15.0, 15.0), (5.0, 15.0)]
    c = [(20.0, 20.0), (30.0, 20.0), (30.0, 30.0), (20.0, 30.0)]
    assert polygons_overlap(a, b)
    assert not polygons_overlap(a, c)


def test_overlap_rate():
    big = AreaDefinition("big", "longlat", 10, 10, (0.0, 0.0, 10.0, 10.0))
    half = AreaDefinition("h", "longlat", 10, 10, (0.0, 0.0, 5.0, 10.0))
    assert overlap_rate(big, big) == pytest.approx(1.0)
    assert overlap_rate(half, big) == pytest.approx(0.5, abs=1e-3)
    far = AreaDefinition("f", "longlat", 10, 10, (50.0, 50.0, 60.0, 60.0))
    assert overlap_rate(far, big) == 0.0
