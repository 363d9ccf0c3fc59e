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

# clockwise around the interior — the reference's SphPolygon
# orientation convention (spherical.py:519-527), now required by the
# signed winding containment test
OCTANT = [(0.0, 0.0), (0.0, 90.0), (90.0, 0.0)]


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


def test_arc_intersection_point_reference_golden():
    """Reference Arc.intersection goldens (test_spherical.py:274-299)."""
    from pyresample_spark.operators.spherical import arc_intersection_point

    p = arc_intersection_point((0, 0), (10, 10), (0, 10), (10, 0))
    assert abs(p[0] - 5.0) < 1e-9
    assert abs(p[1] - 5.0575148968282093) < 1e-9
    # reference golden: two swath edge arcs
    p2 = arc_intersection_point(
        (24.341215776575297, 44.987819588259327),
        (18.842727517611817, 46.512483610284178),
        (20.165961750361905, 46.177305385810541),
        (20.253297585831707, 50.935830837274324),
    )
    assert abs(p2[0] - 20.165957021925202) < 1e-8
    assert abs(p2[1] - 46.177022633103398) < 1e-8
    # non-crossing arcs → None
    assert arc_intersection_point(
        (-2.4982818108326734, 48.596644847869655),
        (-2.9571441235622835, 49.165688435261394),
        (-3.4976667413531688, 48.562704872921373),
        (-5.893976312685715, 48.445795283217116),
    ) is None


def test_sph_union_reference_goldens():
    """Reference SphPolygon.union goldens (test_spherical.py:542-589)."""
    from pyresample_spark.operators.spherical import sph_union

    sq1 = [(180.0, 89.0), (90.0, 89.0), (0.0, 89.0), (-90.0, 89.0)]
    sq2 = [(-45.0, 89.0), (-135.0, 89.0), (135.0, 89.0), (45.0, 89.0)]
    u = sph_union(sq1, sq2)
    got = sorted((round(lo, 4), round(la, 6)) for lo, la in u)
    want = sorted(
        [(lo, 89.234601) for lo in
         (157.5, 112.5, 67.5, 22.5, -22.5, -67.5, -112.5, -157.5)]
        + [(lo, 89.0) for lo in
           (180.0, 135.0, 90.0, 45.0, 0.0, -45.0, -90.0, -135.0)]
    )
    assert got == want
    # nested polygons: union = the outer one
    inner = [(1.0, 1.0), (1.0, 20.0), (20.0, 20.0), (20.0, 1.0)]
    outer = [(0.0, 0.0), (0.0, 30.0), (30.0, 30.0), (30.0, 0.0)]
    assert sph_union(inner, outer) == outer
    assert sph_union(outer, inner) == outer


def test_sph_intersection_area_vs_band():
    """Intersection of two equatorial squares ≈ the lon/lat band
    integral (great-circle edge bulge makes it slightly larger)."""
    import math

    from pyresample_spark.operators.spherical import (
        sph_intersection,
        spherical_polygon_area,
    )

    a = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]
    b = [(5.0, 5.0), (5.0, 15.0), (15.0, 15.0), (15.0, 5.0)]
    i = sph_intersection(a, b)
    assert i is not None and len(i) == 4
    got = abs(spherical_polygon_area(i))
    band = math.radians(5) * (math.sin(math.radians(10)) - math.sin(math.radians(5)))
    assert abs(got - band) / band < 0.01
    # disjoint → None
    c = [(60.0, 5.0), (60.0, 15.0), (70.0, 15.0), (70.0, 5.0)]
    assert sph_intersection(a, c) is None


def test_overlap_rate_projected_areas():
    """overlap_rate for non-longlat CRS pairs (the r1 VERDICT gap):
    GH path vs containment-sampling ground truth."""
    from pyresample_spark.geometry import AreaDefinition
    from pyresample_spark.operators.crs import inverse_scalar
    from pyresample_spark.operators.spherical import (
        area_boundary_vertices,
        overlap_rate,
        point_in_spherical_polygon,
    )

    st = AreaDefinition(
        "s", "+proj=stere +lat_0=-90 +lat_ts=-70", 40, 40,
        (1.1e5, 2.3e5, 4.1e6, 3.9e6),
    )
    la = AreaDefinition("l", "+proj=laea +lat_0=-90", 60, 60,
                        (-3e6, -3e6, 3e6, 3e6))
    r = overlap_rate(st, la)
    # deterministic sampling ground truth over la's grid
    inv = inverse_scalar(la.crs)
    va = area_boundary_vertices(st, 16)
    n_in = n = 0
    for i in range(60):
        for j in range(60):
            lon, lat = inv(-3e6 + (j + 0.5) * 1e5, 3e6 - (i + 0.5) * 1e5)
            n += 1
            n_in += point_in_spherical_polygon(lon, lat, va)
    assert abs(r - n_in / n) < 0.02
    # containment and disjoint ends
    big = AreaDefinition("b", "+proj=stere +lat_0=-90 +lat_ts=-70", 10, 10,
                         (-4e6, -4e6, 4e6, 4e6))
    assert overlap_rate(big, la) == 1.0
    north = AreaDefinition("n", "+proj=laea +lat_0=90", 10, 10,
                           (-2e6, -2e6, 2e6, 2e6))
    assert overlap_rate(north, la) == 0.0


def test_reference_golden_polygon_areas():
    """PARITY against the reference's own published polygon areas
    (pyresample/test/test_spherical.py:386-440): the same vertex lists
    must produce the same steradian areas to its assertAlmostEqual
    tolerance (1e-7), even though this engine triangulates with
    L'Huilier where the reference integrates Bevis-Cambareri — the
    VALUES must agree, the algorithms deliberately don't."""
    from pyresample_spark.operators.spherical import spherical_polygon_area

    cases = [
        ([(1, 3), (2, 4), (3, 3), (4, 2), (3, 1), (2, 2)], 0.00121732523118),
        ([(1, 3), (2, 4), (3, 3), (2, 2)], 0.000608430665842),
        ([(0, 0), (0, 1), (1, 1), (1, 0)], 0.000304609684862),
        # across the dateline
        ([(179.5, 1), (-179.5, 1), (-179.5, 0), (179.5, 0)],
         0.000304609684862),
        ([(0, 1), (90, 1), (90, 0), (0, 0)], 0.0349012696772),
        ([(90, 0), (0, 0), (0, 90)], 1.5707963267948966),
        # around the poles
        ([(0, 89), (-90, 89), (180, 89), (90, 89)], 0.000609265770322),
        ([(0, -89), (90, -89), (180, -89), (-90, -89)], 0.000609265770322),
    ]
    for verts, want in cases:
        got = spherical_polygon_area([(float(a), float(b)) for a, b in verts])
        assert abs(got - want) < 1e-7, (verts, got, want)


def test_reference_golden_polygon_intersection():
    """PARITY against the reference's intersection fixtures
    (test_spherical.py:591-638): two 4-vertex rings around the north
    pole rotated 45° apart intersect in the 8-vertex ring at
    lat 89.23460094 / lons ±22.5 ±67.5 ±112.5 ±157.5; two polygons
    sharing contiguous edges intersect in the shared sub-polygon.
    Vertex ORDER may differ between implementations — compare as
    sets of rounded (lon, lat) pairs and by area."""
    from pyresample_spark.operators.spherical import (
        spherical_polygon_area,
        sph_intersection,
    )

    p1 = [(180.0, 89.0), (90.0, 89.0), (0.0, 89.0), (-90.0, 89.0)]
    p2 = [(-45.0, 89.0), (-135.0, 89.0), (135.0, 89.0), (45.0, 89.0)]
    got = sph_intersection(p1, p2)
    want = {
        (157.5, 89.23460094), (112.5, 89.23460094), (67.5, 89.23460094),
        (22.5, 89.23460094), (-22.5, 89.23460094), (-67.5, 89.23460094),
        (-112.5, 89.23460094), (-157.5, 89.23460094),
    }
    got_set = {(round(lo, 6), round(la, 6)) for lo, la in got}
    want_set = {(round(lo, 6), round(la, 6)) for lo, la in want}
    assert got_set == want_set

    # polygons sharing two contiguous edges → the shared sub-polygon
    v1 = [(-10.0, 10.0), (-5.0, 10.0), (0.0, 10.0), (5.0, 10.0),
          (10.0, 10.0), (10.0, -10.0), (-10.0, -10.0)]
    v2 = [(-5.0, 10.0), (0.0, 10.0), (5.0, 10.0), (5.0, -5.0),
          (-5.0, -5.0)]
    got2 = sph_intersection(v1, v2)
    a_got = spherical_polygon_area(got2)
    a_want = spherical_polygon_area(v2)
    assert abs(a_got - a_want) < 1e-9


def test_overlap_rate_reference_swath_goldens():
    """Reference SwathDefinition.overlap_rate goldens
    (test_spherical_geometry.py:123-164): three swath corner-polygon
    pairs with published rates — a.overlap_rate(b) =
    area(a ∩ b) / area(b) (geometry.py:605-620). Only the corner
    constants and expected rates come from the reference; intersection
    and area run through this engine's Greiner–Hormann + L'Huilier
    path."""
    from pyresample_spark.operators.spherical import (
        sph_intersection,
        spherical_polygon_area,
    )

    def rate(va, vb):
        inter = sph_intersection(va, vb)
        if inter is None:
            return 0.0
        return abs(spherical_polygon_area(inter)) / abs(
            spherical_polygon_area(vb)
        )

    sq1 = [(-1.0, 1.0), (1.0, 1.0), (1.0, -1.0), (-1.0, -1.0)]
    sq2 = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)]
    assert rate(sq1, sq2) == pytest.approx(0.25, abs=1e-3)
    assert rate(sq2, sq1) == pytest.approx(0.25, abs=1e-3)

    # the reference's Greenland-swath pair (corner walk of the 2×2
    # lon/lat grids: (0,0) → (0,1) → (1,1) → (1,0))
    swath = [
        (82.829699999999974, 60.5944),
        (36.888300000000001, 52.859999999999999),
        (2.8773, 66.7547),
        (98.145499999999984, 80.395899999999997),
    ]
    box1 = [
        (7.8098183315148422, 62.953206630716465),
        (26.189349044600252, 62.953206630716465),
        (26.189349044600252, 53.301561187195546),
        (7.8098183315148422, 53.301561187195546),
    ]
    assert rate(swath, box1) == pytest.approx(0.07, abs=5e-3)
    assert rate(box1, swath) == pytest.approx(0.012, abs=1e-3)

    box2 = [
        (12.108984194981202, 65.98228561983025),
        (30.490647126520301, 65.98228561983025),
        (30.490647126520301, 57.304862819933433),
        (12.108984194981202, 57.304862819933433),
    ]
    assert rate(swath, box2) == pytest.approx(0.509, abs=5e-3)
    assert rate(box2, swath) == pytest.approx(0.0685, abs=1e-3)
