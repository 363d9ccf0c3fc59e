"""Property-based tests (hypothesis) for the driver-side math — an
upgrade over the reference's fixed-seed-only strategy (SURVEY §5:
'no property-based testing' in the reference)."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyresample_spark.geometry import AreaDefinition
from pyresample_spark.operators.reduce import bbox_bounds, slice_crop
from pyresample_spark.operators.spherical import (
    overlap_rate,
    spherical_polygon_area,
)
from pyresample_spark.sources.cf_raster import (
    area_from_cf_attrs,
    area_from_geotransform,
)

lons = st.floats(-180.0, 180.0, allow_nan=False)
lats = st.floats(-90.0, 90.0, allow_nan=False)


@given(
    llx=st.floats(-170, 160), w=st.floats(1, 20),
    lly=st.floats(-80, 70), h=st.floats(1, 15),
    radius=st.floats(0, 2_000_000),
)
@settings(max_examples=200, deadline=None)
def test_bbox_bounds_contains_area(llx, w, lly, h, radius):
    area = AreaDefinition("a", "longlat", 10, 10, (llx, lly, llx + w, lly + h))
    lon_min, lon_max, lat_min, lat_max = bbox_bounds(area, radius)
    assert lon_min <= llx and lon_max >= min(180.0, llx + w)
    assert lat_min <= lly and lat_max >= min(90.0, lly + h)
    assert -180.0 <= lon_min and lon_max <= 180.0
    assert -90.0 <= lat_min and lat_max <= 90.0


@given(
    cx0=st.floats(-170, 160), cw=st.floats(0.5, 15),
    cy0=st.floats(-80, 70), ch=st.floats(0.5, 10),
)
@settings(max_examples=200, deadline=None)
def test_slice_crop_encloses_crop(cx0, cw, cy0, ch):
    area = AreaDefinition("a", "longlat", 360, 180, (-180.0, -90.0, 180.0, 90.0))
    r0, r1, c0, c1 = slice_crop(area, (cx0, cy0, cx0 + cw, cy0 + ch))
    sub = area[r0:r1, c0:c1]
    assert sub.area_extent[0] <= cx0 + 1e-9
    assert sub.area_extent[2] >= min(180.0, cx0 + cw) - 1e-9
    assert sub.area_extent[1] <= cy0 + 1e-9
    assert sub.area_extent[3] >= min(90.0, cy0 + ch) - 1e-9


@given(
    lon=st.floats(-60, 60), lat=st.floats(-60, 60),
    size=st.floats(0.5, 20),
)
@settings(max_examples=100, deadline=None)
def test_square_area_positive_and_bounded(lon, lat, size):
    sq = [
        (lon, lat), (lon + size, lat),
        (lon + size, lat + size), (lon, lat + size),
    ]
    a = spherical_polygon_area(sq)
    assert 0.0 <= a <= 4.0 * math.pi
    # never larger than the planar bound at the equator-most latitude
    planar = math.radians(size) ** 2
    assert a <= planar * 1.01


@given(
    x0=st.floats(-1e6, 1e6), y0=st.floats(-1e6, 1e6),
    psx=st.floats(1.0, 5000.0), psy=st.floats(1.0, 5000.0),
    w=st.integers(1, 500), h=st.integers(1, 500),
)
@settings(max_examples=200, deadline=None)
def test_geotransform_roundtrip(x0, y0, psx, psy, w, h):
    area = area_from_geotransform("g", "crs", w, h, (x0, psx, 0, y0, 0, -psy))
    assert area.width == w and area.height == h
    assert area.pixel_size_x == pytest_approx(psx)
    assert area.area_extent[3] == y0
    assert area.area_extent[0] == x0


def pytest_approx(v):
    import pytest

    return pytest.approx(v, rel=1e-9)


@given(n=st.integers(2, 50), x0=st.floats(-100, 100), step=st.floats(0.1, 5))
@settings(max_examples=100, deadline=None)
def test_cf_coords_roundtrip(n, x0, step):
    xs = [x0 + i * step for i in range(n)]
    ys = [50.0 - i * step for i in range(n)]  # descending (raster order)
    area = area_from_cf_attrs("c", "longlat", xs, ys)
    assert area.width == n and area.height == n
    # first pixel center must round-trip
    assert abs((area.area_extent[0] + area.pixel_size_x / 2) - xs[0]) < 1e-6
    assert abs((area.area_extent[3] - area.pixel_size_y / 2) - ys[0]) < 1e-6


@given(
    ax=st.floats(-50, 40), ay=st.floats(-50, 40),
    bx=st.floats(-50, 40), by=st.floats(-50, 40),
)
@settings(max_examples=100, deadline=None)
def test_overlap_rate_bounds(ax, ay, bx, by):
    a = AreaDefinition("a", "longlat", 5, 5, (ax, ay, ax + 10, ay + 10))
    b = AreaDefinition("b", "longlat", 5, 5, (bx, by, bx + 10, by + 10))
    r = overlap_rate(a, b)
    assert 0.0 <= r <= 1.0 + 1e-9


@given(lon=lons, lat=st.floats(-89.0, 89.0, allow_nan=False))
@settings(max_examples=60, deadline=None)
def test_aeqd_preserves_center_distance(lon, lat):
    """The DEFINING property of the azimuthal equidistant projection:
    the projected radius sqrt(x² + y²) equals the great-circle
    distance from the projection center — verified against the
    independent haversine formula (not the projection's own math),
    via the DuckDB SQL twin so the property run is engine-cheap."""
    import duckdb

    from pyresample_spark.functions.geo import R_EARTH, aeqd_sql

    lat_0, lon_0 = 48.0, 2.0
    # skip the antipode neighbourhood where c/sin c is ill-conditioned
    cos_c = (
        math.sin(math.radians(lat_0)) * math.sin(math.radians(lat))
        + math.cos(math.radians(lat_0)) * math.cos(math.radians(lat))
        * math.cos(math.radians(lon - lon_0))
    )
    if cos_c < -0.999:
        return
    x_sql, y_sql = aeqd_sql(repr(lon), repr(lat), lat_0=lat_0, lon_0=lon_0)
    x, y = duckdb.sql(f"SELECT {x_sql}, {y_sql}").fetchone()
    hav = (
        math.sin(math.radians(lat - lat_0) / 2.0) ** 2
        + math.cos(math.radians(lat_0)) * math.cos(math.radians(lat))
        * math.sin(math.radians(lon - lon_0) / 2.0) ** 2
    )
    dist = 2.0 * R_EARTH * math.asin(min(1.0, math.sqrt(hav)))
    assert math.hypot(x, y) == pytest.approx(dist, abs=1e-3)


# --- progressive JPEG (r17): random images x random legal scan scripts


@st.composite
def _prog_scan_scripts(draw):
    """A random LEGAL grayscale scan script: DC and the 1..63 AC band
    split at a random point, each started at a random Al and refined
    in unit steps to 0, scan order shuffled subject to DC-before-AC
    and descending-Al legality."""
    dc_al = draw(st.integers(0, 3))
    split = draw(st.integers(1, 63))
    ac1_al = draw(st.integers(0, 2))
    ac2_al = draw(st.integers(0, 2))
    scans = [([0], 0, 0, 0, dc_al)]
    scans += [([0], 0, 0, al + 1, al) for al in range(dc_al - 1, -1, -1)]
    bands = [(1, split, ac1_al)]
    if split < 63:
        bands.append((split + 1, 63, ac2_al))
    for ss, se, al0 in bands:
        scans.append(([0], ss, se, 0, al0))
        scans += [([0], ss, se, al + 1, al)
                  for al in range(al0 - 1, -1, -1)]
    return scans


@given(
    h=st.integers(1, 40), w=st.integers(1, 40),
    seed=st.integers(0, 2**31), quant=st.integers(1, 64),
    ri=st.integers(0, 4), scans=_prog_scan_scripts(),
)
@settings(max_examples=60, deadline=None)
def test_progressive_decodes_bit_identical_to_baseline(
        h, w, seed, quant, ri, scans):
    import numpy as np

    from pyresample_spark.sources.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
        encode_progressive_jpeg,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w)).astype(np.uint8)
    base = decode_baseline_jpeg(encode_baseline_jpeg(
        img, quant=quant, restart_interval=ri))
    prog = decode_baseline_jpeg(encode_progressive_jpeg(
        img, quant=quant, restart_interval=ri, scans=scans))
    assert prog.dtype == base.dtype and prog.shape == base.shape
    assert (prog == base).all()
