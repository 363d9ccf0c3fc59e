"""GTX vertical-datum grid tests (sources/gtx.py + the vertical
section of operators/gridshift.py). Wire format pinned against the
public layout (PROJ/GDAL "NOAA .gtx"): 40-byte big-endian header
(lat0/lon0/dlat/dlon doubles + nrows/ncols int32), float32 values
south→north / west→east, -88.8888 nodata."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyresample_spark.operators import gridshift as GS
from pyresample_spark.sources import gtx


def tiny_grid():
    """3x4 over lat 10..12N, lon 40..43E at 1 deg, hand-picked values."""
    vals = np.array([[1.0, 2.0, 3.0, 4.0],
                     [5.0, 6.0, 7.0, 8.0],
                     [9.0, 10.0, 11.0, 12.0]], dtype=np.float32)
    return {"lat0": 10.0, "lon0": 40.0, "dlat": 1.0, "dlon": 1.0,
            "values": vals}


def test_header_layout():
    data = gtx.gtx_bytes(tiny_grid())
    lat0, lon0, dlat, dlon = struct.unpack_from(">dddd", data, 0)
    nr, nc = struct.unpack_from(">ii", data, 32)
    assert (lat0, lon0, dlat, dlon, nr, nc) == (10.0, 40.0, 1.0, 1.0, 3, 4)
    # first value = SW corner, big-endian float32; row-major west→east
    assert struct.unpack_from(">f", data, 40)[0] == 1.0
    assert struct.unpack_from(">f", data, 44)[0] == 2.0
    assert struct.unpack_from(">f", data, 40 + 4 * 4)[0] == 5.0
    assert len(data) == 40 + 12 * 4


def test_roundtrip_and_nodata():
    g = tiny_grid()
    g["values"][1, 2] = np.nan
    out = gtx.parse_gtx(gtx.gtx_bytes(g))
    assert (out["nrows"], out["ncols"]) == (3, 4)
    assert np.isnan(out["values"][1, 2])
    mask = ~np.isnan(out["values"])
    np.testing.assert_array_equal(out["values"][mask],
                                  g["values"].astype("f8")[mask])


def test_corrupt_guards():
    good = gtx.gtx_bytes(tiny_grid())
    with pytest.raises(ValueError, match="too short"):
        gtx.parse_gtx(good[:30])
    with pytest.raises(ValueError, match="truncated"):
        gtx.parse_gtx(good[:-4])
    bad = bytearray(good)
    struct.pack_into(">i", bad, 32, 2_000_000_000)
    with pytest.raises(ValueError, match="implausible dims"):
        gtx.parse_gtx(bytes(bad))
    bad = bytearray(good)
    struct.pack_into(">d", bad, 0, 123.0)
    with pytest.raises(ValueError, match="implausible origin"):
        gtx.parse_gtx(bytes(bad))
    g = tiny_grid()
    g["dlat"] = 0.0
    with pytest.raises(ValueError, match="positive"):
        gtx.gtx_bytes(g)


def test_bilinear_worked_example():
    g = gtx.parse_gtx(gtx.gtx_bytes(tiny_grid()))
    # node-exact
    assert GS.vinterp_scalar(g, 41.0, 11.0) == 6.0
    # mid-cell: lat 10.5, lon 41.5 -> mean of 2,3,6,7 = 4.5
    assert GS.vinterp_scalar(g, 41.5, 10.5) == pytest.approx(4.5, abs=1e-12)
    # the +360 wrap applies to ANY negative longitude (the column CASE
    # and this twin agree): -319 aliases 41E
    assert GS.vinterp_scalar(g, -319.0, 11.0) == 6.0
    # outside
    assert GS.vinterp_scalar(g, 44.5, 11.0) is None
    assert GS.vinterp_scalar(g, 41.0, 9.5) is None


def test_lon360_wrap():
    """A grid in the [180, 360) band is addressed by negative
    longitudes through the wrap."""
    g = gtx.parse_gtx(gtx.gtx_bytes(
        dict(tiny_grid(), lon0=300.0)))  # 300..303E = 60..57W
    assert GS.vinterp_scalar(g, -59.0, 11.0) == 6.0
    assert GS.vinterp_scalar(g, -56.0, 11.0) is None


def test_nodata_inside_domain_raises_in_cells():
    g = tiny_grid()
    g["values"][0, 0] = np.nan
    parsed = gtx.parse_gtx(gtx.gtx_bytes(g))
    with pytest.raises(NotImplementedError, match="nodata"):
        GS.vcell_arrays(parsed)


def test_vcell_corner_wiring():
    g = gtx.parse_gtx(gtx.gtx_bytes(tiny_grid()))
    a = GS.vcell_arrays(g)
    assert a["gi"].shape[0] == 2 * 3  # (3-1) x (4-1) cells
    # cell (0, 0): corners 1 (p00), 5 (p10), 2 (p01), 6 (p11)
    i = int(np.flatnonzero((a["gi"] == 0) & (a["gj"] == 0))[0])
    assert (a["p00"][i], a["p10"][i], a["p01"][i], a["p11"][i]) == (
        1.0, 5.0, 2.0, 6.0)


def test_forward_inverse_are_mirror():
    """h + N then - N is identity; both directions are single
    lookups at the SAME unchanged position."""
    g = gtx.parse_gtx(gtx.gtx_bytes(tiny_grid()))
    n = GS.vinterp_scalar(g, 41.3, 10.7)
    h_ell = 100.0 + n
    assert h_ell - n == pytest.approx(100.0, abs=1e-12)


def test_seam_and_negative_origin_raise():
    """The [0,360) addressing cannot represent a negative-origin or
    seam-crossing grid — cell building raises loudly instead of
    silently dropping in-grid points (code-review r14 finding 2)."""
    g = gtx.parse_gtx(gtx.gtx_bytes(dict(tiny_grid(), lon0=-10.0)))
    with pytest.raises(NotImplementedError, match="0/360 seam|negative"):
        GS.vcell_arrays(g)
    g2 = gtx.parse_gtx(gtx.gtx_bytes(dict(tiny_grid(), lon0=358.0)))
    with pytest.raises(NotImplementedError, match="seam"):
        GS.vcell_arrays(g2)


def test_vshift_direction_validated():
    with pytest.raises(ValueError, match="forward/inverse"):
        GS.vshift_duckdb_ctes("pts", gtx.parse_gtx(
            gtx.gtx_bytes(tiny_grid())), direction="fwd")
