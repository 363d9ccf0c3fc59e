"""NADCON .las/.los grid-shift format tests (sources/nadcon.py).

Wire-format fields are pinned against the public layout (NOAA NADCON
Fortran source/readme; GDAL's LOSLAS raw driver): little-endian
direct-access records of 4*(NC+1) bytes, a 96-byte header record
(IDENT/PGM/NC/NR/NZ + float32 geometry), then south→north rows each
led by a 1-based row-number word, columns west→east, arc-second
values with positive-west .los. The parsed subgrid must be byte-level
interchangeable with NTv2 output (operators/gridshift.py contract).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyresample_spark.operators import gridshift as GS
from pyresample_spark.sources import nadcon, ntv2


def tiny_grid():
    """21 rows x 24 cols (the NC >= 23 floor) over lat 40..45°N,
    lon 100.75..95°W at 0.25°, deterministic ramp values."""
    nr, nc = 21, 24
    i, j = np.meshgrid(np.arange(nr), np.arange(nc), indexing="ij")
    la = (0.3 + 0.02 * i + 0.01 * j).astype(np.float32)
    lo = (1.2 - 0.015 * i + 0.03 * j).astype(np.float32)
    return {
        "ident": "TINY NADCON TEST GRID", "pgm": "NADGRD",
        "xmin": -100.75, "dx": 0.25, "ymin": 40.0, "dy": 0.25,
        "lat_shift": la, "lon_shift": lo,
    }


def parsed_tiny():
    return nadcon.parse_nadcon(*nadcon.nadcon_grid_bytes(tiny_grid()))


# --------------------------------------------------------------------
# wire format
# --------------------------------------------------------------------


def test_header_layout():
    las, los = nadcon.nadcon_grid_bytes(tiny_grid())
    for data in (las, los):
        assert data[:21] == b"TINY NADCON TEST GRID"
        assert data[56:62] == b"NADGRD"
        nc, nr, nz = struct.unpack_from("<iii", data, 64)
        assert (nc, nr, nz) == (24, 21, 1)
        xmin, dx, ymin, dy, angle = struct.unpack_from("<5f", data, 76)
        assert (xmin, dx, ymin, dy, angle) == (
            np.float32(-100.75), np.float32(0.25),
            np.float32(40.0), np.float32(0.25), 0.0)
        # header record NUL-padded to the record length
        reclen = 4 * (nc + 1)
        assert data[96:reclen] == b"\x00" * (reclen - 96)
        # first data record: row word 1, then the SW value
        assert struct.unpack_from("<i", data, reclen)[0] == 1
    sw_la = struct.unpack_from("<f", las, 4 * 25 + 4)[0]
    sw_lo = struct.unpack_from("<f", los, 4 * 25 + 4)[0]
    assert sw_la == np.float32(0.3)
    assert sw_lo == np.float32(1.2)


def test_record_length_and_row_words():
    las, _ = nadcon.nadcon_grid_bytes(tiny_grid())
    reclen = 4 * 25
    assert len(las) == reclen * 22  # header + 21 rows
    for i in range(21):
        assert struct.unpack_from("<i", las, reclen * (i + 1))[0] == i + 1


def test_roundtrip_into_gridshift_shape():
    g = tiny_grid()
    sub = parsed_tiny()["subgrids"][0]
    assert (sub["nrows"], sub["ncols"]) == (21, 24)
    # degree header -> arc-second bounds, positive west
    assert sub["s_lat"] == 40.0 * 3600
    assert sub["n_lat"] == 45.0 * 3600
    assert sub["w_long"] == 100.75 * 3600
    assert sub["e_long"] == 95.0 * 3600
    assert sub["lat_inc"] == 900.0 and sub["long_inc"] == 900.0
    # column order REVERSED: sub col 0 = east edge = nadcon's LAST col
    np.testing.assert_array_equal(
        sub["lat_shift"], g["lat_shift"][:, ::-1].astype("f8"))
    np.testing.assert_array_equal(
        sub["lon_shift"], g["lon_shift"][:, ::-1].astype("f8"))


def test_float32_row_word_tolerated():
    """Producers that wrote the row number as float32 still parse."""
    las, los = nadcon.nadcon_grid_bytes(tiny_grid())
    reclen = 4 * 25
    las_f = bytearray(las)
    for i in range(21):
        struct.pack_into("<f", las_f, reclen * (i + 1), float(i + 1))
    g = nadcon.parse_nadcon(bytes(las_f), los)
    np.testing.assert_array_equal(
        g["subgrids"][0]["lat_shift"],
        tiny_grid()["lat_shift"][:, ::-1].astype("f8"))


def test_corrupt_guards():
    las, los = nadcon.nadcon_grid_bytes(tiny_grid())
    with pytest.raises(ValueError, match="too short"):
        nadcon.parse_nadcon(las[:50], los)
    with pytest.raises(ValueError, match="truncated"):
        nadcon.parse_nadcon(las[:-8], los)
    # wrong row word
    bad = bytearray(las)
    struct.pack_into("<i", bad, 4 * 25 * 3, 99)
    with pytest.raises(ValueError, match="row-number word"):
        nadcon.parse_nadcon(bytes(bad), los)
    # implausible dims
    bad = bytearray(las)
    struct.pack_into("<i", bad, 64, 2_000_000_000)
    with pytest.raises(ValueError, match="implausible"):
        nadcon.parse_nadcon(bytes(bad), los)
    # rotated grids unsupported
    bad = bytearray(las)
    struct.pack_into("<f", bad, 92, 15.0)
    with pytest.raises(ValueError, match="ANGLE"):
        nadcon.parse_nadcon(bytes(bad), los)
    # .las/.los pair mismatch
    g2 = tiny_grid()
    g2["xmin"] = -101.0
    las2, _ = nadcon.nadcon_grid_bytes(g2)
    with pytest.raises(ValueError, match="mismatch"):
        nadcon.parse_nadcon(las2, los)
    # writer: NC floor
    g3 = tiny_grid()
    g3["lat_shift"] = g3["lat_shift"][:, :20]
    g3["lon_shift"] = g3["lon_shift"][:, :20]
    with pytest.raises(ValueError, match="NC=20"):
        nadcon.nadcon_grid_bytes(g3)


# --------------------------------------------------------------------
# application through the shared grid-shift machinery
# --------------------------------------------------------------------


def test_bilinear_worked_example():
    """Hand-computed bilinear at a mid-cell point: the parsed NADCON
    grid interpolates exactly like an equivalent NTv2 grid would."""
    sub = parsed_tiny()["subgrids"][0]
    # lon 96°W lat 41.125°N: gi = floor((41.125-40)/0.25) = 4, fy = .5
    # gj: lw = 96*3600; (96-95)/0.25 = 4 -> gj=4, fx = 0.0
    d = GS._interp_scalar(sub, -96.0, 41.125)
    la = sub["lat_shift"]
    expect = 0.5 * (float(la[4, 4]) + float(la[5, 4]))
    assert d is not None and abs(d[0] - expect) < 1e-12


def test_forward_inverse_roundtrip():
    sub = parsed_tiny()["subgrids"][0]
    lon, lat = -97.3, 42.6
    f = GS.forward_scalar(sub, lon, lat)
    assert f is not None
    b = GS.inverse_scalar(sub, f[0], f[1])
    assert abs(b[0] - lon) < 1e-9 and abs(b[1] - lat) < 1e-9


def test_registry_resolution_and_cross_format_distinctness():
    g = ntv2.get_shift_grid("demo_nadcon")
    assert g["format"] == "nadcon" and len(g["subgrids"]) == 1
    # the NADCON demo field must DIFFER from the NTv2 demo's so a
    # registry mixup cannot silently pass
    ntv2_sub = ntv2.get_shift_grid("demo_conus")["subgrids"][0]
    nad_sub = g["subgrids"][0]
    assert nad_sub["ncols"] != ntv2_sub["ncols"]
    a = GS.forward_scalar(nad_sub, -94.0, 40.0)
    b = GS.forward_scalar(ntv2_sub, -94.0, 40.0)
    assert abs(a[0] - b[0]) > 1e-7 or abs(a[1] - b[1]) > 1e-7


def test_register_nadcon_grid_roundtrip():
    las, los = nadcon.nadcon_grid_bytes(tiny_grid())
    nadcon.register_nadcon_grid("tiny_nadcon_test", las, los)
    try:
        got = ntv2.get_shift_grid("tiny_nadcon_test")
        assert got["subgrids"][0]["nrows"] == 21
    finally:
        ntv2._REGISTRY.pop("tiny_nadcon_test", None)
