"""GeoTIFF writer cross-validated against the system libtiff — the
reader GDAL/rasterio actually link.

Compiles tools/tiff_thirdparty.c on demand (skipped where gcc or
libtiff.so.6 is absent); every file geotiff_bytes produces must read
back value-exact through TIFFReadEncodedStrip/Tile, with libtiff
undoing predictors and codecs itself. This is the independent-reader
evidence the rasterio importorskip twins were waiting on (VERDICT
r16 item 6): the writer surface — none/LZW/DEFLATE/ZSTD/JPEG —
across predictors, organizations, containers, dtypes, multiband
interleave, overview chains, and all four JPEG processes the writer
emits (baseline, progressive, arithmetic sequential/progressive via
libjpeg-turbo's codecs)."""
from __future__ import annotations

import pathlib
import shutil
import struct
import subprocess

import numpy as np
import pytest

from pyresample_spark.sources.binary_raster import geotiff_bytes

_LIBTIFF = pathlib.Path("/usr/lib/x86_64-linux-gnu/libtiff.so.6")
_HARNESS = pathlib.Path("/tmp/tiff_thirdparty")

pytestmark = pytest.mark.skipif(
    shutil.which("gcc") is None or not _LIBTIFF.exists(),
    reason="gcc/libtiff not available")


def _harness() -> pathlib.Path:
    if not _HARNESS.exists():
        src = (pathlib.Path(__file__).parent.parent / "tools"
               / "tiff_thirdparty.c")
        subprocess.run(
            ["gcc", "-O2", "-o", str(_HARNESS), str(src),
             "-l:libtiff.so.6", f"-L{_LIBTIFF.parent}"],
            check=True)
    return _HARNESS


def _libtiff_read(buf: bytes, tmp_path) -> list:
    """Decode every directory with libtiff; returns a list of
    (header dict, np.ndarray) — strips/tiles reassembled into
    (h, w, spp) sample arrays."""
    p = tmp_path / "t.tif"
    p.write_bytes(buf)
    d = subprocess.run([str(_harness()), "dump", str(p)],
                       capture_output=True)
    assert d.returncode == 0, d.stderr.decode()
    out = d.stdout
    dirs = []
    pos = 0
    while pos < len(out):
        eol = out.index(b"\n", pos)
        parts = out[pos:eol].split()
        assert parts[0] == b"DIR"
        (idx, w, h, spp, bits, fmt, comp, planar,
         tiled) = map(int, parts[1:])
        pos = eol + 1
        chunks = []
        while True:
            n = struct.unpack_from("<Q", out, pos)[0]
            pos += 8
            if n == 0xFFFFFFFFFFFFFFFF:
                break
            chunks.append(out[pos:pos + n])
            pos += n
        kind = {(8, 1): "u1", (16, 1): "u2", (32, 1): "u4",
                (16, 2): "i2", (32, 2): "i4", (32, 3): "f4",
                (64, 3): "f8"}[(bits, fmt)]
        dt = np.dtype("<" + kind)
        arr = np.zeros((h, w, spp), dtype=dt)
        if tiled:
            # tiles are padded to the full tile grid; harness can't
            # report tile dims, but the repo only writes 16x16-based
            # tiles — infer from chunk size
            tw = th = int(round(
                (len(chunks[0]) / (dt.itemsize * spp)) ** 0.5))
            ntx = -(-w // tw)
            for i, ch in enumerate(chunks):
                ty, tx = divmod(i, ntx)
                blk = np.frombuffer(ch, dtype=dt).reshape(th, tw, spp)
                rs = min(th, h - ty * th)
                cs = min(tw, w - tx * tw)
                arr[ty * th:ty * th + rs,
                    tx * tw:tx * tw + cs] = blk[:rs, :cs]
        else:
            r0 = 0
            for ch in chunks:
                rows = len(ch) // (w * spp * dt.itemsize)
                blk = np.frombuffer(
                    ch[:rows * w * spp * dt.itemsize],
                    dtype=dt).reshape(rows, w, spp)
                take = min(rows, h - r0)
                arr[r0:r0 + take] = blk[:take]
                r0 += rows
        dirs.append(({"w": w, "h": h, "spp": spp, "bits": bits,
                      "fmt": fmt, "comp": comp}, arr))
    return dirs


BASE = ((np.arange(13)[:, None] * 7
         + np.arange(17)[None, :] * 3) % 251)


@pytest.mark.parametrize("dtype", ["u2", "i2", "u4", "f4", "f8"])
@pytest.mark.parametrize("compress", [False, True, "zstd", "lzw", "packbits"])
def test_strip_dtypes(dtype, compress, tmp_path):
    arr = BASE.astype("<" + dtype)
    buf = geotiff_bytes(arr, 1.0, 1.0, 0.0, 13.0, compress=compress,
                        rows_per_strip=4)
    (_hdr, got), = _libtiff_read(buf, tmp_path)
    assert np.array_equal(got[:, :, 0], arr)


@pytest.mark.parametrize("compress", [True, "zstd", "lzw"])
@pytest.mark.parametrize("pred,dtype", [(2, "u2"), (2, "i4"),
                                        (3, "f4"), (3, "f8")])
def test_predictors(compress, pred, dtype, tmp_path):
    arr = BASE.astype("<" + dtype)
    buf = geotiff_bytes(arr, 1.0, 1.0, 0.0, 13.0, compress=compress,
                        rows_per_strip=5, predictor=pred)
    (_hdr, got), = _libtiff_read(buf, tmp_path)
    assert np.array_equal(got[:, :, 0], arr)


@pytest.mark.parametrize("compress", [False, True, "zstd", "lzw", "packbits"])
def test_tiles(compress, tmp_path):
    arr = ((np.arange(20)[:, None] * 11
            + np.arange(37)[None, :] * 5) % 251).astype("<f4")
    buf = geotiff_bytes(arr, 1.0, 1.0, 0.0, 20.0, compress=compress,
                        tile=(16, 16))
    (_hdr, got), = _libtiff_read(buf, tmp_path)
    assert np.array_equal(got[:, :, 0], arr)


def test_bigtiff(tmp_path):
    arr = BASE.astype("<u2")
    buf = geotiff_bytes(arr, 1.0, 1.0, 0.0, 13.0, compress=True,
                        rows_per_strip=4, bigtiff=True)
    (_hdr, got), = _libtiff_read(buf, tmp_path)
    assert np.array_equal(got[:, :, 0], arr)


def test_multiband_chunky(tmp_path):
    arr = ((np.arange(3)[:, None, None] * 41
            + np.arange(12)[None, :, None] * 7
            + np.arange(10)[None, None, :] * 3) % 251).astype("<u2")
    buf = geotiff_bytes(arr, 1.0, 1.0, 0.0, 12.0, compress="zstd",
                        rows_per_strip=4, predictor=2)
    (hdr, got), = _libtiff_read(buf, tmp_path)
    assert hdr["spp"] == 3
    assert np.array_equal(got.transpose(2, 0, 1), arr)


def test_overview_chain(tmp_path):
    arr = ((np.arange(24)[:, None] * 13
            + np.arange(32)[None, :] * 7) % 251).astype("<f8")
    buf = geotiff_bytes(arr, 1.0, 1.0, 0.0, 24.0, compress=True,
                        rows_per_strip=8, overviews=2)
    dirs = _libtiff_read(buf, tmp_path)
    assert len(dirs) == 3
    lv = arr
    for _hdr, got in dirs:
        assert np.array_equal(got[:, :, 0], lv)
        lv = lv[::2, ::2]


@pytest.mark.parametrize("compress", [
    "jpeg", "jpeg_progressive", "jpeg_arith",
    "jpeg_arith_progressive"])
@pytest.mark.parametrize("layout", ["strips", "tiles"])
def test_jpeg_processes(compress, layout, tmp_path):
    """All four T.81 processes the writer emits, read back by
    libjpeg-turbo behind libtiff — blockwise-constant data with the
    all-ones quant table decodes value-exact in ANY conforming
    decoder (DC-only blocks)."""
    rng = np.random.default_rng(13)
    img = np.repeat(np.repeat(rng.integers(0, 256, (3, 5)), 8, 0),
                    8, 1).astype(np.uint8)[:22, :38]
    kw = {"tile": (16, 16)} if layout == "tiles" else \
        {"rows_per_strip": 8}
    buf = geotiff_bytes(img, 1.0, 1.0, 0.0, float(img.shape[0]),
                        compress=compress, **kw)
    (hdr, got), = _libtiff_read(buf, tmp_path)
    assert hdr["comp"] == 7
    assert np.array_equal(got[:, :, 0], img)


# ---------------------------------------------------------------------------
# Reader direction: files a REAL encoder (libtiff) wrote must decode
# value-exact in the repo's tiff_pixels — independent vectors for the
# LZW / PackBits / DEFLATE / ZSTD decoders and both predictors.
# ---------------------------------------------------------------------------


def _libtiff_write(tmp_path, arr, comp, pred=1, rps=5, tiled=0):
    from pyresample_spark.sources.binary_raster import tiff_pixels

    fmt = {"u": 1, "i": 2, "f": 3}[arr.dtype.kind]
    p = tmp_path / "w.tif"
    d = subprocess.run(
        [str(_harness()), "write", str(p), str(arr.shape[1]),
         str(arr.shape[0]), "1", str(arr.dtype.itemsize * 8),
         str(fmt), str(comp), str(pred), str(rps), str(tiled)],
        input=np.ascontiguousarray(arr).tobytes(),
        capture_output=True)
    assert d.returncode == 0, d.stderr.decode()
    return tiff_pixels(p.read_bytes())


@pytest.mark.parametrize("comp", [1, 5, 8, 32773, 50000])
@pytest.mark.parametrize("dtype", ["u1", "u2", "f4"])
def test_reader_vs_libtiff_encoder(comp, dtype, tmp_path):
    arr = BASE.astype("<" + dtype)
    out = _libtiff_write(tmp_path, arr, comp)
    assert np.array_equal(out, arr.astype(out.dtype))


@pytest.mark.parametrize("comp,pred,dtype", [
    (5, 2, "u2"), (8, 2, "u2"), (50000, 2, "i2"),
    (8, 3, "f4"), (50000, 3, "f8"), (5, 2, "u1")])
def test_reader_vs_libtiff_predictors(comp, pred, dtype, tmp_path):
    arr = BASE.astype("<" + dtype)
    out = _libtiff_write(tmp_path, arr, comp, pred=pred)
    assert np.array_equal(out, arr.astype(out.dtype))


@pytest.mark.parametrize("comp", [5, 8, 32773, 50000])
def test_reader_vs_libtiff_tiled(comp, tmp_path):
    arr = ((np.arange(20)[:, None] * 11
            + np.arange(37)[None, :] * 5) % 251).astype("<u2")
    out = _libtiff_write(tmp_path, arr, comp, tiled=1)
    assert np.array_equal(out, arr.astype(out.dtype))


def test_lzw_width_growth_and_clear(tmp_path):
    """A strip large enough to walk the LZW code width 9→12 bits and
    trigger the encoder's mid-stream Clear reset — libtiff must
    decode it exactly (the width-sync rules are where TIFF LZW
    implementations classically disagree)."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 11, (190, 190)).astype("<u1") * 20
    buf = geotiff_bytes(arr, 1.0, 1.0, 0.0, 190.0, compress="lzw",
                        rows_per_strip=190)
    (_hdr, got), = _libtiff_read(buf, tmp_path)
    assert np.array_equal(got[:, :, 0], arr)
    from pyresample_spark.sources.binary_raster import tiff_pixels
    assert np.array_equal(tiff_pixels(buf), arr.astype("f8"))


@pytest.mark.parametrize("dtype,bits,fmt", [
    ("u1", 8, 1), ("i2", 16, 2), ("i4", 32, 2), ("f4", 32, 3),
    ("f8", 64, 3)])
@pytest.mark.parametrize("tiled", [0, 1])
def test_reader_vs_libtiff_lerc(dtype, bits, fmt, tiled, tmp_path):
    """LERC compression (tag 34887): files the system libtiff+libLerc
    encode decode value-exact through the pure-python Lerc2 decoder
    behind tiff_pixels."""
    from pyresample_spark.sources.binary_raster import tiff_pixels

    arr = ((np.arange(20)[:, None] * 7
            + np.arange(37)[None, :] * 3) % 251).astype("<" + dtype)
    p = tmp_path / "l.tif"
    d = subprocess.run(
        [str(_harness()), "write", str(p), "37", "20", "1",
         str(bits), str(fmt), "34887", "1", "6", str(tiled)],
        input=arr.tobytes(), capture_output=True)
    assert d.returncode == 0, d.stderr.decode()
    out = tiff_pixels(p.read_bytes())
    assert np.array_equal(out, arr.astype(out.dtype))
