"""Baseline JPEG codec tests (sources/jpeg.py). The value-exact cases
exploit that a blockwise-constant image with an all-ones quantization
table has a single exact-integer DC coefficient per 8x8 block, so
encode→decode is lossless; lossy paths are bounded instead."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyresample_spark.sources.jpeg import (
    ZIGZAG,
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)


def block_const(bh, bw, seed=7):
    rng = np.random.RandomState(seed)
    return np.repeat(np.repeat(
        rng.randint(0, 256, (bh, bw)), 8, 0), 8, 1).astype(np.uint8)


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG) == list(range(64))
    # the first few entries of T.81 Figure A.6
    assert ZIGZAG[:8] == [0, 1, 8, 16, 9, 2, 3, 10]


def test_gray_blockconst_roundtrip_exact():
    img = block_const(3, 5)
    out = decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert np.array_equal(out, img)


def test_gray_gradient_roundtrip_tight():
    x, y = np.arange(37), np.arange(29)
    img = ((np.add.outer(y * 3, x * 2)) % 200 + 20).astype(np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_rgb_444_and_420():
    x, y = np.arange(40), np.arange(32)
    r = (100 + np.add.outer(y, x)).clip(0, 255).astype(np.uint8)
    g = (80 + np.add.outer(y // 2, x // 2)).clip(0, 255).astype(np.uint8)
    b = (60 + np.add.outer(y // 3, x // 3)).clip(0, 255).astype(np.uint8)
    rgb = np.stack([r, g, b], 2)
    for sub, tol in (("444", 2), ("420", 2)):
        out = decode_baseline_jpeg(encode_baseline_jpeg(rgb, subsampling=sub))
        assert out.shape == rgb.shape
        assert np.abs(out.astype(int) - rgb.astype(int)).max() <= tol


def test_restart_markers_roundtrip():
    img = block_const(2, 6)
    enc = encode_baseline_jpeg(img, restart_interval=2)
    assert b"\xff\xd0" in enc  # at least RST0 present
    assert np.array_equal(decode_baseline_jpeg(enc), img)


def test_quantized_roundtrip_bounded():
    x, y = np.arange(24), np.arange(16)
    img = ((np.add.outer(y * 5, x * 3)) % 180 + 30).astype(np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=16))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_abbreviated_stream_tables_merge():
    img = block_const(2, 3)
    enc = encode_baseline_jpeg(img)
    # hoist ALL tables: split at SOS
    p = 2
    tables = b""
    while enc[p + 1] != 0xDA:
        seglen = struct.unpack_from(">H", enc, p + 2)[0]
        if enc[p + 1] in (0xDB, 0xC4):
            tables += enc[p:p + 2 + seglen]
            enc = enc[:p] + enc[p + 2 + seglen:]
        else:
            p += 2 + seglen
    tb = b"\xff\xd8" + tables + b"\xff\xd9"
    out = decode_baseline_jpeg(enc, tables=tb)
    assert np.array_equal(out, img)


def test_unsupported_processes_raise():
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    for marker, what in ((0xC2, "progressive"), (0xC9, "arithmetic"),
                         (0xC3, "lossless")):
        stream = (b"\xff\xd8" + bytes([0xFF, marker])
                  + struct.pack(">H", 2 + len(sof)) + sof)
        with pytest.raises(NotImplementedError, match=what):
            decode_baseline_jpeg(stream)


def test_12bit_precision_raises():
    sof = struct.pack(">BHHB", 12, 8, 8, 1) + bytes([1, 0x11, 0])
    stream = (b"\xff\xd8\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof)
    with pytest.raises(NotImplementedError, match="12-bit precision"):
        decode_baseline_jpeg(stream)


def test_corrupt_guards():
    img = block_const(1, 1)
    enc = bytearray(encode_baseline_jpeg(img))
    with pytest.raises(ValueError, match="SOI"):
        decode_baseline_jpeg(b"\x00\x01\x02")
    # truncated entropy data
    with pytest.raises(ValueError):
        decode_baseline_jpeg(bytes(enc[:-4]))
    # zero quant value
    dqt_off = bytes(enc).index(b"\xff\xdb") + 5
    bad = bytearray(enc)
    bad[dqt_off + 3] = 0
    with pytest.raises(ValueError, match="zero quantization"):
        decode_baseline_jpeg(bytes(bad))


def test_encoder_input_guards():
    with pytest.raises(ValueError, match="uint8"):
        encode_baseline_jpeg(np.zeros((8, 8), dtype="f4"))
    with pytest.raises(ValueError, match="subsampling"):
        encode_baseline_jpeg(np.zeros((8, 8), dtype="u1"),
                             subsampling="422")
    with pytest.raises(ValueError, match="quant"):
        encode_baseline_jpeg(np.zeros((8, 8), dtype="u1"), quant=0.5)


def test_restart_after_ff_padded_byte():
    """T.81 B.1.1.5/F.1.2.3: when the 1-padded byte before an RSTn is
    0xFF, its stuffed 0x00 precedes the marker — the aligned restart
    consumer must skip it like read_bit does (code-review r13
    finding 1)."""
    from pyresample_spark.sources.jpeg import _BitReader

    rd = _BitReader(bytes([0xFF, 0x00, 0xFF, 0xD0, 0xAA]), 0)
    for _ in range(4):
        rd.read_bit()
    rd.restart(0)  # must land past FF 00 FF D0
    assert rd.pos == 4 and rd.bit == 0


def test_fill_bytes_before_markers():
    """Optional 0xFF fill bytes may precede any marker (T.81 B.1.1.2);
    the segment walker must consume them (code-review r13 finding 2)."""
    img = block_const(2, 2)
    enc = encode_baseline_jpeg(img)
    # inject fill bytes before the DQT marker (FF DB -> FF FF FF DB)
    i = enc.index(b"\xff\xdb")
    padded = enc[:i] + b"\xff\xff" + enc[i:]
    assert np.array_equal(decode_baseline_jpeg(padded), img)
