"""Bitshuffle filter tests (sources/bitshuffle.py, HDF5 filter id
32008 — the hdf5plugin/Masui filter modern detector and L1 archives
ship, usually composed with LZ4). The transform is pinned against the
bitshuffle project's own published numpy reference expression,
written out INDEPENDENTLY here."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyresample_spark.sources.bitshuffle import (
    bitshuffle_decode,
    bitshuffle_encode,
    trans_bit_elem,
    untrans_bit_elem,
)
from pyresample_spark.sources.hdf5 import hdf5_grid_bytes, parse_hdf5


def _reference(raw: bytes, elem_size: int) -> bytes:
    """The bitshuffle project's numpy reference (tests/test_ext.py):
    unpack MSB-first, transpose (element, bit), repack."""
    n = len(raw) // elem_size
    bits = np.unpackbits(np.frombuffer(raw, np.uint8)).reshape(
        n, elem_size * 8)
    return np.packbits(bits.transpose().ravel()).tobytes()


@given(esize=st.sampled_from([1, 2, 4, 8]), n8=st.integers(1, 64),
       seed=st.integers(0, 2**31))
@settings(max_examples=60, deadline=None)
def test_transform_matches_published_reference(esize, n8, seed):
    rng = np.random.default_rng(seed)
    raw = bytes(rng.integers(0, 256, n8 * 8 * esize, dtype=np.uint8))
    got = trans_bit_elem(raw, esize)
    assert got == _reference(raw, esize)
    assert untrans_bit_elem(got, esize) == raw


def test_hand_vector_single_bit_planes():
    """Pin the bit-numbering convention by hand: with 8 one-byte
    elements, only element 0's LSB set, the transposed (element, bit)
    matrix puts that bit in the LAST bit plane (LSB plane, MSB-first
    packing) at the MSB slot — output byte 7 = 0x80."""
    raw = bytes([0x01, 0, 0, 0, 0, 0, 0, 0])
    assert trans_bit_elem(raw, 1) == bytes([0, 0, 0, 0, 0, 0, 0, 0x80])
    # element 3's MSB set -> FIRST plane (MSB plane), bit slot 7-3
    raw = bytes([0, 0, 0, 0x80, 0, 0, 0, 0])
    assert trans_bit_elem(raw, 1) == bytes([0x10, 0, 0, 0, 0, 0, 0, 0])
    # two-byte elements: byte order inside the element is preserved
    # plane-major (byte0's 8 planes first, then byte1's)
    raw = bytes([0x00, 0x01] + [0, 0] * 7)  # element 0, byte1 LSB
    got = trans_bit_elem(raw, 2)
    assert got == bytes([0] * 15 + [0x80])


@given(nelem=st.integers(0, 400), esize=st.sampled_from([1, 2, 4, 8]),
       blk=st.sampled_from([8, 16, 64, 128]),
       comp=st.sampled_from([0, 2]), seed=st.integers(0, 2**31))
@settings(max_examples=60, deadline=None)
def test_blocked_roundtrip_property(nelem, esize, blk, comp, seed):
    rng = np.random.default_rng(seed)
    raw = bytes(rng.integers(0, 256, nelem * esize, dtype=np.uint8))
    enc = bitshuffle_encode(raw, esize, blk, comp)
    assert bitshuffle_decode(enc, esize, blk, comp,
                             len(raw) + 64) == raw


def test_decode_guards():
    with pytest.raises(ValueError, match="too short"):
        bitshuffle_decode(b"\x00" * 11, 2, 8, 2, 100)
    with pytest.raises(ValueError, match="exceeds the"):
        bitshuffle_decode(struct.pack(">QI", 1 << 40, 16), 2, 8, 2, 100)
    with pytest.raises(ValueError, match="multiple of element"):
        bitshuffle_decode(struct.pack(">QI", 33, 16), 2, 8, 2, 100)
    # uncompressed + default block size: loud (writer heuristic)
    with pytest.raises(NotImplementedError, match="default"):
        bitshuffle_decode(bytes(16), 2, 0, 0, 100)
    with pytest.raises(NotImplementedError, match="zstd"):
        bitshuffle_decode(bytes(16), 2, 8, 3, 100)


def _band_of(buf):
    out = parse_hdf5(buf)["band"]
    return np.asarray(out["data"] if isinstance(out, dict) else out)


def test_hdf5_container_roundtrip_and_composition():
    """Filter 32008 through the real container — LZ4-composed and
    plain, with a 15x17 chunk so every chunk carries a %8 leftover
    tail, plus fletcher32 in the v2-superblock Fixed-Array index."""
    data = ((np.arange(48)[:, None] * 31 + np.arange(64)[None, :] * 17)
            % 97).astype("<u2")
    for kw in (
        {"bitshuffle": {"block": 64}},
        {"bitshuffle": {"block": 64, "lz4": False}},
        {"bitshuffle": {"block": 32}, "fletcher32": True,
         "superblock": 2, "chunk_index": "fixed_array"},
    ):
        buf = hdf5_grid_bytes({"band": (data, {})},
                              chunks={"band": (15, 17)},
                              deflate=False, **kw)
        assert np.array_equal(_band_of(buf), data), kw
    with pytest.raises(ValueError, match="composes its own"):
        hdf5_grid_bytes({"band": (data, {})}, chunks={"band": (8, 8)},
                        deflate=False, lz4=True,
                        bitshuffle={"block": 8})


def test_cross_validate_against_real_bitshuffle(tmp_path):
    """When h5py + hdf5plugin exist, the reference filter's chunks
    must decode bit-exactly here, and h5py must read ours."""
    h5py = pytest.importorskip("h5py")
    hdf5plugin = pytest.importorskip("hdf5plugin")

    data = ((np.arange(40)[:, None] * 13 + np.arange(50)[None, :] * 7)
            % 251).astype("<u2")
    p = tmp_path / "bshuf.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("band", data=data, chunks=(16, 16),
                         **hdf5plugin.Bitshuffle())
    assert np.array_equal(_band_of(p.read_bytes()), data)
    buf = hdf5_grid_bytes({"band": (data, {})},
                          chunks={"band": (16, 16)},
                          deflate=False, bitshuffle={"block": 64})
    q = tmp_path / "ours.h5"
    q.write_bytes(buf)
    with h5py.File(q, "r") as f:
        assert np.array_equal(f["band"][...], data)
