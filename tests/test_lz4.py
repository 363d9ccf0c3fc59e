"""LZ4 filter tests (sources/lz4.py, HDF5 filter id 32004 — the
Dectris-registered plugin hdf5plugin/h5py expose). Hand vectors pin
the public LZ4 block grammar (token nibbles, 255-chained length
extensions, little-endian offsets, overlapping copies) and the
plugin's big-endian framing with raw-stored incompressible blocks."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyresample_spark.sources.hdf5 import hdf5_grid_bytes, parse_hdf5
from pyresample_spark.sources.lz4 import (
    h5_lz4_decode,
    h5_lz4_encode,
    lz4_block_compress,
    lz4_block_decompress,
)


def test_hand_vectors_block_grammar():
    # literals-only final sequence
    assert lz4_block_decompress(bytes([0x30]) + b"ABC", 10) == b"ABC"
    # 4 literals then a 4-byte match at offset 4
    s = bytes([0x40]) + b"ABCD" + bytes([4, 0]) + bytes([0x00])
    assert lz4_block_decompress(s, 20) == b"ABCDABCD"
    # overlapping match (offset 1 < length) is run-length emission
    s = bytes([0x14]) + b"X" + bytes([1, 0]) + bytes([0x00])
    assert lz4_block_decompress(s, 20) == b"X" * 9
    # literal-length extension chain: 15 + 255 + 3 = 273
    lits = bytes(range(256)) + bytes(17)
    s = bytes([0xF0, 255, 3]) + lits + bytes([4, 0]) + bytes([0x00])
    assert lz4_block_decompress(s, 300) == lits + lits[-4:]
    # match-length extension: nibble 15 + ext 0 -> copy 19
    s = bytes([0x4F]) + b"ABCD" + bytes([4, 0, 0]) + bytes([0x00])
    assert lz4_block_decompress(s, 40) == b"ABCD" + (b"ABCD" * 5)[:19]


def test_decoder_loud_guards():
    for bad, msg in [
        (b"", "missing token"),
        (bytes([0x50]) + b"AB", "literal run past"),
        (bytes([0x10]) + b"A" + bytes([0]), "truncated match offset"),
        (bytes([0x10]) + b"A" + bytes([0, 0]), "offset 0"),
        (bytes([0x10]) + b"A" + bytes([5, 0]), "before block start"),
        (bytes([0xF0]), "truncated literal length"),
    ]:
        with pytest.raises(ValueError, match=msg):
            lz4_block_decompress(bad, 100)
    # output bound stops crafted expansion before allocation
    s = bytes([0x1F]) + b"A" + bytes([1, 0, 255, 255, 255, 0, 0])
    with pytest.raises(ValueError, match="exceeds declared"):
        lz4_block_decompress(s, 50)
    # framing guards
    with pytest.raises(ValueError, match="too short"):
        h5_lz4_decode(b"\x00" * 11, 100)
    with pytest.raises(ValueError, match="exceeds the chunk"):
        h5_lz4_decode(struct.pack(">QI", 1 << 40, 0), 100)


@given(kind=st.integers(0, 4), n=st.integers(0, 40000),
       seed=st.integers(0, 2**31), bsize=st.sampled_from(
           [64, 4096, 1 << 20]))
@settings(max_examples=50, deadline=None)
def test_roundtrip_property(kind, n, seed, bsize):
    rng = np.random.default_rng(seed)
    data = [
        bytes(rng.integers(0, 256, n, dtype=np.uint8)),
        bytes(rng.integers(0, 4, n, dtype=np.uint8)),
        bytes(n),
        (np.arange(max(n // 2, 1), dtype="<u2") % 97).tobytes()[:n],
        (b"ABCD" * (n // 4 + 1))[:n],
    ][kind]
    enc = lz4_block_compress(data)
    assert lz4_block_decompress(enc, len(data)) == data
    fr = h5_lz4_encode(data, bsize=bsize)
    assert h5_lz4_decode(fr, len(data) + 64) == data


def test_framing_stores_incompressible_blocks_raw():
    rng = np.random.default_rng(3)
    data = bytes(rng.integers(0, 256, 8192, dtype=np.uint8))
    fr = h5_lz4_encode(data, bsize=4096)
    total, bsize = struct.unpack_from(">QI", fr, 0)
    assert (total, bsize) == (8192, 4096)
    csize0 = struct.unpack_from(">I", fr, 12)[0]
    assert csize0 == 4096  # random bytes: stored raw
    assert h5_lz4_decode(fr, 8192 + 64) == data


def _band_of(buf):
    out = parse_hdf5(buf)["band"]
    return np.asarray(out["data"] if isinstance(out, dict) else out)


def test_hdf5_container_roundtrip_and_composition():
    data = ((np.arange(48)[:, None] * 31 + np.arange(64)[None, :] * 17)
            % 97).astype("<u2")
    for kw in (
        {"lz4": True},
        {"lz4": True, "shuffle": True},
        {"lz4": True, "fletcher32": True},
        {"lz4": True, "superblock": 2, "chunk_index": "fixed_array"},
        {"lz4": True, "superblock": 2,
         "chunk_index": "extensible_array"},
    ):
        buf = hdf5_grid_bytes({"band": (data, {})},
                              chunks={"band": (16, 24)},
                              deflate=False, **kw)
        assert np.array_equal(_band_of(buf), data), kw
    with pytest.raises(ValueError, match="alternative compressor"):
        hdf5_grid_bytes({"band": (data, {})}, chunks={"band": (8, 8)},
                        deflate=False, lzf=True, lz4=True)


def test_cross_validate_against_real_lz4(tmp_path):
    """When h5py + hdf5plugin exist, the reference plugin's chunks
    must decode bit-exactly here, and h5py must read ours."""
    h5py = pytest.importorskip("h5py")
    hdf5plugin = pytest.importorskip("hdf5plugin")

    data = ((np.arange(40)[:, None] * 13 + np.arange(50)[None, :] * 7)
            % 251).astype("<u2")
    p = tmp_path / "lz4.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("band", data=data, chunks=(16, 16),
                         **hdf5plugin.LZ4())
    assert np.array_equal(_band_of(p.read_bytes()), data)
    buf = hdf5_grid_bytes({"band": (data, {})}, chunks={"band": (16, 16)},
                          deflate=False, lz4=True)
    q = tmp_path / "ours.h5"
    q.write_bytes(buf)
    with h5py.File(q, "r") as f:
        assert np.array_equal(f["band"][...], data)
