"""LZF filter tests (sources/lzf.py, HDF5 filter id 32000 — h5py's
``compression='lzf'``). The format has three rules (liblzf lzf_d.c),
so the hand vectors below are authoritative pins of the wire grammar
— including the one subtle ordering: when the 3-bit back-reference
length field saturates at 7, the length-extension byte comes BEFORE
the low offset byte."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyresample_spark.sources.hdf5 import hdf5_grid_bytes, parse_hdf5
from pyresample_spark.sources.lzf import lzf_compress, lzf_decompress


def test_hand_vectors_literal_and_backref():
    # ctrl < 32: literal run of ctrl+1 bytes
    assert lzf_decompress(bytes([2, 65, 66, 67]), 100) == b"ABC"
    # back-reference: len field 1 -> copy 3, dist field 1 -> dist 2
    s = bytes([1, 65, 66, (1 << 5) | 0, 1])
    assert lzf_decompress(s, 100) == b"ABABA"
    # overlapping copy (dist < len) is run-length emission
    s = bytes([0, 88, (3 << 5) | 0, 0])  # 'X', copy 5 from dist 1
    assert lzf_decompress(s, 100) == b"XXXXXX"


def test_hand_vector_length_extension_byte_order():
    """len field == 7: ONE extension byte follows the control byte and
    precedes the low offset byte (lzf_d.c: `if len==7 len+=*ip++;
    ref -= *ip++`)."""
    s = bytes([0, 81, (7 << 5) | 0, 3, 0])  # 'Q', copy 7+3+2 @ dist 1
    assert lzf_decompress(s, 100) == b"Q" * 13


def test_decoder_loud_guards():
    for bad, msg in [
        (bytes([5, 1]), "literal run"),
        (bytes([31]), "literal run"),
        (bytes([0, 65, (1 << 5) | 0, 5]), "before stream start"),
        (bytes([0, 65, (7 << 5) | 0]), "truncated length"),
        (bytes([0, 65, (1 << 5) | 0]), "truncated back-reference"),
    ]:
        with pytest.raises(ValueError, match=msg):
            lzf_decompress(bad, 100)
    # the output cap bounds crafted streams BEFORE allocation
    with pytest.raises(ValueError, match="chunk size"):
        lzf_decompress(bytes([0, 88, (7 << 5) | 0, 255, 0]), 10)


@given(kind=st.integers(0, 4), n=st.integers(0, 20000),
       seed=st.integers(0, 2**31))
@settings(max_examples=60, deadline=None)
def test_roundtrip_property(kind, n, seed):
    rng = np.random.default_rng(seed)
    data = [
        bytes(rng.integers(0, 256, n, dtype=np.uint8)),   # incompressible
        bytes(rng.integers(0, 4, n, dtype=np.uint8)),     # low entropy
        bytes(n),                                         # zeros
        (np.arange(max(n // 2, 1), dtype="<u2") % 97).tobytes()[:n],
        (b"ABCD" * (n // 4 + 1))[:n],                     # short period
    ][kind]
    enc = lzf_compress(data)
    assert lzf_decompress(enc, len(data)) == data


def test_window_and_match_length_limits():
    """Matches farther than 8192 back must not be emitted; copies cap
    at 264 bytes per back-reference."""
    rng = np.random.default_rng(11)
    blk = bytes(rng.integers(0, 256, 9000, dtype=np.uint8))
    data = blk + blk  # repeat beyond the window
    enc = lzf_compress(data)
    assert lzf_decompress(enc, len(data)) == data
    long_run = b"Z" * 5000  # forces many max-length copies
    enc = lzf_compress(long_run)
    assert lzf_decompress(enc, len(long_run)) == long_run


def _band_of(buf):
    out = parse_hdf5(buf)["band"]
    return np.asarray(out["data"] if isinstance(out, dict) else out)


def test_hdf5_container_roundtrip_and_composition():
    """Filter 32000 through the real container: alone, riding shuffle,
    riding fletcher32, and in the v2-superblock Fixed-Array /
    Extensible-Array indexes (whose per-entry chunk sizes must be
    written for EVERY filtered pipeline — previously only
    deflate/shuffle/fletcher32 set the filtered flag, so
    szip/scaleoffset/nbit/lzf chunks got size-less entries and the
    reader sliced trailing garbage into the decoder)."""
    data = ((np.arange(48)[:, None] * 31 + np.arange(64)[None, :] * 17)
            % 97).astype("<u2")
    for kw in (
        {"lzf": True},
        {"lzf": True, "shuffle": True},
        {"lzf": True, "fletcher32": True},
        {"lzf": True, "superblock": 2, "chunk_index": "fixed_array"},
        {"lzf": True, "superblock": 2,
         "chunk_index": "extensible_array"},
        # the regression the lzf work uncovered: pre-existing filters
        # in the v4-layout indexes
        {"szip": {"ppb": 16, "option": "nn"}, "superblock": 2,
         "chunk_index": "fixed_array"},
        {"nbit": {"precision": 12}, "superblock": 2,
         "chunk_index": "extensible_array"},
    ):
        buf = hdf5_grid_bytes({"band": (data, {})},
                              chunks={"band": (16, 24)},
                              deflate=False, **kw)
        assert np.array_equal(_band_of(buf), data), kw
    d2 = (data / 4.0 - 3.25).astype("<f8")
    buf = hdf5_grid_bytes({"band": (d2, {})}, chunks={"band": (16, 24)},
                          deflate=False, lzf=True, shuffle=True)
    assert np.array_equal(_band_of(buf), d2)
    with pytest.raises(ValueError, match="alternative compressor"):
        hdf5_grid_bytes({"band": (data, {})}, chunks={"band": (8, 8)},
                        lzf=True)  # deflate defaults True


def test_cross_validate_against_real_h5py_lzf(tmp_path):
    """When h5py exists, its own LZF filter (the reference
    implementation wrapping liblzf) must produce chunks this decoder
    reads bit-exactly, and vice versa."""
    h5py = pytest.importorskip("h5py")

    data = ((np.arange(40)[:, None] * 13 + np.arange(50)[None, :] * 7)
            % 251).astype("<u2")
    p = tmp_path / "lzf.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("band", data=data, chunks=(16, 16),
                         compression="lzf")
    got = _band_of(p.read_bytes())
    assert np.array_equal(got, data)
    # and h5py reads ours
    buf = hdf5_grid_bytes({"band": (data, {})}, chunks={"band": (16, 16)},
                          deflate=False, lzf=True)
    q = tmp_path / "ours.h5"
    q.write_bytes(buf)
    with h5py.File(q, "r") as f:
        assert np.array_equal(f["band"][...], data)
