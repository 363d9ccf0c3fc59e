"""HDF5 n-bit filter (id 5): spec anchors hand-packed from the
H5Znbit.c algorithm, encoder/decoder symmetry, container integration
through hdf5_grid_bytes -> parse_hdf5, and corruption behavior."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyresample_spark.sources.hdf5 import hdf5_grid_bytes, parse_hdf5
from pyresample_spark.sources.nbit import (
    NBIT_ARRAY,
    NBIT_ATOMIC,
    NBIT_COMPOUND,
    NBIT_NOOPTYPE,
    NBIT_ORDER_BE,
    NBIT_ORDER_LE,
    h5_nbit_decode,
    h5_nbit_encode,
    nbit_cd_values,
)


def cd_atomic(size, order, precision, offset, nelmts):
    return (8, 1, nelmts, NBIT_ATOMIC, size, order, precision, offset)


def test_hand_packed_u2_precision12():
    """<u2 precision 12 offset 0: each element packs as the high
    nibble's 4 significant bits then the low byte's 8 — 12 bits,
    MSB-first. 0x0ABC -> bits 1010 10111100."""
    cd = cd_atomic(2, NBIT_ORDER_LE, 12, 0, 2)
    data = np.array([0x0ABC, 0x0123], dtype="<u2")
    enc = h5_nbit_encode(data.tobytes(), cd)
    # element bits: 1010 10111100 | 0001 00100011, padded to 3 bytes
    want = bytes([0b10101011, 0b11000001, 0b00100011])
    assert enc == want
    assert h5_nbit_decode(enc, cd) == data.tobytes()


def test_offset_field_and_low_padding_roundtrip():
    """precision 6 offset 3 on u2: field bits 3..8 span bytes 0..1;
    the LOW spanned byte carries its sub-offset padding bits verbatim
    (H5Znbit.c copies whole non-begin bytes), bits above the field
    decode as zero."""
    cd = cd_atomic(2, NBIT_ORDER_LE, 6, 3, 3)
    vals = np.array([0b101011, 0b000001, 0b111111], dtype="<u2") << 3
    vals |= np.array([0b101, 0b010, 0b111], dtype="<u2")  # low padding
    enc = h5_nbit_encode(vals.tobytes(), cd)
    out = np.frombuffer(h5_nbit_decode(enc, cd), dtype="<u2")
    assert np.array_equal(out, vals)  # padding below offset kept
    # 9 spanned bits per element (1 + 8), 3 elements -> 27 bits -> 4 B
    assert len(enc) == 4


def test_one_byte_branch_hand_packed():
    """H5Znbit.c's begin_i == end_i branch (all significant bits in
    ONE byte): exactly ``precision`` bits per element — NOT
    precision + offset%8 — shifted down by offset%8 on compress and
    re-anchored (padding zeroed) on decompress. ADVICE r16: the old
    walk packed 6 bits for u1 precision=4 offset=2 and desynchronized
    against libhdf5 streams after the first element."""
    # u1, precision 4, offset 2: field bits 5..2, 4 packed bits/element
    cd = cd_atomic(1, NBIT_ORDER_LE, 4, 2, 3)
    fields = np.array([0b1010, 0b0001, 0b1111], dtype="<u1")
    data = (fields << 2).astype("<u1")
    enc = h5_nbit_encode(data.tobytes(), cd)
    assert enc == bytes([0b10100001, 0b11110000])  # 4 bits x 3 -> 2 B
    assert h5_nbit_decode(enc, cd) == data.tobytes()
    # sub-offset / above-field padding is zeroed by the library's
    # one-byte decompress, not carried
    dirty = (data | 0b11000011).astype("<u1")
    assert h5_nbit_decode(h5_nbit_encode(dirty.tobytes(), cd),
                          cd) == data.tobytes()
    # u2, precision 3, offset 9: one spanned byte (byte 1, bits 3..1)
    cd = cd_atomic(2, NBIT_ORDER_LE, 3, 9, 2)
    vals = (np.array([0b101, 0b011], dtype="<u2") << 9).astype("<u2")
    enc = h5_nbit_encode(vals.tobytes(), cd)
    assert enc == bytes([0b10101100])  # 3 bits x 2 -> 1 byte
    assert h5_nbit_decode(enc, cd) == vals.tobytes()
    # big-endian twin: >u2 precision 3 offset 9 -> the single spanned
    # byte is byte 0 (holds bits 15..8), same 3-bit pack
    cd = cd_atomic(2, NBIT_ORDER_BE, 3, 9, 2)
    vals_be = (np.array([0b101, 0b011], dtype=">u2") << 9).astype(">u2")
    enc = h5_nbit_encode(vals_be.tobytes(), cd)
    assert enc == bytes([0b10101100])
    assert h5_nbit_decode(enc, cd) == vals_be.tobytes()


def test_big_endian_and_flag0_passthrough():
    cd = cd_atomic(2, NBIT_ORDER_BE, 10, 0, 4)
    data = np.array([513, 1023, 0, 700], dtype=">u2")
    enc = h5_nbit_encode(data.tobytes(), cd)
    assert len(enc) == 5  # 10 bits x 4 = 40 bits
    assert h5_nbit_decode(enc, cd) == data.tobytes()
    # flag 0: full-precision datatype, the filter stores chunks raw
    cd0 = (8, 0, 4, NBIT_ATOMIC, 2, NBIT_ORDER_BE, 16, 0)
    assert h5_nbit_decode(data.tobytes(), cd0) == data.tobytes()
    assert h5_nbit_encode(data.tobytes(), cd0) == data.tobytes()


def test_array_compound_nooptype_trees():
    """Array-of-atomic and compound{atomic, nooptype} description
    trees flatten to the documented slot walk."""
    # array[4] of <u1 precision 5
    cd = (10, 1, 3, NBIT_ARRAY, 4, NBIT_ATOMIC, 1, NBIT_ORDER_LE, 5, 0)
    data = np.arange(12, dtype="<u1") % 32
    enc = h5_nbit_encode(data.tobytes(), cd)
    assert len(enc) == -(-12 * 5 // 8)
    assert h5_nbit_decode(enc, cd) == data.tobytes()
    # compound of {u2 precision 9 at byte 0, 2 verbatim bytes at 2}
    cd = (15, 1, 2, NBIT_COMPOUND, 4, 2,
          0, NBIT_ATOMIC, 2, NBIT_ORDER_LE, 9, 0,
          2, NBIT_NOOPTYPE, 2)
    el = np.zeros(2, dtype="<u4")
    raw = (np.array([400, 77], dtype="<u2").tobytes()[:2]
           + b"\xaa\xbb"
           + np.array([77], dtype="<u2").tobytes()
           + b"\xcd\xef")
    # build two 4-byte elements explicitly
    raw = (np.uint16(400).tobytes() + b"\xaa\xbb"
           + np.uint16(77).tobytes() + b"\xcd\xef")
    del el
    enc = h5_nbit_encode(raw, cd)
    assert len(enc) == -(-(9 + 16) * 2 // 8)
    assert h5_nbit_decode(enc, cd) == raw


def test_truncated_and_malformed_cd_values_raise():
    cd = cd_atomic(2, NBIT_ORDER_LE, 12, 0, 8)
    enc = h5_nbit_encode(np.arange(8, dtype="<u2").tobytes(), cd)
    with pytest.raises(ValueError, match="truncated"):
        h5_nbit_decode(enc[:-2], cd)
    with pytest.raises(ValueError):
        h5_nbit_decode(enc, cd[:3])  # too few cd_values
    with pytest.raises(ValueError):
        h5_nbit_decode(enc, (9,) + cd[1:])  # count mismatch
    with pytest.raises(ValueError):
        h5_nbit_decode(enc, cd[:3] + (7,) + cd[4:])  # bad class
    with pytest.raises(ValueError):  # precision overflows the type
        h5_nbit_decode(enc, cd_atomic(2, NBIT_ORDER_LE, 14, 4, 8))


@settings(max_examples=60, deadline=None)
@given(
    st.sampled_from(["<u1", "<u2", "<u4", ">u2", ">u4"]),
    st.integers(min_value=1, max_value=31),
    st.integers(min_value=0, max_value=7),
    st.integers(min_value=1, max_value=200),
    st.randoms(use_true_random=False),
)
def test_roundtrip_property(dts, precision, offset, n, rnd):
    dt = np.dtype(dts)
    if precision + offset > 8 * dt.itemsize:
        precision = 8 * dt.itemsize - offset
    cd = cd_atomic(dt.itemsize,
                   NBIT_ORDER_BE if dt.byteorder == ">" else NBIT_ORDER_LE,
                   precision, offset, n)
    vals = np.array(
        [rnd.getrandbits(precision) for _ in range(n)], dtype="u8"
    ) << np.uint64(offset)
    data = vals.astype(dt)
    enc = h5_nbit_encode(data.tobytes(), cd)
    assert h5_nbit_decode(enc, cd) == data.tobytes()
    assert len(enc) * 8 < n * dt.itemsize * 8 + 8 or precision == 8 * dt.itemsize


def test_nbit_cd_values_matches_set_local_shape():
    cd = nbit_cd_values("<u2", 12, 0, 64)
    assert cd == (8, 1, 64, NBIT_ATOMIC, 2, NBIT_ORDER_LE, 12, 0)
    assert nbit_cd_values(">i4", 32, 0, 9)[1] == 0  # full precision
    with pytest.raises(ValueError):
        nbit_cd_values("<M8[ns]", 12)


def test_container_roundtrip_and_pipeline_composition():
    """nbit inside a real container: alone, composed with shuffle +
    deflate + fletcher32 (the netcdf-c recipe with nbit at position
    0), and under the v2-superblock fixed-array index."""
    rng = np.random.RandomState(7)
    data = (rng.randint(0, 1 << 12, (20, 48))).astype("<u2")
    blob = hdf5_grid_bytes(
        {"band": (data, {"units": "K"})}, chunks={"band": (7, 16)},
        deflate=False, nbit={"precision": 12},
    )
    out = parse_hdf5(blob)["band"]
    assert np.array_equal(out["data"].astype("<u2"), data)
    blob = hdf5_grid_bytes(
        {"band": (data, {})}, chunks={"band": (5, 12)},
        deflate=True, shuffle=True, fletcher32=True,
        nbit={"precision": 12},
    )
    assert np.array_equal(
        parse_hdf5(blob)["band"]["data"].astype("<u2"), data)
    blob = hdf5_grid_bytes(
        {"band": (data, {})}, chunks={"band": (8, 16)},
        deflate=False, nbit={"precision": 12},
        superblock=2, chunk_index="fixed_array",
    )
    assert np.array_equal(
        parse_hdf5(blob)["band"]["data"].astype("<u2"), data)


def test_cross_validate_against_real_h5py_nbit(tmp_path):
    """h5py exposes no nbit API; go through the low-level H5P/H5T
    interface the way the HDF5 tool tests do, then require our parser
    to read the library's bytes exactly."""
    h5py = pytest.importorskip("h5py")
    data = (np.arange(600) % 4096).astype("<u2").reshape(20, 30)
    p = tmp_path / "nbit.h5"
    with h5py.File(p, "w") as f:
        space = h5py.h5s.create_simple((20, 30))
        dcpl = h5py.h5p.create(h5py.h5p.DATASET_CREATE)
        dcpl.set_chunk((5, 10))
        try:
            dcpl.set_nbit()
        except AttributeError:
            pytest.skip("h5py build lacks H5Pset_nbit")
        t = h5py.h5t.NATIVE_UINT16.copy()
        t.set_precision(12)
        dset = h5py.h5d.create(f.id, b"band", t, space, dcpl)
        dset.write(h5py.h5s.ALL, h5py.h5s.ALL, data)
    out = parse_hdf5(p.read_bytes())["band"]["data"]
    assert np.array_equal(out.astype("<u2"), data)


def test_cross_validate_h5py_nbit_one_byte_offset(tmp_path):
    """Non-byte-aligned offset whose significant bits fit in ONE byte
    (H5Tset_precision(4) + H5Tset_offset(2)) — the begin_i == end_i
    branch the ADVICE r16 review flagged; requires the library's
    4-bit-per-element stream, not the old 6-bit walk."""
    h5py = pytest.importorskip("h5py")
    data = ((np.arange(200) % 16) << 2).astype("<u1").reshape(10, 20)
    p = tmp_path / "nbit_off.h5"
    with h5py.File(p, "w") as f:
        space = h5py.h5s.create_simple((10, 20))
        dcpl = h5py.h5p.create(h5py.h5p.DATASET_CREATE)
        dcpl.set_chunk((5, 10))
        try:
            dcpl.set_nbit()
        except AttributeError:
            pytest.skip("h5py build lacks H5Pset_nbit")
        t = h5py.h5t.NATIVE_UINT8.copy()
        t.set_precision(4)
        t.set_offset(2)
        dset = h5py.h5d.create(f.id, b"band", t, space, dcpl)
        dset.write(h5py.h5s.ALL, h5py.h5s.ALL, data)
    out = parse_hdf5(p.read_bytes())["band"]["data"]
    assert np.array_equal(out.astype("<u1"), data)


def test_corrupt_sizes_bounded_before_allocation():
    """Fuzz campaign r16 finding: a bit-flipped atomic size of 2^31+2
    passed the packed-bits truncation guard (which bounds INPUT, not
    output) and turned np.zeros((n, size)) into a 75 GB calloc. Every
    tree size is now bounded, and the output size is checked against
    the stream's maximum legal 256x expansion — all BEFORE any
    allocation is sized by attacker-controlled fields."""
    data = np.arange(35, dtype="<u2")
    good = cd_atomic(2, NBIT_ORDER_LE, 12, 0, 35)
    enc = h5_nbit_encode(data.tobytes(), good)
    with pytest.raises(ValueError, match="size"):
        h5_nbit_decode(enc, cd_atomic(2147483650, NBIT_ORDER_LE, 12, 0, 35))
    with pytest.raises(ValueError, match="implausible"):
        h5_nbit_decode(enc, (10, 1, 35, NBIT_ARRAY, 1 << 31,
                             NBIT_ATOMIC, 1, NBIT_ORDER_LE, 5, 0))
    with pytest.raises(ValueError, match="implausible"):
        h5_nbit_decode(enc, (15, 1, 35, NBIT_COMPOUND, 1 << 30, 1,
                             0, NBIT_ATOMIC, 2, NBIT_ORDER_LE, 9, 0,
                             2, NBIT_NOOPTYPE, 2))
    with pytest.raises(ValueError, match="implausible"):
        h5_nbit_decode(enc, (5, 1, 35, NBIT_NOOPTYPE, 1 << 24))
    # a full-precision 32-byte atomic is legal; 33 is not
    with pytest.raises(ValueError, match="1..32"):
        h5_nbit_decode(enc, cd_atomic(33, NBIT_ORDER_LE, 12, 0, 35))
