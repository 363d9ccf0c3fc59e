"""HDF5 scale-offset filter (id 6) — sources/scaleoffset.py.

Spec-assembled chunks built with a local header/bit packer (independent
of the writer twin) must decode to known values; the writer twin must
round-trip across the dtype/fill/factor matrix, inside full HDF5
containers, composed with every other filter, and under corruption.
An importorskip twin cross-validates against real h5py.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyresample_spark.sources.hdf5 import hdf5_grid_bytes, parse_hdf5
from pyresample_spark.sources.scaleoffset import (
    SO_FLOAT_DSCALE,
    SO_INT,
    h5_scaleoffset_decode,
    h5_scaleoffset_encode,
    scaleoffset_cd_values,
)


def chunk(minbits: int, minval: int, packed, nbits: int) -> bytes:
    """Independent test-side assembler: header + MSB-first payload."""
    head = minbits.to_bytes(4, "little") + bytes([8])
    head += (minval & ((1 << 64) - 1)).to_bytes(8, "little")
    big = 0
    for v in packed:
        big = (big << nbits) | v
    total = len(packed) * nbits
    big <<= -total % 8
    return head + big.to_bytes((total + 7) // 8, "big")


def test_spec_int_basic():
    # u2 values [10, 12, 11, 15]: minval 10, span 5 -> minbits 3
    cd = scaleoffset_cd_values(SO_INT, 0, 4, "<u2")
    raw = chunk(3, 10, [0, 2, 1, 5], 3)
    out = np.frombuffer(h5_scaleoffset_decode(raw, cd), dtype="<u2")
    assert out.tolist() == [10, 12, 11, 15]


def test_spec_int_signed_negative_min():
    # i2 values [-5, -2, 3]: minval -5 (modular), span 8 -> 4 bits
    cd = scaleoffset_cd_values(SO_INT, 0, 3, "<i2")
    raw = chunk(4, -5, [0, 3, 8], 4)
    out = np.frombuffer(h5_scaleoffset_decode(raw, cd), dtype="<i2")
    assert out.tolist() == [-5, -2, 3]


def test_spec_int_fill_escape():
    # u1 with fill 200: packed all-ones (minbits 3 -> 7) is the fill
    cd = scaleoffset_cd_values(SO_INT, 0, 3, "u1", fill=200)
    raw = chunk(3, 4, [0, 7, 2], 3)
    out = np.frombuffer(h5_scaleoffset_decode(raw, cd), dtype="u1")
    assert out.tolist() == [4, 200, 6]


def test_spec_minbits_zero_all_equal():
    cd = scaleoffset_cd_values(SO_INT, 0, 5, "<u4")
    raw = (0).to_bytes(4, "little") + bytes([8]) + (77).to_bytes(8, "little")
    out = np.frombuffer(h5_scaleoffset_decode(raw, cd), dtype="<u4")
    assert out.tolist() == [77] * 5


def test_spec_fullwidth_verbatim():
    data = np.array([0, 65535, 7], dtype="<u2").tobytes()
    cd = scaleoffset_cd_values(SO_INT, 0, 3, "<u2")
    raw = (16).to_bytes(4, "little") + bytes([8]) + b"\x00" * 8 + data
    assert h5_scaleoffset_decode(raw, cd) == data


def test_spec_float_dscale():
    # f8, factor 2: scaled ints round(v*100); minval -250 -> [-2.5, 0.07]
    cd = scaleoffset_cd_values(SO_FLOAT_DSCALE, 2, 2, "<f8")
    raw = chunk(9, -250, [0, 257], 9)
    out = np.frombuffer(h5_scaleoffset_decode(raw, cd), dtype="<f8")
    assert out.tolist() == [-2.5, 0.07]


def test_spec_big_endian_order():
    cd = scaleoffset_cd_values(SO_INT, 0, 2, ">u2")
    raw = chunk(3, 256, [0, 5], 3)
    assert h5_scaleoffset_decode(raw, cd) == bytes([1, 0, 1, 5])


@settings(max_examples=80, deadline=None)
@given(
    dt=st.sampled_from(["u1", "<u2", ">u2", "<i2", "<i4", ">i4",
                        "<u8", "<i8"]),
    fill=st.sampled_from([None, 9]),
    data=st.data(),
)
def test_roundtrip_int_property(dt, fill, data):
    info = np.iinfo(np.dtype(dt))
    n = data.draw(st.integers(1, 300))
    lo = max(info.min, -1000)
    hi = min(info.max, 1000)
    vals = data.draw(st.lists(
        st.one_of(st.integers(lo, hi),
                  st.sampled_from([int(info.min), int(info.max)])),
        min_size=n, max_size=n))
    a = np.array(vals, dtype=dt)
    cd = scaleoffset_cd_values(SO_INT, 0, n, a.dtype, fill=fill)
    out = h5_scaleoffset_decode(h5_scaleoffset_encode(a.tobytes(), cd), cd)
    assert out == a.tobytes()


@pytest.mark.parametrize("dt", ["<f4", ">f4", "<f8", ">f8"])
@pytest.mark.parametrize("factor", [0, 2, 4])
def test_roundtrip_float_quantized(dt, factor):
    rng = np.random.RandomState(factor + 1)
    a = (rng.rand(257) * 100 - 50).round(factor).astype(dt)
    a[::9] = -999.0
    cd = scaleoffset_cd_values(SO_FLOAT_DSCALE, factor, len(a), a.dtype,
                               fill=-999.0)
    out = np.frombuffer(
        h5_scaleoffset_decode(h5_scaleoffset_encode(a.tobytes(), cd), cd),
        dtype=dt)
    assert np.allclose(out.astype("f8"), a.astype("f8"),
                       atol=0.51 * 10.0 ** (-factor))
    assert (out[::9] == np.array(-999.0, dtype=dt)).all()


@pytest.mark.parametrize("kw", [
    dict(),
    dict(shuffle=True, deflate=True),
    dict(fletcher32=True),
    dict(superblock=2, chunk_index="fixed_array"),
])
def test_hdf5_container_roundtrip(kw):
    rng = np.random.RandomState(4)
    data = rng.randint(0, 300, (20, 48)).astype("<u2")
    kw.setdefault("deflate", False)
    buf = hdf5_grid_bytes({"band": (data, {})}, chunks={"band": (5, 16)},
                          scaleoffset={"factor": 0}, **kw)
    out = parse_hdf5(buf)["band"]["data"]
    assert np.array_equal(out.astype("<u2"), data)


def test_hdf5_container_float_dscale_fill():
    rng = np.random.RandomState(6)
    data = (rng.rand(20, 48) * 20 - 10).round(2).astype("<f8")
    data[::4, ::5] = -999.0
    buf = hdf5_grid_bytes({"band": (data, {})}, chunks={"band": (5, 16)},
                          deflate=False,
                          scaleoffset={"factor": 2, "fill": -999.0})
    out = parse_hdf5(buf)["band"]["data"]
    assert np.allclose(out, data, atol=0.0051)
    assert (out[::4, ::5] == -999.0).all()


def test_decode_guards():
    cd = scaleoffset_cd_values(SO_INT, 0, 8, "<u2")
    with pytest.raises(ValueError, match="header"):
        h5_scaleoffset_decode(b"\x00\x00", cd)
    with pytest.raises(ValueError, match="minbits"):
        h5_scaleoffset_decode(
            (99).to_bytes(4, "little") + bytes([8]) + b"\x00" * 8, cd)
    with pytest.raises(ValueError, match="truncated"):
        h5_scaleoffset_decode(
            (7).to_bytes(4, "little") + bytes([8]) + b"\x00" * 8 + b"\x01",
            cd)
    with pytest.raises(NotImplementedError, match="E-scaling"):
        h5_scaleoffset_decode(b"\x00" * 16, (1, 0, 4, 1, 4, 0, 0, 0, 0))
    with pytest.raises(ValueError, match="client-data"):
        h5_scaleoffset_decode(b"\x00" * 16, (2, 0))


def test_minbits0_nelmts_bounded_by_chunk(tmp_path):
    """ADVICE r16: cd_values ride the file's own filter-pipeline
    message (untrusted); a crafted 13-byte header-only chunk with
    minbits=0 and nelmts near 2^32 must NOT size a ~34 GB zeros().
    The layout's chunk element count bounds it before allocation."""
    evil = scaleoffset_cd_values(SO_INT, 0, (1 << 32) - 5, "<u8")
    hdr = (0).to_bytes(4, "little") + bytes([8]) + (7).to_bytes(8, "little")
    with pytest.raises(ValueError, match="exceeds the chunk"):
        h5_scaleoffset_decode(hdr, evil, max_nelmts=64)
    # the legitimate constant-chunk case still decodes: declared count
    # equals the chunk's true count
    ok = scaleoffset_cd_values(SO_INT, 0, 64, "<u8")
    out = np.frombuffer(h5_scaleoffset_decode(hdr, ok, max_nelmts=64),
                        dtype="<u8")
    assert out.shape == (64,) and (out == 7).all()
    # end-to-end: a container whose pipeline message declares a huge
    # nelmts is rejected loudly by the parser, not OOM-killed
    data = np.full((16, 16), 7, dtype="<u4")
    buf = hdf5_grid_bytes({"band": (data, {})}, chunks={"band": (8, 8)},
                          deflate=False,
                          scaleoffset={"factor": 0})
    so_cd = scaleoffset_cd_values(SO_INT, 0, 64, "<u4")
    needle = struct.pack("<%dI" % len(so_cd), *so_cd)
    evil_cd = so_cd[:2] + ((1 << 31),) + so_cd[3:]
    patched = buf.replace(
        needle, struct.pack("<%dI" % len(evil_cd), *evil_cd))
    assert patched != buf  # the pipeline message was found and patched
    with pytest.raises(ValueError, match="exceeds the chunk"):
        parse_hdf5(patched)


def test_corruption_campaign_loud_or_detected():
    rng = np.random.RandomState(3)
    data = rng.randint(0, 300, (10, 32)).astype("<u2")
    base = hdf5_grid_bytes({"band": (data, {})}, chunks={"band": (5, 16)},
                           deflate=False, scaleoffset={"factor": 0})
    allowed = (ValueError, NotImplementedError, KeyError, IndexError,
               struct.error, OverflowError, MemoryError, EOFError)
    for pos in range(0, len(base), 7):
        m = bytearray(base)
        m[pos] ^= 0x5A
        try:
            parse_hdf5(bytes(m))
        except allowed:
            pass


def test_nbit_bogus_pipeline_entry_rejected_loudly():
    """Filter 5 (nbit) decodes natively as of r16 (sources/nbit.py);
    a pipeline entry whose client data is NOT a valid nbit datatype
    description (here: deflate's single cd value spliced under id 5)
    must still fail loudly instead of decoding garbage."""
    rng = np.random.RandomState(1)
    buf = hdf5_grid_bytes({"band": (rng.randint(0, 9, (4, 4))
                                    .astype("<u2"), {})},
                          chunks={"band": (2, 4)}, deflate=True)
    # splice filter id 5 over the deflate id in the pipeline message
    idx = buf.index(struct.pack("<HHHH", 1, 0, 1, 1))
    m = bytearray(buf)
    m[idx:idx + 2] = struct.pack("<H", 5)
    with pytest.raises(ValueError, match="nbit"):
        parse_hdf5(bytes(m))


def test_cross_validate_against_real_h5py(tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.RandomState(1)
    data = rng.randint(0, 4000, (20, 48)).astype("<i4")
    p = tmp_path / "so.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("band", data=data, chunks=(5, 16), scaleoffset=0)
    out = parse_hdf5(p.read_bytes())["band"]["data"]
    assert np.array_equal(out.astype("<i4"), data)


def test_constant_chunk_over_64k_elements_roundtrips():
    """ADVICE r15 (high): a constant-valued chunk encodes to a
    header-only stream (minbits == 0) regardless of element count, so
    the old `n > 8*len(raw)` guard falsely rejected any constant chunk
    over ~65k elements — e.g. a 300x300 float64 fill chunk. The bound
    now applies only when minbits > 0, sized by the payload's bit
    capacity."""
    n = 300 * 300
    data = np.full(n, 2.5, dtype="<f8")
    cd = scaleoffset_cd_values(SO_FLOAT_DSCALE, 2, n, "<f8")
    enc = h5_scaleoffset_encode(data.tobytes(), cd)
    assert len(enc) <= 16  # header-only stream
    out = np.frombuffer(h5_scaleoffset_decode(enc, cd), dtype="<f8")
    assert np.array_equal(out, data)
    # constant integer chunk too
    idata = np.full(n, 77, dtype="<u4")
    icd = scaleoffset_cd_values(SO_INT, 0, n, "<u4")
    ienc = h5_scaleoffset_encode(idata.tobytes(), icd)
    iout = np.frombuffer(h5_scaleoffset_decode(ienc, icd), dtype="<u4")
    assert np.array_equal(iout, idata)
    # minbits > 0 with an implausible count for the payload still raises
    small = h5_scaleoffset_encode(
        np.array([0, 1, 2, 3], dtype="<u2").tobytes(),
        scaleoffset_cd_values(SO_INT, 0, 4, "<u2"))
    big_cd = scaleoffset_cd_values(SO_INT, 0, 1 << 22, "<u2")
    with pytest.raises(ValueError):
        h5_scaleoffset_decode(small, big_cd)
