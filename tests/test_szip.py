"""szip (HDF5 filter id 4) — CCSDS 121.0-B-2 extended-Rice codec.

Two independent directions pin the wire format (the NTv2/JPEG
second-encoder discipline, VERDICT r13): spec-assembled bitstreams
built here with a local bit-packer (and one fully hand-hexed anchor)
must DECODE to known samples, and the writer twin must round-trip
through the decoder across the dtype/option matrix, inside full HDF5
containers, and under a corruption campaign.  An importorskip twin
cross-validates against real h5py+szip where those libs exist.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyresample_spark.sources.hdf5 import hdf5_grid_bytes, parse_hdf5
from pyresample_spark.sources.szip import (
    SZ_EC_OPTION_MASK,
    SZ_LSB_OPTION_MASK,
    SZ_MSB_OPTION_MASK,
    SZ_NN_OPTION_MASK,
    SZ_RAW_OPTION_MASK,
    h5_szip_decode,
    h5_szip_encode,
    rice_decode,
    rice_encode,
    szip_cd_values,
)


def bits(spec: str) -> bytes:
    """Independent test-side bit packer: '001 0001' → padded bytes."""
    s = spec.replace(" ", "")
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


# ---------------------------------------------------------------- spec
# fixtures: streams assembled from the CCSDS 121.0-B-2 grammar by hand


def test_hand_hexed_anchor_split_then_zero():
    """8-bit EC, J=4, scanline 8: a k=0 split block [3,1,2,0] then a
    literal 1-block zero run — assembled bit-by-bit on paper:
    ID=001 FS(3,1,2,0)=0001/01/001/1 then ID=000 ext=0 FS(0)=1."""
    stream = bytes([0x22, 0x98, 0x40])
    out = rice_decode(stream, 8, 8, 4, 8, SZ_EC_OPTION_MASK)
    assert out == [3, 1, 2, 0, 0, 0, 0, 0]


def test_spec_split_k0_with_reference():
    # NN scanline [100,101,99,99]: ref=100 raw, mapped deltas 2,3,0
    stream = bits("001 01100100 001 0001 1")
    out = rice_decode(stream, 4, 8, 4, 4, SZ_NN_OPTION_MASK)
    assert out == [100, 101, 99, 99]


def test_spec_split_k2():
    # EC block [5,6,1,3] with k=2: FS(v>>2)=FS(1,1,0,0) then 2-bit
    # LSBs 01,10,01,11; ID = k+1 = 3
    stream = bits("011 01 01 1 1 01 10 01 11")
    out = rice_decode(stream, 4, 8, 4, 4, SZ_EC_OPTION_MASK)
    assert out == [5, 6, 1, 3]


def test_spec_second_extension_with_reference():
    # NN [10,10,11,10]: ref=10, deltas (0,2,1) pair as (0,0),(2,1)
    # → γ = 0, 7; ID=000 ext=1
    stream = bits("000 1 00001010 1 00000001")
    out = rice_decode(stream, 4, 8, 4, 4, SZ_NN_OPTION_MASK)
    assert out == [10, 10, 11, 10]


def test_spec_second_extension_no_reference():
    # EC [1,0,2,1]: pairs (1,0),(2,1) → γ = 1(2)/2+0=1, 3(4)/2+1=7
    stream = bits("000 1 01 00000001")
    out = rice_decode(stream, 4, 8, 4, 4, SZ_EC_OPTION_MASK)
    assert out == [1, 0, 2, 1]


def test_spec_uncompressed_block():
    # ID all-ones: 4 raw 8-bit samples
    stream = bits("111 11111111 00000000 10000000 00000111")
    out = rice_decode(stream, 4, 8, 4, 4, SZ_EC_OPTION_MASK)
    assert out == [255, 0, 128, 7]


def test_spec_zero_run_ros_escape():
    # EC, J=2, scanline 16 → 8 blocks: [5,0] split k=0, then the
    # remaining 7 blocks via the remainder-of-segment escape (fs=4)
    stream = bits("001 000001 1 000 0 00001")
    out = rice_decode(stream, 16, 8, 2, 16, SZ_EC_OPTION_MASK)
    assert out == [5, 0] + [0] * 14


def test_spec_zero_run_literal_counts():
    # fs+1∈1..4 literal: J=2, 8 blocks: zero run of 3 (fs=2), block
    # [7,0] k=0, zero run of 4 (fs=3)
    stream = bits("000 0 001 001 00000001 1 000 0 0001")
    out = rice_decode(stream, 16, 8, 2, 16, SZ_EC_OPTION_MASK)
    assert out == [0] * 6 + [7, 0] + [0] * 8


def test_spec_zero_run_long_literal():
    # fs+1>5 → fs blocks: J=2, 16 blocks, run of 6 (fs=6) then ROS
    stream = bits("001 000001 1 000 0 0000001 000 0 00001")
    out = rice_decode(stream, 32, 8, 2, 32, SZ_EC_OPTION_MASK)
    assert out == [5, 0] + [0] * 30


def test_spec_nn_escape_deltas():
    """The non-symmetric mapper escape: pred=2, smax=255 → θ=2; a
    mapped value 7 > 2θ must decode to Δ=+5 (low side pinned)."""
    # NN scanline [2, 7]: ref=2, δ = θ+|Δ| = 2+5 = 7; J=2, k=0
    stream = bits("001 00000010 00000001")
    out = rice_decode(stream, 2, 8, 2, 2, SZ_NN_OPTION_MASK)
    assert out == [2, 7]
    # and the high side: pred=253 → θ=2, δ=7 → Δ=-5
    stream = bits("001 11111101 00000001")
    out = rice_decode(stream, 2, 8, 2, 2, SZ_NN_OPTION_MASK)
    assert out == [253, 248]


def test_spec_16bit_id_width_and_byte_orders():
    """bpp=16 uses a 4-bit ID; the HDF5 wrapper honours MSB vs LSB."""
    # one uncompressed block of two 16-bit samples [0x0102, 0x0304]
    stream = bits("1111" + "0000000100000010" + "0000001100000100")
    out = rice_decode(stream, 2, 16, 2, 2, SZ_EC_OPTION_MASK)
    assert out == [0x0102, 0x0304]
    raw = struct.pack("<I", 4) + stream
    msb = h5_szip_decode(
        raw, (SZ_MSB_OPTION_MASK | SZ_EC_OPTION_MASK
              | SZ_RAW_OPTION_MASK, 2, 16, 2))
    lsb = h5_szip_decode(
        raw, (SZ_LSB_OPTION_MASK | SZ_EC_OPTION_MASK
              | SZ_RAW_OPTION_MASK, 2, 16, 2))
    assert msb == bytes([1, 2, 3, 4])
    assert lsb == bytes([2, 1, 4, 3])


def test_scanline_resets_nn_reference():
    """Two scanlines: each starts with its own raw reference."""
    # pps=2, J=2: scanline A [200, 201], scanline B [3, 2]
    # A: ref=200, d=+1, th=min(200,55)=55 -> delta 2 = FS 001
    # B: ref=3, d=-1, th=3 -> delta 1 = FS 01
    stream = bits("001 11001000 001" + "001 00000011 01")
    out = rice_decode(stream, 4, 8, 2, 2, SZ_NN_OPTION_MASK)
    assert out == [200, 201, 3, 2]


# ------------------------------------------------------- encoder twin


@settings(max_examples=120, deadline=None)
@given(
    bpp=st.sampled_from([4, 8, 12, 16, 24, 32]),
    ppb=st.sampled_from([2, 8, 10, 16, 32]),
    pps_blocks=st.integers(1, 9),
    opt=st.sampled_from([SZ_NN_OPTION_MASK, SZ_EC_OPTION_MASK]),
    data=st.data(),
)
def test_roundtrip_property(bpp, ppb, pps_blocks, opt, data):
    pps = ppb * pps_blocks
    smax = (1 << bpp) - 1
    n = data.draw(st.integers(1, 3 * pps + ppb + 1))
    samples = data.draw(
        st.lists(
            st.one_of(
                st.integers(0, smax),
                st.just(0),
                st.integers(0, min(smax, 3)),
            ),
            min_size=n, max_size=n,
        )
    )
    enc = rice_encode(samples, bpp, ppb, pps, opt)
    assert rice_decode(enc, n, bpp, ppb, pps, opt) == samples


def test_encoder_beats_raw_on_smooth_data():
    """The point of szip on L1B radiances: smooth scanlines compress."""
    n = 4096
    s = [int(2000 + 40 * np.sin(i / 40)) for i in range(n)]
    enc = rice_encode(s, 16, 16, 128, SZ_NN_OPTION_MASK)
    assert len(enc) < n * 2 / 3  # ≥3× smaller than the raw 2-byte samples


def test_encoder_zero_runs_collapse():
    enc = rice_encode([0] * 4096, 16, 16, 128, SZ_EC_OPTION_MASK)
    assert len(enc) <= 48  # one ROS token per scanline, not 8 KiB


# ------------------------------------------------ HDF5 filter wrapper


@pytest.mark.parametrize("dt", ["u1", "<u2", ">u2", "<i2", "<u4",
                                ">i4", "<f4"])
@pytest.mark.parametrize("opt", ["nn", "ec"])
def test_hdf5_container_roundtrip(dt, opt):
    rng = np.random.RandomState(11)
    if "f" in dt:
        data = (rng.rand(20, 48) * 100).astype(dt)
    else:
        data = rng.randint(0, 200, (20, 48)).astype(dt)
    buf = hdf5_grid_bytes(
        {"band": (data, {})}, chunks={"band": (5, 16)},
        deflate=False, szip={"ppb": 8, "option": opt},
    )
    out = parse_hdf5(buf)["band"]["data"]
    assert np.array_equal(out.astype(data.dtype), data)


def test_hdf5_szip_with_fletcher32_and_v2_container():
    rng = np.random.RandomState(5)
    data = rng.randint(0, 60000, (20, 48)).astype("<u2")
    buf = hdf5_grid_bytes(
        {"band": (data, {})}, chunks={"band": (5, 16)}, deflate=False,
        szip={"ppb": 8}, fletcher32=True,
        superblock=2, chunk_index="fixed_array",
    )
    out = parse_hdf5(buf)["band"]["data"]
    assert np.array_equal(out.astype("<u2"), data)


def test_hdf5_ppb_wider_than_scanline_widens():
    """H5Zszip set_local: chunk fastest dim 4 < ppb 16 → the scanline
    spans the flattened chunk (min(ppb·128, npoints))."""
    rng = np.random.RandomState(9)
    data = rng.randint(0, 200, (16, 4)).astype("<u2")
    buf = hdf5_grid_bytes(
        {"band": (data, {})}, chunks={"band": (8, 4)}, deflate=False,
        szip={"ppb": 16},
    )
    out = parse_hdf5(buf)["band"]["data"]
    assert np.array_equal(out.astype("<u2"), data)


def test_hdf5_szip_plus_deflate_refused():
    with pytest.raises(ValueError, match="alternative compressors"):
        hdf5_grid_bytes(
            {"band": (np.zeros((4, 4), "<u2"), {})},
            chunks={"band": (2, 2)}, deflate=True, szip={"ppb": 2},
        )


def test_hdf5_szip_rejects_64bit():
    with pytest.raises(ValueError, match="32 bits"):
        hdf5_grid_bytes(
            {"band": (np.zeros((4, 4), "<f8"), {})},
            chunks={"band": (2, 4)}, deflate=False, szip={"ppb": 2},
        )


# ------------------------------------------------------------- guards


def test_decode_guard_truncated_stream():
    enc = h5_szip_encode(
        np.arange(64, dtype="<u2").tobytes(),
        szip_cd_values(SZ_NN_OPTION_MASK, 8, "<u2", 64),
    )
    cd = szip_cd_values(SZ_NN_OPTION_MASK, 8, "<u2", 64)
    with pytest.raises(ValueError, match="truncated"):
        h5_szip_decode(enc[: len(enc) // 2], cd)


def test_decode_guard_bad_cd_and_sizes():
    with pytest.raises(ValueError, match="client-data"):
        h5_szip_decode(b"\x00" * 8, (32, 8))
    with pytest.raises(ValueError, match="exactly one of NN/EC"):
        h5_szip_decode(
            b"\x00" * 8,
            (SZ_RAW_OPTION_MASK | SZ_NN_OPTION_MASK | SZ_EC_OPTION_MASK,
             8, 16, 64))
    with pytest.raises(ValueError, match="multiple"):
        h5_szip_decode(
            struct.pack("<I", 5) + b"\x00" * 4,
            (SZ_RAW_OPTION_MASK | SZ_NN_OPTION_MASK, 8, 16, 64))
    with pytest.raises(NotImplementedError, match="SZIP header"):
        h5_szip_decode(b"\x00" * 8, (SZ_NN_OPTION_MASK, 8, 16, 64))
    with pytest.raises(ValueError, match="implausible"):
        h5_szip_decode(
            struct.pack("<I", 1 << 30) + b"\xff" * 4,
            (SZ_RAW_OPTION_MASK | SZ_NN_OPTION_MASK, 8, 16, 64))


def test_decode_guard_zero_run_overruns_scanline():
    # literal run of 4 with only 2 blocks in the scanline
    stream = bits("000 0 0001")
    with pytest.raises(ValueError, match="crosses the scanline"):
        rice_decode(stream, 4, 8, 2, 4, SZ_EC_OPTION_MASK)


def test_corruption_campaign_loud_or_detected():
    """Strided byte corruption over a whole szip HDF5 file: every
    mutant either raises a loud error or changes decoded values —
    never hangs, never allocates unboundedly (fuzz_formats.py runs
    the exhaustive sweep offline)."""
    rng = np.random.RandomState(3)
    data = rng.randint(0, 300, (10, 32)).astype("<u2")
    base = hdf5_grid_bytes(
        {"band": (data, {})}, chunks={"band": (5, 16)}, deflate=False,
        szip={"ppb": 8},
    )
    allowed = (ValueError, NotImplementedError, KeyError, IndexError,
               struct.error, OverflowError, MemoryError, EOFError)
    for pos in range(0, len(base), 7):
        m = bytearray(base)
        m[pos] ^= 0x5A
        try:
            parse_hdf5(bytes(m))
        except allowed:
            pass


def test_cross_validate_against_real_h5py_szip(tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.RandomState(1)
    data = rng.randint(0, 4000, (20, 48)).astype("<u2")
    p = tmp_path / "szip.h5"
    with h5py.File(p, "w") as f:
        try:
            f.create_dataset("band", data=data, chunks=(5, 16),
                             compression="szip",
                             compression_opts=("nn", 8))
        except (ValueError, OSError):
            pytest.skip("h5py built without an szip encoder")
    out = parse_hdf5(p.read_bytes())["band"]["data"]
    assert np.array_equal(out.astype("<u2"), data)


def test_filter_mask_skips_szip():
    """H5Pset_szip registers the filter OPTIONAL: a writer without an
    szip encoder stores the chunk raw with the chunk key's filter-mask
    bit set — the pipeline must pass those bytes through untouched
    instead of Rice-decoding garbage."""
    from pyresample_spark.sources.hdf5 import _apply_filters

    cd = szip_cd_values(SZ_NN_OPTION_MASK, 8, "<u2", 64)
    raw = np.arange(64, dtype="<u2").tobytes()
    # pipeline [szip]; mask bit 0 set -> skipped
    assert _apply_filters(raw, 0b1, [(4, cd)], 2) == raw
    # and with the bit clear the same bytes are (correctly) rejected
    with pytest.raises(ValueError):
        _apply_filters(raw, 0b0, [(4, cd)], 2)
    # composed pipeline [szip, deflate] with only szip skipped
    import zlib

    comp = zlib.compress(raw)
    assert _apply_filters(comp, 0b1, [(4, cd), (1, ())], 2) == raw


def test_high_ratio_constant_chunk_roundtrips():
    """ADVICE r15 (high): zero-run coding legitimately reaches
    400-2000:1 on constant data (MODIS/VIIRS night side, bow-tie
    deletes); the old `stored > 64*len(raw)` plausibility cap falsely
    rejected the module's OWN encoder output for a 400 KB constant u2
    chunk (encodes to ~885 bytes). The bound now derives from the
    grammar's true minimum (one zero-run ROS token per 64-block
    segment)."""
    data = np.zeros(200_000, dtype="<u2")  # 400 KB constant chunk
    cd = szip_cd_values(SZ_NN_OPTION_MASK, 32, "<u2", 128)
    enc = h5_szip_encode(data.tobytes(), cd)
    assert len(enc) < len(data.tobytes()) // 64  # better than 64:1
    assert h5_szip_decode(enc, cd) == data.tobytes()
    # nonzero constant too (NN preprocessing: one reference + deltas)
    data2 = np.full(200_000, 1234, dtype="<u2")
    enc2 = h5_szip_encode(data2.tobytes(), cd)
    assert h5_szip_decode(enc2, cd) == data2.tobytes()
    # a genuinely corrupt size prefix is still rejected up front
    bogus = (0xFFFFFFFE).to_bytes(4, "little") + enc[4:]
    with pytest.raises(ValueError, match="implausible"):
        h5_szip_decode(bogus, cd)
