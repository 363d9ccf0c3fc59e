"""Pure-python HDF5 subset reader (sources/hdf5.py): files are built
byte-by-byte here from the PUBLIC HDF5 File Format Specification
(superblock v0, v1 object headers, group B-tree/SNOD/local heap,
contiguous + chunked/deflate layouts, v1 attributes), then parsed
back — reader and writer share no code, the same adversarial setup as
the NetCDF3/TIFF suites. The importorskip test at the bottom
cross-validates against REAL netcdf-c output the day xarray/h5py
appear in the environment."""

import struct
import zlib

import numpy as np
import pytest

from pyresample_spark.sources.hdf5 import (
    load_cf_area_h5,
    parse_hdf5,
)

UNDEF = 0xFFFFFFFFFFFFFFFF


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * ((8 - len(b) % 8) % 8)


def _dt_fixed(np_dtype) -> bytes:
    dt = np.dtype(np_dtype)
    if dt.kind in "iu":
        cls = 0
        bits0 = (0x01 if dt.byteorder == ">" else 0x00) | (
            0x08 if dt.kind == "i" else 0x00
        )
        props = struct.pack("<HH", 0, dt.itemsize * 8)
    elif dt.kind == "f":
        cls = 1
        bits0 = 0x01 if dt.byteorder == ">" else 0x00
        # bitoffset, precision, exponent loc/size, mantissa loc/size,
        # exponent bias (values per IEEE; the reader ignores them)
        if dt.itemsize == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        else:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
    elif dt.names:  # structured → compound (v1 unless built directly)
        return _dt_compound(dt, ver=1)
    else:
        raise ValueError(dt)
    return bytes([0x10 | cls, bits0, 0, 0]) + struct.pack(
        "<I", dt.itemsize
    ) + props


def _dt_string(n: int) -> bytes:
    return bytes([0x13, 0, 0, 0]) + struct.pack("<I", n)


def _dt_compound(np_dtype, ver=1) -> bytes:
    """Class-6 COMPOUND datatype message, spec-built forward encoder
    (IV.A.2.d): v1 pads member names to 8 and carries the 28-byte
    dimensionality block, v2 drops the block, v3 drops the padding
    and stores the offset in H5VM_limit_enc_size(compound size)
    bytes — the three encodings libhdf5 has written over the years."""
    dt = np.dtype(np_dtype)
    nmem = len(dt.names)
    head = bytes([(ver << 4) | 6, nmem & 0xFF, nmem >> 8, 0])
    head += struct.pack("<I", dt.itemsize)
    body = b""
    for name in dt.names:
        fdt, off = dt.fields[name]
        nb = name.encode() + b"\x00"
        if ver in (1, 2):
            body += nb + b"\x00" * ((8 - len(nb) % 8) % 8)
        else:
            body += nb
        if ver == 3:
            osz = (max(dt.itemsize, 1).bit_length() - 1) // 8 + 1
            body += off.to_bytes(osz, "little")
        else:
            body += struct.pack("<I", off)
        if ver == 1:
            # dimensionality(1) + reserved(3) + permutation(4) +
            # reserved(4) + four dim sizes(16) = 28 bytes, rank 0
            body += b"\x00" * 28
        body += (_dt_string(fdt.itemsize) if fdt.kind == "S"
                 else _dt_fixed(fdt))
    return head + body


def _ds_simple(shape, maxdims=None) -> bytes:
    flags = 1 if maxdims is not None else 0
    out = bytes([1, len(shape), flags, 0, 0, 0, 0, 0])
    for d in shape:
        out += struct.pack("<Q", d)
    if maxdims is not None:
        for d in maxdims:
            out += struct.pack("<Q", d)
    return out


def _ds_scalar() -> bytes:
    return bytes([1, 0, 0, 0, 0, 0, 0, 0])


def _attr_msg(name: str, value) -> bytes:
    nb = name.encode() + b"\x00"
    if isinstance(value, str):
        vb = value.encode()
        dt, ds, data = _dt_string(len(vb)), _ds_scalar(), vb
    elif isinstance(value, (list, tuple)):
        arr = np.asarray(value, dtype="<f8")
        dt, ds = _dt_fixed(arr.dtype), _ds_simple(arr.shape)
        data = arr.tobytes()
    else:
        arr = np.asarray([value], dtype="<i4")
        dt, ds, data = _dt_fixed(arr.dtype), _ds_scalar(), arr.tobytes()
    body = struct.pack("<BBHHH", 1, 0, len(nb), len(dt), len(ds))
    body += _pad8(nb) + _pad8(dt) + _pad8(ds) + data
    return body


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHBBBB", mtype, len(body), 0, 0, 0, 0) + body


def _object_header(messages: list) -> bytes:
    block = b"".join(messages)
    return (
        struct.pack("<BBHI", 1, 0, len(messages), 1)
        + struct.pack("<I", len(block))
        + b"\x00" * 4  # v1 prefix pads to 8 before the message block
        + block
    )


def _shuffle_fwd(raw: bytes, itemsize: int) -> bytes:
    # independent forward shuffle: explicit python loop, no numpy
    # transpose trick shared with the package implementation
    n = len(raw) // itemsize
    out = bytearray(len(raw))
    for i in range(n):
        for j in range(itemsize):
            out[j * n + i] = raw[i * itemsize + j]
    return bytes(out)


def _filter_msg(deflate, shuffle, itemsize, pipeline_v2=False):
    """Filter pipeline message body, v1 (padded) or v2 (packed)."""
    specs = []
    if shuffle:
        specs.append((2, 0, [itemsize]))
    if deflate:
        specs.append((1, 1, [6]))
    if pipeline_v2:
        out = bytes([2, len(specs)])
        for fid, fl, cds in specs:
            out += struct.pack("<HHH", fid, fl, len(cds))
            out += b"".join(struct.pack("<I", c) for c in cds)
        return out
    out = struct.pack("<BBHI", 1, len(specs), 0, 0)
    for fid, fl, cds in specs:
        out += struct.pack("<HHHH", fid, 0, fl, len(cds))
        out += b"".join(struct.pack("<I", c) for c in cds)
        if len(cds) % 2:
            out += b"\x00" * 4
    return out


def hdf5_bytes(datasets, chunk=None, deflate=False, raw_chunk_idx=(),
               shuffle=False, undef_addr=(), dt_override=None):
    """Minimal conforming HDF5 file: root group (symbol-table message
    → v1 B-tree → one SNOD → local heap) with one dataset per entry.

    ``datasets``: {name: (np_array | None, attrs dict)} — None array
    writes a dataless container (grid-mapping variable: scalar i4
    compact layout). ``chunk``: {name: (cdim0, cdim1)} switches that
    dataset to chunked layout (v1 type-1 B-tree, one node), optionally
    deflate-compressed (byte-shuffled first when ``shuffle`` — the
    netcdf-c recipe). Names in ``undef_addr`` write a contiguous
    layout whose data address is UNDEFINED (late allocation: a
    never-written variable, which netcdf-c emits for dataless vars)."""
    names = sorted(datasets)
    # ---- plan the heap (name offsets) ----
    heap_off = {}
    heap_data = b"\x00" * 8  # offset 0 reserved
    for n in names:
        heap_off[n] = len(heap_data)
        heap_data += n.encode() + b"\x00"
    heap_data = _pad8(heap_data)

    # layout order: superblock(96) | root OH | heap hdr(32) | heap data
    # | btree | SNOD | per-dataset OHs | data blobs
    pieces = {}
    addr = {}

    def place(key, blob):
        addr[key] = place.cursor
        pieces[key] = blob
        place.cursor += len(blob)
    place.cursor = 96

    # root OH: symbol table message (btree + heap addrs patched later)
    root_oh = _object_header([_msg(0x0011, struct.pack("<QQ", 0, 0))])
    place("root_oh", root_oh)
    place("heap_hdr", b"\x00" * 32)
    place("heap_data", heap_data)
    btree = (
        b"TREE" + bytes([0, 0]) + struct.pack("<H", 1)
        + struct.pack("<QQ", UNDEF, UNDEF)
        + struct.pack("<Q", 0)            # key0
        + struct.pack("<Q", 0)            # ptr0 → SNOD (patched)
        + struct.pack("<Q", len(heap_data) - 1)  # key1
    )
    place("btree", btree)
    snod = b"SNOD" + bytes([1, 0]) + struct.pack("<H", len(names))
    for n in names:
        snod += struct.pack("<QQ", heap_off[n], 0)  # OH addr patched
        snod += struct.pack("<II", 0, 0) + b"\x00" * 16
    place("snod", snod)

    # datasets: build headers with placeholder addresses, then data
    data_blobs = {}
    for n in names:
        arr, attrs = datasets[n]
        msgs = [_msg(0x000C, _attr_msg(k, v)) for k, v in attrs.items()]
        if arr is None:
            comp = np.asarray([0], dtype="<i4").tobytes()
            msgs += [
                _msg(0x0001, _ds_scalar()),
                _msg(0x0003, _dt_fixed("<i4")),
                _msg(0x0008, struct.pack("<BBH", 3, 0, len(comp)) + comp),
            ]
            place(("oh", n), _object_header(msgs))
            continue
        arr = np.ascontiguousarray(arr)
        msgs += [
            _msg(0x0001, _ds_simple(arr.shape)),
            _msg(0x0003, (dt_override or {}).get(n)
                 or _dt_fixed(arr.dtype)),
        ]
        if chunk and n in chunk:
            cd = chunk[n]
            if deflate or shuffle:
                msgs.append(_msg(0x000B, _filter_msg(
                    deflate, shuffle, arr.dtype.itemsize
                )))
            lay = struct.pack("<BBB", 3, 2, len(cd) + 1)
            lay += struct.pack("<Q", 0)  # btree addr patched
            for c in cd:
                lay += struct.pack("<I", c)
            lay += struct.pack("<I", arr.dtype.itemsize)
            msgs.append(_msg(0x0008, lay))
        elif n in undef_addr:
            lay = struct.pack("<BB", 3, 1) + struct.pack(
                "<QQ", UNDEF, arr.nbytes  # late allocation, no patch
            )
            msgs.append(_msg(0x0008, lay))
        else:
            lay = struct.pack("<BB", 3, 1) + struct.pack(
                "<QQ", 0, arr.nbytes  # addr patched
            )
            msgs.append(_msg(0x0008, lay))
        place(("oh", n), _object_header(msgs))

    for n in names:
        arr, attrs = datasets[n]
        if arr is None:
            continue
        arr = np.ascontiguousarray(arr)
        if chunk and n in chunk:
            cd = chunk[n]
            rank = arr.ndim
            chunks = []
            for r0 in range(0, arr.shape[0], cd[0]):
                for c0 in range(0, arr.shape[1], cd[1]):
                    block = np.zeros(cd, dtype=arr.dtype)
                    rs = min(cd[0], arr.shape[0] - r0)
                    cs = min(cd[1], arr.shape[1] - c0)
                    block[:rs, :cs] = arr[r0:r0 + rs, c0:c0 + cs]
                    raw = block.tobytes()
                    mask = 0
                    if shuffle:
                        raw = _shuffle_fwd(raw, arr.dtype.itemsize)
                    if deflate:
                        if len(chunks) in raw_chunk_idx:
                            # optional filter skipped: mask bit =
                            # deflate's PIPELINE INDEX (1 after shuffle)
                            mask = 1 << (1 if shuffle else 0)
                        else:
                            raw = zlib.compress(raw, 6)
                    chunks.append(((r0, c0), raw, mask))
            for i, (off2, raw, mask) in enumerate(chunks):
                place(("chunk", n, i), raw)
            key_size = 8 + 8 * (rank + 1)
            bt = b"TREE" + bytes([1, 0]) + struct.pack("<H", len(chunks))
            bt += struct.pack("<QQ", UNDEF, UNDEF)
            for i, ((r0, c0), raw, mask) in enumerate(chunks):
                bt += struct.pack("<II", len(raw), mask)
                bt += struct.pack("<QQQ", r0, c0, 0)
                bt += struct.pack("<Q", addr[("chunk", n, i)])
            bt += struct.pack("<II", 0, 0) + struct.pack(  # final key
                "<QQQ", arr.shape[0], arr.shape[1], 0
            )
            place(("btree", n), bt)
        elif n in undef_addr:
            pass  # late allocation: no data anywhere in the file
        else:
            place(("data", n), arr.tobytes())

    total = place.cursor

    # ---- patch addresses now that everything is placed ----
    root_oh = bytearray(pieces["root_oh"])
    # symbol table message body starts at prefix(16) + msg hdr(8)
    struct.pack_into("<QQ", root_oh, 24, addr["btree"], addr["heap_hdr"])
    pieces["root_oh"] = bytes(root_oh)
    pieces["heap_hdr"] = (
        b"HEAP" + bytes([0, 0, 0, 0])
        + struct.pack("<QQQ", len(heap_data), UNDEF, addr["heap_data"])
    )
    bt = bytearray(pieces["btree"])
    struct.pack_into("<Q", bt, 32, addr["snod"])
    pieces["btree"] = bytes(bt)
    sn = bytearray(pieces["snod"])
    for i, n in enumerate(names):
        struct.pack_into("<Q", sn, 8 + 40 * i + 8, addr[("oh", n)])
    pieces["snod"] = bytes(sn)
    for n in names:
        arr, attrs = datasets[n]
        if arr is None or n in undef_addr:
            continue
        oh = bytearray(pieces[("oh", n)])
        # find the layout message (type 8) and patch its address field
        off = 16
        while off < len(oh):
            mtype = struct.unpack_from("<H", oh, off)[0]
            msize = struct.unpack_from("<H", oh, off + 2)[0]
            if mtype == 0x0008:
                if oh[off + 9] == 1:  # contiguous: addr at body+2
                    struct.pack_into(
                        "<Q", oh, off + 8 + 2, addr[("data", n)]
                    )
                else:  # chunked: btree addr at body+3
                    struct.pack_into(
                        "<Q", oh, off + 8 + 3, addr[("btree", n)]
                    )
            off += 8 + msize
        pieces[("oh", n)] = bytes(oh)

    sb = b"\x89HDF\r\n\x1a\n"
    sb += bytes([0, 0, 0, 0, 0, 8, 8, 0])
    sb += struct.pack("<HH", 4, 16)  # leaf k, internal k
    sb += struct.pack("<I", 0)
    sb += struct.pack("<QQQQ", 0, UNDEF, total, UNDEF)
    # root symbol table entry
    sb += struct.pack("<QQ", 0, addr["root_oh"])
    sb += struct.pack("<II", 1, 0)
    sb += struct.pack("<QQ", addr["btree"], addr["heap_hdr"])
    assert len(sb) == 96, len(sb)

    out = bytearray(sb)
    ordered = sorted(addr.items(), key=lambda kv: kv[1])
    for key, a in ordered:
        assert len(out) == a, (key, a, len(out))
        out += pieces[key]
    return bytes(out)


def _cf_file(**kw):
    xs = np.array([10.25 + 0.5 * i for i in range(8)], dtype="<f8")
    ys = np.array([50.0 - 0.25 * j for j in range(6)], dtype="<f8")
    data = np.arange(48, dtype="<f8").reshape(6, 8)
    return hdf5_bytes(
        {
            "x": (xs, {"CLASS": "DIMENSION_SCALE", "NAME": "x"}),
            "y": (ys, {"CLASS": "DIMENSION_SCALE", "NAME": "y"}),
            "crs": (None, {"proj4": "eqc", "grid_mapping_name": "eqc"}),
            "t2m": (data, {"grid_mapping": "crs", "units": "K"}),
        },
        **kw,
    )


def test_parse_contiguous():
    buf = _cf_file()
    ds = parse_hdf5(buf)
    assert set(ds) == {"x", "y", "crs", "t2m"}
    assert ds["t2m"]["shape"] == (6, 8)
    assert ds["t2m"]["attrs"]["grid_mapping"] == "crs"
    assert ds["t2m"]["attrs"]["units"] == "K"
    np.testing.assert_array_equal(
        ds["t2m"]["data"], np.arange(48, dtype="f8").reshape(6, 8)
    )
    assert ds["x"]["data"].tolist() == [10.25 + 0.5 * i for i in range(8)]
    assert ds["crs"]["attrs"]["proj4"] == "eqc"


@pytest.mark.parametrize("deflate", [False, True])
def test_parse_chunked(deflate):
    """Chunked layout with edge-partial chunks (6x8 in 4x3 chunks),
    optionally deflate-filtered — the netcdf-c compressed layout."""
    buf = _cf_file(chunk={"t2m": (4, 3)}, deflate=deflate)
    ds = parse_hdf5(buf)
    np.testing.assert_array_equal(
        ds["t2m"]["data"], np.arange(48, dtype="f8").reshape(6, 8)
    )


@pytest.mark.parametrize("chunk", [None, {"t2m": (4, 3)}])
def test_cf_area_from_hdf5(chunk):
    buf = _cf_file(**({"chunk": chunk, "deflate": True} if chunk else {}))
    area, var = load_cf_area_h5(buf)
    assert var == "t2m"
    assert area.crs == "eqc"
    assert (area.width, area.height) == (8, 6)
    assert area.area_extent == (10.0, 48.625, 14.0, 50.125)


def test_load_cf_area_dispatches_hdf5(tmp_path):
    from pyresample_spark.sources.cf_raster import load_cf_area

    p = tmp_path / "modern.nc"
    p.write_bytes(_cf_file(chunk={"t2m": (4, 3)}, deflate=True))
    area = load_cf_area(str(p))
    assert area.crs == "eqc" and (area.width, area.height) == (8, 6)


def test_integer_dtypes_roundtrip():
    arr = np.array([[1, -2, 3], [4, 5, -6]], dtype="<i2")
    buf = hdf5_bytes({"v": (arr, {}), "x": (
        np.array([0.5, 1.5, 2.5]), {"CLASS": "DIMENSION_SCALE"}
    ), "y": (np.array([1.0, 0.0]), {"CLASS": "DIMENSION_SCALE"})})
    ds = parse_hdf5(buf)
    np.testing.assert_array_equal(ds["v"]["data"], arr.astype("i2"))


def _scale_table():
    """A netcdf-c-style compound scale/index table with PADDING: the
    stored member offsets (0/8/16/20) leave a 2-byte hole after the
    u2 and 4 trailing bytes — exactly what struct-aligned C writers
    emit, so offset handling (not just field order) is exercised."""
    dt = np.dtype({
        "names": ["band", "scale", "offset", "tag"],
        "formats": ["<u2", "<f8", "<i4", "S3"],
        "offsets": [0, 8, 16, 20],
        "itemsize": 24,
    })
    tbl = np.zeros(5, dtype=dt)
    tbl["band"] = [1, 2, 3, 7, 9]
    tbl["scale"] = [0.5, 0.25, 1.5, -2.0, 0.125]
    tbl["offset"] = [-10, 20, 0, 7, -1]
    tbl["tag"] = [b"VIS", b"IR", b"WV", b"X", b"HRV"]
    return tbl


@pytest.mark.parametrize("ver", [1, 2, 3])
def test_compound_contiguous_all_versions(ver):
    """Compound (class 6) datasets decode to numpy structured arrays
    for all three member encodings libhdf5 has written (v1 padded
    names + dimensionality block, v2 packed, v3 minimal offsets)."""
    tbl = _scale_table()
    buf = hdf5_bytes({"scales": (tbl, {"purpose": "cal"})},
                     dt_override={"scales": _dt_compound(tbl.dtype,
                                                         ver=ver)})
    ds = parse_hdf5(buf)
    got = ds["scales"]["data"]
    assert got.dtype.names == ("band", "scale", "offset", "tag")
    assert ds["scales"]["attrs"]["purpose"] == "cal"
    for f in tbl.dtype.names:
        np.testing.assert_array_equal(got[f], tbl[f])


def test_compound_big_endian_members():
    """Mixed-endian members byte-swap to native on read like scalar
    datasets do."""
    dt = np.dtype([("a", ">u4"), ("b", ">f8"), ("c", "<i2")])
    tbl = np.zeros(3, dtype=dt)
    tbl["a"] = [1, 70000, 2 ** 31]
    tbl["b"] = [1.5, -2.25, 3e7]
    tbl["c"] = [-5, 0, 17]
    buf = hdf5_bytes({"t": (tbl, {})})
    got = parse_hdf5(buf)["t"]["data"]
    for f in dt.names:
        np.testing.assert_array_equal(got[f], tbl[f])
        assert got.dtype.fields[f][0].byteorder in ("=", "<", "|")


def test_compound_chunked_shuffle_deflate():
    """Chunked compound through the netcdf-c filter recipe: shuffle
    uses the FULL compound itemsize as its stride, then deflate;
    edge-partial chunks included (4x3 in 3x2 chunks)."""
    dt = _scale_table().dtype
    tbl = np.zeros((4, 3), dtype=dt)
    tbl["band"] = np.arange(12).reshape(4, 3)
    tbl["scale"] = np.linspace(-2, 2, 12).reshape(4, 3)
    tbl["offset"] = (np.arange(12) ** 2 - 7).reshape(4, 3)
    tbl["tag"][:] = b"ok"
    buf = hdf5_bytes({"scales": (tbl, {})}, chunk={"scales": (3, 2)},
                     deflate=True, shuffle=True)
    got = parse_hdf5(buf)["scales"]["data"]
    for f in dt.names:
        np.testing.assert_array_equal(got[f], tbl[f])


def test_compound_nested_member_decodes():
    """Nested compound members (round 12): a v1 compound whose member
    is itself a compound lands as a nested structured dtype."""
    from pyresample_spark.sources.hdf5 import _parse_datatype

    inner = _dt_compound(np.dtype([("x", "<f4")]), ver=1)
    nested = (bytes([0x16, 1, 0, 0]) + struct.pack("<I", 4)
              + b"m\x00" + b"\x00" * 6 + struct.pack("<I", 0)
              + b"\x00" * 28 + inner)
    dt = _parse_datatype(nested)
    assert dt.names == ("m",)
    assert dt["m"].names == ("x",)
    assert dt["m"]["x"] == np.dtype("<f4")


def test_compound_v1_array_member_decodes():
    """v1 rank > 0 members (the pre-1.8 array-member encoding, before
    class 10 existed) decode to numpy subarray fields; dims live in
    the four u4 size words of the 28-byte dimensionality block."""
    from pyresample_spark.sources.hdf5 import _parse_datatype

    dims_block = (bytes([2]) + b"\x00" * 3      # rank 2 + reserved
                  + struct.pack("<I", 0)         # permutation
                  + b"\x00" * 4                 # reserved
                  + struct.pack("<4I", 2, 3, 0, 0))
    arr_member = (bytes([0x16, 1, 0, 0]) + struct.pack("<I", 24)
                  + b"m\x00" + b"\x00" * 6 + struct.pack("<I", 0)
                  + dims_block + _dt_fixed("<f4"))
    dt = _parse_datatype(arr_member)
    assert dt["m"].subdtype == (np.dtype("<f4"), (2, 3))
    rec = np.frombuffer(
        np.arange(6, dtype="<f4").tobytes(), dtype=dt)
    np.testing.assert_array_equal(
        rec["m"][0], np.arange(6, dtype="<f4").reshape(2, 3))


def test_compound_out_of_subset_guards():
    """Vlen members and corrupt array shapes still raise loudly
    instead of misreading."""
    from pyresample_spark.sources.hdf5 import _parse_datatype

    vlen_member = (bytes([0x16, 1, 0, 0]) + struct.pack("<I", 16)
                   + b"m\x00" + b"\x00" * 6 + struct.pack("<I", 0)
                   + b"\x00" * 28
                   + bytes([0x19, 1, 0, 0]) + struct.pack("<I", 16)
                   + _dt_string(16))  # vlen property = base datatype
    with pytest.raises(NotImplementedError, match="vlen/region-ref-typed"):
        _parse_datatype(vlen_member)
    # a vlen message TRUNCATED before its base datatype is corruption
    with pytest.raises(ValueError, match="truncated"):
        _parse_datatype(bytes([0x19, 1, 0, 0]) + struct.pack("<I", 16))
    # v1 rank set but all dim words zero: corruption, not a shape
    zero_dims = (bytes([0x16, 1, 0, 0]) + struct.pack("<I", 16)
                 + b"m\x00" + b"\x00" * 6 + struct.pack("<I", 0)
                 + bytes([2]) + b"\x00" * 27 + _dt_fixed("<f4"))
    with pytest.raises(ValueError, match="zero dimension"):
        _parse_datatype(zero_dims)


def test_array_datatype_class10_both_versions():
    """Standalone ARRAY datatype (class 10): v2 carries reserved +
    permutation words, v3 (what libhdf5 >= 1.8 and our writer emit)
    drops them. Both must parse to the same subarray dtype."""
    from pyresample_spark.sources.hdf5 import _parse_datatype

    base = _dt_fixed("<f8")
    v3 = (bytes([0x3A, 0, 0, 0]) + struct.pack("<I", 32)
          + bytes([2]) + struct.pack("<2I", 2, 2) + base)
    v2 = (bytes([0x2A, 0, 0, 0]) + struct.pack("<I", 32)
          + bytes([2]) + b"\x00" * 3 + struct.pack("<2I", 2, 2)
          + struct.pack("<2I", 0, 1) + base)
    assert _parse_datatype(v3).subdtype == (np.dtype("<f8"), (2, 2))
    assert _parse_datatype(v2).subdtype == (np.dtype("<f8"), (2, 2))


def test_compound_nested_array_roundtrip_via_writer():
    """Writer emits nested compounds recursively and subarray members
    as ARRAY class 10 v3; the reader decodes its own output — a full
    calibration-table shape (band id, per-band coefficient vector,
    nested window struct) through hdf5_grid_bytes."""
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes, parse_hdf5

    cal = np.zeros(3, dtype=np.dtype({
        "names": ["band", "coeffs", "win"],
        "formats": ["<i4", ("<f8", (4,)),
                    np.dtype({"names": ["lo", "hi"],
                              "formats": ["<f4", "<f4"],
                              "offsets": [0, 4], "itemsize": 8})],
        "offsets": [0, 8, 40], "itemsize": 48}))
    cal["band"] = [1, 2, 3]
    cal["coeffs"] = np.arange(12.0).reshape(3, 4)
    cal["win"]["lo"] = [0.1, 0.2, 0.3]
    cal["win"]["hi"] = [1.1, 1.2, 1.3]
    buf = hdf5_grid_bytes({
        "x": (np.arange(8.0) + 0.5, {"CLASS": "DIMENSION_SCALE"}),
        "y": (-(np.arange(6.0) + 0.5), {"CLASS": "DIMENSION_SCALE"}),
        "crs": (None, {"proj4": "eqc"}),
        "band": (np.arange(48.0).reshape(6, 8), {"grid_mapping": "crs"}),
        "calibration": (cal, {}),
    })
    out = parse_hdf5(buf)["calibration"]["data"]
    np.testing.assert_array_equal(out["band"], cal["band"])
    np.testing.assert_allclose(out["coeffs"], cal["coeffs"])
    np.testing.assert_allclose(out["win"]["lo"], cal["win"]["lo"])
    np.testing.assert_allclose(out["win"]["hi"], cal["win"]["hi"])


def test_h5py_reads_nested_compound_output(tmp_path):
    """The day h5py appears: our nested-compound/array-member output
    must be externally readable."""
    h5py = pytest.importorskip("h5py")
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes

    cal = np.zeros(2, dtype=np.dtype(
        [("band", "<i4"), ("coeffs", "<f8", (3,)),
         ("win", [("lo", "<f4"), ("hi", "<f4")])]))
    cal["band"] = [7, 9]
    cal["coeffs"] = [[1, 2, 3], [4, 5, 6]]
    cal["win"]["lo"] = [0.5, 0.6]
    buf = hdf5_grid_bytes({
        "x": (np.arange(4.0), {"CLASS": "DIMENSION_SCALE"}),
        "y": (np.arange(3.0), {"CLASS": "DIMENSION_SCALE"}),
        "crs": (None, {"proj4": "eqc"}),
        "band": (np.arange(12.0).reshape(3, 4),
                 {"grid_mapping": "crs"}),
        "calibration": (cal, {}),
    })
    p = tmp_path / "nested.h5"
    p.write_bytes(buf)
    with h5py.File(str(p), "r") as fh:
        got = fh["calibration"][...]
        np.testing.assert_array_equal(got["band"], cal["band"])
        np.testing.assert_allclose(got["coeffs"], cal["coeffs"])
        np.testing.assert_allclose(got["win"]["lo"], cal["win"]["lo"])


def test_compound_side_table_does_not_hijack_cf_pick():
    """A CF grid file that ALSO carries a compound side table (the
    real L1B layout) still picks the numeric grid variable, and the
    table itself stays readable from the parse."""
    xs = np.array([10.25 + 0.5 * i for i in range(8)], dtype="<f8")
    ys = np.array([50.0 - 0.25 * j for j in range(6)], dtype="<f8")
    data = np.arange(48, dtype="<f8").reshape(6, 8)
    tbl2d = np.zeros((2, 3), dtype=[("a", "<f8"), ("b", "<i4")])
    tbl2d["a"] = np.arange(6).reshape(2, 3)
    buf = hdf5_bytes({
        "x": (xs, {"CLASS": "DIMENSION_SCALE", "NAME": "x"}),
        "y": (ys, {"CLASS": "DIMENSION_SCALE", "NAME": "y"}),
        "crs": (None, {"proj4": "eqc"}),
        "t2m": (data, {"grid_mapping": "crs"}),
        "cal": (tbl2d, {}),
    })
    area, var = load_cf_area_h5(buf)
    assert var == "t2m"
    assert (area.width, area.height) == (8, 6)
    np.testing.assert_array_equal(
        parse_hdf5(buf)["cal"]["data"]["a"], tbl2d["a"])


def test_rejects_out_of_subset():
    buf = bytearray(_cf_file())
    buf[8] = 1  # superblock version 1 (adds istore-K: layout shifts)
    with pytest.raises(NotImplementedError, match="superblock version"):
        parse_hdf5(bytes(buf))
    with pytest.raises(ValueError, match="not an HDF5"):
        parse_hdf5(b"CDF\x01" + b"\x00" * 64)


def test_granule_ingest_mixed_nc3_and_hdf5(spark, tmp_path):
    """The distributed 'netcdf3' ingest path detects the container per
    file, so a granule directory can mix classic CDF-1, 64-bit-data
    CDF-5 and netCDF4/HDF5 files."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_binary_raster import _demo_nc
    from pyresample_spark.sources.binary_raster import read_raster_pixels

    (tmp_path / "classic.nc").write_bytes(_demo_nc())
    (tmp_path / "cdf5.nc").write_bytes(_demo_nc(version=5))
    (tmp_path / "modern.nc").write_bytes(
        _cf_file(chunk={"t2m": (4, 3)}, deflate=True)
    )
    px = read_raster_pixels(spark, str(tmp_path), "netcdf3").collect()
    assert len(px) == 144  # 48 pixels from each granule
    got = {(r.file.split("/")[-1], r.row, r.col): r.value for r in px}
    want_classic = (
        (np.arange(48).reshape(6, 8) // 8) * 10
        + np.arange(48).reshape(6, 8) % 8
    )
    want_modern = np.arange(48).reshape(6, 8)
    for i in range(6):
        for j in range(8):
            assert got[("classic.nc", i, j)] == float(want_classic[i, j])
            assert got[("cdf5.nc", i, j)] == float(want_classic[i, j])
            assert got[("modern.nc", i, j)] == float(want_modern[i, j])


def test_cross_validate_against_real_netcdf4(tmp_path):
    """The day h5py/netCDF4 appear: a REAL netcdf-c-written file must
    parse natively to the same grid (the non-tautology check for the
    hand-built fixtures). Skipped while the libs are absent."""
    nc = pytest.importorskip("netCDF4")

    p = tmp_path / "real.nc"
    ds = nc.Dataset(str(p), "w", format="NETCDF4")
    ds.createDimension("y", 2)
    ds.createDimension("x", 3)
    vx = ds.createVariable("x", "f8", ("x",))
    vy = ds.createVariable("y", "f8", ("y",))
    # zlib+shuffle = netcdf-c's canonical compression recipe — the
    # native shuffle decode is then validated against real output
    vv = ds.createVariable("t", "f8", ("y", "x"), zlib=True,
                           shuffle=True, chunksizes=(2, 2))
    vx[:] = [0.5, 1.5, 2.5]
    vy[:] = [1.0, 0.0]
    vv[:] = np.arange(6).reshape(2, 3)
    vv.grid_mapping = "crs"
    ds.close()
    area, var = load_cf_area_h5(p.read_bytes())
    assert var == "t" and (area.width, area.height) == (3, 2)


def test_package_writer_cross_parses():
    """The package-side writer (sources/hdf5.py hdf5_grid_bytes — a
    different implementation from this file's) must produce files the
    reader decodes to identical values, both layouts."""
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes

    xs = np.array([10.25 + 0.5 * i for i in range(8)])
    ys = np.array([50.0 - 0.25 * j for j in range(6)])
    data = np.arange(48, dtype="<f8").reshape(6, 8) * 1.5 - 7.0
    for ch in (None, {"band": (4, 3)}):
        buf = hdf5_grid_bytes(
            {
                "x": (xs, {"CLASS": "DIMENSION_SCALE"}),
                "y": (ys, {"CLASS": "DIMENSION_SCALE"}),
                "crs": (None, {"proj4": "eqc"}),
                "band": (data, {"grid_mapping": "crs"}),
            },
            chunks=ch,
        )
        ds = parse_hdf5(buf)
        np.testing.assert_array_equal(ds["band"]["data"], data)
        area, var = load_cf_area_h5(buf)
        assert var == "band" and area.crs == "eqc"
        assert (area.width, area.height) == (8, 6)


def test_chunk_filter_mask_skips_inflate():
    """A valid file with an OPTIONAL deflate filter stores an
    incompressible chunk raw with the key's filter-mask bit set — the
    reader must honor the mask instead of inflating raw bytes."""
    buf = _cf_file(chunk={"t2m": (4, 3)}, deflate=True,
                   raw_chunk_idx={1, 4})
    ds = parse_hdf5(buf)
    np.testing.assert_array_equal(
        ds["t2m"]["data"], np.arange(48, dtype="f8").reshape(6, 8)
    )


# ---------------------------------------------------------------------------
# Round 9: shuffle filter, v2 superblock / OHDR / OCHK, late-allocation
# datasets, corrupt-chain guards (VERDICT r8 items 2-3, ADVICE r8)


@pytest.mark.parametrize("masked", [(), (2,)])
def test_parse_shuffle_deflate(masked):
    """shuffle+deflate — netcdf-c's canonical compression recipe. The
    chunk bytes are shuffled by an explicit python loop here, so the
    reader's vectorized de-interleave is independently checked. The
    masked variant skips the OPTIONAL deflate on one chunk, whose mask
    bit is now deflate's pipeline INDEX (1), not 0."""
    buf = _cf_file(chunk={"t2m": (4, 3)}, deflate=True, shuffle=True,
                   raw_chunk_idx=masked)
    ds = parse_hdf5(buf)
    np.testing.assert_array_equal(
        ds["t2m"]["data"], np.arange(48, dtype="f8").reshape(6, 8)
    )
    area, var = load_cf_area_h5(buf)
    assert var == "t2m" and (area.width, area.height) == (8, 6)


def test_shuffle_i2_dtype():
    """Shuffle with a 2-byte dtype (itemsize ≠ 8 exercises the
    transpose geometry)."""
    arr = np.array([[300, -2, 3, 7], [4, 500, -6, -7]], dtype="<i2")
    buf = hdf5_bytes(
        {"v": (arr, {})}, chunk={"v": (2, 2)}, deflate=True, shuffle=True
    )
    np.testing.assert_array_equal(parse_hdf5(buf)["v"]["data"], arr)


def test_undefined_data_address_is_dataless():
    """A contiguous dataset at the UNDEFINED address (late allocation:
    netcdf-c's never-written grid-mapping containers) must parse as a
    dataless variable KEEPING its attrs — not fail the whole file
    (ADVICE r8 low #3)."""
    xs = np.array([10.25 + 0.5 * i for i in range(8)], dtype="<f8")
    ys = np.array([50.0 - 0.25 * j for j in range(6)], dtype="<f8")
    data = np.arange(48, dtype="<f8").reshape(6, 8)
    buf = hdf5_bytes(
        {
            "x": (xs, {"CLASS": "DIMENSION_SCALE"}),
            "y": (ys, {"CLASS": "DIMENSION_SCALE"}),
            "crs": (np.zeros((), dtype="<i4"), {"proj4": "eqc"}),
            "t2m": (data, {"grid_mapping": "crs"}),
        },
        undef_addr={"crs"},
    )
    ds = parse_hdf5(buf)
    assert ds["crs"]["data"] is None
    assert ds["crs"]["attrs"]["proj4"] == "eqc"
    np.testing.assert_array_equal(ds["t2m"]["data"], data)
    area, var = load_cf_area_h5(buf)
    assert var == "t2m" and area.crs == "eqc"


def test_continuation_cycle_raises():
    """A corrupt/adversarial header whose continuation message points
    back at the message block must raise, not hang the executor
    (ADVICE r8 low #2)."""
    # v1 object header claiming 9 messages whose only real message is
    # a continuation pointing at ITSELF
    cont = struct.pack("<QQ", 112 + 16, 24)  # block addr = own block
    oh = (
        struct.pack("<BBHII", 1, 0, 9, 1, 24) + b"\x00" * 4
        + struct.pack("<HHBBBB", 0x0010, 16, 0, 0, 0, 0) + cont
    )
    buf = bytearray(_cf_file())
    addr = len(buf)
    # splice: root OH addr in the superblock's symbol-table entry → oh
    buf += b"\x00" * ((8 - len(buf) % 8) % 8)
    addr = len(buf)
    buf += oh
    struct.pack_into("<Q", buf, 56 + 8, addr)
    # the self-referencing block replays its own continuation forever
    # without the guard; with it, a loud ValueError
    cont2 = struct.pack("<QQ", addr + 16, 24)
    buf[addr + 16 + 8:addr + 16 + 8 + 16] = cont2
    with pytest.raises(ValueError, match="cycle|chain"):
        parse_hdf5(bytes(buf))


def _msg_v2(mtype: int, body: bytes) -> bytes:
    return bytes([mtype]) + struct.pack("<H", len(body)) + b"\x00" + body


def _ohdr_v2(messages: list) -> bytes:
    """v2 object header, zero checksum — the reader must not VERIFY
    checksums (it has no business rejecting files over a hash it
    cannot repair); real writers put lookup3 there."""
    block = b"".join(messages)
    return (
        b"OHDR" + bytes([2, 0x02]) + struct.pack("<I", len(block))
        + block + b"\x00" * 4
    )


def _link_msg(name: str, addr: int) -> bytes:
    nb = name.encode()
    return _msg_v2(
        0x06, bytes([1, 0, len(nb)]) + nb + struct.pack("<Q", addr)
    )


def hdf5_bytes_v2(datasets, chunk=None, deflate=False, shuffle=False,
                  ochk_attrs=False):
    """HDF5 ≥1.8 ``libver`` v2 container, built independently of the
    package writer: v2 superblock, v2 OHDR headers everywhere (root
    group = hard-link messages; datasets = v2 headers with a
    filter-pipeline-v2 message when filtered), v1 chunk B-trees
    (the layout HDF5 1.8 emits under superblock v2 — 1.10's v4
    layouts/new indexes stay out of subset). ``ochk_attrs`` moves each
    dataset's attribute messages into an OCHK continuation block."""
    names = sorted(datasets)
    pieces, addr = {}, {}

    def place(key, blob):
        addr[key] = place.cursor
        pieces[key] = blob
        place.cursor += len(blob)
    place.cursor = 48

    chunk = chunk or {}
    data_keys = {}
    for n in names:
        arr, attrs = datasets[n]
        amsgs = [_msg_v2(0x0C, _attr_msg(k, v)) for k, v in attrs.items()]
        if arr is None:
            comp = np.asarray([0], dtype="<i4").tobytes()
            msgs = [
                _msg_v2(0x01, _ds_scalar()),
                _msg_v2(0x03, _dt_fixed("<i4")),
                _msg_v2(0x08, struct.pack("<BBH", 3, 0, len(comp)) + comp),
            ]
        else:
            arr = np.ascontiguousarray(arr)
            msgs = [
                _msg_v2(0x01, _ds_simple(arr.shape)),
                _msg_v2(0x03, _dt_fixed(arr.dtype)),
            ]
            if n in chunk:
                if deflate or shuffle:
                    msgs.append(_msg_v2(0x0B, _filter_msg(
                        deflate, shuffle, arr.dtype.itemsize,
                        pipeline_v2=True,
                    )))
                cd = chunk[n]
                lay = struct.pack("<BBB", 3, 2, len(cd) + 1)
                lay += struct.pack("<Q", 0)  # patched
                for c in cd:
                    lay += struct.pack("<I", c)
                lay += struct.pack("<I", arr.dtype.itemsize)
                msgs.append(_msg_v2(0x08, lay))
                data_keys[n] = ("btree", n)
            else:
                msgs.append(_msg_v2(0x08, struct.pack(
                    "<BBQQ", 3, 1, 0, arr.nbytes  # patched
                )))
                data_keys[n] = ("data", n)
        if ochk_attrs and amsgs:
            # attrs live in a continuation block; the header carries
            # the continuation message (addr/len patched after place)
            msgs.append(_msg_v2(0x10, struct.pack("<QQ", 0, 0)))
            place(("oh", n), _ohdr_v2(msgs))
            blob = b"OCHK" + b"".join(amsgs) + b"\x00" * 4
            place(("ochk", n), blob)
        else:
            place(("oh", n), _ohdr_v2(amsgs + msgs))

    for n in names:
        arr, attrs = datasets[n]
        if arr is None:
            continue
        arr = np.ascontiguousarray(arr)
        if n in chunk:
            cd = chunk[n]
            chunks = []
            for r0 in range(0, arr.shape[0], cd[0]):
                for c0 in range(0, arr.shape[1], cd[1]):
                    block = np.zeros(cd, dtype=arr.dtype)
                    rs = min(cd[0], arr.shape[0] - r0)
                    cs = min(cd[1], arr.shape[1] - c0)
                    block[:rs, :cs] = arr[r0:r0 + rs, c0:c0 + cs]
                    raw = block.tobytes()
                    if shuffle:
                        raw = _shuffle_fwd(raw, arr.dtype.itemsize)
                    if deflate:
                        raw = zlib.compress(raw, 6)
                    chunks.append(((r0, c0), raw))
            for i, (off2, raw) in enumerate(chunks):
                place(("chunk", n, i), raw)
            bt = b"TREE" + bytes([1, 0]) + struct.pack("<H", len(chunks))
            bt += struct.pack("<QQ", UNDEF, UNDEF)
            for i, ((r0, c0), raw) in enumerate(chunks):
                bt += struct.pack("<II", len(raw), 0)
                bt += struct.pack("<QQQ", r0, c0, 0)
                bt += struct.pack("<Q", addr[("chunk", n, i)])
            bt += struct.pack("<II", 0, 0)
            bt += struct.pack("<QQQ", arr.shape[0], arr.shape[1], 0)
            place(("btree", n), bt)
        else:
            place(("data", n), arr.tobytes())

    place("root", _ohdr_v2(
        [_link_msg(n, addr[("oh", n)]) for n in names]
    ))
    total = place.cursor

    # patch layout addresses (+ continuation addr/len) into the OHDRs
    for n in names:
        arr, attrs = datasets[n]
        oh = bytearray(pieces[("oh", n)])
        off = 10  # OHDR(4) ver(1) flags(1) chunk0size(4)
        end = len(oh) - 4
        while off + 4 <= end:
            mtype = oh[off]
            msize = struct.unpack_from("<H", oh, off + 1)[0]
            body = off + 4
            if mtype == 0x08 and arr is not None and oh[body + 1] != 0:
                if oh[body + 1] == 1:
                    struct.pack_into("<Q", oh, body + 2,
                                     addr[data_keys[n]])
                elif oh[body + 1] == 2:
                    struct.pack_into("<Q", oh, body + 3,
                                     addr[data_keys[n]])
            elif mtype == 0x10:
                struct.pack_into(
                    "<QQ", oh, body,
                    addr[("ochk", n)], len(pieces[("ochk", n)]),
                )
            off = body + msize
        pieces[("oh", n)] = bytes(oh)

    sb = b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0])
    sb += struct.pack("<QQQQ", 0, UNDEF, total, addr["root"])
    sb += b"\x00" * 4  # zero checksum: reader must tolerate
    assert len(sb) == 48
    out = bytearray(sb)
    for key, a in sorted(addr.items(), key=lambda kv: kv[1]):
        assert len(out) == a, (key, a, len(out))
        out += pieces[key]
    return bytes(out)


@pytest.mark.parametrize("ochk", [False, True])
def test_superblock_v2_ohdr_links(ochk):
    """The HDF5 ≥1.8 libver container: v2 superblock → root OHDR with
    hard-link messages → v2 dataset headers (filter pipeline message
    v2, shuffle+deflate chunks); ``ochk`` moves attrs into OCHK
    continuation blocks."""
    xs = np.array([10.25 + 0.5 * i for i in range(8)], dtype="<f8")
    ys = np.array([50.0 - 0.25 * j for j in range(6)], dtype="<f8")
    data = np.arange(48, dtype="<f8").reshape(6, 8)
    buf = hdf5_bytes_v2(
        {
            "x": (xs, {"CLASS": "DIMENSION_SCALE"}),
            "y": (ys, {"CLASS": "DIMENSION_SCALE"}),
            "crs": (None, {"proj4": "eqc"}),
            "t2m": (data, {"grid_mapping": "crs", "units": "K"}),
        },
        chunk={"t2m": (4, 3)}, deflate=True, shuffle=True,
        ochk_attrs=ochk,
    )
    ds = parse_hdf5(buf)
    np.testing.assert_array_equal(ds["t2m"]["data"], data)
    assert ds["t2m"]["attrs"]["units"] == "K"
    assert ds["crs"]["attrs"]["proj4"] == "eqc"
    area, var = load_cf_area_h5(buf)
    assert var == "t2m" and area.crs == "eqc"
    assert (area.width, area.height) == (8, 6)
    assert area.area_extent == (10.0, 48.625, 14.0, 50.125)


def _lookup3_ref(data: bytes) -> int:
    """Independent lookup3 for the dense fixtures' name hashes (the
    reader never verifies checksums, but record hashes must be
    plausible)."""
    from pyresample_spark.sources.hdf5 import _lookup3

    return _lookup3(data)


def hdf5_bytes_dense(datasets, start_block=128, node_size=512,
                     table_width=4, max_direct=4096):
    """Independent dense-group builder (HDF5 spec III.G): contiguous
    f8 datasets under a root whose links live in fractal-heap direct
    blocks (doubling table) indexed by a depth-0 name v2 B-tree —
    the layout libhdf5 emits for libver=latest groups past the
    compact threshold. ``start_block`` is deliberately tiny so a
    handful of links already spills into a root INDIRECT block.
    Shares no code with the package writer."""
    names = sorted(datasets)
    off_size = 4           # max heap size 32 bits
    len_size = 2           # max direct block 4096 → 2 bytes
    id_len = 1 + off_size + len_size
    dblk_hdr = 4 + 1 + 8 + off_size  # flags=0: no block checksum

    def blk_size(i):
        row = i // table_width
        return start_block if row < 2 else start_block << (row - 1)

    def build(a):
        pieces = []

        def put(key, blob):
            pieces.append((key, blob))

        for n in names:
            arr = np.ascontiguousarray(datasets[n], dtype="<f8")
            put(("data", n), arr.tobytes())
            put(("oh", n), _ohdr_v2([
                _msg_v2(0x01, _ds_simple(arr.shape)),
                _msg_v2(0x03, _dt_fixed(arr.dtype)),
                _msg_v2(0x08, struct.pack(
                    "<BBQQ", 3, 1, a.get(("data", n), 0), arr.nbytes
                )),
            ]))
        # pack serialized link-message bodies into the heap
        blocks, blk_starts, ids = [[]], [0], []
        used = dblk_hdr
        for n in names:
            nb = n.encode()
            body = bytes([1, 0, len(nb)]) + nb + struct.pack(
                "<Q", a.get(("oh", n), 0)
            )
            if used + len(body) > blk_size(len(blocks) - 1):
                blk_starts.append(
                    blk_starts[-1] + blk_size(len(blocks) - 1)
                )
                blocks.append([])
                used = dblk_hdr
            heap_off = blk_starts[-1] + used
            blocks[-1].append((heap_off, body))
            ids.append((n, bytes([0])
                        + heap_off.to_bytes(off_size, "little")
                        + len(body).to_bytes(len_size, "little")))
            used += len(body)
        nblocks = len(blocks)
        rows = (nblocks + table_width - 1) // table_width
        for i, blk in enumerate(blocks):
            body = bytearray(blk_size(i))
            body[0:4] = b"FHDB"
            struct.pack_into("<Q", body, 5, a.get("frhp", 0))
            struct.pack_into("<I", body, 13, blk_starts[i])
            for ho, b2 in blk:
                body[ho - blk_starts[i]:ho - blk_starts[i] + len(b2)] = b2
            put(("fhdb", i), bytes(body))
        if nblocks > 1:
            fhib = bytearray(4 + 1 + 8 + off_size
                             + rows * table_width * 8 + 4)
            fhib[0:4] = b"FHIB"
            struct.pack_into("<Q", fhib, 5, a.get("frhp", 0))
            for i in range(rows * table_width):
                struct.pack_into(
                    "<Q", fhib, 17 + 8 * i,
                    a.get(("fhdb", i), 0) if i < nblocks else UNDEF,
                )
            put("fhib", bytes(fhib))
        managed = blk_starts[-1] + blk_size(nblocks - 1)
        frhp = b"FRHP" + bytes([0])
        frhp += struct.pack("<HHB", id_len, 0, 0)
        frhp += struct.pack("<I", 1024)
        frhp += struct.pack("<QQQQ", 0, UNDEF, 0, UNDEF)
        frhp += struct.pack("<QQQQ", managed, managed, managed,
                            len(names))
        frhp += struct.pack("<QQQQ", 0, 0, 0, 0)
        frhp += struct.pack("<HQQH", table_width, start_block,
                            max_direct, 32)
        root_blk = (a.get("fhib", 0) if nblocks > 1
                    else a.get(("fhdb", 0), 0))
        frhp += struct.pack("<HQH", 1, root_blk,
                            rows if nblocks > 1 else 0)
        frhp += b"\x00" * 4  # zero checksum: reader must tolerate
        put("frhp", frhp)
        rec_size = 4 + id_len
        btlf = b"BTLF" + bytes([0, 5])
        for hsh, hid in sorted(
            (_lookup3_ref(n.encode()), hid) for n, hid in ids
        ):
            btlf += struct.pack("<I", hsh) + hid
        btlf += b"\x00" * (node_size - len(btlf))
        put("btlf", btlf)
        bthd = b"BTHD" + bytes([0, 5])
        bthd += struct.pack("<IHH", node_size, rec_size, 0)
        bthd += bytes([100, 40])
        bthd += struct.pack("<QHQ", a.get("btlf", 0), len(ids),
                            len(ids))
        bthd += b"\x00" * 4
        put("bthd", bthd)
        li = _msg_v2(0x02, bytes([0, 0]) + struct.pack(
            "<QQ", a.get("frhp", 0), a.get("bthd", 0)
        ))
        put("root", _ohdr_v2([li]))
        return pieces

    # two-pass: sizes are address-independent, so pass 1 lays out the
    # cursor and pass 2 re-emits with real addresses
    addrs, cursor = {}, 48
    for key, blob in build({}):
        addrs[key] = cursor
        cursor += len(blob)
    total = cursor
    out = bytearray(b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0]))
    out += struct.pack("<QQQQ", 0, UNDEF, total, addrs["root"])
    out += b"\x00" * 4
    for key, blob in build(addrs):
        assert len(out) == addrs[key], key
        out += blob
    return bytes(out)


def test_dense_links_spec_built_fixture():
    """Dense (fractal-heap) link storage decodes natively: the
    independent builder above packs 12 links into 128-byte heap
    blocks, forcing a root FHIB with several FHDB children, and the
    reader must resolve every name through the v2 B-tree → heap-ID →
    link-message chain."""
    data = {f"set_{i:02d}": np.arange(6, dtype="<f8").reshape(2, 3) + i
            for i in range(20)}
    buf = hdf5_bytes_dense(data)
    assert buf.count(b"FHDB") >= 3 and buf.count(b"FHIB") == 1
    ds = parse_hdf5(buf)
    assert sorted(ds) == sorted(data)
    for n in data:
        np.testing.assert_array_equal(ds[n]["data"], data[n])
    # single-block shape: root IS the direct block (cur rows = 0)
    small = {f"v{i}": np.ones((2, 2)) * i for i in range(3)}
    buf2 = hdf5_bytes_dense(small, start_block=512)
    assert buf2.count(b"FHIB") == 0
    ds2 = parse_hdf5(buf2)
    assert sorted(ds2) == sorted(small)


def test_dense_links_out_of_subset_guards():
    """Huge/tiny heap IDs, filtered heaps and deep B-trees raise the
    named errors instead of decoding garbage."""
    from pyresample_spark.sources.hdf5 import (
        _R,
        _btree_v2_records,
        _fractal_heap_fetch,
    )

    data = {"a": np.ones((2, 2)), "b": np.zeros((2, 2))}
    buf = hdf5_bytes_dense(data, start_block=512)
    frhp_addr = buf.find(b"FRHP")
    bthd_addr = buf.find(b"BTHD")
    fetch = _fractal_heap_fetch(_R(buf), frhp_addr)
    with pytest.raises(NotImplementedError, match="huge/tiny"):
        fetch(bytes([0x10]) + b"\x00" * 6)
    # filtered heap: nonzero I/O filter length in the header
    fbuf = bytearray(buf)
    struct.pack_into("<H", fbuf, frhp_addr + 7, 8)
    with pytest.raises(NotImplementedError, match="filtered"):
        _fractal_heap_fetch(_R(bytes(fbuf)), frhp_addr)
    # corrupt depth field: deep trees now DECODE (BTIN walk), so a
    # forged depth on a leaf-rooted tree must die on the signature
    # check, never parse leaf bytes as an internal node
    dbuf = bytearray(buf)
    struct.pack_into("<H", dbuf, bthd_addr + 12, 2)
    with pytest.raises(ValueError, match="internal node signature"):
        list(_btree_v2_records(_R(bytes(dbuf)), bthd_addr))


def test_vlen_string_attrs_global_heap():
    """Variable-length STRING attributes (datatype class 9, string
    flavor) resolve through the global heap (GCOL) — how h5py and
    h5netcdf write every text attribute, so skipping them would lose
    grid_mapping metadata on real products. Scalar and array shapes;
    vlen SEQUENCES (DIMENSION_LIST) stay skipped."""
    from pyresample_spark.sources.hdf5 import _R, _gheap_object

    data = np.arange(6, dtype="<f8").reshape(2, 3)

    def vlen_attr(name, elems, gaddr, gidx0, scalar):
        nb = name.encode() + b"\x00"
        # class 9 v1, flavor bits0=1 (string); vlen datum size 16;
        # parent type = 1-byte C-S1 fixed string
        dt = bytes([0x19, 0x01, 0, 0]) + struct.pack("<I", 16)
        dt += bytes([0x13, 0, 0, 0]) + struct.pack("<I", 1)
        ds = _ds_scalar() if scalar else _ds_simple((len(elems),))
        body = bytes([1, 0]) + struct.pack(
            "<HHH", len(nb), len(dt), len(ds))

        def pad8(b_):
            return b_ + b"\x00" * (-len(b_) % 8)

        body += pad8(nb) + pad8(dt) + pad8(ds)
        for i, e in enumerate(elems):
            body += struct.pack("<IQI", len(e), gaddr, gidx0 + i)
        return body

    strings = [b"crs", b"alpha", b"beta"]

    def gcol(addr):
        objs = b""
        for i, sb in enumerate(strings):
            objs += struct.pack("<HHIQ", i + 1, 1, 0, len(sb))
            objs += sb + b"\x00" * (-len(sb) % 8)
        objs += struct.pack("<HHIQ", 0, 0, 0, 0)  # free-space marker
        return b"GCOL" + bytes([1, 0, 0, 0]) + struct.pack(
            "<Q", 16 + len(objs)) + objs

    def build(gaddr):
        oh = _ohdr_v2([
            _msg_v2(0x01, _ds_simple(data.shape)),
            _msg_v2(0x03, _dt_fixed(data.dtype)),
            _msg_v2(0x08, bytes([3, 1]) + struct.pack(
                "<QQ", gaddr if gaddr else 0, data.nbytes)),
            _msg_v2(0x0C, vlen_attr("grid_mapping", strings[:1],
                                    gaddr, 1, scalar=True)),
            _msg_v2(0x0C, vlen_attr("flags", strings[1:], gaddr, 2,
                                    scalar=False)),
        ])
        root = _ohdr_v2([_link_msg("v", 48)])
        return oh, root

    # contiguous layout: data sits right after headers, GCOL after
    oh0, root0 = build(0)
    data_addr = 48 + len(oh0) + len(root0)
    gaddr = data_addr + data.nbytes
    # rebuild with the data address in the layout message
    def build2():
        oh = _ohdr_v2([
            _msg_v2(0x01, _ds_simple(data.shape)),
            _msg_v2(0x03, _dt_fixed(data.dtype)),
            _msg_v2(0x08, bytes([3, 1]) + struct.pack(
                "<QQ", data_addr, data.nbytes)),
            _msg_v2(0x0C, vlen_attr("grid_mapping", strings[:1],
                                    gaddr, 1, scalar=True)),
            _msg_v2(0x0C, vlen_attr("flags", strings[1:], gaddr, 2,
                                    scalar=False)),
        ])
        root = _ohdr_v2([_link_msg("v", 48)])
        return oh, root

    oh, root = build2()
    g = gcol(gaddr)
    total = gaddr + len(g)
    out = bytearray(b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0]))
    out += struct.pack("<QQQQ", 0, UNDEF, total, 48 + len(oh))
    out += b"\x00" * 4
    out += oh + root + data.tobytes() + g
    ds = parse_hdf5(bytes(out))
    assert ds["v"]["attrs"]["grid_mapping"] == "crs"
    assert ds["v"]["attrs"]["flags"] == ["alpha", "beta"]
    np.testing.assert_array_equal(ds["v"]["data"], data)
    # the heap accessor itself: missing index raises loudly
    r = _R(bytes(out))
    with pytest.raises(ValueError, match="not found"):
        _gheap_object(r, gaddr, 99)


def test_vlen_string_attr_empty_is_blank():
    """libhdf5 stores the empty string as {len=0, heap addr=0, idx=0}
    with NO global-heap object allocated (H5T__vlen_disk_write);
    dereferencing the null heap ID would misread the file head as a
    GCOL and abort the whole parse (code-review r10). Must yield ''."""
    data = np.arange(4, dtype="<f8")

    def null_vlen_attr(name):
        nb = name.encode() + b"\x00"
        dt = bytes([0x19, 0x01, 0, 0]) + struct.pack("<I", 16)
        dt += bytes([0x13, 0, 0, 0]) + struct.pack("<I", 1)
        ds = _ds_scalar()
        body = bytes([1, 0]) + struct.pack(
            "<HHH", len(nb), len(dt), len(ds))

        def pad8(b_):
            return b_ + b"\x00" * (-len(b_) % 8)

        body += pad8(nb) + pad8(dt) + pad8(ds)
        body += struct.pack("<IQI", 0, 0, 0)  # "": null heap ID
        return body

    def build(data_addr):
        oh = _ohdr_v2([
            _msg_v2(0x01, _ds_simple(data.shape)),
            _msg_v2(0x03, _dt_fixed(data.dtype)),
            _msg_v2(0x08, bytes([3, 1]) + struct.pack(
                "<QQ", data_addr, data.nbytes)),
            _msg_v2(0x0C, null_vlen_attr("comment")),
        ])
        root = _ohdr_v2([_link_msg("v", 48)])
        return oh, root

    oh0, root0 = build(0)
    data_addr = 48 + len(oh0) + len(root0)
    oh, root = build(data_addr)
    total = data_addr + data.nbytes
    out = bytearray(b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0]))
    out += struct.pack("<QQQQ", 0, UNDEF, total, 48 + len(oh))
    out += b"\x00" * 4
    out += oh + root + data.tobytes()
    ds = parse_hdf5(bytes(out))
    assert ds["v"]["attrs"]["comment"] == ""
    np.testing.assert_array_equal(ds["v"]["data"], data)


def test_rank3_contiguous_dataset_parses():
    """Rank-3 datasets decode natively (the chunk/contiguous machinery
    is rank-generic); (time=1, y, x) products depend on it."""
    data = np.arange(24, dtype="<f8").reshape(2, 3, 4)

    def build(data_addr):
        oh = _ohdr_v2([
            _msg_v2(0x01, _ds_simple(data.shape)),
            _msg_v2(0x03, _dt_fixed(data.dtype)),
            _msg_v2(0x08, bytes([3, 1]) + struct.pack(
                "<QQ", data_addr, data.nbytes)),
        ])
        root = _ohdr_v2([_link_msg("v", 48)])
        return oh, root

    oh0, root0 = build(0)
    data_addr = 48 + len(oh0) + len(root0)
    oh, root = build(data_addr)
    out = bytearray(b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0]))
    out += struct.pack("<QQQQ", 0, UNDEF, data_addr + data.nbytes,
                       48 + len(oh))
    out += b"\x00" * 4
    out += oh + root + data.tobytes()
    ds = parse_hdf5(bytes(out))
    assert ds["v"]["shape"] == (2, 3, 4)
    np.testing.assert_array_equal(ds["v"]["data"], data)


def test_load_cf_area_h5_time_sliced_rank3():
    """(time=1, y, x) variables squeeze to the 2-D grid in the HDF5 CF
    loader; a REAL (size-2) time axis is not silently sliced."""
    from pyresample_spark.sources.hdf5 import load_cf_area_h5

    xs = np.arange(4) + 0.5
    ys = -(np.arange(3) + 0.5)

    def ds_for(tdim):
        return {
            "x": {"shape": (4,), "data": xs,
                  "attrs": {"CLASS": "DIMENSION_SCALE"}},
            "y": {"shape": (3,), "data": ys,
                  "attrs": {"CLASS": "DIMENSION_SCALE"}},
            "crs": {"shape": (), "data": np.int32(0),
                    "attrs": {"proj4": "eqc"}},
            "band": {"shape": (tdim, 3, 4),
                     "data": np.zeros((tdim, 3, 4)),
                     "attrs": {"grid_mapping": "crs"}},
        }

    area, var = load_cf_area_h5(b"", ds=ds_for(1))
    assert var == "band" and (area.width, area.height) == (4, 3)
    with pytest.raises(ValueError, match="no 2-D"):
        load_cf_area_h5(b"", ds=ds_for(2))


def test_h5py_vlen_attr_cross_validation(tmp_path):
    """The day h5py appears: its default (vlen) string attributes
    must resolve natively."""
    h5py = pytest.importorskip("h5py")

    p = tmp_path / "vlen.h5"
    with h5py.File(str(p), "w") as f:
        d = f.create_dataset("v", data=np.zeros((2, 2)))
        d.attrs["grid_mapping"] = "crs"
        d.attrs["many"] = ["a", "bc"]
    ds = parse_hdf5(p.read_bytes())
    assert ds["v"]["attrs"]["grid_mapping"] == "crs"
    assert list(ds["v"]["attrs"]["many"]) == ["a", "bc"]


def test_dense_attribute_storage():
    """Dense attribute storage (Attribute Info 0x0015 → fractal heap
    + name v2 B-tree, record type 8) — what libhdf5 switches to past
    ~8 attributes under libver=latest — decodes natively. Independent
    fixture: one dataset whose 12 attributes live in a single-block
    heap with 7-byte heap IDs (exercising the non-8 ID length the
    record slicing must honor)."""
    arr = np.arange(12, dtype="<f8").reshape(3, 4)
    attrs = {f"attr_{i:02d}": f"value_{i}" for i in range(12)}
    off_size, len_size = 4, 2
    id_len = 1 + off_size + len_size  # 7
    dblk_hdr = 4 + 1 + 8 + off_size
    S = 1024

    def build(a):
        pieces = []
        put = lambda k, b: pieces.append((k, b))  # noqa: E731
        put(("data", 0), arr.tobytes())
        # heap objects: serialized attribute messages
        used, objs, ids = dblk_hdr, [], []
        for k in sorted(attrs):
            body = _attr_msg(k, attrs[k])
            objs.append((used, body))
            ids.append((k, bytes([0])
                        + used.to_bytes(off_size, "little")
                        + len(body).to_bytes(len_size, "little")))
            used += len(body)
        assert used <= S
        fhdb = bytearray(S)
        fhdb[0:4] = b"FHDB"
        struct.pack_into("<Q", fhdb, 5, a.get("frhp", 0))
        for ho, b2 in objs:
            fhdb[ho:ho + len(b2)] = b2
        put("fhdb", bytes(fhdb))
        frhp = b"FRHP" + bytes([0])
        frhp += struct.pack("<HHB", id_len, 0, 0)
        frhp += struct.pack("<I", 512)
        frhp += struct.pack("<QQQQ", 0, UNDEF, 0, UNDEF)
        frhp += struct.pack("<QQQQ", S, S, S, len(ids))
        frhp += struct.pack("<QQQQ", 0, 0, 0, 0)
        frhp += struct.pack("<HQQH", 4, S, 4096, 32)
        frhp += struct.pack("<HQH", 1, a.get("fhdb", 0), 0)
        frhp += b"\x00" * 4
        put("frhp", frhp)
        rec_size = id_len + 1 + 4 + 4  # id, flags, corder, hash
        btlf = b"BTLF" + bytes([0, 8])
        for i, (k, hid) in enumerate(sorted(
            ids, key=lambda kv: _lookup3_ref(kv[0].encode())
        )):
            btlf += hid + bytes([0]) + struct.pack(
                "<II", i, _lookup3_ref(k.encode())
            )
        btlf += b"\x00" * (512 - len(btlf))
        put("btlf", btlf)
        bthd = b"BTHD" + bytes([0, 8])
        bthd += struct.pack("<IHH", 512, rec_size, 0)
        bthd += bytes([100, 40])
        bthd += struct.pack("<QHQ", a.get("btlf", 0), len(ids),
                            len(ids))
        bthd += b"\x00" * 4
        put("bthd", bthd)
        ai = _msg_v2(0x15, bytes([0, 0]) + struct.pack(
            "<QQ", a.get("frhp", 0), a.get("bthd", 0)
        ))
        put(("oh", 0), _ohdr_v2([
            _msg_v2(0x01, _ds_simple(arr.shape)),
            _msg_v2(0x03, _dt_fixed(arr.dtype)),
            _msg_v2(0x08, struct.pack(
                "<BBQQ", 3, 1, a.get(("data", 0), 0), arr.nbytes
            )),
            ai,
        ]))
        put("root", _ohdr_v2([_link_msg("densevar", a.get(("oh", 0),
                                                          0))]))
        return pieces

    addrs, cursor = {}, 48
    for key, blob in build({}):
        addrs[key] = cursor
        cursor += len(blob)
    out = bytearray(b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0]))
    out += struct.pack("<QQQQ", 0, UNDEF, cursor, addrs["root"])
    out += b"\x00" * 4
    for key, blob in build(addrs):
        assert len(out) == addrs[key], key
        out += blob
    ds = parse_hdf5(bytes(out))
    np.testing.assert_array_equal(ds["densevar"]["data"], arr)
    assert ds["densevar"]["attrs"] == attrs


def test_h5py_dense_attrs_cross_validation(tmp_path):
    """The day h5py appears: libhdf5's own dense-attribute output
    must decode natively."""
    h5py = pytest.importorskip("h5py")

    arr = np.arange(8, dtype="<f8").reshape(2, 4)
    p = tmp_path / "dattrs.h5"
    with h5py.File(str(p), "w", libver="latest") as f:
        d = f.create_dataset("v", data=arr)
        for i in range(20):  # past the compact threshold
            d.attrs[f"attr_{i:02d}"] = f"value_{i}"
    ds = parse_hdf5(p.read_bytes())
    assert ds["v"]["attrs"]["attr_13"] == "value_13"


def test_package_writer_dense_roundtrip():
    """The package writer's dense_links=True output (superblock 2)
    parses back through the reader in both heap shapes, including
    chunked+filtered datasets under the dense root."""
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes

    data = (np.arange(120, dtype="<f8").reshape(10, 12) % 17) / 2
    xs = np.arange(12) + 0.5
    ys = -(np.arange(10) + 0.5)
    many = {
        f"variable_with_a_long_name_{i:03d}": (data + i, {})
        for i in range(40)
    }
    many.update({
        "x": (xs, {"CLASS": "DIMENSION_SCALE"}),
        "y": (ys, {"CLASS": "DIMENSION_SCALE"}),
        "crs": (None, {"proj4": "eqc"}),
        "band": (data, {"grid_mapping": "crs"}),
    })
    buf = hdf5_grid_bytes(
        many, chunks={"band": (4, 5)}, deflate=True, shuffle=True,
        superblock=2, dense_links=True,
    )
    assert buf.count(b"FHDB") > 1 and buf.count(b"FHIB") == 1
    ds = parse_hdf5(buf)
    assert len(ds) == 44
    np.testing.assert_array_equal(ds["band"]["data"], data)
    area, var = load_cf_area_h5(buf)
    assert var == "band" and (area.width, area.height) == (12, 10)
    with pytest.raises(ValueError, match="dense_links requires"):
        hdf5_grid_bytes(many, superblock=0, dense_links=True)
    # a link body too long for the 512-byte starting rows must pack
    # into a later, LARGER doubling-table block, not raise
    # (code-review r10: the guard tested only the current block)
    long_name = "v" + "_x" * 300  # ~620-byte link message
    vars_long = {
        long_name: (data, {}),
        "x": (xs, {"CLASS": "DIMENSION_SCALE"}),
        "y": (ys, {"CLASS": "DIMENSION_SCALE"}),
    }
    buf2 = hdf5_grid_bytes(vars_long, superblock=2, dense_links=True)
    ds2 = parse_hdf5(buf2)
    np.testing.assert_array_equal(ds2[long_name]["data"], data)
    # but a body beyond the LARGEST direct block still raises loudly
    with pytest.raises(ValueError, match="larger than any heap block"):
        hdf5_grid_bytes(
            {"w" * 70000: (data, {})}, superblock=2, dense_links=True
        )


def _v4_file(layout_body: bytes, arr, extra_pieces):
    """Assemble a one-dataset v2-superblock file whose data layout
    message is the given v4 body; ``extra_pieces`` = [(tag, bytes)]
    appended after the object header (index structures, chunk data).
    Addresses inside layout_body/extra must be precomputed by the
    caller from the fixed prefix: superblock 48 + root + OHDR."""
    oh = _ohdr_v2([
        _msg_v2(0x01, _ds_simple(arr.shape)),
        _msg_v2(0x03, _dt_fixed(arr.dtype)),
        _msg_v2(0x08, layout_body),
    ])
    root = _ohdr_v2([_link_msg("v", 48)])
    # layout: [48: oh][48+len(oh): root][...: extra]
    out = bytearray(b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0]))
    total = 48 + len(oh) + len(root) + sum(len(b) for _, b in extra_pieces)
    out += struct.pack("<QQQQ", 0, UNDEF, total, 48 + len(oh))
    out += b"\x00" * 4
    out += oh + root
    for _, b in extra_pieces:
        out += b
    return bytes(out)


def _v4_chunked_prefix(flags, cdims, itemsize, idx_type):
    nd = len(cdims) + 1
    body = bytes([4, 2, flags, nd, 8])
    for c in cdims:
        body += struct.pack("<Q", c)
    body += struct.pack("<Q", itemsize)
    return body + bytes([idx_type])


def test_layout_v4_single_and_implicit():
    """Version-4 data layouts (libver=latest): Single Chunk —
    unfiltered and DEFLATE-filtered — and the Implicit index decode
    natively from spec-built bytes."""
    arr = (np.arange(48, dtype="<f8").reshape(6, 8) % 13) / 4

    # single chunk, unfiltered: chunk dims == dataset dims
    def build_single():
        probe = _v4_chunked_prefix(0, (6, 8), 8, 1) + struct.pack("<Q", 0)
        oh_len = len(_ohdr_v2([
            _msg_v2(0x01, _ds_simple(arr.shape)),
            _msg_v2(0x03, _dt_fixed(arr.dtype)),
            _msg_v2(0x08, probe),
        ]))
        root_len = len(_ohdr_v2([_link_msg("v", 48)]))
        data_addr = 48 + oh_len + root_len
        body = _v4_chunked_prefix(0, (6, 8), 8, 1) + struct.pack(
            "<Q", data_addr
        )
        return _v4_file(body, arr, [("d", arr.tobytes())])

    ds = parse_hdf5(build_single())
    np.testing.assert_array_equal(ds["v"]["data"], arr)

    # single chunk, filtered (deflate): size+mask ride the layout msg
    comp = zlib.compress(arr.tobytes(), 6)

    def build_single_filtered():
        def mk(addr):
            body = _v4_chunked_prefix(0x02, (6, 8), 8, 1)
            body += struct.pack("<QI", len(comp), 0)
            body += struct.pack("<Q", addr)
            oh = _ohdr_v2([
                _msg_v2(0x01, _ds_simple(arr.shape)),
                _msg_v2(0x03, _dt_fixed(arr.dtype)),
                _msg_v2(0x0B, _filter_msg(True, False, 8,
                                          pipeline_v2=True)),
                _msg_v2(0x08, body),
            ])
            return oh, body
        oh0, _ = mk(0)
        root_len = len(_ohdr_v2([_link_msg("v", 48)]))
        data_addr = 48 + len(oh0) + root_len
        oh, _ = mk(data_addr)
        root = _ohdr_v2([_link_msg("v", 48)])
        out = bytearray(b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0]))
        out += struct.pack("<QQQQ", 0, UNDEF,
                           data_addr + len(comp), 48 + len(oh))
        out += b"\x00" * 4
        out += oh + root + comp
        return bytes(out)

    ds = parse_hdf5(build_single_filtered())
    np.testing.assert_array_equal(ds["v"]["data"], arr)

    # implicit: unfiltered chunks packed contiguously in C order
    def build_implicit():
        cdims = (2, 4)
        chunks = b""
        for r0 in range(0, 6, 2):
            for c0 in range(0, 8, 4):
                chunks += np.ascontiguousarray(
                    arr[r0:r0 + 2, c0:c0 + 4]
                ).tobytes()
        probe = _v4_chunked_prefix(0, cdims, 8, 2) + struct.pack("<Q", 0)
        oh_len = len(_ohdr_v2([
            _msg_v2(0x01, _ds_simple(arr.shape)),
            _msg_v2(0x03, _dt_fixed(arr.dtype)),
            _msg_v2(0x08, probe),
        ]))
        root_len = len(_ohdr_v2([_link_msg("v", 48)]))
        data_addr = 48 + oh_len + root_len
        body = _v4_chunked_prefix(0, cdims, 8, 2) + struct.pack(
            "<Q", data_addr
        )
        return _v4_file(body, arr, [("d", chunks)])

    ds = parse_hdf5(build_implicit())
    np.testing.assert_array_equal(ds["v"]["data"], arr)


@pytest.mark.parametrize("mode", ["plain", "filtered", "paged"])
def test_layout_v4_fixed_array(mode):
    """Version-4 Fixed Array chunk index — the index libhdf5 picks
    for multi-chunk fixed-dimension datasets under libver=latest —
    in all three shapes: unpaged client-0 (raw chunk addresses),
    client-1 (DEFLATE chunks with per-entry size+mask), and a PAGED
    data block (page bitmap + per-page checksums)."""
    arr = (np.arange(120, dtype="<f8").reshape(10, 12) % 17) / 2
    cdims = (3, 4) if mode != "paged" else (2, 2)
    filtered = mode == "filtered"
    blobs, coords = [], []
    for r0 in range(0, 10, cdims[0]):
        for c0 in range(0, 12, cdims[1]):
            blk = np.zeros(cdims, dtype="<f8")
            rs = min(cdims[0], 10 - r0)
            cs = min(cdims[1], 12 - c0)
            blk[:rs, :cs] = arr[r0:r0 + rs, c0:c0 + cs]
            raw = blk.tobytes()
            blobs.append(zlib.compress(raw, 6) if filtered else raw)
            coords.append((r0, c0))
    n = len(blobs)
    entry_size = 16 if filtered else 8
    page_bits = 2 if mode == "paged" else 10
    page_size = 1 << page_bits

    def build(chunk_addrs, fahd_addr, fadb_addr):
        msgs = [
            _msg_v2(0x01, _ds_simple(arr.shape)),
            _msg_v2(0x03, _dt_fixed(arr.dtype)),
        ]
        if filtered:
            msgs.append(_msg_v2(0x0B, _filter_msg(
                True, False, 8, pipeline_v2=True)))
        body = _v4_chunked_prefix(0, cdims, 8, 3)
        body += bytes([page_bits]) + struct.pack("<Q", fahd_addr)
        msgs.append(_msg_v2(0x08, body))
        oh = _ohdr_v2(msgs)
        root = _ohdr_v2([_link_msg("v", 48)])
        fahd = b"FAHD" + bytes([0, 1 if filtered else 0, entry_size,
                                page_bits])
        fahd += struct.pack("<QQ", n, fadb_addr) + b"\x00" * 4
        ents = b""
        for a, blob in zip(chunk_addrs, blobs):
            ents += struct.pack("<Q", a)
            if filtered:
                ents += struct.pack("<II", len(blob), 0)
        fadb = b"FADB" + bytes([0, 1 if filtered else 0])
        fadb += struct.pack("<Q", fahd_addr)
        if n > page_size:  # paged: bitmap + cksum, then pages
            npages = (n + page_size - 1) // page_size
            fadb += b"\xff" * ((npages + 7) // 8) + b"\x00" * 4
            for p0 in range(0, n, page_size):
                take = min(page_size, n - p0)
                fadb += ents[p0 * entry_size:(p0 + take) * entry_size]
                fadb += b"\x00" * 4
        else:
            fadb += ents + b"\x00" * 4
        return oh, root, fahd, fadb

    oh0, root0, fahd0, fadb0 = build([0] * n, 0, 0)
    fahd_addr = 48 + len(oh0) + len(root0)
    fadb_addr = fahd_addr + len(fahd0)
    a = fadb_addr + len(fadb0)
    chunk_addrs = []
    for blob in blobs:
        chunk_addrs.append(a)
        a += len(blob)
    oh, root, fahd, fadb = build(chunk_addrs, fahd_addr, fadb_addr)
    out = bytearray(b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0]))
    out += struct.pack("<QQQQ", 0, UNDEF, a, 48 + len(oh))
    out += b"\x00" * 4
    out += oh + root + fahd + fadb + b"".join(blobs)
    ds = parse_hdf5(bytes(out))
    np.testing.assert_array_equal(ds["v"]["data"], arr)
    if mode == "paged":
        assert n > page_size  # the bitmap+page path really ran
        # an UNSET page-init bit marks a page libhdf5 never wrote:
        # its on-disk bytes are undefined and must not be parsed as
        # chunk addresses (code-review r10) — those chunks keep fill
        raw = bytes(out)
        bm_off = raw.find(b"FADB") + 14
        patched = bytearray(raw)
        assert patched[bm_off] & 0x40  # page 1 currently marked init
        patched[bm_off] &= ~0x40  # clear page 1 (entries 4-7)
        ds2 = parse_hdf5(bytes(patched))
        want = arr.copy()
        # chunks 4-7 of the (5x6)-chunk grid at cdims (2,2): rows
        # 2-3 hold chunk cols 4-5 and rows 2-3 chunk cols 0-1...
        # compute directly from the linear chunk order
        for lin in range(4, 8):
            cr, cc = divmod(lin, 6)
            want[cr * 2:(cr + 1) * 2, cc * 2:(cc + 1) * 2] = 0.0
        np.testing.assert_array_equal(ds2["v"]["data"], want)


def _ea_index_bytes(chunk_specs, base_addr, client, *, max_bits=32,
                    ib_elmts=4, db_min=4, sb_min_ptrs=4, page_bits=10):
    """Spec-built Extensible Array index: EAHD + EAIB + the data
    blocks the element count requires under libhdf5's doubling
    super-block geometry, with chunk elements filled positionally.
    ``chunk_specs`` = [(addr, nbytes, mask) | None] per linear chunk
    index; client 1 encodes (addr, size, mask) elements. Returns the
    index blob whose EAHD sits at ``base_addr``."""
    esize = 8 if client == 0 else 16
    arr_off = (max_bits + 7) // 8
    page_n = 1 << page_bits
    nsblks = 1 + (max_bits - (db_min.bit_length() - 1))
    info, s_idx, s_dblk = [], 0, 0
    for u in range(nsblks):
        nd, ne = 1 << (u // 2), db_min << ((u + 1) // 2)
        info.append((nd, ne, s_idx, s_dblk))
        s_idx += nd * ne
        s_dblk += nd
    n_in_ib = 2 * (sb_min_ptrs.bit_length() - 1)
    ndblk_addrs = sum(info[u][0] for u in range(min(n_in_ib, nsblks)))
    nsblk_addrs = nsblks - n_in_ib
    n = len(chunk_specs)

    def elem(spec):
        if spec is None:
            return b"\xff" * esize
        a, nb, m = spec
        if client == 0:
            return struct.pack("<Q", a)
        return struct.pack("<QII", a, nb, m)

    # which data blocks (and how many elements each) do we need?
    ib_e = [elem(chunk_specs[i]) if i < n else b"\xff" * esize
            for i in range(ib_elmts)]
    dblks = {}  # (u, dnum) -> [elements]
    for i in range(ib_elmts, n):
        i2 = i - ib_elmts
        u = (i2 // db_min + 1).bit_length() - 1
        nd, ne, s_idx, s_dblk = info[u]
        dnum, k = divmod(i2 - s_idx, ne)
        key = (u, dnum)
        if key not in dblks:
            dblks[key] = [b"\xff" * esize] * ne
        dblks[key][k] = elem(chunk_specs[i])
    # lay out: EAHD(72) EAIB(var), data blocks, then super blocks
    ib_size = 14 + ib_elmts * esize + 8 * (ndblk_addrs + nsblk_addrs) + 4
    ib_addr = base_addr + 72
    a = ib_addr + ib_size
    daddrs = {}
    dbufs = []
    for key in sorted(dblks):
        _, ne, _, _ = info[key[0]]
        npages = (ne + page_n - 1) // page_n if ne > page_n else 1
        buf = (b"EADB" + bytes([0, client])
               + struct.pack("<Q", base_addr)
               + b"\x00" * arr_off)
        if npages > 1:  # paged: header+cksum, then element pages
            buf += b"\x00" * 4
            es = dblks[key]
            for p0 in range(0, ne, page_n):
                buf += b"".join(es[p0:p0 + page_n]) + b"\x00" * 4
        else:
            buf += b"".join(dblks[key]) + b"\x00" * 4
        daddrs[key] = a
        dbufs.append(buf)
        a += len(buf)
    # super blocks for u >= n_in_ib: block offset + page-init bitmap
    # (all-initialized) + data block addresses
    saddrs = {}
    sbufs = []
    for u in sorted({u for u, _ in dblks if u >= n_in_ib}):
        nd, ne, _, _ = info[u]
        npg = (ne + page_n - 1) // page_n if ne > page_n else 1
        buf = (b"EASB" + bytes([0, client])
               + struct.pack("<Q", base_addr) + b"\x00" * arr_off)
        if npg > 1:
            buf += b"\xff" * ((nd * npg + 7) // 8)
        for d in range(nd):
            buf += struct.pack("<Q", daddrs.get((u, d), UNDEF))
        buf += b"\x00" * 4
        saddrs[u] = a
        sbufs.append(buf)
        a += len(buf)
    head = b"EAHD" + bytes([0, client, esize, max_bits, ib_elmts,
                            db_min, sb_min_ptrs, page_bits])
    head += struct.pack("<QQQQQQ", 0, 0, len(dblks), 0, n, n)
    head += struct.pack("<Q", ib_addr) + b"\x00" * 4
    ib = b"EAIB" + bytes([0, client]) + struct.pack("<Q", base_addr)
    ib += b"".join(ib_e)
    for u in range(min(n_in_ib, nsblks)):
        for d in range(info[u][0]):
            ib += struct.pack("<Q", daddrs.get((u, d), UNDEF))
    for u in range(n_in_ib, nsblks):
        ib += struct.pack("<Q", saddrs.get(u, UNDEF))
    ib += b"\x00" * 4
    assert len(ib) == ib_size
    return head + ib + b"".join(dbufs) + b"".join(sbufs)


@pytest.mark.parametrize("filtered", [False, True])
def test_layout_v4_extensible_array(filtered):
    """Version-4 Extensible Array chunk index — what libhdf5 emits
    for ONE unlimited dimension, i.e. every appended-time-axis
    netCDF4 product under libver=latest: elements inline in the
    index block plus directly-addressed data blocks, clients 0
    (raw addresses) and 1 (DEFLATE chunks with size+mask)."""
    arr = (np.arange(120, dtype="<f8").reshape(20, 6) % 19) / 2
    cdims = (2, 6)
    blobs = []
    for r0 in range(0, 20, 2):
        raw = arr[r0:r0 + 2].tobytes()
        blobs.append(zlib.compress(raw, 6) if filtered else raw)
    client = 1 if filtered else 0

    def build(chunk_addrs, ea_addr):
        msgs = [
            _msg_v2(0x01, _ds_simple(arr.shape)),
            _msg_v2(0x03, _dt_fixed(arr.dtype)),
        ]
        if filtered:
            msgs.append(_msg_v2(0x0B, _filter_msg(
                True, False, 8, pipeline_v2=True)))
        body = _v4_chunked_prefix(0, cdims, 8, 4)
        # index field: five 1-byte creation params (max bits, index
        # elmts, min ptrs, min elmts, page bits) — informational; the
        # EAHD is authoritative
        body += bytes([32, 4, 4, 4, 10]) + struct.pack("<Q", ea_addr)
        msgs.append(_msg_v2(0x08, body))
        oh = _ohdr_v2(msgs)
        root = _ohdr_v2([_link_msg("v", 48)])
        ea_addr_real = 48 + len(oh) + len(root)
        specs = [(a, len(b_), 0) for a, b_ in zip(chunk_addrs, blobs)]
        ea = _ea_index_bytes(specs, ea_addr_real, client)
        return oh, root, ea, ea_addr_real

    oh0, root0, ea0, ea_addr = build([0] * len(blobs), 0)
    a = ea_addr + len(ea0)
    chunk_addrs = []
    for b_ in blobs:
        chunk_addrs.append(a)
        a += len(b_)
    oh, root, ea, ea_addr2 = build(chunk_addrs, ea_addr)
    assert ea_addr2 == ea_addr
    out = bytearray(b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0]))
    out += struct.pack("<QQQQ", 0, UNDEF, a, 48 + len(oh))
    out += b"\x00" * 4
    out += oh + root + ea + b"".join(blobs)
    ds = parse_hdf5(bytes(out))
    np.testing.assert_array_equal(ds["v"]["data"], arr)


def test_layout_v4_extensible_array_swizzled_unlim_dim():
    """When the UNLIMITED dimension is not dim 0, libhdf5 swizzles it
    to the front before linearizing chunk coordinates — the Extensible
    Array's element order is C order over the SWIZZLED chunk grid
    (code-review r10 finding: natural-order placement silently
    scrambled such datasets). maxshape=(6, UNLIM), chunks (3, 4):
    element order must be column-chunk-major."""
    arr = (np.arange(96, dtype="<f8").reshape(6, 16) % 13) / 4
    cdims = (3, 4)
    counts = (2, 4)  # chunk grid; swizzled order iterates dim-1 outer
    blobs, order = [], []
    for c1 in range(counts[1]):      # swizzled: unlim dim (1) outer
        for c0 in range(counts[0]):
            r0, c0_ = c0 * 3, c1 * 4
            blobs.append(arr[r0:r0 + 3, c0_:c0_ + 4].tobytes())
            order.append((c0, c1))

    def build(chunk_addrs, ea_addr):
        body = _v4_chunked_prefix(0, cdims, 8, 4)
        body += bytes([32, 4, 4, 4, 10]) + struct.pack("<Q", ea_addr)
        oh = _ohdr_v2([
            _msg_v2(0x01, _ds_simple(arr.shape, maxdims=(6, UNDEF))),
            _msg_v2(0x03, _dt_fixed(arr.dtype)),
            _msg_v2(0x08, body),
        ])
        root = _ohdr_v2([_link_msg("v", 48)])
        ea_real = 48 + len(oh) + len(root)
        specs = [(a, len(b_), 0) for a, b_ in zip(chunk_addrs, blobs)]
        return oh, root, _ea_index_bytes(specs, ea_real, 0), ea_real

    oh0, root0, ea0, ea_addr = build([0] * len(blobs), 0)
    a = ea_addr + len(ea0)
    chunk_addrs = []
    for b_ in blobs:
        chunk_addrs.append(a)
        a += len(b_)
    oh, root, ea, _ = build(chunk_addrs, ea_addr)
    out = bytearray(b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0]))
    out += struct.pack("<QQQQ", 0, UNDEF, a, 48 + len(oh))
    out += b"\x00" * 4
    out += oh + root + ea + b"".join(blobs)
    ds = parse_hdf5(bytes(out))
    np.testing.assert_array_equal(ds["v"]["data"], arr)


def test_layout_v4_extensible_array_superblocks_paged():
    """Deep Extensible Array geometry: elements past the directly-
    addressed data blocks indirect through EASB super blocks, and a
    data block larger than the page size splits into element pages
    with per-page checksums gated by the super block's page-init
    bitmap — a cleared bit keeps those chunks at fill."""
    arr = (np.arange(192, dtype="<f8").reshape(32, 6) % 23) / 2
    cdims = (2, 6)
    blobs = [arr[r0:r0 + 2].tobytes() for r0 in range(0, 32, 2)]
    params = dict(max_bits=16, ib_elmts=1, db_min=1, sb_min_ptrs=2,
                  page_bits=1)

    def build(chunk_addrs, ea_addr):
        body = _v4_chunked_prefix(0, cdims, 8, 4)
        body += bytes([16, 1, 2, 1, 1]) + struct.pack("<Q", ea_addr)
        oh = _ohdr_v2([
            _msg_v2(0x01, _ds_simple(arr.shape)),
            _msg_v2(0x03, _dt_fixed(arr.dtype)),
            _msg_v2(0x08, body),
        ])
        root = _ohdr_v2([_link_msg("v", 48)])
        ea_real = 48 + len(oh) + len(root)
        specs = [(a, len(b_), 0) for a, b_ in zip(chunk_addrs, blobs)]
        return oh, root, _ea_index_bytes(specs, ea_real, 0, **params), ea_real

    oh0, root0, ea0, ea_addr = build([0] * len(blobs), 0)
    a = ea_addr + len(ea0)
    chunk_addrs = []
    for b_ in blobs:
        chunk_addrs.append(a)
        a += len(b_)
    oh, root, ea, _ = build(chunk_addrs, ea_addr)

    def assemble(ea_blob):
        out = bytearray(b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0]))
        out += struct.pack("<QQQQ", 0, UNDEF, a, 48 + len(oh))
        out += b"\x00" * 4
        out += oh + root + ea_blob + b"".join(blobs)
        return bytes(out)

    ds = parse_hdf5(assemble(ea))
    np.testing.assert_array_equal(ds["v"]["data"], arr)
    # clear page-init bit 3 (data block 1, page 1) in the u=3 super
    # block: its two chunks (linear 14-15, rows 28-31) revert to fill
    sb_off = ea.find(b"EASB", ea.find(b"EASB") + 1)  # u=3 (2nd) EASB
    assert sb_off > 0
    bm_off = sb_off + 14 + 2  # hdr(14) + block offset (arr_off=2)
    patched = bytearray(ea)
    assert patched[bm_off] == 0xFF  # all-init bitmap where expected
    patched[bm_off] &= ~0x10  # 0x80 >> 3
    ds = parse_hdf5(assemble(bytes(patched)))
    want = arr.copy()
    want[28:] = 0.0
    np.testing.assert_array_equal(ds["v"]["data"], want)


def test_layout_v4_extensible_array_sparse_tail():
    """Unwritten Extensible Array elements (UNDEF addresses — the
    state of chunks past the last append) keep the zero fill."""
    arr = (np.arange(60, dtype="<f8").reshape(10, 6) % 11).astype("<f8")
    cdims = (2, 6)
    blobs = [arr[r0:r0 + 2].tobytes() for r0 in range(0, 6, 2)]

    def build(chunk_addrs, ea_addr):
        body = _v4_chunked_prefix(0, cdims, 8, 4)
        body += bytes([32, 4, 4, 4, 10]) + struct.pack("<Q", ea_addr)
        oh = _ohdr_v2([
            _msg_v2(0x01, _ds_simple(arr.shape)),
            _msg_v2(0x03, _dt_fixed(arr.dtype)),
            _msg_v2(0x08, body),
        ])
        root = _ohdr_v2([_link_msg("v", 48)])
        ea_real = 48 + len(oh) + len(root)
        specs = [(a, len(b_), 0) for a, b_ in zip(chunk_addrs, blobs)]
        specs += [None, None]  # appended dims not yet written
        return oh, root, _ea_index_bytes(specs, ea_real, 0), ea_real

    oh0, root0, ea0, ea_addr = build([0] * 3, 0)
    a = ea_addr + len(ea0)
    chunk_addrs = []
    for b_ in blobs:
        chunk_addrs.append(a)
        a += len(b_)
    oh, root, ea, _ = build(chunk_addrs, ea_addr)
    out = bytearray(b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0]))
    out += struct.pack("<QQQQ", 0, UNDEF, a, 48 + len(oh))
    out += b"\x00" * 4
    out += oh + root + ea + b"".join(blobs)
    ds = parse_hdf5(bytes(out))
    want = arr.copy()
    want[6:] = 0.0  # unwritten chunks keep fill
    np.testing.assert_array_equal(ds["v"]["data"], want)


@pytest.mark.parametrize("filtered", [False, True])
def test_layout_v4_btree2_index(filtered):
    """Version-4 v2 B-tree chunk index (>1 unlimited dimension):
    depth-0 BTHD/BTLF with record types 10 (addr + scaled offsets)
    and 11 (addr + var-size chunk size + mask + scaled offsets)
    decode natively; records place chunks by their scaled
    coordinates, not arrival order."""
    arr = (np.arange(120, dtype="<f8").reshape(10, 12) % 17) / 2
    cdims = (3, 4)
    rtype = 11 if filtered else 10
    size_len = 3  # derived by the reader from rec_size
    rec_size = 8 + (size_len + 4 if filtered else 0) + 16
    blobs, scaled = [], []
    for r0 in range(0, 10, 3):
        for c0 in range(0, 12, 4):
            blk = np.zeros(cdims, dtype="<f8")
            rs, cs = min(3, 10 - r0), min(4, 12 - c0)
            blk[:rs, :cs] = arr[r0:r0 + rs, c0:c0 + cs]
            raw = blk.tobytes()
            blobs.append(zlib.compress(raw, 6) if filtered else raw)
            scaled.append((r0 // 3, c0 // 4))
    n = len(blobs)

    def build(chunk_addrs, bt_addr):
        msgs = [
            _msg_v2(0x01, _ds_simple(arr.shape)),
            _msg_v2(0x03, _dt_fixed(arr.dtype)),
        ]
        if filtered:
            msgs.append(_msg_v2(0x0B, _filter_msg(
                True, False, 8, pipeline_v2=True)))
        body = _v4_chunked_prefix(0, cdims, 8, 5)
        body += struct.pack("<IBB", 2048, 100, 40)  # creation params
        body += struct.pack("<Q", bt_addr)
        msgs.append(_msg_v2(0x08, body))
        oh = _ohdr_v2(msgs)
        root = _ohdr_v2([_link_msg("v", 48)])
        bt_real = 48 + len(oh) + len(root)
        recs = b""
        # reversed order: placement must follow scaled coords
        for a, b_, (sr, sc) in reversed(
                list(zip(chunk_addrs, blobs, scaled))):
            recs += struct.pack("<Q", a)
            if filtered:
                recs += len(b_).to_bytes(size_len, "little")
                recs += struct.pack("<I", 0)
            recs += struct.pack("<QQ", sr, sc)
        btlf = b"BTLF" + bytes([0, rtype]) + recs + b"\x00" * 4
        btlf_addr = bt_real + 38
        bthd = b"BTHD" + bytes([0, rtype])
        bthd += struct.pack("<IHH", 2048, rec_size, 0)
        bthd += bytes([100, 40])
        bthd += struct.pack("<QH", btlf_addr, n)
        bthd += struct.pack("<Q", n) + b"\x00" * 4
        assert len(bthd) == 38
        return oh, root, bthd + btlf, bt_real

    oh0, root0, bt0, bt_addr = build([0] * n, 0)
    a = bt_addr + len(bt0)
    chunk_addrs = []
    for b_ in blobs:
        chunk_addrs.append(a)
        a += len(b_)
    oh, root, bt, _ = build(chunk_addrs, bt_addr)
    out = bytearray(b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0]))
    out += struct.pack("<QQQQ", 0, UNDEF, a, 48 + len(oh))
    out += b"\x00" * 4
    out += oh + root + bt + b"".join(blobs)
    ds = parse_hdf5(bytes(out))
    np.testing.assert_array_equal(ds["v"]["data"], arr)


@pytest.mark.parametrize("node_size", [2048, 4096])
def test_btree_v2_depth1_internal_nodes(node_size):
    """v2 B-trees past one leaf: a depth-1 tree (BTIN root with
    records interleaved between two BTLF leaves, child-pointer
    widths from libhdf5's size tables) yields all records in order —
    the shape real files grow at thousands of chunks/links.

    node_size=4096 puts leaf capacity at 170 records, where
    H5VM_limit_enc_size is still ONE byte (floor(log2 170)//8 + 1);
    a bit_length//8+1 miscount would read 2-byte child nrec fields
    and shear every BTIN pointer (code-review r10)."""
    arr = (np.arange(120, dtype="<f8").reshape(10, 12) % 17) / 2
    cdims = (3, 4)
    rec_size = 24  # type 10, rank 2: addr + 2x8 scaled
    blobs, scaled = [], []
    for r0 in range(0, 10, 3):
        for c0 in range(0, 12, 4):
            blk = np.zeros(cdims, dtype="<f8")
            rs, cs = min(3, 10 - r0), min(4, 12 - c0)
            blk[:rs, :cs] = arr[r0:r0 + rs, c0:c0 + cs]
            blobs.append(blk.tobytes())
            scaled.append((r0 // 3, c0 // 4))
    n = len(blobs)  # 12: leaf0 holds 5, BTIN record 1, leaf1 holds 6

    def rec(i, addrs):
        return struct.pack("<QQQ", addrs[i], *scaled[i])

    def build(chunk_addrs, bt_addr):
        body = _v4_chunked_prefix(0, cdims, 8, 5)
        body += struct.pack("<IBB", node_size, 100, 40)
        body += struct.pack("<Q", bt_addr)
        oh = _ohdr_v2([
            _msg_v2(0x01, _ds_simple(arr.shape)),
            _msg_v2(0x03, _dt_fixed(arr.dtype)),
            _msg_v2(0x08, body),
        ])
        root = _ohdr_v2([_link_msg("v", 48)])
        bt_real = 48 + len(oh) + len(root)
        bthd_len = 38
        leaf0 = b"BTLF" + bytes([0, 10]) + b"".join(
            rec(i, chunk_addrs) for i in range(5)) + b"\x00" * 4
        leaf1 = b"BTLF" + bytes([0, 10]) + b"".join(
            rec(i, chunk_addrs) for i in range(6, 12)) + b"\x00" * 4
        l0 = bt_real + bthd_len
        # BTIN: 1 record + 2 child pointers (addr8 + nrec1 each)
        btin = (b"BTIN" + bytes([0, 10]) + rec(5, chunk_addrs))
        bi = l0 + len(leaf0)
        l1 = bi + 6 + rec_size + 2 * 9 + 4
        btin += struct.pack("<QB", l0, 5) + struct.pack("<QB", l1, 6)
        btin += b"\x00" * 4
        bthd = b"BTHD" + bytes([0, 10])
        bthd += struct.pack("<IHH", node_size, rec_size, 1)  # depth 1
        bthd += bytes([100, 40])
        bthd += struct.pack("<QH", bi, 1)  # root BTIN, 1 record
        bthd += struct.pack("<Q", n) + b"\x00" * 4
        assert len(bthd) == 38
        return oh, root, bthd + leaf0 + btin + leaf1, bt_real

    oh0, root0, bt0, bt_addr = build([0] * n, 0)
    a = bt_addr + len(bt0)
    chunk_addrs = []
    for b_ in blobs:
        chunk_addrs.append(a)
        a += len(b_)
    oh, root, bt, _ = build(chunk_addrs, bt_addr)
    out = bytearray(b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0]))
    out += struct.pack("<QQQQ", 0, UNDEF, a, 48 + len(oh))
    out += b"\x00" * 4
    out += oh + root + bt + b"".join(blobs)
    ds = parse_hdf5(bytes(out))
    np.testing.assert_array_equal(ds["v"]["data"], arr)


def test_layout_v4_out_of_subset_index_raises():
    arr = np.zeros((4, 4), dtype="<f8")
    body = _v4_chunked_prefix(0, (2, 2), 8, 6)  # not a spec index
    body += bytes([0] * 6) + struct.pack("<Q", 4096)
    buf = _v4_file(body, arr, [])
    with pytest.raises(NotImplementedError, match="chunk index type 6"):
        parse_hdf5(buf)


def test_h5py_layout_v4_cross_validation(tmp_path):
    """The day h5py appears: libhdf5's own libver=latest chunked
    output (v4 layout, Fixed Array or Single Chunk index) must decode
    natively."""
    h5py = pytest.importorskip("h5py")

    arr = np.arange(120, dtype="<f8").reshape(10, 12)
    p = tmp_path / "v4.h5"
    with h5py.File(str(p), "w", libver="latest") as f:
        f.create_dataset("multi", data=arr, chunks=(3, 4),
                         compression="gzip", shuffle=True)
        f.create_dataset("single", data=arr, chunks=(10, 12))
    ds = parse_hdf5(p.read_bytes())
    np.testing.assert_array_equal(ds["multi"]["data"], arr)
    np.testing.assert_array_equal(ds["single"]["data"], arr)


def test_h5py_unlimited_dims_cross_validation(tmp_path):
    """The day h5py appears: libhdf5's Extensible Array (one
    unlimited dim, appended twice) and v2 B-tree (two unlimited
    dims) chunk indexes must decode natively."""
    h5py = pytest.importorskip("h5py")

    arr = np.arange(120, dtype="<f8").reshape(10, 12)
    p = tmp_path / "unlim.h5"
    with h5py.File(str(p), "w", libver="latest") as f:
        d = f.create_dataset("ea", shape=(4, 12), maxshape=(None, 12),
                             chunks=(3, 4), dtype="<f8",
                             compression="gzip")
        d[:] = arr[:4]
        d.resize((10, 12))
        d[4:] = arr[4:]
        b = f.create_dataset("bt2", shape=(10, 12),
                             maxshape=(None, None), chunks=(3, 4),
                             dtype="<f8")
        b[:] = arr
        s = f.create_dataset("ea_swz", shape=(10, 12),
                             maxshape=(10, None), chunks=(3, 4),
                             dtype="<f8")  # unlimited dim NOT dim 0
        s[:] = arr
    ds = parse_hdf5(p.read_bytes())
    np.testing.assert_array_equal(ds["ea"]["data"], arr)
    np.testing.assert_array_equal(ds["bt2"]["data"], arr)
    np.testing.assert_array_equal(ds["ea_swz"]["data"], arr)


def test_h5py_dense_cross_validation(tmp_path):
    """The day h5py appears: libhdf5's own dense-group output (many
    links under libver=latest) must decode natively, and the package
    writer's dense output must read back through libhdf5."""
    h5py = pytest.importorskip("h5py")
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes, parse_hdf5

    data = np.arange(24, dtype="<f8").reshape(4, 6)
    p = tmp_path / "dense.h5"
    with h5py.File(str(p), "w", libver="latest") as f:
        for i in range(24):  # past the compact-links threshold
            f.create_dataset(f"set_{i:02d}", data=data + i)
    ds = parse_hdf5(p.read_bytes())
    assert len(ds) == 24
    np.testing.assert_array_equal(ds["set_07"]["data"], data + 7)
    buf = hdf5_grid_bytes(
        {f"v{i}": (data * i, {}) for i in range(12)},
        superblock=2, dense_links=True,
    )
    q = tmp_path / "pkg_dense.h5"
    q.write_bytes(buf)
    with h5py.File(str(q), "r") as f:
        assert len(f.keys()) == 12
        np.testing.assert_array_equal(f["v5"][...], data * 5)


def test_package_writer_v2_and_shuffle_cross_parse():
    """The package-side writer's new knobs (superblock=2 root OHDR
    with lookup3 checksums; shuffle+deflate pipeline; ≥64-chunk
    multi-node B-trees per ADVICE r8) parse back through the reader,
    and the multi-chunk index really does emit multiple TREE nodes."""
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes

    data = (np.arange(120 * 96, dtype="<f8").reshape(120, 96) % 251) / 4
    xs = np.arange(96) + 0.5
    ys = -(np.arange(120) + 0.5)
    variables = {
        "x": (xs, {"CLASS": "DIMENSION_SCALE"}),
        "y": (ys, {"CLASS": "DIMENSION_SCALE"}),
        "crs": (None, {"proj4": "eqc"}),
        "band": (data, {"grid_mapping": "crs"}),
    }
    for sb in (0, 2):
        buf = hdf5_grid_bytes(
            variables, chunks={"band": (8, 8)}, shuffle=True,
            superblock=sb,
        )
        # 15×12 = 180 chunks → 3 leaves + 1 internal node (+ the v0
        # group tree when sb=0)
        assert buf.count(b"TREE") >= 4
        ds = parse_hdf5(buf)
        np.testing.assert_array_equal(ds["band"]["data"], data)
        area, var = load_cf_area_h5(buf)
        assert var == "band" and (area.width, area.height) == (96, 120)


def test_h5py_reads_package_v2_output(tmp_path):
    """The day h5py appears: libhdf5 itself must read the package
    writer's v2-superblock shuffle+deflate output (checksums, node
    sizing, link messages are then externally validated)."""
    h5py = pytest.importorskip("h5py")
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes

    data = np.arange(48, dtype="<f8").reshape(6, 8)
    for sb in (0, 2):
        buf = hdf5_grid_bytes(
            {"band": (data, {"grid_mapping": "crs"}),
             "crs": (None, {"proj4": "eqc"})},
            chunks={"band": (4, 3)}, shuffle=True, superblock=sb,
        )
        p = tmp_path / f"pkg_sb{sb}.h5"
        p.write_bytes(buf)
        with h5py.File(str(p), "r") as f:
            np.testing.assert_array_equal(f["band"][...], data)


def test_fletcher32_roundtrip_and_corruption():
    """Native fletcher32 filter (id 3, VERDICT r9 item 7): the
    netcdf-c one-flag checksum option roundtrips through the package
    writer/reader in every pipeline combination, and a flipped data
    byte is DETECTED, not silently ingested."""
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes

    data = (np.arange(40 * 24, dtype="<f8").reshape(40, 24) % 83) / 8
    variables = {
        "band": (data, {"grid_mapping": "crs"}),
        "crs": (None, {"proj4": "eqc"}),
    }
    for shuffle in (False, True):
        for deflate in (False, True):
            buf = hdf5_grid_bytes(
                variables, chunks={"band": (16, 16)},
                deflate=deflate, shuffle=shuffle, fletcher32=True,
            )
            ds = parse_hdf5(buf)
            np.testing.assert_array_equal(ds["band"]["data"], data)
    # corruption: flip one byte inside an UNCOMPRESSED checksummed
    # chunk (deflate off so the flip reaches the checksum check
    # instead of dying in zlib)
    buf = bytearray(hdf5_grid_bytes(
        variables, chunks={"band": (16, 16)},
        deflate=False, shuffle=False, fletcher32=True,
    ))
    payload = data[:16, :16].astype("<f8").tobytes()
    off = bytes(buf).find(payload)
    assert off > 0
    buf[off + 8] ^= 0xFF
    with pytest.raises(ValueError, match="fletcher32 checksum mismatch"):
        parse_hdf5(bytes(buf))


def test_fletcher32_matches_libhdf5_folding():
    """_fletcher32 must reproduce libhdf5's H5_checksum_fletcher32
    EXACTLY — the library reduces with ones'-complement folding
    ``(x & 0xffff) + (x >> 16)``, so nonzero sums that are multiples
    of 65535 encode as 0xFFFF, not the 0 a plain ``%`` yields
    (code-review r10 finding: a mod-based checksum rejected ~1 in
    33k valid chunks). Oracle = a word-for-word reimplementation of
    the library's loop, per-360-word folds included."""
    from pyresample_spark.sources.hdf5 import _fletcher32

    def ref(data):
        s1 = s2 = 0
        ln = len(data) // 2
        i = 0
        while ln:
            t = min(360, ln)
            ln -= t
            for _ in range(t):
                s1 = (s1 + ((data[i] << 8) | data[i + 1])) & 0xFFFFFFFF
                s2 = (s2 + s1) & 0xFFFFFFFF
                i += 2
            s1 = (s1 & 0xffff) + (s1 >> 16)
            s2 = (s2 & 0xffff) + (s2 >> 16)
        if len(data) % 2:
            s1 = (s1 + (data[-1] << 8)) & 0xFFFFFFFF
            s2 = (s2 + s1) & 0xFFFFFFFF
            s1 = (s1 & 0xffff) + (s1 >> 16)
            s2 = (s2 & 0xffff) + (s2 >> 16)
        s1 = (s1 & 0xffff) + (s1 >> 16)
        s2 = (s2 & 0xffff) + (s2 >> 16)
        return (s2 << 16) | s1

    # the adversarial cases: sums hitting exact multiples of 65535
    assert _fletcher32(b"\xff\xff") == 0xFFFFFFFF == ref(b"\xff\xff")
    assert _fletcher32(b"") == 0
    assert _fletcher32(b"\x00" * 100) == 0
    rng = np.random.RandomState(7)
    for case in [b"\x00", bytes([1, 2, 3, 4, 5]), b"\xff" * 721,
                 b"\xff" * 100_000] + [
            rng.bytes(rng.randint(1, 4000)) for _ in range(60)]:
        assert _fletcher32(case) == ref(case), len(case)


def test_h5py_fletcher32_cross_validation(tmp_path):
    """The day h5py appears: libhdf5's own fletcher32 output must
    decode through the native reader (word construction and byte
    order externally validated), and the package writer's output must
    read back through libhdf5."""
    h5py = pytest.importorskip("h5py")
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes

    data = np.arange(48, dtype="<f8").reshape(6, 8)
    p = tmp_path / "f32.h5"
    with h5py.File(str(p), "w") as f:
        f.create_dataset("band", data=data, chunks=(4, 3),
                         fletcher32=True)
    ds = parse_hdf5(p.read_bytes())
    np.testing.assert_array_equal(ds["band"]["data"], data)
    buf = hdf5_grid_bytes(
        {"band": (data, {})}, chunks={"band": (4, 3)},
        deflate=True, shuffle=True, fletcher32=True,
    )
    q = tmp_path / "pkg_f32.h5"
    q.write_bytes(buf)
    with h5py.File(str(q), "r") as f:
        np.testing.assert_array_equal(f["band"][...], data)


def test_package_writer_fixed_array_index():
    """chunk_index='fixed_array' writes the HDF5 >=1.10 v4 layout +
    FAHD/FADB index (what libhdf5 itself emits under libver=latest):
    roundtrips through the reader in every filter combination,
    pages past 2^10 chunks, and refuses superblock 0."""
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes

    data = (np.arange(40 * 24, dtype="<f8").reshape(40, 24) % 83) / 8
    xs = np.arange(24) + 0.5
    ys = -(np.arange(40) + 0.5)
    variables = {
        "x": (xs, {"CLASS": "DIMENSION_SCALE"}),
        "y": (ys, {"CLASS": "DIMENSION_SCALE"}),
        "crs": (None, {"proj4": "eqc"}),
        "band": (data, {"grid_mapping": "crs"}),
    }
    for deflate, shuffle, f32 in [(False, False, False),
                                  (True, False, False),
                                  (True, True, True)]:
        buf = hdf5_grid_bytes(
            variables, chunks={"band": (7, 8)}, deflate=deflate,
            shuffle=shuffle, fletcher32=f32, superblock=2,
            chunk_index="fixed_array",
        )
        assert b"FAHD" in buf and b"FADB" in buf
        ds = parse_hdf5(buf)
        np.testing.assert_array_equal(ds["band"]["data"], data)
        area, var = load_cf_area_h5(buf)
        assert var == "band" and (area.width, area.height) == (24, 40)
        # libhdf5's H5FAcache verify_chksum rejects any mismatch, so
        # the stored FAHD/FADB checksums must equal Jenkins lookup3
        # of the preceding bytes (code-review r10)
        from pyresample_spark.sources.hdf5 import _lookup3
        i = buf.index(b"FAHD")
        assert struct.unpack_from("<I", buf, i + 24)[0] == \
            _lookup3(buf[i:i + 24])
        entry_size = buf[i + 6]
        nelm = struct.unpack_from("<Q", buf, i + 8)[0]
        j = buf.index(b"FADB")
        body = 14 + nelm * entry_size  # header + unpaged entries
        assert struct.unpack_from("<I", buf, j + body)[0] == \
            _lookup3(buf[j:j + body])
    # paged data block: 1600 chunks > the 1024-element page
    big = (np.arange(6400, dtype="<f8").reshape(80, 80) % 31)
    buf = hdf5_grid_bytes(
        {"band": (big.astype("<f8"), {})}, chunks={"band": (2, 2)},
        deflate=False, superblock=2, chunk_index="fixed_array",
    )
    np.testing.assert_array_equal(parse_hdf5(buf)["band"]["data"], big)
    # paged checksums: one over header+bitmap, one per element page
    from pyresample_spark.sources.hdf5 import _lookup3
    i = buf.index(b"FAHD")
    entry_size = buf[i + 6]
    page = 1 << buf[i + 7]
    nelm = struct.unpack_from("<Q", buf, i + 8)[0]
    assert nelm == 1600 and nelm > page
    j = buf.index(b"FADB")
    npages = (nelm + page - 1) // page
    hdr = 14 + (npages + 7) // 8
    assert struct.unpack_from("<I", buf, j + hdr)[0] == \
        _lookup3(buf[j:j + hdr])
    p = j + hdr + 4
    for p0 in range(0, nelm, page):
        take = min(page, nelm - p0)
        pg = buf[p:p + take * entry_size]
        assert struct.unpack_from(
            "<I", buf, p + take * entry_size)[0] == _lookup3(pg)
        p += take * entry_size + 4
    with pytest.raises(ValueError, match="requires"):
        hdf5_grid_bytes(variables, chunks={"band": (7, 8)},
                        chunk_index="fixed_array")
    with pytest.raises(ValueError, match="chunk_index"):
        hdf5_grid_bytes(variables, superblock=2, chunk_index="earray")


def test_h5py_reads_package_fixed_array_output(tmp_path):
    """The day h5py appears: libhdf5 itself must read the package
    writer's v4/Fixed-Array output."""
    h5py = pytest.importorskip("h5py")
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes

    data = (np.arange(40 * 24, dtype="<f8").reshape(40, 24) % 83) / 8
    buf = hdf5_grid_bytes(
        {"band": (data, {"units": "K"})}, chunks={"band": (7, 8)},
        deflate=True, shuffle=True, superblock=2,
        chunk_index="fixed_array",
    )
    p = tmp_path / "fa.h5"
    p.write_bytes(buf)
    with h5py.File(str(p), "r") as f:
        np.testing.assert_array_equal(f["band"][()], data)
        assert f["band"].attrs["units"] == b"K" or \
            f["band"].attrs["units"] == "K"


def test_writer_btree_nodes_fixed_size():
    """libhdf5 reads every v1 B-tree node at the FIXED size derived
    from the tree's K, not the used-entry size, so a short node near
    EOF overflows the EOA and the open fails (ADVICE r9). Every TREE
    node the writer emits must therefore start at least the fixed
    node size before EOF: 544 bytes for the group tree (internal
    K=16, 8-byte heap-offset keys), 24 + 65*klen + 512 for chunk
    trees (istore K=32; klen = 8 + 8*(rank+1) for the chunk key)."""
    from pyresample_spark.sources.hdf5 import (
        _GROUP_BT_NODE_SIZE,
        _chunk_bt_node_size,
        hdf5_grid_bytes,
    )

    data = (np.arange(120 * 96, dtype="<f8").reshape(120, 96) % 251) / 4
    variables = {
        "x": (np.arange(96) + 0.5, {"CLASS": "DIMENSION_SCALE"}),
        "y": (-(np.arange(120) + 0.5), {"CLASS": "DIMENSION_SCALE"}),
        "crs": (None, {"proj4": "eqc"}),
        "band": (data, {"grid_mapping": "crs"}),
    }
    chunk_node = _chunk_bt_node_size(8 + 8 * 3)  # rank-2 → 2616
    assert chunk_node == 2616
    for sb in (0, 2):
        buf = hdf5_grid_bytes(
            variables, chunks={"band": (8, 8)}, shuffle=True,
            superblock=sb,
        )
        offs = []
        i = buf.find(b"TREE")
        while i != -1:
            offs.append(i)
            i = buf.find(b"TREE", i + 4)
        assert len(offs) >= 4
        for off in offs:
            node_type, level = buf[off + 4], buf[off + 5]
            size = (_GROUP_BT_NODE_SIZE if node_type == 0
                    else chunk_node)
            assert off + size <= len(buf), (
                f"sb{sb}: type-{node_type} level-{level} node at "
                f"{off} needs {size} bytes but EOF is {len(buf)}"
            )


@pytest.mark.parametrize("modern", [False, True, "ea"])
def test_hdf5_corruption_is_loud_both_containers(modern):
    """Untrusted-bytes contract for BOTH container generations (v0 +
    v1-B-tree chunk index, and v2 superblock + dense links + Fixed
    Array): a deterministic stride of byte flips and truncations must
    raise a loud python exception or parse correctly — never hang or
    allocate unboundedly. (Exhaustive all-position scans ran offline;
    this strided twin keeps the contract pinned in CI time.)"""
    import struct as _struct
    import zlib as _zlib

    xs = np.arange(16) + 0.5
    ys = -(np.arange(12) + 0.5)
    data = ((np.arange(12)[:, None] * 31
             + np.arange(16)[None, :] * 17) % 97 + 0.5).astype("<f8")
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes

    base = hdf5_grid_bytes(
        {
            "x": (xs.astype(float), {"CLASS": "DIMENSION_SCALE"}),
            "y": (ys.astype(float), {"CLASS": "DIMENSION_SCALE"}),
            "crs": (None, {"proj4": "eqc"}),
            "band": (data, {"grid_mapping": "crs"}),
        },
        chunks={"band": (5, 7)},
        deflate=True,
        superblock=0 if modern is False else 2,
        chunk_index={False: "btree1", True: "fixed_array",
                     "ea": "extensible_array"}[modern],
        dense_links=modern is True,
    )
    ok = (ValueError, NotImplementedError, KeyError, IndexError,
          _struct.error, OverflowError, MemoryError, EOFError,
          UnicodeDecodeError, _zlib.error)

    def parse(buf):
        for v in parse_hdf5(buf).values():
            _ = v["data"]

    for pos in range(0, len(base), 3):
        m = bytearray(base)
        m[pos] = (m[pos] + 1 + pos % 254) % 256
        try:
            parse(bytes(m))
        except ok:
            pass
    for tr in range(0, len(base), 17):
        try:
            parse(base[:tr])
        except ok:
            pass


@pytest.mark.parametrize("chunks,filters,label", [
    ((40, 16), {}, "single chunk, inline elements only, raw"),
    ((4, 16), {"deflate": True}, "4 inline + 6 data-block chunks"),
    ((2, 8), {"deflate": True, "shuffle": True, "fletcher32": True},
     "40 chunks deep into the doubling table, full filter stack"),
])
def test_extensible_array_writer_roundtrip(chunks, filters, label):
    """The package writer's Extensible Array mode (unlimited dim 0 —
    the appendable-time-axis layout) round-trips through the reader's
    EA decoder: inline index-block elements, directly-addressed data
    blocks at several doubling-table depths, raw and fully filtered
    (client-1 entries with size+mask)."""
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes

    xs = np.arange(16) + 0.5
    ys = -(np.arange(40) + 0.5)
    data = ((np.arange(40)[:, None] * 31
             + np.arange(16)[None, :] * 17) % 97 + 0.5).astype("<f8")
    buf = hdf5_grid_bytes(
        {
            "x": (xs.astype(float), {"CLASS": "DIMENSION_SCALE"}),
            "y": (ys.astype(float), {"CLASS": "DIMENSION_SCALE"}),
            "crs": (None, {"proj4": "eqc"}),
            "band": (data, {"grid_mapping": "crs"}),
        },
        chunks={"band": chunks},
        superblock=2,
        chunk_index="extensible_array",
        **filters,
    )
    ds = parse_hdf5(buf)
    np.testing.assert_array_equal(ds["band"]["data"], data)
    area, var = load_cf_area_h5(buf)
    assert var == "band" and (area.width, area.height) == (16, 40)


def test_extensible_array_writer_capacity_guard():
    """Past the 4 + 240 directly-addressed chunk capacity the writer
    raises instead of silently writing EASB structures it cannot."""
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes

    data = np.zeros((256, 8), dtype="<f8")
    with pytest.raises(ValueError, match="direct capacity"):
        hdf5_grid_bytes(
            {"band": (data, {})},
            chunks={"band": (1, 8)},  # 256 chunks > 244
            superblock=2,
            chunk_index="extensible_array",
        )


def test_extensible_array_guard_requires_superblock2():
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes

    with pytest.raises(ValueError, match="superblock=2"):
        hdf5_grid_bytes({"v": (np.zeros((4, 4)), {})},
                        chunks={"v": (2, 2)},
                        chunk_index="extensible_array")


def test_cross_validate_ea_against_real_h5py(tmp_path):
    """The day h5py/libhdf5 appears: the Extensible Array index must
    interoperate both ways — a real libver=latest unlimited-dim
    dataset (libhdf5 picks the EA index for it) parses natively, and
    our EA writer's output opens in h5py."""
    h5py = pytest.importorskip("h5py")
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes

    data = ((np.arange(40)[:, None] * 31
             + np.arange(16)[None, :] * 17) % 97 + 0.5).astype("<f8")
    theirs = tmp_path / "theirs.h5"
    with h5py.File(str(theirs), "w", libver="latest") as f:
        f.create_dataset("band", data=data, chunks=(5, 7),
                         maxshape=(None, 16), compression="gzip")
    ds = parse_hdf5(theirs.read_bytes())
    np.testing.assert_array_equal(ds["band"]["data"], data)
    ours = tmp_path / "ours.h5"
    ours.write_bytes(hdf5_grid_bytes(
        {"band": (data, {})}, chunks={"band": (5, 7)}, deflate=True,
        superblock=2, chunk_index="extensible_array",
    ))
    with h5py.File(str(ours)) as f:
        np.testing.assert_array_equal(f["band"][:], data)
        assert f["band"].maxshape == (None, 16)


def test_h5_nonstring_grid_mapping_is_loud():
    """HDF5 twin of the nc3 guard: a numeric grid_mapping attribute
    raises; absent falls back to geographic."""
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes

    xs = np.arange(8) + 0.5
    ys = -(np.arange(6) + 0.5)
    data = np.arange(48, dtype="<f8").reshape(6, 8)

    def build(attrs):
        return hdf5_grid_bytes({
            "x": (xs.astype(float), {"CLASS": "DIMENSION_SCALE"}),
            "y": (ys.astype(float), {"CLASS": "DIMENSION_SCALE"}),
            "t2m": (data, attrs),
        }, chunks=None, deflate=False)

    # the package writer stringifies attr values, so build the bad
    # attr through the spec-built test writer instead
    buf = hdf5_bytes({
        "x": (xs.astype(float), {"CLASS": "DIMENSION_SCALE"}),
        "y": (ys.astype(float), {"CLASS": "DIMENSION_SCALE"}),
        "t2m": (data, {"grid_mapping": [1.0, 2.0]}),
    })
    with pytest.raises(ValueError, match="grid_mapping.*not a string"):
        load_cf_area_h5(buf)
    area, _ = load_cf_area_h5(build({}))
    assert area.crs == "longlat"


def test_wav_zero_channels_is_loud():
    """A corrupt fmt chunk claiming zero channels raises instead of
    dividing by zero in the frame count."""
    import struct as _struct

    from pyresample_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    wav = bytearray(encode_wav_pcm16(16000, [1, 2, 3, 4]))
    # n_channels lives 2 bytes into the fmt body (after audio_fmt)
    off = wav.index(b"fmt ") + 8 + 2
    _struct.pack_into("<H", wav, off, 0)
    with pytest.raises(ValueError, match="zero channels"):
        decode_wav_pcm16(bytes(wav))


# --------------------------------------------------------------------
# reference datatypes (class 7) — object + dataset-region references
# --------------------------------------------------------------------


def _ref_file(superblock=0):
    from pyresample_spark.sources.hdf5 import (
        H5ObjectRef,
        H5RegionRef,
        hdf5_grid_bytes,
    )

    return hdf5_grid_bytes({
        "band_a": (np.arange(12, dtype="<f4").reshape(3, 4), {}),
        "band_b": (np.arange(6, dtype="<i4").reshape(2, 3), {}),
        "qa_refs": (H5ObjectRef(["band_a", "band_b", "band_a"]),
                    {"purpose": "qa"}),
        "qa_regions": (H5RegionRef([
            ("band_a", {"type": "hyperslab",
                        "blocks": [((0, 1), (2, 3)), ((1, 0), (1, 2))]}),
            ("band_b", {"type": "all"}),
            ("band_a", {"type": "points", "points": [(0, 0), (2, 3)]}),
        ]), {}),
    }, superblock=superblock)


def test_object_reference_roundtrip():
    from pyresample_spark.sources.hdf5 import parse_hdf5

    out = parse_hdf5(_ref_file())
    refs = out["qa_refs"]["data"]
    assert [d["name"] for d in refs] == ["band_a", "band_b", "band_a"]
    assert out["qa_refs"]["attrs"]["purpose"] == "qa"
    # addresses resolve to real object headers (non-zero, in-file)
    assert all(0 < d["address"] < len(_ref_file()) for d in refs)


def test_region_reference_roundtrip():
    from pyresample_spark.sources.hdf5 import parse_hdf5

    regs = parse_hdf5(_ref_file())["qa_regions"]["data"]
    assert regs[0]["name"] == "band_a"
    assert regs[0]["selection"] == {
        "type": "hyperslab", "rank": 2,
        "blocks": [((0, 1), (2, 3)), ((1, 0), (1, 2))]}
    assert regs[1] == {"name": "band_b",
                       "address": regs[1]["address"],
                       "selection": {"type": "all"}}
    assert regs[2]["selection"] == {
        "type": "points", "rank": 2, "points": [(0, 0), (2, 3)]}


def test_references_under_v2_superblock():
    from pyresample_spark.sources.hdf5 import parse_hdf5

    out = parse_hdf5(_ref_file(superblock=2))
    assert [d["name"] for d in out["qa_refs"]["data"]] == [
        "band_a", "band_b", "band_a"]
    assert out["qa_regions"]["data"][1]["selection"] == {"type": "all"}


def test_null_object_reference_is_none():
    from pyresample_spark.sources.hdf5 import parse_hdf5

    buf = bytearray(_ref_file())
    out = parse_hdf5(bytes(buf))
    # zero the first stored address (h5py writes 0 for null refs):
    # find the qa_refs data by locating the three packed addresses
    a0 = out["qa_refs"]["data"][0]["address"]
    a1 = out["qa_refs"]["data"][1]["address"]
    needle = struct.pack("<QQ", a0, a1)
    off = bytes(buf).index(needle)
    struct.pack_into("<Q", buf, off, 0)
    out2 = parse_hdf5(bytes(buf))
    assert out2["qa_refs"]["data"][0] is None
    assert out2["qa_refs"]["data"][1]["name"] == "band_b"


def test_revised_reference_v4_raises():
    from pyresample_spark.sources.hdf5 import _parse_datatype

    body = bytes([0x47, 2, 0, 0]) + struct.pack("<I", 16)
    with pytest.raises(NotImplementedError, match="revised reference"):
        _parse_datatype(body)


def test_unknown_reference_type_raises():
    from pyresample_spark.sources.hdf5 import _parse_datatype

    body = bytes([0x17, 5, 0, 0]) + struct.pack("<I", 8)
    with pytest.raises(NotImplementedError, match="reference datatype type"):
        _parse_datatype(body)


def test_selection_writer_guards():
    from pyresample_spark.sources.hdf5 import (
        _parse_serialized_selection,
        _w_selection,
    )

    with pytest.raises(ValueError, match="unknown selection"):
        _w_selection({"type": "nope"})
    # v2 serialized selections stay out of subset
    blob = struct.pack("<II", 2, 2) + b"\x00" * 16
    with pytest.raises(NotImplementedError, match="selection version"):
        _parse_serialized_selection(blob)
    # implausible rank guard
    blob = struct.pack("<IIIIII", 2, 1, 0, 8, 64, 1)
    with pytest.raises(ValueError, match="implausible selection"):
        _parse_serialized_selection(blob)


def test_compound_object_ref_member_decodes_as_address():
    """netcdf-c's REFERENCE_LIST pattern: a compound with an object-
    reference member surfaces the stored address as u8."""
    from pyresample_spark.sources.hdf5 import _parse_datatype

    # compound v3, one member "dataset" of class-7 object reference
    mname = b"dataset\x00"
    member = mname + bytes([0]) + bytes([0x17, 0, 0, 0]) + struct.pack("<I", 8)
    body = bytes([0x36, 1, 0, 0]) + struct.pack("<I", 8) + member
    dt = _parse_datatype(body)
    assert dt.names == ("dataset",)
    assert dt["dataset"] == np.dtype("<u8")


# --------------------------------------------------------------------
# second-encoder fixtures for the round-11/12 wire formats (VERDICT
# r12 item 4): the Extensible-Array index and the class-10 ARRAY /
# nested-compound v2/v3 member encodings, built here from the spec
# with DIFFERENT creation parameters / layout choices than the package
# writer uses, so the reader is not only checked against its own
# writer's bytes.
# --------------------------------------------------------------------


def _ea_fixture(n_set, esize=8, max_bits=32, ib_elmts=4, db_min=4,
                sb_min_ptrs=4, page_bits=10, values=None):
    """Standalone EAHD/EAIB/EADB buffer, spec-built: doubling-table
    geometry computed here independently; returns (buf, hd_addr)."""
    values = values or [struct.pack("<Q", 1000 + i) for i in range(n_set)]
    page_n = 1 << page_bits
    arr_off = (max_bits + 7) // 8
    # doubling table (spec "Extensible Array" section)
    nsblks = 1 + (max_bits - (db_min.bit_length() - 1))
    info = []
    start_idx = 0
    for u in range(nsblks):
        nd, ne = 1 << (u // 2), db_min << ((u + 1) // 2)
        info.append((nd, ne, start_idx))
        start_idx += nd * ne
    n_in_ib = 2 * (sb_min_ptrs.bit_length() - 1)
    ndblk_addrs = sum(info[u][0] for u in range(min(n_in_ib, nsblks)))

    undef = b"\xff" * 8
    buf = bytearray(b"\x00" * 8)  # non-zero base so addr 0 is invalid
    hd_addr = len(buf)
    hd = bytearray(b"EAHD")
    hd += bytes([0, 0, esize, max_bits, ib_elmts, db_min,
                 sb_min_ptrs, page_bits])
    hd += b"\x00" * (44 - len(hd))
    hd += struct.pack("<Q", n_set)          # max index set (offset 44)
    hd += b"\x00" * (60 - len(hd))
    hd += struct.pack("<Q", 0)              # ib addr placeholder (60)
    hd += b"\x00" * 4                       # fake checksum
    buf += hd

    # data blocks needed to hold elements beyond the inline ones
    dblks = []  # (superblock u, dblk number, elements)
    idx = ib_elmts
    while idx < n_set:
        rel = idx - ib_elmts
        u = (rel // db_min + 1).bit_length() - 1
        nd, ne, s_idx = info[u]
        dnum = (rel - s_idx) // ne
        elems = []
        for k in range(ne):
            gi = ib_elmts + s_idx + dnum * ne + k
            elems.append(values[gi] if gi < n_set else b"\xff" * esize)
        dblks.append((u, dnum, elems))
        idx = ib_elmts + s_idx + (dnum + 1) * ne
    assert all(u < n_in_ib for u, _, _ in dblks), "fixture stays direct"

    dblk_addr = {}
    for u, dnum, elems in dblks:
        dblk_addr[(u, dnum)] = len(buf)
        db = bytearray(b"EADB")
        db += bytes([0, 0]) + struct.pack("<Q", hd_addr)
        db += b"\x00" * arr_off              # block offset field
        ne = len(elems)
        if ne > page_n:                      # paged: 4-byte gap/cksum
            for p0 in range(0, ne, page_n):
                db += b"\x00" * 4
                db += b"".join(elems[p0:p0 + page_n])
        else:
            db += b"".join(elems)
        db += b"\x00" * 4                    # fake checksum
        buf += db

    ib_addr = len(buf)
    ib = bytearray(b"EAIB")
    ib += bytes([0, 0]) + struct.pack("<Q", hd_addr)
    for i in range(ib_elmts):
        ib += values[i] if i < n_set else b"\xff" * esize
    # directly-addressed data block addrs, in doubling-table order
    slot = 0
    for u in range(min(n_in_ib, nsblks)):
        nd = info[u][0]
        for dnum in range(nd):
            a = dblk_addr.get((u, dnum))
            ib += struct.pack("<Q", a) if a is not None else undef
            slot += 1
    for _ in range(max(0, nsblks - n_in_ib)):  # superblock addrs
        ib += undef
    ib += b"\x00" * 4
    buf += ib
    struct.pack_into("<Q", buf, hd_addr + 60, ib_addr)
    return bytes(buf), hd_addr


def test_ea_index_independent_fixture():
    from pyresample_spark.sources.hdf5 import _R, _ea_elements

    buf, hd = _ea_fixture(20)
    elems = _ea_elements(_R(buf), hd)
    assert elems.esize == 8 and len(elems) == 20
    got = [struct.unpack("<Q", e)[0] for e in elems]
    assert got == [1000 + i for i in range(20)]


def test_ea_index_independent_fixture_paged_datablocks():
    """page_bits below the data-block size forces the paged EADB
    layout (per-page 4-byte prefix) on the direct path."""
    from pyresample_spark.sources.hdf5 import _R, _ea_elements

    buf, hd = _ea_fixture(14, page_bits=2)
    elems = _ea_elements(_R(buf), hd)
    got = [struct.unpack("<Q", e)[0] for e in elems]
    assert got == [1000 + i for i in range(14)]


def test_ea_index_partial_tail_is_undefined():
    from pyresample_spark.sources.hdf5 import _R, _ea_elements

    # 6 set elements: 4 inline + 2 in the first (4-element) data
    # block; the block's 2 unwritten slots are undefined
    buf, hd = _ea_fixture(6)
    elems = _ea_elements(_R(buf), hd)
    assert len(elems) == 6
    assert struct.unpack("<Q", elems[5])[0] == 1005


def _dt_array_class10(base: bytes, dims, ver=3) -> bytes:
    """Class-10 ARRAY datatype message (spec IV.A.2.h), independent
    forward encoder: v2 carries 3 reserved bytes + u4 dims + the
    always-identity permutation words, v3 just rank + dims."""
    nd = len(dims)
    # total size = prod(dims) * base size
    bsize = struct.unpack_from("<I", base, 4)[0]
    total = bsize
    for d in dims:
        total *= d
    head = bytes([(ver << 4) | 10, 0, 0, 0]) + struct.pack("<I", total)
    if ver == 2:
        body = bytes([nd]) + b"\x00" * 3
        body += b"".join(struct.pack("<I", d) for d in dims)
        body += b"".join(struct.pack("<I", i) for i in range(nd))
    else:
        body = bytes([nd])
        body += b"".join(struct.pack("<I", d) for d in dims)
    return head + body + base  # base datatype message follows the dims


def _dt_compound_nested(ver=3) -> tuple:
    """(datatype message bytes, matching numpy dtype) for a compound
    with a NESTED compound member and a class-10 ARRAY member, all at
    the same member-encoding version — the round-12 subset, encoded
    here independently of the package writer's _w_dtype."""
    inner_np = np.dtype({"names": ["x", "y"],
                         "formats": ["<f4", "<i4"],
                         "offsets": [0, 4], "itemsize": 8})
    outer_np = np.dtype({
        "names": ["band", "cal", "lut"],
        "formats": ["<u2", inner_np, np.dtype(("<f8", (2, 3)))],
        "offsets": [0, 2, 10], "itemsize": 58})

    def member(name, off, dtmsg, csize):
        nb = name.encode() + b"\x00"
        out = b""
        if ver in (1, 2):
            out += nb + b"\x00" * ((8 - len(nb) % 8) % 8)
        else:
            out += nb
        if ver == 3:
            osz = (max(csize, 1).bit_length() - 1) // 8 + 1
            out += off.to_bytes(osz, "little")
        else:
            out += struct.pack("<I", off)
        if ver == 1:
            out += b"\x00" * 28
        return out + dtmsg

    inner_msg = (bytes([(ver << 4) | 6, 2, 0, 0]) + struct.pack("<I", 8)
                 + member("x", 0, _dt_fixed("<f4"), 8)
                 + member("y", 4, _dt_fixed("<i4"), 8))
    arr_msg = _dt_array_class10(_dt_fixed("<f8"), (2, 3),
                                ver=3 if ver == 3 else 2)
    outer_msg = (bytes([(ver << 4) | 6, 3, 0, 0]) + struct.pack("<I", 58)
                 + member("band", 0, _dt_fixed("<u2"), 58)
                 + member("cal", 2, inner_msg, 58)
                 + member("lut", 10, arr_msg, 58))
    return outer_msg, outer_np


@pytest.mark.parametrize("ver", [2, 3])
def test_nested_compound_array_wholefile_independent(ver):
    """Whole-file fixture: the independent encoder writes a dataset of
    the round-12 nested-compound + class-10 ARRAY dtype; the package
    reader must materialize the structured array value-exactly."""
    msg, np_dt = _dt_compound_nested(ver=ver)
    tbl = np.zeros(4, dtype=np_dt)
    tbl["band"] = [1, 2, 5, 9]
    tbl["cal"]["x"] = [0.5, -1.25, 3.0, 7.5]
    tbl["cal"]["y"] = [-3, 4, 0, 12]
    tbl["lut"] = np.arange(4 * 6, dtype="<f8").reshape(4, 2, 3) * 0.25
    buf = hdf5_bytes({"caltab": (tbl, {"purpose": "nested"})},
                     dt_override={"caltab": msg})
    got = parse_hdf5(buf)["caltab"]["data"]
    assert got.dtype.names == ("band", "cal", "lut")
    np.testing.assert_array_equal(got["band"], tbl["band"])
    np.testing.assert_array_equal(got["cal"]["x"], tbl["cal"]["x"])
    np.testing.assert_array_equal(got["cal"]["y"], tbl["cal"]["y"])
    np.testing.assert_array_equal(got["lut"], tbl["lut"])
