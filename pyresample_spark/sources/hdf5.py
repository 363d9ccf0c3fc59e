"""Pure-python HDF5 / NetCDF4-classic-model reader (SURVEY §2.1).

Reference parity: the reference reads NetCDF4 granules through
xarray/netCDF4 (pyresample/utils/cf.py:413 ``load_cf_area``); those C
libraries are not in this container, so — like the classic-NetCDF and
GeoTIFF readers in :mod:`binary_raster` — this module parses the
subset of the PUBLIC HDF5 file format (HDF5 File Format Specification
v1.1, the on-disk layout netcdf-c writes by default) needed to ingest
CF grids:

- superblock version 0 (8-byte offsets/lengths; v2/v3 detected and
  rejected loudly — netcdf-c only writes those under
  ``H5F_LIBVER_LATEST``),
- version-1 object headers (+ continuation blocks),
- root/group symbol tables: v1 B-tree (node type 0) → SNOD symbol
  nodes → local heap names,
- dataspace (v1 + v2 simple), datatype classes fixed-point / IEEE
  float / fixed string, attribute messages v1 + v3 with inline data,
- data layout v3: contiguous, and chunked (v1 B-tree node type 1)
  with the deflate filter (stdlib zlib) — the layouts netcdf-c
  produces for classic-model variables,
- netCDF4 convention attrs (``DIMENSION_LIST`` is a vlen-reference
  attribute needing the global heap; it is skipped and coordinate
  variables are matched by name+shape instead, which is exactly the
  classic-model layout netcdf-c emits: 1-D datasets named after the
  dimensions).

Anything outside the subset raises ``ValueError``/``NotImplementedError``
with the offending structure named, and ``load_cf_area`` falls back to
xarray when installed — errors are loud, never silent garbage.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"


class _R:
    """Cursor over the file bytes (8-byte offsets/lengths only)."""

    def __init__(self, buf: bytes):
        self.b = buf

    def u(self, off: int, n: int) -> int:
        return int.from_bytes(self.b[off:off + n], "little")


def _parse_datatype(b: bytes):
    """Datatype message → (numpy dtype | ('str', size)). Classes:
    0 fixed-point, 1 float, 3 string (fixed)."""
    cv = b[0]
    cls, ver = cv & 0x0F, cv >> 4
    bits0 = b[1]
    size = struct.unpack_from("<I", b, 4)[0]
    if cls == 0:  # fixed-point
        order = ">" if bits0 & 0x01 else "<"
        signed = "i" if bits0 & 0x08 else "u"
        if size not in (1, 2, 4, 8):
            raise ValueError(f"unsupported fixed-point size {size}")
        return np.dtype(f"{order}{signed}{size}")
    if cls == 1:  # IEEE float
        order = ">" if bits0 & 0x01 else "<"
        if size not in (4, 8):
            raise ValueError(f"unsupported float size {size}")
        return np.dtype(f"{order}f{size}")
    if cls == 3:  # fixed-length string
        return ("str", size)
    raise NotImplementedError(
        f"HDF5 datatype class {cls} (v{ver}) outside the native subset "
        "(fixed-point/float/fixed-string)"
    )


def _parse_dataspace(b: bytes):
    ver = b[0]
    rank = b[1]
    if ver == 1:
        off = 8
    elif ver == 2:
        off = 4
    else:
        raise NotImplementedError(f"dataspace version {ver}")
    dims = [
        struct.unpack_from("<Q", b, off + 8 * i)[0] for i in range(rank)
    ]
    return tuple(dims)


def _parse_messages(r: _R, addr: int):
    """v1 object header at ``addr`` → list of (type, body bytes),
    following continuation messages."""
    ver = r.b[addr]
    if ver != 1:
        raise NotImplementedError(
            f"object header version {ver} (only v1 — the netcdf-c "
            "default — is parsed natively)"
        )
    nmsg = r.u(addr + 2, 2)
    blocks = [(addr + 16, r.u(addr + 8, 4))]
    out = []
    bi = 0
    while bi < len(blocks) and len(out) < nmsg:
        off, size = blocks[bi]
        end = off + size
        while off + 8 <= end and len(out) < nmsg:
            mtype = r.u(off, 2)
            msize = r.u(off + 2, 2)
            body = r.b[off + 8:off + 8 + msize]
            if mtype == 0x0010:  # continuation
                blocks.append((
                    struct.unpack_from("<Q", body, 0)[0],
                    struct.unpack_from("<Q", body, 8)[0],
                ))
            else:
                out.append((mtype, body))
            off += 8 + msize
        bi += 1
    return out


def _parse_attr(body: bytes):
    """Attribute message v1/v3 → (name, python value)."""
    ver = body[0]
    name_size = struct.unpack_from("<H", body, 2)[0]
    dt_size = struct.unpack_from("<H", body, 4)[0]
    ds_size = struct.unpack_from("<H", body, 6)[0]

    def pad8(n):
        return (n + 7) // 8 * 8

    if ver == 1:
        off = 8
        name = body[off:off + name_size].split(b"\x00")[0].decode("utf-8")
        off += pad8(name_size)
        dt = body[off:off + dt_size]
        off += pad8(dt_size)
        ds = body[off:off + ds_size]
        off += pad8(ds_size)
    elif ver in (2, 3):
        # v2 = v1 without padding (+flags byte at 1); v3 adds a name-
        # encoding byte before the name
        off = 8 + (1 if ver == 3 else 0)
        name = body[off:off + name_size].split(b"\x00")[0].decode("utf-8")
        off += name_size
        dt = body[off:off + dt_size]
        off += dt_size
        ds = body[off:off + ds_size]
        off += ds_size
    else:
        raise NotImplementedError(f"attribute message version {ver}")
    try:
        typ = _parse_datatype(dt)
    except (ValueError, NotImplementedError):
        return name, None  # e.g. DIMENSION_LIST vlen refs — skipped
    dims = _parse_dataspace(ds) if ds_size else ()
    n = int(np.prod(dims)) if dims else 1
    if isinstance(typ, tuple):  # fixed string
        raw = body[off:off + typ[1] * n]
        return name, raw.split(b"\x00")[0].decode("utf-8", "replace")
    raw = body[off:off + typ.itemsize * n]
    vals = np.frombuffer(raw, dtype=typ, count=n)
    if not dims:
        return name, vals[0].item()
    return name, vals.tolist()


def _walk_group_btree(r: _R, btree_addr: int, heap_addr: int):
    """v1 group B-tree (+SNOD leaves) → [(name, object header addr)].
    Internal levels recurse; names resolve through the local heap."""
    if r.b[heap_addr:heap_addr + 4] != b"HEAP":
        raise ValueError("bad local heap signature")
    heap_data = struct.unpack_from("<Q", r.b, heap_addr + 24)[0]

    def heap_name(offset):
        # index the terminator instead of slicing to EOF: a multi-GB
        # granule must not pay an O(file) scan per dataset name
        start = heap_data + offset
        end = r.b.index(b"\x00", start)
        return r.b[start:end].decode("utf-8")

    out = []

    def node(addr):
        sig = r.b[addr:addr + 4]
        if sig == b"SNOD":
            cnt = r.u(addr + 6, 2)
            for i in range(cnt):
                e = addr + 8 + 40 * i
                name_off = struct.unpack_from("<Q", r.b, e)[0]
                oh = struct.unpack_from("<Q", r.b, e + 8)[0]
                out.append((heap_name(name_off), oh))
            return
        if sig != b"TREE":
            raise ValueError("bad group B-tree signature")
        ntype, level = r.b[addr + 4], r.b[addr + 5]
        if ntype != 0:
            raise ValueError("expected group (type 0) B-tree node")
        used = r.u(addr + 6, 2)
        # layout: key0 ptr0 key1 ptr1 ... keyN (keys are heap offsets,
        # L=8; pointers are child addresses, O=8)
        p = addr + 24 + 8  # skip siblings + key0
        for _ in range(used):
            child = struct.unpack_from("<Q", r.b, p)[0]
            node(child)
            p += 16
    node(btree_addr)
    return out


def _read_chunked(r: _R, btree_addr: int, shape, dtype, chunk_dims,
                  filters):
    rank = len(shape)
    arr = np.zeros(shape, dtype=dtype.newbyteorder("="))

    def node(addr):
        if r.b[addr:addr + 4] != b"TREE":
            raise ValueError("bad chunk B-tree signature")
        ntype, level = r.b[addr + 4], r.b[addr + 5]
        if ntype != 1:
            raise ValueError("expected chunk (type 1) B-tree node")
        used = r.u(addr + 6, 2)
        key_size = 8 + 8 * (rank + 1)
        p = addr + 24
        for _ in range(used):
            nbytes = r.u(p, 4)
            fmask = r.u(p + 4, 4)
            offsets = [
                struct.unpack_from("<Q", r.b, p + 8 + 8 * i)[0]
                for i in range(rank)
            ]
            child = struct.unpack_from("<Q", r.b, p + key_size)[0]
            if level > 0:
                node(child)
            else:
                raw = r.b[child:child + nbytes]
                # the key's filter mask marks PER-CHUNK skipped
                # filters (an optional deflate stores incompressible
                # chunks raw with bit 0 set)
                if 1 in filters and not fmask & 0x1:
                    raw = zlib.decompress(raw)
                chunk = np.frombuffer(raw, dtype=dtype)
                chunk = chunk.reshape(chunk_dims)
                sel_src, sel_dst = [], []
                for d in range(rank):
                    lo = offsets[d]
                    hi = min(lo + chunk_dims[d], shape[d])
                    sel_dst.append(slice(lo, hi))
                    sel_src.append(slice(0, hi - lo))
                arr[tuple(sel_dst)] = chunk[tuple(sel_src)]
            p += key_size + 8
    node(btree_addr)
    return arr


def parse_hdf5(buf: bytes) -> dict:
    """Parse the root group of an HDF5 file → {name: {shape, attrs,
    data}} with data materialized as numpy arrays (native byte order).
    Subset: see module docstring; out-of-subset structures raise."""
    if buf[:8] != HDF5_MAGIC:
        raise ValueError("not an HDF5 file")
    r = _R(buf)
    sb_ver = buf[8]
    if sb_ver != 0:
        raise NotImplementedError(
            f"HDF5 superblock version {sb_ver} (only v0 — the "
            "netcdf-c default — is parsed natively)"
        )
    if buf[13] != 8 or buf[14] != 8:
        raise NotImplementedError("only 8-byte offsets/lengths supported")
    # root symbol table entry at 24 + 4*O = offset 56 into superblock0:
    # base(O) free(O) eof(O) driver(O) start at 24; entry at 24+32=56
    root_entry = 56
    root_oh = struct.unpack_from("<Q", buf, root_entry + 8)[0]
    msgs = _parse_messages(r, root_oh)
    st = next((b for t, b in msgs if t == 0x0011), None)
    if st is None:
        raise NotImplementedError("root group has no symbol table (new-"
                                  "style groups are outside the subset)")
    btree_addr = struct.unpack_from("<Q", st, 0)[0]
    heap_addr = struct.unpack_from("<Q", st, 8)[0]
    out = {}
    for name, oh in _walk_group_btree(r, btree_addr, heap_addr):
        vmsgs = _parse_messages(r, oh)
        if any(t == 0x0011 for t, _ in vmsgs):
            continue  # sub-group: classic-model CF grids are flat
        attrs = {}
        shape = ()
        dtype = None
        layout = None
        filters = set()
        for t, b in vmsgs:
            if t == 0x0001:
                shape = _parse_dataspace(b)
            elif t == 0x0003:
                dtype = _parse_datatype(b)
            elif t == 0x000C:
                k, v = _parse_attr(b)
                if v is not None:
                    attrs[k] = v
            elif t == 0x000B:
                ver = b[0]
                nf = b[1]
                off = 8 if ver == 1 else 2
                for _ in range(nf):
                    fid = struct.unpack_from("<H", b, off)[0]
                    filters.add(fid)
                    if ver == 1:
                        nl = struct.unpack_from("<H", b, off + 2)[0]
                        ncv = struct.unpack_from("<H", b, off + 6)[0]
                        nl_p = (nl + 7) // 8 * 8
                        off += 8 + nl_p + 4 * ncv
                        if ncv % 2:
                            off += 4
                    else:
                        raise NotImplementedError(
                            f"filter pipeline version {ver}"
                        )
                unknown = filters - {1}
                if unknown:
                    raise NotImplementedError(
                        f"HDF5 filters {sorted(unknown)} unsupported "
                        "(only deflate=1; shuffle/szip need the libs)"
                    )
            elif t == 0x0008:
                layout = b
        if dtype is None or layout is None:
            continue
        if isinstance(dtype, tuple):
            continue  # string datasets aren't grid data
        ver = layout[0]
        if ver != 3:
            raise NotImplementedError(f"data layout version {ver}")
        lclass = layout[1]
        if lclass == 1:  # contiguous
            addr = struct.unpack_from("<Q", layout, 2)[0]
            size = struct.unpack_from("<Q", layout, 10)[0]
            n = int(np.prod(shape)) if shape else 1
            need = n * dtype.itemsize
            if size < need or addr + need > len(buf):
                raise ValueError(f"dataset {name!r} data out of bounds")
            data = np.frombuffer(
                buf, dtype=dtype, count=n, offset=addr
            ).reshape(shape).astype(dtype.newbyteorder("="))
        elif lclass == 2:  # chunked
            dim = layout[2]
            baddr = struct.unpack_from("<Q", layout, 3)[0]
            cdims = [
                struct.unpack_from("<I", layout, 11 + 4 * i)[0]
                for i in range(dim - 1)
            ]
            data = _read_chunked(
                r, baddr, shape, dtype, tuple(cdims), filters
            )
        elif lclass == 0:  # compact
            size = struct.unpack_from("<H", layout, 2)[0]
            n = int(np.prod(shape)) if shape else 1
            data = np.frombuffer(
                layout, dtype=dtype, count=n, offset=4
            ).reshape(shape).astype(dtype.newbyteorder("="))
        else:
            raise NotImplementedError(f"data layout class {lclass}")
        out[name] = {"shape": shape, "attrs": attrs, "data": data}
    return out


def load_cf_area_h5(buf: bytes, variable: str | None = None,
                    ds: dict | None = None):
    """CF grid → AreaDefinition from NetCDF4/HDF5 bytes: the HDF5 twin
    of binary_raster.load_cf_area_nc3 (reference: utils/cf.py:413).
    Coordinate variables are matched by the netCDF4 classic-model
    layout (1-D datasets named after the dimensions, carrying
    CLASS=DIMENSION_SCALE); grid_mapping resolves through the named
    container variable's proj4/crs_wkt/grid_mapping_name attrs.
    Returns (area, variable_name). Pass an already-parsed ``ds``
    (:func:`parse_hdf5`) to avoid decoding the file twice — the
    distributed ingest reuses its parse this way."""
    from pyresample_spark.sources.cf_raster import area_from_cf_attrs

    if ds is None:
        ds = parse_hdf5(buf)
    dim_scales = {
        n: v for n, v in ds.items()
        if len(v["shape"]) == 1
        and v["attrs"].get("CLASS", "").startswith("DIMENSION_SCALE")
    }
    if not dim_scales:  # fall back: any 1-D dataset can be a coord
        dim_scales = {
            n: v for n, v in ds.items() if len(v["shape"]) == 1
        }
    if variable is None:
        cands = [
            n for n, v in ds.items()
            if len(v["shape"]) == 2 and n not in dim_scales
        ]
        if not cands:
            raise ValueError("no 2-D data variable found")
        variable = sorted(cands)[0]
    v = ds[variable]
    h, w = v["shape"]
    by_len = {}
    for n, c in dim_scales.items():
        by_len.setdefault(c["shape"][0], []).append(n)

    def pick(length, preferred, taken=()):
        # ``taken`` keeps a square grid (h == w) from silently reusing
        # the x coordinate as y when only one scale parsed — loud
        # error beats silent-garbage extents
        names = [n for n in by_len.get(length, []) if n not in taken]
        for p in preferred:
            if p in names:
                return p
        if len(names) == 1:
            return names[0]
        raise ValueError(
            f"cannot identify the {length}-long coordinate for "
            f"{variable!r} among {sorted(names)}"
        )

    xn = pick(w, ("x", "lon", "longitude"))
    yn = pick(h, ("y", "lat", "latitude"), taken=(xn,))
    gm = v["attrs"].get("grid_mapping")
    crs = "longlat"
    if gm and gm in ds:
        gma = ds[gm]["attrs"]
        crs = str(
            gma.get("proj4") or gma.get("crs_wkt")
            or gma.get("grid_mapping_name") or "longlat"
        )
    elif gm:
        crs = str(gm)
    xs = ds[xn]["data"].astype(float).tolist()
    ys = ds[yn]["data"].astype(float).tolist()
    return area_from_cf_attrs(variable, crs, xs, ys), variable


# ---------------------------------------------------------------------------
# Minimal HDF5 writer (the sink twin: netCDF4-classic-model CF grids).
# The INDEPENDENT spec-built writer in tests/test_hdf5.py is the
# reader's adversarial check — this one feeds fixtures and the export
# sink, mirroring the netcdf3_bytes precedent in binary_raster.py.

_UNDEF = 0xFFFFFFFFFFFFFFFF


def _w_pad8(b: bytes) -> bytes:
    return b + b"\x00" * ((8 - len(b) % 8) % 8)


def _w_dtype(dt: np.dtype) -> bytes:
    dt = np.dtype(dt)
    if dt.kind in "iu":
        cls, bits0 = 0, (0x08 if dt.kind == "i" else 0x00)
        props = struct.pack("<HH", 0, dt.itemsize * 8)
    elif dt.kind == "f":
        cls, bits0 = 1, 0x00
        props = (
            struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
            if dt.itemsize == 4
            else struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        )
    else:
        raise ValueError(f"unsupported dtype {dt}")
    return bytes([0x10 | cls, bits0, 0, 0]) + struct.pack(
        "<I", dt.itemsize
    ) + props


def _w_space(shape) -> bytes:
    out = bytes([1, len(shape), 0, 0, 0, 0, 0, 0])
    for d in shape:
        out += struct.pack("<Q", d)
    return out


def _w_attr(name: str, value: str) -> bytes:
    nb = name.encode() + b"\x00"
    vb = value.encode()
    dt = bytes([0x13, 0, 0, 0]) + struct.pack("<I", max(len(vb), 1))
    ds = bytes([1, 0, 0, 0, 0, 0, 0, 0])
    body = struct.pack("<BBHHH", 1, 0, len(nb), len(dt), len(ds))
    return body + _w_pad8(nb) + _w_pad8(dt) + _w_pad8(ds) + (vb or b"\x00")


def _w_msg(mtype: int, body: bytes) -> bytes:
    body = _w_pad8(body)
    return struct.pack("<HHBBBB", mtype, len(body), 0, 0, 0, 0) + body


def _w_header(msgs) -> bytes:
    block = b"".join(msgs)
    return (
        struct.pack("<BBHII", 1, 0, len(msgs), 1, len(block))
        + b"\x00" * 4
        + block
    )


def hdf5_grid_bytes(variables: dict, chunks: dict | None = None,
                    deflate: bool = True) -> bytes:
    """Write {name: (array | None, {str attr: str})} as a flat root
    group (None array → dataless i4 container for grid-mapping vars).
    ``chunks``: {name: (cr, cc)} switches a 2-D variable to the
    chunked layout (deflate-compressed when ``deflate``) — the
    encoding netcdf-c uses for compressed variables; everything else
    is contiguous."""
    chunks = chunks or {}
    names = sorted(variables)
    heap = b"\x00" * 8
    heap_off = {}
    for n in names:
        heap_off[n] = len(heap)
        heap += n.encode() + b"\x00"
    heap = _w_pad8(heap)

    layout: list = []  # (key, bytes) in file order
    pos = {"cursor": 96}

    def place(key, blob):
        layout.append((key, blob))
        a = pos["cursor"]
        pos[key] = a
        pos["cursor"] += len(blob)
        return a

    place("root", _w_header([_w_msg(0x0011, struct.pack("<QQ", 0, 0))]))
    place("heap_hdr", b"\x00" * 32)
    place("heap", heap)
    place("btree", b"\x00" * 48)
    snod = b"SNOD" + bytes([1, 0]) + struct.pack("<H", len(names))
    for n in names:
        snod += struct.pack("<QQII", heap_off[n], 0, 0, 0) + b"\x00" * 16
    place("snod", snod)

    chunk_blobs: dict = {}
    for n in names:
        arr, attrs = variables[n]
        msgs = [_w_msg(0x000C, _w_attr(k, str(v)))
                for k, v in sorted(attrs.items())]
        if arr is None:
            comp = struct.pack("<i", 0)
            msgs += [
                _w_msg(0x0001, bytes([1, 0, 0, 0, 0, 0, 0, 0])),
                _w_msg(0x0003, _w_dtype("<i4")),
                _w_msg(0x0008, struct.pack("<BBH", 3, 0, len(comp)) + comp),
            ]
            place(("oh", n), _w_header(msgs))
            continue
        arr = np.ascontiguousarray(arr).astype(
            np.dtype(arr.dtype).newbyteorder("<")
        )
        msgs += [
            _w_msg(0x0001, _w_space(arr.shape)),
            _w_msg(0x0003, _w_dtype(arr.dtype)),
        ]
        if n in chunks:
            cr, cc = chunks[n]
            if deflate:
                msgs.append(_w_msg(
                    0x000B,
                    struct.pack("<BB", 1, 1) + b"\x00" * 6
                    + struct.pack("<HHHH", 1, 0, 1, 1)
                    + struct.pack("<I", 6) + b"\x00" * 4,
                ))
            blobs = []
            for r0 in range(0, arr.shape[0], cr):
                for c0 in range(0, arr.shape[1], cc):
                    blk = np.zeros((cr, cc), dtype=arr.dtype)
                    rs = min(cr, arr.shape[0] - r0)
                    cs = min(cc, arr.shape[1] - c0)
                    blk[:rs, :cs] = arr[r0:r0 + rs, c0:c0 + cs]
                    raw = blk.tobytes()
                    blobs.append(((r0, c0), zlib.compress(raw, 6)
                                  if deflate else raw))
            chunk_blobs[n] = blobs
            lay = struct.pack("<BBBQ", 3, 2, 3, 0)
            lay += struct.pack("<III", cr, cc, arr.dtype.itemsize)
            msgs.append(_w_msg(0x0008, lay))
        else:
            msgs.append(_w_msg(
                0x0008, struct.pack("<BBQQ", 3, 1, 0, arr.nbytes)
            ))
        place(("oh", n), _w_header(msgs))

    for n in names:
        arr, _ = variables[n]
        if arr is None:
            continue
        if n in chunk_blobs:
            for i, (_, raw) in enumerate(chunk_blobs[n]):
                place(("chunk", n, i), raw)
            blobs = chunk_blobs[n]
            bt = b"TREE" + bytes([1, 0]) + struct.pack("<H", len(blobs))
            bt += struct.pack("<QQ", _UNDEF, _UNDEF)
            for i, ((r0, c0), raw) in enumerate(blobs):
                bt += struct.pack("<IIQQQ", len(raw), 0, r0, c0, 0)
                bt += struct.pack("<Q", pos[("chunk", n, i)])
            h, w = variables[n][0].shape
            bt += struct.pack("<IIQQQ", 0, 0, h, w, 0)
            place(("btree", n), bt)
        else:
            arr2 = np.ascontiguousarray(arr).astype(
                np.dtype(arr.dtype).newbyteorder("<")
            )
            place(("data", n), arr2.tobytes())

    total = pos["cursor"]

    def patched(key, blob):
        if key == "root":
            b = bytearray(blob)
            struct.pack_into("<QQ", b, 24, pos["btree"], pos["heap_hdr"])
            return bytes(b)
        if key == "heap_hdr":
            return (b"HEAP" + bytes([0, 0, 0, 0])
                    + struct.pack("<QQQ", len(heap), _UNDEF, pos["heap"]))
        if key == "btree":
            return (b"TREE" + bytes([0, 0]) + struct.pack("<H", 1)
                    + struct.pack("<QQ", _UNDEF, _UNDEF)
                    + struct.pack("<QQQ", 0, pos["snod"], len(heap) - 1))
        if key == "snod":
            b = bytearray(blob)
            for i, n in enumerate(names):
                struct.pack_into("<Q", b, 8 + 40 * i + 8, pos[("oh", n)])
            return bytes(b)
        if isinstance(key, tuple) and key[0] == "oh":
            n = key[1]
            arr, _ = variables[n]
            if arr is None:
                return blob
            b = bytearray(blob)
            off = 16
            while off < len(b):
                mtype = struct.unpack_from("<H", b, off)[0]
                msize = struct.unpack_from("<H", b, off + 2)[0]
                if mtype == 0x0008:
                    if b[off + 9] == 1:
                        struct.pack_into("<Q", b, off + 10, pos[("data", n)])
                    else:
                        struct.pack_into("<Q", b, off + 11, pos[("btree", n)])
                off += 8 + msize
            return bytes(b)
        return blob

    sb = HDF5_MAGIC
    sb += bytes([0, 0, 0, 0, 0, 8, 8, 0])
    sb += struct.pack("<HHI", 4, 16, 0)
    sb += struct.pack("<QQQQ", 0, _UNDEF, total, _UNDEF)
    sb += struct.pack("<QQII", 0, pos["root"], 1, 0)
    sb += struct.pack("<QQ", pos["btree"], pos["heap_hdr"])
    out = bytearray(sb)
    for key, blob in layout:
        assert len(out) == pos[key], (key, pos[key], len(out))
        out += patched(key, blob)
    return bytes(out)


def demo_hdf5_granule_dir() -> str:
    """netCDF4/HDF5 twin of binary_raster.demo_granule_dir: the same
    banded synthetic grid as HDF5 granules — band 0 contiguous, the
    others chunked+deflate (the netcdf-c compressed layout) — for the
    driver-gated q_hdf5_ingest."""
    import os

    from pyresample_spark.sources.binary_raster import (
        GRANULE_BANDS,
        GRANULE_COLS,
        GRANULE_ROWS,
        _write_once_fixture,
    )

    def write(tmp):
        xs = np.array([c + 0.5 for c in range(GRANULE_COLS)])
        for band in range(GRANULE_BANDS):
            r0 = band * GRANULE_ROWS
            ys = np.array(
                [-(r0 + r) - 0.5 for r in range(GRANULE_ROWS)],
                dtype=float,
            )
            rows = np.arange(r0, r0 + GRANULE_ROWS)[:, None]
            cols = np.arange(GRANULE_COLS)[None, :]
            data = ((rows * 31 + cols * 17) % 97 + 0.5).astype("<f8")
            buf = hdf5_grid_bytes(
                {
                    "x": (xs, {"CLASS": "DIMENSION_SCALE"}),
                    "y": (ys, {"CLASS": "DIMENSION_SCALE"}),
                    "crs": (None, {"proj4": "eqc"}),
                    "band": (data, {"grid_mapping": "crs"}),
                },
                chunks=None if band == 0 else {"band": (5, 16)},
                deflate=band != 0,
            )
            with open(os.path.join(tmp, f"granule_{band}.nc"), "wb") as f:
                f.write(buf)

    return _write_once_fixture(
        f"pyresample_spark_h5_granules_v1_{GRANULE_BANDS}x"
        f"{GRANULE_ROWS}x{GRANULE_COLS}",
        write,
    )
