"""Pure-python HDF5 / NetCDF4-classic-model reader (SURVEY §2.1).

Reference parity: the reference reads NetCDF4 granules through
xarray/netCDF4 (pyresample/utils/cf.py:413 ``load_cf_area``); those C
libraries are not in this container, so — like the classic-NetCDF and
GeoTIFF readers in :mod:`binary_raster` — this module parses the
subset of the PUBLIC HDF5 file format (HDF5 File Format Specification
v1.1, the on-disk layout netcdf-c writes by default) needed to ingest
CF grids:

- superblocks version 0 AND version 2/3 (8-byte offsets/lengths; the
  v2/v3 layout is what HDF5 ≥1.10 ``H5F_LIBVER_LATEST`` writers emit),
- version-1 object headers (+ continuation blocks) AND version-2
  ``OHDR`` headers (+ ``OCHK`` continuation blocks; checksums are not
  verified — integrity errors surface as loud structural failures),
- root/group listing through ALL THREE group flavors: old-style
  symbol tables (v1 B-tree node type 0 → SNOD symbol nodes → local
  heap names), new-style compact groups (hard-link messages in the
  header) AND new-style DENSE groups (Link Info → fractal heap
  ``FRHP``/``FHDB``/``FHIB`` managed objects indexed by an any-depth
  name v2 B-tree ``BTHD``/``BTLF`` — what libhdf5 emits for
  libver=latest groups past the compact threshold; filtered heaps,
  huge/tiny heap IDs and deeper B-trees raise loudly),
- dataspace (v1 + v2 simple), datatype classes fixed-point / IEEE
  float / fixed string, attribute messages v1 + v3 with inline data,
- data layout v3 AND v4: contiguous (an UNDEFINED data address —
  netcdf-c's late allocation for never-written variables — parses as
  a dataless variable keeping its attrs), chunked v3 (v1 B-tree node
  type 1, internal + leaf levels), and the v4 chunk indexes
  libver=latest writers emit — Single Chunk, Implicit, Fixed Array
  (paged + unpaged, filtered + raw) for fixed-dimension datasets,
  Extensible Array (doubling super-block geometry, paged data
  blocks gated by the page-init bitmap) for one unlimited dimension
  — every appended-time-axis product — and any-depth v2 B-tree
  (record types 10/11) for several — with the deflate (id 1, stdlib zlib),
  shuffle (id 2, pure byte de-interleave) and fletcher32 (id 3,
  verify-and-strip checksum) filters in either pipeline
  message version — ``deflate+shuffle`` is netcdf-c's canonical
  compression recipe and fletcher32 its one-flag integrity option,
- COMPOUND datatypes (class 6, member encodings v1/v2/v3) decode to
  numpy structured arrays honoring the stored member byte offsets —
  the calibration/scale side tables real L1B products carry;
  contiguous or chunked+filtered alike (shuffle strides by the full
  compound size). Members may themselves be COMPOUND (nested structs)
  or ARRAY (class 10 v2/v3, and the pre-1.8 v1 rank>0 member
  encoding) — they land as nested structured / subarray dtypes;
  vlen-typed members stay out of the subset and raise,
- netCDF4 convention attrs: variable-length STRING attributes (the
  h5py/h5netcdf default for text) resolve through the global heap
  (``GCOL``); ``DIMENSION_LIST`` (a vlen-reference attribute) is
  skipped and coordinate variables are matched by name+shape
  instead, which is exactly the classic-model layout netcdf-c
  emits: 1-D datasets named after the dimensions.

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


# fixed property-block sizes of the scalar classes a COMPOUND member
# may carry (spec IV.A.2.d): fixed-point = bit offset u2 + precision
# u2; float = byte offsets/sizes of the sign/exponent/mantissa
# fields; string = none. Needed to advance past a member's embedded
# datatype message, whose length is not stored.
_DT_PROP_LEN = {0: 4, 1: 12, 3: 0}


def _parse_datatype(b: bytes):
    """Datatype message → numpy dtype | ('str', size) | ('vlen_str',).
    Classes: 0 fixed-point, 1 float, 3 string (fixed), 6 compound
    (→ numpy structured dtype with the members' stored byte offsets —
    the layout netcdf-c/h5py write for scale/index tables; members may
    themselves be compound or ARRAY class 10, which land as nested
    structured / subarray dtypes), 9/1 vlen-string."""
    return _parse_datatype_sized(b)[0]


def _parse_datatype_sized(b: bytes) -> tuple:
    """(parsed type, encoded message length). The length makes nested
    members decodable: a compound member's embedded datatype message
    has no stored size, so the parser must know how many bytes each
    class consumes — variable for compound/array members."""
    cv = b[0]
    cls, ver = cv & 0x0F, cv >> 4
    bits0 = b[1]
    size = struct.unpack_from("<I", b, 4)[0]
    if cls == 0:  # fixed-point
        order = ">" if bits0 & 0x01 else "<"
        signed = "i" if bits0 & 0x08 else "u"
        if size not in (1, 2, 4, 8):
            raise ValueError(f"unsupported fixed-point size {size}")
        return np.dtype(f"{order}{signed}{size}"), 8 + 4
    if cls == 1:  # IEEE float
        order = ">" if bits0 & 0x01 else "<"
        if size not in (4, 8):
            raise ValueError(f"unsupported float size {size}")
        return np.dtype(f"{order}f{size}"), 8 + 12
    if cls == 3:  # fixed-length string
        return ("str", size), 8
    if cls == 9 and (bits0 & 0x0F) == 1:  # variable-length STRING
        # (h5py/h5netcdf write text attrs this way; data lives in the
        # global heap). Vlen SEQUENCES (DIMENSION_LIST object refs)
        # stay out of the subset and raise → caller skips the attr.
        # property block = the embedded base datatype message
        if len(b) < 16:
            raise ValueError("truncated vlen datatype message")
        blen = _parse_datatype_sized(b[8:])[1]
        return ("vlen_str",), 8 + blen
    if cls == 7:  # reference (object / dataset-region)
        # v1-3 encode the reference kind in bit-field bits 0-3 and
        # carry NO property bytes: 0 = object reference (data is one
        # sizeof-offsets file address of the referenced object
        # header), 1 = dataset-region reference (data is a 12-byte
        # global-heap ID whose heap object holds the object address +
        # a serialized dataspace selection). v4 is the HDF5 >=1.12
        # "revised reference" encoding (tokens, external files) —
        # out of subset, raise loudly.
        if ver not in (1, 2, 3):
            raise NotImplementedError(
                f"revised reference datatype v{ver} (HDF5 >= 1.12 "
                "H5R_ref_t) outside the native subset"
            )
        rtype = bits0 & 0x0F
        if rtype == 0:
            return ("ref_obj",), 8
        if rtype == 1:
            return ("ref_region",), 8
        raise NotImplementedError(
            f"reference datatype type {rtype} (object=0 and "
            "dataset-region=1 decode natively)"
        )
    if cls == 10:  # ARRAY (fixed-shape subarray member)
        if ver == 2:  # dimensionality u1 + 3 reserved + dims + perms
            nd = b[8]
            q = 12
            dims = list(struct.unpack_from(f"<{nd}I", b, q))
            q += 8 * nd  # dims + the (always-identity) permutation
        elif ver == 3:  # dimensionality u1 + dims (no reserved/perm)
            nd = b[8]
            q = 9
            dims = list(struct.unpack_from(f"<{nd}I", b, q))
            q += 4 * nd
        else:
            raise NotImplementedError(
                f"HDF5 array datatype version {ver} outside the "
                "native subset"
            )
        if nd == 0 or any(d == 0 for d in dims):
            raise ValueError("array datatype with empty shape")
        base, blen = _parse_datatype_sized(b[q:])
        if isinstance(base, tuple):
            if base[0] == "str":
                base = np.dtype(f"S{base[1]}")
            else:
                raise NotImplementedError(
                    "vlen-typed array members outside the native subset"
                )
        return np.dtype((base, tuple(dims))), q + blen
    if cls == 6:  # compound
        nmem = bits0 | (b[2] << 8)
        if nmem == 0:
            raise ValueError(
                "compound datatype with zero members — corrupt input"
            )
        names, formats, offsets = [], [], []
        p = 8
        for _ in range(nmem):
            end = b.index(b"\x00", p)
            mname = b[p:end].decode("ascii")
            if ver in (1, 2):  # name null-padded to a multiple of 8
                p += (end - p) // 8 * 8 + 8
            else:  # v3: null-terminated, NOT padded
                p = end + 1
            if ver == 3:
                # offset width = H5VM_limit_enc_size(compound size):
                # floor(log2 size)//8 + 1 (same rule the v2-B-tree
                # record decoder uses)
                osz = (max(size, 1).bit_length() - 1) // 8 + 1
                moff = int.from_bytes(b[p:p + osz], "little")
                p += osz
            else:
                moff = struct.unpack_from("<I", b, p)[0]
                p += 4
            v1_dims = None
            if ver == 1:
                # dimensionality u1 + 3 reserved + dim permutation u4
                # + 4 reserved + four u4 dim sizes — rank > 0 makes
                # the member a fixed-shape subarray (pre-1.8 array
                # members, before class 10 existed)
                rank = b[p]
                if rank:
                    if rank > 4:
                        raise ValueError(
                            f"v1 compound member rank {rank} > 4 — "
                            "corrupt input"
                        )
                    v1_dims = struct.unpack_from(
                        f"<{rank}I", b, p + 12)
                    if any(d == 0 for d in v1_dims):
                        raise ValueError(
                            "v1 compound array member with a zero "
                            "dimension — corrupt input"
                        )
                p += 28
            mdt, mlen = _parse_datatype_sized(b[p:])
            p += mlen
            if isinstance(mdt, tuple):
                if mdt[0] == "str":
                    mdt = np.dtype(f"S{mdt[1]}")
                elif mdt[0] == "ref_obj":
                    # netcdf-c's REFERENCE_LIST attr is a compound
                    # with an object-reference member: surface the
                    # stored file address as u8
                    mdt = np.dtype("<u8")
                else:
                    raise NotImplementedError(
                        "vlen/region-ref-typed compound members "
                        "outside the native subset"
                    )
            if v1_dims:
                mdt = np.dtype((mdt, tuple(v1_dims)))
            names.append(mname)
            formats.append(mdt)
            offsets.append(moff)
        return np.dtype({"names": names, "formats": formats,
                         "offsets": offsets, "itemsize": size}), p
    raise NotImplementedError(
        f"HDF5 datatype class {cls} (v{ver}) outside the native subset "
        "(fixed-point/float/fixed-string/compound/array/vlen-string)"
    )


def _gheap_object(r: _R, addr: int, index: int) -> bytes:
    """Global heap collection (``GCOL``) → raw bytes of the object
    with the given heap index — the storage HDF5 variable-length
    data points into. Objects are (index u2, refcount u2, reserved
    u4, size u8, data 8-padded); index 0 marks the free-space
    terminator."""
    if r.b[addr:addr + 4] != b"GCOL":
        raise ValueError("bad global heap collection signature")
    if r.b[addr + 4] != 1:
        raise NotImplementedError(
            f"global heap version {r.b[addr + 4]}"
        )
    size = r.u(addr + 8, 8)
    p, end = addr + 16, addr + size
    while p + 16 <= end:
        idx = r.u(p, 2)
        osize = r.u(p + 8, 8)
        if idx == 0:
            break
        if idx == index:
            return r.b[p + 16:p + 16 + osize]
        p += 16 + (osize + 7) // 8 * 8
    raise ValueError(f"global heap object {index} not found")


def _sel_need(b: bytes, off: int, n: int, what: str) -> None:
    """Length-gate before unpacking untrusted global-heap/selection
    bytes, so a truncated region-reference payload raises the loud
    ValueError the rest of the parser promises instead of a raw
    struct.error (ADVICE r13)."""
    if off + n > len(b) or off < 0:
        raise ValueError(
            f"truncated {what}: need {n} bytes at offset {off}, "
            f"have {max(len(b) - off, 0)}")


def _parse_serialized_selection(b: bytes, off: int = 0) -> dict:
    """Serialized dataspace selection (the payload of a dataset-region
    reference after its 8-byte object address) → dict. Version-1
    layout per the public spec: u4 selection type (0 none / 1 points /
    2 hyperslab / 3 all), u4 version, then for points/hyperslab:
    u4 padding, u4 length, u4 rank, u4 count, and count × rank u4
    coordinates (points) or count × 2·rank u4 start/end corners
    (hyperslab blocks)."""
    _sel_need(b, off, 8, "serialized selection header")
    stype = struct.unpack_from("<I", b, off)[0]
    ver = struct.unpack_from("<I", b, off + 4)[0]
    if stype == 0:
        return {"type": "none"}
    if stype == 3:
        return {"type": "all"}
    if ver != 1:
        raise NotImplementedError(
            f"serialized selection version {ver} (v1 decodes natively)"
        )
    if stype not in (1, 2):
        raise NotImplementedError(f"selection type {stype}")
    _sel_need(b, off, 24, "selection rank/count fields")
    rank = struct.unpack_from("<I", b, off + 16)[0]
    count = struct.unpack_from("<I", b, off + 20)[0]
    if rank == 0 or rank > 32 or count > 1_000_000:
        raise ValueError(
            f"implausible selection rank {rank} / count {count}"
        )
    p = off + 24
    per = (4 if stype == 1 else 8) * rank
    _sel_need(b, p, per * count, "selection coordinate block")
    if stype == 1:
        pts = []
        for _ in range(count):
            pts.append(tuple(struct.unpack_from(f"<{rank}I", b, p)))
            p += 4 * rank
        return {"type": "points", "rank": rank, "points": pts}
    blocks = []
    for _ in range(count):
        start = tuple(struct.unpack_from(f"<{rank}I", b, p))
        end = tuple(struct.unpack_from(f"<{rank}I", b, p + 4 * rank))
        blocks.append((start, end))
        p += 8 * rank
    return {"type": "hyperslab", "rank": rank, "blocks": blocks}


def _read_references(r: _R, kind: str, layout: bytes, shape,
                     name_by_addr: dict):
    """Materialize an object- or region-reference dataset (contiguous
    layout — QA/index tables are small and written contiguous) as a
    numpy OBJECT array of {address, name[, selection]} dicts; null
    references (address 0 / undefined) land as None."""
    ver, lclass = layout[0], layout[1]
    if ver != 3 or lclass != 1:
        raise NotImplementedError(
            f"reference dataset with layout v{ver} class {lclass} "
            "(contiguous v3 decodes natively)"
        )
    addr = struct.unpack_from("<Q", layout, 2)[0]
    n = int(np.prod(shape)) if shape else 1
    esize = 8 if kind == "ref_obj" else 12
    if addr == _UNDEF:
        return None
    if addr + n * esize > len(r.b):
        raise ValueError("reference dataset data out of bounds")
    out = np.empty(n, dtype=object)
    for i in range(n):
        p = addr + i * esize
        if kind == "ref_obj":
            oh = r.u(p, 8)
            if oh in (0, _UNDEF):
                out[i] = None
                continue
            out[i] = {"address": oh, "name": name_by_addr.get(oh)}
        else:
            gaddr = r.u(p, 8)
            gidx = r.u(p + 8, 4)
            if gaddr in (0, _UNDEF) or gidx == 0:
                out[i] = None
                continue
            obj = _gheap_object(r, gaddr, gidx)
            _sel_need(obj, 0, 8, "region-reference heap object")
            oh = struct.unpack_from("<Q", obj, 0)[0]
            out[i] = {
                "address": oh,
                "name": name_by_addr.get(oh),
                "selection": _parse_serialized_selection(obj, 8),
            }
    return out.reshape(shape)


def _parse_dataspace(b: bytes, with_max: bool = False):
    """Dataspace message → dims tuple; ``with_max=True`` also returns
    the max-dims tuple (None when absent) — all-ones max entries are
    UNLIMITED dimensions, which steer the Extensible Array chunk
    order (libhdf5 swizzles the unlimited dim to the front)."""
    ver = b[0]
    rank = b[1]
    flags = b[2]
    if ver == 1:
        off = 8
    elif ver == 2:
        off = 4
    else:
        raise NotImplementedError(f"dataspace version {ver}")
    dims = tuple(
        struct.unpack_from("<Q", b, off + 8 * i)[0] for i in range(rank)
    )
    if not with_max:
        return dims
    maxdims = None
    if flags & 0x01:
        off += 8 * rank
        maxdims = tuple(
            struct.unpack_from("<Q", b, off + 8 * i)[0]
            for i in range(rank)
        )
    return dims, maxdims


_MAX_HEADER_BLOCKS = 256  # continuation-chain cap: loud error, not a hang


def _parse_messages(r: _R, addr: int):
    """Object header at ``addr`` → list of (type, body bytes),
    following continuation messages/blocks. Dispatches on the header
    flavor: v2 ``OHDR`` signature vs v1 version byte. Continuation
    chains are cycle-guarded (this reader runs on untrusted
    distributed granule bytes — a corrupt self-referencing chain must
    raise, never hang an executor)."""
    if r.b[addr:addr + 4] == b"OHDR":
        return _parse_messages_v2(r, addr)
    ver = r.b[addr]
    if ver != 1:
        raise NotImplementedError(
            f"object header version {ver} (v1 and v2/OHDR are parsed "
            "natively)"
        )
    nmsg = r.u(addr + 2, 2)
    blocks = [(addr + 16, r.u(addr + 8, 4))]
    seen = {addr + 16}
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
                o2 = struct.unpack_from("<Q", body, 0)[0]
                if o2 in seen or len(blocks) >= _MAX_HEADER_BLOCKS:
                    raise ValueError(
                        "corrupt object header: continuation cycle or "
                        f"chain longer than {_MAX_HEADER_BLOCKS} blocks"
                    )
                seen.add(o2)
                blocks.append((o2, struct.unpack_from("<Q", body, 8)[0]))
            else:
                out.append((mtype, body))
            off += 8 + msize
        bi += 1
    return out


def _parse_messages_v2(r: _R, addr: int):
    """v2 (``OHDR``) object header → list of (type, body bytes).
    Continuations live in ``OCHK`` blocks (4-byte signature + messages
    + 4-byte checksum); checksums are not verified. Optional prefix
    fields are sized by the header flags per spec IV.A.1.b."""
    if r.b[addr + 4] != 2:
        raise NotImplementedError(
            f"OHDR version {r.b[addr + 4]} (only v2 is parsed natively)"
        )
    flags = r.b[addr + 5]
    off = addr + 6
    if flags & 0x20:  # access/mod/change/birth times stored
        off += 16
    if flags & 0x10:  # attribute storage phase-change values stored
        off += 4
    szsz = 1 << (flags & 0x3)
    chunk0 = r.u(off, szsz)
    off += szsz
    hdr = 6 if flags & 0x04 else 4  # +2 creation-order per message
    blocks = [(off, chunk0)]
    seen = {off}
    out = []
    bi = 0
    while bi < len(blocks):
        pos, size = blocks[bi]
        end = pos + size
        while pos + hdr <= end:
            mtype = r.b[pos]
            msize = r.u(pos + 1, 2)
            body = r.b[pos + hdr:pos + hdr + msize]
            if mtype == 0x0010:  # continuation → OCHK block
                o2 = struct.unpack_from("<Q", body, 0)[0]
                l2 = struct.unpack_from("<Q", body, 8)[0]
                if r.b[o2:o2 + 4] != b"OCHK":
                    raise ValueError("bad OCHK continuation signature")
                if o2 in seen or len(blocks) >= _MAX_HEADER_BLOCKS:
                    raise ValueError(
                        "corrupt OHDR: continuation cycle or chain "
                        f"longer than {_MAX_HEADER_BLOCKS} blocks"
                    )
                seen.add(o2)
                # messages sit between the signature and the trailing
                # 4-byte checksum
                blocks.append((o2 + 4, l2 - 8))
            elif mtype != 0x0000:  # skip NILs
                out.append((mtype, body))
            pos += hdr + msize
        bi += 1
    return out


def _parse_link(body: bytes):
    """Link message (type 0x0006) → (name, object header address).
    Only hard links are in the subset — soft/external links have no
    meaning for flat CF granule groups."""
    if body[0] != 1:
        raise NotImplementedError(f"link message version {body[0]}")
    flags = body[1]
    off = 2
    ltype = 0
    if flags & 0x08:
        ltype = body[off]
        off += 1
    if flags & 0x04:  # creation order
        off += 8
    if flags & 0x10:  # charset
        off += 1
    lsz = 1 << (flags & 0x3)
    nlen = int.from_bytes(body[off:off + lsz], "little")
    off += lsz
    name = body[off:off + nlen].decode("utf-8")
    off += nlen
    if ltype != 0:
        raise NotImplementedError(
            f"link {name!r} has type {ltype} (only hard links are in "
            "the subset)"
        )
    return name, struct.unpack_from("<Q", body, off)[0]


def _fractal_heap_fetch(r: _R, frhp_addr: int):
    """Fractal heap header (``FRHP``) → ``fetch(heap_id) -> bytes``
    for MANAGED objects — the storage behind dense (new-style) group
    links (HDF5 spec III.G). Subset: unfiltered heaps; root either a
    single direct block (``FHDB``) or one level of indirect block
    (``FHIB``) whose children are all direct — i.e. every heap a
    link index realistically produces (the doubling table reaches
    megabytes of names before a second indirect level exists).
    Checksums are not verified, matching the OHDR/superblock
    precedent; structural inconsistencies raise."""
    if r.b[frhp_addr:frhp_addr + 4] != b"FRHP":
        raise ValueError("bad fractal heap signature")
    if r.b[frhp_addr + 4] != 0:
        raise NotImplementedError(
            f"fractal heap version {r.b[frhp_addr + 4]}"
        )
    id_len = r.u(frhp_addr + 5, 2)
    io_filter_len = r.u(frhp_addr + 7, 2)
    if io_filter_len:
        raise NotImplementedError(
            "filtered fractal heap (I/O filters on a link heap are "
            "outside the subset)"
        )
    flags = r.b[frhp_addr + 9]
    managed_space = r.u(frhp_addr + 46, 8)
    table_width = r.u(frhp_addr + 110, 2)
    start_size = r.u(frhp_addr + 112, 8)
    max_direct = r.u(frhp_addr + 120, 8)
    max_heap_bits = r.u(frhp_addr + 128, 2)
    root_addr = r.u(frhp_addr + 132, 8)
    cur_rows = r.u(frhp_addr + 140, 2)
    off_size = (max_heap_bits + 7) // 8
    len_size = id_len - 1 - off_size
    if len_size <= 0 or table_width == 0 or start_size == 0:
        raise ValueError("inconsistent fractal heap header")
    # direct block header: sig(4) ver(1) heap-hdr addr(8) block
    # offset (off_size) [+ checksum(4) when flags bit 1]
    dblk_hdr = 4 + 1 + 8 + off_size + (4 if flags & 0x02 else 0)
    # doubling table: rows 0 and 1 hold width blocks of start_size;
    # row k ≥ 2 holds width blocks of start_size · 2^(k-1)
    max_direct_rows = (
        (max_direct // start_size).bit_length() + 1
        if max_direct >= start_size else 1
    )

    def row_size(row: int) -> int:
        return start_size if row < 2 else start_size << (row - 1)

    def locate(heap_off: int):
        """heap-space offset → (file addr of containing direct block,
        that block's heap-space offset)."""
        if cur_rows == 0:
            # root IS a single direct block; its size is implicit —
            # with one block, managed space equals the block size
            if heap_off >= managed_space:
                raise ValueError("heap offset beyond root direct block")
            return root_addr, 0
        if r.b[root_addr:root_addr + 4] != b"FHIB":
            raise ValueError("bad fractal heap indirect block signature")
        row, row_start = 0, 0
        while heap_off >= row_start + table_width * row_size(row):
            row_start += table_width * row_size(row)
            row += 1
            if row >= cur_rows:
                raise ValueError("heap offset beyond indirect block rows")
        if row >= max_direct_rows:
            raise NotImplementedError(
                "second-level indirect fractal heap blocks are outside "
                "the subset (link heap over the direct-row capacity)"
            )
        col = (heap_off - row_start) // row_size(row)
        entry = root_addr + 4 + 1 + 8 + off_size + (row * table_width
                                                    + col) * 8
        child = r.u(entry, 8)
        if child == 0xFFFFFFFFFFFFFFFF:
            raise ValueError("heap offset in an unallocated block")
        return child, row_start + col * row_size(row)

    def fetch(heap_id: bytes) -> bytes:
        idf = heap_id[0]
        if (idf >> 4) & 0x3 != 0:
            raise NotImplementedError(
                "huge/tiny fractal-heap object IDs are outside the "
                "subset (link records are always managed)"
            )
        heap_off = int.from_bytes(heap_id[1:1 + off_size], "little")
        nbytes = int.from_bytes(
            heap_id[1 + off_size:1 + off_size + len_size], "little"
        )
        blk_addr, blk_off = locate(heap_off)
        if r.b[blk_addr:blk_addr + 4] != b"FHDB":
            raise ValueError("bad fractal heap direct block signature")
        # the heap's address space includes each block's own header
        p = blk_addr + (heap_off - blk_off)
        return r.b[p:p + nbytes]

    # silence the unused-variable linters: dblk_hdr documents the
    # layout; offsets are header-inclusive so it never shifts reads
    del dblk_hdr
    fetch.id_len = id_len  # record parsers slice heap IDs by this
    return fetch


def _btree_v2_records(r: _R, bthd_addr: int):
    """v2 B-tree (``BTHD``) → iterator of raw record bytes, any
    depth: ``BTIN`` internal nodes interleave records with child
    pointers whose field widths follow libhdf5's size tables —
    ``max_nrec_size`` (from the leaf capacity) for the child record
    count, plus the cumulative-subtree size for depths > 1. In-order
    traversal yields records sorted, matching the library."""
    if r.b[bthd_addr:bthd_addr + 4] != b"BTHD":
        raise ValueError("bad v2 B-tree header signature")
    if r.b[bthd_addr + 4] != 0:
        raise NotImplementedError(
            f"v2 B-tree version {r.b[bthd_addr + 4]}"
        )
    node_size = r.u(bthd_addr + 6, 4)
    rec_size = r.u(bthd_addr + 10, 2)
    if rec_size < 1 or node_size < 10 + rec_size:
        # corrupt sizes would divide by zero in the leaf-capacity
        # table (or make it zero records per node)
        raise ValueError("corrupt v2 B-tree header sizes")
    depth = r.u(bthd_addr + 12, 2)
    root_addr = r.u(bthd_addr + 16, 8)
    root_nrec = r.u(bthd_addr + 24, 2)

    def enc_size(n):  # H5VM_limit_enc_size: floor(log2 n)//8 + 1
        # NOT bit_length()//8 + 1 — that over-counts by one whole byte
        # whenever bit_length is a multiple of 8 (n in 128..255, ...),
        # skewing every BTIN child-pointer width (code-review r10)
        return max(0, n.bit_length() - 1) // 8 + 1

    # libhdf5's per-depth capacity tables (H5B2hdr.c): child-pointer
    # widths derive from the leaf max and cumulative subtree maxima
    leaf_max = (node_size - 10) // rec_size
    max_nrec_size = enc_size(leaf_max)
    cum = [leaf_max]
    cum_size = [enc_size(leaf_max)]
    ptr_size = [0]
    for u in range(1, depth + 1):
        psz = 8 + max_nrec_size + (cum_size[u - 1] if u > 1 else 0)
        ptr_size.append(psz)
        nrec_u = (node_size - (10 + psz)) // (rec_size + psz)
        cum.append((nrec_u + 1) * cum[u - 1] + nrec_u)
        cum_size.append(enc_size(cum[-1]))

    def walk(addr, nrec, d):
        if d == 0:
            if r.b[addr:addr + 4] != b"BTLF":
                raise ValueError("bad v2 B-tree leaf signature")
            p = addr + 6
            for _ in range(nrec):
                yield r.b[p:p + rec_size]
                p += rec_size
            return
        if r.b[addr:addr + 4] != b"BTIN":
            raise ValueError("bad v2 B-tree internal node signature")
        p = addr + 6
        recs = []
        for _ in range(nrec):
            recs.append(r.b[p:p + rec_size])
            p += rec_size
        children = []
        psz = ptr_size[d]
        for _ in range(nrec + 1):
            caddr = struct.unpack_from("<Q", r.b, p)[0]
            cnrec = int.from_bytes(
                r.b[p + 8:p + 8 + max_nrec_size], "little")
            children.append((caddr, cnrec))
            p += psz
        for i, (caddr, cnrec) in enumerate(children):
            yield from walk(caddr, cnrec, d - 1)
            if i < nrec:
                yield recs[i]

    yield from walk(root_addr, root_nrec, depth)


def _walk_dense_links(r: _R, li_body: bytes):
    """Link Info message (0x0002) with dense storage → [(name, object
    header address)]: records from the name-index v2 B-tree (type 5:
    4-byte name hash + fractal-heap ID) resolve through the fractal
    heap to serialized Link messages."""
    if li_body[0] != 0:
        raise NotImplementedError(
            f"link info message version {li_body[0]}"
        )
    flags = li_body[1]
    off = 2 + (8 if flags & 0x01 else 0)
    fheap_addr = struct.unpack_from("<Q", li_body, off)[0]
    name_bt_addr = struct.unpack_from("<Q", li_body, off + 8)[0]
    if fheap_addr == 0xFFFFFFFFFFFFFFFF:
        return []  # empty group: dense storage never allocated
    fetch = _fractal_heap_fetch(r, fheap_addr)
    out = []
    for rec in _btree_v2_records(r, name_bt_addr):
        out.append(_parse_link(fetch(rec[4:])))
    return out


def _walk_dense_attrs(r: _R, ai_body: bytes):
    """Attribute Info message (0x0015) with dense storage → [(name,
    value)]: records from the attribute-name v2 B-tree (type 8:
    8-byte heap ID + message flags + creation order + name hash)
    resolve through the fractal heap to serialized Attribute
    messages — the storage libhdf5 switches to past ~8 attributes
    under libver=latest. Shared-message heap IDs (flag bit 0) are
    outside the subset and raise."""
    if ai_body[0] != 0:
        raise NotImplementedError(
            f"attribute info message version {ai_body[0]}"
        )
    flags = ai_body[1]
    off = 2 + (2 if flags & 0x01 else 0)
    fheap_addr = struct.unpack_from("<Q", ai_body, off)[0]
    name_bt_addr = struct.unpack_from("<Q", ai_body, off + 8)[0]
    if fheap_addr == 0xFFFFFFFFFFFFFFFF:
        return []
    fetch = _fractal_heap_fetch(r, fheap_addr)
    idl = fetch.id_len
    out = []
    for rec in _btree_v2_records(r, name_bt_addr):
        if rec[idl] & 0x01:
            raise NotImplementedError(
                "shared dense attribute message (flag bit 0) is "
                "outside the subset"
            )
        out.append(_parse_attr(fetch(rec[:idl]), r))
    return out


def _parse_attr(body: bytes, r: _R = None):
    """Attribute message v1/v3 → (name, python value). ``r`` (the
    whole-file reader) lets variable-length string values resolve
    through the global heap; without it they are skipped."""
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
    if typ == ("vlen_str",):
        if r is None:
            return name, None
        # each element: length u4, global-heap collection addr u8,
        # object index u4
        vals = []
        for i in range(n):
            p = off + 16 * i
            length = struct.unpack_from("<I", body, p)[0]
            gaddr = struct.unpack_from("<Q", body, p + 4)[0]
            gidx = struct.unpack_from("<I", body, p + 12)[0]
            if length == 0 or gaddr in (0, _UNDEF):
                # libhdf5 stores "" as {len=0, addr=0, idx=0} with no
                # GCOL object allocated — dereferencing would misread
                # the file head as a heap (code-review r10)
                vals.append("")
                continue
            raw = _gheap_object(r, gaddr, gidx)[:length]
            vals.append(raw.decode("utf-8", "replace"))
        return name, vals[0] if not dims else vals
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
    seen: set = set()

    def node(addr):
        if addr in seen:
            raise ValueError("corrupt group B-tree: node cycle")
        seen.add(addr)
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


def _unshuffle(raw: bytes, itemsize: int) -> bytes:
    """Undo the HDF5 shuffle filter (id 2): on write all byte-0s of
    every element come first, then all byte-1s, … — a pure transpose.
    A non-element-multiple tail (spec: left unshuffled) passes
    through unchanged."""
    if itemsize <= 1:
        return raw
    n = len(raw) // itemsize
    body = n * itemsize
    out = (
        np.frombuffer(raw[:body], dtype="u1")
        .reshape(itemsize, n)
        .T.tobytes()
    )
    return out + raw[body:]


def _fletcher32(data: bytes) -> int:
    """HDF5's fletcher-32 checksum (filter id 3 — the one-flag
    netcdf-c integrity option): 16-bit words built BIG-endian from
    byte pairs (odd tail = last byte << 8, per the library's
    H5_checksum_fletcher32 behavior), checksum = (sum2 << 16) | sum1.
    The library reduces with ones'-complement FOLDING
    ``(x & 0xffff) + (x >> 16)``, which is mod-65535 arithmetic
    EXCEPT that nonzero multiples of 65535 land on 0xFFFF, not 0 —
    a plain ``%`` would reject ~1 in 33k valid libhdf5 chunks (and
    emit checksums libhdf5 rejects). Vectorized: sum2 over the word
    stream equals Σ (n−i)·wᵢ; accumulated per block in Python ints
    so multi-hundred-MB chunks cannot wrap uint64."""
    n2 = len(data) // 2 * 2
    words = np.frombuffer(data[:n2], dtype=">u2").astype(np.uint64)
    if len(data) & 1:
        words = np.concatenate(
            [words, np.array([data[-1] << 8], dtype=np.uint64)]
        )
    n = len(words)
    if n == 0:
        return 0
    blk = 1 << 20  # per-block dots stay far under uint64 range
    s1 = s2 = 0
    idx = np.arange(min(blk, n), dtype=np.uint64)
    for o in range(0, n, blk):
        w = words[o:o + blk]
        m = len(w)
        ws = int(w.sum())
        s1 += ws
        # Σ_j (n-(o+j))·w_j = (n-o)·Σw - Σ j·w_j
        s2 += (n - o) * ws - int((idx[:m] * w).sum())

    def fold(x):
        return 0 if x == 0 else (x - 1) % 65535 + 1

    return (fold(s2) << 16) | fold(s1)


def _apply_filters(raw: bytes, fmask: int, filters, itemsize: int,
                   nelmts: int | None = None) -> bytes:
    """Undo the filter pipeline in reverse write order. Entries are
    ``(fid, client_data_values)`` pairs. The key's filter mask marks
    PER-CHUNK skipped filters by pipeline index (an optional deflate —
    or an encoder-less szip — stores incompressible chunks raw with
    its bit set). ``nelmts`` is the chunk's true element count from
    the dataset layout; it bounds the cd-declared count inside
    allocation-sizing decoders (scaleoffset's minbits==0 path) so a
    crafted pipeline message cannot drive a huge zeros()."""
    for idx in range(len(filters) - 1, -1, -1):
        if fmask & (1 << idx):
            continue
        fid, cds = filters[idx]
        if fid == 1:
            raw = zlib.decompress(raw)
        elif fid == 32000:
            from pyresample_spark.sources.lzf import lzf_decompress

            # bound the output by the chunk's TRUE byte size from the
            # dataset layout (+4 for a possible fletcher32 riding
            # under the compressor); the cd bufsize hint (h5py
            # cd_values[2]) is untrusted and only consulted when the
            # layout count is unavailable
            if nelmts is not None:
                cap = nelmts * itemsize + 64
            elif len(cds) >= 3 and 0 < cds[2] <= (1 << 28):
                cap = int(cds[2]) + 64
            else:
                cap = 1 << 28
            raw = lzf_decompress(raw, cap)
        elif fid == 32004:
            from pyresample_spark.sources.lz4 import h5_lz4_decode

            cap = (nelmts * itemsize + 64 if nelmts is not None
                   else 1 << 28)
            raw = h5_lz4_decode(raw, cap)
        elif fid == 32015:
            from pyresample_spark.sources.zstd import h5_zstd_decode

            # the registered zstd filter stores a plain zstd frame;
            # output bounded by the chunk's true byte size
            cap = (nelmts * itemsize + 64 if nelmts is not None
                   else 1 << 28)
            raw = h5_zstd_decode(raw, cap)
        elif fid == 32008:
            from pyresample_spark.sources.bitshuffle import (
                bitshuffle_decode,
            )

            # cd = (major, minor, elem_size, block_elems, compression)
            # — the element size must agree with the datatype; the
            # block size rides the chunk header in the LZ4 variant
            if len(cds) >= 3 and cds[2] and cds[2] != itemsize:
                raise ValueError(
                    f"bitshuffle cd element size {cds[2]} disagrees "
                    f"with the datatype's {itemsize}")
            cap = (nelmts * itemsize + 64 if nelmts is not None
                   else 1 << 28)
            raw = bitshuffle_decode(
                raw, itemsize,
                int(cds[3]) if len(cds) >= 4 else 0,
                int(cds[4]) if len(cds) >= 5 else 0,
                cap)
        elif fid == 2:
            raw = _unshuffle(raw, itemsize)
        elif fid == 4:
            from pyresample_spark.sources.szip import h5_szip_decode

            raw = h5_szip_decode(raw, cds)
        elif fid == 5:
            from pyresample_spark.sources.nbit import h5_nbit_decode

            raw = h5_nbit_decode(raw, cds)
        elif fid == 6:
            from pyresample_spark.sources.scaleoffset import (
                h5_scaleoffset_decode,
            )

            raw = h5_scaleoffset_decode(raw, cds, max_nelmts=nelmts)
        elif fid == 3:
            # verify-and-strip: the filter appends the 4-byte checksum
            # little-endian; a mismatch means the chunk is corrupt and
            # silent ingestion would poison everything downstream
            stored = struct.unpack_from("<I", raw, len(raw) - 4)[0]
            body = raw[:-4]
            got = _fletcher32(body)
            if got != stored:
                raise ValueError(
                    f"fletcher32 checksum mismatch: stored {stored:#x}, "
                    f"computed {got:#x} — corrupt HDF5 chunk"
                )
            raw = body
        else:  # unreachable: the pipeline parse rejects unknown ids
            raise NotImplementedError(f"HDF5 filter {fid}")
    return raw


def _read_chunked(r: _R, btree_addr: int, shape, dtype, chunk_dims,
                  filters):
    rank = len(shape)
    arr = np.zeros(shape, dtype=dtype.newbyteorder("="))
    seen: set = set()

    def node(addr):
        if addr in seen:
            raise ValueError("corrupt chunk B-tree: node cycle")
        seen.add(addr)
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
                raw = _apply_filters(
                    r.b[child:child + nbytes], fmask, filters,
                    dtype.itemsize, nelmts=int(np.prod(chunk_dims)),
                )
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


def _chunk_grid_iter(shape, cdims):
    """Yield per-chunk (dst slices, src slices) in C order — the
    linear order every v4 chunk index stores its entries in."""
    import itertools

    counts = [
        (shape[d] + cdims[d] - 1) // cdims[d] for d in range(len(shape))
    ]
    for coords in itertools.product(*(range(c) for c in counts)):
        dst, src = [], []
        for d, c in enumerate(coords):
            lo = c * cdims[d]
            hi = min(lo + cdims[d], shape[d])
            dst.append(slice(lo, hi))
            src.append(slice(0, hi - lo))
        yield tuple(dst), tuple(src)


class _EAElems(list):
    """Positional chunk-index elements + the geometry needed to
    decode them (element size, client id)."""

    esize = 0
    client = 0


def _ea_geometry(max_bits: int, db_min: int, sb_min_ptrs: int):
    """The Extensible Array doubling geometry, shared by the reader
    (:func:`_ea_elements`) and the writer (hdf5_grid_bytes EA mode) so
    the subtlest spec math in this module exists exactly once: super
    block u holds 2^(u//2) data blocks of db_min·2^((u+1)//2) elements
    each. Returns (info rows (nd, ne, start_idx, start_dblk), number
    of super blocks whose data blocks the index block addresses
    directly, count of those directly-addressed data blocks)."""
    nsblks = 1 + (max_bits - (db_min.bit_length() - 1))
    info, start_idx, start_dblk = [], 0, 0
    for u in range(nsblks):
        nd, ne = 1 << (u // 2), db_min << ((u + 1) // 2)
        info.append((nd, ne, start_idx, start_dblk))
        start_idx += nd * ne
        start_dblk += nd
    n_in_ib = 2 * (sb_min_ptrs.bit_length() - 1)
    ndblk_addrs = sum(info[u][0] for u in range(min(n_in_ib, nsblks)))
    return info, n_in_ib, ndblk_addrs


def _ea_elements(r: _R, hd_addr: int) -> _EAElems:
    """Extensible Array chunk index (``EAHD``/``EAIB``/``EASB``/
    ``EADB``) → positional element list, one entry per linear chunk
    index in C order — the index libhdf5 picks for datasets with ONE
    unlimited dimension, i.e. every appended-time-axis netCDF4
    product written with libver=latest. Implements the doubling
    super-block geometry of the published spec (§ "Extensible Array"):
    the first ``idx_blk_elmts`` elements live inline in the index
    block, the next super blocks' data blocks are addressed directly
    from the index block (the first ``2·log2(sup_blk_min_data_ptrs)``
    super blocks), and later super blocks indirect through ``EASB``
    blocks whose page-init bitmaps gate paged data blocks. Unwritten
    elements/pages surface as undefined addresses and keep the fill
    value."""
    b = r.b
    if b[hd_addr:hd_addr + 4] != b"EAHD":
        raise ValueError("bad extensible array header signature")
    client = b[hd_addr + 5]
    esize = b[hd_addr + 6]
    max_bits = b[hd_addr + 7]
    ib_elmts = b[hd_addr + 8]
    db_min = b[hd_addr + 9]
    sb_min_ptrs = b[hd_addr + 10]
    page_bits = b[hd_addr + 11]
    max_idx_set = r.u(hd_addr + 44, 8)
    ib_addr = r.u(hd_addr + 60, 8)
    if client not in (0, 1):
        raise NotImplementedError(f"extensible array client {client}")
    if esize < 1 or db_min < 1 or sb_min_ptrs < 1:
        # corrupt creation params would divide by zero in the
        # doubling-table lookup (idx // db_min)
        raise ValueError("corrupt extensible array creation parameters")
    # untrusted-bytes guard: stored elements occupy ≥1 byte each, so
    # an element count past the file size is corruption — reject
    # BEFORE the positional list materializes it
    if max_idx_set > len(b):
        raise ValueError(
            f"extensible array claims {max_idx_set} elements in a "
            f"{len(b)}-byte file — corrupt input"
        )
    out = _EAElems()
    out.esize, out.client = esize, client
    if ib_addr == _UNDEF or max_idx_set == 0:
        return out
    if b[ib_addr:ib_addr + 4] != b"EAIB":
        raise ValueError("bad extensible array index block signature")
    arr_off = (max_bits + 7) // 8
    page_n = 1 << page_bits
    undef_elem = b"\xff" * esize
    # libhdf5's doubling table (shared helper — covering 2^max_bits
    # elements needs max_bits − log2(db_min) + 1 super blocks; the
    # lookup sblk = log2(idx/db_min + 1) reaches exactly that far)
    info, n_in_ib, ndblk_addrs = _ea_geometry(
        max_bits, db_min, sb_min_ptrs)
    nsblks = len(info)
    p = ib_addr + 14
    ib_elems = [b[p + i * esize:p + (i + 1) * esize]
                for i in range(ib_elmts)]
    p += ib_elmts * esize
    dblk_addrs = [r.u(p + 8 * i, 8) for i in range(ndblk_addrs)]
    p += 8 * ndblk_addrs
    sblk_addrs = [r.u(p + 8 * i, 8)
                  for i in range(max(0, nsblks - n_in_ib))]

    def dblk_elem(daddr, nelmts, k, page_init):
        if b[daddr:daddr + 4] != b"EADB":
            raise ValueError("bad extensible array data block signature")
        npages = (nelmts + page_n - 1) // page_n if nelmts > page_n else 1
        if npages > 1:
            pg, off = divmod(k, page_n)
            if page_init is not None and not page_init(pg):
                return undef_elem
            pstart = (daddr + 14 + arr_off + 4
                      + pg * (page_n * esize + 4))
            return b[pstart + off * esize:pstart + (off + 1) * esize]
        base = daddr + 14 + arr_off
        return b[base + k * esize:base + (k + 1) * esize]

    sblk_cache = {}
    for idx in range(max_idx_set):
        if idx < ib_elmts:
            out.append(ib_elems[idx])
            continue
        idx2 = idx - ib_elmts
        u = (idx2 // db_min + 1).bit_length() - 1
        nd, ne, s_idx, s_dblk = info[u]
        dnum, k = divmod(idx2 - s_idx, ne)
        if u < n_in_ib:
            daddr, page_init = dblk_addrs[s_dblk + dnum], None
        else:
            saddr = sblk_addrs[u - n_in_ib]
            if saddr == _UNDEF:
                out.append(undef_elem)
                continue
            if saddr not in sblk_cache:
                if b[saddr:saddr + 4] != b"EASB":
                    raise ValueError(
                        "bad extensible array super block signature")
                npg = (ne + page_n - 1) // page_n if ne > page_n else 1
                q = saddr + 14 + arr_off
                bmp = b[q:q + (nd * npg + 7) // 8] if npg > 1 else b""
                q += len(bmp)
                addrs = [r.u(q + 8 * i, 8) for i in range(nd)]
                sblk_cache[saddr] = (addrs, bmp, npg)
            addrs, bmp, npg = sblk_cache[saddr]
            daddr = addrs[dnum]
            if npg > 1:
                def page_init(pg, _d=dnum, _b=bmp, _n=npg):
                    i = _d * _n + pg
                    return bool(_b[i // 8] & (0x80 >> (i % 8)))
            else:
                page_init = None
        if daddr == _UNDEF:
            out.append(undef_elem)
            continue
        out.append(dblk_elem(daddr, ne, k, page_init))
    return out


def _read_chunked_v4(r: _R, flags: int, cdims, idx_type: int,
                     idx_field: bytes, addr: int, shape, dtype,
                     filters, maxdims=None):
    """Version-4 chunked data layouts (HDF5 ≥1.10 libver=latest):
    Single Chunk (1), Implicit (2), Fixed Array (3, clients 0/1,
    paged and unpaged data blocks), Extensible Array (4, one
    unlimited dimension — :func:`_ea_elements`) and any-depth v2
    B-tree (5, several unlimited dimensions, record types 10/11)
    all decode natively — the full index set libhdf5 picks from."""
    if not cdims or any(c <= 0 for c in cdims):
        # corrupt layout dims would divide by zero in the grid walk
        raise ValueError(f"corrupt chunk dimensions {cdims}")
    nominal = int(np.prod(cdims)) * dtype.itemsize
    arr = np.zeros(shape, dtype=dtype.newbyteorder("="))

    def place_chunk(raw_addr, nbytes, fmask, dst, src):
        raw = r.b[raw_addr:raw_addr + nbytes]
        if filters:
            raw = _apply_filters(raw, fmask, filters, dtype.itemsize,
                                 nelmts=int(np.prod(cdims)))
        chunk = np.frombuffer(raw, dtype=dtype, count=int(np.prod(cdims)))
        chunk = chunk.reshape(cdims)
        arr[dst] = chunk[src]

    if idx_type == 1:  # single chunk
        if flags & 0x02:  # filtered: size + mask ride the layout msg
            nbytes = struct.unpack_from("<Q", idx_field, 0)[0]
            fmask = struct.unpack_from("<I", idx_field, 8)[0]
        else:
            nbytes, fmask = nominal, 0
        dst, src = next(_chunk_grid_iter(shape, cdims))
        place_chunk(addr, nbytes, fmask, dst, src)
        return arr
    if idx_type == 2:  # implicit: unfiltered chunks, C order, packed
        if filters:
            raise ValueError("implicit chunk index cannot be filtered")
        a = addr
        for dst, src in _chunk_grid_iter(shape, cdims):
            place_chunk(a, nominal, 0, dst, src)
            a += nominal
        return arr
    if idx_type == 4:  # extensible array (1 unlimited dimension)
        entries = _ea_elements(r, addr)
        esize = entries.esize
        rank = len(cdims)
        counts = [
            (shape[d] + cdims[d] - 1) // cdims[d] for d in range(rank)
        ]
        # libhdf5 SWIZZLES the unlimited dimension to the front
        # before linearizing chunk coords (H5VM_swizzle_coords):
        # element order is C order over the swizzled chunk grid, not
        # the natural one — identical only when the unlimited dim is
        # dim 0 (code-review r10 finding)
        unlim = 0
        if maxdims:
            for d in range(min(rank, len(maxdims))):
                if maxdims[d] == _UNDEF:
                    unlim = d
                    break
        order = [unlim] + [d for d in range(rank) if d != unlim]
        sw_counts = [counts[d] for d in order]
        nchunks = int(np.prod(counts)) if counts else 1
        for e_idx, e in enumerate(entries):
            if e_idx >= nchunks:
                break  # array capacity beyond the current shape
            rem, sw = e_idx, [0] * rank
            for i in range(rank - 1, -1, -1):
                rem, sw[i] = divmod(rem, sw_counts[i])
            coords = [0] * rank
            for i, d in enumerate(order):
                coords[d] = sw[i]
            dst, src = [], []
            for d in range(rank):
                lo = coords[d] * cdims[d]
                hi = min(lo + cdims[d], shape[d])
                dst.append(slice(lo, hi))
                src.append(slice(0, hi - lo))
            dst, src = tuple(dst), tuple(src)
            caddr = int.from_bytes(e[0:8], "little")
            if caddr == _UNDEF:
                continue
            if entries.client == 1:
                size_len = esize - 8 - 4
                nbytes = int.from_bytes(e[8:8 + size_len], "little")
                fmask = int.from_bytes(
                    e[8 + size_len:8 + size_len + 4], "little")
            else:
                nbytes, fmask = nominal, 0
            place_chunk(caddr, nbytes, fmask, dst, src)
        return arr
    if idx_type == 5:  # v2 B-tree (>1 unlimited dimension)
        rtype = r.b[addr + 5]
        if rtype not in (10, 11):
            raise ValueError(f"v2 B-tree record type {rtype} is not a "
                             "chunk index")
        rank = len(cdims)
        for rec in _btree_v2_records(r, addr):
            caddr = int.from_bytes(rec[0:8], "little")
            if rtype == 11:
                size_len = len(rec) - 8 - 4 - 8 * rank
                nbytes = int.from_bytes(rec[8:8 + size_len], "little")
                fmask = int.from_bytes(
                    rec[8 + size_len:8 + size_len + 4], "little")
                p = 8 + size_len + 4
            else:
                nbytes, fmask, p = nominal, 0, 8
            scaled = [
                int.from_bytes(rec[p + 8 * d:p + 8 * (d + 1)], "little")
                for d in range(rank)
            ]
            dst, src = [], []
            for d in range(rank):
                lo = scaled[d] * cdims[d]
                hi = min(lo + cdims[d], shape[d])
                dst.append(slice(lo, hi))
                src.append(slice(0, hi - lo))
            place_chunk(caddr, nbytes, fmask, tuple(dst), tuple(src))
        return arr
    if idx_type != 3:
        raise NotImplementedError(
            f"chunk index type {idx_type} (Single Chunk, Implicit, "
            "Fixed Array, Extensible Array and v2 B-tree all decode "
            "natively — this type is outside the published spec)"
        )
    # fixed array: header -> data block of per-chunk entries
    if r.b[addr:addr + 4] != b"FAHD":
        raise ValueError("bad fixed array header signature")
    client = r.b[addr + 5]
    entry_size = r.b[addr + 6]
    page_bits = r.b[addr + 7]
    nelmts = r.u(addr + 8, 8)
    db_addr = r.u(addr + 16, 8)
    if client not in (0, 1):
        raise NotImplementedError(f"fixed array client {client}")
    # untrusted-bytes guard: each stored element occupies ≥1 byte, so
    # a count past the file size is corruption — reject BEFORE the
    # entries list materializes it
    if nelmts > len(r.b):
        raise ValueError(
            f"fixed array claims {nelmts} elements in a "
            f"{len(r.b)}-byte file — corrupt input"
        )
    if r.b[db_addr:db_addr + 4] != b"FADB":
        raise ValueError("bad fixed array data block signature")
    page_size = 1 << page_bits
    npages = (nelmts + page_size - 1) // page_size
    p = db_addr + 4 + 1 + 1 + 8
    entries = []
    if nelmts > page_size:  # paged: bitmap + cksum, then pages
        # page-init bitmap (MSB-first): an unset bit marks a page
        # libhdf5 never wrote — its bytes are undefined on disk and
        # MUST NOT be parsed as chunk addresses (code-review r10)
        bitmap = r.b[p:p + (npages + 7) // 8]
        p += (npages + 7) // 8 + 4
        left, pg = nelmts, 0
        undef = b"\xff" * entry_size
        while left > 0:
            take = min(page_size, left)
            init = bool(bitmap[pg // 8] & (0x80 >> (pg % 8)))
            for _ in range(take):
                entries.append(r.b[p:p + entry_size] if init else undef)
                p += entry_size
            p += 4  # per-page checksum
            left -= take
            pg += 1
    else:
        for _ in range(nelmts):
            entries.append(r.b[p:p + entry_size])
            p += entry_size
    it = _chunk_grid_iter(shape, cdims)
    for e in entries:
        try:
            dst, src = next(it)
        except StopIteration:
            # corrupt nelmts: more index entries than the chunk grid
            # holds — StopIteration must not escape (it would silently
            # terminate a consuming generator instead of failing)
            raise ValueError(
                "fixed array holds more entries than the dataset's "
                "chunk grid — corrupt input"
            ) from None
        caddr = int.from_bytes(e[0:8], "little")
        if caddr == _UNDEF:
            continue  # unallocated chunk keeps the zero fill
        if client == 1:
            size_len = entry_size - 8 - 4
            nbytes = int.from_bytes(e[8:8 + size_len], "little")
            fmask = int.from_bytes(e[8 + size_len:8 + size_len + 4],
                                   "little")
        else:
            nbytes, fmask = nominal, 0
        place_chunk(caddr, nbytes, fmask, dst, src)
    return arr


def parse_hdf5(buf: bytes) -> dict:
    """Parse the root group of an HDF5 file → {name: {shape, attrs,
    data}} with data materialized as numpy arrays (native byte order).
    Subset: see module docstring; out-of-subset structures raise."""
    if buf[:8] != HDF5_MAGIC:
        raise ValueError("not an HDF5 file")
    r = _R(buf)
    sb_ver = buf[8]
    if sb_ver == 0:
        if buf[13] != 8 or buf[14] != 8:
            raise NotImplementedError("only 8-byte offsets/lengths supported")
        # root symbol table entry at 24 + 4*O = offset 56 into
        # superblock0: base(O) free(O) eof(O) driver(O) start at 24;
        # entry at 24+32=56; its OH address is 8 bytes in
        root_oh = struct.unpack_from("<Q", buf, 56 + 8)[0]
    elif sb_ver in (2, 3):
        # v2/v3 layout (HDF5 ≥1.10 libver=latest writers): magic(8)
        # ver(1) sizeof-offsets(1) sizeof-lengths(1) flags(1) base(8)
        # extension(8) eof(8) root-OH-address(8) checksum(4)
        if buf[9] != 8 or buf[10] != 8:
            raise NotImplementedError("only 8-byte offsets/lengths supported")
        root_oh = struct.unpack_from("<Q", buf, 36)[0]
    else:
        raise NotImplementedError(
            f"HDF5 superblock version {sb_ver} (v0, v2 and v3 are "
            "parsed natively)"
        )
    msgs = _parse_messages(r, root_oh)
    st = next((b for t, b in msgs if t == 0x0011), None)
    if st is not None:  # old-style group: symbol table → B-tree walk
        btree_addr = struct.unpack_from("<Q", st, 0)[0]
        heap_addr = struct.unpack_from("<Q", st, 8)[0]
        entries = _walk_group_btree(r, btree_addr, heap_addr)
    else:  # new-style group: hard-link messages in the header
        entries = [_parse_link(b) for t, b in msgs if t == 0x0006]
        if not entries:
            li = next((b for t, b in msgs if t == 0x0002), None)
            if li is not None:  # dense (fractal-heap) link storage
                entries = _walk_dense_links(r, li)
            else:
                raise NotImplementedError(
                    "root group has neither a symbol table nor link "
                    "messages nor link info"
                )
    out = {}
    for name, oh in entries:
        vmsgs = _parse_messages(r, oh)
        if any(t in (0x0011, 0x0006) for t, _ in vmsgs):
            continue  # sub-group: classic-model CF grids are flat
        attrs = {}
        shape = ()
        maxdims = None
        dtype = None
        layout = None
        filters: list = []
        for t, b in vmsgs:
            if t == 0x0001:
                shape, maxdims = _parse_dataspace(b, with_max=True)
            elif t == 0x0003:
                dtype = _parse_datatype(b)
            elif t == 0x000C:
                k, v = _parse_attr(b, r)
                if v is not None:
                    attrs[k] = v
            elif t == 0x0015:  # dense attribute storage
                for k, v in _walk_dense_attrs(r, b):
                    if v is not None:
                        attrs[k] = v
            elif t == 0x000B:
                # pipeline ORDER matters (shuffle-then-deflate must
                # undo as inflate-then-unshuffle), so collect a list
                ver = b[0]
                nf = b[1]
                off = 8 if ver == 1 else 2
                for _ in range(nf):
                    fid = struct.unpack_from("<H", b, off)[0]
                    if ver == 1:
                        nl = struct.unpack_from("<H", b, off + 2)[0]
                        ncv = struct.unpack_from("<H", b, off + 6)[0]
                        nl_p = (nl + 7) // 8 * 8
                        cds = struct.unpack_from(
                            f"<{ncv}I", b, off + 8 + nl_p
                        )
                        off += 8 + nl_p + 4 * ncv
                        if ncv % 2:
                            off += 4
                    elif ver == 2:
                        # id(2) [namelen(2)+name if id ≥ 256] flags(2)
                        # ncv(2) cd(4·n) — no padding (spec IV.A.2.l)
                        off += 2
                        if fid >= 256:
                            nl = struct.unpack_from("<H", b, off)[0]
                            off += 2 + nl
                        ncv = struct.unpack_from("<H", b, off + 2)[0]
                        cds = struct.unpack_from(f"<{ncv}I", b, off + 4)
                        off += 4 + 4 * ncv
                    else:
                        raise NotImplementedError(
                            f"filter pipeline version {ver}"
                        )
                    # szip (id 4) decodes against its client-data
                    # values, so the pipeline carries (fid, cds) pairs
                    filters.append((fid, cds))
                unknown = ({f for f, _ in filters}
                           - {1, 2, 3, 4, 5, 6, 32000, 32004, 32008,
                              32015})
                if unknown:
                    raise NotImplementedError(
                        f"HDF5 filters {sorted(unknown)} unsupported "
                        "(deflate=1, shuffle=2, fletcher32=3, szip=4, "
                        "nbit=5, scaleoffset=6, lzf=32000 — h5py's "
                        "compression='lzf' — lz4=32004, "
                        "bitshuffle=32008 and zstd=32015 decode "
                        "natively; other registered plugins need the "
                        "libs)"
                    )
            elif t == 0x0008:
                layout = b
        if dtype is None or layout is None:
            continue
        if isinstance(dtype, tuple) and dtype[0] in ("ref_obj",
                                                     "ref_region"):
            # object/region-reference tables (L2 QA products): decode
            # to {address, name[, selection]} structs, resolving the
            # stored object-header addresses against this group's own
            # entries
            name_by_addr = {oh_a: nm for nm, oh_a in entries}
            data = _read_references(r, dtype[0], layout, shape,
                                    name_by_addr)
            out[name] = {"shape": shape, "attrs": attrs, "data": data}
            continue
        if isinstance(dtype, tuple):
            continue  # string datasets aren't grid data
        # untrusted-bytes guard: a corrupt dataspace must raise BEFORE
        # the chunked readers allocate the output array, not OOM an
        # executor (deflate's worst case is ~1032:1 expansion)
        n_guard = int(np.prod(shape)) if shape else 1
        if n_guard * dtype.itemsize > 2000 * len(buf) + (1 << 20):
            raise ValueError(
                f"dataset {name!r}: implausible shape {shape} for a "
                f"{len(buf)}-byte file — corrupt or unsupported input"
            )
        ver = layout[0]
        if ver not in (3, 4):
            raise NotImplementedError(f"data layout version {ver}")
        lclass = layout[1]
        if ver == 4 and lclass == 2:
            # v4 chunked: flags, dimensionality, encoded-length, dims,
            # chunk index type + index fields, then the index address
            flags4 = layout[2]
            nd = layout[3]
            enc = layout[4]
            p4 = 5
            dims4 = [
                int.from_bytes(layout[p4 + i * enc:p4 + (i + 1) * enc],
                               "little")
                for i in range(nd)
            ]
            p4 += nd * enc
            idx_type = layout[p4]
            p4 += 1
            # parse FORWARD: v1 object headers pad message bodies to
            # 8-byte multiples, so the address is NOT the body's last
            # 8 bytes — the index-field length is fixed per type
            # (1: size+mask only when filtered; 2: none; 3: page
            # bits; 4: five 1-byte EA creation params per the spec
            # and libhdf5's H5D_EARRAY_CREATE_PARAM_SIZE; 5: v2-btree
            # node size u4 + split/merge percents)
            flen = {1: 12 if flags4 & 0x02 else 0, 2: 0, 3: 1,
                    4: 5, 5: 6}.get(idx_type, 0)
            idx_field = layout[p4:p4 + flen]
            addr4 = struct.unpack_from("<Q", layout, p4 + flen)[0]
            if addr4 == _UNDEF:  # never-written chunked variable
                out[name] = {"shape": shape, "attrs": attrs, "data": None}
                continue
            # stored dims carry the element-size dimension when the
            # count exceeds the dataset rank (the v1-B-tree convention)
            cdims4 = dims4[:-1] if len(dims4) == len(shape) + 1 else dims4
            data = _read_chunked_v4(
                r, flags4, tuple(cdims4), idx_type, idx_field, addr4,
                shape, dtype, filters, maxdims=maxdims,
            )
            out[name] = {"shape": shape, "attrs": attrs, "data": data}
            continue
        if lclass == 1:  # contiguous
            addr = struct.unpack_from("<Q", layout, 2)[0]
            size = struct.unpack_from("<Q", layout, 10)[0]
            if addr == _UNDEF:
                # late allocation: a never-written variable (netcdf-c
                # emits these for dataless/fill-suppressed vars, e.g.
                # grid-mapping containers) — keep its attrs, carry no
                # data, and never fail the rest of the file
                out[name] = {"shape": shape, "attrs": attrs, "data": None}
                continue
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
            if baddr == _UNDEF:  # never-written chunked variable
                out[name] = {"shape": shape, "attrs": attrs, "data": None}
                continue
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
        if len(v["shape"]) == 1 and v["data"] is not None
        and v["data"].dtype.names is None  # compound ≠ coordinate
        # corrupt bytes can retype CLASS to a non-string — only a
        # real string marks a dimension scale
        and isinstance(v["attrs"].get("CLASS"), str)
        and v["attrs"]["CLASS"].startswith("DIMENSION_SCALE")
    }
    if not dim_scales:  # fall back: any 1-D dataset can be a coord
        dim_scales = {
            n: v for n, v in ds.items()
            if len(v["shape"]) == 1 and v["data"] is not None
            and v["data"].dtype.names is None  # compound ≠ coordinate
        }
    if variable is None:
        # rank >= 2 with all leading dims size 1: the (time=1, y, x)
        # shape most real CF products ship squeezes to the 2-D grid
        cands = [
            n for n, v in ds.items()
            if len(v["shape"]) >= 2 and n not in dim_scales
            and all(s == 1 for s in v["shape"][:-2])
            and v["data"] is not None
            # compound side tables (scale LUTs etc.) parse fine but
            # are never the grid variable
            and v["data"].dtype.names is None
        ]
        if not cands:
            raise ValueError(
                "no 2-D data variable found (rank>=2 is accepted only "
                "when every leading dim is size 1 — slice a real "
                "time/level axis before ingest)"
            )
        variable = sorted(cands)[0]
    v = ds[variable]
    h, w = v["shape"][-2:]
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
    if gm is not None and not isinstance(gm, str):
        # an ABSENT grid_mapping legitimately means geographic; a
        # PRESENT one retyped to numbers is corruption — reject loudly
        # rather than silently ingesting with wrong geolocation
        raise ValueError(
            f"grid_mapping attribute is not a string ({gm!r}) — "
            "corrupt input"
        )
    crs = "longlat"
    if gm and gm in ds:
        from pyresample_spark.sources.cf_gm import resolve_cf_crs

        # proj4 → crs_wkt → CF grid_mapping_name translation
        # (sources/cf_gm.py), legacy proj-string names pass through
        crs = resolve_cf_crs(ds[gm]["attrs"])
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

# libhdf5 sizes chunk B-tree nodes from the istore K (default 32, max
# 2K = 64 entries per node); emitting more in one node makes the file
# unreadable to real consumers (ADVICE r8) — the writer splits instead.
_BT_MAX_ENTRIES = 64
_FA_PAGE_BITS = 10  # libhdf5's default fixed-array page size (1024)

# Extensible Array creation parameters (libhdf5's H5D earray
# defaults): the writer covers inline index-block elements plus the
# directly-addressed data blocks of the first 2·log2(sup_blk_min)
# super blocks — 4 + 240 chunk capacity — which is every fixture and
# export this engine emits; beyond that raises loudly (EASB
# indirection stays read-only).
_EA_MAX_BITS = 32
_EA_IB_ELMTS = 4
_EA_DB_MIN = 16
_EA_SB_MIN_PTRS = 4
_EA_PAGE_BITS = 10

# libhdf5 reads every v1 B-tree node at the FIXED size derived from
# the tree's K — 24-byte header + (2K+1) keys + 2K child pointers —
# regardless of how many entries are used, so a node emitted at
# used-entries size near EOF makes libhdf5's read overflow the EOA
# (ADVICE r9). The writer pads every node to the fixed size: chunk
# trees use istore K=32 (the libhdf5 default the v0/v2 superblocks
# leave in force), group trees internal K=16 with 8-byte heap-offset
# keys → 24 + 33*8 + 32*8 = 544 bytes.
_GROUP_BT_NODE_SIZE = 24 + (2 * 16 + 1) * 8 + 2 * 16 * 8


def _chunk_bt_node_size(klen: int) -> int:
    return 24 + (2 * 32 + 1) * klen + 2 * 32 * 8


def _lookup3(data: bytes, initval: int = 0) -> int:
    """Bob Jenkins' lookup3 ``hashlittle`` (public domain) — the
    checksum HDF5 uses for v2/v3 superblocks and OHDR/OCHK blocks.
    Needed so the v2-superblock output is spec-valid for real
    consumers (the reader itself never verifies checksums)."""
    M = 0xFFFFFFFF

    def rot(x, k):
        return ((x << k) | (x >> (32 - k))) & M

    length = len(data)
    a = b = c = (0xDEADBEEF + length + initval) & M
    i, rem = 0, length
    while rem > 12:
        a = (a + int.from_bytes(data[i:i + 4], "little")) & M
        b = (b + int.from_bytes(data[i + 4:i + 8], "little")) & M
        c = (c + int.from_bytes(data[i + 8:i + 12], "little")) & M
        a = (a - c) & M; a ^= rot(c, 4); c = (c + b) & M      # noqa: E702
        b = (b - a) & M; b ^= rot(a, 6); a = (a + c) & M      # noqa: E702
        c = (c - b) & M; c ^= rot(b, 8); b = (b + a) & M      # noqa: E702
        a = (a - c) & M; a ^= rot(c, 16); c = (c + b) & M     # noqa: E702
        b = (b - a) & M; b ^= rot(a, 19); a = (a + c) & M     # noqa: E702
        c = (c - b) & M; c ^= rot(b, 4); b = (b + a) & M      # noqa: E702
        i += 12
        rem -= 12
    if rem == 0:  # only the empty input skips the final mix
        return c
    tail = data[i:] + b"\x00" * (12 - rem)
    a = (a + int.from_bytes(tail[0:4], "little")) & M
    b = (b + int.from_bytes(tail[4:8], "little")) & M
    c = (c + int.from_bytes(tail[8:12], "little")) & M
    c ^= b; c = (c - rot(b, 14)) & M                          # noqa: E702
    a ^= c; a = (a - rot(c, 11)) & M                          # noqa: E702
    b ^= a; b = (b - rot(a, 25)) & M                          # noqa: E702
    c ^= b; c = (c - rot(b, 16)) & M                          # noqa: E702
    a ^= c; a = (a - rot(c, 4)) & M                           # noqa: E702
    b ^= a; b = (b - rot(a, 14)) & M                          # noqa: E702
    c ^= b; c = (c - rot(b, 24)) & M                          # noqa: E702
    return c


def _shuffle_bytes(raw: bytes, itemsize: int) -> bytes:
    """Forward HDF5 shuffle filter: byte j of every element grouped
    together (the write-side twin of :func:`_unshuffle`)."""
    if itemsize <= 1:
        return raw
    n = len(raw) // itemsize
    body = n * itemsize
    out = (
        np.frombuffer(raw[:body], dtype="u1")
        .reshape(n, itemsize)
        .T.tobytes()
    )
    return out + raw[body:]


def _w_pad8(b: bytes) -> bytes:
    return b + b"\x00" * ((8 - len(b) % 8) % 8)


def _w_dtype(dt: np.dtype) -> bytes:
    dt = np.dtype(dt)
    if dt.subdtype is not None:  # subarray → ARRAY class 10 version 3
        base, shape = dt.subdtype
        out = bytes([0x3A, 0, 0, 0]) + struct.pack("<I", dt.itemsize)
        out += bytes([len(shape)])
        for d in shape:
            out += struct.pack("<I", d)
        return out + _w_dtype(base)
    if dt.names:  # structured → COMPOUND class 6 version 3 (the
        # member encoding libhdf5 ≥1.8 writes: unpadded names,
        # minimal-width offsets)
        nmem = len(dt.names)
        out = bytes([0x36, nmem & 0xFF, nmem >> 8, 0])
        out += struct.pack("<I", dt.itemsize)
        osz = (max(dt.itemsize, 1).bit_length() - 1) // 8 + 1
        for name in dt.names:
            fdt, off = dt.fields[name]
            out += name.encode() + b"\x00"
            out += off.to_bytes(osz, "little")
            out += _w_dtype(fdt)
        return out
    if dt.kind == "S":  # fixed string (compound member tags)
        return bytes([0x13, 0, 0, 0]) + struct.pack("<I", dt.itemsize)
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


def _w_space(shape, maxdims=None) -> bytes:
    """Dataspace message v1; ``maxdims`` entries of ``None`` mark
    UNLIMITED dimensions (stored as the undefined-address sentinel,
    which is how the reader recognizes the appendable axis)."""
    out = bytes([1, len(shape), 1 if maxdims is not None else 0,
                 0, 0, 0, 0, 0])
    for d in shape:
        out += struct.pack("<Q", d)
    if maxdims is not None:
        for d in maxdims:
            out += struct.pack("<Q", _UNDEF if d is None else d)
    return out


def _w_attr(name: str, value) -> bytes:
    """Attribute message v1: fixed-string for str values; float64
    scalar/1-D for numbers and number lists (the CF numeric
    grid-mapping attrs — standard_parallel, semi_major_axis... —
    that real netcdf-c files carry)."""
    nb = name.encode() + b"\x00"
    if isinstance(value, str):
        vb = value.encode()
        dt = bytes([0x13, 0, 0, 0]) + struct.pack("<I", max(len(vb), 1))
        ds = bytes([1, 0, 0, 0, 0, 0, 0, 0])
        data = vb or b"\x00"
    else:
        vals = (list(value) if isinstance(value, (list, tuple))
                else [value])
        data = struct.pack(f"<{len(vals)}d", *map(float, vals))
        dt = (bytes([0x11, 0, 0, 0]) + struct.pack("<I", 8)
              + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023))
        if len(vals) == 1:
            ds = bytes([1, 0, 0, 0, 0, 0, 0, 0])
        else:
            ds = (bytes([1, 1, 0, 0, 0, 0, 0, 0])
                  + struct.pack("<Q", len(vals)))
    body = struct.pack("<BBHHH", 1, 0, len(nb), len(dt), len(ds))
    return body + _w_pad8(nb) + _w_pad8(dt) + _w_pad8(ds) + data


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


def _w_link(name: str, addr: int) -> bytes:
    """Hard-link message body (type 0x0006): v1, no creation order /
    charset; the name-length field sizes itself (flags bits 0-1:
    1/2/4/8 bytes) so names past 255 bytes still serialize."""
    nb = name.encode()
    for bits, lsz in ((0, 1), (1, 2), (2, 4), (3, 8)):
        if len(nb) < 1 << (8 * lsz):
            return (bytes([1, bits])
                    + len(nb).to_bytes(lsz, "little") + nb
                    + struct.pack("<Q", addr))
    raise ValueError("link name too long")


def _w_ohdr_v2(msgs: list) -> bytes:
    """v2 object header: ``OHDR`` + version + flags (4-byte chunk-0
    size, no times/phase/creation-order) + messages + lookup3 checksum
    over the whole chunk."""
    block = b"".join(
        bytes([t]) + struct.pack("<H", len(b)) + b"\x00" + b
        for t, b in msgs
    )
    full = b"OHDR" + bytes([2, 0x02]) + struct.pack("<I", len(block)) + block
    return full + struct.pack("<I", _lookup3(full))


class H5ObjectRef:
    """Writer-side marker for an object-reference dataset: pass as the
    array slot of :func:`hdf5_grid_bytes` with the names of the
    variables to reference; each element is written as the 8-byte file
    address of the target's object header (datatype class 7 type 0)."""

    def __init__(self, targets):
        self.targets = list(targets)


class H5RegionRef:
    """Writer-side marker for a dataset-region-reference dataset:
    ``regions`` is a list of (target variable name, selection dict as
    :func:`_parse_serialized_selection` returns — type all/points/
    hyperslab). Each element is written as a 12-byte global-heap ID
    whose heap object carries the target's object-header address plus
    the v1 serialized selection (datatype class 7 type 1)."""

    def __init__(self, regions):
        self.regions = list(regions)


def _w_selection(sel: dict) -> bytes:
    """v1 serialized dataspace selection (writer twin of
    :func:`_parse_serialized_selection`). The length field counts the
    bytes after itself (rank + count + coordinates), matching
    libhdf5's v1 serialization accounting."""
    t = sel["type"]
    if t == "all":
        return struct.pack("<II", 3, 1) + b"\x00" * 8
    if t == "none":
        return struct.pack("<II", 0, 1) + b"\x00" * 8
    if t == "hyperslab":
        blocks = sel["blocks"]
        rank = len(blocks[0][0])
        body = struct.pack("<II", rank, len(blocks))
        for start, end in blocks:
            body += struct.pack(f"<{rank}I", *start)
            body += struct.pack(f"<{rank}I", *end)
        return struct.pack("<IIII", 2, 1, 0, len(body)) + body
    if t == "points":
        pts = sel["points"]
        rank = len(pts[0])
        body = struct.pack("<II", rank, len(pts))
        for pt in pts:
            body += struct.pack(f"<{rank}I", *pt)
        return struct.pack("<IIII", 1, 1, 0, len(body)) + body
    raise ValueError(f"unknown selection type {t!r}")


def _so_cds(so: dict, dtype, npoints: int) -> tuple:
    """Stored scaleoffset client data for one variable: scale type
    picked from the dtype (SO_INT for integers, SO_FLOAT_DSCALE for
    floats), decimal factor and optional fill from the writer dict —
    the way H5Pset_scaleoffset + set_local fill the 20 words."""
    from pyresample_spark.sources.scaleoffset import (
        SO_FLOAT_DSCALE,
        SO_INT,
        scaleoffset_cd_values,
    )

    dt = np.dtype(dtype)
    stype = SO_FLOAT_DSCALE if dt.kind == "f" else SO_INT
    return scaleoffset_cd_values(
        stype, int(so.get("factor", 0)), npoints, dt,
        fill=so.get("fill"),
    )


def _szip_cds(szip: dict, dtype, pps: int, npoints: int) -> tuple:
    """The 4 stored szip client-data values for one variable —
    ``H5Zszip.c`` ``set_local`` order ``[mask, ppb, bpp, pps]`` with
    the option mask built from ``szip={"ppb": n, "option":
    "nn"|"ec"}`` the way ``H5Pset_szip`` + ``set_local`` would."""
    from pyresample_spark.sources.szip import (
        SZ_ALLOW_K13_OPTION_MASK,
        SZ_EC_OPTION_MASK,
        SZ_NN_OPTION_MASK,
        szip_cd_values,
    )

    option = szip.get("option", "nn")
    if option not in ("nn", "ec"):
        raise ValueError(f"szip option must be 'nn' or 'ec', got {option!r}")
    mask = (SZ_NN_OPTION_MASK if option == "nn" else SZ_EC_OPTION_MASK)
    mask |= SZ_ALLOW_K13_OPTION_MASK
    ppb = int(szip.get("ppb", 8))
    # H5Zszip.c set_local scanline adjustment: widen a too-narrow
    # fastest dim across the flattened chunk, cap at 128 blocks
    if pps < ppb:
        if npoints < ppb:
            raise ValueError(
                f"szip pixels-per-block {ppb} exceeds the chunk's "
                f"total element count {npoints}"
            )
        pps = min(ppb * 128, npoints)
    else:
        pps = min(ppb * 128, pps)
    return szip_cd_values(mask, ppb, dtype, pps)


def _nbit_cds(nbit: dict, dtype, npoints: int) -> tuple:
    """Stored nbit client data for one variable, the way H5Pset_nbit
    + H5Z__set_local_nbit fill them for a precision-narrowed atomic
    type (``nbit={"precision": 12, "offset": 0}``)."""
    from pyresample_spark.sources.nbit import nbit_cd_values

    return nbit_cd_values(
        dtype, int(nbit["precision"]), int(nbit.get("offset", 0)),
        npoints,
    )


def hdf5_grid_bytes(variables: dict, chunks: dict | None = None,
                    deflate: bool = True, shuffle: bool = False,
                    fletcher32: bool = False,
                    szip: dict | None = None,
                    scaleoffset: dict | None = None,
                    nbit: dict | None = None,
                    lzf: bool = False,
                    lz4: bool = False,
                    zstd: bool = False,
                    bitshuffle: dict | None = None,
                    superblock: int = 0,
                    dense_links: bool = False,
                    chunk_index: str = "btree1") -> bytes:
    """Write {name: (array | None, {str attr: str})} as a flat root
    group (None array → dataless i4 container for grid-mapping vars).
    ``chunks``: {name: (cr, cc)} switches a 2-D variable to the
    chunked layout (deflate-compressed when ``deflate``, byte-shuffled
    first when ``shuffle`` — ``shuffle+deflate`` is netcdf-c's
    canonical compression recipe; ``fletcher32`` prepends the
    checksum filter at netcdf-c's pipeline position 0). Chunk indexes split into ≤64-entry
    B-tree nodes under internal nodes, matching libhdf5's istore-K
    node capacity, so many-chunk exports stay readable by real
    consumers (ADVICE r8). ``superblock=2`` writes the HDF5 ≥1.10
    ``libver=latest`` container instead: v2 superblock + v2 ``OHDR``
    root group with hard-link messages (lookup3-checksummed), with the
    datasets themselves kept as v1 headers (spec-legal mix).
    ``chunk_index="fixed_array"`` (requires ``superblock=2``) writes
    chunked variables with the VERSION-4 data layout + Fixed Array
    index (``FAHD``/``FADB``, paged past 2^10 chunks, per-entry
    size+mask when filtered) — the index libhdf5 ≥1.10 itself picks
    for fixed-dimension chunked datasets under libver=latest.
    ``chunk_index="extensible_array"`` instead marks the chunked
    variable's dim 0 UNLIMITED in the dataspace and writes the
    Extensible Array index (``EAHD``/``EAIB``/``EADB``, lookup3-
    checksummed, libhdf5's default creation parameters) — the
    appendable-time-axis layout libhdf5 picks for one unlimited
    dimension; inline index-block elements plus directly-addressed
    data blocks cover 244 chunks, beyond which the writer raises
    (EASB indirection stays read-only)."""
    if szip and deflate:
        raise ValueError("szip and deflate are alternative compressors "
                         "— pass deflate=False with szip")
    if lzf and (deflate or szip):
        raise ValueError("lzf is an alternative compressor — pass "
                         "deflate=False (and no szip) with lzf=True")
    if lz4 and (deflate or szip or lzf):
        raise ValueError("lz4 is an alternative compressor — pass "
                         "deflate=False (and no szip/lzf) with "
                         "lz4=True")
    if zstd and (deflate or szip or lzf or lz4):
        raise ValueError("zstd is an alternative compressor — pass "
                         "deflate=False (and no szip/lzf/lz4) with "
                         "zstd=True")
    if bitshuffle is not None and (deflate or szip or lzf or lz4
                                   or zstd):
        raise ValueError("bitshuffle composes its own LZ4 stage — "
                         "pass deflate=False and no other compressor")
    if scaleoffset is not None and not isinstance(scaleoffset, dict):
        raise ValueError("scaleoffset must be a dict like "
                         "{'factor': 2, 'fill': -999.0}")
    if nbit is not None and not isinstance(nbit, dict):
        raise ValueError("nbit must be a dict like "
                         "{'precision': 12, 'offset': 0}")
    if nbit and scaleoffset:
        raise ValueError("nbit and scaleoffset are alternative packing "
                         "filters — pass one")
    if superblock not in (0, 2):
        raise ValueError(f"superblock must be 0 or 2, got {superblock}")
    if dense_links and superblock != 2:
        raise ValueError("dense_links requires superblock=2 (new-style "
                         "groups)")
    if chunk_index not in ("btree1", "fixed_array", "extensible_array"):
        raise ValueError(f"unknown chunk_index {chunk_index!r}")
    if chunk_index != "btree1" and superblock != 2:
        raise ValueError(f"chunk_index={chunk_index!r} requires "
                         "superblock=2 (an HDF5 >=1.10 structure)")
    chunks = chunks or {}
    names = sorted(variables)

    layout: list = []  # (key, bytes) in file order
    pos = {"cursor": 48 if superblock == 2 else 96}

    def place(key, blob):
        layout.append((key, blob))
        a = pos["cursor"]
        pos[key] = a
        pos["cursor"] += len(blob)
        return a

    heap = b""
    if superblock == 0:
        heap = b"\x00" * 8
        heap_off = {}
        for n in names:
            heap_off[n] = len(heap)
            heap += n.encode() + b"\x00"
        heap = _w_pad8(heap)
        place("root", _w_header([_w_msg(0x0011, struct.pack("<QQ", 0, 0))]))
        place("heap_hdr", b"\x00" * 32)
        place("heap", heap)
        place("btree", b"\x00" * _GROUP_BT_NODE_SIZE)
        snod = b"SNOD" + bytes([1, 0]) + struct.pack("<H", len(names))
        for n in names:
            snod += struct.pack("<QQII", heap_off[n], 0, 0, 0) + b"\x00" * 16
        place("snod", snod)

    if (deflate or shuffle or fletcher32 or szip or scaleoffset
            or nbit or lzf or lz4 or zstd or bitshuffle is not None):
        fspecs = []
        if scaleoffset:
            # h5py/libhdf5 apply scale-offset FIRST (position 0) so
            # the packed stream rides checksum/shuffle/deflate
            fspecs.append((6, 0, None))
        if nbit:
            # same position-0 packing slot as scale-offset
            fspecs.append((5, 0, None))
        if fletcher32:
            # netcdf-c pipeline position 0: the checksum is appended
            # to the RAW chunk, then rides shuffle/deflate like data
            fspecs.append((3, 0, []))
        if shuffle:  # pipeline order: shuffle THEN deflate
            fspecs.append((2, 0, [0]))  # cd value patched per-var below
        if deflate:
            fspecs.append((1, 1, [6]))
        if lzf:
            # h5py's lzf_filter.c registers OPTIONAL (flag 1) with
            # cd = (filter version 4, LZF_VERSION 0x0105, chunk
            # bytes); the bufsize is patched per-variable below
            fspecs.append((32000, 1, [4, 0x0105, 0]))
        if lz4:
            # the Dectris plugin registers one optional cd value:
            # the framing block size (0 = the plugin default)
            fspecs.append((32004, 1, [1 << 20]))
        if zstd:
            # hdf5plugin's Zstd filter stores one optional cd value:
            # the compression level (payload is a plain zstd frame)
            fspecs.append((32015, 1, [3]))
        if bitshuffle is not None:
            # bshuf_h5filter cd layout: (major, minor, elem_size,
            # block_elems, compression); elem_size/block patched
            # per-variable below
            fspecs.append((32008, 1, [0, 3, 0, 0, 0]))
        if szip:
            # H5Pset_szip registers the filter OPTIONAL (flag 1 —
            # encoder may be license-absent); cds per-var below
            fspecs.append((4, 1, None))
        # serialized per-variable because shuffle's client value is
        # the element size and szip's are datatype- and chunk-derived
        def _w_filters(dtype, pps, npoints):
            out = struct.pack("<BB", 1, len(fspecs)) + b"\x00" * 6
            for fid, fflags, cds in fspecs:
                if fid == 4:
                    cds = list(_szip_cds(szip, dtype, pps, npoints))
                elif fid == 5:
                    cds = list(_nbit_cds(nbit, dtype, npoints))
                elif fid == 6:
                    cds = list(_so_cds(scaleoffset, dtype, npoints))
                elif fid == 32000:
                    cds = [cds[0], cds[1], npoints * dtype.itemsize]
                elif fid == 32008:
                    blk = int(bitshuffle.get("block", 64))
                    comp = (2 if bitshuffle.get("lz4", True) else 0)
                    cds = [0, 3, dtype.itemsize, blk, comp]
                else:
                    cds = [dtype.itemsize if fid == 2 else c
                           for c in cds]
                out += struct.pack("<HHHH", fid, 0, fflags, len(cds))
                out += b"".join(struct.pack("<I", c) for c in cds)
                if len(cds) % 2:
                    out += b"\x00" * 4
            return out
    chunk_blobs: dict = {}
    for n in names:
        arr, attrs = variables[n]
        msgs = [_w_msg(0x000C, _w_attr(k, v))
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
        if isinstance(arr, (H5ObjectRef, H5RegionRef)):
            is_obj = isinstance(arr, H5ObjectRef)
            nref = len(arr.targets if is_obj else arr.regions)
            esize = 8 if is_obj else 12
            msgs += [
                _w_msg(0x0001, _w_space((nref,))),
                # class 7 v1, reference type in bit-field bits 0-3
                _w_msg(0x0003, bytes([0x17, 0 if is_obj else 1, 0, 0])
                       + struct.pack("<I", esize)),
                _w_msg(0x0008, struct.pack("<BBQQ", 3, 1, 0,
                                           nref * esize)),
            ]
            place(("oh", n), _w_header(msgs))
            continue
        arr = np.ascontiguousarray(arr).astype(
            np.dtype(arr.dtype).newbyteorder("<")
        )
        # an extensible-array-indexed variable is the appendable one:
        # its dim 0 is UNLIMITED in the dataspace (that is what makes
        # libhdf5 pick the EA index in the first place)
        unlimited = chunk_index == "extensible_array" and n in chunks
        msgs += [
            _w_msg(0x0001, _w_space(
                arr.shape,
                maxdims=(None, arr.shape[1]) if unlimited else None)),
            _w_msg(0x0003, _w_dtype(arr.dtype)),
        ]
        if n in chunks:
            cr, cc = chunks[n]
            if (deflate or shuffle or fletcher32 or szip
                    or scaleoffset or nbit or lzf or lz4 or zstd
                    or bitshuffle is not None):
                msgs.append(
                    _w_msg(0x000B, _w_filters(arr.dtype, cc, cr * cc))
                )
            sz_cds = _szip_cds(szip, arr.dtype, cc, cr * cc) if szip else None
            so_cds = (_so_cds(scaleoffset, arr.dtype, cr * cc)
                      if scaleoffset else None)
            nb_cds = (_nbit_cds(nbit, arr.dtype, cr * cc)
                      if nbit else None)
            blobs = []
            for r0 in range(0, arr.shape[0], cr):
                for c0 in range(0, arr.shape[1], cc):
                    blk = np.zeros((cr, cc), dtype=arr.dtype)
                    rs = min(cr, arr.shape[0] - r0)
                    cs = min(cc, arr.shape[1] - c0)
                    blk[:rs, :cs] = arr[r0:r0 + rs, c0:c0 + cs]
                    raw = blk.tobytes()
                    if scaleoffset:
                        from pyresample_spark.sources.scaleoffset import (
                            h5_scaleoffset_encode,
                        )

                        raw = h5_scaleoffset_encode(raw, so_cds)
                    if nbit:
                        from pyresample_spark.sources.nbit import (
                            h5_nbit_encode,
                        )

                        raw = h5_nbit_encode(raw, nb_cds)
                    if fletcher32:
                        raw += struct.pack("<I", _fletcher32(raw))
                    if shuffle:
                        raw = _shuffle_bytes(raw, arr.dtype.itemsize)
                    if deflate:
                        raw = zlib.compress(raw, 6)
                    elif lzf:
                        from pyresample_spark.sources.lzf import (
                            lzf_compress,
                        )

                        raw = lzf_compress(raw)
                    elif lz4:
                        from pyresample_spark.sources.lz4 import (
                            h5_lz4_encode,
                        )

                        raw = h5_lz4_encode(raw)
                    elif zstd:
                        from pyresample_spark.sources.zstd import (
                            zstd_compress_store,
                        )

                        raw = zstd_compress_store(raw)
                    elif bitshuffle is not None:
                        from pyresample_spark.sources.bitshuffle import (
                            bitshuffle_encode,
                        )

                        raw = bitshuffle_encode(
                            raw, arr.dtype.itemsize,
                            int(bitshuffle.get("block", 64)),
                            2 if bitshuffle.get("lz4", True) else 0)
                    elif szip:
                        from pyresample_spark.sources.szip import (
                            h5_szip_encode,
                        )

                        raw = h5_szip_encode(raw, sz_cds)
                    blobs.append(((r0, c0), raw))
            chunk_blobs[n] = blobs
            if chunk_index == "fixed_array":
                # v4 layout, class 2, Fixed Array (type 3): flags 0,
                # rank WITHOUT the element-size dim, 4-byte dims,
                # page-bits index field, FAHD address (patched)
                lay = bytes([4, 2, 0, 2, 4])
                lay += struct.pack("<II", cr, cc)
                lay += bytes([3, _FA_PAGE_BITS]) + struct.pack("<Q", 0)
            elif chunk_index == "extensible_array":
                # v4 layout, Extensible Array (type 4): five 1-byte
                # creation params (max bits, index elements, min
                # pointers, min elements, page bits — spec order),
                # EAHD address patched at assembly
                lay = bytes([4, 2, 0, 2, 4])
                lay += struct.pack("<II", cr, cc)
                lay += bytes([4]) + struct.pack(
                    "<BBBBB", _EA_MAX_BITS, _EA_IB_ELMTS,
                    _EA_SB_MIN_PTRS, _EA_DB_MIN, _EA_PAGE_BITS)
                lay += struct.pack("<Q", 0)
            else:
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
        if isinstance(arr, H5ObjectRef):
            # every object header is placed by now, so target
            # addresses are known
            place(("data", n), b"".join(
                struct.pack("<Q", pos[("oh", t)]) for t in arr.targets))
            continue
        if isinstance(arr, H5RegionRef):
            objs = [struct.pack("<Q", pos[("oh", t)]) + _w_selection(sel)
                    for t, sel in arr.regions]
            used = 16 + sum(16 + (len(o) + 7) // 8 * 8 for o in objs)
            gcol = (b"GCOL" + bytes([1, 0, 0, 0])
                    + struct.pack("<Q", used + 16))
            for i, o in enumerate(objs):
                gcol += struct.pack("<HHIQ", i + 1, 1, 0, len(o))
                gcol += o + b"\x00" * ((-len(o)) % 8)
            # free-space terminator: index 0, size = its own 16 bytes
            gcol += struct.pack("<HHIQ", 0, 0, 0, 16)
            gaddr = place(("gcol", n), gcol)
            place(("data", n), b"".join(
                struct.pack("<QI", gaddr, i + 1)
                for i in range(len(objs))))
            continue
        if n in chunk_blobs:
            for i, (_, raw) in enumerate(chunk_blobs[n]):
                place(("chunk", n, i), raw)
            blobs = chunk_blobs[n]
            if chunk_index == "fixed_array":
                filtered = bool(deflate or shuffle or fletcher32
                                or szip or scaleoffset or nbit
                                or lzf or lz4
                                or bitshuffle is not None)
                cr, cc = chunks[n]
                nominal = cr * cc * variables[n][0].dtype.itemsize
                # libhdf5's chunk-size field width (H5Dfarray.c):
                # one spare byte in case a filter GROWS the chunk
                size_len = min(8, 1 + (nominal.bit_length() + 7) // 8)
                entry_size = 8 + size_len + 4 if filtered else 8
                nchunks = len(blobs)
                parts = []
                for i, (_, raw) in enumerate(blobs):
                    parts.append(struct.pack("<Q", pos[("chunk", n, i)]))
                    if filtered:
                        parts.append(len(raw).to_bytes(size_len, "little"))
                        parts.append(struct.pack("<I", 0))
                ents = b"".join(parts)
                fahd_addr = pos["cursor"]
                fadb_addr = fahd_addr + 28
                fahd = b"FAHD" + bytes([0, 1 if filtered else 0,
                                        entry_size, _FA_PAGE_BITS])
                fahd += struct.pack("<QQ", nchunks, fadb_addr)
                fahd += struct.pack("<I", _lookup3(fahd))
                fadb = b"FADB" + bytes([0, 1 if filtered else 0])
                fadb += struct.pack("<Q", fahd_addr)
                page = 1 << _FA_PAGE_BITS
                # every metadata checksum below is Jenkins lookup3 over
                # the bytes preceding it — libhdf5's H5FAcache verifies
                # all three kinds on read (code-review r10)
                if nchunks > page:  # paged: all-init bitmap + pages
                    npages = (nchunks + page - 1) // page
                    fadb += b"\xff" * ((npages + 7) // 8)
                    fadb += struct.pack("<I", _lookup3(fadb))
                    pages = [fadb]
                    for p0 in range(0, nchunks, page):
                        take = min(page, nchunks - p0)
                        pg = ents[p0 * entry_size:(p0 + take) * entry_size]
                        pages.append(pg + struct.pack("<I", _lookup3(pg)))
                    fadb = b"".join(pages)
                else:
                    fadb += ents
                    fadb += struct.pack("<I", _lookup3(fadb))
                got = place(("fahd", n), fahd)
                assert got == fahd_addr
                place(("fadb", n), fadb)
                continue
            if chunk_index == "extensible_array":
                filtered = bool(deflate or shuffle or fletcher32
                                or szip or scaleoffset or nbit
                                or lzf or lz4
                                or bitshuffle is not None)
                cr, cc = chunks[n]
                nominal = cr * cc * variables[n][0].dtype.itemsize
                size_len = min(8, 1 + (nominal.bit_length() + 7) // 8)
                esize = 8 + size_len + 4 if filtered else 8
                client = 1 if filtered else 0
                ents = []
                for i, (_, raw) in enumerate(blobs):
                    e = struct.pack("<Q", pos[("chunk", n, i)])
                    if filtered:
                        e += len(raw).to_bytes(size_len, "little")
                        e += struct.pack("<I", 0)
                    ents.append(e)
                undef = b"\xff" * esize
                info, n_in_ib, ndblk_addrs = _ea_geometry(
                    _EA_MAX_BITS, _EA_DB_MIN, _EA_SB_MIN_PTRS)
                nsblks = len(info)
                direct_cap = sum(
                    info[u][0] * info[u][1]
                    for u in range(min(n_in_ib, nsblks)))
                arr_off = (_EA_MAX_BITS + 7) // 8
                rem = max(0, len(ents) - _EA_IB_ELMTS)
                if rem > direct_cap:
                    raise ValueError(
                        f"{len(ents)} chunks exceed the extensible-"
                        f"array writer's {_EA_IB_ELMTS + direct_cap}-"
                        "chunk direct capacity (EASB indirection is "
                        "read-only)"
                    )
                # plan addresses first: EAIB, then data blocks, then
                # the header — every structure embeds the header
                # address, so sizes must be known up front
                dblks = []  # (dblk number, start element, ne, take)
                for u in range(min(n_in_ib, nsblks)):
                    nd_, ne_, s_idx, s_dblk = info[u]
                    for d in range(nd_):
                        lo = s_idx + d * ne_
                        if lo >= rem:
                            break
                        dblks.append((s_dblk + d, lo, ne_,
                                      min(ne_, rem - lo)))
                ib_size = (14 + _EA_IB_ELMTS * esize + 8 * ndblk_addrs
                           + 8 * max(0, nsblks - n_in_ib) + 4)
                eaib_addr = pos["cursor"]
                a = eaib_addr + ib_size
                dblk_addr = {}
                for dnum, lo, ne_, take in dblks:
                    dblk_addr[dnum] = a
                    a += 14 + arr_off + ne_ * esize + 4
                eahd_addr = a
                eaib = b"EAIB" + bytes([0, client])
                eaib += struct.pack("<Q", eahd_addr)
                for i in range(_EA_IB_ELMTS):
                    eaib += ents[i] if i < len(ents) else undef
                for d in range(ndblk_addrs):
                    eaib += struct.pack("<Q",
                                        dblk_addr.get(d, _UNDEF))
                eaib += struct.pack("<Q", _UNDEF) * max(
                    0, nsblks - n_in_ib)
                eaib += struct.pack("<I", _lookup3(eaib))
                got = place(("eaib", n), eaib)
                assert got == eaib_addr
                for dnum, lo, ne_, take in dblks:
                    db = b"EADB" + bytes([0, client])
                    db += struct.pack("<Q", eahd_addr)
                    db += (_EA_IB_ELMTS + lo).to_bytes(
                        arr_off, "little")  # block offset
                    for k in range(ne_):
                        j = _EA_IB_ELMTS + lo + k
                        db += (ents[j] if k < take else undef)
                    db += struct.pack("<I", _lookup3(db))
                    got = place(("eadb", n, dnum), db)
                    assert got == dblk_addr[dnum]
                eahd = b"EAHD" + bytes([
                    0, client, esize, _EA_MAX_BITS, _EA_IB_ELMTS,
                    _EA_DB_MIN, _EA_SB_MIN_PTRS, _EA_PAGE_BITS])
                eahd += struct.pack("<QQQQ", 0, 0, 0, 0)  # stats
                eahd += struct.pack("<QQQ", len(ents), len(ents),
                                    eaib_addr)
                eahd += struct.pack("<I", _lookup3(eahd))
                got = place(("eahd", n), eahd)
                assert got == eahd_addr
                continue
            h, w = variables[n][0].shape
            sentinel = struct.pack("<IIQQQ", 0, 0, h, w, 0)
            entries = [
                (struct.pack("<IIQQQ", len(raw), 0, r0, c0, 0),
                 pos[("chunk", n, i)])
                for i, ((r0, c0), raw) in enumerate(blobs)
            ]
            klen = len(sentinel)
            level = 0
            while True:
                groups = [
                    entries[i:i + _BT_MAX_ENTRIES]
                    for i in range(0, len(entries), _BT_MAX_ENTRIES)
                ]
                # node addresses are deterministic before placing (the
                # cursor only moves by what we append), so sibling
                # pointers can be written correctly in one pass; every
                # node is padded to libhdf5's fixed node size so a real
                # consumer's fixed-size read never crosses EOF
                node_size = _chunk_bt_node_size(klen)
                addrs, a = [], pos["cursor"]
                for _ in groups:
                    addrs.append(a)
                    a += node_size
                nxt_entries = []
                for gi, g in enumerate(groups):
                    left = addrs[gi - 1] if gi > 0 else _UNDEF
                    right = addrs[gi + 1] if gi + 1 < len(groups) else _UNDEF
                    nxt_key = (
                        groups[gi + 1][0][0]
                        if gi + 1 < len(groups) else sentinel
                    )
                    bt = b"TREE" + bytes([1, level])
                    bt += struct.pack("<H", len(g))
                    bt += struct.pack("<QQ", left, right)
                    for key, child in g:
                        bt += key + struct.pack("<Q", child)
                    bt += nxt_key
                    bt += b"\x00" * (node_size - len(bt))
                    got = place(("btnode", n, level, gi), bt)
                    assert got == addrs[gi]
                    nxt_entries.append((g[0][0], addrs[gi]))
                if len(groups) == 1:
                    pos[("btree", n)] = addrs[0]
                    break
                entries = nxt_entries
                level += 1
        else:
            arr2 = np.ascontiguousarray(arr).astype(
                np.dtype(arr.dtype).newbyteorder("<")
            )
            place(("data", n), arr2.tobytes())

    if superblock == 2 and dense_links:
        # dense (new-style) link storage: serialized link messages in
        # a fractal heap, indexed by a name v2 B-tree — what libhdf5
        # emits for libver=latest groups past the compact threshold.
        # Parameters mirror libhdf5's group-heap defaults in shape
        # (doubling table width 4); start block 512 so multi-block
        # heaps (root FHIB + several FHDB children) are exercised at
        # fixture sizes, not just at thousands of links.
        W, S, MAXD, HBITS = 4, 512, 65536, 32
        off_size = HBITS // 8                      # 4
        len_size = (MAXD.bit_length() + 7) // 8    # 3
        dblk_hdr = 4 + 1 + 8 + off_size            # flags=0: no cksum
        link_bodies = [_w_link(n, pos[("oh", n)]) for n in names]

        def blk_size(i):
            row = i // W
            return S if row < 2 else S << (row - 1)

        # greedy pack: heap offsets INCLUDE block headers (spec);
        # an object never spans blocks. A body that overflows the
        # CURRENT block advances to the next (doubling-table blocks
        # grow, so a later row may hold what this one can't — the
        # skipped block stays as a positional empty block); only a
        # body too big for the LARGEST direct block is an error
        max_direct_rows = (MAXD // S).bit_length() + 1
        max_blk = S if max_direct_rows <= 2 else S << (max_direct_rows - 2)
        blocks: list[list] = [[]]   # per block: [(heap_off, body)]
        blk_starts = [0]
        used = dblk_hdr
        ids = []
        for body in link_bodies:
            if len(body) > max_blk - dblk_hdr:
                raise ValueError("link message larger than any heap block")
            while used + len(body) > blk_size(len(blocks) - 1):
                blk_starts.append(
                    blk_starts[-1] + blk_size(len(blocks) - 1)
                )
                blocks.append([])
                used = dblk_hdr
            heap_off = blk_starts[-1] + used
            blocks[-1].append((heap_off, body))
            ids.append(
                bytes([0]) + heap_off.to_bytes(off_size, "little")
                + len(body).to_bytes(len_size, "little")
            )
            used += len(body)
        nblocks = len(blocks)
        rows_needed = 0
        covered = 0
        while covered < nblocks:
            covered += W
            rows_needed += 1
        if rows_needed > max_direct_rows:
            raise ValueError("dense link heap beyond direct-row capacity")
        for i, blk in enumerate(blocks):
            body = bytearray(blk_size(i))
            body[0:4] = b"FHDB"
            body[4] = 0
            # heap header address patched at assembly (FRHP is placed
            # after the blocks); flags=0 → no block checksum to redo
            body[13:13 + off_size] = blk_starts[i].to_bytes(
                off_size, "little"
            )
            for heap_off, b2 in blk:
                p = heap_off - blk_starts[i]
                body[p:p + len(b2)] = b2
            place(("fhdb", i), bytes(body))
        if nblocks > 1:
            fhib = bytearray(
                4 + 1 + 8 + off_size + rows_needed * W * 8 + 4
            )
            fhib[0:4] = b"FHIB"
            fhib[4] = 0
            ent = 4 + 1 + 8 + off_size
            for i in range(rows_needed * W):
                a = pos[("fhdb", i)] if i < nblocks else _UNDEF
                fhib[ent + 8 * i:ent + 8 * i + 8] = struct.pack("<Q", a)
            place("fhib", bytes(fhib))  # hdr addr + checksum patched
        managed = blk_starts[-1] + blk_size(nblocks - 1)
        frhp = b"FRHP" + bytes([0])
        frhp += struct.pack("<HHB", 1 + off_size + len_size, 0, 0)
        frhp += struct.pack("<I", 4096)          # max managed obj size
        frhp += struct.pack("<QQ", 0, _UNDEF)    # huge: next id, btree
        free = (managed - nblocks * dblk_hdr
                - sum(len(b) for b in link_bodies))
        frhp += struct.pack("<QQ", free, _UNDEF)  # free, fs mgr
        frhp += struct.pack("<QQQQ", managed, managed, managed,
                            len(link_bodies))
        frhp += struct.pack("<QQQQ", 0, 0, 0, 0)  # huge/tiny sz+counts
        frhp += struct.pack("<HQQH", W, S, MAXD, HBITS)
        root_blk = pos["fhib"] if nblocks > 1 else pos[("fhdb", 0)]
        frhp += struct.pack("<HQH", 1, root_blk,
                            rows_needed if nblocks > 1 else 0)
        frhp += struct.pack("<I", _lookup3(frhp))
        place("frhp", frhp)
        # name-index v2 B-tree: one BTLF leaf (records sorted by the
        # lookup3 name hash), padded to the declared node size so a
        # real consumer's fixed-size node read never crosses EOF
        node_size, rec_size = 2048, 4 + len(ids[0])
        if len(ids) * rec_size > node_size - 10:
            raise ValueError("too many links for a depth-0 name index")
        recs = sorted(
            (_lookup3(n.encode()), i) for n, i in zip(names, ids)
        )
        btlf = b"BTLF" + bytes([0, 5])
        for hsh, hid in recs:
            btlf += struct.pack("<I", hsh) + hid
        btlf += struct.pack("<I", _lookup3(btlf))
        btlf += b"\x00" * (node_size - len(btlf))
        place("btlf", btlf)
        bthd = b"BTHD" + bytes([0, 5])
        bthd += struct.pack("<IHH", node_size, rec_size, 0)
        bthd += bytes([100, 40])  # split/merge %, per libhdf5 defaults
        bthd += struct.pack("<QHQ", pos["btlf"], len(ids), len(ids))
        bthd += struct.pack("<I", _lookup3(bthd))
        place("bthd", bthd)
        li = bytes([0, 0]) + struct.pack("<QQ", pos["frhp"], pos["bthd"])
        place("root_v2", _w_ohdr_v2([(0x02, li)]))
    elif superblock == 2:
        # root group LAST: every dataset OH address is final, so the
        # link messages and the OHDR checksum need no patching
        place("root_v2", _w_ohdr_v2(
            [(0x06, _w_link(n, pos[("oh", n)])) for n in names]
        ))

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
            node = (b"TREE" + bytes([0, 0]) + struct.pack("<H", 1)
                    + struct.pack("<QQ", _UNDEF, _UNDEF)
                    + struct.pack("<QQQ", 0, pos["snod"], len(heap) - 1))
            return node + b"\x00" * (_GROUP_BT_NODE_SIZE - len(node))
        if key == "snod":
            b = bytearray(blob)
            for i, n in enumerate(names):
                struct.pack_into("<Q", b, 8 + 40 * i + 8, pos[("oh", n)])
            return bytes(b)
        if isinstance(key, tuple) and key[0] == "fhdb":
            # heap-header address lands after FRHP's placement; block
            # flags are 0 (no per-block checksum), so the patch is
            # checksum-free
            b = bytearray(blob)
            struct.pack_into("<Q", b, 5, pos["frhp"])
            return bytes(b)
        if key == "fhib":
            b = bytearray(blob)
            struct.pack_into("<Q", b, 5, pos["frhp"])
            struct.pack_into("<I", b, len(b) - 4, _lookup3(bytes(b[:-4])))
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
                    if b[off + 8] == 4:  # v4: index addr after idx field
                        nd, enc = b[off + 11], b[off + 12]
                        p_idx = off + 8 + 5 + nd * enc
                        idx_t = b[p_idx]
                        flen = {3: 1, 4: 5}[idx_t]  # FA page-bits / EA params
                        struct.pack_into(
                            "<Q", b, p_idx + 1 + flen,
                            pos[("fahd", n) if idx_t == 3
                                else ("eahd", n)],
                        )
                    elif b[off + 9] == 1:
                        struct.pack_into("<Q", b, off + 10, pos[("data", n)])
                    else:
                        struct.pack_into("<Q", b, off + 11, pos[("btree", n)])
                off += 8 + msize
            return bytes(b)
        return blob

    if superblock == 2:
        sb = HDF5_MAGIC + bytes([2, 8, 8, 0])
        sb += struct.pack("<QQQQ", 0, _UNDEF, total, pos["root_v2"])
        sb += struct.pack("<I", _lookup3(sb))
        assert len(sb) == 48
    else:
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
    banded synthetic grid as HDF5 granules — band 0 contiguous
    (superblock v0), band 1 chunked+deflate with the v1-B-tree index,
    band 2 chunked+deflate in the HDF5 ≥1.10 libver=latest container
    (superblock v2, v4 layout, Fixed Array chunk index) — so the
    driver-gated q_hdf5_ingest exercises every decode generation."""
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
                superblock=2 if band == 2 else 0,
                chunk_index="fixed_array" if band == 2 else "btree1",
            )
            with open(os.path.join(tmp, f"granule_{band}.nc"), "wb") as f:
                f.write(buf)

    return _write_once_fixture(
        f"pyresample_spark_h5_granules_v2_{GRANULE_BANDS}x"
        f"{GRANULE_ROWS}x{GRANULE_COLS}",
        write,
    )


def demo_hdf5_szip_granule_dir() -> str:
    """szip-compressed twin of demo_hdf5_granule_dir (VERDICT r14
    missing item 1 — the MODIS/VIIRS L1B compression): uint16 count
    grids with one band per szip flavour — band 0 NN-preprocessed
    (ppb 8, the NASA default), band 1 entropy-coding-only (ppb 16),
    band 2 NN + fletcher32 in the HDF5 ≥1.10 container (superblock
    v2, v4 layout, Fixed Array index) — so the driver-gated
    q_hdf5_szip_ingest exercises the CCSDS 121.0 decoder through
    every surrounding pipeline shape."""
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
            data = ((rows * 29 + cols * 13) % 251).astype("<u2")
            buf = hdf5_grid_bytes(
                {
                    "x": (xs, {"CLASS": "DIMENSION_SCALE"}),
                    "y": (ys, {"CLASS": "DIMENSION_SCALE"}),
                    "crs": (None, {"proj4": "eqc"}),
                    "band": (data, {"grid_mapping": "crs"}),
                },
                chunks={"band": (5, 16)},
                deflate=False,
                szip={"ppb": 16, "option": "ec"} if band == 1
                else {"ppb": 8, "option": "nn"},
                fletcher32=band == 2,
                superblock=2 if band == 2 else 0,
                chunk_index="fixed_array" if band == 2 else "btree1",
            )
            with open(os.path.join(tmp, f"granule_{band}.nc"), "wb") as f:
                f.write(buf)

    return _write_once_fixture(
        f"pyresample_spark_h5_szip_granules_v1_{GRANULE_BANDS}x"
        f"{GRANULE_ROWS}x{GRANULE_COLS}",
        write,
    )


def demo_hdf5_scaleoffset_granule_dir() -> str:
    """Scale-offset twin of demo_hdf5_szip_granule_dir (filter 6):
    float64 quarter-step grids with a −999 fill, D-scaled at 2
    decimals — band 0 scaleoffset alone, band 1 composed with
    shuffle+deflate (packed stream riding the netcdf-c recipe),
    band 2 with fletcher32 — for the driver-gated
    q_hdf5_scaleoffset_ingest."""
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
            data = (((rows * 23 + cols * 7) % 83) / 4.0 - 9.25).astype(
                "<f8")
            data[(rows + cols) % 11 == 0] = -999.0
            buf = hdf5_grid_bytes(
                {
                    "x": (xs, {"CLASS": "DIMENSION_SCALE"}),
                    "y": (ys, {"CLASS": "DIMENSION_SCALE"}),
                    "crs": (None, {"proj4": "eqc"}),
                    "band": (data, {"grid_mapping": "crs"}),
                },
                chunks={"band": (5, 16)},
                deflate=band == 1,
                shuffle=band == 1,
                fletcher32=band == 2,
                scaleoffset={"factor": 2, "fill": -999.0},
            )
            with open(os.path.join(tmp, f"granule_{band}.nc"), "wb") as f:
                f.write(buf)

    return _write_once_fixture(
        f"pyresample_spark_h5_so_granules_v1_{GRANULE_BANDS}x"
        f"{GRANULE_ROWS}x{GRANULE_COLS}",
        write,
    )


def demo_hdf5_nbit_granule_dir() -> str:
    """n-bit twin of demo_hdf5_szip_granule_dir (filter 5): uint16
    grids narrowed to 12 significant bits — band 0 nbit alone, band 1
    composed with shuffle+deflate (the packed stream riding the
    netcdf-c recipe), band 2 with fletcher32 in the HDF5 >=1.10
    Fixed-Array container — for the driver-gated q_hdf5_nbit_ingest."""
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
            data = ((rows * 131 + cols * 29) % 4096).astype("<u2")
            buf = hdf5_grid_bytes(
                {
                    "x": (xs, {"CLASS": "DIMENSION_SCALE"}),
                    "y": (ys, {"CLASS": "DIMENSION_SCALE"}),
                    "crs": (None, {"proj4": "eqc"}),
                    "band": (data, {"grid_mapping": "crs"}),
                },
                chunks={"band": (5, 16)},
                deflate=band == 1,
                shuffle=band == 1,
                fletcher32=band == 2,
                nbit={"precision": 12},
                superblock=2 if band == 2 else 0,
                chunk_index="fixed_array" if band == 2 else "btree1",
            )
            with open(os.path.join(tmp, f"granule_{band}.nc"), "wb") as f:
                f.write(buf)

    return _write_once_fixture(
        f"pyresample_spark_h5_nbit_granules_v1_{GRANULE_BANDS}x"
        f"{GRANULE_ROWS}x{GRANULE_COLS}",
        write,
    )


def demo_hdf5_lzf_granule_dir() -> str:
    """LZF twin (filter 32000 — h5py's ``compression='lzf'``, the
    most common registered-plugin filter in the wild, r17): uint16
    grids — band 0 lzf alone, band 1 riding shuffle (h5py's
    shuffle=True recipe), band 2 with fletcher32 in the HDF5 ≥1.10
    Fixed-Array container (which also pins the per-entry chunk-size
    flag for registered filters) — for the driver-gated
    q_hdf5_lzf_ingest."""
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
            data = ((rows * 37 + cols * 11) % 251).astype("<u2")
            buf = hdf5_grid_bytes(
                {
                    "x": (xs, {"CLASS": "DIMENSION_SCALE"}),
                    "y": (ys, {"CLASS": "DIMENSION_SCALE"}),
                    "crs": (None, {"proj4": "eqc"}),
                    "band": (data, {"grid_mapping": "crs"}),
                },
                chunks={"band": (5, 16)},
                deflate=False,
                lzf=True,
                shuffle=band == 1,
                fletcher32=band == 2,
                superblock=2 if band == 2 else 0,
                chunk_index="fixed_array" if band == 2 else "btree1",
            )
            with open(os.path.join(tmp, f"granule_{band}.nc"), "wb") as f:
                f.write(buf)

    return _write_once_fixture(
        f"pyresample_spark_h5_lzf_granules_v1_{GRANULE_BANDS}x"
        f"{GRANULE_ROWS}x{GRANULE_COLS}",
        write,
    )


def demo_hdf5_lz4_granule_dir() -> str:
    """LZ4 twin (filter 32004 — the Dectris-registered plugin
    hdf5plugin/h5py expose, r17): uint16 grids — band 0 lz4 alone,
    band 1 riding shuffle, band 2 with fletcher32 in the HDF5 ≥1.10
    Fixed-Array container — for the driver-gated q_hdf5_lz4_ingest."""
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
            data = ((rows * 41 + cols * 19) % 509).astype("<u2")
            buf = hdf5_grid_bytes(
                {
                    "x": (xs, {"CLASS": "DIMENSION_SCALE"}),
                    "y": (ys, {"CLASS": "DIMENSION_SCALE"}),
                    "crs": (None, {"proj4": "eqc"}),
                    "band": (data, {"grid_mapping": "crs"}),
                },
                chunks={"band": (5, 16)},
                deflate=False,
                lz4=True,
                shuffle=band == 1,
                fletcher32=band == 2,
                superblock=2 if band == 2 else 0,
                chunk_index="fixed_array" if band == 2 else "btree1",
            )
            with open(os.path.join(tmp, f"granule_{band}.nc"), "wb") as f:
                f.write(buf)

    return _write_once_fixture(
        f"pyresample_spark_h5_lz4_granules_v1_{GRANULE_BANDS}x"
        f"{GRANULE_ROWS}x{GRANULE_COLS}",
        write,
    )


def demo_hdf5_zstd_granule_dir() -> str:
    """Zstd twin (filter 32015 — the registered plugin hdf5plugin and
    netcdf-c ≥4.9 quantize/zstd pipelines ship, r17 continuation):
    uint16 grids — band 0 zstd alone, band 1 riding shuffle, band 2
    with fletcher32 in the HDF5 ≥1.10 Fixed-Array container — for the
    driver-gated q_hdf5_zstd_ingest. Chunks are store-mode frames
    (zstd_compress_store) so real zstd tooling reads them back."""
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
            data = ((rows * 37 + cols * 23) % 521).astype("<u2")
            buf = hdf5_grid_bytes(
                {
                    "x": (xs, {"CLASS": "DIMENSION_SCALE"}),
                    "y": (ys, {"CLASS": "DIMENSION_SCALE"}),
                    "crs": (None, {"proj4": "eqc"}),
                    "band": (data, {"grid_mapping": "crs"}),
                },
                chunks={"band": (5, 16)},
                deflate=False,
                zstd=True,
                shuffle=band == 1,
                fletcher32=band == 2,
                superblock=2 if band == 2 else 0,
                chunk_index="fixed_array" if band == 2 else "btree1",
            )
            with open(os.path.join(tmp, f"granule_{band}.nc"), "wb") as f:
                f.write(buf)

    return _write_once_fixture(
        f"pyresample_spark_h5_zstd_granules_v1_{GRANULE_BANDS}x"
        f"{GRANULE_ROWS}x{GRANULE_COLS}",
        write,
    )


def demo_hdf5_bitshuffle_granule_dir() -> str:
    """Bitshuffle twin (filter 32008 — the hdf5plugin/Masui filter
    modern detector and L1 archives ship, r17): uint16 grids — band 0
    bitshuffle+LZ4 (the shipped combination), band 1 plain bitshuffle
    (explicit block size), band 2 bitshuffle+LZ4 with fletcher32 in
    the HDF5 ≥1.10 Fixed-Array container. The 5x17 chunks are NOT a
    multiple of 8 elements, so every chunk exercises the %8 leftover
    tail. For the driver-gated q_hdf5_bitshuffle_ingest."""
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
            data = ((rows * 43 + cols * 23) % 769).astype("<u2")
            buf = hdf5_grid_bytes(
                {
                    "x": (xs, {"CLASS": "DIMENSION_SCALE"}),
                    "y": (ys, {"CLASS": "DIMENSION_SCALE"}),
                    "crs": (None, {"proj4": "eqc"}),
                    "band": (data, {"grid_mapping": "crs"}),
                },
                chunks={"band": (5, 17)},
                deflate=False,
                bitshuffle={"block": 32, "lz4": band != 1},
                fletcher32=band == 2,
                superblock=2 if band == 2 else 0,
                chunk_index="fixed_array" if band == 2 else "btree1",
            )
            with open(os.path.join(tmp, f"granule_{band}.nc"), "wb") as f:
                f.write(buf)

    return _write_once_fixture(
        f"pyresample_spark_h5_bshuf_granules_v1_{GRANULE_BANDS}x"
        f"{GRANULE_ROWS}x{GRANULE_COLS}",
        write,
    )


CAL_DTYPE = np.dtype({
    # C-aligned layout WITH padding (2-byte hole after the u2, 2
    # trailing bytes): offset handling must be exercised, not just
    # field order
    "names": ["band", "scale", "offset", "tag"],
    "formats": ["<u2", "<f8", "<i4", "S2"],
    "offsets": [0, 8, 16, 20],
    "itemsize": 24,
})


def demo_cal_table() -> np.ndarray:
    """The deterministic per-band calibration table every compound
    granule carries: scale = 0.5 + 0.25·band, offset = 3·band − 1 —
    quarter/integer values, so calibrated products are exact in
    float64 and the DuckDB oracle can regenerate them."""
    from pyresample_spark.sources.binary_raster import GRANULE_BANDS

    tbl = np.zeros(GRANULE_BANDS, dtype=CAL_DTYPE)
    tbl["band"] = np.arange(GRANULE_BANDS)
    tbl["scale"] = 0.5 + 0.25 * np.arange(GRANULE_BANDS)
    tbl["offset"] = 3 * np.arange(GRANULE_BANDS) - 1
    tbl["tag"][:] = b"ok"
    return tbl


def demo_compound_hdf5_granule_dir() -> str:
    """demo_hdf5_granule_dir plus a COMPOUND calibration side table
    (``cal``: band u2 / scale f8 / offset i4 / tag S2 at C-aligned
    padded offsets — the scale/index tables real L1B products carry)
    in every granule, for the driver-gated q_compound_calibrate."""
    import os

    from pyresample_spark.sources.binary_raster import (
        GRANULE_BANDS,
        GRANULE_COLS,
        GRANULE_ROWS,
        _write_once_fixture,
    )

    cal = demo_cal_table()

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
                    "cal": (cal, {"purpose": "calibration"}),
                },
                chunks=None if band == 0 else {"band": (5, 16)},
                deflate=band != 0,
            )
            with open(os.path.join(tmp, f"granule_{band}.nc"), "wb") as f:
                f.write(buf)

    return _write_once_fixture(
        f"pyresample_spark_h5_cal_granules_v1_{GRANULE_BANDS}x"
        f"{GRANULE_ROWS}x{GRANULE_COLS}",
        write,
    )
