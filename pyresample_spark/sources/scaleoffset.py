"""Pure-python HDF5 scale-offset filter (id 6).

The last built-in HDF5 compression the native reader lacked after
deflate/shuffle/fletcher32/szip: ``H5Pset_scaleoffset`` (h5py's
``scaleoffset=`` dataset option) packs each chunk to the minimal bit
width spanned by its values — integers directly (``H5Z_SO_INT``),
floats via fixed-decimal D-scaling (``H5Z_SO_FLOAT_DSCALE``:
``round(v·10^factor)`` then integer packing). Science producers use
it for quantized int counts and fixed-precision float grids.

Wire format (public ``H5Zscaleoffset.c`` behavior):

* 20 client-data values — ``[scale_type, scale_factor, nelmts,
  class, size, sign, order, fill_defined, fill_value_words…]``
  (``H5Z_SCALEOFFSET_PARM_*`` order; the fill value's raw bytes are
  memcpy'd into the trailing words);
* each filtered chunk = ``[minbits u32 LE][minval_size u8]
  [minval, minval_size bytes LE][payload]``;
* ``minbits == 0``: every element equals ``minval`` (no payload);
  ``minbits == 8·size``: the payload is the chunk verbatim
  (incompressible span); otherwise the payload packs one
  ``minbits``-bit big-endian value per element into an MSB-first
  bitstream, each value ``original − minval`` in the type's modular
  domain;
* a defined fill value is escaped as the all-ones ``minbits``
  pattern (so ``minbits`` covers span+1 codes), and decode returns
  the fill's raw bytes from the client data;
* floats decode as ``(signed(minval) + packed) / 10^scale_factor``.

Writer twin + spec-built fixtures mirror the szip/NTv2 second-encoder
discipline (tests/test_scaleoffset.py); an importorskip twin
cross-validates against real h5py where available. Everything here
derives from the public HDF5 filter documentation and source
behavior. NBIT (filter 5) stays a loud guard: its client-data stream
encodes a recursive datatype tree whose layout this subset does not
pin down, and real granules do not ship it.
"""

from __future__ import annotations

import struct

import numpy as np

SO_FLOAT_DSCALE = 0
SO_FLOAT_ESCALE = 1
SO_INT = 2

_CLS_INTEGER = 0
_CLS_FLOAT = 1


def _bit_unpack(payload: bytes, n: int, minbits: int) -> np.ndarray:
    """n values of minbits bits each, MSB-first bitstream → uint64
    array. Vectorized (np.unpackbits + a power-of-two dot): the
    fixed-width fields make this filter — unlike szip's sequential
    Rice grammar — a pure array transform, so decode stays numpy-speed
    on the distributed ingest path."""
    need = (n * minbits + 7) // 8
    if len(payload) < need:
        raise ValueError(
            f"scaleoffset payload truncated: {len(payload)} bytes for "
            f"{n} x {minbits} bits"
        )
    bits = np.unpackbits(np.frombuffer(payload[:need], dtype=np.uint8))
    bits = bits[: n * minbits].reshape(n, minbits).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(minbits - 1, -1, -1,
                                         dtype=np.uint64))
    return bits @ weights


def _bit_pack(values, minbits: int) -> bytes:
    vals = np.asarray(values, dtype=np.uint64)
    shifts = np.arange(minbits - 1, -1, -1, dtype=np.uint64)
    bits = ((vals[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def _parms(cd_values) -> dict:
    if len(cd_values) < 9:
        raise ValueError(
            f"scaleoffset filter needs >=9 client-data values, got "
            f"{len(cd_values)}"
        )
    p = {
        "scale_type": int(cd_values[0]),
        "scale_factor": int(cd_values[1]),
        "nelmts": int(cd_values[2]),
        "cls": int(cd_values[3]),
        "size": int(cd_values[4]),
        "sign": int(cd_values[5]),
        "order": int(cd_values[6]),
        "fill_defined": int(cd_values[7]),
    }
    if p["scale_type"] not in (SO_FLOAT_DSCALE, SO_INT):
        raise NotImplementedError(
            f"scaleoffset scale type {p['scale_type']} (E-scaling is "
            "unimplemented in libhdf5 itself)"
        )
    if p["size"] not in (1, 2, 4, 8):
        raise ValueError(f"scaleoffset datatype size {p['size']}")
    if p["cls"] not in (_CLS_INTEGER, _CLS_FLOAT):
        raise NotImplementedError(
            f"scaleoffset datatype class {p['cls']} (integer and float "
            "atomic types only)"
        )
    if p["cls"] == _CLS_FLOAT and p["size"] not in (4, 8):
        raise ValueError("scaleoffset float must be 4 or 8 bytes")
    # fill value bytes ride the remaining cd words verbatim (LE words)
    nwords = (p["size"] + 3) // 4
    if p["fill_defined"] and len(cd_values) < 8 + nwords:
        raise ValueError("scaleoffset fill value missing from client data")
    fill = b"".join(
        struct.pack("<I", int(cd_values[8 + i]) & 0xFFFFFFFF)
        for i in range(nwords)
    )[: p["size"]] if p["fill_defined"] else None
    p["fill_bytes"] = fill
    return p


def _np_dtype(p: dict) -> np.dtype:
    order = "<" if p["order"] == 0 else ">"
    if p["cls"] == _CLS_FLOAT:
        return np.dtype(f"{order}f{p['size']}")
    kind = "i" if p["sign"] else "u"
    return np.dtype(f"{order}{kind}{p['size']}")


def h5_scaleoffset_decode(raw: bytes, cd_values,
                          max_nelmts: int | None = None) -> bytes:
    """``max_nelmts`` is the CHUNK's true element count from the
    dataset layout (chunk dims product); when given, the cd-declared
    count is bounded by it BEFORE any allocation is sized."""
    p = _parms(cd_values)
    n, size = p["nelmts"], p["size"]
    if max_nelmts is not None and n > max_nelmts:
        # cd_values ride the file's own filter-pipeline message, which
        # is attacker-controlled in the fuzz threat model — a crafted
        # minbits==0 header-only chunk with nelmts near 2^32 would
        # otherwise size a ~34 GB zeros() (ADVICE r16)
        raise ValueError(
            f"scaleoffset nelmts {n} exceeds the chunk's "
            f"{max_nelmts} elements"
        )
    if len(raw) < 5:
        raise ValueError("scaleoffset chunk shorter than its header")
    minbits = int.from_bytes(raw[:4], "little")
    minval_size = raw[4]
    if minval_size > 8:
        raise ValueError(f"scaleoffset minval size {minval_size} > 8")
    if len(raw) < 5 + minval_size:
        raise ValueError("scaleoffset header truncated before minval")
    minval = int.from_bytes(raw[5:5 + minval_size], "little")
    payload = raw[5 + minval_size:]
    if minbits > 8 * size:
        raise ValueError(
            f"scaleoffset minbits {minbits} exceeds the {size}-byte type"
        )
    # Element-count plausibility: bound by the packed payload's bit
    # capacity, and ONLY when minbits > 0 (ADVICE r15: a constant
    # chunk legitimately encodes to a 13-byte header-only stream
    # regardless of element count — minbits == 0 means "all values
    # equal minval", so a bits-per-element bound cannot apply). The
    # minbits == 0 allocation is instead bounded by ``max_nelmts``
    # above — cd_values are NOT trusted (they come from the file's
    # filter-pipeline message).
    if minbits > 0 and n > (8 * len(raw)) // minbits + (1 << 16):
        raise ValueError("scaleoffset element count implausible")
    if minbits == 8 * size:  # incompressible span: verbatim chunk
        if len(payload) < n * size:
            raise ValueError("scaleoffset raw payload truncated")
        return payload[: n * size]
    packed = (np.zeros(n, dtype=np.uint64) if minbits == 0
              else _bit_unpack(payload, n, minbits))
    escape = np.uint64((1 << minbits) - 1)
    use_fill = p["fill_bytes"] is not None and minbits > 0
    dt = _np_dtype(p)
    if p["cls"] == _CLS_INTEGER:
        # modular add in uint64, then truncate to the type width
        words = packed + np.uint64(minval & ((1 << 64) - 1))
        out = words.astype(
            np.dtype(f"{'<' if p['order'] == 0 else '>'}u{size}")
        ).view(dt)
    else:
        pow10 = 10.0 ** p["scale_factor"]
        sminval = minval - (1 << 64) if minval >> 63 else minval
        out = ((packed.astype(np.int64) + np.int64(sminval))
               .astype(np.float64) / pow10).astype(dt)
    if use_fill:
        fill_el = np.frombuffer(p["fill_bytes"], dtype=dt)[0]
        out = out.copy()
        out[packed == escape] = fill_el
    return out.tobytes()


def h5_scaleoffset_encode(raw: bytes, cd_values) -> bytes:
    """Writer twin of :func:`h5_scaleoffset_decode`."""
    p = _parms(cd_values)
    n, size = p["nelmts"], p["size"]
    if len(raw) != n * size:
        raise ValueError(
            f"scaleoffset input is {len(raw)} bytes, expected "
            f"{n} x {size}"
        )
    dt = _np_dtype(p)
    arr = np.frombuffer(raw, dtype=dt)
    bits = 8 * size
    fill = p["fill_bytes"]
    if fill is not None:
        fill_el = np.frombuffer(fill, dtype=dt)[0]
        if p["cls"] == _CLS_FLOAT and np.isnan(fill_el):
            fill_hit = np.isnan(arr)
        else:
            fill_hit = arr == fill_el
    else:
        fill_hit = np.zeros(n, dtype=bool)
    # signed integer domain for span/min; floats scale to signed ints
    if p["cls"] == _CLS_INTEGER:
        vals = [int(v) for v in arr]  # numpy already yields signed/uns.
    else:
        pow10 = 10.0 ** p["scale_factor"]
        vals = [int(round(float(v) * pow10)) if not h else 0
                for v, h in zip(arr, fill_hit)]
    live = [v for v, h in zip(vals, fill_hit) if not h]
    lo = min(live) if live else 0
    span = (max(live) - lo) if live else 0
    minbits = span.bit_length()
    if fill is not None:
        while (1 << minbits) - 1 <= span:
            minbits += 1
    if minbits >= bits:
        # incompressible: verbatim chunk behind a full-width header
        return bits.to_bytes(4, "little") + bytes([8]) + b"\x00" * 8 + raw
    minval = lo & ((1 << 64) - 1)
    escape = (1 << minbits) - 1
    packed = [escape if h else (v - lo)
              for v, h in zip(vals, fill_hit)]
    head = (minbits.to_bytes(4, "little") + bytes([8])
            + minval.to_bytes(8, "little"))
    if minbits == 0:
        return head
    return head + _bit_pack(packed, minbits)


def scaleoffset_cd_values(scale_type: int, scale_factor: int, nelmts: int,
                          dtype, fill=None) -> tuple:
    """The 20 stored client-data values in ``H5Z_SCALEOFFSET_PARM_*``
    order, the way ``set_local`` fills them."""
    dt = np.dtype(dtype)
    if dt.kind == "f":
        cls, sign = _CLS_FLOAT, 0
        if scale_type != SO_FLOAT_DSCALE:
            raise ValueError("float data needs SO_FLOAT_DSCALE")
    elif dt.kind in ("i", "u"):
        cls, sign = _CLS_INTEGER, 1 if dt.kind == "i" else 0
        if scale_type != SO_INT:
            raise ValueError("integer data needs SO_INT")
    else:
        raise ValueError(f"scaleoffset does not apply to dtype {dt}")
    big = dt.byteorder == ">" or (dt.byteorder == "=" and
                                  np.dtype(">i4").isnative)
    cd = [scale_type, scale_factor, nelmts, cls, dt.itemsize, sign,
          1 if big else 0, 0 if fill is None else 1]
    nwords = (dt.itemsize + 3) // 4
    if fill is not None:
        fb = np.array([fill], dtype=dt).tobytes().ljust(4 * nwords, b"\x00")
        cd += [struct.unpack_from("<I", fb, 4 * i)[0] for i in range(nwords)]
    else:
        cd += [0] * nwords
    cd += [0] * (20 - len(cd))
    return tuple(cd[:20])
