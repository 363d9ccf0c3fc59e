"""Pure-python LERC (Limited Error Raster Compression) decoder.

Decodes Esri Lerc2 blobs (versions 2-6) — the raster compression
GDAL writes into Cloud-Optimized GeoTIFFs as tag 34887 (COMPRESSION
=LERC, often for elevation products) and the codec behind Esri image
services. The reference engine defers this to rasterio/GDAL/libLerc;
here the format is implemented from the public Lerc2 specification
(the Esri Lerc repository's documented blob layout, Apache-2.0) with
every structural detail cross-validated against the system
libLerc.so.4 (tests/test_lerc.py drives lerc_encodeForVersion over a
dtype x version x mask x maxZError matrix and requires bit-exact
agreement with lerc_decode).

Layout (little-endian throughout):

- header: "Lerc2 ", int32 version, [uint32 checksum v3+], int32
  nRows, nCols, [nDepth v4+], numValidPixel, microBlockSize,
  blobSize, dataType, then double maxZError, zMin, zMax.
- valid-pixel mask: int32 numBytes + RLE stream (int16 counts:
  n>0 literal bytes, -32767<=n<0 repeat of next byte -n times,
  -32768 terminator; bits MSB-first per byte, row-major) — only
  when numValidPixel not in {0, nRows*nCols}.
- data: 1 byte bDataOneSweep; if 1 the native-dtype values of the
  valid pixels follow raw. Otherwise 8-bit data carries one extra
  mode byte (1 = Huffman-coded image, 0 = microblock tiles), then
  microBlockSize^2 tiles in row-strip order, each:
    1 header byte: bits0-1 comprFlag (0 raw tile, 1 bit-stuffed
    (+LUT), 2 all-zero tile, 3 constant), bits2-5 the column-tile
    index %16 (integrity check), bits6-7 the offset's shrunken
    data-type code; fully-invalid tiles are skipped entirely.
    comprFlag 3: one offset value (the constant). comprFlag 0: the
    valid pixels raw. comprFlag 1: offset value, then a BitStuffer
    block: 1 byte (count-width-code<<6 | LUT-flag<<5 | numBits),
    the valid-pixel count in (4 - count-width-code) bytes, then for
    LUT tiles the LUT length byte + stuffed LUT entries + stuffed
    indices, else the stuffed deltas; value = offset +
    2*maxZError*delta (quantized) with float/double, or offset +
    delta for integer types.
- bit stuffing packs values MSB-first into little-endian 32-bit
  words (the tail word shrinks to the bytes actually needed).
"""
from __future__ import annotations

import struct

import numpy as np

_DT = [np.int8, np.uint8, np.int16, np.uint16, np.int32, np.uint32,
       np.float32, np.float64]

# tile-offset shrink codes: per data type, the type the offset was
# written in for type-code 0..3 (None = invalid)
_TC_MAP = {
    0: [np.int8, None, None, None],
    1: [np.uint8, None, None, None],
    2: [np.int16, np.uint8, np.int8, None],
    3: [np.uint16, np.uint8, None, None],
    4: [np.int32, np.uint16, np.int16, np.uint8],
    5: [np.uint32, np.uint16, np.uint8, None],
    6: [np.float32, np.int16, np.int8, None],
    7: [np.float64, np.float32, np.int32, np.int16],
}


class _R:
    __slots__ = ("b", "pos")

    def __init__(self, b: bytes, pos: int = 0):
        self.b = b
        self.pos = pos

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.b):
            raise ValueError("lerc: truncated blob")
        out = self.b[self.pos:self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def i32(self) -> int:
        return struct.unpack("<i", self.take(4))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def f64(self) -> float:
        return struct.unpack("<d", self.take(8))[0]

    def scalar(self, dt) -> float:
        dt = np.dtype(dt)
        return np.frombuffer(self.take(dt.itemsize), dtype=dt)[0]


def _unstuff(r: _R, count: int, nbits: int, msb: bool) -> np.ndarray:
    """Bit-stuffed payload: ``count`` values of ``nbits`` bits packed
    into little-endian uint32 words — MSB-first within each word for
    v2 blobs (the original BitStuffer), LSB-first for v3+
    (BitStuffer2). The final partial word is stored in just the bytes
    its significant bits occupy (the high bytes under MSB packing,
    shifted down; the low bytes under LSB packing)."""
    if nbits == 0:
        return np.zeros(count, dtype=np.uint64)
    if nbits > 32:
        raise ValueError(f"lerc: bit width {nbits} > 32")
    total_bits = count * nbits
    nwords = total_bits // 32
    tail_bits = total_bits - nwords * 32
    tail_bytes = (tail_bits + 7) // 8
    raw = r.take(4 * nwords + tail_bytes)
    if tail_bytes and tail_bytes < 4:
        pad = b"\x00" * (4 - tail_bytes)
        # MSB packing leaves the used bits in the word's top bytes;
        # the writer shifts them down before storing, so the decoder
        # shifts back up (== zero-pad the LOW bytes)
        raw = (raw[:4 * nwords] + pad + raw[4 * nwords:]) if msb \
            else raw + pad
    words = np.frombuffer(raw, dtype="<u4")
    if msb:
        bits = np.unpackbits(
            words.astype(">u4").view(np.uint8)).reshape(-1, 32)
        flat = bits.reshape(-1)[:count * nbits].reshape(count, nbits)
        weights = (1 << np.arange(nbits - 1, -1, -1)).astype(np.uint64)
        return (flat.astype(np.uint64) * weights).sum(axis=1)
    # LSB-first: within each word, value k occupies bits
    # [k*nbits, (k+1)*nbits) from bit 0 upward, crossing words
    bits = np.unpackbits(
        words.astype("<u4").view(np.uint8),
        bitorder="little").reshape(-1)
    flat = bits[:count * nbits].reshape(count, nbits)
    weights = (1 << np.arange(nbits)).astype(np.uint64)
    return (flat.astype(np.uint64) * weights).sum(axis=1)


def _read_mask(r: _R, nrows: int, ncols: int, nvalid: int) -> np.ndarray:
    total = nrows * ncols
    if nvalid == total:
        # still framed by a byte count (0 when trivially all-valid)
        nbytes = r.i32()
        r.take(nbytes)
        return np.ones((nrows, ncols), dtype=bool)
    if nvalid == 0:
        nbytes = r.i32()
        r.take(nbytes)
        return np.zeros((nrows, ncols), dtype=bool)
    nbytes = r.i32()
    end = r.pos + nbytes
    out = bytearray()
    nmask = (total + 7) // 8
    while True:
        if r.pos + 2 > end:
            raise ValueError("lerc: mask RLE overruns its byte count")
        n = struct.unpack("<h", r.take(2))[0]
        if n == -32768:
            break
        if n > 0:
            out += r.take(n)
        else:
            out += r.take(1) * (-n)
        if len(out) > nmask:
            raise ValueError("lerc: mask RLE produces too many bytes")
    if r.pos != end:
        raise ValueError("lerc: mask RLE size mismatch")
    if len(out) != nmask:
        raise ValueError(
            f"lerc: mask RLE produced {len(out)} of {nmask} bytes")
    bits = np.unpackbits(np.frombuffer(bytes(out), dtype=np.uint8),
                         count=total)
    m = bits.astype(bool).reshape(nrows, ncols)
    if int(m.sum()) != nvalid:
        raise ValueError(
            f"lerc: mask has {int(m.sum())} valid pixels, header "
            f"says {nvalid}")
    return m


class _WordBits:
    """MSB-first bit reader over little-endian uint32 words (the
    Huffman table/stream convention in every Lerc2 version)."""

    __slots__ = ("r", "acc", "n")

    def __init__(self, r: _R):
        self.r = r
        self.acc = 0
        self.n = 0

    def read(self, k: int) -> int:
        while self.n < k:
            self.acc = ((self.acc << 32)
                        | struct.unpack("<I", self.r.take(4))[0])
            self.n += 32
        self.n -= k
        return (self.acc >> self.n) & ((1 << k) - 1)

    def align(self):
        self.acc = 0
        self.n = 0


def _read_huffman(r: _R, img: np.ndarray, mask: np.ndarray,
                  version: int, delta: bool) -> None:
    """Huffman-coded 8-bit image (T.81-free custom coder: explicit
    per-symbol code table over a wrapped symbol window, then the
    codes for the valid pixels; ``delta`` chains each pixel to its
    left neighbor and each row's first valid pixel to the previous
    row's first value)."""
    hv = r.i32()
    size = r.i32()
    i0 = r.i32()
    i1 = r.i32()
    if hv < 2 or size != 256 or not (0 <= i0 < i1 <= 512):
        raise ValueError(
            f"lerc: corrupt Huffman table header ({hv}, {size}, "
            f"{i0}, {i1})")
    sb = r.u8()
    cw = sb >> 6
    nbits = sb & 0x1F
    nb_count = 3 - cw
    if nb_count not in (1, 2, 3):
        raise ValueError("lerc: Huffman length-vector count width")
    cnt = int.from_bytes(r.take(nb_count), "little")
    if cnt != i1 - i0:
        raise ValueError(
            f"lerc: Huffman length vector has {cnt} entries for "
            f"window {i0}..{i1}")
    lens = _unstuff(r, cnt, nbits, msb=version == 2)
    if (lens > 26).any():
        raise ValueError("lerc: Huffman code longer than 26 bits")
    wb = _WordBits(r)
    codes = {}
    for k, ln in enumerate(lens.tolist()):
        if ln:
            codes[(int(ln), wb.read(int(ln)))] = (i0 + k) & 255
    if not codes:
        raise ValueError("lerc: empty Huffman code table")
    wb.align()  # the pixel stream restarts word-aligned
    nrows, ncols = img.shape
    dtype = img.dtype
    # signed chars: plain-Huffman symbols carry value+128 (order-
    # preserving bias); delta mode instead biases each DELTA symbol
    # by +128 and chains in the two's-complement byte domain
    signed = dtype.kind == "i"
    delta_bias = signed and delta
    bias = 128 if (signed and not delta) else 0
    maxlen = max(ln for ln, _c in codes)
    # biased-domain reconstruction grid for the delta predictors
    grid = np.zeros((nrows, ncols), dtype=np.int32)
    last = 0
    for y in range(nrows):
        mrow = mask[y]
        grow = grid[y]
        for x in range(ncols):
            if not mrow[x]:
                continue
            code = ln = 0
            while (ln, code) not in codes:
                code = (code << 1) | wb.read(1)
                ln += 1
                if ln > maxlen:
                    raise ValueError(
                        "lerc: invalid Huffman code in pixel stream")
            sym = codes[(ln, code)]
            if delta:
                # predictor: left neighbor if valid, else the pixel
                # above, else the previous decoded value (scan order)
                if x and mrow[x - 1]:
                    pred = grow[x - 1]
                elif y and mask[y - 1][x]:
                    pred = grid[y - 1][x]
                else:
                    pred = last
                v = (int(pred) + sym - (128 if delta_bias else 0)) & 255
            else:
                v = sym
            grow[x] = v
            last = v
    if bias:
        out = grid - bias
    elif signed:
        out = np.where(grid >= 128, grid - 256, grid)
    else:
        out = grid
    img[mask] = out[mask].astype(dtype)


def lerc_decode_blob(blob: bytes):
    """Decode one Lerc2 blob → (values (h, w) ndarray, valid-mask
    (h, w) bool ndarray). Raises ValueError/NotImplementedError on
    corrupt or out-of-subset input."""
    r = _R(blob)
    if r.take(6) != b"Lerc2 ":
        raise ValueError("lerc: bad magic (not a Lerc2 blob)")
    version = r.i32()
    if not 2 <= version <= 6:
        raise NotImplementedError(f"lerc: codec version {version}")
    if version >= 3:
        # covers everything after this field up to blobSize;
        # verified once blobSize is parsed below
        stored = r.u32()
    nrows = r.i32()
    ncols = r.i32()
    ndepth = r.i32() if version >= 4 else 1
    nvalid = r.i32()
    micro = r.i32()
    blob_size = r.i32()
    dt_code = r.i32()
    if ndepth != 1:
        raise NotImplementedError(f"lerc: nDepth {ndepth} (profiles "
                                  "with >1 value per pixel)")
    if not (0 < nrows <= 1 << 28 and 0 < ncols <= 1 << 28):
        raise ValueError(f"lerc: implausible dims {nrows}x{ncols}")
    if nrows * ncols > 1 << 30:
        raise ValueError("lerc: raster exceeds decoder bound")
    if not 0 <= dt_code <= 7:
        raise ValueError(f"lerc: data type {dt_code}")
    if micro <= 0 or micro > 64:
        raise ValueError(f"lerc: micro block size {micro}")
    if blob_size > len(blob) or blob_size < 0:
        raise ValueError(
            f"lerc: declared blob size {blob_size} exceeds the "
            f"{len(blob)} bytes present")
    if version >= 3:
        got = _checksum(blob[14:blob_size])
        if got != stored:
            raise ValueError(
                f"lerc: checksum mismatch (stored {stored:#010x}, "
                f"computed {got:#010x})")
    if version >= 6:
        # v6 inserts an 8-byte field before the ranges and a 16-byte
        # block after them (noData bookkeeping; all-zero for the
        # masked-input path every encoder in the wild uses)
        if r.take(8) != b"\x00" * 8:
            raise NotImplementedError(
                "lerc: v6 extension field in use (noData profile)")
    maxz = r.f64()
    zmin = r.f64()
    zmax = r.f64()
    if version >= 6:
        if r.take(16) != b"\x00" * 16:
            raise NotImplementedError(
                "lerc: v6 noData values outside the subset")
    dt = np.dtype(_DT[dt_code])
    mask = _read_mask(r, nrows, ncols, nvalid)
    img = np.zeros((nrows, ncols), dtype=dt)
    if nvalid == 0:
        return img, mask
    if zmin == zmax:  # constant image: no data section at all
        img[mask] = dt.type(zmin)
        return img, mask
    fl = dt.kind == "f"
    if version >= 4:
        # per-depth min/max ranges in the native dtype (nDepth == 1
        # here, so one scalar each)
        r.take(2 * dt.itemsize)
    sweep = r.u8()
    if sweep:
        vals = np.frombuffer(r.take(int(nvalid) * dt.itemsize),
                             dtype=dt)
        img[mask] = vals
        return img, mask
    if dt.itemsize == 1:
        hmode = r.u8()
        if hmode:
            if hmode not in (1, 2):
                raise ValueError(f"lerc: image encode mode {hmode}")
            _read_huffman(r, img, mask, version, delta=hmode == 1)
            return img, mask
    # microblock tiles, row-strip order; fully-invalid tiles skipped
    q = 2.0 * maxz if fl else 1.0
    for r0 in range(0, nrows, micro):
        rs = min(micro, nrows - r0)
        for ti, c0 in enumerate(range(0, ncols, micro)):
            cs = min(micro, ncols - c0)
            tm = mask[r0:r0 + rs, c0:c0 + cs]
            cnt = int(tm.sum())
            if cnt == 0:
                continue
            hdr = r.u8()
            cf = hdr & 3
            # bits 2-5 carry a column integrity stamp: the column
            # tile index %16 through v4; v5+ stamps column pairs
            want = (ti % 16) if version <= 4 else (ti & ~1) % 16
            if (hdr >> 2) & 15 != want:
                raise ValueError(
                    f"lerc: tile integrity check failed at tile "
                    f"({r0 // micro}, {ti})")
            tc = hdr >> 6
            tile = img[r0:r0 + rs, c0:c0 + cs]
            if cf == 3:  # constant tile
                ot = _TC_MAP[dt_code][tc]
                if ot is None:
                    raise ValueError(
                        f"lerc: offset type code {tc} invalid for "
                        f"data type {dt_code}")
                tile[tm] = dt.type(r.scalar(ot))
                continue
            if cf == 2:  # all-zero tile
                tile[tm] = dt.type(0)
                continue
            if cf == 0:  # raw tile
                vals = np.frombuffer(r.take(cnt * dt.itemsize),
                                     dtype=dt)
                tile[tm] = vals
                continue
            ot = _TC_MAP[dt_code][tc]
            if ot is None:
                raise ValueError(
                    f"lerc: offset type code {tc} invalid for data "
                    f"type {dt_code}")
            offset = float(r.scalar(ot))
            sb = r.u8()
            cw = sb >> 6
            lut_flag = (sb >> 5) & 1
            nbits = sb & 0x1F
            nb_count = 3 - cw
            if nb_count not in (1, 2, 3):
                raise ValueError("lerc: count width")
            count = int.from_bytes(r.take(nb_count), "little")
            msb = version == 2
            if lut_flag:
                # index 0 is the implicit zero delta; nlut counts it
                nlut = r.u8()
                if nlut < 2:
                    raise ValueError(f"lerc: LUT size {nlut}")
                lut = np.concatenate(
                    [[0], _unstuff(r, nlut - 1, nbits, msb)]
                ).astype(np.float64)
                idx_bits = _bits_needed(nlut)
                idx = _unstuff(r, count, idx_bits, msb)
                if (idx >= nlut).any():
                    raise ValueError("lerc: LUT index out of range")
                deltas = lut[idx]
            else:
                deltas = _unstuff(r, count, nbits, msb
                                  ).astype(np.float64)
            if count != cnt:
                raise ValueError(
                    f"lerc: tile count {count} != valid pixels {cnt}")
            vals = offset + q * deltas
            if fl:
                vals = np.minimum(vals, zmax)
                tile[tm] = vals.astype(dt)
            else:
                tile[tm] = np.round(vals).astype(np.int64).astype(dt)
    return img, mask


def _bits_needed(n: int) -> int:
    return max(1, int(n - 1).bit_length()) if n > 1 else 0


def _checksum(data: bytes) -> int:
    """Lerc2's Fletcher-style checksum over the blob bytes after the
    checksum field (algorithm pinned against libLerc fixtures)."""
    s1, s2 = 0xFFFF, 0xFFFF
    pos = 0
    words = len(data) // 2
    while words:
        tlen = min(359, words)
        words -= tlen
        for _ in range(tlen):
            s1 += (data[pos] << 8) + data[pos + 1]
            s2 += s1
            pos += 2
        s1 = (s1 & 0xFFFF) + (s1 >> 16)
        s2 = (s2 & 0xFFFF) + (s2 >> 16)
    if len(data) & 1:
        s1 += data[pos] << 8
        s2 += s1
    s1 = (s1 & 0xFFFF) + (s1 >> 16)
    s2 = (s2 & 0xFFFF) + (s2 >> 16)
    return ((s2 << 16) | s1) & 0xFFFFFFFF
