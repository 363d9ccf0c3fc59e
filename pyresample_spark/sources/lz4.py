"""LZ4 codec: the registered HDF5 filter 32004 (HDF5Plugin-LZ4).

The LZ4 BLOCK format (public spec, lz4_Block_format.md) is a sequence
stream: token byte (high nibble = literal length, low nibble = match
length − 4, value 15 in either nibble chains 255-extension bytes),
the literals, then a 2-byte little-endian match offset (1..65535; 0 is
invalid) — the match may overlap its own output (front-to-back copy).
The LAST sequence is literals-only (no offset/match after it).

The registered HDF5 filter framing (Dectris "HDF5 filter plugin for
LZ4", filter id 32004, used via hdf5plugin / h5py): big-endian
8-byte total uncompressed size, big-endian 4-byte block size, then
per block a big-endian 4-byte compressed size followed by the block —
a block whose compressed size equals its uncompressed size is stored
RAW. The reference reads such granules through h5py + hdf5plugin;
this module decodes them natively, same discipline as the
deflate/szip/scaleoffset/nbit/lzf filters in sources/hdf5.py.

The encoder twin emits conforming streams for fixtures (greedy
hash-table matcher honoring the block-format end rules: the last five
bytes are literals and no match begins within the last twelve); any
conforming stream decodes, byte-parity with liblz4 is not required.
"""

from __future__ import annotations

import struct

_MIN_MATCH = 4


def lz4_block_decompress(data: bytes, max_out: int) -> bytes:
    """Decode one LZ4 block; ``max_out`` bounds the output so a
    crafted chunk cannot drive an unbounded allocation."""
    out = bytearray()
    i, n = 0, len(data)
    while True:
        if i >= n:
            raise ValueError("LZ4 truncated block (missing token)")
        token = data[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= n:
                    raise ValueError("LZ4 truncated literal length")
                b = data[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if lit:
            if i + lit > n:
                raise ValueError("LZ4 literal run past block end")
            if len(out) + lit > max_out:
                raise ValueError("LZ4 output exceeds declared size")
            out += data[i:i + lit]
            i += lit
        if i == n:  # last sequence: literals only
            break
        if i + 2 > n:
            raise ValueError("LZ4 truncated match offset")
        off = data[i] | (data[i + 1] << 8)
        i += 2
        if off == 0:
            raise ValueError("LZ4 match offset 0 is invalid")
        if off > len(out):
            raise ValueError("LZ4 match offset before block start")
        ml = (token & 0x0F)
        if ml == 15:
            while True:
                if i >= n:
                    raise ValueError("LZ4 truncated match length")
                b = data[i]
                i += 1
                ml += b
                if b != 255:
                    break
        ml += _MIN_MATCH
        if len(out) + ml > max_out:
            raise ValueError("LZ4 output exceeds declared size")
        if off >= ml:  # disjoint: one slice copy
            start = len(out) - off
            out += out[start:start + ml]
        else:  # overlapping: front-to-back (run-length semantics)
            p = len(out) - off
            for _ in range(ml):
                out.append(out[p])
                p += 1
    return bytes(out)


def lz4_block_compress(data: bytes) -> bytes:
    """Greedy conforming LZ4 block encoder (fixture twin)."""
    n = len(data)
    out = bytearray()
    htab: dict = {}

    def put_len(ln: int):
        # extension bytes for a nibble that saturated at 15
        while ln >= 255:
            out.append(255)
            ln -= 255
        out.append(ln)

    anchor = 0
    i = 0
    # matches may not start in the last 12 bytes; last 5 are literals
    limit = n - 12
    while i <= limit and i + _MIN_MATCH <= n:
        key = bytes(data[i:i + 4])
        j = htab.get(key)
        htab[key] = i
        if j is None or i - j > 65535 or data[j:j + 4] != key:
            i += 1
            continue
        ml = 4
        maxl = (n - 5) - i  # match must end ≥5 bytes before block end
        while ml < maxl and data[j + ml] == data[i + ml]:
            ml += 1
        lit = i - anchor
        tok_lit = 15 if lit >= 15 else lit
        tok_ml = 15 if ml - _MIN_MATCH >= 15 else ml - _MIN_MATCH
        out.append((tok_lit << 4) | tok_ml)
        if tok_lit == 15:
            put_len(lit - 15)
        out += data[anchor:i]
        out += struct.pack("<H", i - j)
        if tok_ml == 15:
            put_len(ml - _MIN_MATCH - 15)
        i += ml
        anchor = i
    # final literals-only sequence
    lit = n - anchor
    tok_lit = 15 if lit >= 15 else lit
    out.append(tok_lit << 4)
    if tok_lit == 15:
        put_len(lit - 15)
    out += data[anchor:]
    return bytes(out)


def h5_lz4_decode(raw: bytes, max_out: int) -> bytes:
    """Undo the HDF5 filter-32004 framing around LZ4 blocks."""
    if len(raw) < 12:
        raise ValueError("LZ4 chunk too short for its header")
    total = struct.unpack_from(">Q", raw, 0)[0]
    bsize = struct.unpack_from(">I", raw, 8)[0]
    if total > max_out:
        raise ValueError(
            f"LZ4 declared size {total} exceeds the chunk's true "
            f"byte size {max_out}")
    if bsize == 0:
        bsize = total  # one block (the plugin clamps to total)
    out = bytearray()
    pos = 12
    remaining = total
    while remaining > 0:
        if pos + 4 > len(raw):
            raise ValueError("LZ4 truncated block header")
        csize = struct.unpack_from(">I", raw, pos)[0]
        pos += 4
        ublock = min(bsize, remaining)
        if pos + csize > len(raw):
            raise ValueError("LZ4 block past chunk end")
        blk = raw[pos:pos + csize]
        pos += csize
        if csize == ublock:  # stored raw (incompressible)
            out += blk
        else:
            dec = lz4_block_decompress(blk, ublock)
            if len(dec) != ublock:
                raise ValueError(
                    f"LZ4 block decoded to {len(dec)} bytes, "
                    f"expected {ublock}")
            out += dec
        remaining -= ublock
    return bytes(out)


def h5_lz4_encode(raw: bytes, bsize: int = 1 << 20) -> bytes:
    """Apply the filter-32004 framing (fixture twin): blocks stored
    raw when compression does not shrink them, like the plugin."""
    out = bytearray(struct.pack(">QI", len(raw), bsize))
    p = 0
    while p < len(raw):
        blk = raw[p:p + bsize]
        p += bsize
        enc = lz4_block_compress(blk)
        if len(enc) < len(blk):
            out += struct.pack(">I", len(enc)) + enc
        else:
            out += struct.pack(">I", len(blk)) + blk
    return bytes(out)
