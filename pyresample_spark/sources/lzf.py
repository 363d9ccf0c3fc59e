"""LZF codec: the h5py registered HDF5 filter (id 32000).

h5py's ``compression='lzf'`` — its zero-dependency default — wraps
Marc Lehmann's liblzf, an LZ77 byte format with exactly three rules
(lzf_d.c, public):

- control byte < 32: a literal run of ``ctrl + 1`` bytes follows;
- control byte ≥ 32: a back-reference of ``(ctrl >> 5) + 2`` bytes
  (when the 3-bit length field is 7, ONE extension byte follows the
  control byte and adds to the length) from distance
  ``((ctrl & 0x1f) << 8 | low_byte) + 1`` behind the write head — the
  low offset byte comes AFTER the optional length-extension byte;
- distances may be smaller than the copy length (overlapping copy =
  run-length emission), so the copy must proceed front-to-back.

The reference reads such granules through h5py/libhdf5 + the h5py
filter plugin (pyresample swath loading delegates file IO entirely);
this module decodes the chunks natively — same discipline as the
deflate/szip/scaleoffset/nbit filters in sources/hdf5.py. The
encoder twin (a greedy hash-table matcher per lzf_c.c's structure)
exists for fixture generation; any conforming stream decodes, so the
twin does not need to be byte-identical to liblzf output.
"""

from __future__ import annotations

_MAX_OFF = 1 << 13  # liblzf window: 8192
_MAX_REF = (1 << 8) + (1 << 3)  # longest back-copy: 7+255 plus 2 = 264
_MAX_LIT = 1 << 5  # 32


def lzf_decompress(data: bytes, max_out: int) -> bytes:
    """Decode one LZF stream; ``max_out`` bounds the output buffer so
    a crafted chunk cannot drive an unbounded allocation (the caller
    passes the chunk's true byte size from the dataset layout — the
    filter-pipeline cd values are untrusted)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ctrl = data[i]
        i += 1
        if ctrl < 32:  # literal run
            ln = ctrl + 1
            if i + ln > n:
                raise ValueError("LZF literal run past stream end")
            if len(out) + ln > max_out:
                raise ValueError("LZF output exceeds declared chunk size")
            out += data[i:i + ln]
            i += ln
            continue
        ln = ctrl >> 5
        if ln == 7:  # length extension byte PRECEDES the offset byte
            if i >= n:
                raise ValueError("LZF truncated length extension")
            ln += data[i]
            i += 1
        ln += 2
        if i >= n:
            raise ValueError("LZF truncated back-reference offset")
        dist = (((ctrl & 0x1F) << 8) | data[i]) + 1
        i += 1
        if dist > len(out):
            raise ValueError("LZF back-reference before stream start")
        if len(out) + ln > max_out:
            raise ValueError("LZF output exceeds declared chunk size")
        if dist >= ln:  # disjoint: one slice copy
            start = len(out) - dist
            out += out[start:start + ln]
        else:  # overlapping: front-to-back (run-length semantics)
            p = len(out) - dist
            for _ in range(ln):
                out.append(out[p])
                p += 1
    return bytes(out)


def lzf_compress(data: bytes) -> bytes:
    """Greedy single-pass LZF encoder (fixture twin): 3-byte hash
    candidates, window 8192, match length capped at liblzf's 264."""
    n = len(data)
    out = bytearray()
    lit = bytearray()
    htab: dict = {}

    def flush_lit():
        q = 0
        while q < len(lit):
            chunk = lit[q:q + _MAX_LIT]
            out.append(len(chunk) - 1)
            out.extend(chunk)
            q += _MAX_LIT
        del lit[:]

    i = 0
    while i < n:
        if i + 3 <= n:
            key = bytes(data[i:i + 3])
            j = htab.get(key)
            htab[key] = i
            if j is not None and 1 <= i - j <= _MAX_OFF:
                maxl = min(n - i, _MAX_REF)
                ln = 3
                while ln < maxl and data[j + ln] == data[i + ln]:
                    ln += 1
                flush_lit()
                dist = i - j - 1
                lf = ln - 2
                if lf < 7:
                    out.append((lf << 5) | (dist >> 8))
                else:
                    out.append((7 << 5) | (dist >> 8))
                    out.append(lf - 7)
                out.append(dist & 0xFF)
                i += ln
                continue
        lit.append(data[i])
        i += 1
    flush_lit()
    return bytes(out)
