"""Pure-python Zstandard frame decoder (RFC 8878) + store-mode writer.

Backs HDF5 filter 32015 (the registered zstd filter) so
zstd-compressed granules ingest inside executors with no native
dependency — the same contract as the deflate/szip/LZF/LZ4/
bitshuffle chunk decoders. The reference engine defers all of this
to libhdf5's plugin path; here the format is implemented from the
public RFC.

Scope: single and concatenated standard frames, skippable frames,
raw/RLE/compressed blocks, all four literals types (raw, RLE,
Huffman with FSE- or direct-coded weights, treeless repeat),
1- and 4-stream literals, predefined/RLE/FSE/repeat sequence tables,
repeat-offset history, and optional xxhash64 content-checksum
verification. Dictionaries are rejected loudly (the HDF5 filter
never uses them).

``zstd_compress_store`` is the writer twin: a valid zstd frame using
raw blocks only (RFC 3.1.1.2.2), readable by any conforming
decoder — the HDF5 writer uses it so files round-trip through real
zstd tooling.

Every decode path is cross-validated against fixtures produced by
the reference zstd CLI (tests/test_zstd.py).
"""
from __future__ import annotations

import struct

_MAGIC = 0xFD2FB528
_SKIP_LO, _SKIP_HI = 0x184D2A50, 0x184D2A5F

# RFC 8878 3.1.1.3.2.2: predefined FSE distributions
_LL_DEFAULTS = (4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
                2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
                -1, -1, -1, -1)
_ML_DEFAULTS = (1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
                -1, -1, -1, -1, -1)
_OF_DEFAULTS = (1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)

# RFC 8878 3.1.1.3.2.1.1: code -> (baseline, extra bits)
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10,
                       11, 12, 13, 14, 15, 16]
_LL_BASE = list(range(16)) + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64,
                              128, 256, 512, 1024, 2048, 4096, 8192,
                              16384, 32768, 65536]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10,
                       11, 12, 13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [35, 37, 39, 41, 43, 47, 51, 59, 67,
                                 83, 99, 131, 259, 515, 1027, 2051,
                                 4099, 8195, 16387, 32771, 65539]


class _FwdBits:
    """Forward little-endian bit reader (FSE table descriptions)."""

    __slots__ = ("d", "pos", "bit")

    def __init__(self, d: bytes, pos: int):
        self.d = d
        self.pos = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        got = 0
        while got < n:
            if self.pos >= len(self.d):
                raise ValueError("zstd: FSE table description truncated")
            take = min(8 - self.bit, n - got)
            v |= ((self.d[self.pos] >> self.bit)
                  & ((1 << take) - 1)) << got
            got += take
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def align(self) -> int:
        if self.bit:
            self.bit = 0
            self.pos += 1
        return self.pos


class _BackBits:
    """Backward bit reader with the 1-bit sentinel (RFC 3.1.1.3.2.1.2
    and Huffman streams): bits are read MSB-down from the last byte
    toward the first; reading past the start yields zeros (tracked so
    interleaved-FSE loops can detect exhaustion)."""

    __slots__ = ("val", "nbits", "consumed")

    def __init__(self, d: bytes):
        if not d or d[-1] == 0:
            raise ValueError("zstd: bitstream missing sentinel")
        self.val = int.from_bytes(d, "little")
        self.nbits = 8 * len(d) - (8 - d[-1].bit_length()) - 1
        self.consumed = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.consumed += n
        rem = self.nbits - self.consumed
        if rem >= 0:
            return (self.val >> rem) & ((1 << n) - 1)
        # past the start: zero-fill (only legal for the tail reads of
        # interleaved FSE weight streams; callers check `overflowed`)
        if -rem >= n:
            return 0
        return (self.val & ((1 << (n + rem)) - 1)) << -rem

    @property
    def overflowed(self) -> bool:
        return self.consumed > self.nbits


def _fse_read_table(d: bytes, pos: int, max_sym: int):
    """Read an FSE table description (RFC 4.1.1). Returns
    (probs, accuracy_log, next_pos)."""
    br = _FwdBits(d, pos)
    al = br.read(4) + 5
    if al > 9:
        raise ValueError(f"zstd: FSE accuracy log {al} > 9")
    remaining = (1 << al) + 1
    threshold = 1 << al
    nbits = al + 1
    probs: list = []
    while remaining > 1:
        if len(probs) > max_sym:
            raise ValueError("zstd: FSE table has too many symbols")
        mx = 2 * threshold - 1 - remaining
        small = br.read(nbits - 1)
        if small < mx:
            count = small
        else:
            extra = br.read(1)
            count = small | (extra << (nbits - 1))
            if count >= threshold:
                count -= mx
        count -= 1  # -1 denotes the "less than 1" probability
        remaining -= -count if count < 0 else count
        probs.append(count)
        if count == 0:
            while True:
                rep = br.read(2)
                probs.extend([0] * rep)
                if len(probs) > max_sym + 1:
                    raise ValueError("zstd: FSE zero-run overruns "
                                     "symbol range")
                if rep != 3:
                    break
        while remaining > 1 and remaining < threshold:
            threshold >>= 1
            nbits -= 1
    if remaining != 1:
        raise ValueError("zstd: corrupt FSE table (remaining != 1)")
    return probs, al, br.align()


def _fse_build(probs, al: int):
    """Decoding table: per state (symbol, nb_bits, baseline)
    (RFC 4.1.1 spread + state-advance construction)."""
    size = 1 << al
    symbols = [0] * size
    hi = size
    # "less than 1" symbols occupy the highest states
    for s, p in enumerate(probs):
        if p == -1:
            hi -= 1
            if hi < 0:
                raise ValueError("zstd: FSE low-prob overflow")
            symbols[hi] = s
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, p in enumerate(probs):
        if p <= 0:
            continue
        for _ in range(p):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos >= hi:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: corrupt FSE spread")
    nexts = [p if p > 0 else 1 for p in probs]
    table = [None] * size
    for st in range(hi):
        s = symbols[st]
        x = nexts[s]
        nexts[s] += 1
        nb = al - (x.bit_length() - 1)
        table[st] = (s, nb, (x << nb) - size)
    for st in range(hi, size):
        s = symbols[st]
        table[st] = (s, al, 0)
    return table


def _huf_table(weights):
    """Canonical Huffman decode table from weights (RFC 4.2.1):
    returns (table, max_bits) where table[prefix] = (symbol, nbits)
    for every max_bits-wide prefix."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: empty Huffman weight set")
    max_bits = total.bit_length()  # next power of two above total
    if (1 << (max_bits - 1)) == total:
        raise ValueError("zstd: Huffman weights leave no room for "
                         "the implicit last symbol")
    if max_bits > 11:
        raise ValueError(f"zstd: Huffman max bits {max_bits} > 11")
    left = (1 << max_bits) - total
    lw = left.bit_length()
    if (1 << (lw - 1)) != left:
        raise ValueError("zstd: Huffman weights do not sum to a "
                         "power of two")
    weights = list(weights) + [lw]
    size = 1 << max_bits
    table = [None] * size
    pos = 0
    for w in range(1, max_bits + 1):
        for sym, sw in enumerate(weights):
            if sw != w:
                continue
            n = 1 << (w - 1)
            nb = max_bits + 1 - w
            for _ in range(n):
                table[pos] = (sym, nb)
                pos += 1
    if pos != size:
        raise ValueError("zstd: Huffman table not filled")
    # reorder: codes are assigned from value 0 upward starting with
    # the longest codes; with the fill above, entry i covers prefix i
    return table, max_bits


def _huf_decode_stream(d: bytes, table, max_bits: int, n_out: int
                       ) -> bytearray:
    br = _BackBits(d)
    out = bytearray()
    size_mask = (1 << max_bits) - 1
    val, nbits = br.val, br.nbits
    cur = nbits
    for _ in range(n_out):
        if cur >= max_bits:
            prefix = (val >> (cur - max_bits)) & size_mask
        else:
            prefix = (val << (max_bits - cur)) & size_mask
        sym, nb = table[prefix]
        cur -= nb
        if cur < -max_bits:
            raise ValueError("zstd: Huffman stream exhausted")
        out.append(sym)
    if cur != 0:
        raise ValueError(
            f"zstd: Huffman stream has {cur} bits left over")
    return out


def _read_weights(d: bytes, pos: int):
    """Huffman tree description (RFC 4.2.1): FSE-compressed or
    direct 4-bit weights. Returns (weights, next_pos)."""
    if pos >= len(d):
        raise ValueError("zstd: missing Huffman tree description")
    hb = d[pos]
    pos += 1
    if hb >= 128:  # direct representation
        n = hb - 127
        nbytes = (n + 1) // 2
        if pos + nbytes > len(d):
            raise ValueError("zstd: truncated Huffman weights")
        weights = []
        for i in range(n):
            b = d[pos + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        return weights, pos + nbytes
    # FSE-compressed weights: hb = compressed size
    if pos + hb > len(d):
        raise ValueError("zstd: truncated FSE weight stream")
    probs, al, p2 = _fse_read_table(d, pos, 255)
    if al > 6:
        raise ValueError("zstd: weight FSE accuracy log > 6")
    table = _fse_build(probs, al)
    stream = d[p2:pos + hb]
    br = _BackBits(stream)
    st1 = br.read(al)
    st2 = br.read(al)
    weights = []
    while True:
        s, nb, base = table[st1]
        weights.append(s)
        st1 = base + br.read(nb)
        if br.overflowed:
            weights.append(table[st2][0])
            break
        s, nb, base = table[st2]
        weights.append(s)
        st2 = base + br.read(nb)
        if br.overflowed:
            weights.append(table[st1][0])
            break
        if len(weights) > 254:
            raise ValueError("zstd: more than 255 Huffman weights")
    if any(w > 11 for w in weights):
        raise ValueError("zstd: Huffman weight > 11")
    return weights, pos + hb


def _decode_literals(d: bytes, pos: int, huf_state: dict):
    """Literals section (RFC 3.1.1.3.1). Returns (literals, next_pos).
    ``huf_state`` carries the previous table for treeless blocks."""
    if pos >= len(d):
        raise ValueError("zstd: missing literals section")
    b0 = d[pos]
    lt = b0 & 3
    sf = (b0 >> 2) & 3
    if lt in (0, 1):  # Raw / RLE
        if sf in (0, 2):
            rs = b0 >> 3
            pos += 1
        elif sf == 1:
            if pos + 2 > len(d):
                raise ValueError("zstd: truncated literals header")
            rs = (b0 >> 4) | (d[pos + 1] << 4)
            pos += 2
        else:
            if pos + 3 > len(d):
                raise ValueError("zstd: truncated literals header")
            rs = (b0 >> 4) | (d[pos + 1] << 4) | (d[pos + 2] << 12)
            pos += 3
        if lt == 0:
            if pos + rs > len(d):
                raise ValueError("zstd: truncated raw literals")
            return d[pos:pos + rs], pos + rs
        if pos >= len(d):
            raise ValueError("zstd: truncated RLE literal")
        return bytes([d[pos]]) * rs, pos + 1
    # Compressed (2) / Treeless (3)
    if sf == 0:
        streams = 1
        if pos + 3 > len(d):
            raise ValueError("zstd: truncated literals header")
        v = b0 | (d[pos + 1] << 8) | (d[pos + 2] << 16)
        regen = (v >> 4) & 0x3FF
        comp = (v >> 14) & 0x3FF
        pos += 3
    elif sf == 1:
        streams = 4
        if pos + 3 > len(d):
            raise ValueError("zstd: truncated literals header")
        v = b0 | (d[pos + 1] << 8) | (d[pos + 2] << 16)
        regen = (v >> 4) & 0x3FF
        comp = (v >> 14) & 0x3FF
        pos += 3
    elif sf == 2:
        streams = 4
        if pos + 4 > len(d):
            raise ValueError("zstd: truncated literals header")
        v = (b0 | (d[pos + 1] << 8) | (d[pos + 2] << 16)
             | (d[pos + 3] << 24))
        regen = (v >> 4) & 0x3FFF
        comp = (v >> 18) & 0x3FFF
        pos += 4
    else:
        streams = 4
        if pos + 5 > len(d):
            raise ValueError("zstd: truncated literals header")
        v = int.from_bytes(d[pos:pos + 5], "little")
        regen = (v >> 4) & 0x3FFFF
        comp = (v >> 22) & 0x3FFFF
        pos += 5
    end = pos + comp
    if end > len(d):
        raise ValueError("zstd: truncated compressed literals")
    if lt == 2:
        weights, pos = _read_weights(d, pos)
        huf_state["table"] = _huf_table(weights)
    elif "table" not in huf_state:
        raise ValueError("zstd: treeless literals with no previous "
                         "Huffman table")
    table, max_bits = huf_state["table"]
    if streams == 1:
        lits = _huf_decode_stream(d[pos:end], table, max_bits, regen)
        return bytes(lits), end
    if pos + 6 > end:
        raise ValueError("zstd: truncated 4-stream jump table")
    s1, s2, s3 = struct.unpack_from("<HHH", d, pos)
    pos += 6
    starts = [pos, pos + s1, pos + s1 + s2, pos + s1 + s2 + s3]
    ends = starts[1:] + [end]
    if starts[3] > end:
        raise ValueError("zstd: jump table exceeds literals section")
    per = (regen + 3) >> 2
    sizes = [per, per, per, regen - 3 * per]
    if sizes[3] < 0:
        raise ValueError("zstd: regenerated size smaller than 3 "
                         "stream quarters")
    out = bytearray()
    for (a, b, n) in zip(starts, ends, sizes):
        out += _huf_decode_stream(d[a:b], table, max_bits, n)
    return bytes(out), end


def _seq_table(d: bytes, pos: int, mode: int, max_sym: int, defaults,
               def_al: int, repeat: dict, key: str):
    """One of LL/OF/ML decoding tables per the compression-modes
    byte (RFC 3.1.1.3.2.1)."""
    if mode == 0:
        tab = _fse_build(list(defaults), def_al)
        repeat[key] = (tab, def_al)
        return tab, def_al, pos
    if mode == 1:  # RLE: single symbol, 0 bits
        if pos >= len(d):
            raise ValueError("zstd: truncated RLE sequence table")
        sym = d[pos]
        if sym > max_sym:
            raise ValueError(f"zstd: RLE symbol {sym} > {max_sym}")
        tab = [(sym, 0, 0)]
        repeat[key] = (tab, 0)
        return tab, 0, pos + 1
    if mode == 2:
        probs, al, p2 = _fse_read_table(d, pos, max_sym)
        if len(probs) - 1 > max_sym:
            raise ValueError("zstd: sequence table symbol overflow")
        tab = _fse_build(probs, al)
        repeat[key] = (tab, al)
        return tab, al, p2
    if key not in repeat:
        raise ValueError("zstd: repeat mode with no previous table")
    tab, al = repeat[key]
    return tab, al, pos


def _decode_block(d: bytes, out: bytearray, huf_state: dict,
                  repeat_tables: dict, rep_offsets: list,
                  max_out: int):
    """Compressed-block body (RFC 3.1.1.3): literals + sequences."""
    lits, pos = _decode_literals(d, 0, huf_state)
    if pos >= len(d):
        raise ValueError("zstd: missing sequences section")
    b0 = d[pos]
    pos += 1
    if b0 == 0:
        nseq = 0
    elif b0 < 128:
        nseq = b0
    elif b0 < 255:
        if pos >= len(d):
            raise ValueError("zstd: truncated sequence count")
        nseq = ((b0 - 128) << 8) + d[pos]
        pos += 1
    else:
        if pos + 2 > len(d):
            raise ValueError("zstd: truncated sequence count")
        nseq = d[pos] + (d[pos + 1] << 8) + 0x7F00
        pos += 2
    if nseq == 0:
        if len(out) + len(lits) > max_out:
            raise ValueError("zstd: output exceeds declared size")
        out += lits
        return
    if pos >= len(d):
        raise ValueError("zstd: missing compression modes")
    modes = d[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved compression-mode bits set")
    ll_tab, ll_al, pos = _seq_table(d, pos, (modes >> 6) & 3, 35,
                                    _LL_DEFAULTS, 6, repeat_tables,
                                    "ll")
    of_tab, of_al, pos = _seq_table(d, pos, (modes >> 4) & 3, 31,
                                    _OF_DEFAULTS, 5, repeat_tables,
                                    "of")
    ml_tab, ml_al, pos = _seq_table(d, pos, (modes >> 2) & 3, 52,
                                    _ML_DEFAULTS, 6, repeat_tables,
                                    "ml")
    br = _BackBits(d[pos:])
    ll_st = br.read(ll_al)
    of_st = br.read(of_al)
    ml_st = br.read(ml_al)
    lit_pos = 0
    for i in range(nseq):
        of_sym = of_tab[of_st][0]
        ml_sym = ml_tab[ml_st][0]
        ll_sym = ll_tab[ll_st][0]
        if of_sym > 31:
            raise ValueError(f"zstd: offset code {of_sym} > 31")
        if ml_sym > 52 or ll_sym > 35:
            raise ValueError("zstd: sequence symbol out of range")
        ofv = (1 << of_sym) + br.read(of_sym)
        ml = _ML_BASE[ml_sym] + br.read(_ML_BITS[ml_sym])
        ll = _LL_BASE[ll_sym] + br.read(_LL_BITS[ll_sym])
        if br.overflowed:
            raise ValueError("zstd: sequence bitstream exhausted")
        # repeat-offset resolution (RFC 3.1.1.3.2.1.1)
        if ofv > 3:
            offset = ofv - 3
            rep_offsets[2] = rep_offsets[1]
            rep_offsets[1] = rep_offsets[0]
            rep_offsets[0] = offset
        else:
            idx = ofv - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep_offsets[0]
            elif idx < 3:
                offset = rep_offsets[idx]
                rep_offsets[idx] = rep_offsets[0]  # swap toward front
                if idx == 2:
                    rep_offsets[2] = rep_offsets[1]
                    rep_offsets[1] = rep_offsets[0]
                rep_offsets[0] = offset
            else:  # ll == 0 and ofv == 3: previous offset minus one
                offset = rep_offsets[0] - 1
                if offset == 0:
                    raise ValueError("zstd: repeat offset underflow")
                rep_offsets[2] = rep_offsets[1]
                rep_offsets[1] = rep_offsets[0]
                rep_offsets[0] = offset
        if lit_pos + ll > len(lits):
            raise ValueError("zstd: literal run exceeds literals")
        if len(out) + ll + ml > max_out:
            raise ValueError("zstd: output exceeds declared size")
        out += lits[lit_pos:lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ValueError("zstd: match offset exceeds window")
        if offset >= ml:
            start = len(out) - offset
            out += out[start:start + ml]
        else:
            start = len(out) - offset
            for k in range(ml):
                out.append(out[start + k])
        if i != nseq - 1:
            ll_st = ll_tab[ll_st][2] + br.read(ll_tab[ll_st][1])
            ml_st = ml_tab[ml_st][2] + br.read(ml_tab[ml_st][1])
            of_st = of_tab[of_st][2] + br.read(of_tab[of_st][1])
            if br.overflowed:
                raise ValueError("zstd: sequence bitstream exhausted")
    rest = lits[lit_pos:]
    if len(out) + len(rest) > max_out:
        raise ValueError("zstd: output exceeds declared size")
    out += rest


def xxh64(data: bytes, seed: int = 0) -> int:
    """xxHash64 (public algorithm; frame content checksums)."""
    P1 = 0x9E3779B185EBCA87
    P2 = 0xC2B2AE3D27D4EB4F
    P3 = 0x165667B19E3779F9
    P4 = 0x85EBCA77C2B2AE63
    P5 = 0x27D4EB2F165667C5
    M = 0xFFFFFFFFFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i + 32 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8],
                                      "little")
                v = (v + lane * P2) & M
                v = (rotl(v, 31) * P1) & M
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12)
             + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            v = (rotl((v * P2) & M, 31) * P1) & M
            h = ((h ^ v) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        lane = int.from_bytes(data[i:i + 8], "little")
        h ^= (rotl((lane * P2) & M, 31) * P1) & M
        h = (rotl(h, 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i:i + 4], "little")
        h ^= (lane * P1) & M
        h = (rotl(h, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def zstd_decompress(data: bytes, max_out: int = 1 << 28) -> bytes:
    """Decode one or more concatenated zstd frames; skippable frames
    are skipped. ``max_out`` bounds the total output (untrusted
    headers must not drive allocations — the fuzz contract shared by
    every chunk decoder here)."""
    out_all = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("zstd: truncated frame magic")
        magic = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        if _SKIP_LO <= magic <= _SKIP_HI:
            if pos + 4 > n:
                raise ValueError("zstd: truncated skippable frame")
            sz = struct.unpack_from("<I", data, pos)[0]
            pos += 4 + sz
            if pos > n:
                raise ValueError("zstd: skippable frame overruns")
            continue
        if magic != _MAGIC:
            raise ValueError(f"zstd: bad magic {magic:#010x}")
        if pos >= n:
            raise ValueError("zstd: missing frame header")
        fhd = data[pos]
        pos += 1
        fcs_flag = fhd >> 6
        single_seg = (fhd >> 5) & 1
        checksum = (fhd >> 2) & 1
        if (fhd >> 3) & 1:
            raise ValueError("zstd: reserved frame-header bit set")
        did_flag = fhd & 3
        window = None
        if not single_seg:
            if pos >= n:
                raise ValueError("zstd: missing window descriptor")
            wd = data[pos]
            pos += 1
            exp = 10 + (wd >> 3)
            base = 1 << exp
            window = base + (base >> 3) * (wd & 7)
        did_size = (0, 1, 2, 4)[did_flag]
        if did_size:
            if pos + did_size > n:
                raise ValueError("zstd: truncated dictionary id")
            did = int.from_bytes(data[pos:pos + did_size], "little")
            pos += did_size
            if did:
                raise NotImplementedError(
                    f"zstd: dictionary {did} required — dictionary "
                    "frames are outside the HDF5 filter contract")
        fcs = None
        fcs_size = (1 if single_seg else 0, 2, 4, 8)[fcs_flag]
        if fcs_size:
            if pos + fcs_size > n:
                raise ValueError("zstd: truncated content size")
            fcs = int.from_bytes(data[pos:pos + fcs_size], "little")
            if fcs_size == 2:
                fcs += 256
            pos += fcs_size
        if fcs is not None and fcs > max_out - len(out_all):
            raise ValueError(
                f"zstd: declared content size {fcs} exceeds bound "
                f"{max_out - len(out_all)}")
        bound = (len(out_all) + fcs if fcs is not None else max_out)
        out = out_all
        frame_start = len(out)
        huf_state: dict = {}
        repeat_tables: dict = {}
        rep_offsets = [1, 4, 8]
        while True:
            if pos + 3 > n:
                raise ValueError("zstd: truncated block header")
            bh = (data[pos] | (data[pos + 1] << 8)
                  | (data[pos + 2] << 16))
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            if btype == 0:  # raw
                if pos + bsize > n:
                    raise ValueError("zstd: truncated raw block")
                if len(out) + bsize > bound:
                    raise ValueError("zstd: output exceeds bound")
                out += data[pos:pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE
                if pos >= n:
                    raise ValueError("zstd: truncated RLE block")
                if len(out) + bsize > bound:
                    raise ValueError("zstd: output exceeds bound")
                out += bytes([data[pos]]) * bsize
                pos += 1
            elif btype == 2:
                if bsize > (1 << 21):
                    raise ValueError(
                        f"zstd: block size {bsize} exceeds format "
                        "maximum")
                if pos + bsize > n:
                    raise ValueError("zstd: truncated block")
                _decode_block(data[pos:pos + bsize], out, huf_state,
                              repeat_tables, rep_offsets, bound)
                pos += bsize
            else:
                raise ValueError("zstd: reserved block type")
            if last:
                break
        if fcs is not None and len(out) - frame_start != fcs:
            raise ValueError(
                f"zstd: frame decoded {len(out) - frame_start} bytes,"
                f" header declared {fcs}")
        if checksum:
            if pos + 4 > n:
                raise ValueError("zstd: truncated content checksum")
            want = struct.unpack_from("<I", data, pos)[0]
            pos += 4
            got = xxh64(bytes(out[frame_start:])) & 0xFFFFFFFF
            if got != want:
                raise ValueError(
                    f"zstd: content checksum mismatch (stored "
                    f"{want:#010x}, computed {got:#010x})")
    return bytes(out_all)


def zstd_compress_store(data: bytes, checksum: bool = True) -> bytes:
    """A valid zstd frame using raw blocks only (store mode) — the
    writer twin for the HDF5 filter: readable by any conforming
    decoder including the reference CLI."""
    out = bytearray()
    out += struct.pack("<I", _MAGIC)
    n = len(data)
    # single-segment, FCS present
    if n < 256 and n > 0:
        fhd = 0x20 | (4 if checksum else 0)  # fcs_flag=0 + single_seg
        out.append(fhd)
        out.append(n)
    else:
        fhd = 0xA0 | (4 if checksum else 0)  # fcs_flag=2 + single_seg
        out.append(fhd)
        out += struct.pack("<I", n)
    maxblk = 1 << 17  # Block_Maximum_Size: min(window, 128 KB)
    if n == 0:
        out += struct.pack("<I", 1)[:3]  # last, raw, size 0
    else:
        off = 0
        while off < n:
            take = min(maxblk, n - off)
            last = 1 if off + take == n else 0
            bh = last | (take << 3)
            out += struct.pack("<I", bh)[:3]
            out += data[off:off + take]
            off += take
    if checksum:
        out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)


def h5_zstd_decode(data: bytes, max_out: int) -> bytes:
    """HDF5 filter 32015: the chunk payload is a plain zstd frame."""
    return zstd_decompress(data, max_out)
