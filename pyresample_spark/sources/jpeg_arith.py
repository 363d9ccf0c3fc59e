"""Arithmetic-coded JPEG entropy layer (ITU-T T.81 Annex D/F/G).

Implements the QM arithmetic coder and the DCT-process statistical
models so SOF9 (arithmetic sequential) and SOF10 (arithmetic
progressive) streams decode natively, plus the encoder twins used by
the fixture/round-trip tests. The reference engine (pyresample)
outsources all raster decoding to rasterio/GDAL; this module exists
so granule ingest has no native-library dependency, same as the
Huffman paths in ``jpeg.py``.

Layout of the machinery, with the defining spec sections:

- ``_QE``: the probability-estimation state machine, T.81 Table D.3
  (113 adaptive states) plus the fixed S=0.5 state libjpeg calls the
  "fixed bin" (index 113) used for AC sign and refinement decisions
  where T.81 F.1.4.3.1 prescribes a non-adaptive estimate.
- ``_QMDecoder`` / ``_QMEncoder``: Annex D.2 / D.1 register
  procedures (INITDEC/DECODE/BYTEIN, INITENC/CODE/BYTEOUT/FLUSH)
  with the software conventions of D.2.7: byte stuffing 0xFF 0x00,
  zero bytes fed once the terminating marker is reached.
- DC / AC condition models: T.81 F.2.4 (sequential decode),
  F.1.4 (encode), G.1/G.2 (progressive), with conditioning bounds
  L/U (DC) and Kx (AC) from the DAC marker (B.2.4.3).

Statistics bins are held as one byte per context: low 7 bits the
state index, top bit the MPS sense — reset to zero at scan start and
at every restart marker (T.81 E.2.4).

Cross-validation: tests/fixtures/jpeg_thirdparty/ holds streams
produced by libjpeg-turbo's independent implementation together with
its exact quantized-coefficient dumps (jpeg_read_coefficients), so
both the state machine and the bitstream conventions here are checked
against a second implementation, not just round-tripped.
"""
from __future__ import annotations

import struct

import numpy as np

# T.81 Table D.3: (Qe, next-index after LPS, next-index after MPS,
# switch-MPS flag). Index 113 is the non-adaptive 0.5 estimate.
_QE = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
    # index 113: fixed 0.5 estimate — transitions to itself, never
    # switches, so sign/refinement decisions stay non-adaptive
    (0x5A1D, 113, 113, 0),
)

_FIXED = bytearray([113])  # shared fixed-estimate context (read-only use)


class _QMDecoder:
    """T.81 D.2 decoder over pre-split, unstuffed entropy segments.

    ``segs`` is the ``_BitReader``-format segment list: tuples of
    (clean bytes, raw start, terminating marker byte, marker pos).
    Past the end of a segment the decoder feeds zero bytes — the
    marker-reached convention of D.2.7 (the encoder's FLUSH
    guarantees the fed values are never significant).
    """

    __slots__ = ("_segs", "_si", "_buf", "_bp", "_mbyte", "_mpos",
                 "a", "c", "ct")

    def __init__(self, segs):
        self._segs = segs
        self._load(0)

    def _load(self, si: int):
        self._si = si
        buf, _raw0, mbyte, mpos = self._segs[si]
        self._buf, self._mbyte, self._mpos = buf, mbyte, mpos
        # INITDEC (Fig. D.14, software conventions)
        n = len(buf)
        b0 = buf[0] if n else 0
        b1 = buf[1] if n > 1 else 0
        # two full bytes land in Chigh so the first comparison spans
        # the whole 16-bit interval; CT=0 forces a BYTEIN on the
        # first renormalization
        self.c = (b0 << 24) | (b1 << 16)
        self._bp = 2
        self.ct = 0
        self.a = 0x10000

    def _bytein(self):
        bp = self._bp
        if bp < len(self._buf):
            self.c += self._buf[bp] << 8
            self._bp = bp + 1
        # else: marker reached — feed a zero byte
        self.ct = 8

    def decode(self, stats: bytearray, k: int) -> int:
        sv = stats[k]
        qe, nlps, nmps, sw = _QE[sv & 0x7F]
        mps = sv >> 7
        a = self.a - qe
        if (self.c >> 16) < a:
            # bottom sub-interval (size A - Qe): MPS unless exchanged
            if a & 0x8000:  # fast MPS path: no renorm, no estimation
                self.a = a
                return mps
            if a < qe:  # conditional exchange
                d = mps ^ 1
                stats[k] = nlps | ((mps ^ sw) << 7)
            else:
                d = mps
                stats[k] = nmps | (mps << 7)
        else:
            # upper sub-interval (size Qe): LPS unless exchanged
            self.c -= a << 16
            if a < qe:
                d = mps
                stats[k] = nmps | (mps << 7)
            else:
                d = mps ^ 1
                stats[k] = nlps | ((mps ^ sw) << 7)
            a = qe
        # RENORMD (Fig. D.18)
        c, ct = self.c, self.ct
        buf, bp, n = self._buf, self._bp, len(self._buf)
        while True:
            if ct == 0:
                if bp < n:
                    c += buf[bp] << 8
                    bp += 1
                ct = 8
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            a <<= 1
            if a & 0x8000:
                break
        self.a, self.c, self.ct, self._bp = a, c, ct, bp
        return d

    def restart(self, n: int):
        """Advance to the next restart segment; the caller resets all
        statistics areas (T.81 E.2.4)."""
        mb = self._mbyte
        if mb != 0xD0 + (n & 7):
            got = "" if mb is None else bytes([0xFF, mb]).hex()
            raise ValueError(
                f"expected restart marker RST{n & 7}, got 0x{got}"
            )
        self._load(self._si + 1)

    @property
    def end_pos(self) -> int:
        """Raw-stream offset of the marker terminating the current
        segment (buffer end when the stream is truncated)."""
        return self._mpos


class _QMEncoder:
    """T.81 D.1 encoder producing one entropy-coded segment."""

    __slots__ = ("a", "c", "ct", "_b", "_st", "out")

    def __init__(self):
        # INITENC (Fig. D.10)
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self._b = None  # pending output byte (None before the first)
        self._st = 0    # count of stacked 0xFF bytes
        self.out = bytearray()

    def _emit(self, b: int):
        self.out.append(b)
        if b == 0xFF:  # byte stuffing (B.1.1.5)
            self.out.append(0x00)

    def _byteout(self):
        # Fig. D.5 with the stacked-0xFF convention of D.1.8
        t = self.c >> 19
        if t > 0xFF:
            if self._b is None:
                raise ValueError("arithmetic carry out of stream start")
            self._emit(self._b + 1)  # propagate carry
            for _ in range(self._st):
                self._emit(0x00)  # stacked 0xFFs carried to 0x00
            self._st = 0
            self._b = t & 0xFF
        elif t == 0xFF:
            self._st += 1  # stack: a later carry may still ripple
        else:
            if self._b is not None:
                self._emit(self._b)
            for _ in range(self._st):
                self._emit(0xFF)
            self._st = 0
            self._b = t
        self.c &= 0x7FFFF
        self.ct = 8

    def encode(self, stats: bytearray, k: int, val: int):
        sv = stats[k]
        qe, nlps, nmps, sw = _QE[sv & 0x7F]
        mps = sv >> 7
        a = self.a - qe
        if val == mps:
            if a & 0x8000:  # fast path: no renorm, no estimation
                self.a = a
                return
            if a < qe:  # conditional exchange (CODEMPS): MPS takes
                self.c += a  # the upper (larger, Qe-sized) interval
                a = qe
            stats[k] = nmps | (mps << 7)
        else:
            if a >= qe:  # LPS takes the upper interval unless
                self.c += a  # exchanged (CODELPS)
                a = qe
            stats[k] = nlps | ((mps ^ sw) << 7)
        # RENORME (Fig. D.7)
        while True:
            a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if a & 0x8000:
                break
        self.a = a

    def flush(self) -> bytes:
        # CLEARBITS + FINALWRITES (Figs. D.8/D.9)
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self._b is not None:
            self._emit(self._b)
        for _ in range(self._st):
            self._emit(0xFF)
        self._st = 0
        self._b = None
        # trailing stuffed-zero pairs are significant; lone trailing
        # zeros could legally be dropped (D.1.8) but are kept — the
        # decoder zero-feeds either way
        return bytes(self.out)


class _ArithStats:
    """Per-scan statistics areas + conditioning (reset at restarts)."""

    def __init__(self, state: dict, comps, scan):
        self.dc_cond = {}   # table -> (L, U)
        self.ac_cond = {}   # table -> Kx
        self.dc_stats = {}  # table -> bytearray(64)
        self.ac_stats = {}  # table -> bytearray(256)
        cond = state.get("arith_cond", {})
        for s in scan:
            td, ta = s["td"], s["ta"]
            self.dc_cond[td] = cond.get(("dc", td), (0, 1))
            self.ac_cond[ta] = cond.get(("ac", ta), 5)
        self.reset()
        self.last_dc = {c["id"]: 0 for c in comps}
        self.dc_context = {c["id"]: 0 for c in comps}

    def reset(self):
        # zero IN PLACE: scan drivers hold direct references to the
        # bytearrays, so a rebuild would silently miss the reset
        for td in self.dc_cond:
            if td in self.dc_stats:
                self.dc_stats[td][:] = bytes(64)
            else:
                self.dc_stats[td] = bytearray(64)
        for ta in self.ac_cond:
            if ta in self.ac_stats:
                self.ac_stats[ta][:] = bytes(256)
            else:
                self.ac_stats[ta] = bytearray(256)
        if hasattr(self, "last_dc"):
            for k in self.last_dc:
                self.last_dc[k] = 0
                self.dc_context[k] = 0


def _decode_dc_diff(dec, stats, st0: int, L: int, U: int) -> tuple:
    """Decode one DC difference (T.81 F.2.4.1/F.2.4.3). Returns
    (diff, new_context): new_context classifies the diff for the next
    block's conditioning (F.1.4.4.1.2)."""
    if dec.decode(stats, st0) == 0:
        return 0, 0
    sign = dec.decode(stats, st0 + 1)
    st = st0 + 2 + sign
    m = dec.decode(stats, st)
    if m:
        st = 20  # magnitude-category bins X1.. (Table F.4)
        while dec.decode(stats, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            st += 1
    if m < (1 << L) >> 1:
        ctx = 0
    elif m > (1 << U) >> 1:
        ctx = 12 + sign * 4
    else:
        ctx = 4 + sign * 4
    v = m
    st += 14  # magnitude-bit bins M.. (Table F.4)
    while m > 1:
        m >>= 1
        if dec.decode(stats, st):
            v |= m
    v += 1
    return (-v if sign else v), ctx


def _decode_ac_coefs(dec, stats, blk, ss: int, se: int, kx: int,
                     al: int, zigzag) -> None:
    """Decode the AC band Ss..Se of one block (T.81 F.2.4.2/G.2.3),
    scaled by 1 << Al (0 for sequential)."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(stats, st):
            return  # EOB
        while dec.decode(stats, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC run past band end")
        sign = dec.decode(_FIXED, 0)
        st += 2
        m = dec.decode(stats, st)
        if m:
            if dec.decode(stats, st):
                m = 2
                st = 189 if k <= kx else 217  # X2.. (Table F.5)
                while dec.decode(stats, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "arithmetic AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        while m > 1:
            m >>= 1
            if dec.decode(stats, st):
                v |= m
        v += 1
        blk[zigzag[k]] = (-(v << al)) if sign else (v << al)
        k += 1


def _encode_dc_diff(enc, stats, st0: int, L: int, U: int,
                    diff: int) -> int:
    """Encode one DC difference (T.81 F.1.4.1/F.1.4.3); returns the
    next block's conditioning context."""
    if diff == 0:
        enc.encode(stats, st0, 0)
        return 0
    enc.encode(stats, st0, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(stats, st0 + 1, sign)
    sz = (-diff if sign else diff) - 1
    st = st0 + 2 + sign
    if sz == 0:
        enc.encode(stats, st, 0)
        m = 0
    else:
        enc.encode(stats, st, 1)
        m = 1
        st = 20
        while sz >= (m << 1):
            enc.encode(stats, st, 1)
            m <<= 1
            if m == 0x8000:
                raise ValueError("DC difference too large to encode")
            st += 1
        enc.encode(stats, st, 0)
    if m < (1 << L) >> 1:
        ctx = 0
    elif m > (1 << U) >> 1:
        ctx = 12 + sign * 4
    else:
        ctx = 4 + sign * 4
    st += 14
    bit = m >> 1
    while bit:
        enc.encode(stats, st, 1 if sz & bit else 0)
        bit >>= 1
    return ctx


def _encode_ac_coefs(enc, stats, blk, ss: int, se: int, kx: int,
                     al: int, zigzag) -> None:
    """Encode the AC band Ss..Se of one block (T.81 F.1.4.2/G.1.3.3),
    values pre-shifted down by Al by the caller's convention (al is
    applied here, mirroring the decoder)."""
    ke = se
    while ke >= ss and (blk[zigzag[ke]] >> al if blk[zigzag[ke]] >= 0
                        else -((-blk[zigzag[ke]]) >> al)) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(stats, st, 0)  # not EOB
        v = blk[zigzag[k]]
        v = (v >> al) if v >= 0 else -((-v) >> al)
        while v == 0:
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
            v = blk[zigzag[k]]
            v = (v >> al) if v >= 0 else -((-v) >> al)
        enc.encode(stats, st + 1, 1)
        sign = 1 if v < 0 else 0
        enc.encode(_FIXED, 0, sign)
        sz = (-v if sign else v) - 1
        st += 2
        if sz == 0:
            enc.encode(stats, st, 0)
        else:
            enc.encode(stats, st, 1)
            if sz == 1:
                enc.encode(stats, st, 0)
            else:
                enc.encode(stats, st, 1)
                m = 2
                st = 189 if k <= kx else 217
                while sz >= (m << 1):
                    enc.encode(stats, st, 1)
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("AC value too large to encode")
                    st += 1
                enc.encode(stats, st, 0)
                st += 14
                bit = m >> 1
                while bit:
                    enc.encode(stats, st, 1 if sz & bit else 0)
                    bit >>= 1
                k += 1
                continue
        # sz in {0, 1}: magnitude bins hold no further bits
        k += 1
    if ke < se:
        st = 3 * (k - 1)
        enc.encode(stats, st, 1)  # EOB


def _refine_ac_coefs(dec, stats, blk, ss: int, se: int, p1: int,
                     m1: int, zigzag) -> None:
    """Decode one block of an AC successive-approximation refinement
    scan (T.81 G.2.3): correction bits for known-nonzero
    coefficients, newly-nonzero insertions at +-p1, EOB decisions
    only beyond the previous stages' last nonzero index."""
    kex = se
    while kex >= ss and blk[zigzag[kex]] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(stats, st):
            return  # EOB
        while True:
            zz = zigzag[k]
            v = blk[zz]
            if v:
                if dec.decode(stats, st + 2):
                    blk[zz] = v + (m1 if v < 0 else p1)
                break
            if dec.decode(stats, st + 1):
                blk[zz] = m1 if dec.decode(_FIXED, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError(
                    "arithmetic AC refinement past band end")
        k += 1


def _refine_ac_encode(enc, stats, blk, prev, ss: int, se: int,
                      p1_prev: int, zigzag) -> None:
    """Encoder twin of :func:`_refine_ac_coefs`. ``prev`` holds the
    block as the decoder knew it before this scan (coefficients
    scaled by the previous point transform); ``blk`` the target
    values at the current precision."""
    kex = se
    while kex >= ss and prev[zigzag[kex]] == 0:
        kex -= 1
    ke = se
    while ke >= ss and blk[zigzag[ke]] == 0 and prev[zigzag[ke]] == 0:
        ke -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if k > ke:
                enc.encode(stats, st, 1)  # EOB
                return
            enc.encode(stats, st, 0)
        while True:
            zz = zigzag[k]
            pv = prev[zz]
            if pv:
                enc.encode(stats, st + 2, 1 if blk[zz] != pv else 0)
                break
            nv = blk[zz]
            if nv:
                enc.encode(stats, st + 1, 1)
                enc.encode(_FIXED, 0, 1 if nv < 0 else 0)
                break
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
            if k > se:
                raise ValueError(
                    "refinement encoder ran past band end")
        k += 1


# ---------------------------------------------------------------------------
# Scan drivers (called from jpeg.py's frame dispatch)
# ---------------------------------------------------------------------------


def decode_sequential_into(state, data: bytes, pos: int, order,
                           coefs, mcux: int, mcuy: int) -> int:
    """Fill per-component coefficient arrays from an SOF9 scan's
    entropy data; returns the raw offset of the terminating marker.
    ``order`` lists (component, dc-conditioning-slot,
    ac-conditioning-slot) in scan order."""
    from .jpeg import ZIGZAG, _BitReader

    fr = state["frame"]
    scan = state["scan"]
    segs = _BitReader(data, pos)._segs
    dec = _QMDecoder(segs)
    stats = _ArithStats(state, fr["comps"], scan)
    dri = state["dri"]
    rst = 0
    for mi in range(mcux * mcuy):
        if dri and mi and mi % dri == 0:
            dec.restart(rst)
            rst = (rst + 1) & 7
            stats.reset()
        my, mx = divmod(mi, mcux)
        for c, td, ta in order:
            cid = c["id"]
            dcs = stats.dc_stats[td]
            acs = stats.ac_stats[ta]
            L, U = stats.dc_cond[td]
            kx = stats.ac_cond[ta]
            for byi in range(c["v"]):
                for bxi in range(c["h"]):
                    blk = coefs[cid][my * c["v"] + byi,
                                     mx * c["h"] + bxi]
                    diff, ctx = _decode_dc_diff(
                        dec, dcs, stats.dc_context[cid], L, U)
                    stats.dc_context[cid] = ctx
                    stats.last_dc[cid] += diff
                    blk[0] = stats.last_dc[cid]
                    _decode_ac_coefs(dec, acs, blk, 1, 63, kx, 0,
                                     ZIGZAG)
    return dec.end_pos


def decode_progressive_scan_arith(state, data: bytes, pos: int,
                                  coefs, nbdims, order, mcux: int,
                                  mcuy: int) -> int:
    """Decode one SOF10 scan's entropy data (validation — scan
    ordering, successive-approximation bookkeeping — already done by
    the caller, shared with the Huffman path). ``order`` lists the
    scan's (component, td, ta); returns the terminating-marker
    offset."""
    from .jpeg import ZIGZAG, _BitReader

    fr = state["frame"]
    scan = state["scan"]
    ss, se = state["scan_ss"], state["scan_se"]
    ah, al = state["scan_ah"], state["scan_al"]
    ns = len(scan)
    dri = state["dri"]
    segs = _BitReader(data, pos)._segs
    dec = _QMDecoder(segs)
    stats = _ArithStats(state, fr["comps"], scan)
    rst = 0
    if ss == 0:  # DC scan (interleaved allowed)
        if ns > 1:
            nunits = mcux * mcuy
        else:
            nbh, nbw = nbdims[order[0][0]["id"]]
            nunits = nbh * nbw
        for ui in range(nunits):
            if dri and ui and ui % dri == 0:
                dec.restart(rst)
                rst = (rst + 1) & 7
                stats.reset()
            for c, td, _ta in order:
                cid = c["id"]
                if ns > 1:
                    my, mx = divmod(ui, mcux)
                    units = [(my * c["v"] + byi, mx * c["h"] + bxi)
                             for byi in range(c["v"])
                             for bxi in range(c["h"])]
                else:
                    nbh, nbw = nbdims[cid]
                    units = [divmod(ui, nbw)]
                for by, bx in units:
                    blk = coefs[cid][by, bx]
                    if ah == 0:
                        dcs = stats.dc_stats[td]
                        L, U = stats.dc_cond[td]
                        diff, ctx = _decode_dc_diff(
                            dec, dcs, stats.dc_context[cid], L, U)
                        stats.dc_context[cid] = ctx
                        stats.last_dc[cid] += diff
                        blk[0] = stats.last_dc[cid] << al
                    else:  # DC refinement: one fixed-estimate bit
                        if dec.decode(_FIXED, 0):
                            blk[0] |= 1 << al
    else:  # AC scan (single component)
        c, _td, ta = order[0]
        cid = c["id"]
        acs = stats.ac_stats[ta]
        kx = stats.ac_cond[ta]
        nbh, nbw = nbdims[cid]
        co = coefs[cid]
        p1, m1 = 1 << al, -(1 << al)
        for ui in range(nbh * nbw):
            if dri and ui and ui % dri == 0:
                dec.restart(rst)
                rst = (rst + 1) & 7
                stats.reset()
            by, bx = divmod(ui, nbw)
            blk = co[by, bx]
            if ah == 0:
                _decode_ac_coefs(dec, acs, blk, ss, se, kx, al,
                                 ZIGZAG)
            else:
                _refine_ac_coefs(dec, acs, blk, ss, se, p1, m1,
                                 ZIGZAG)
    return dec.end_pos


# ---------------------------------------------------------------------------
# Encoder twins (fixture generation + round-trip tests)
# ---------------------------------------------------------------------------


def _dac_segment(slots_dc, slots_ac, cond) -> bytes:
    """DAC marker segment for the used conditioning slots
    (T.81 B.2.4.3); emitted even for default conditioning, matching
    libjpeg-turbo's encoder."""
    body = bytearray()
    for tb in sorted(slots_dc):
        low, up = cond.get(("dc", tb), (0, 1))
        if not 0 <= low <= up <= 15:
            raise ValueError(f"DC conditioning L={low} U={up} invalid")
        body += bytes([tb, (up << 4) | low])
    for tb in sorted(slots_ac):
        kx = cond.get(("ac", tb), 5)
        if not 1 <= kx <= 63:
            raise ValueError(f"AC conditioning Kx={kx} outside 1..63")
        body += bytes([0x10 | tb, kx])
    return b"\xff\xcc" + struct.pack(">H", 2 + len(body)) + bytes(body)


class _EncStats:
    """Encoder-side statistics areas keyed by conditioning slot."""

    def __init__(self, slots_dc, slots_ac, cond, ncomp):
        self.cond = cond
        self.slots_dc = set(slots_dc)
        self.slots_ac = set(slots_ac)
        self.ncomp = ncomp
        self.reset()

    def reset(self):
        self.dc = {tb: bytearray(64) for tb in self.slots_dc}
        self.ac = {tb: bytearray(256) for tb in self.slots_ac}
        self.last_dc = [0] * self.ncomp
        self.dc_ctx = [0] * self.ncomp


def _encode_scan_arith(coefs, nbdims, samp, mcux, mcuy, comp_idx,
                       slot_of, cond, ss, se, ah, al, dri) -> bytes:
    """Entropy-encode one scan (sequential: ss=0, se=63, ah=al=0 over
    interleaved MCUs; progressive: any T.81 G.1 scan kind), restart
    markers included. Mirrors the decoder drivers bin for bin."""
    from .jpeg import ZIGZAG

    interleaved = len(comp_idx) > 1
    sequential = se == 63 and ss == 0
    st = _EncStats([slot_of[ci] for ci in comp_idx],
                   [slot_of[ci] for ci in comp_idx], cond,
                   len(coefs))
    out = bytearray()
    enc = _QMEncoder()
    rsti = 0

    def unit_blocks(ci, ui):
        hs, vs = samp[ci]
        if interleaved or sequential:
            my, mx = divmod(ui, mcux)
            return [(my * vs + byi, mx * hs + bxi)
                    for byi in range(vs) for bxi in range(hs)]
        nbh, nbw = nbdims[ci]
        return [divmod(ui, nbw)]

    if interleaved or sequential:
        nunits = mcux * mcuy
    else:
        nbh, nbw = nbdims[comp_idx[0]]
        nunits = nbh * nbw

    for ui in range(nunits):
        if dri and ui and ui % dri == 0:
            out += enc.flush()
            out += bytes([0xFF, 0xD0 + rsti])
            rsti = (rsti + 1) & 7
            enc = _QMEncoder()
            st.reset()
        for ci in comp_idx:
            sl = slot_of[ci]
            low, up = cond.get(("dc", sl), (0, 1))
            kx = cond.get(("ac", sl), 5)
            for by, bx in unit_blocks(ci, ui):
                blk = coefs[ci][by, bx]
                if sequential:
                    v = int(blk[0])
                    diff = v - st.last_dc[ci]
                    st.last_dc[ci] = v
                    st.dc_ctx[ci] = _encode_dc_diff(
                        enc, st.dc[sl], st.dc_ctx[ci], low, up, diff)
                    _encode_ac_coefs(enc, st.ac[sl], blk, 1, 63, kx,
                                     0, ZIGZAG)
                elif ss == 0 and ah == 0:  # DC first
                    v = int(blk[0]) >> al
                    diff = v - st.last_dc[ci]
                    st.last_dc[ci] = v
                    st.dc_ctx[ci] = _encode_dc_diff(
                        enc, st.dc[sl], st.dc_ctx[ci], low, up, diff)
                elif ss == 0:  # DC refine: one fixed-estimate bit
                    enc.encode(_FIXED, 0, (int(blk[0]) >> al) & 1)
                elif ah == 0:  # AC first
                    _encode_ac_coefs(enc, st.ac[sl], blk, ss, se, kx,
                                     al, ZIGZAG)
                else:  # AC refine
                    scaled = [0] * 64
                    prev = [0] * 64
                    for k in range(ss, se + 1):
                        v = int(blk[ZIGZAG[k]])
                        mag = abs(v) >> al
                        pm = (abs(v) >> (al + 1)) << 1
                        sgn = -1 if v < 0 else 1
                        scaled[ZIGZAG[k]] = sgn * mag
                        prev[ZIGZAG[k]] = sgn * pm
                    _refine_ac_encode(enc, st.ac[sl], scaled, prev,
                                      ss, se, 1, ZIGZAG)
    out += enc.flush()
    return bytes(out)


def _assemble_arith(coefs, nbdims, samp, mcux, mcuy, h, w, q,
                    progressive, scans, restart_interval, precision,
                    cond) -> bytes:
    from .jpeg import ZIGZAG, _default_scan_script, \
        _validate_scan_script

    ncomp = len(coefs)
    slot_of = [0] + [1] * (ncomp - 1)
    cond = dict(cond or {})
    out = bytearray(b"\xff\xd8")
    zz_vals = [int(q.flat[ZIGZAG[i]]) for i in range(64)]
    pq = 1 if max(zz_vals) > 255 else 0
    zz_q = struct.pack(">64H", *zz_vals) if pq else bytes(zz_vals)
    out += (b"\xff\xdb" + struct.pack(">H", 3 + len(zz_q))
            + bytes([pq << 4]) + zz_q)
    sof = struct.pack(">BHHB", precision, h, w, ncomp)
    for ci, (hs, vs) in enumerate(samp):
        sof += struct.pack(">BBB", ci + 1, (hs << 4) | vs, 0)
    marker = b"\xff\xca" if progressive else b"\xff\xc9"
    out += marker + struct.pack(">H", 2 + len(sof)) + sof
    slots = sorted({slot_of[ci] for ci in range(ncomp)})
    out += _dac_segment(slots, slots, cond)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    if not progressive:
        scans = [(list(range(ncomp)), 0, 63, 0, 0)]
    else:
        if scans is None:
            scans = _default_scan_script(ncomp)
        _validate_scan_script(scans, ncomp)
    for comp_idx, ss, se, ah, al in scans:
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            sl = slot_of[ci]
            sos += struct.pack(">BB", ci + 1, (sl << 4) | sl)
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += _encode_scan_arith(coefs, nbdims, samp, mcux, mcuy,
                                  comp_idx, slot_of, cond, ss, se,
                                  ah, al, restart_interval)
    out += b"\xff\xd9"
    return bytes(out)


def encode_sequential_arith(arr, quant=None, subsampling: str = "444",
                            restart_interval: int = 0,
                            precision: int = 8, cond=None) -> bytes:
    """Encode u8 (h, w)/(h, w, 3) — or u16 < 4096 with
    ``precision=12`` — to an arithmetic-coded extended sequential
    (SOF9) stream. ``cond``: optional conditioning overrides
    {("dc", slot): (L, U), ("ac", slot): Kx}."""
    from .jpeg import _coef_prep

    coefs, nbdims, samp, mcux, mcuy, h, w, q = _coef_prep(
        arr, quant, subsampling, precision)
    return _assemble_arith(coefs, nbdims, samp, mcux, mcuy, h, w, q,
                           False, None, restart_interval, precision,
                           cond)


def encode_progressive_arith(arr, quant=None, subsampling: str = "444",
                             scans=None, restart_interval: int = 0,
                             precision: int = 8, cond=None) -> bytes:
    """Encode to an arithmetic-coded progressive (SOF10) stream with
    the same scan-script surface as encode_progressive_jpeg."""
    from .jpeg import _coef_prep

    coefs, nbdims, samp, mcux, mcuy, h, w, q = _coef_prep(
        arr, quant, subsampling, precision)
    return _assemble_arith(coefs, nbdims, samp, mcux, mcuy, h, w, q,
                           True, scans, restart_interval, precision,
                           cond)
