"""Baseline JPEG (ITU-T T.81) codec: pure-python decoder + encoder.

TIFF compression 7 ("new-style" JPEG, TIFF Technical Note #2) stores a
complete JPEG interchange/abbreviated stream per strip/tile, with
shared tables optionally hoisted into the JPEGTables tag (347). The
reference reads such granules through rasterio/libjpeg
(pyresample/utils/rasterio.py); this module implements the baseline
sequential DCT process natively — same discipline as the CDF/HDF5/
TIFF/NTv2 readers — so JPEG-in-TIFF quicklook/mask granules decode
with no native library (VERDICT r12 item 5: decide, don't default).

Scope (the baseline process, which is what TIFF-JPEG writers emit):

- SOF0 (baseline) and SOF1 (extended sequential Huffman) frames,
  8-bit samples — plus 12-bit samples under SOF1 (T.81 extended
  sequential, the depth archived GOES imagery ships: level shift
  2048, DC categories to 15, uint16 output) — 1 or 3 components,
  sampling factors 1 or 2 (4:4:4 / 4:2:2 / 4:2:0), interleaved
  single-scan streams.
- DQT (8- AND 16-bit precision), DHT, DRI + restart markers,
  APPn/COM skipped, abbreviated table streams (SOI tables EOI)
  merged per TechNote2 via the ``tables=`` argument.
- Lossless sequential (SOF3, T.81 Annex H — old-style TIFF
  process 14): DPCM with all 7 predictors, 2..16-bit samples, point
  transform, restart intervals; decoder + exact encoder twin.
- Progressive (SOF2) and arithmetic coding (SOF9+) raise loudly.

The encoder exists to spec-build fixtures (and to let exports embed
quicklooks): it writes 4:4:4 or 4:2:0 baseline streams with
parameterizable quantization. With an all-ones quantization table and
blockwise-constant input the DCT has a single exact-integer DC
coefficient per block, so the roundtrip is VALUE-EXACT — that is what
the ingest tests pin. Entropy tables are built canonically from the
actual symbol set (fixed-length codes, spec-legal for any decoder)
instead of reproducing the Annex K defaults.

Decoding is a per-bit python loop — fine for the strip/tile sizes the
Arrow-batched ingest feeds it (one granule per task), not a bulk
image pipeline.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# natural index of each zigzag position (T.81 Figure A.6)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_SOF_UNSUPPORTED = {
    0xC2: "progressive DCT (SOF2)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic-coded sequential (SOF9)",
    0xCA: "arithmetic-coded progressive (SOF10)",
    0xCB: "arithmetic-coded lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _dct_matrix() -> np.ndarray:
    """M[u, x] = C(u)/2 · cos((2x+1)uπ/16); IDCT is Mᵀ·S·M, FDCT is
    M·s·Mᵀ (T.81 A.3.3 normalization)."""
    m = np.empty((8, 8))
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = cu / 2.0 * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return m


_DCT = _dct_matrix()


def _build_decoder(bits, vals) -> dict:
    """Canonical Huffman assignment (T.81 C.2) → {(length, code): value}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise ValueError("DHT: BITS counts exceed HUFFVAL length")
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first entropy-coded-segment reader with byte-unstuffing
    (FF 00 → FF) and restart-marker handling."""

    __slots__ = ("b", "pos", "bit", "marker")

    def __init__(self, b: bytes, pos: int):
        self.b = b
        self.pos = pos
        self.bit = 0
        self.marker = None  # marker byte that ended the segment

    def read_bit(self) -> int:
        if self.marker is not None:
            raise ValueError(
                f"entropy data exhausted at marker 0x{self.marker:02x}"
            )
        if self.pos >= len(self.b):
            raise ValueError("truncated entropy-coded segment")
        byte = self.b[self.pos]
        if byte == 0xFF and self.bit == 0:
            nxt = self.b[self.pos + 1] if self.pos + 1 < len(self.b) else None
            if nxt is None:
                raise ValueError("truncated entropy-coded segment")
            if nxt != 0x00:
                self.marker = nxt
                raise ValueError(
                    f"entropy data exhausted at marker 0x{nxt:02x}"
                )
        out = (byte >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1 + (1 if byte == 0xFF else 0)  # skip stuffed 00
        return out

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code in entropy data")

    def receive_extend(self, t: int) -> int:
        if t == 0:
            return 0
        v = 0
        for _ in range(t):
            v = (v << 1) | self.read_bit()
        if v < (1 << (t - 1)):
            v -= (1 << t) - 1
        return v

    def restart(self, n: int):
        """Consume the byte-aligned RSTn marker (T.81 E.2.4)."""
        if self.bit:
            # discard the 1-padded remainder of the current byte; if
            # that byte is 0xFF its stuffed 0x00 follows (B.1.1.5) and
            # must be skipped too — read_bit does this at bit==8, the
            # aligned path here must match (code-review r13 finding 1)
            byte = self.b[self.pos]
            self.bit = 0
            self.pos += 1 + (1 if byte == 0xFF else 0)
        # optional 0xFF fill bytes may precede any marker (B.1.1.2)
        while (self.pos + 1 < len(self.b)
               and self.b[self.pos] == 0xFF
               and self.b[self.pos + 1] == 0xFF):
            self.pos += 1
        if (self.pos + 1 >= len(self.b)
                or self.b[self.pos] != 0xFF
                or self.b[self.pos + 1] != 0xD0 + (n & 7)):
            got = self.b[self.pos:self.pos + 2].hex()
            raise ValueError(
                f"expected restart marker RST{n & 7}, got 0x{got}"
            )
        self.pos += 2


def _parse_segments(data: bytes, state: dict, pos: int = 0):
    """Walk marker segments into ``state`` (quant/huff/dri/frame).
    Returns (pos_after, kind) where kind is 'sos' (entropy data
    follows), 'eoi', or 'end' (buffer exhausted — abbreviated table
    stream without EOI)."""
    n = len(data)
    while True:
        if pos >= n:
            return pos, "end"
        if data[pos] != 0xFF:
            raise ValueError(
                f"expected marker at byte {pos}, got 0x{data[pos]:02x}"
            )
        # any marker may be preceded by optional 0xFF fill bytes
        # (T.81 B.1.1.2) — consume them before classifying
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        m = data[pos + 1] if pos + 1 < n else None
        if m is None:
            raise ValueError("truncated marker")
        pos += 2
        if m == 0xD8:  # SOI
            continue
        if m == 0xD9:  # EOI
            return pos, "eoi"
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # TEM / stray RST
            continue
        if pos + 2 > n:
            raise ValueError("truncated segment length")
        seglen = struct.unpack_from(">H", data, pos)[0]
        if seglen < 2 or pos + seglen > n:
            raise ValueError(f"segment 0x{m:02x} length {seglen} out of bounds")
        body = data[pos + 2:pos + seglen]
        pos += seglen
        if m == 0xDB:  # DQT
            q = 0
            while q < len(body):
                pq, tq = body[q] >> 4, body[q] & 0x0F
                if pq > 1:
                    raise ValueError(f"DQT precision {pq} (0=8-bit, "
                                     "1=16-bit)")
                step = 65 + 64 * pq  # Pq=1: 16-bit entries (12-bit JPEG)
                if tq > 3 or q + step > len(body):
                    raise ValueError("corrupt DQT segment")
                tbl = np.ones(64)
                if pq:
                    vals = struct.unpack_from(">64H", body, q + 1)
                else:
                    vals = body[q + 1:q + 65]
                for i, v in enumerate(vals):
                    if v == 0:
                        raise ValueError("zero quantization value")
                    tbl[ZIGZAG[i]] = v
                state["quant"][tq] = tbl.reshape(8, 8)
                q += step
        elif m == 0xC4:  # DHT
            q = 0
            while q < len(body):
                tc, th = body[q] >> 4, body[q] & 0x0F
                if tc > 1 or th > 3 or q + 17 > len(body):
                    raise ValueError("corrupt DHT segment")
                bits = list(body[q + 1:q + 17])
                nv = sum(bits)
                if q + 17 + nv > len(body):
                    raise ValueError("DHT values out of bounds")
                vals = list(body[q + 17:q + 17 + nv])
                key = "huff_dc" if tc == 0 else "huff_ac"
                state[key][th] = _build_decoder(bits, vals)
                q += 17 + nv
        elif m == 0xDD:  # DRI
            state["dri"] = struct.unpack_from(">H", body, 0)[0]
        elif m in (0xC0, 0xC1, 0xC3):  # SOF0/SOF1/SOF3
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            lossless = m == 0xC3
            if lossless:
                # T.81 Annex H: lossless allows 2..16-bit samples
                if not 2 <= prec <= 16:
                    raise ValueError(
                        f"lossless precision {prec} outside 2..16")
            elif not (prec == 8 or (prec == 12 and m == 0xC1)):
                # T.81 Table B.2: baseline (SOF0) is 8-bit; 12-bit
                # samples are the extended sequential process (SOF1)
                # — the depth archived GOES imagery ships
                raise NotImplementedError(
                    f"{prec}-bit precision in SOF{m - 0xC0} outside "
                    "the supported subset (8-bit SOF0/SOF1, "
                    "12-bit SOF1)"
                )
            if h == 0 or w == 0:
                raise ValueError("zero frame dimension")
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component frames unsupported (1 or 3)"
                )
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                hs, vs = hv >> 4, hv & 0x0F
                if lossless and (hs != 1 or vs != 1):
                    raise NotImplementedError(
                        "subsampled lossless components outside the "
                        "subset (archived rasters are 1x1)"
                    )
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {hs}x{vs} outside the subset "
                        "(1 and 2 decode natively)"
                    )
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            state["frame"] = {"h": h, "w": w, "comps": comps,
                              "prec": prec, "lossless": lossless}
        elif m in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"{_SOF_UNSUPPORTED[m]} outside the baseline subset"
            )
        elif m == 0xDA:  # SOS
            ns = body[0]
            if state["frame"] is None:
                raise ValueError("SOS before SOF")
            if ns != len(state["frame"]["comps"]):
                raise NotImplementedError(
                    "non-interleaved multi-scan streams outside the "
                    "baseline subset"
                )
            sel = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                sel.append({"cs": cs, "td": tt >> 4, "ta": tt & 0x0F})
            state["scan"] = sel
            # spectral-selection bytes: baseline fixes them at
            # (0, 63, 0); lossless reuses Ss as the predictor
            # selector and Al as the point transform (T.81 H.1)
            state["scan_ss"] = body[1 + 2 * ns]
            state["scan_al"] = body[3 + 2 * ns] & 0x0F
            return pos, "sos"
        # APPn (E0-EF), COM (FE), others with lengths: skipped
    raise AssertionError  # unreachable


def decode_baseline_jpeg(data: bytes, tables: bytes | None = None,
                         color_transform: bool | None = None,
                         lossless_predictors=None,
                         lossless_point_transforms=None) -> np.ndarray:
    """Decode a baseline JPEG stream → u8 array (h, w) or (h, w, 3).

    ``tables``: TIFF JPEGTables content (an abbreviated SOI…EOI stream
    of DQT/DHT/DRI segments) applied first; the per-strip stream may
    override. ``color_transform``: force (True) or suppress (False)
    the YCbCr→RGB step for 3-component frames; default True (the JFIF
    convention; TIFF photometric 2 passes False for RGB-stored scans).
    ``lossless_predictors`` / ``lossless_point_transforms``: optional
    per-component sequences overriding the scan header's single Ss/Al
    for SOF3 scans — old-style TIFF tags 517/518 are per-component
    (TIFF 6.0 §22), which one scan header cannot express.
    """
    state = {"quant": {}, "huff_dc": {}, "huff_ac": {}, "dri": 0,
             "frame": None, "scan": None,
             "ll_pred_overrides": (list(lossless_predictors)
                                   if lossless_predictors else None),
             "ll_pt_overrides": (list(lossless_point_transforms)
                                 if lossless_point_transforms else None)}
    if tables is not None:
        _parse_segments(tables, state)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos, kind = _parse_segments(data, state)
    if kind != "sos":
        raise ValueError("JPEG stream has no scan (SOS)")
    fr, scan = state["frame"], state["scan"]
    if fr.get("lossless"):
        return _decode_lossless_scan(state, data, pos)
    h, w, comps = fr["h"], fr["w"], fr["comps"]
    prec = fr.get("prec", 8)
    center = float(1 << (prec - 1))          # level-shift (T.81 A.3.1)
    maxval = (1 << prec) - 1
    max_dc_t = 11 if prec == 8 else 15       # T.81 Table F.1
    odtype = np.uint8 if prec == 8 else np.uint16
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    by_id = {c["id"]: c for c in comps}
    order = []
    for s in scan:
        if s["cs"] not in by_id:
            raise ValueError(f"scan references unknown component {s['cs']}")
        c = by_id[s["cs"]]
        for k in ("td", "ta"):
            tsel = s[k]
            tbl = state["huff_dc" if k == "td" else "huff_ac"].get(tsel)
            if tbl is None:
                raise ValueError(f"scan references undefined Huffman table {tsel}")
        q = state["quant"].get(c["tq"])
        if q is None:
            raise ValueError(f"frame references undefined quant table {c['tq']}")
        order.append((c, state["huff_dc"][s["td"]],
                      state["huff_ac"][s["ta"]], q))

    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        for c in comps
    }
    rd = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    dri = state["dri"]
    rst = 0
    nmcu = mcux * mcuy
    for mi in range(nmcu):
        if dri and mi and mi % dri == 0:
            rd.restart(rst)
            rst = (rst + 1) & 7
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(mi, mcux)
        for c, hdc, hac, q in order:
            for byi in range(c["v"]):
                for bxi in range(c["h"]):
                    coef = np.zeros(64)
                    t = rd.huff(hdc)
                    if t > max_dc_t:
                        raise ValueError(
                            f"DC category {t} > {max_dc_t}")
                    pred[c["id"]] += rd.receive_extend(t)
                    coef[0] = pred[c["id"]]
                    k = 1
                    while k <= 63:
                        rs = rd.huff(hac)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        coef[ZIGZAG[k]] = rd.receive_extend(s)
                        k += 1
                    blk = (coef.reshape(8, 8) * q)
                    px = _DCT.T @ blk @ _DCT + center
                    y0 = (my * c["v"] + byi) * 8
                    x0 = (mx * c["h"] + bxi) * 8
                    planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = px
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:  # box upsample to full resolution
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, maxval).astype(odtype)
    y, cb, cr = out_planes
    if color_transform is None or color_transform:
        r = y + 1.402 * (cr - center)
        g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
        b = y + 1.772 * (cb - center)
        rgb = np.stack([r, g, b], axis=2)
    else:
        rgb = np.stack([y, cb, cr], axis=2)
    return np.clip(np.round(rgb), 0, maxval).astype(odtype)


# ---------------------------------------------------------------------------
# Encoder (fixture generation + quicklook export)
# ---------------------------------------------------------------------------


def _encode_table(freqs: dict) -> tuple:
    """Spec-legal canonical Huffman table over the used symbols:
    every symbol gets the same length L with 2^L ≥ n+1, so the
    all-ones code stays unused (T.81 requires it for marker
    detection head-room). Suboptimal but decodable by any decoder.
    Returns (bits[16], vals, {sym: (length, code)})."""
    syms = sorted(freqs)
    n = max(len(syms), 1)
    L = max(1, (n + 1 - 1).bit_length())
    if (1 << L) < n + 1:
        L += 1
    bits = [0] * 16
    bits[L - 1] = n
    enc = {s: (L, i) for i, s in enumerate(syms)}
    return bits, syms, enc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nb = 0

    def put(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nb += 1
            if self.nb == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nb = 0

    def align(self):
        if self.nb:
            self.put((1 << (8 - self.nb)) - 1, 8 - self.nb)  # 1-fill


def _category(v: int) -> int:
    return abs(v).bit_length()


def _block_symbols(coef: np.ndarray, pred: int):
    """(dc_sym, dc_bits, [(ac_sym, ac_bits)...], new_pred) for one
    quantized block in zigzag order."""
    zz = [int(coef.flat[ZIGZAG[i]]) for i in range(64)]
    diff = zz[0] - pred
    t = _category(diff)
    dc_bits = (diff if diff >= 0 else diff + (1 << t) - 1, t)
    acs = []
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, (0, 0)))  # ZRL
            run -= 16
        s = _category(zz[k])
        v = zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1
        acs.append(((run << 4) | s, (v, s)))
        run = 0
    if last < 63:
        acs.append((0x00, (0, 0)))  # EOB
    return t, dc_bits, acs, zz[0]


def encode_baseline_jpeg(arr: np.ndarray, quant=None,
                         subsampling: str = "444",
                         restart_interval: int = 0,
                         precision: int = 8) -> bytes:
    """Encode u8 (h, w) grayscale or (h, w, 3) RGB to a baseline
    4:4:4 or 4:2:0 JPEG stream. ``quant``: scalar or 8×8 table
    (default all-ones — lossless for blockwise-constant inputs, which
    is what the value-exact ingest fixtures use). ``precision=12``
    writes the extended sequential process (SOF1, T.81 Table B.2 —
    the depth archived GOES imagery ships): uint16 samples < 4096,
    16-bit DQT entries when needed, level shift 2048."""
    arr = np.asarray(arr)
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    if precision == 8:
        if arr.dtype != np.uint8:
            raise ValueError("encoder takes uint8 samples")
    else:
        if arr.dtype != np.uint16:
            raise ValueError("12-bit encoder takes uint16 samples")
        if arr.max(initial=0) > 4095:
            raise ValueError("12-bit samples must be < 4096")
    center = float(1 << (precision - 1))
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("expected (h, w) or (h, w, 3)")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444/420, got {subsampling!r}")
    if gray:
        subsampling = "444"
    h, w = arr.shape[:2]
    q = np.ones((8, 8)) if quant is None else (
        np.full((8, 8), float(quant)) if np.isscalar(quant)
        else np.asarray(quant, dtype=float))
    qmax = 255 if precision == 8 else 65535
    if q.shape != (8, 8) or (q < 1).any() or (q > qmax).any():
        raise ValueError(f"quant table must be 8x8 in [1, {qmax}]")

    if gray:
        planes = [arr.astype(float)]
        samp = [(1, 1)]
    else:
        rgb = arr.astype(float)
        y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
             + 0.114 * rgb[:, :, 2])
        cb = (center - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1]
              + 0.5 * rgb[:, :, 2])
        cr = (center + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1]
              - 0.081312 * rgb[:, :, 2])
        if subsampling == "420":
            def down(p):
                ph = (p.shape[0] + 1) // 2 * 2
                pw = (p.shape[1] + 1) // 2 * 2
                pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                            mode="edge")
                return (pp[0::2, 0::2] + pp[1::2, 0::2]
                        + pp[0::2, 1::2] + pp[1::2, 1::2]) / 4.0
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad every plane to its MCU-covered size (edge replication)
    padded = []
    for p, (hs, vs) in zip(planes, samp):
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        padded.append(np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"))

    # pass 1: quantize all blocks, collect symbol frequencies
    nmcu = mcux * mcuy
    blocks: list = []  # per MCU: [(ci, coef)...]
    preds = [0] * len(planes)
    dc_freq: list = [dict() for _ in planes]
    ac_freq: list = [dict() for _ in planes]
    for mi in range(nmcu):
        my, mx = divmod(mi, mcux)
        if restart_interval and mi and mi % restart_interval == 0:
            preds = [0] * len(planes)
        mcu = []
        for ci, (p, (hs, vs)) in enumerate(zip(padded, samp)):
            for byi in range(vs):
                for bxi in range(hs):
                    y0 = (my * vs + byi) * 8
                    x0 = (mx * hs + bxi) * 8
                    blk = p[y0:y0 + 8, x0:x0 + 8] - center
                    coef = np.round((_DCT @ blk @ _DCT.T) / q)
                    t, dcb, acs, dc = _block_symbols(coef, preds[ci])
                    preds[ci] = dc
                    dc_freq[ci][t] = dc_freq[ci].get(t, 0) + 1
                    for sym, _b in acs:
                        ac_freq[ci][sym] = ac_freq[ci].get(sym, 0) + 1
                    mcu.append((ci, t, dcb, acs))
        blocks.append(mcu)

    # luma uses table slot 0, both chromas share slot 1 (merge freqs)
    slot_of = [0] + [1] * (len(planes) - 1)
    nslots = 1 if gray else 2
    dcf = [dict() for _ in range(nslots)]
    acf = [dict() for _ in range(nslots)]
    for ci in range(len(planes)):
        for s, n in dc_freq[ci].items():
            dcf[slot_of[ci]][s] = dcf[slot_of[ci]].get(s, 0) + n
        for s, n in ac_freq[ci].items():
            acf[slot_of[ci]][s] = acf[slot_of[ci]].get(s, 0) + n
    dc_tabs = [_encode_table(f) for f in dcf]
    ac_tabs = [_encode_table(f) for f in acf]

    out = bytearray(b"\xff\xd8")
    zz_vals = [int(q.flat[ZIGZAG[i]]) for i in range(64)]
    pq = 1 if max(zz_vals) > 255 else 0
    if pq:
        zz_q = struct.pack(">64H", *zz_vals)
    else:
        zz_q = bytes(zz_vals)
    out += (b"\xff\xdb" + struct.pack(">H", 3 + len(zz_q))
            + bytes([pq << 4]) + zz_q)
    sof = struct.pack(">BHHB", precision, h, w, len(planes))
    for ci, (hs, vs) in enumerate(samp):
        sof += struct.pack(">BBB", ci + 1, (hs << 4) | vs, 0)
    sof_marker = b"\xff\xc0" if precision == 8 else b"\xff\xc1"
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    for tc, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for ti, (bits, vals, _enc) in enumerate(tabs):
            body = bytes([(tc << 4) | ti]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += struct.pack(">BB", ci + 1,
                           (slot_of[ci] << 4) | slot_of[ci])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    rst = 0
    for mi, mcu in enumerate(blocks):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.align()
            out += bw.out
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
        for ci, t, (dcv, dct_), acs in mcu:
            sl = slot_of[ci]
            ln, code = dc_tabs[sl][2][t]
            bw.put(code, ln)
            if dct_:
                bw.put(dcv, dct_)
            for sym, (v, s) in acs:
                ln, code = ac_tabs[sl][2][sym]
                bw.put(code, ln)
                if s:
                    bw.put(v, s)
    bw.align()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Lossless sequential process (SOF3, T.81 Annex H) — the JPEG process
# old-style TIFF tag 512 calls "14". DPCM over reconstructed samples:
# per sample one DC-style Huffman category + extend bits code the
# difference from a neighbor prediction; modulo-65536 arithmetic;
# point transform Al scales; no DCT, no quantization, no subsampling.


_LL_DEFAULT = object()


def _ll_predict(plane, x: int, y: int, sel: int, default: int,
                reset: bool, ra_line: bool = False) -> int:
    """T.81 H.1.2: prediction for sample (x, y). ``reset`` marks the
    first sample of the scan / restart interval (default prediction);
    ``ra_line`` marks the rest of the FIRST LINE of the scan / restart
    interval — T.81 H.1.1 mandates the 1-D predictor Ra there (the
    remainder of the current row after a restart), NOT the selected
    2-D predictor (ADVICE r16: resuming sel here desynchronized
    against conforming encoders such as libjpeg-turbo lossless).
    Otherwise the first column predicts from b, everything else from
    the selected predictor 1..7."""
    if reset:
        return default
    if ra_line or y == 0:
        return int(plane[y, x - 1])  # interval first line: predictor a
    if x == 0:
        return int(plane[y - 1, 0])  # first column: predictor b
    a = int(plane[y, x - 1])
    b = int(plane[y - 1, x])
    c = int(plane[y - 1, x - 1])
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    return (a + b) >> 1  # sel == 7


def _decode_lossless_scan(state: dict, data: bytes, pos: int):
    fr, scan = state["frame"], state["scan"]
    h, w, comps = fr["h"], fr["w"], fr["comps"]
    prec = fr["prec"]
    # Per-component predictor / point-transform overrides (old-style
    # TIFF tags 517/518 carry one value PER COMPONENT, while a T.81
    # scan header carries a single Ss/Al — the overrides let the TIFF
    # reader honor genuinely per-component legacy files).
    sels = state.get("ll_pred_overrides") or [state.get("scan_ss", 1)]
    pts = state.get("ll_pt_overrides") or [state.get("scan_al", 0)]
    nsc = len(scan)
    sels = [int(sels[ci]) if ci < len(sels) else int(sels[0])
            for ci in range(nsc)]
    pts = [int(pts[ci]) if ci < len(pts) else int(pts[0])
           for ci in range(nsc)]
    for sel in sels:
        if not 1 <= sel <= 7:
            raise ValueError(f"lossless predictor selector {sel} (1..7)")
    for pt in pts:
        if pt >= prec:
            raise ValueError(f"point transform {pt} >= precision {prec}")
    by_id = {c["id"]: c for c in comps}
    tabs = []
    for s in scan:
        if s["cs"] not in by_id:
            raise ValueError(
                f"scan references unknown component {s['cs']}")
        tbl = state["huff_dc"].get(s["td"])
        if tbl is None:
            raise ValueError(
                f"scan references undefined Huffman table {s['td']}")
        tabs.append(tbl)
    nc = len(scan)
    defaults = [1 << (prec - pts[ci] - 1) for ci in range(nc)]
    planes = np.zeros((nc, h, w), dtype=np.int64)
    rd = _BitReader(data, pos)
    dri = state["dri"]
    rst = 0
    reset = True
    ra_line = True
    mcu = 0
    for y in range(h):
        for x in range(w):
            if dri and mcu and mcu % dri == 0:
                rd.restart(rst)
                rst = (rst + 1) & 7
                reset = True
                ra_line = True
            for ci in range(nc):
                t = rd.huff(tabs[ci])
                if t > 16:
                    raise ValueError(
                        f"lossless difference category {t} > 16")
                diff = 32768 if t == 16 else rd.receive_extend(t)
                px = _ll_predict(planes[ci], x, y, sels[ci],
                                 defaults[ci], reset, ra_line)
                planes[ci, y, x] = (px + diff) & 0xFFFF
            reset = False
            mcu += 1
        # the restart interval's "first line" ends with the row it
        # started in (T.81 H.1.1); later rows resume normal predictors
        ra_line = False
    mask = (1 << prec) - 1 if prec < 16 else 0xFFFF
    out = np.stack([(planes[ci] << pts[ci]) & mask for ci in range(nc)])
    dt = np.uint8 if prec <= 8 else np.uint16
    if nc == 1:
        return out[0].astype(dt)
    # lossless components are independent — returned RAW (no YCbCr)
    return np.moveaxis(out, 0, 2).astype(dt)


def encode_lossless_jpeg(arr: np.ndarray, predictor=1,
                         point_transform=0,
                         restart_interval: int = 0,
                         precision: int | None = None) -> bytes:
    """Writer twin of the SOF3 decoder (fixtures + exports): exact
    DPCM roundtrip for any uint8/uint16 input within ``precision``
    bits. Components are stored raw and interleaved.

    ``predictor`` / ``point_transform`` may be per-component
    sequences (TIFF 6.0 §22 tags 517/518 are per-component). A T.81
    scan header carries ONE Ss/Al, so a stream written with distinct
    values self-describes only component 0 — decode it with the
    ``lossless_predictors``/``lossless_point_transforms`` overrides
    (the old-style TIFF reader passes the tags automatically).
    Distinct per-component stats get distinct Huffman tables
    (DHT th=ci); uniform values keep the shared-table stream
    byte-identical to earlier rounds."""
    arr = np.asarray(arr)
    if arr.dtype not in (np.uint8, np.uint16):
        raise ValueError("lossless encoder takes uint8/uint16 samples")
    if precision is None:
        precision = 8 if arr.dtype == np.uint8 else 16
    if not 2 <= precision <= 16:
        raise ValueError(f"precision {precision} outside 2..16")
    if arr.max(initial=0) >> precision:
        raise ValueError(f"samples exceed {precision} bits")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc > 4:
        raise ValueError(f"{nc} components (max 4)")
    preds = (list(predictor) if hasattr(predictor, "__len__")
             else [int(predictor)] * nc)
    pts_l = (list(point_transform) if hasattr(point_transform, "__len__")
             else [int(point_transform)] * nc)
    if len(preds) != nc or len(pts_l) != nc:
        raise ValueError("per-component predictor/point-transform "
                         f"lists must have {nc} entries")
    for p in preds:
        if not 1 <= int(p) <= 7:
            raise ValueError(f"predictor {p} (1..7)")
    for p in pts_l:
        if not 0 <= int(p) < precision:
            raise ValueError("point transform must be in [0, precision)")
    preds = [int(p) for p in preds]
    pts_l = [int(p) for p in pts_l]
    uniform = len(set(preds)) == 1 and len(set(pts_l)) == 1
    shifted = np.empty(arr.shape, dtype=np.int64)
    for ci in range(nc):
        shifted[:, :, ci] = arr[:, :, ci].astype(np.int64) >> pts_l[ci]
    defaults = [1 << (precision - pts_l[ci] - 1) for ci in range(nc)]

    # pass 1: diffs + category frequencies (mirrors the decoder walk)
    diffs = np.empty((h, w, nc), dtype=np.int64)
    cats = np.empty((h, w, nc), dtype=np.uint8)
    freqs_by_ci: list = [{} for _ in range(nc)]
    reset = True
    ra_line = True
    mcu = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reset = True
                ra_line = True
            for ci in range(nc):
                px = _ll_predict(shifted[:, :, ci], x, y, preds[ci],
                                 defaults[ci], reset, ra_line)
                d = (int(shifted[y, x, ci]) - px) & 0xFFFF
                if d > 32768:
                    d -= 65536
                t = 16 if d == 32768 else _category(d)
                diffs[y, x, ci] = d
                cats[y, x, ci] = t
                freqs_by_ci[ci][t] = freqs_by_ci[ci].get(t, 0) + 1
            reset = False
            mcu += 1
        ra_line = False

    if uniform:  # shared table 0 — byte-identical to earlier rounds
        merged: dict = {}
        for f in freqs_by_ci:
            for t, n in f.items():
                merged[t] = merged.get(t, 0) + n
        tables = [(_encode_table(merged))]
        th_of = [0] * nc
    else:
        tables = [_encode_table(f) for f in freqs_by_ci]
        th_of = list(range(nc))
    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", precision, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    for th, (bits, vals, _) in enumerate(tables):
        body = bytes([th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, th_of[ci] << 4])
    sos += bytes([preds[0], 0, pts_l[0]])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    rst = 0
    mcu = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.align()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
            for ci in range(nc):
                enc = tables[th_of[ci]][2]
                t = int(cats[y, x, ci])
                ln, code = enc[t]
                bw.put(code, ln)
                if t and t != 16:
                    d = int(diffs[y, x, ci])
                    v = d if d >= 0 else d + (1 << t) - 1
                    bw.put(v, t)
            mcu += 1
    bw.align()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
