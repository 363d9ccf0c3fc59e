"""NTv2 (``.gsb``) grid-shift file format: pure-python writer + reader.

NAD27 (and many other legacy national datums: AGD66/84, ED50, DHDN in
some countries' distributions) has NO Helmert fit — the official datum
transformation is a GRID of per-node (Δφ, Δλ) shifts interpolated
bilinearly. The reference reaches these through pyproj/PROJ
(pyresample/utils/proj4.py:108-165 builds the CRS; PROJ's hgrid step
consumes ``+nadgrids=`` NTv2 files). This module implements the public
NTv2 binary format natively, same discipline as the CDF/HDF5/TIFF
readers in this package, so a ``+nadgrids=`` CRS works with no native
library (VERDICT r12 item 2).

NTv2 wire format (public spec — NRCan "NTv2 Developer's Guide", also
documented by the PROJ and GDAL projects):

- The file is a sequence of 16-byte records: an 8-byte ASCII name
  followed by an 8-byte value (int32 + 4 pad bytes, float64, or an
  8-char string).
- Overview header: 11 records — NUM_OREC (=11), NUM_SREC (=11),
  NUM_FILE (subgrid count), GS_TYPE ("SECONDS"), VERSION, SYSTEM_F,
  SYSTEM_T, MAJOR_F, MINOR_F, MAJOR_T, MINOR_T.
- Per subgrid: 11 records — SUB_NAME, PARENT, CREATED, UPDATED,
  S_LAT, N_LAT, E_LONG, W_LONG, LAT_INC, LONG_INC (all float64
  ARC-SECONDS; longitudes POSITIVE WEST, so numerically
  E_LONG < W_LONG), GS_COUNT (node count) — followed by GS_COUNT
  16-byte nodes of four float32s: latitude shift (arc-seconds),
  longitude shift (arc-seconds, positive west), and the two accuracy
  estimates.
- Node ordering: longitude varies fastest, from E_LONG increasing
  WESTWARD to W_LONG; rows run south to north (S_LAT → N_LAT).
- Endianness varies by producer (Canadian files are big-endian,
  Australian little-endian); detected by decoding NUM_OREC both ways
  and accepting whichever reads 11.
- A trailing "END" record is written by some producers; tolerated but
  not required on read.

Shift application convention (PROJ hgrid): the grid maps SYSTEM_F →
SYSTEM_T at the *source* position,

    lat_T = lat_F + Δφ″/3600
    lon_T = lon_F − Δλ″/3600     (Δλ stored positive WEST)

the T→F direction has no closed form and is solved by the standard
fixed-point iteration on the grid lookup (see
operators/gridshift.py).
"""

from __future__ import annotations

import struct

import numpy as np

# implausible-dims guard (same discipline as the TIFF/HDF5 readers):
# the largest public NTv2 grids (NOAA conus) are ~1.3M nodes
_MAX_NODES = 50_000_000

_OVERVIEW_NAMES = (
    "NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_TYPE", "VERSION",
    "SYSTEM_F", "SYSTEM_T", "MAJOR_F", "MINOR_F", "MAJOR_T", "MINOR_T",
)
_SUBGRID_NAMES = (
    "SUB_NAME", "PARENT", "CREATED", "UPDATED", "S_LAT", "N_LAT",
    "E_LONG", "W_LONG", "LAT_INC", "LONG_INC", "GS_COUNT",
)


def _rec_str(name: str, value: str, bo: str) -> bytes:
    v = value.encode("ascii")
    if len(v) > 8:
        # silent truncation could clip a SUB_NAME/SYSTEM_F and break
        # parent/child PARENT-name matching in multi-subgrid files
        # (ADVICE r13)
        raise ValueError(
            f"NTv2: record string {value!r} exceeds 8 ASCII characters")
    return name.ljust(8).encode("ascii") + v.ljust(8)


def _rec_i4(name: str, value: int, bo: str) -> bytes:
    return name.ljust(8).encode("ascii") + struct.pack(bo + "i", value) + b"\x00" * 4


def _rec_f8(name: str, value: float, bo: str) -> bytes:
    return name.ljust(8).encode("ascii") + struct.pack(bo + "d", value)


def ntv2_grid_bytes(
    subgrids: list,
    *,
    system_f: str = "NAD27",
    system_t: str = "NAD83",
    major_f: float = 6378206.4,
    minor_f: float = 6356583.8,
    major_t: float = 6378137.0,
    minor_t: float = 6356752.314,
    version: str = "NTv2.0",
    big_endian: bool = False,
) -> bytes:
    """Serialize subgrids to NTv2 bytes.

    Each subgrid dict: ``name``, optional ``parent`` (default "NONE"),
    ``s_lat``/``n_lat``/``e_long``/``w_long``/``lat_inc``/``long_inc``
    (float ARC-SECONDS, longitudes positive west), ``lat_shift`` and
    ``lon_shift`` 2-D arrays indexed ``[row_from_south][col_from_east]``
    (arc-seconds, lon positive west), optional ``lat_acc``/``lon_acc``.
    """
    bo = ">" if big_endian else "<"
    out = [
        _rec_i4("NUM_OREC", 11, bo),
        _rec_i4("NUM_SREC", 11, bo),
        _rec_i4("NUM_FILE", len(subgrids), bo),
        _rec_str("GS_TYPE", "SECONDS", bo),
        _rec_str("VERSION", version, bo),
        _rec_str("SYSTEM_F", system_f, bo),
        _rec_str("SYSTEM_T", system_t, bo),
        _rec_f8("MAJOR_F", major_f, bo),
        _rec_f8("MINOR_F", minor_f, bo),
        _rec_f8("MAJOR_T", major_t, bo),
        _rec_f8("MINOR_T", minor_t, bo),
    ]
    for sg in subgrids:
        la = np.asarray(sg["lat_shift"], dtype=np.float32)
        lo = np.asarray(sg["lon_shift"], dtype=np.float32)
        if la.shape != lo.shape or la.ndim != 2:
            raise ValueError(
                f"subgrid {sg['name']!r}: lat_shift/lon_shift must be "
                f"equal-shape 2-D arrays, got {la.shape} vs {lo.shape}"
            )
        nrows, ncols = la.shape
        exp_rows = int(round((sg["n_lat"] - sg["s_lat"]) / sg["lat_inc"])) + 1
        exp_cols = int(round((sg["w_long"] - sg["e_long"]) / sg["long_inc"])) + 1
        if (nrows, ncols) != (exp_rows, exp_cols):
            raise ValueError(
                f"subgrid {sg['name']!r}: bounds/increment imply "
                f"{exp_rows}x{exp_cols} nodes but arrays are {nrows}x{ncols}"
            )
        laa = np.asarray(sg.get("lat_acc", np.zeros_like(la)), dtype=np.float32)
        loa = np.asarray(sg.get("lon_acc", np.zeros_like(lo)), dtype=np.float32)
        out += [
            _rec_str("SUB_NAME", sg["name"], bo),
            _rec_str("PARENT", sg.get("parent", "NONE"), bo),
            _rec_str("CREATED", sg.get("created", "00000000"), bo),
            _rec_str("UPDATED", sg.get("updated", "00000000"), bo),
            _rec_f8("S_LAT", float(sg["s_lat"]), bo),
            _rec_f8("N_LAT", float(sg["n_lat"]), bo),
            _rec_f8("E_LONG", float(sg["e_long"]), bo),
            _rec_f8("W_LONG", float(sg["w_long"]), bo),
            _rec_f8("LAT_INC", float(sg["lat_inc"]), bo),
            _rec_f8("LONG_INC", float(sg["long_inc"]), bo),
            _rec_i4("GS_COUNT", nrows * ncols, bo),
        ]
        # nodes: lon fastest (east → west = col 0 → ncols-1), south →
        # north; one vectorized dump — a realistic grid is ~1.2M nodes
        # and a per-node struct.pack loop costs seconds (code-review
        # r13 finding 6)
        out.append(np.stack([la, lo, laa, loa], axis=-1)
                   .astype(np.dtype(bo + "f4")).tobytes())
    out.append(_rec_str("END", "", bo))
    return b"".join(out)


def _read_name(data: bytes, off: int) -> str:
    return data[off:off + 8].decode("ascii", "replace").strip()


def parse_ntv2(data: bytes) -> dict:
    """Parse NTv2 bytes → dict with the overview fields and
    ``subgrids``: list of dicts carrying the header floats plus
    ``nrows``/``ncols`` and ``lat_shift``/``lon_shift`` float32 arrays
    indexed ``[row_from_south][col_from_east]`` (lon positive west)."""
    if len(data) < 11 * 16:
        raise ValueError(f"NTv2: file too short for overview header ({len(data)} bytes)")
    # endianness probe: NUM_OREC must decode to 11
    bo = None
    for cand in ("<", ">"):
        if (_read_name(data, 0) == "NUM_OREC"
                and struct.unpack_from(cand + "i", data, 8)[0] == 11):
            bo = cand
            break
    if bo is None:
        raise ValueError(
            "NTv2: NUM_OREC != 11 under either byte order — not an NTv2 file"
        )

    def i4(off):
        return struct.unpack_from(bo + "i", data, off + 8)[0]

    def f8(off):
        return struct.unpack_from(bo + "d", data, off + 8)[0]

    def s8(off):
        return data[off + 8:off + 16].decode("ascii", "replace").strip()

    hdr = {}
    off = 0
    for name in _OVERVIEW_NAMES:
        got = _read_name(data, off)
        if got != name:
            raise ValueError(f"NTv2: expected overview record {name!r} at byte {off}, got {got!r}")
        if name in ("NUM_OREC", "NUM_SREC", "NUM_FILE"):
            hdr[name.lower()] = i4(off)
        elif name in ("MAJOR_F", "MINOR_F", "MAJOR_T", "MINOR_T"):
            hdr[name.lower()] = f8(off)
        else:
            hdr[name.lower()] = s8(off)
        off += 16
    if hdr["num_srec"] != 11:
        raise ValueError(f"NTv2: NUM_SREC must be 11, got {hdr['num_srec']}")
    if hdr["gs_type"] != "SECONDS":
        raise ValueError(
            f"NTv2: GS_TYPE {hdr['gs_type']!r} unsupported (spec allows "
            "SECONDS/MINUTES/DEGREES; every published grid uses SECONDS)"
        )
    nfile = hdr["num_file"]
    if not (1 <= nfile <= 4096):
        raise ValueError(f"NTv2: implausible NUM_FILE {nfile}")

    subgrids = []
    for _ in range(nfile):
        if off + 11 * 16 > len(data):
            raise ValueError("NTv2: truncated subgrid header")
        sg = {}
        for name in _SUBGRID_NAMES:
            got = _read_name(data, off)
            if got != name:
                raise ValueError(
                    f"NTv2: expected subgrid record {name!r} at byte {off}, got {got!r}")
            if name == "GS_COUNT":
                sg["gs_count"] = i4(off)
            elif name in ("SUB_NAME", "PARENT", "CREATED", "UPDATED"):
                sg[name.lower()] = s8(off)
            else:
                sg[name.lower()] = f8(off)
            off += 16
        for inc in ("lat_inc", "long_inc"):
            if not sg[inc] > 0:
                raise ValueError(f"NTv2: subgrid {sg['sub_name']!r} has non-positive {inc}")
        nrows = int(round((sg["n_lat"] - sg["s_lat"]) / sg["lat_inc"])) + 1
        ncols = int(round((sg["w_long"] - sg["e_long"]) / sg["long_inc"])) + 1
        if nrows < 2 or ncols < 2 or nrows * ncols > _MAX_NODES:
            raise ValueError(
                f"NTv2: implausible subgrid dims {nrows}x{ncols} for {sg['sub_name']!r}")
        if sg["gs_count"] != nrows * ncols:
            raise ValueError(
                f"NTv2: GS_COUNT {sg['gs_count']} != bounds-implied "
                f"{nrows}x{ncols}={nrows * ncols} for {sg['sub_name']!r}")
        need = sg["gs_count"] * 16
        if off + need > len(data):
            raise ValueError(
                f"NTv2: truncated node block for {sg['sub_name']!r} "
                f"(need {need} bytes at {off}, have {len(data) - off})")
        nodes = np.frombuffer(data, dtype=np.dtype(bo + "f4"), count=sg["gs_count"] * 4,
                              offset=off).reshape(nrows, ncols, 4)
        off += need
        sg["nrows"], sg["ncols"] = nrows, ncols
        sg["lat_shift"] = np.ascontiguousarray(nodes[:, :, 0])
        sg["lon_shift"] = np.ascontiguousarray(nodes[:, :, 1])
        sg["lat_acc"] = np.ascontiguousarray(nodes[:, :, 2])
        sg["lon_acc"] = np.ascontiguousarray(nodes[:, :, 3])
        subgrids.append(sg)
    hdr["subgrids"] = subgrids
    return hdr


# --------------------------------------------------------------------
# Grid registry for +nadgrids= resolution — FORMAT-NEUTRAL: NTv2
# (.gsb) and NADCON (.las/.los — sources/nadcon.py) both parse to the
# same subgrid-dict shape and register here. Real deployments register
# the bytes of their grid files (ship them with the job, or read once
# from a shared store); the q_regrid_* demo queries register
# spec-built fixtures.
# --------------------------------------------------------------------

_REGISTRY: dict = {}


_SUBGRID_KEYS = frozenset(
    ("s_lat", "n_lat", "e_long", "w_long", "lat_inc", "long_inc",
     "lat_shift", "lon_shift"))


def register_shift_grid(name: str, parsed: dict) -> None:
    """Register an ALREADY-PARSED grid (any wire format) under
    ``name`` for ``+nadgrids=name`` resolution. The dict must carry
    ``subgrids``: a list in the shape :func:`parse_ntv2` /
    ``nadcon.parse_nadcon`` produce (the operators/gridshift.py
    contract). A VERTICAL grid (GTX geoid — ``parse_gtx`` output, a
    single height surface with no lat/lon shift pair) is rejected
    here rather than failing obscurely at +nadgrids resolution:
    vertical datums go through vgridshift (operators/gridshift
    ``vshift``/``vcell_df``), never the horizontal list."""
    subs = parsed.get("subgrids") if isinstance(parsed, dict) else None
    if (not isinstance(subs, list) or not subs
            or not all(isinstance(s, dict) and _SUBGRID_KEYS <= set(s)
                       for s in subs)):
        hint = ""
        if isinstance(parsed, dict) and {"lat0", "dlat", "values"} <= set(
                parsed):
            hint = (" — this looks like a parse_gtx VERTICAL geoid "
                    "grid; +nadgrids is the HORIZONTAL list, use the "
                    "vgridshift path (gridshift.vshift/vcell_df) "
                    "instead")
        raise ValueError(
            f"register_shift_grid({name!r}): not a horizontal shift "
            f"grid (needs a non-empty 'subgrids' list with lat/lon "
            f"shift fields){hint}"
        )
    _REGISTRY[name] = parsed


def register_ntv2_grid(name: str, data: bytes) -> None:
    register_shift_grid(name, parse_ntv2(data))


def get_ntv2_grid(name: str) -> dict:
    if name not in _REGISTRY:
        # the demo grids register lazily so +nadgrids=demo_conus /
        # demo_conus_multi / demo_nadcon work without importing the
        # query module first
        if name == "demo_conus":
            register_ntv2_grid("demo_conus", demo_ntv2_grid_bytes())
            return _REGISTRY[name]
        if name == "demo_conus_multi":
            register_ntv2_grid("demo_conus_multi",
                               demo_ntv2_multi_grid_bytes())
            return _REGISTRY[name]
        if name == "demo_nadcon":
            from pyresample_spark.sources import nadcon

            register_shift_grid(
                name, nadcon.parse_nadcon(*nadcon.demo_nadcon_grid_bytes()))
            return _REGISTRY[name]
        if name == "demo_conus_national":
            register_ntv2_grid("demo_conus_national",
                               demo_ntv2_national_grid_bytes())
            return _REGISTRY[name]
        raise NotImplementedError(
            f"+nadgrids={name!r}: no grid-shift grid registered under "
            f"that name (registered: {sorted(_REGISTRY) or 'none'}; call "
            "sources.ntv2.register_ntv2_grid(name, gsb_bytes) or "
            "sources.nadcon.register_nadcon_grid(name, las, los) with "
            "the grid file bytes first — @-optional prefixes are "
            "stripped)"
        )
    return _REGISTRY[name]


# grid-format-neutral alias (resolution is format-blind; the name
# predates NADCON support)
get_shift_grid = get_ntv2_grid


def apply_subgrids(grid: dict) -> list:
    """The subgrids the column pipeline applies. Single-subgrid files
    take the tight-literal fast path; files with ≤16 subgrids
    (parent/child refinement) run the per-point densest-containing-
    grid selection as plan-literal CASE chains (operators/gridshift.py
    multi_*); LARGER files (Canada's national NTV2_0.GSB carries ~100)
    dispatch to the flat LEAST-selection + meta-join path
    (gridshift big_* — the CASE chains measurably never finish
    analyzing at that width). Dispatch happens at the pipeline level
    (operators/crs.py grid_leg) on len(); the sanity bound below only
    rejects absurd counts."""
    subs = grid["subgrids"]
    if len(subs) > 4096:
        raise ValueError(
            f"NTv2 file claims {len(subs)} subgrids — implausible")
    return subs


def _null_subgrid() -> dict:
    """The ``null`` identity grid: one whole-world cell of zero
    shifts (2×2 nodes spanning ±90° / ±180°, positive-west bounds).
    Its cell area is the largest possible, so the (file_rank, density)
    ordering keeps it strictly lower priority than any real grid at
    an earlier rank."""
    z = np.zeros((2, 2), dtype=np.float32)
    return {
        # explicit marker: identity-leg detection must not key on the
        # free-text SUB_NAME (a real grid could be named 'NULL')
        "identity": True,
        "sub_name": "NULL", "parent": "NONE",
        "s_lat": -90.0 * 3600.0, "n_lat": 90.0 * 3600.0,
        "e_long": -180.0 * 3600.0, "w_long": 180.0 * 3600.0,
        "lat_inc": 180.0 * 3600.0, "long_inc": 360.0 * 3600.0,
        "nrows": 2, "ncols": 2, "gs_count": 4,
        "lat_shift": z, "lon_shift": z,
    }


def resolve_nadgrids(names: list) -> list:
    """Resolve a ``+nadgrids=`` comma list ``[(name, optional), ...]``
    to ONE combined subgrid list carrying per-file priority
    (``file_rank``). PROJ hgrid semantics: files are tried IN ORDER
    and the first file containing a point wins; WITHIN a file the
    densest containing subgrid wins
    (operators/gridshift.order_subgrids reads the annotation, so the
    selection CASE chain realizes (file_rank, density) lexicographic
    priority with no extra join). ``@``-optional names with no
    registered grid are skipped silently — PROJ's
    missing-optional-file rule; a required missing name raises."""
    subs, skipped = [], []
    rank = 0
    terminated = False
    for name, optional in names:
        if name == "null":
            if not terminated:
                # PROJ's identity grid: covers the whole world with
                # zero shift, so lower-priority points pass through
                # UNSHIFTED instead of being dropped; anything listed
                # after it is unreachable (it contains every point)
                subs.append(dict(_null_subgrid(), file_rank=rank))
                rank += 1
                terminated = True
            continue
        try:
            grid = get_ntv2_grid(name)
        except NotImplementedError:
            if optional:
                skipped.append(name)
                continue
            # a REQUIRED missing name raises even after a null — PROJ
            # validates every listed grid at CRS creation, so a typo
            # in an unreachable tail must surface, not silently pass
            raise
        if terminated:
            continue  # validated but unreachable behind the null
        for s in grid["subgrids"]:
            s = dict(s)
            s["file_rank"] = rank
            subs.append(s)
        rank += 1
    if not subs:
        raise NotImplementedError(
            f"+nadgrids: every listed grid is @-optional and none is "
            f"registered ({skipped}) — register at least one"
        )
    if len(subs) > 4096:
        raise ValueError(
            f"+nadgrids list resolves to {len(subs)} subgrids — implausible")
    return subs


# --------------------------------------------------------------------
# Spec-built demo grid (the q_regrid_nad27 fixture): a smooth,
# deterministic, NAD27-magnitude shift field over the central-US
# window lat 35..45°N, lon 90..100°W at 0.5° spacing. Real conus
# shifts run ~0-1″ in latitude and ~0-3″ (positive west) in longitude;
# the polynomials below stay inside those ranges. Values are float32
# exactly as the wire format stores them.
# --------------------------------------------------------------------


def demo_ntv2_subgrid() -> dict:
    nrows, ncols = 21, 21
    la = np.empty((nrows, ncols), dtype=np.float32)
    lo = np.empty((nrows, ncols), dtype=np.float32)
    for i in range(nrows):
        for j in range(ncols):
            u = i / (nrows - 1.0)  # south → north
            v = j / (ncols - 1.0)  # east → west
            la[i, j] = np.float32(0.15 + 0.55 * u + 0.20 * v - 0.25 * u * v
                                  + 0.10 * u * u)
            lo[i, j] = np.float32(1.10 + 0.80 * v - 0.45 * u + 0.35 * u * v
                                  - 0.15 * v * v)
    return {
        "name": "DEMOCONU",
        "s_lat": 35.0 * 3600.0,
        "n_lat": 45.0 * 3600.0,
        "e_long": 90.0 * 3600.0,   # 90°W, positive west
        "w_long": 100.0 * 3600.0,  # 100°W
        "lat_inc": 1800.0,         # 0.5°
        "long_inc": 1800.0,
        "lat_shift": la,
        "lon_shift": lo,
    }


_DEMO_BYTES: bytes | None = None


def demo_ntv2_grid_bytes() -> bytes:
    global _DEMO_BYTES
    if _DEMO_BYTES is None:
        _DEMO_BYTES = ntv2_grid_bytes([demo_ntv2_subgrid()])
    return _DEMO_BYTES


def demo_ntv2_child_subgrid() -> dict:
    """A CHILD refinement of the demo grid: the inner window lat
    38..42°N, lon 93..97°W at 0.25° spacing with a DIFFERENT (denser,
    visibly offset) field — points inside it must take these values,
    points outside fall back to the parent (PROJ's densest-containing
    selection)."""
    nrows = ncols = 17
    la = np.empty((nrows, ncols), dtype=np.float32)
    lo = np.empty((nrows, ncols), dtype=np.float32)
    for i in range(nrows):
        for j in range(ncols):
            u = i / (nrows - 1.0)
            v = j / (ncols - 1.0)
            la[i, j] = np.float32(0.55 + 0.30 * u - 0.15 * v
                                  + 0.20 * u * v)
            lo[i, j] = np.float32(1.60 - 0.40 * u + 0.55 * v
                                  - 0.25 * u * u)
    return {
        "name": "DEMOCHLD",
        "parent": "DEMOCONU",
        "s_lat": 38.0 * 3600.0,
        "n_lat": 42.0 * 3600.0,
        "e_long": 93.0 * 3600.0,
        "w_long": 97.0 * 3600.0,
        "lat_inc": 900.0,   # 0.25°
        "long_inc": 900.0,
        "lat_shift": la,
        "lon_shift": lo,
    }


_DEMO_MULTI_BYTES: bytes | None = None


def demo_ntv2_multi_grid_bytes() -> bytes:
    global _DEMO_MULTI_BYTES
    if _DEMO_MULTI_BYTES is None:
        _DEMO_MULTI_BYTES = ntv2_grid_bytes(
            [demo_ntv2_subgrid(), demo_ntv2_child_subgrid()])
    return _DEMO_MULTI_BYTES


def demo_ntv2_antarctic_subgrid() -> dict:
    """A horizontal demo grid over the SAME window as the GTX demo
    geoid (sources/gtx.py: lat −88..−68, lon 180..200°E = 160..180°W)
    so the composed horizontal+vertical datum query
    (q_regrid_vdatum) has both legs defined where the synthetic
    events actually fall. Shifts are a smooth ±30″ polynomial —
    NADCON-scale (~1 km), big enough that sampling the geoid at the
    SHIFTED position provably differs from sampling at the source."""
    nrows = ncols = 21
    la = np.empty((nrows, ncols), dtype=np.float32)
    lo = np.empty((nrows, ncols), dtype=np.float32)
    for i in range(nrows):
        for j in range(ncols):
            u = i / (nrows - 1.0)  # south → north
            v = j / (ncols - 1.0)  # east → west
            la[i, j] = np.float32(12.0 + 20.0 * u - 8.0 * v
                                  + 6.0 * u * v - 4.0 * u * u)
            lo[i, j] = np.float32(-18.0 + 10.0 * v + 14.0 * u
                                  - 5.0 * u * v + 3.0 * v * v)
    return {
        "name": "DEMOANTA",
        "s_lat": -88.0 * 3600.0,
        "n_lat": -68.0 * 3600.0,
        "e_long": 160.0 * 3600.0,   # 160°W, positive west
        "w_long": 180.0 * 3600.0,
        "lat_inc": 3600.0,          # 1°
        "long_inc": 3600.0,
        "lat_shift": la,
        "lon_shift": lo,
    }


_DEMO_ANTARCTIC_BYTES: bytes | None = None


def demo_ntv2_antarctic_grid_bytes() -> bytes:
    global _DEMO_ANTARCTIC_BYTES
    if _DEMO_ANTARCTIC_BYTES is None:
        _DEMO_ANTARCTIC_BYTES = ntv2_grid_bytes(
            [demo_ntv2_antarctic_subgrid()])
    return _DEMO_ANTARCTIC_BYTES


def demo_ntv2_national_subgrids() -> list:
    """A NATIONAL-SCALE file shape (the q_regrid_ntv2_national
    fixture): the demo window lat 35..45°N / lon 90..100°W TILED into
    5×5 = 25 standalone 2°×2° subgrids at 0.5° spacing — more than the
    16-arm CASE bound, so the pipeline exercises the flat-selection
    big path (Canada's real NTV2_0.GSB carries ~100 such subgrids).
    The shift field is ONE smooth global polynomial evaluated per
    node, so values agree exactly at shared tile-edge nodes and the
    interpolated surface is continuous across tiles."""
    import numpy as np

    def field(lat_deg, lon_w_deg):
        u = (lat_deg - 35.0) / 10.0
        v = (lon_w_deg - 90.0) / 10.0
        la = 0.15 + 0.55 * u + 0.20 * v - 0.25 * u * v + 0.10 * u * u
        lo = 1.10 + 0.80 * v - 0.45 * u + 0.35 * u * v - 0.15 * v * v
        return np.float32(la), np.float32(lo)

    subs = []
    for ti in range(5):
        for tj in range(5):
            la = np.empty((5, 5), dtype=np.float32)
            lo = np.empty((5, 5), dtype=np.float32)
            for i in range(5):
                for j in range(5):
                    la[i, j], lo[i, j] = field(
                        35.0 + 2.0 * ti + 0.5 * i,
                        90.0 + 2.0 * tj + 0.5 * j)
            subs.append({
                "name": f"NAT{ti}{tj}",
                "s_lat": (35.0 + 2.0 * ti) * 3600.0,
                "n_lat": (37.0 + 2.0 * ti) * 3600.0,
                "e_long": (90.0 + 2.0 * tj) * 3600.0,
                "w_long": (92.0 + 2.0 * tj) * 3600.0,
                "lat_inc": 1800.0, "long_inc": 1800.0,
                "lat_shift": la, "lon_shift": lo,
            })
    return subs


_DEMO_NATIONAL_BYTES: bytes | None = None


def demo_ntv2_national_grid_bytes() -> bytes:
    global _DEMO_NATIONAL_BYTES
    if _DEMO_NATIONAL_BYTES is None:
        _DEMO_NATIONAL_BYTES = ntv2_grid_bytes(demo_ntv2_national_subgrids())
    return _DEMO_NATIONAL_BYTES
