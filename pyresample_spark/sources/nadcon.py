"""NADCON (``.las``/``.los``) grid-shift file format: writer + reader.

NOAA's NADCON program distributes the NAD27→NAD83 (and later
HPGN/HARN) transformations as PAIRS of direct-access binary grids:
``.las`` (latitude shifts) and ``.los`` (longitude shifts). PROJ
consumes them through the same ``+nadgrids=`` mechanism as NTv2 — the
reference reaches both through pyproj
(pyresample/utils/proj4.py:108-165 → PROJ's hgrid step) — so a user
with legacy conus.las-era products hits this format (VERDICT r13 item
3). The shift APPLICATION is format-agnostic
(operators/gridshift.py); this module only adds the wire format and
feeds the same grid registry (sources/ntv2.py) that ``+nadgrids=``
resolution reads, so every downstream stage (broadcast cell tables,
bilinear emitters, the unrolled fixed-point inverse, DuckDB twins) is
shared with NTv2 unchanged.

Wire format (public: NOAA's NADCON Fortran source/readme; GDAL's
``LOSLAS`` raw driver reads the same layout):

- Both files of a pair are little-endian, direct-access, fixed record
  length ``4*(NC+1)`` bytes.
- Record 1 (header, 96 data bytes): IDENT ``char[56]``, PGM
  ``char[8]``, int32 NC (columns), NR (rows), NZ (=1), then float32
  XMIN (degrees EAST of column 0), DX (degrees), YMIN (degrees of row
  0 = the SOUTH edge), DY, ANGLE (=0); NUL-padded to the record
  length. NC must be ≥ 23 for the header to fit its own record —
  every published grid is far wider (conus is 273 columns).
- Records 2..NR+1: row ``i`` from SOUTH to NORTH, each an int32 row
  number (1-based; producers that wrote it as float32 are tolerated —
  the word is validated, not used) followed by NC float32 shift
  values, columns WEST → EAST.
- Values are ARC-SECONDS: ``.las`` positive north, ``.los`` positive
  WEST (NOAA's positive-west longitude convention, the same sense as
  NTv2). A distribution observed to carry east-positive ``.los``
  values can be registered after negating the array.
- Header geometry is float32 ON THE WIRE: the parsed grid carries the
  exactly-widened float32 values, so choose wire-representable bounds
  (quarter/half degrees are exact) when writing.

The parsed subgrid dict is exactly the shape operators/gridshift.py
consumes (bounds/increments in arc-seconds positive west, arrays
indexed ``[row_from_south][col_from_EAST]``): the NADCON west→east
column order is reversed on read and the degree header converted to
arc-seconds.
"""

from __future__ import annotations

import struct

import numpy as np

# same implausible-dims discipline as the NTv2/TIFF/HDF5 readers
_MAX_NODES = 50_000_000

_HDR = struct.Struct("<56s8siiifffff")  # 96 bytes of header payload


def _pad_str(s: str, n: int, what: str) -> bytes:
    b = s.encode("ascii")
    if len(b) > n:
        raise ValueError(f"NADCON: {what} {s!r} exceeds {n} ASCII chars")
    return b.ljust(n)


def _one_file_bytes(ident: str, pgm: str, nc: int, nr: int,
                    xmin: float, dx: float, ymin: float, dy: float,
                    values: np.ndarray) -> bytes:
    reclen = 4 * (nc + 1)
    hdr = _HDR.pack(
        _pad_str(ident, 56, "IDENT"), _pad_str(pgm, 8, "PGM"),
        nc, nr, 1,
        np.float32(xmin), np.float32(dx),
        np.float32(ymin), np.float32(dy), np.float32(0.0),
    )
    out = [hdr.ljust(reclen, b"\x00")]
    v = np.asarray(values, dtype="<f4")
    for i in range(nr):
        out.append(struct.pack("<i", i + 1) + v[i].tobytes())
    return b"".join(out)


def nadcon_grid_bytes(grid: dict) -> tuple:
    """Serialize one grid to a ``(las_bytes, los_bytes)`` pair.

    ``grid`` keys: ``xmin``/``dx``/``ymin``/``dy`` (DEGREES, ``xmin``
    east-positive at column 0, ``ymin`` the south edge), ``lat_shift``
    and ``lon_shift`` equal-shape 2-D arrays indexed
    ``[row_from_south][col_west_to_east]`` (arc-seconds; lon positive
    west), optional ``ident``/``pgm``.
    """
    la = np.asarray(grid["lat_shift"], dtype=np.float32)
    lo = np.asarray(grid["lon_shift"], dtype=np.float32)
    if la.shape != lo.shape or la.ndim != 2:
        raise ValueError(
            f"NADCON: lat_shift/lon_shift must be equal-shape 2-D "
            f"arrays, got {la.shape} vs {lo.shape}"
        )
    nr, nc = la.shape
    if nc < 23:
        raise ValueError(
            f"NADCON: NC={nc} < 23 — the 96-byte header does not fit "
            "the 4*(NC+1)-byte record length; published grids are "
            "hundreds of columns wide"
        )
    if nr < 2 or nr * nc > _MAX_NODES:
        raise ValueError(f"NADCON: implausible dims {nr}x{nc}")
    if not (float(grid["dx"]) > 0 and float(grid["dy"]) > 0):
        raise ValueError("NADCON: DX/DY must be positive")
    ident = grid.get("ident", "NADCON GRID")
    pgm = grid.get("pgm", "NADGRD")
    args = (nc, nr, float(grid["xmin"]), float(grid["dx"]),
            float(grid["ymin"]), float(grid["dy"]))
    return (
        _one_file_bytes(ident, pgm, *args, values=la),
        _one_file_bytes(ident, pgm, *args, values=lo),
    )


def _parse_one(data: bytes, what: str) -> dict:
    if len(data) < 96:
        raise ValueError(
            f"NADCON: .{what} too short for the 96-byte header "
            f"({len(data)} bytes)")
    ident, pgm, nc, nr, nz, xmin, dx, ymin, dy, angle = _HDR.unpack_from(
        data, 0)
    if not (23 <= nc <= 100_000) or not (2 <= nr <= 100_000) \
            or nr * nc > _MAX_NODES:
        raise ValueError(f"NADCON: implausible dims NR={nr} NC={nc} in .{what}")
    if nz != 1:
        raise ValueError(f"NADCON: NZ={nz} != 1 in .{what}")
    if not (dx > 0 and dy > 0):
        raise ValueError(f"NADCON: non-positive DX/DY in .{what}")
    if angle != 0.0:
        raise ValueError(f"NADCON: rotated grids (ANGLE={angle}) unsupported")
    reclen = 4 * (nc + 1)
    need = reclen * (nr + 1)
    if len(data) < need:
        raise ValueError(
            f"NADCON: .{what} truncated — {nr}x{nc} needs {need} bytes, "
            f"have {len(data)}")
    vals = np.empty((nr, nc), dtype=np.float64)
    for i in range(nr):
        off = reclen * (i + 1)
        lead_i = struct.unpack_from("<i", data, off)[0]
        lead_f = struct.unpack_from("<f", data, off)[0]
        if lead_i != i + 1 and lead_f != float(i + 1):
            raise ValueError(
                f"NADCON: .{what} record {i + 2} row-number word is "
                f"{lead_i} (int) / {lead_f} (float), expected {i + 1}")
        vals[i] = np.frombuffer(data, dtype="<f4", count=nc, offset=off + 4)
    return {
        "ident": ident.decode("ascii", "replace").strip(),
        "pgm": pgm.decode("ascii", "replace").strip(),
        "nc": nc, "nr": nr,
        # exactly-widened float32 wire values
        "xmin": float(xmin), "dx": float(dx),
        "ymin": float(ymin), "dy": float(dy),
        "values": vals,
    }


def parse_nadcon(las: bytes, los: bytes) -> dict:
    """Parse a ``.las``/``.los`` pair → registry dict with one entry in
    ``subgrids``, shaped exactly like :func:`ntv2.parse_ntv2` output so
    operators/gridshift.py consumes it unchanged."""
    a = _parse_one(las, "las")
    o = _parse_one(los, "los")
    for k in ("nc", "nr", "xmin", "dx", "ymin", "dy"):
        if a[k] != o[k]:
            raise ValueError(
                f"NADCON: .las/.los header mismatch on {k}: "
                f"{a[k]!r} vs {o[k]!r} — not a pair")
    nr, nc = a["nr"], a["nc"]
    # degrees (east, south-origin, west→east columns) → the gridshift
    # convention: arc-seconds, lon positive west, columns from the
    # EAST edge — reverse the column axis.
    sub = {
        "sub_name": (a["ident"][:8].strip() or "NADCON"),
        "parent": "NONE",
        "s_lat": a["ymin"] * 3600.0,
        "n_lat": (a["ymin"] + (nr - 1) * a["dy"]) * 3600.0,
        "e_long": -(a["xmin"] + (nc - 1) * a["dx"]) * 3600.0,
        "w_long": -a["xmin"] * 3600.0,
        "lat_inc": a["dy"] * 3600.0,
        "long_inc": a["dx"] * 3600.0,
        "nrows": nr, "ncols": nc,
        "gs_count": nr * nc,
        "lat_shift": np.ascontiguousarray(a["values"][:, ::-1]),
        "lon_shift": np.ascontiguousarray(o["values"][:, ::-1]),
    }
    if not sub["e_long"] < sub["w_long"]:
        raise ValueError(
            "NADCON: grid spans no longitude extent after conversion "
            f"(e_long {sub['e_long']} >= w_long {sub['w_long']})")
    return {
        "format": "nadcon",
        "num_file": 1,
        "gs_type": "SECONDS",
        "system_f": "NAD27",
        "system_t": "NAD83",
        "subgrids": [sub],
    }


def register_nadcon_grid(name: str, las: bytes, los: bytes) -> None:
    """Register a parsed ``.las``/``.los`` pair under ``name`` for
    ``+nadgrids=name`` resolution (shared registry with NTv2)."""
    from pyresample_spark.sources import ntv2

    ntv2.register_shift_grid(name, parse_nadcon(las, los))


# --------------------------------------------------------------------
# Spec-built demo pair (the q_regrid_nadcon fixture): NAD27-magnitude
# smooth fields over lat 35..45°N, lon 88..100°W at 0.5° (21 rows ×
# 25 cols — NC ≥ 23 satisfied). Distinct polynomials from the NTv2
# demo so a cross-format mixup cannot silently pass. All header
# values are exactly float32-representable.
# --------------------------------------------------------------------


def demo_nadcon_grid() -> dict:
    nr, nc = 21, 25
    la = np.empty((nr, nc), dtype=np.float32)
    lo = np.empty((nr, nc), dtype=np.float32)
    for i in range(nr):
        for j in range(nc):
            u = i / (nr - 1.0)   # south → north
            v = j / (nc - 1.0)   # WEST → east (NADCON column order)
            la[i, j] = np.float32(0.25 + 0.40 * u - 0.30 * v
                                  + 0.15 * u * v + 0.05 * v * v)
            lo[i, j] = np.float32(0.90 - 0.60 * v + 0.35 * u
                                  - 0.20 * u * u + 0.10 * u * v)
    return {
        "ident": "NADCON DEMO REGION CENTRAL US",
        "pgm": "NADGRD",
        "xmin": -100.0, "dx": 0.5,
        "ymin": 35.0, "dy": 0.5,
        "lat_shift": la,
        "lon_shift": lo,
    }


_DEMO_BYTES: tuple | None = None


def demo_nadcon_grid_bytes() -> tuple:
    global _DEMO_BYTES
    if _DEMO_BYTES is None:
        _DEMO_BYTES = nadcon_grid_bytes(demo_nadcon_grid())
    return _DEMO_BYTES
