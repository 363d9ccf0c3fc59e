"""NTv2 grid-shift datum transformation as a broadcast join + column math.

PROJ's hgrid step (the ``+nadgrids=`` consumer the reference reaches
through pyproj — pyresample/utils/proj4.py:108-165) shifts geodetic
coordinates by BILINEAR interpolation in a lat/lon grid of per-node
(Δφ″, Δλ″) values. Here the grid becomes a small BROADCAST cell table
— one row per grid cell carrying its four corner shifts — and the
interpolation is pure column math:

    stage 1: ls = lat·3600, lw = −lon·3600 (arc-seconds, lon positive
             west like the wire format), cell index gi/gj by floor
             division, clamped to the grid so N/W-edge points land in
             the last cell
    join   : broadcast hash join on (gi, gj) — the grid is a few MB
             even for the full NOAA conus file (~1.2M cells), so this
             never shuffles the data side
    stage 2: fractional offsets fy/fx, bilinear Δφ/Δλ, then
             lat′ = lat + Δφ/3600,  lon′ = lon − Δλ/3600   (forward)

The inverse (NAD83/WGS84 → NAD27) has no closed form; PROJ iterates
the forward lookup to a tolerance. Here the fixed point is UNROLLED to
a fixed ``iters`` lookups (default 3) so the plan is static and the
DuckDB oracle can replay the identical computation: the shift field is
smooth and ≤ a few arc-seconds, so each iteration contracts the error
by the field's gradient (~1e-4) — two refinements are already far
below float64 noise; three is margin.

Every arithmetic expression is emitted ONCE as SQL text and parsed by
BOTH engines (Spark selectExpr / DuckDB CTE), so the engines agree
bit-for-bit. Numeric literals are wrapped in CAST(... AS DOUBLE) —
the engine-shared dialect rule (a bare ``3600.0`` parses as DECIMAL in
Spark SQL).

Out-of-grid points: PROJ reports them untransformable; here they are
dropped by a bbox filter before the join (the regrid gather simply
leaves those target cells empty), applied to the pre-shift
coordinates in both directions — for the inverse that is the target-
datum position, ~1 cell-width accurate, which the demo fixture covers
with a whole-degree margin. EDGE-BAND CAVEAT for real national grids
(ADVICE r13): within ~one cell width of the grid boundary the inverse
gate can drop a point PROJ would transform (its target-datum position
falls just outside while its source-datum position is inside) or keep
one PROJ would reject — acceptable for regrids whose domain sits
inside the grid; register a grid with a margin beyond your domain if
the boundary band matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _d(x: float) -> str:
    """Engine-shared EXACT double literal. Exponent form is required:
    DuckDB parses a bare 16-digit literal as DECIMAL first and its
    decimal→double conversion is not correctly rounded (measured:
    -98.96000000000001 and CAST(-98.96000000000001 AS DOUBLE) both
    come back one ulp off, because the CAST applies after the decimal
    parse), while an exponent literal parses text→binary directly in
    both engines."""
    r = repr(float(x))
    return r if ("e" in r or "E" in r) else r + "e0"


# cell-table column names (shared by the Spark DataFrame and the DuckDB
# inline VALUES relation)
CELL_COLS = ("gi", "gj", "p00la", "p10la", "p01la", "p11la",
             "p00lo", "p10lo", "p01lo", "p11lo")


def cell_arrays(sub: dict) -> dict:
    """Vectorized cell-table columns: one entry per grid CELL, corner
    shifts p<row><col> with row 0 = south edge, col 0 = east edge of
    the cell (float32 wire values widened exactly to float64).
    Numpy-sliced, no python loop — a file-scale grid (NOAA conus
    ~1.2M cells) materializes in milliseconds."""
    import numpy as np

    la = sub["lat_shift"].astype("f8")
    lo = sub["lon_shift"].astype("f8")
    nr, nc = sub["nrows"] - 1, sub["ncols"] - 1
    gi, gj = np.meshgrid(np.arange(nr, dtype="i8"),
                         np.arange(nc, dtype="i8"), indexing="ij")
    return {
        "gi": gi.ravel(), "gj": gj.ravel(),
        "p00la": la[:-1, :-1].ravel(), "p10la": la[1:, :-1].ravel(),
        "p01la": la[:-1, 1:].ravel(), "p11la": la[1:, 1:].ravel(),
        "p00lo": lo[:-1, :-1].ravel(), "p10lo": lo[1:, :-1].ravel(),
        "p01lo": lo[:-1, 1:].ravel(), "p11lo": lo[1:, 1:].ravel(),
    }


def cell_rows(sub: dict) -> list:
    """Tuple view of :func:`cell_arrays` (oracle VALUES emission and
    tests — fixture-size grids only)."""
    a = cell_arrays(sub)
    return list(zip(
        a["gi"].tolist(), a["gj"].tolist(),
        a["p00la"].tolist(), a["p10la"].tolist(),
        a["p01la"].tolist(), a["p11la"].tolist(),
        a["p00lo"].tolist(), a["p10lo"].tolist(),
        a["p01lo"].tolist(), a["p11lo"].tolist(),
    ))


def cell_df(spark, sub: dict) -> DataFrame:
    """Broadcast cell table. Built vectorized and shipped via Arrow;
    it broadcasts like any dimension table — the probe side never
    shuffles."""
    import pandas as pd

    pdf = pd.DataFrame(cell_arrays(sub), columns=list(CELL_COLS))
    return F.broadcast(spark.createDataFrame(pdf))


def cells_values_sql(sub: dict) -> str:
    """DuckDB inline relation with the SAME doubles as :func:`cell_df`.
    Every float uses the exponent-literal form (see :func:`_d`) so it
    parses straight to binary double instead of through DECIMAL."""
    vals = ", ".join(
        "(" + ", ".join([str(r[0]), str(r[1])] + [_d(v) for v in r[2:]]) + ")"
        for r in cell_rows(sub)
    )
    return f"(VALUES {vals}) AS cells({', '.join(CELL_COLS)})"


def bbox_filter_sql(sub: dict, lon: str, lat: str) -> str:
    return (
        f"(({lat}) * {_d(3600.0)} >= {_d(sub['s_lat'])} AND "
        f"({lat}) * {_d(3600.0)} <= {_d(sub['n_lat'])} AND "
        f"(-({lon})) * {_d(3600.0)} >= {_d(sub['e_long'])} AND "
        f"(-({lon})) * {_d(3600.0)} <= {_d(sub['w_long'])})"
    )


def stage1_exprs(sub: dict, lon: str, lat: str) -> dict:
    """ls/lw (arc-seconds) and clamped cell index gi/gj from lon/lat
    column text."""
    ls = f"(({lat}) * {_d(3600.0)})"
    lw = f"((-({lon})) * {_d(3600.0)})"
    gi = (f"CAST(LEAST(GREATEST(FLOOR(ROUND(({ls} - {_d(sub['s_lat'])})"
          f" / {_d(sub['lat_inc'])}, 9)), {_d(0.0)}),"
          f" {_d(sub['nrows'] - 2)}) AS BIGINT)")
    gj = (f"CAST(LEAST(GREATEST(FLOOR(ROUND(({lw} - {_d(sub['e_long'])})"
          f" / {_d(sub['long_inc'])}, 9)), {_d(0.0)}),"
          f" {_d(sub['ncols'] - 2)}) AS BIGINT)")
    return {"ls": ls, "lw": lw, "gi": gi, "gj": gj}


def stage2_exprs(sub: dict, ls: str = "ls", lw: str = "lw",
                 gi: str = "gi", gj: str = "gj") -> dict:
    """Bilinear Δφ″/Δλ″ from the joined corner columns + stage-1
    columns (referenced by NAME so neither engine re-inlines the
    index arithmetic)."""
    fy = (f"(({ls} - {_d(sub['s_lat'])}) / {_d(sub['lat_inc'])}"
          f" - CAST({gi} AS DOUBLE))")
    fx = (f"(({lw} - {_d(sub['e_long'])}) / {_d(sub['long_inc'])}"
          f" - CAST({gj} AS DOUBLE))")
    one = _d(1.0)

    def bilin(p00, p10, p01, p11):
        return (f"(({one} - {fy}) * (({one} - {fx}) * {p00} + {fx} * {p01})"
                f" + {fy} * (({one} - {fx}) * {p10} + {fx} * {p11}))")

    return {
        "dlat": bilin("p00la", "p10la", "p01la", "p11la"),
        "dlon": bilin("p00lo", "p10lo", "p01lo", "p11lo"),
    }


def _apply_fwd(lon: str, lat: str, dlat: str, dlon: str) -> tuple:
    """Forward combine: source-datum position + interpolated shift."""
    return (f"(({lon}) - {dlon} / {_d(3600.0)})",
            f"(({lat}) + {dlat} / {_d(3600.0)})")


def _apply_inv(tlon: str, tlat: str, dlat: str, dlon: str) -> tuple:
    """One inverse fixed-point step: target position minus the shift
    interpolated at the CURRENT GUESS (whose dlat/dlon these are)."""
    return (f"(({tlon}) + {dlon} / {_d(3600.0)})",
            f"(({tlat}) - {dlat} / {_d(3600.0)})")


# --------------------------------------------------------------------
# Spark side
# --------------------------------------------------------------------


def _lookup(df: DataFrame, cells: DataFrame, sub: dict,
            lon: str, lat: str, keep: list, out_lon: str, out_lat: str,
            combine) -> DataFrame:
    """One grid lookup: stage-1 index columns, broadcast join, stage-2
    combine into (out_lon, out_lat); ``keep`` columns ride along."""
    s1 = stage1_exprs(sub, lon, lat)
    staged = df.selectExpr(
        *keep, f"{lon} AS __glon", f"{lat} AS __glat",
        f"{s1['ls']} AS ls", f"{s1['lw']} AS lw",
        f"{s1['gi']} AS gi", f"{s1['gj']} AS gj",
    )
    joined = staged.join(cells, ["gi", "gj"])
    s2 = stage2_exprs(sub)
    nlon, nlat = combine("__glon", "__glat", s2["dlat"], s2["dlon"])
    return joined.selectExpr(
        *keep, f"{nlon} AS {out_lon}", f"{nlat} AS {out_lat}")


def shift_forward(df: DataFrame, cells: DataFrame, sub: dict,
                  lon: str = "lon", lat: str = "lat",
                  keep: list = ("cell_id",),
                  out_lon: str = "lon2", out_lat: str = "lat2") -> DataFrame:
    """SYSTEM_F → SYSTEM_T (e.g. NAD27 → NAD83/WGS84): one lookup at
    the source position. Out-of-grid rows are dropped (untransformable)."""
    df = df.where(F.expr(bbox_filter_sql(sub, lon, lat)))
    return _lookup(df, cells, sub, lon, lat, list(keep), out_lon, out_lat,
                   _apply_fwd)


def shift_inverse(df: DataFrame, cells: DataFrame, sub: dict,
                  lon: str = "lon", lat: str = "lat",
                  keep: list = ("cell_id",), iters: int = 3,
                  out_lon: str = "lon2", out_lat: str = "lat2") -> DataFrame:
    """SYSTEM_T → SYSTEM_F (e.g. WGS84 → NAD27): ``iters`` unrolled
    fixed-point lookups, guess₀ = target, guessₖ₊₁ = target ⊖
    shift(guessₖ). Each lookup is one broadcast hash join."""
    df = df.where(F.expr(bbox_filter_sql(sub, lon, lat)))
    keep = list(keep)
    cur = df.selectExpr(*keep, f"{lon} AS __tlon", f"{lat} AS __tlat",
                        f"{lon} AS __klon", f"{lat} AS __klat")
    for step in range(iters):
        last = step == iters - 1
        olon = out_lon if last else "__klon"
        olat = out_lat if last else "__klat"
        cur = _lookup(
            cur, cells, sub, "__klon", "__klat",
            keep + ["__tlon", "__tlat"], olon, olat,
            lambda _lo, _la, dlat, dlon: _apply_inv(
                "__tlon", "__tlat", dlat, dlon),
        )
    return cur.select(*keep, out_lon, out_lat)


# --------------------------------------------------------------------
# DuckDB side: the SAME emitters rendered as a CTE chain
# --------------------------------------------------------------------


def shift_duckdb_ctes(rel_in: str, sub: dict, direction: str,
                      lon: str = "lon", lat: str = "lat",
                      keep: tuple = ("cell_id",), iters: int = 3,
                      tag: str = "gs") -> tuple:
    """(ctes_sql, out_rel) replaying :func:`shift_forward` /
    :func:`shift_inverse` — identical expression text, identical join.
    The out relation carries (keep..., lon2, lat2); the inverse chain
    additionally carries its tlon/tlat bookkeeping columns, so select
    the named columns rather than *."""
    keep_sql = ", ".join(keep)
    parts = [
        f"{tag}_cells AS (SELECT * FROM {cells_values_sql(sub)})",
        f"{tag}_in AS (SELECT {keep_sql}, {lon} AS glon, {lat} AS glat "
        f"FROM {rel_in} WHERE {bbox_filter_sql(sub, lon, lat)})",
    ]

    def stage(n, rel, ilon, ilat, extra_keep, olon, olat, combine):
        s1 = stage1_exprs(sub, ilon, ilat)
        ek = ", ".join(extra_keep)
        ek = (ek + ", ") if ek else ""
        parts.append(
            f"{tag}_s{n}a AS (SELECT {keep_sql}, {ek}{ilon} AS xlon, "
            f"{ilat} AS xlat, {s1['ls']} AS ls, {s1['lw']} AS lw, "
            f"{s1['gi']} AS gi, {s1['gj']} AS gj FROM {rel})")
        s2 = stage2_exprs(sub, gi=f"{tag}_s{n}a.gi", gj=f"{tag}_s{n}a.gj")
        nlon, nlat = combine("xlon", "xlat", s2["dlat"], s2["dlon"])
        parts.append(
            f"{tag}_s{n} AS (SELECT {keep_sql}, {ek}{nlon} AS {olon}, "
            f"{nlat} AS {olat} FROM {tag}_s{n}a JOIN {tag}_cells "
            f"ON {tag}_s{n}a.gi = {tag}_cells.gi "
            f"AND {tag}_s{n}a.gj = {tag}_cells.gj)")
        return f"{tag}_s{n}"

    if direction == "forward":
        out = stage(1, f"{tag}_in", "glon", "glat", [], "lon2", "lat2",
                    _apply_fwd)
    elif direction == "inverse":
        # seed: guess = target
        parts.append(
            f"{tag}_in0 AS (SELECT {keep_sql}, glon AS tlon, glat AS tlat, "
            f"glon AS klon, glat AS klat FROM {tag}_in)")
        rel = f"{tag}_in0"
        for step in range(iters):
            last = step == iters - 1
            olon = "lon2" if last else "klon"
            olat = "lat2" if last else "klat"
            rel = stage(
                step + 1, rel, "klon", "klat", ["tlon", "tlat"],
                olon, olat,
                lambda _lo, _la, dlat, dlon: _apply_inv(
                    "tlon", "tlat", dlat, dlon),
            )
        out = rel
    else:
        raise ValueError(f"direction must be forward/inverse, got {direction!r}")
    return ",\n    ".join(parts), out


# --------------------------------------------------------------------
# Multi-subgrid files (parent/child refinement): PROJ picks, per
# point, the DENSEST subgrid containing it (a child refines a region
# of its parent). With the subgrid count known at plan time the
# selection is a literal CASE chain — no extra join, no shuffle:
#
#   gid = CASE WHEN bbox(densest) THEN 0 WHEN bbox(next) THEN 1 ... END
#   gi/gj = CASE gid ... END        (each arm the grid's own literals)
#
# and ONE broadcast join on (gid, gi, gj) against the union cell
# table, whose rows carry their grid's bounds/increments as columns so
# the bilinear stage reads them post-join. The single-subgrid
# emitters above stay as the tight-literal fast path (the 99% case,
# and the one q_regrid_nad27's oracle parity is pinned to).
# --------------------------------------------------------------------

MULTI_CELL_COLS = ("gid",) + CELL_COLS[:2] + (
    "g_slat", "g_latinc", "g_elong", "g_loninc") + CELL_COLS[2:]


def order_subgrids(subs: list) -> list:
    """Selection priority for the first-match-wins CASE chain:
    ``file_rank`` first (a +nadgrids comma list tries FILES in order —
    PROJ hgrid; single-file inputs carry no rank and collapse to the
    old ordering), then densest first (cell area ascending) within a
    file; ties keep record order REVERSED so a later (child) subgrid
    wins over its parent — the NTv2 convention that children follow
    their parent record."""
    return sorted(
        range(len(subs)),
        key=lambda i: (subs[i].get("file_rank", 0),
                       subs[i]["lat_inc"] * subs[i]["long_inc"],
                       -i),
    )


def multi_cell_arrays(subs: list) -> dict:
    import numpy as np

    parts = []
    for gid, si in enumerate(order_subgrids(subs)):
        s = subs[si]
        a = cell_arrays(s)
        n = a["gi"].shape[0]
        a2 = {"gid": np.full(n, gid, dtype="i8"),
              "gi": a["gi"], "gj": a["gj"],
              "g_slat": np.full(n, float(s["s_lat"])),
              "g_latinc": np.full(n, float(s["lat_inc"])),
              "g_elong": np.full(n, float(s["e_long"])),
              "g_loninc": np.full(n, float(s["long_inc"]))}
        a2.update({k: a[k] for k in CELL_COLS[2:]})
        parts.append(a2)
    return {c: np.concatenate([p[c] for p in parts])
            for c in MULTI_CELL_COLS}


def multi_cell_rows(subs: list) -> list:
    a = multi_cell_arrays(subs)
    return list(zip(*(a[c].tolist() for c in MULTI_CELL_COLS)))


def multi_cell_df(spark, subs: list) -> DataFrame:
    import pandas as pd

    pdf = pd.DataFrame(multi_cell_arrays(subs),
                       columns=list(MULTI_CELL_COLS))
    return F.broadcast(spark.createDataFrame(pdf))


def multi_cells_values_sql(subs: list) -> str:
    vals = ", ".join(
        "(" + ", ".join(
            [str(r[0]), str(r[1]), str(r[2])]
            + [_d(v) for v in r[3:]]
        ) + ")"
        for r in multi_cell_rows(subs)
    )
    return f"(VALUES {vals}) AS cells({', '.join(MULTI_CELL_COLS)})"


def multi_bbox_filter_sql(subs: list, lon: str, lat: str) -> str:
    """In at least ONE subgrid (PROJ: otherwise untransformable)."""
    return "(" + " OR ".join(
        bbox_filter_sql(s, lon, lat) for s in subs) + ")"


def fallback_covers_union(subs: list, ordered_idx: list = None) -> bool:
    """Plan-time soundness test for the out-of-every-bbox ELSE arm:
    the selection-LAST grid (lowest priority — the parent in a
    parent/child file, or the trailing ``null`` identity grid of a
    comma list) must contain every other grid's bbox. True for the
    files the clamp semantics were designed for; FALSE for tiled
    national files and disjoint multi-file lists, where extrapolating
    a wandering inverse guess from an arbitrary far-away tile would
    produce garbage — there the lookup DROPS the point instead,
    which is what PROJ does when an iteration step exits the grid.
    ``ordered_idx``: pass :func:`order_subgrids`' result when the
    caller already computed it (avoids a per-point re-sort in the
    scalar twins)."""
    if ordered_idx is None:
        ordered_idx = order_subgrids(subs)
    ordered = [subs[si] for si in ordered_idx]
    c = ordered[-1]
    return all(
        c["s_lat"] <= s["s_lat"] and c["n_lat"] >= s["n_lat"]
        and c["e_long"] <= s["e_long"] and c["w_long"] >= s["w_long"]
        for s in ordered)


def multi_stage1_exprs(subs: list, lon: str, lat: str) -> dict:
    """ls/lw plus the literal selection CASE chains: gid picks the
    first-match (file_rank, density) subgrid, gi/gj index within it.
    When the coarsest grid covers the union domain
    (:func:`fallback_covers_union` — parent/child files, lists ending
    in ``null``), the ELSE arm falls back to it, whose clamped gi/gj
    extrapolate from its edge cell — without that, an inverse
    fixed-point guess wandering a few arc-seconds outside every bbox
    would silently DROP an edge row the single-subgrid path keeps via
    its clamp (code-review r13 finding 3). When NO grid covers the
    union (tiled national files, disjoint lists) the CASE has no ELSE:
    gid goes NULL and the join drops the point, exactly PROJ's
    behavior for an iteration step that exits the grids. The
    row-level bbox filter on the input position still gates what
    enters the pipeline."""
    oidx = order_subgrids(subs)
    ordered = [subs[si] for si in oidx]
    covered = fallback_covers_union(subs, oidx)
    ls = f"(({lat}) * {_d(3600.0)})"
    lw = f"((-({lon})) * {_d(3600.0)})"
    gid = "CASE " + " ".join(
        f"WHEN {bbox_filter_sql(s, lon, lat)} THEN {g}"
        for g, s in enumerate(ordered)
    ) + (f" ELSE {len(ordered) - 1} END" if covered else " END")

    def idx_case(key):
        arms = []
        for g, s in enumerate(ordered):
            e = stage1_exprs(s, lon, lat)[key]
            if covered and g == len(ordered) - 1:
                arms.append(f"ELSE {e}")
            else:
                arms.append(f"WHEN {g} THEN {e}")
        return f"CASE ({gid}) " + " ".join(arms) + " END"

    return {"ls": ls, "lw": lw, "gid": gid,
            "gi": idx_case("gi"), "gj": idx_case("gj")}


def multi_stage2_exprs(ls: str = "ls", lw: str = "lw",
                       gi: str = "gi", gj: str = "gj") -> dict:
    """Bilinear Δφ″/Δλ″ reading the selected grid's bounds/increments
    from the joined cell-row columns (g_slat/g_latinc/g_elong/
    g_loninc) — same arithmetic text in both engines."""
    fy = f"(({ls} - g_slat) / g_latinc - CAST({gi} AS DOUBLE))"
    fx = f"(({lw} - g_elong) / g_loninc - CAST({gj} AS DOUBLE))"
    one = _d(1.0)

    def bilin(p00, p10, p01, p11):
        return (f"(({one} - {fy}) * (({one} - {fx}) * {p00} + {fx} * {p01})"
                f" + {fy} * (({one} - {fx}) * {p10} + {fx} * {p11}))")

    return {
        "dlat": bilin("p00la", "p10la", "p01la", "p11la"),
        "dlon": bilin("p00lo", "p10lo", "p01lo", "p11lo"),
    }


def _multi_lookup(df: DataFrame, cells: DataFrame, subs: list,
                  lon: str, lat: str, keep: list, out_lon: str,
                  out_lat: str, combine) -> DataFrame:
    s1 = multi_stage1_exprs(subs, lon, lat)
    staged = df.selectExpr(
        *keep, f"{lon} AS __glon", f"{lat} AS __glat",
        f"{s1['ls']} AS ls", f"{s1['lw']} AS lw",
        f"{s1['gid']} AS gid", f"{s1['gi']} AS gi", f"{s1['gj']} AS gj",
    )
    joined = staged.join(cells, ["gid", "gi", "gj"])
    s2 = multi_stage2_exprs()
    nlon, nlat = combine("__glon", "__glat", s2["dlat"], s2["dlon"])
    return joined.selectExpr(
        *keep, f"{nlon} AS {out_lon}", f"{nlat} AS {out_lat}")


def shift_forward_multi(df: DataFrame, cells: DataFrame, subs: list,
                        lon: str = "lon", lat: str = "lat",
                        keep: list = ("cell_id",),
                        out_lon: str = "lon2",
                        out_lat: str = "lat2") -> DataFrame:
    df = df.where(F.expr(multi_bbox_filter_sql(subs, lon, lat)))
    return _multi_lookup(df, cells, subs, lon, lat, list(keep),
                         out_lon, out_lat, _apply_fwd)


def shift_inverse_multi(df: DataFrame, cells: DataFrame, subs: list,
                        lon: str = "lon", lat: str = "lat",
                        keep: list = ("cell_id",), iters: int = 3,
                        out_lon: str = "lon2",
                        out_lat: str = "lat2") -> DataFrame:
    df = df.where(F.expr(multi_bbox_filter_sql(subs, lon, lat)))
    keep = list(keep)
    cur = df.selectExpr(*keep, f"{lon} AS __tlon", f"{lat} AS __tlat",
                        f"{lon} AS __klon", f"{lat} AS __klat")
    for step in range(iters):
        last = step == iters - 1
        olon = out_lon if last else "__klon"
        olat = out_lat if last else "__klat"
        cur = _multi_lookup(
            cur, cells, subs, "__klon", "__klat",
            keep + ["__tlon", "__tlat"], olon, olat,
            lambda _lo, _la, dlat, dlon: _apply_inv(
                "__tlon", "__tlat", dlat, dlon),
        )
    return cur.select(*keep, out_lon, out_lat)


def shift_duckdb_ctes_multi(rel_in: str, subs: list, direction: str,
                            lon: str = "lon", lat: str = "lat",
                            keep: tuple = ("cell_id",), iters: int = 3,
                            tag: str = "gs") -> tuple:
    """Multi-subgrid DuckDB twin of :func:`shift_duckdb_ctes` — the
    SAME emitters rendered as a CTE chain."""
    keep_sql = ", ".join(keep)
    parts = [
        f"{tag}_cells AS (SELECT * FROM {multi_cells_values_sql(subs)})",
        f"{tag}_in AS (SELECT {keep_sql}, {lon} AS glon, {lat} AS glat "
        f"FROM {rel_in} WHERE {multi_bbox_filter_sql(subs, lon, lat)})",
    ]

    def stage(n, rel, ilon, ilat, extra_keep, olon, olat, combine):
        s1 = multi_stage1_exprs(subs, ilon, ilat)
        ek = ", ".join(extra_keep)
        ek = (ek + ", ") if ek else ""
        parts.append(
            f"{tag}_s{n}a AS (SELECT {keep_sql}, {ek}{ilon} AS xlon, "
            f"{ilat} AS xlat, {s1['ls']} AS ls, {s1['lw']} AS lw, "
            f"{s1['gid']} AS gid, {s1['gi']} AS gi, {s1['gj']} AS gj "
            f"FROM {rel})")
        s2 = multi_stage2_exprs(gi=f"{tag}_s{n}a.gi",
                                gj=f"{tag}_s{n}a.gj")
        nlon, nlat = combine("xlon", "xlat", s2["dlat"], s2["dlon"])
        parts.append(
            f"{tag}_s{n} AS (SELECT {keep_sql}, {ek}{nlon} AS {olon}, "
            f"{nlat} AS {olat} FROM {tag}_s{n}a JOIN {tag}_cells "
            f"ON {tag}_s{n}a.gid = {tag}_cells.gid "
            f"AND {tag}_s{n}a.gi = {tag}_cells.gi "
            f"AND {tag}_s{n}a.gj = {tag}_cells.gj)")
        return f"{tag}_s{n}"

    if direction == "forward":
        out = stage(1, f"{tag}_in", "glon", "glat", [], "lon2", "lat2",
                    _apply_fwd)
    elif direction == "inverse":
        parts.append(
            f"{tag}_in0 AS (SELECT {keep_sql}, glon AS tlon, "
            f"glat AS tlat, glon AS klon, glat AS klat FROM {tag}_in)")
        rel = f"{tag}_in0"
        for step in range(iters):
            last = step == iters - 1
            olon = "lon2" if last else "klon"
            olat = "lat2" if last else "klat"
            rel = stage(step + 1, rel, "klon", "klat",
                        ["tlon", "tlat"], olon, olat,
                        lambda _lo, _la, dlat, dlon: _apply_inv(
                            "tlon", "tlat", dlat, dlon))
        out = rel
    else:
        raise ValueError(f"direction must be forward/inverse, got {direction!r}")
    return ",\n    ".join(parts), out


def in_any_subgrid(subs: list, lon: float, lat: float) -> bool:
    """The scalar twin of multi_bbox_filter_sql (the ENTRY gate)."""
    ls, lw = lat * 3600.0, -lon * 3600.0
    return any(s["s_lat"] <= ls <= s["n_lat"]
               and s["e_long"] <= lw <= s["w_long"] for s in subs)


def multi_interp_scalar(subs: list, lon: float, lat: float):
    """Float twin of the multi-grid selection + bilinear LOOKUP:
    first-match (file_rank, density) grid wins; a position outside
    every bbox falls back to the coarsest grid's clamped edge cell
    when that grid covers the union (the gid CASE's ELSE arm), else
    None — the point is dropped like the engine join and PROJ
    (the entry gate is :func:`in_any_subgrid`)."""
    ordered = order_subgrids(subs)
    for si in ordered:
        d = _interp_scalar(subs[si], lon, lat)
        if d is not None:
            return d
    if not fallback_covers_union(subs, ordered):
        return None
    return _interp_scalar(subs[ordered[-1]], lon, lat, clamp=True)


def forward_scalar_multi(subs: list, lon: float, lat: float):
    if not in_any_subgrid(subs, lon, lat):
        return None
    dlat, dlon = multi_interp_scalar(subs, lon, lat)
    return lon - dlon / 3600.0, lat + dlat / 3600.0


def inverse_scalar_multi(subs: list, lon: float, lat: float,
                         iters: int = 3):
    if not in_any_subgrid(subs, lon, lat):
        return None
    klon, klat = lon, lat
    for _ in range(iters):
        d = multi_interp_scalar(subs, klon, klat)
        if d is None:
            # an iteration step exited every grid and no covering
            # fallback exists — dropped, like the engine join / PROJ
            return None
        dlat, dlon = d
        klon, klat = lon + dlon / 3600.0, lat - dlat / 3600.0
    return klon, klat


# --------------------------------------------------------------------
# MANY-subgrid files (> 16 — Canada's national NTV2_0.GSB carries
# ~100): the plan-literal CASE-chain selection above explodes in
# Catalyst analysis when the gi/gj chains restate the index arithmetic
# per arm (measured: a 100-subgrid file never finished analyzing).
# This path keeps the selection FLAT and moves the per-grid constants
# into a second broadcast join:
#
#   gid  = LEAST(c_0, ..., c_{n-1}) where c_k = CASE WHEN bbox_k
#          THEN k ELSE miss END — one small predicate per subgrid, no
#          nesting, no restated arithmetic. `miss` mirrors the multi
#          path's ELSE rule (fallback_covers_union): n-1 (coarsest
#          grid clamp) when that grid covers the union, else the
#          sentinel n whose absent meta row DROPS the point like PROJ
#   join META on gid (broadcast; n rows) → the selected grid's
#          bounds/increments as COLUMNS
#   gi/gj = ONE expression over those columns (no CASE at all)
#   join CELLS on (gid, gi, gj) (broadcast) → bilinear stage reading
#          the meta columns, identical arithmetic to the multi path
#
# Two broadcast hash joins per lookup, zero extra shuffles, linear
# plan size in the subgrid count. Selection order (file_rank, density)
# comes from order_subgrids exactly like the multi path, so the two
# paths agree wherever both are legal (pinned by tests).
# --------------------------------------------------------------------

META_COLS = ("gid", "g_slat", "g_latinc", "g_elong", "g_loninc",
             "g_nr", "g_nc")


def meta_rows(subs: list) -> list:
    out = []
    for gid, si in enumerate(order_subgrids(subs)):
        s = subs[si]
        out.append((gid, float(s["s_lat"]), float(s["lat_inc"]),
                    float(s["e_long"]), float(s["long_inc"]),
                    s["nrows"], s["ncols"]))
    return out


def meta_df(spark, subs: list) -> DataFrame:
    import pandas as pd

    pdf = pd.DataFrame(meta_rows(subs), columns=list(META_COLS))
    return F.broadcast(spark.createDataFrame(pdf))


def meta_values_sql(subs: list) -> str:
    vals = ", ".join(
        "(" + ", ".join([str(r[0])] + [_d(v) for v in r[1:5]]
                        + [str(r[5]), str(r[6])]) + ")"
        for r in meta_rows(subs))
    return f"(VALUES {vals}) AS gmeta({', '.join(META_COLS)})"


def big_cell_arrays(subs: list) -> dict:
    """(gid, gi, gj, corner shifts) — like the multi cell table but
    WITHOUT the per-grid constants (those come from the meta join
    instead, so the two joins don't carry duplicate columns). Built
    directly per subgrid rather than subsetting multi_cell_arrays,
    which would materialize four n-cell constant columns only to
    drop them (~40 MB of transient work for a national-scale file)."""
    import numpy as np

    parts = []
    for gid, si in enumerate(order_subgrids(subs)):
        a = cell_arrays(subs[si])
        a2 = {"gid": np.full(a["gi"].shape[0], gid, dtype="i8")}
        a2.update(a)
        parts.append(a2)
    return {c: np.concatenate([p[c] for p in parts])
            for c in ("gid",) + CELL_COLS}


def big_cell_df(spark, subs: list) -> DataFrame:
    import pandas as pd

    pdf = pd.DataFrame(big_cell_arrays(subs),
                       columns=["gid"] + list(CELL_COLS))
    return F.broadcast(spark.createDataFrame(pdf))


def big_cells_values_sql(subs: list) -> str:
    a = big_cell_arrays(subs)
    cols = ("gid",) + CELL_COLS
    rows = zip(*(a[c].tolist() for c in cols))
    vals = ", ".join(
        "(" + ", ".join([str(r[0]), str(r[1]), str(r[2])]
                        + [_d(v) for v in r[3:]]) + ")"
        for r in rows)
    return f"(VALUES {vals}) AS cells({', '.join(cols)})"


def big_gid_expr(subs: list, lon: str, lat: str) -> str:
    """Flat first-match-wins selection: LEAST over one small CASE per
    subgrid (priority = order_subgrids index). The no-match value
    mirrors :func:`multi_stage1_exprs`'s ELSE rule: the coarsest grid
    when it covers the union, else the out-of-range sentinel ``n`` —
    no meta row carries gid ``n``, so the meta join DROPS the point
    (PROJ's behavior for an iteration step outside every grid)."""
    oidx = order_subgrids(subs)
    ordered = [subs[si] for si in oidx]
    n = len(ordered)
    miss = n - 1 if fallback_covers_union(subs, oidx) else n
    args = ", ".join(
        f"CASE WHEN {bbox_filter_sql(s, lon, lat)} THEN {g} ELSE {miss} END"
        for g, s in enumerate(ordered))
    return f"LEAST({args})"


def big_idx_exprs(ls: str = "ls", lw: str = "lw") -> dict:
    """gi/gj from the META-JOINED constants — one expression, no CASE.
    Same clamp-to-grid arithmetic as stage1_exprs with the literals
    replaced by the g_* columns."""
    gi = (f"CAST(LEAST(GREATEST(FLOOR(ROUND(({ls} - g_slat)"
          f" / g_latinc, 9)), {_d(0.0)}),"
          f" CAST(g_nr - 2 AS DOUBLE)) AS BIGINT)")
    gj = (f"CAST(LEAST(GREATEST(FLOOR(ROUND(({lw} - g_elong)"
          f" / g_loninc, 9)), {_d(0.0)}),"
          f" CAST(g_nc - 2 AS DOUBLE)) AS BIGINT)")
    return {"gi": gi, "gj": gj}


def _big_lookup(df: DataFrame, meta: DataFrame, cells: DataFrame,
                subs: list, lon: str, lat: str, keep: list,
                out_lon: str, out_lat: str, combine) -> DataFrame:
    ls = f"(({lat}) * {_d(3600.0)})"
    lw = f"((-({lon})) * {_d(3600.0)})"
    staged = df.selectExpr(
        *keep, f"{lon} AS __glon", f"{lat} AS __glat",
        f"{ls} AS ls", f"{lw} AS lw",
        f"{big_gid_expr(subs, lon, lat)} AS gid")
    withmeta = staged.join(meta, ["gid"])
    idx = big_idx_exprs()
    indexed = withmeta.selectExpr(
        *keep, "__glon", "__glat", "ls", "lw", "gid",
        "g_slat", "g_latinc", "g_elong", "g_loninc",
        f"{idx['gi']} AS gi", f"{idx['gj']} AS gj")
    joined = indexed.join(cells, ["gid", "gi", "gj"])
    s2 = multi_stage2_exprs()
    nlon, nlat = combine("__glon", "__glat", s2["dlat"], s2["dlon"])
    return joined.selectExpr(
        *keep, f"{nlon} AS {out_lon}", f"{nlat} AS {out_lat}")


def shift_forward_big(df: DataFrame, meta: DataFrame, cells: DataFrame,
                      subs: list, lon: str = "lon", lat: str = "lat",
                      keep: list = ("cell_id",), out_lon: str = "lon2",
                      out_lat: str = "lat2") -> DataFrame:
    df = df.where(F.expr(multi_bbox_filter_sql(subs, lon, lat)))
    return _big_lookup(df, meta, cells, subs, lon, lat, list(keep),
                       out_lon, out_lat, _apply_fwd)


def shift_inverse_big(df: DataFrame, meta: DataFrame, cells: DataFrame,
                      subs: list, lon: str = "lon", lat: str = "lat",
                      keep: list = ("cell_id",), iters: int = 3,
                      out_lon: str = "lon2",
                      out_lat: str = "lat2") -> DataFrame:
    df = df.where(F.expr(multi_bbox_filter_sql(subs, lon, lat)))
    keep = list(keep)
    cur = df.selectExpr(*keep, f"{lon} AS __tlon", f"{lat} AS __tlat",
                        f"{lon} AS __klon", f"{lat} AS __klat")
    for step in range(iters):
        last = step == iters - 1
        olon = out_lon if last else "__klon"
        olat = out_lat if last else "__klat"
        cur = _big_lookup(
            cur, meta, cells, subs, "__klon", "__klat",
            keep + ["__tlon", "__tlat"], olon, olat,
            lambda _lo, _la, dlat, dlon: _apply_inv(
                "__tlon", "__tlat", dlat, dlon))
    return cur.select(*keep, out_lon, out_lat)


def shift_duckdb_ctes_big(rel_in: str, subs: list, direction: str,
                          lon: str = "lon", lat: str = "lat",
                          keep: tuple = ("cell_id",), iters: int = 3,
                          tag: str = "gs") -> tuple:
    """DuckDB twin of the big path — identical expression text,
    identical two-join shape."""
    keep_sql = ", ".join(keep)
    parts = [
        f"{tag}_meta AS (SELECT * FROM {meta_values_sql(subs)})",
        f"{tag}_cells AS (SELECT * FROM {big_cells_values_sql(subs)})",
        f"{tag}_in AS (SELECT {keep_sql}, {lon} AS glon, {lat} AS glat "
        f"FROM {rel_in} WHERE {multi_bbox_filter_sql(subs, lon, lat)})",
    ]

    def stage(n, rel, ilon, ilat, extra_keep, olon, olat, combine):
        ek = ", ".join(extra_keep)
        ek = (ek + ", ") if ek else ""
        ls = f"(({ilat}) * {_d(3600.0)})"
        lw = f"((-({ilon})) * {_d(3600.0)})"
        parts.append(
            f"{tag}_s{n}a AS (SELECT {keep_sql}, {ek}{ilon} AS xlon, "
            f"{ilat} AS xlat, {ls} AS ls, {lw} AS lw, "
            f"{big_gid_expr(subs, ilon, ilat)} AS gid FROM {rel})")
        idx = big_idx_exprs()
        parts.append(
            f"{tag}_s{n}b AS (SELECT {keep_sql}, {ek}xlon, xlat, ls, lw, "
            f"{tag}_s{n}a.gid AS gid, g_slat, g_latinc, g_elong, "
            f"g_loninc, {idx['gi']} AS gi, {idx['gj']} AS gj "
            f"FROM {tag}_s{n}a JOIN {tag}_meta "
            f"ON {tag}_s{n}a.gid = {tag}_meta.gid)")
        s2 = multi_stage2_exprs(gi=f"{tag}_s{n}b.gi",
                                gj=f"{tag}_s{n}b.gj")
        nlon, nlat = combine("xlon", "xlat", s2["dlat"], s2["dlon"])
        parts.append(
            f"{tag}_s{n} AS (SELECT {keep_sql}, {ek}{nlon} AS {olon}, "
            f"{nlat} AS {olat} FROM {tag}_s{n}b JOIN {tag}_cells "
            f"ON {tag}_s{n}b.gid = {tag}_cells.gid "
            f"AND {tag}_s{n}b.gi = {tag}_cells.gi "
            f"AND {tag}_s{n}b.gj = {tag}_cells.gj)")
        return f"{tag}_s{n}"

    if direction == "forward":
        out = stage(1, f"{tag}_in", "glon", "glat", [], "lon2", "lat2",
                    _apply_fwd)
    elif direction == "inverse":
        parts.append(
            f"{tag}_in0 AS (SELECT {keep_sql}, glon AS tlon, "
            f"glat AS tlat, glon AS klon, glat AS klat FROM {tag}_in)")
        rel = f"{tag}_in0"
        for step in range(iters):
            last = step == iters - 1
            olon = "lon2" if last else "klon"
            olat = "lat2" if last else "klat"
            rel = stage(step + 1, rel, "klon", "klat",
                        ["tlon", "tlat"], olon, olat,
                        lambda _lo, _la, dlat, dlon: _apply_inv(
                            "tlon", "tlat", dlat, dlon))
        out = rel
    else:
        raise ValueError(f"direction must be forward/inverse, got {direction!r}")
    return ",\n    ".join(parts), out


# --------------------------------------------------------------------
# VERTICAL grids (GTX — sources/gtx.py): heights move by the bilinear
# value at the point's horizontal position, the position itself is
# unchanged, so both directions are a SINGLE lookup (no fixed point).
# GTX indexes east-positive from a [0,360) west origin with columns
# west→east — its own stage-1 emitters below; the bilinear stage and
# the broadcast-join shape are the same as the horizontal path.
# Grids spanning the 0/360 seam would need a wrapped index; the guard
# in vcell-building keeps that loud.
# --------------------------------------------------------------------

VCELL_COLS = ("gi", "gj", "p00", "p10", "p01", "p11")


def vcell_arrays(g: dict) -> dict:
    import numpy as np

    lon_max = g["lon0"] + (g["ncols"] - 1) * g["dlon"]
    if (g["lon0"] < 0.0 or lon_max > 360.0
            or (lon_max == 360.0 and g["lon0"] > 0.0)):
        # the [0,360) wrap in _lon360 cannot address a grid with a
        # negative west origin or one touching/crossing the 0/360
        # seam — in-grid points would silently fail the bbox gate
        # (a NON-global grid ending exactly at 360 has an east-edge
        # meridian ≡ 0 that le can never reach); keep it loud
        # (normalize the grid's origin into [0, 360) and split
        # seam-crossing grids before registering). A GLOBAL grid
        # (lon0=0, lon_max=360) is safe: le ∈ [0, 360) always lands
        # inside it.
        raise NotImplementedError(
            f"GTX grid spans lon {g['lon0']}..{lon_max} — the [0,360) "
            "addressing cannot represent a negative origin or a grid "
            "touching the 0/360 seam; re-register with a normalized "
            "origin (split the grid at the seam if needed)")
    v = np.asarray(g["values"], dtype="f8")
    if np.isnan(v).any():
        raise NotImplementedError(
            "GTX grid has nodata cells inside the domain — mask the "
            "input to the valid region first (cells touching nodata "
            "corners would interpolate NaN silently)")
    nr, nc = g["nrows"] - 1, g["ncols"] - 1
    gi, gj = np.meshgrid(np.arange(nr, dtype="i8"),
                         np.arange(nc, dtype="i8"), indexing="ij")
    return {
        "gi": gi.ravel(), "gj": gj.ravel(),
        "p00": v[:-1, :-1].ravel(), "p10": v[1:, :-1].ravel(),
        "p01": v[:-1, 1:].ravel(), "p11": v[1:, 1:].ravel(),
    }


def vcell_df(spark, g: dict) -> DataFrame:
    import pandas as pd

    pdf = pd.DataFrame(vcell_arrays(g), columns=list(VCELL_COLS))
    return F.broadcast(spark.createDataFrame(pdf))


def vcells_values_sql(g: dict) -> str:
    a = vcell_arrays(g)
    rows = zip(*(a[c].tolist() for c in VCELL_COLS))
    vals = ", ".join(
        "(" + ", ".join([str(r[0]), str(r[1])] + [_d(x) for x in r[2:]])
        + ")" for r in rows)
    return f"(VALUES {vals}) AS vcells({', '.join(VCELL_COLS)})"


def _lon360(lon: str) -> str:
    """East longitude in the GTX [0,360) convention from a [-180,180]
    column — same text in both engines."""
    return (f"(CASE WHEN ({lon}) < {_d(0.0)} THEN ({lon}) + {_d(360.0)} "
            f"ELSE ({lon}) END)")


def vbbox_filter_sql(g: dict, lon: str, lat: str) -> str:
    lon_e = _lon360(lon)
    return (
        f"(({lat}) >= {_d(g['lat0'])} AND "
        f"({lat}) <= {_d(g['lat0'] + (g['nrows'] - 1) * g['dlat'])} AND "
        f"{lon_e} >= {_d(g['lon0'])} AND "
        f"{lon_e} <= {_d(g['lon0'] + (g['ncols'] - 1) * g['dlon'])})"
    )


def vstage1_exprs(g: dict, lon: str, lat: str) -> dict:
    le = _lon360(lon)
    gi = (f"CAST(LEAST(GREATEST(FLOOR(ROUND((({lat}) - {_d(g['lat0'])})"
          f" / {_d(g['dlat'])}, 9)), {_d(0.0)}),"
          f" {_d(g['nrows'] - 2)}) AS BIGINT)")
    gj = (f"CAST(LEAST(GREATEST(FLOOR(ROUND(({le} - {_d(g['lon0'])})"
          f" / {_d(g['dlon'])}, 9)), {_d(0.0)}),"
          f" {_d(g['ncols'] - 2)}) AS BIGINT)")
    return {"le": le, "gi": gi, "gj": gj}


def vstage2_expr(g: dict, lat: str = "xlat", le: str = "le",
                 gi: str = "gi", gj: str = "gj") -> str:
    """Bilinear N(lon, lat) from the joined corner columns."""
    fy = (f"((({lat}) - {_d(g['lat0'])}) / {_d(g['dlat'])}"
          f" - CAST({gi} AS DOUBLE))")
    fx = (f"(({le} - {_d(g['lon0'])}) / {_d(g['dlon'])}"
          f" - CAST({gj} AS DOUBLE))")
    one = _d(1.0)
    return (f"(({one} - {fy}) * (({one} - {fx}) * p00 + {fx} * p01)"
            f" + {fy} * (({one} - {fx}) * p10 + {fx} * p11))")


def vshift(df: DataFrame, vcells: DataFrame, g: dict,
           lon: str = "lon", lat: str = "lat", height: str = "value",
           keep: list = ("event_id",), direction: str = "forward",
           out_n: str = "n_geoid", out_h: str = "h_out") -> DataFrame:
    """Vertical shift: ``forward`` adds N (orthometric → ellipsoidal),
    ``inverse`` subtracts it. ONE broadcast hash join; out-of-grid
    rows are dropped (PROJ reports them untransformable)."""
    if direction not in ("forward", "inverse"):
        raise ValueError(
            f"direction must be forward/inverse, got {direction!r}")
    df = df.where(F.expr(vbbox_filter_sql(g, lon, lat)))
    s1 = vstage1_exprs(g, lon, lat)
    staged = df.selectExpr(
        *keep, f"{height} AS __h", f"({lat}) AS xlat",
        f"{s1['le']} AS le", f"{s1['gi']} AS gi", f"{s1['gj']} AS gj")
    joined = staged.join(vcells, ["gi", "gj"])
    n = vstage2_expr(g)
    sign = "+" if direction == "forward" else "-"
    return joined.selectExpr(
        *keep, f"{n} AS {out_n}", f"(__h {sign} {n}) AS {out_h}")


def vshift_duckdb_ctes(rel_in: str, g: dict, direction: str = "forward",
                       lon: str = "lon", lat: str = "lat",
                       height: str = "value",
                       keep: tuple = ("event_id",),
                       out_n: str = "n_geoid", out_h: str = "h_out",
                       tag: str = "vs") -> tuple:
    """(ctes_sql, out_rel) replaying :func:`vshift` with identical
    expression text."""
    if direction not in ("forward", "inverse"):
        raise ValueError(
            f"direction must be forward/inverse, got {direction!r}")
    keep_sql = ", ".join(keep)
    s1 = vstage1_exprs(g, lon, lat)
    n = vstage2_expr(g, gi=f"{tag}_a.gi", gj=f"{tag}_a.gj")
    sign = "+" if direction == "forward" else "-"
    parts = [
        f"{tag}_cells AS (SELECT * FROM {vcells_values_sql(g)})",
        f"{tag}_a AS (SELECT {keep_sql}, {height} AS __h, "
        f"({lat}) AS xlat, {s1['le']} AS le, {s1['gi']} AS gi, "
        f"{s1['gj']} AS gj FROM {rel_in} "
        f"WHERE {vbbox_filter_sql(g, lon, lat)})",
        f"{tag}_out AS (SELECT {keep_sql}, {n} AS {out_n}, "
        f"(__h {sign} {n}) AS {out_h} FROM {tag}_a JOIN {tag}_cells "
        f"ON {tag}_a.gi = {tag}_cells.gi AND {tag}_a.gj = {tag}_cells.gj)",
    ]
    return ",\n    ".join(parts), f"{tag}_out"


def vinterp_scalar(g: dict, lon: float, lat: float):
    """Driver-side float twin of the vertical lookup; None outside."""
    import math

    le = lon + 360.0 if lon < 0.0 else lon
    lat_max = g["lat0"] + (g["nrows"] - 1) * g["dlat"]
    lon_max = g["lon0"] + (g["ncols"] - 1) * g["dlon"]
    if not (g["lat0"] <= lat <= lat_max and g["lon0"] <= le <= lon_max):
        return None
    gi = int(min(max(math.floor(round((lat - g["lat0"]) / g["dlat"], 9)), 0.0),
                 float(g["nrows"] - 2)))
    gj = int(min(max(math.floor(round((le - g["lon0"]) / g["dlon"], 9)), 0.0),
                 float(g["ncols"] - 2)))
    fy = (lat - g["lat0"]) / g["dlat"] - float(gi)
    fx = (le - g["lon0"]) / g["dlon"] - float(gj)
    v = g["values"]
    return ((1.0 - fy) * ((1.0 - fx) * float(v[gi, gj]) + fx * float(v[gi, gj + 1]))
            + fy * ((1.0 - fx) * float(v[gi + 1, gj]) + fx * float(v[gi + 1, gj + 1])))


# --------------------------------------------------------------------
# Driver-side float twins (tests, plan-time geometry)
# --------------------------------------------------------------------


def _interp_scalar(sub: dict, lon: float, lat: float,
                   clamp: bool = False) -> tuple:
    ls, lw = lat * 3600.0, -lon * 3600.0
    if not clamp and not (sub["s_lat"] <= ls <= sub["n_lat"]
                          and sub["e_long"] <= lw <= sub["w_long"]):
        return None
    import math

    gi = int(min(max(math.floor(round((ls - sub["s_lat"]) / sub["lat_inc"], 9)), 0.0),
                 float(sub["nrows"] - 2)))
    gj = int(min(max(math.floor(round((lw - sub["e_long"]) / sub["long_inc"], 9)), 0.0),
                 float(sub["ncols"] - 2)))
    fy = (ls - sub["s_lat"]) / sub["lat_inc"] - float(gi)
    fx = (lw - sub["e_long"]) / sub["long_inc"] - float(gj)
    la, lo = sub["lat_shift"], sub["lon_shift"]

    def bilin(p):
        return ((1.0 - fy) * ((1.0 - fx) * float(p[gi, gj]) + fx * float(p[gi, gj + 1]))
                + fy * ((1.0 - fx) * float(p[gi + 1, gj]) + fx * float(p[gi + 1, gj + 1])))

    return bilin(la), bilin(lo)


def forward_scalar(sub: dict, lon: float, lat: float):
    d = _interp_scalar(sub, lon, lat)
    if d is None:
        return None
    dlat, dlon = d
    return lon - dlon / 3600.0, lat + dlat / 3600.0


def inverse_scalar(sub: dict, lon: float, lat: float, iters: int = 3):
    if _interp_scalar(sub, lon, lat) is None:
        return None
    klon, klat = lon, lat
    for _ in range(iters):
        d = _interp_scalar(sub, klon, klat)
        if d is None:
            return None
        dlat, dlon = d
        klon, klat = lon + dlon / 3600.0, lat - dlat / 3600.0
    return klon, klat
