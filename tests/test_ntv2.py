"""NTv2 grid-shift format + application tests (sources/ntv2.py,
operators/gridshift.py). Wire-format fields are pinned against the
public spec (NRCan NTv2 Developer's Guide layout as documented by the
PROJ/GDAL projects): 16-byte name/value records, arc-second bounds
with positive-west longitudes, float32 nodes ordered lon-fastest
east→west then south→north."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyresample_spark.operators import gridshift as GS
from pyresample_spark.sources import ntv2


def tiny_subgrid():
    """3x3-node grid over lat 40..42, lon 95..97W at 1.0 deg spacing,
    hand-picked node values for worked-example interpolation."""
    la = np.array([[0.5, 0.6, 0.7],
                   [0.8, 1.0, 1.2],
                   [1.1, 1.4, 1.7]], dtype=np.float32)
    lo = np.array([[2.0, 2.2, 2.4],
                   [2.6, 3.0, 3.4],
                   [3.2, 3.8, 4.4]], dtype=np.float32)
    return {
        "name": "TINY", "s_lat": 40.0 * 3600, "n_lat": 42.0 * 3600,
        "e_long": 95.0 * 3600, "w_long": 97.0 * 3600,
        "lat_inc": 3600.0, "long_inc": 3600.0,
        "lat_shift": la, "lon_shift": lo,
    }


def parsed_tiny():
    data = ntv2.ntv2_grid_bytes([tiny_subgrid()])
    return ntv2.parse_ntv2(data)["subgrids"][0]


# --------------------------------------------------------------------
# wire format
# --------------------------------------------------------------------


def test_overview_header_layout():
    data = ntv2.ntv2_grid_bytes([tiny_subgrid()], system_f="NAD27",
                                system_t="NAD83")
    # record 0: NUM_OREC = 11 (the endianness probe anchor)
    assert data[0:8] == b"NUM_OREC"
    assert struct.unpack_from("<i", data, 8)[0] == 11
    assert data[16:24] == b"NUM_SREC"
    assert data[48:56] == b"GS_TYPE "
    assert data[56:64] == b"SECONDS "
    assert data[80:88] == b"SYSTEM_F"
    assert data[88:96].rstrip() == b"NAD27"
    # MAJOR_F record: Clarke 1866 semi-major
    assert data[112:120] == b"MAJOR_F "
    assert struct.unpack_from("<d", data, 120)[0] == 6378206.4


def test_subgrid_header_and_node_layout():
    data = ntv2.ntv2_grid_bytes([tiny_subgrid()])
    off = 11 * 16
    assert data[off:off + 8] == b"SUB_NAME"
    # S_LAT is subgrid record index 4, stored in arc-seconds
    so = off + 4 * 16
    assert data[so:so + 8] == b"S_LAT   "
    assert struct.unpack_from("<d", data, so + 8)[0] == 144000.0
    # GS_COUNT record index 10
    go = off + 10 * 16
    assert data[go:go + 8] == b"GS_COUNT"
    assert struct.unpack_from("<i", data, go + 8)[0] == 9
    # first node = (south, east) corner; lon fastest westward: second
    # node is one LONG_INC west of it
    n0 = off + 11 * 16
    lat0, lon0, _, _ = struct.unpack_from("<4f", data, n0)
    lat1, lon1, _, _ = struct.unpack_from("<4f", data, n0 + 16)
    assert (lat0, lon0) == (np.float32(0.5), np.float32(2.0))
    assert (lat1, lon1) == (np.float32(0.6), np.float32(2.2))


def test_roundtrip_both_endiannesses():
    sg = tiny_subgrid()
    for be in (False, True):
        g = ntv2.parse_ntv2(ntv2.ntv2_grid_bytes([sg], big_endian=be))
        assert g["system_f"] == "NAD27" and g["num_file"] == 1
        out = g["subgrids"][0]
        assert (out["nrows"], out["ncols"]) == (3, 3)
        assert np.array_equal(out["lat_shift"], sg["lat_shift"])
        assert np.array_equal(out["lon_shift"], sg["lon_shift"])


def test_corrupt_guards():
    good = ntv2.ntv2_grid_bytes([tiny_subgrid()])
    with pytest.raises(ValueError, match="too short"):
        ntv2.parse_ntv2(good[:100])
    with pytest.raises(ValueError, match="NUM_OREC"):
        ntv2.parse_ntv2(b"\x00" * 200)
    # flip GS_COUNT to disagree with the bounds
    bad = bytearray(good)
    struct.pack_into("<i", bad, 11 * 16 + 10 * 16 + 8, 12)
    with pytest.raises(ValueError, match="GS_COUNT"):
        ntv2.parse_ntv2(bytes(bad))
    # truncate the node block
    with pytest.raises(ValueError, match="truncated node block"):
        ntv2.parse_ntv2(good[: 11 * 16 + 11 * 16 + 2 * 16])
    # writer: array shape vs bounds mismatch
    sg = tiny_subgrid()
    sg["n_lat"] = 43.0 * 3600
    with pytest.raises(ValueError, match="imply"):
        ntv2.ntv2_grid_bytes([sg])


def test_multi_subgrid_parses_and_applies():
    child = dict(tiny_subgrid(), name="CHILD", parent="TINY")
    g = ntv2.parse_ntv2(ntv2.ntv2_grid_bytes([tiny_subgrid(), child]))
    assert [s["sub_name"] for s in g["subgrids"]] == ["TINY", "CHILD"]
    assert len(ntv2.apply_subgrids(g)) == 2
    # many-subgrid files no longer raise (they dispatch to the
    # flat-selection big path at the pipeline level); only absurd
    # counts are rejected
    many = ntv2.parse_ntv2(ntv2.ntv2_grid_bytes(
        [dict(tiny_subgrid(), name=f"G{i}") for i in range(17)]))
    assert len(ntv2.apply_subgrids(many)) == 17


def test_registry_unknown_raises():
    with pytest.raises(NotImplementedError,
                       match="no grid-shift grid registered"):
        ntv2.get_ntv2_grid("no_such_grid")
    # demo grid lazily self-registers
    assert ntv2.get_ntv2_grid("demo_conus")["subgrids"][0]["nrows"] == 21


# --------------------------------------------------------------------
# shift semantics (worked examples)
# --------------------------------------------------------------------


def test_node_exact_lookup():
    sub = parsed_tiny()
    # exactly on node (row 1 from south = 41N, col 1 from east = 96W)
    dlat, dlon = GS._interp_scalar(sub, -96.0, 41.0)
    assert dlat == float(np.float32(1.0)) and dlon == float(np.float32(3.0))


def test_bilinear_worked_example():
    sub = parsed_tiny()
    # lat 40.25, lon 96.75W: cell (0, 0)... lonw=96.75 -> gj=1, fx=0.75
    # gi=0, fy=0.25. Hand-interpolate the float32-widened corners.
    la = [float(np.float32(v)) for v in (0.6, 1.0, 0.7, 1.2)]  # p00,p10,p01,p11
    exp_dlat = ((1 - 0.25) * ((1 - 0.75) * la[0] + 0.75 * la[2])
                + 0.25 * ((1 - 0.75) * la[1] + 0.75 * la[3]))
    dlat, dlon = GS._interp_scalar(sub, -96.75, 40.25)
    assert dlat == pytest.approx(exp_dlat, abs=1e-15)


def test_shift_direction_conventions():
    """Positive lon shift is WEST: the forward (NAD27->NAD83) result
    must move the east-positive longitude WESTWARD (decrease it) and a
    positive lat shift must increase latitude."""
    sub = parsed_tiny()
    lon2, lat2 = GS.forward_scalar(sub, -96.0, 41.0)
    assert lon2 == -96.0 - 3.0 / 3600.0 * 1.0  # dlon=3.0" west
    assert lat2 == 41.0 + 1.0 / 3600.0


def test_inverse_fixed_point_roundtrips():
    sub = parsed_tiny()
    for lon, lat in [(-95.2, 40.1), (-96.5, 41.9), (-96.0, 41.0)]:
        f = GS.forward_scalar(sub, lon, lat)
        back = GS.inverse_scalar(sub, *f)
        assert back == pytest.approx((lon, lat), abs=1e-12)


def test_out_of_grid_returns_none():
    sub = parsed_tiny()
    assert GS.forward_scalar(sub, -98.0, 41.0) is None
    assert GS.inverse_scalar(sub, -96.0, 39.9) is None
    # north/west EDGES are in-grid (clamped into the last cell)
    assert GS.forward_scalar(sub, -97.0, 42.0) is not None


def test_cell_rows_corner_wiring():
    sub = parsed_tiny()
    rows = {(r[0], r[1]): r for r in GS.cell_rows(sub)}
    assert len(rows) == 4
    # cell (0,0): p00 = node(0,0)=0.5, p10 = node(1,0)=0.8,
    # p01 = node(0,1)=0.6, p11 = node(1,1)=1.0
    r = rows[(0, 0)]
    assert r[2:6] == (float(np.float32(0.5)), float(np.float32(0.8)),
                      float(np.float32(0.6)), float(np.float32(1.0)))


# --------------------------------------------------------------------
# CRS plumbing
# --------------------------------------------------------------------


def test_crs_nadgrids_parsing():
    from pyresample_spark.operators.crs import crs_nadgrids

    assert crs_nadgrids("+proj=lcc +lat_1=33 +lat_0=39 +ellps=clrk66") is None
    assert crs_nadgrids(
        "+proj=lcc +lat_1=33 +lat_0=39 +ellps=clrk66 +nadgrids=@demo_conus"
    ) == [("demo_conus", True)]
    # comma list: PROJ priority order, @-optional flags preserved
    assert crs_nadgrids(
        "+proj=lcc +lat_1=33 +ellps=clrk66 +nadgrids=a,@b,c"
    ) == [("a", False), ("b", True), ("c", False)]


def test_resolve_nadgrids_fallback_rules():
    # required missing name raises; optional missing is skipped
    with pytest.raises(NotImplementedError, match="no grid-shift grid"):
        ntv2.resolve_nadgrids([("no_such_grid", False)])
    subs = ntv2.resolve_nadgrids(
        [("no_such_grid", True), ("demo_conus", False)])
    assert len(subs) == 1 and subs[0]["file_rank"] == 0
    # all-optional, none registered
    with pytest.raises(NotImplementedError, match="none is registered"):
        ntv2.resolve_nadgrids([("nope1", True), ("nope2", True)])
    # two files: ranks follow LIST order, not density
    subs = ntv2.resolve_nadgrids(
        [("demo_conus", False), ("demo_nadcon", False)])
    assert [s["file_rank"] for s in subs] == [0, 1]


def test_comma_list_first_file_wins():
    """PROJ hgrid: the FIRST listed file containing a point wins even
    when a later file is denser there; points outside the first file
    fall through to the next."""
    from pyresample_spark.operators import gridshift as GS

    # demo_conus covers lon 100..90W; demo_nadcon covers 100..88W —
    # the 90..88W band exists ONLY in the nadcon file
    subs = ntv2.resolve_nadgrids(
        [("demo_conus", False), ("demo_nadcon", False)])
    in_both = GS.multi_interp_scalar(subs, -95.0, 40.0)
    only_first = GS._interp_scalar(
        ntv2.get_shift_grid("demo_conus")["subgrids"][0], -95.0, 40.0)
    assert in_both == only_first
    in_second = GS.multi_interp_scalar(subs, -88.5, 40.0)
    only_second = GS._interp_scalar(
        ntv2.get_shift_grid("demo_nadcon")["subgrids"][0], -88.5, 40.0)
    assert in_second == only_second
    assert GS.in_any_subgrid(subs, -88.5, 40.0)
    assert not GS.in_any_subgrid(subs, -87.0, 40.0)


def test_datum_specs_between_rejects_nadgrids():
    from pyresample_spark.operators.crs import datum_specs_between

    with pytest.raises(NotImplementedError, match="nadgrids"):
        datum_specs_between(
            "+proj=lcc +lat_1=33 +lat_0=39 +ellps=clrk66 +nadgrids=demo_conus",
            "+proj=stere +lat_0=90 +lat_ts=70 +ellps=WGS84",
        )


def test_gridshift_pipeline_rules():
    from pyresample_spark.operators.crs import gridshift_pipeline

    nad27 = "+proj=lcc +lat_1=33 +lat_0=39 +ellps=clrk66 +nadgrids=demo_conus"
    wgs = "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-96 +ellps=WGS84"
    assert gridshift_pipeline(wgs, wgs) is None
    gs = gridshift_pipeline(wgs, nad27)
    assert gs["src_subs"] is not None and gs["tgt_subs"] is None
    assert len(gs["src_subs"]) == 1
    assert gs["src_helmert"] is None and gs["tgt_helmert"] is None
    # grid side + Helmert side composes
    gs2 = gridshift_pipeline(
        "+proj=stere +lat_0=52 +lon_0=10 +ellps=bessel +datum=potsdam",
        nad27)
    assert gs2["tgt_helmert"] is not None and gs2["src_subs"] is not None
    # a multi-subgrid file flows through as the full list
    gs3 = gridshift_pipeline(
        wgs, nad27.replace("demo_conus", "demo_conus_multi"))
    assert len(gs3["src_subs"]) == 2
    # bare non-WGS84 other side raises loudly
    with pytest.raises(NotImplementedError, match="unknown"):
        gridshift_pipeline("+proj=stere +lat_0=90 +ellps=bessel", nad27)


def test_nad27_datum_token_names_workaround():
    from pyresample_spark.operators.crs import _resolve_datum_token

    with pytest.raises(NotImplementedError, match="nadgrids"):
        _resolve_datum_token({"datum": "NAD27"})


# --------------------------------------------------------------------
# multi-subgrid selection (parent/child refinement)
# --------------------------------------------------------------------


def _parsed_multi():
    return ntv2.parse_ntv2(ntv2.demo_ntv2_multi_grid_bytes())["subgrids"]


def test_densest_containing_grid_wins():
    from pyresample_spark.operators.gridshift import (
        _interp_scalar,
        multi_interp_scalar,
        order_subgrids,
    )

    subs = _parsed_multi()
    # child (0.25 deg) must order before parent (0.5 deg)
    assert order_subgrids(subs) == [1, 0]
    # inside the child window: child values, not parent's
    inside = multi_interp_scalar(subs, -95.0, 40.0)
    assert inside == _interp_scalar(subs[1], -95.0, 40.0)
    assert inside != _interp_scalar(subs[0], -95.0, 40.0)
    # outside the child, inside the parent: parent values
    outside = multi_interp_scalar(subs, -99.0, 36.0)
    assert outside == _interp_scalar(subs[0], -99.0, 36.0)
    assert _interp_scalar(subs[1], -99.0, 36.0) is None
    # outside both: untransformable
    # outside both bboxes the LOOKUP falls back to the coarsest grid's
    # clamped edge cell (the gid CASE's ELSE arm — keeps inverse
    # fixed-point guesses that wander past the edge); the ENTRY gate
    # still rejects such points outright
    from pyresample_spark.operators.gridshift import (
        forward_scalar_multi,
        in_any_subgrid,
    )

    assert not in_any_subgrid(subs, -89.0, 40.0)
    assert forward_scalar_multi(subs, -89.0, 40.0) is None
    clamped = multi_interp_scalar(subs, -89.0, 40.0)
    assert clamped == GS._interp_scalar(subs[0], -89.0, 40.0, clamp=True)


def test_multi_forward_inverse_scalar_roundtrip():
    from pyresample_spark.operators.gridshift import (
        forward_scalar_multi,
        inverse_scalar_multi,
    )

    subs = _parsed_multi()
    for lon, lat in [(-95.0, 40.0), (-99.0, 36.0), (-93.4, 41.8)]:
        f = forward_scalar_multi(subs, lon, lat)
        back = inverse_scalar_multi(subs, *f)
        assert back == pytest.approx((lon, lat), abs=1e-12)


def test_multi_gridshift_engine_parity(spark):
    """Spark multi-grid shift == DuckDB CTE twin == scalar twin,
    bit-exact, across child-interior, parent-only and boundary
    points, both directions."""
    import duckdb

    from pyresample_spark.operators import gridshift as GS

    subs = _parsed_multi()
    pts = ([(i, -99.7 + i * 0.53, 35.4 + (i * 0.41) % 9.2)
            for i in range(20)]
           + [(100, -95.0, 40.0), (101, -97.0, 42.0), (102, -93.0, 38.0)])
    df = spark.createDataFrame(pts, "cell_id long, lon double, lat double")
    cells = GS.multi_cell_df(spark, subs)
    fwd = GS.shift_forward_multi(df, cells, subs).orderBy("cell_id").collect()
    inv = GS.shift_inverse_multi(df, cells, subs).orderBy("cell_id").collect()

    con = duckdb.connect()
    vals = ", ".join(f"({i}, {lo!r}e0, {la!r}e0)" for i, lo, la in pts)
    base = f"pts AS (SELECT * FROM (VALUES {vals}) AS pts(cell_id, lon, lat))"
    c1, o1 = GS.shift_duckdb_ctes_multi("pts", subs, "forward")
    dk_f = con.execute(
        f"WITH {base},\n {c1}\nSELECT cell_id, lon2, lat2 FROM {o1} "
        "ORDER BY cell_id").fetchall()
    c2, o2 = GS.shift_duckdb_ctes_multi("pts", subs, "inverse")
    dk_i = con.execute(
        f"WITH {base},\n {c2}\nSELECT cell_id, lon2, lat2 FROM {o2} "
        "ORDER BY cell_id").fetchall()
    for sp, dd, tag in [(fwd, dk_f, "fwd"), (inv, dk_i, "inv")]:
        assert len(sp) == len(dd)
        for r, d in zip(sp, dd):
            assert (r["cell_id"], r["lon2"], r["lat2"]) == tuple(d), tag
    for r in fwd:
        lon, lat = next((p[1], p[2]) for p in pts if p[0] == r["cell_id"])
        s = GS.forward_scalar_multi(subs, lon, lat)
        assert s == (r["lon2"], r["lat2"])


def test_nadgrids_null_sentinel_is_noop():
    """'+nadgrids=null' and '@null' are PROJ's explicit identity pin —
    not a lookup of a grid named 'null', and (ADVICE r14) not a
    fall-through to +towgs84: the null-only list parses like any
    other and gridshift_pipeline skips BOTH the grid and Helmert
    legs, matching the '@missing,null' spelling."""
    from pyresample_spark.operators.crs import (
        crs_nadgrids,
        gridshift_pipeline,
    )

    base = "+proj=lcc +lat_1=33 +lat_0=39 +ellps=clrk66 "
    assert crs_nadgrids(base + "+nadgrids=null") == [("null", False)]
    assert crs_nadgrids(base + "+nadgrids=@null") == [("null", True)]
    # precedence: +nadgrids=null on a +towgs84-carrying CRS pins the
    # datum to identity — the Helmert leg must NOT run
    pinned = base + "+towgs84=598.1,73.7,418.2 +nadgrids=null"
    gs = gridshift_pipeline(pinned, "+proj=stere +lat_0=90 +ellps=WGS84")
    assert gs == {"tgt_subs": None, "src_subs": None,
                  "tgt_helmert": None, "src_helmert": None}
    # and both null spellings resolve to the flagged identity subgrid
    for names in ([("null", False)], [("null", True)]):
        subs = ntv2.resolve_nadgrids(names)
        assert len(subs) == 1 and subs[0]["identity"]


def test_nad27_geokeys_decode_with_clrk66():
    """Legacy NAD27 EPSG geokeys (UTM 26703-26722, geographic 4267)
    decode to clrk66-ellipsoid CRSs with the datum left unpinned —
    the user activates the shift by adding +nadgrids=; a datum-pinned
    counterpart hits the loud guard instead of a silent ~100 m smear."""
    from pyresample_spark.operators.crs import datum_specs_between
    from pyresample_spark.sources.binary_raster import _utm_crs

    crs = _utm_crs(26715)
    assert crs == "+proj=utm +zone=15 +ellps=clrk66"
    assert _utm_crs(26915) == "+proj=utm +zone=15 +ellps=GRS80"
    with pytest.raises(NotImplementedError, match="datum is unknown"):
        datum_specs_between(
            crs, "+proj=stere +lat_0=90 +lat_ts=70 +ellps=WGS84 "
                 "+towgs84=0,0,0")
    # with the grid registered, the same frame pair routes through the
    # gridshift pipeline
    from pyresample_spark.operators.crs import gridshift_pipeline

    gs = gridshift_pipeline(
        "+proj=stere +lat_0=90 +lat_ts=70 +ellps=WGS84",
        crs + " +nadgrids=demo_conus")
    assert gs is not None and len(gs["src_subs"]) == 1


def test_nad27_geographic_geokey():
    """GeographicTypeGeoKey 4267 (NAD27 geographic) keeps the Clarke
    1866 ellipsoid visible in the decoded CRS instead of silently
    treating NAD27 degrees as WGS84 degrees."""
    from pyresample_spark.sources.binary_raster import (
        area_from_geotiff,
        geotiff_bytes,
    )

    buf = geotiff_bytes(np.zeros((4, 4), dtype="<f4"), 0.5, 0.5,
                        -100.0, 45.0, crs="longlat")
    assert area_from_geotiff(buf, "t").crs == "longlat"
    # the writer emits GeographicType (2048) = 4326 as a key-directory
    # SHORT; retype it to 4267 in place (key rows are
    # (id, loc, count, value) shorts after the 4-short header)
    patched = bytearray(buf)
    i = patched.index(struct.pack("<HHHH", 2048, 0, 1, 4326))
    struct.pack_into("<HHHH", patched, i, 2048, 0, 1, 4267)
    area = area_from_geotiff(bytes(patched), "t")
    assert area.crs == "+proj=longlat +ellps=clrk66"


def test_independent_assembler_fixture():
    """VERDICT r13 item 4: an NTv2 file assembled HERE byte-by-byte
    from the published record layout (raw struct packs, big-endian,
    float64 values, trailing END record, parent/child pair with
    DIFFERENT creation metadata) — no call into ntv2_grid_bytes — must
    parse to the exact node values and apply correctly, so the
    reader's contract doesn't rest on its sibling writer's layout
    choices."""

    def rec(name, payload):
        return name.encode("ascii").ljust(8) + payload

    def s8(v):
        return v.encode("ascii").ljust(8)

    def i4(v):
        return struct.pack(">i", v) + b"\x00\x00\x00\x00"

    def f8(v):
        return struct.pack(">d", v)

    # parent 3x4 over lat 50..52N, lon 110..113W at 1 deg; child 3x3
    # refining lat 50..51N lon 111..112W at 0.5 deg
    pla = [[0.10, 0.20, 0.30, 0.40],
           [0.50, 0.60, 0.70, 0.80],
           [0.90, 1.00, 1.10, 1.20]]
    plo = [[2.00, 2.10, 2.20, 2.30],
           [2.40, 2.50, 2.60, 2.70],
           [2.80, 2.90, 3.00, 3.10]]
    cla = [[0.15, 0.25, 0.35],
           [0.45, 0.55, 0.65],
           [0.75, 0.85, 0.95]]
    clo = [[2.05, 2.15, 2.25],
           [2.35, 2.45, 2.55],
           [2.65, 2.75, 2.85]]

    def nodes(la, lo):
        out = b""
        for i in range(len(la)):
            for j in range(len(la[0])):
                out += struct.pack(">4f", la[i][j], lo[i][j],
                                   0.01, 0.02)
        return out

    buf = b"".join([
        rec("NUM_OREC", i4(11)),
        rec("NUM_SREC", i4(11)),
        rec("NUM_FILE", i4(2)),
        rec("GS_TYPE", s8("SECONDS")),
        rec("VERSION", s8("NTv2.1")),
        rec("SYSTEM_F", s8("ATS77")),
        rec("SYSTEM_T", s8("NAD83")),
        rec("MAJOR_F", f8(6378135.0)),
        rec("MINOR_F", f8(6356750.304922)),
        rec("MAJOR_T", f8(6378137.0)),
        rec("MINOR_T", f8(6356752.314)),
        rec("SUB_NAME", s8("INDPAR")),
        rec("PARENT", s8("NONE")),
        rec("CREATED", s8("19950101")),
        rec("UPDATED", s8("20011231")),
        rec("S_LAT", f8(50.0 * 3600)),
        rec("N_LAT", f8(52.0 * 3600)),
        rec("E_LONG", f8(110.0 * 3600)),
        rec("W_LONG", f8(113.0 * 3600)),
        rec("LAT_INC", f8(3600.0)),
        rec("LONG_INC", f8(3600.0)),
        rec("GS_COUNT", i4(12)),
        nodes(pla, plo),
        rec("SUB_NAME", s8("INDCHL")),
        rec("PARENT", s8("INDPAR")),
        rec("CREATED", s8("19950101")),
        rec("UPDATED", s8("20011231")),
        rec("S_LAT", f8(50.0 * 3600)),
        rec("N_LAT", f8(51.0 * 3600)),
        rec("E_LONG", f8(111.0 * 3600)),
        rec("W_LONG", f8(112.0 * 3600)),
        rec("LAT_INC", f8(1800.0)),
        rec("LONG_INC", f8(1800.0)),
        rec("GS_COUNT", i4(9)),
        nodes(cla, clo),
        rec("END", s8("")),
    ])

    g = ntv2.parse_ntv2(buf)
    assert g["system_f"] == "ATS77" and g["num_file"] == 2
    par, chl = g["subgrids"]
    assert (par["nrows"], par["ncols"]) == (3, 4)
    assert (chl["nrows"], chl["ncols"]) == (3, 3)
    assert chl["parent"] == "INDPAR"
    np.testing.assert_array_equal(
        par["lat_shift"], np.array(pla, dtype=np.float32))
    np.testing.assert_array_equal(
        chl["lon_shift"], np.array(clo, dtype=np.float32))
    np.testing.assert_array_equal(
        par["lat_acc"], np.full((3, 4), np.float32(0.01)))
    # application through the multi-grid selection: a point inside the
    # child window takes the child's denser field
    d_in = GS.multi_interp_scalar(g["subgrids"], -111.5, 50.5)
    d_chl = GS._interp_scalar(chl, -111.5, 50.5)
    assert d_in == d_chl
    d_out = GS.multi_interp_scalar(g["subgrids"], -112.5, 51.5)
    d_par = GS._interp_scalar(par, -112.5, 51.5)
    assert d_out == d_par


def test_writer_rejects_long_record_strings():
    sg = tiny_subgrid()
    sg["name"] = "TOO_LONG_NAME"
    with pytest.raises(ValueError, match="exceeds 8 ASCII"):
        ntv2.ntv2_grid_bytes([sg])


def test_big_path_agrees_with_multi_path(spark):
    """The flat LEAST-selection + meta-join path (>16-subgrid dispatch)
    must be BIT-IDENTICAL to the CASE-chain multi path on a file where
    both are legal — same ordering, same arithmetic, different plan
    shape — both directions."""
    from pyresample_spark.operators import gridshift as GS

    subs = _parsed_multi()
    pts = ([(i, -99.7 + i * 0.53, 35.4 + (i * 0.41) % 9.2)
            for i in range(20)]
           + [(100, -95.0, 40.0), (101, -97.0, 42.0), (102, -93.0, 38.0)])
    df = spark.createDataFrame(pts, "cell_id long, lon double, lat double")
    mcells = GS.multi_cell_df(spark, subs)
    meta = GS.meta_df(spark, subs)
    bcells = GS.big_cell_df(spark, subs)
    for direction in ("forward", "inverse"):
        if direction == "forward":
            a = GS.shift_forward_multi(df, mcells, subs)
            b = GS.shift_forward_big(df, meta, bcells, subs)
        else:
            a = GS.shift_inverse_multi(df, mcells, subs)
            b = GS.shift_inverse_big(df, meta, bcells, subs)
        ra = {r.cell_id: (r.lon2, r.lat2) for r in a.collect()}
        rb = {r.cell_id: (r.lon2, r.lat2) for r in b.collect()}
        assert ra == rb, f"{direction}: big != multi"


def test_national_scale_scalar_coverage():
    """Every tile of the 25-subgrid national fixture is selectable and
    the field is continuous across tile boundaries (shared global
    polynomial — shared edge nodes are value-equal)."""
    from pyresample_spark.operators import gridshift as GS

    subs = ntv2.parse_ntv2(ntv2.demo_ntv2_national_grid_bytes())["subgrids"]
    assert len(subs) == 25
    hit = set()
    for ti in range(5):
        for tj in range(5):
            lon = -(91.0 + 2.0 * tj)
            lat = 36.0 + 2.0 * ti
            d = GS.multi_interp_scalar(subs, lon, lat)
            assert d is not None
            hit.add((ti, tj))
    assert len(hit) == 25
    # boundary continuity: a point on the vertical seam between two
    # tiles interpolates identically from either side's clamped cell
    left = GS._interp_scalar(subs[0], -92.0, 36.0, clamp=True)
    right = GS._interp_scalar(subs[1], -92.0, 36.0, clamp=True)
    assert left == pytest.approx(right, abs=1e-12)


def test_nadgrids_null_fallback_identity():
    """"+nadgrids=conus,null" (the textbook PROJ idiom): points inside
    the real grid shift by it; points OUTSIDE pass through UNSHIFTED
    via the whole-world identity grid instead of being dropped
    (code-review r14 finding 1)."""
    from pyresample_spark.operators import gridshift as GS
    from pyresample_spark.operators.crs import crs_nadgrids

    names = crs_nadgrids(
        "+proj=lcc +lat_1=33 +ellps=clrk66 +nadgrids=demo_conus,null")
    assert names == [("demo_conus", False), ("null", False)]
    subs = ntv2.resolve_nadgrids(names)
    assert subs[-1]["sub_name"] == "NULL"
    # inside the real grid: shift applies
    inside = GS.forward_scalar_multi(subs, -95.0, 40.0)
    only = GS._interp_scalar(
        ntv2.get_shift_grid("demo_conus")["subgrids"][0], -95.0, 40.0)
    assert inside != (-95.0, 40.0) and only is not None
    # far outside: identity, NOT dropped
    assert GS.forward_scalar_multi(subs, 10.0, 50.0) == (10.0, 50.0)
    assert GS.inverse_scalar_multi(subs, 10.0, 50.0) == (10.0, 50.0)
    # a LONE null (or only-null list) parses as a real identity pin
    assert crs_nadgrids(
        "+proj=lcc +ellps=clrk66 +nadgrids=null") == [("null", False)]
    assert crs_nadgrids(
        "+proj=lcc +ellps=clrk66 +nadgrids=@null") == [("null", True)]
    # names after null are unreachable but still VALIDATED (PROJ
    # errors on any unloadable listed grid at CRS creation): a
    # required missing name raises, an @-optional one is skipped
    with pytest.raises(NotImplementedError, match="no grid-shift"):
        ntv2.resolve_nadgrids(
            [("demo_conus", False), ("null", False), ("no_such", False)])
    subs2 = ntv2.resolve_nadgrids(
        [("demo_conus", False), ("null", False), ("no_such", True),
         ("demo_nadcon", False)])
    assert [s["sub_name"] for s in subs2][-1] == "NULL"
    assert len(subs2) == 2  # conus + null; nadcon validated, unreachable


def test_fallback_coverage_rule():
    """ELSE-arm soundness (code-review r14 finding 3): parent/child
    files keep the clamped-parent fallback; tiled national files and
    disjoint lists DROP an out-of-every-bbox position like PROJ."""
    from pyresample_spark.operators import gridshift as GS

    parent_child = _parsed_multi()
    assert GS.fallback_covers_union(parent_child)
    # position just outside the parent still clamps (old behavior)
    assert GS.multi_interp_scalar(parent_child, -89.9, 40.0) is not None

    tiled = ntv2.parse_ntv2(ntv2.demo_ntv2_national_grid_bytes())["subgrids"]
    assert not GS.fallback_covers_union(tiled)
    # outside every tile: dropped, not extrapolated from a far tile
    assert GS.multi_interp_scalar(tiled, -89.9, 40.0) is None
    # with a trailing null grid the union IS covered again
    with_null = tiled + [dict(ntv2._null_subgrid(), file_rank=1)]
    assert GS.fallback_covers_union(with_null)
    assert GS.multi_interp_scalar(with_null, -89.9, 40.0) == (0.0, 0.0)


def test_registry_rejects_vertical_gtx_grid():
    """VERDICT r14 item 7: the +nadgrids registry must refuse a
    VERTICAL grid — registering a parse_gtx geoid surface under a
    horizontal name raises loudly (naming the vgridshift path)
    instead of failing obscurely at resolution time."""
    import pytest

    from pyresample_spark.sources.gtx import demo_gtx_grid_bytes, parse_gtx

    g = parse_gtx(demo_gtx_grid_bytes())
    with pytest.raises(ValueError, match="VERTICAL.*vgridshift"):
        ntv2.register_shift_grid("demo_geoid", g)
    # and the name never entered the registry, so +nadgrids= resolution
    # still raises its usual not-registered guard
    with pytest.raises(NotImplementedError, match="no grid-shift grid"):
        ntv2.resolve_nadgrids([("demo_geoid", False)])
    # near-miss shapes (empty list, missing shift fields) also refuse
    with pytest.raises(ValueError, match="not a horizontal"):
        ntv2.register_shift_grid("empty", {"subgrids": []})
    with pytest.raises(ValueError, match="not a horizontal"):
        ntv2.register_shift_grid(
            "half", {"subgrids": [{"s_lat": 0.0, "n_lat": 1.0}]})
