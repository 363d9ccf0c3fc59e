"""Analytic CRS registry: proj-string → forward/inverse column builders.

The reference delegates every coordinate transform to pyproj
(bucket/__init__.py:165, grid.py:119). This engine implements the CRS
families its test areas actually use as pure Catalyst column math —
longlat, eqc (plate carrée), polar stereographic, Lambert azimuthal
equal-area — and falls back to the Arrow-batched pyproj UDF
(operators/proj_udf.py) for anything else when pyproj is importable.

``forward(crs)``  → f(lon_col, lat_col) -> (x, y) columns
``inverse(crs)``  → f(x_col, y_col) -> (lon, lat) columns

Supported proj strings (whitespace-separated key=value, order-free):
- ``longlat`` (degrees pass-through)
- ``eqc`` / ``+proj=eqc``
- ``+proj=stere +lat_0=±90 [+lat_ts=..] [+lon_0=..]`` (polar aspects)
- ``+proj=laea [+lat_0=..] [+lon_0=..]``
- ``+proj=merc [+lat_ts=..] [+lon_0=..]``
- ``+proj=lcc +lat_1=.. [+lat_2=..] [+lat_0=..] [+lon_0=..]``
- ``+proj=geos [+h=..] [+lon_0=..] [+sweep=x|y]`` (full-disc; off-disc
  pixels are NULL-masked by the horizon condition)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyresample_spark.functions.geo import (
    R_EARTH,
    eqc_x,
    eqc_y,
    geos_inverse,
    geos_xy,
    laea_inverse,
    laea_x,
    laea_y,
    lcc_inverse,
    lcc_x,
    lcc_y,
    merc_inverse,
    merc_x,
    merc_y,
    stere_polar_inverse,
    stere_polar_x,
    stere_polar_y,
)


def _params(crs: str) -> dict:
    out = {}
    for tok in crs.split():
        tok = tok.lstrip("+")
        if "=" in tok:
            k, v = tok.split("=", 1)
            out[k] = v
        else:
            out.setdefault("proj", tok)
    return out


def _family(crs: str) -> str:
    p = _params(crs)
    proj = p.get("proj", crs.strip())
    if proj in ("longlat", "latlong", "lonlat"):
        return "longlat"
    if proj == "eqc":
        return "eqc"
    if proj == "stere":
        lat0 = float(p.get("lat_0", "90"))
        if abs(lat0) != 90.0:
            raise NotImplementedError(
                "only polar stereographic aspects are analytic; "
                "oblique stere needs pyproj"
            )
        return "stere"
    if proj == "laea":
        return "laea"
    if proj == "merc":
        return "merc"
    if proj == "lcc":
        return "lcc"
    if proj == "geos":
        return "geos"
    raise NotImplementedError(
        f"no analytic transform for CRS {crs!r} (pyproj UDF fallback "
        "in operators/proj_udf.py)"
    )


def forward(crs: str):
    """(lon, lat) → (x, y) column builder for an analytic CRS."""
    fam, p = _family(crs), _params(crs)
    if fam == "longlat":
        return lambda lon, lat: (F.col(lon) if isinstance(lon, str) else lon,
                                 F.col(lat) if isinstance(lat, str) else lat)
    if fam == "eqc":
        return lambda lon, lat: (eqc_x(lon), eqc_y(lat))
    if fam == "stere":
        lat0 = float(p.get("lat_0", "90"))
        lat_ts = float(p.get("lat_ts", lat0))
        lon_0 = float(p.get("lon_0", "0"))
        north = lat0 > 0
        return lambda lon, lat: (
            stere_polar_x(lon, lat, lat_ts=lat_ts, lon_0=lon_0, north=north),
            stere_polar_y(lon, lat, lat_ts=lat_ts, lon_0=lon_0, north=north),
        )
    if fam == "laea":
        lat0 = float(p.get("lat_0", "90"))
        lon_0 = float(p.get("lon_0", "0"))
        return lambda lon, lat: (
            laea_x(lon, lat, lat_0=lat0, lon_0=lon_0),
            laea_y(lon, lat, lat_0=lat0, lon_0=lon_0),
        )
    if fam == "merc":
        lat_ts = float(p.get("lat_ts", "0"))
        lon_0 = float(p.get("lon_0", "0"))
        return lambda lon, lat: (
            merc_x(lon, lat_ts=lat_ts, lon_0=lon_0),
            merc_y(lat, lat_ts=lat_ts),
        )
    if fam == "lcc":
        lat0 = float(p.get("lat_0", "0"))
        lat1 = float(p.get("lat_1", p.get("lat_0", "33")))
        lat2 = float(p["lat_2"]) if "lat_2" in p else None
        lon_0 = float(p.get("lon_0", "0"))
        return lambda lon, lat: (
            lcc_x(lon, lat, lat_0=lat0, lat_1=lat1, lat_2=lat2, lon_0=lon_0),
            lcc_y(lon, lat, lat_0=lat0, lat_1=lat1, lat_2=lat2, lon_0=lon_0),
        )
    # geos
    h = float(p.get("h", "35785831"))
    lon_0 = float(p.get("lon_0", "0"))
    sweep = p.get("sweep", "y")
    return lambda lon, lat: geos_xy(lon, lat, h=h, lon_0=lon_0, sweep=sweep)


def inverse(crs: str):
    """(x, y) → (lon, lat) column builder for an analytic CRS."""
    fam, p = _family(crs), _params(crs)
    if fam == "longlat":
        return lambda x, y: (F.col(x) if isinstance(x, str) else x,
                             F.col(y) if isinstance(y, str) else y)
    if fam == "eqc":
        return lambda x, y: (
            F.degrees((F.col(x) if isinstance(x, str) else x) / R_EARTH),
            F.degrees((F.col(y) if isinstance(y, str) else y) / R_EARTH),
        )
    if fam == "stere":
        lat0 = float(p.get("lat_0", "90"))
        lat_ts = float(p.get("lat_ts", lat0))
        lon_0 = float(p.get("lon_0", "0"))
        north = lat0 > 0
        return lambda x, y: stere_polar_inverse(
            x, y, lat_ts=lat_ts, lon_0=lon_0, north=north
        )
    if fam == "laea":
        lat0 = float(p.get("lat_0", "90"))
        lon_0 = float(p.get("lon_0", "0"))
        return lambda x, y: laea_inverse(x, y, lat_0=lat0, lon_0=lon_0)
    if fam == "merc":
        lat_ts = float(p.get("lat_ts", "0"))
        lon_0 = float(p.get("lon_0", "0"))
        return lambda x, y: merc_inverse(x, y, lat_ts=lat_ts, lon_0=lon_0)
    if fam == "lcc":
        lat0 = float(p.get("lat_0", "0"))
        lat1 = float(p.get("lat_1", p.get("lat_0", "33")))
        lat2 = float(p["lat_2"]) if "lat_2" in p else None
        lon_0 = float(p.get("lon_0", "0"))
        return lambda x, y: lcc_inverse(
            x, y, lat_0=lat0, lat_1=lat1, lat_2=lat2, lon_0=lon_0
        )
    # geos
    h = float(p.get("h", "35785831"))
    lon_0 = float(p.get("lon_0", "0"))
    sweep = p.get("sweep", "y")
    return lambda x, y: geos_inverse(x, y, h=h, lon_0=lon_0, sweep=sweep)


def regrid_nearest(tgt_area, src_area, src_img, value_col: str = "value"):
    """Nearest-neighbor regrid between ANY two analytic-CRS areas:
    generate the target grid, invert its (x, y) to lon/lat, forward
    into the source CRS, floor into source (row, col) — all column
    math — then gather by equi-join (grid.py:91-128 generalized).

    Returns (cell_id, src_row, src_col, src_value); one broadcast/hash
    join, no UDF, whole plan codegen'd.
    """
    inv = inverse(tgt_area.crs)
    fwd = forward(src_area.crs)
    tgt = tgt_area.grid(src_img.sparkSession)
    lon, lat = inv("cx", "cy")
    t = tgt.select("cell_id", lon.alias("lon"), lat.alias("lat"))
    sx, sy = fwd("lon", "lat")
    t = t.select(
        "cell_id",
        F.floor(
            F.round(
                (F.lit(src_area.area_extent[3]) - sy) / src_area.pixel_size_y, 9
            )
        ).alias("src_row"),
        F.floor(
            F.round(
                (sx - F.lit(src_area.area_extent[0])) / src_area.pixel_size_x, 9
            )
        ).alias("src_col"),
    ).filter(
        (F.col("src_row") >= 0)
        & (F.col("src_row") <= src_area.height - 1)
        & (F.col("src_col") >= 0)
        & (F.col("src_col") <= src_area.width - 1)
    )
    return t.join(
        src_img.select("row", "col", F.col(value_col).alias("src_value")),
        (t.src_row == F.col("row")) & (t.src_col == F.col("col")),
    ).select("cell_id", "src_row", "src_col", "src_value")
