"""Optimal bounding area for a swath — SwathDefinition.compute_optimal_bb_area
(reference: pyresample/geometry.py:1019-1040, which fits an oblique-
mercator (omerc) area whose equator follows the satellite track).

Spark-first formulation (no pyproj in this container, and none needed):

1. One aggregation computes the 3x3 second-moment matrix of the swath's
   unit-sphere geocentric coordinates (six sums + count — a single
   map-side-combined HashAggregate; at 100 TB this is the only full
   scan and it shuffles nine numbers).
2. The driver eigendecomposes the 3x3 matrix (numpy). The largest-
   eigenvalue axis is the along-track direction, the smallest is the
   normal of the best-fit great-circle plane — together they define the
   rotated orthonormal frame the reference expresses via omerc
   (lonc/lat_0/alpha).
3. A second aggregation takes min/max of the rotated angular
   coordinates u = atan2(p·e2, p·e1) (along-track) and
   v = asin(p·e3) (cross-track) — pure column expressions.

The result is an :class:`AreaDefinition` whose CRS string carries the
fitted omerc parameters and whose extent is the rotated-frame bounding
box scaled to meters on the sphere (x = R·u, y = R·v — exact for the
spherical omerc aposphere up to the cross-track cosine factor, which a
bounding area absorbs in its margin).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyresample_spark.functions.geo import R_EARTH
from pyresample_spark.geometry import AreaDefinition


def _unit_xyz(lon_col: str, lat_col: str):
    lon = F.radians(F.col(lon_col))
    lat = F.radians(F.col(lat_col))
    return (
        F.cos(lat) * F.cos(lon),
        F.cos(lat) * F.sin(lon),
        F.sin(lat),
    )


def compute_optimal_bb_area(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    resolution_m: float = 10_000.0,
    margin: float = 0.02,
    area_id: str = "optimal_bb",
) -> AreaDefinition:
    """Fit the swath-following oblique bounding area of a point set.

    Two Spark aggregations (moments, then rotated-frame bounds); the
    3x3 eigenproblem runs on the driver. ``margin`` widens the extent
    by that fraction per side so boundary pixels stay interior.
    """
    import numpy as np

    x, y, z = _unit_xyz(lon_col, lat_col)
    m = df.select(
        F.sum(x * x).alias("xx"), F.sum(x * y).alias("xy"),
        F.sum(x * z).alias("xz"), F.sum(y * y).alias("yy"),
        F.sum(y * z).alias("yz"), F.sum(z * z).alias("zz"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"), F.sum(z).alias("sz"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if m.n == 0:
        raise ValueError("empty swath")
    S = np.array(
        [[m.xx, m.xy, m.xz], [m.xy, m.yy, m.yz], [m.xz, m.yz, m.zz]]
    )
    evals, evecs = np.linalg.eigh(S)  # ascending eigenvalues
    e3 = evecs[:, 0]  # smallest: normal of best-fit great-circle plane
    e1 = evecs[:, 2]  # largest: along-track direction
    centroid = np.array([m.sx, m.sy, m.sz])
    if centroid @ np.cross(e3, np.cross(e1, e3)) < 0:
        e1 = -e1  # orient along-track axis toward the data
    if e3[2] < 0:
        e3 = -e3  # keep the frame's pole in the northern hemisphere
    e2 = np.cross(e3, e1)

    def dot(v):
        return x * float(v[0]) + y * float(v[1]) + z * float(v[2])

    u = F.atan2(dot(e2), dot(e1))  # along-track angle
    v = F.asin(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), dot(e3))))
    b = df.select(
        F.min(u).alias("u0"), F.max(u).alias("u1"),
        F.min(v).alias("v0"), F.max(v).alias("v1"),
    ).collect()[0]

    # omerc parameters of the fitted frame: lonc/lat_0 locate the track
    # center (= e1), alpha is the along-track azimuth of e2 there
    # (degrees clockwise from north) — together they reconstruct the
    # frame EXACTLY (functions/geo.py omerc_frame), so the CRS string
    # alone round-trips through the analytic registry's 'omerc' family
    # without needing the attrs. Full float precision (repr, not a
    # 6-decimal format) so the rebuilt frame is bit-identical.
    from pyresample_spark.functions.geo import omerc_azimuth

    lonc = math.degrees(math.atan2(e1[1], e1[0]))
    lat0 = math.degrees(math.asin(max(-1.0, min(1.0, e1[2]))))
    alpha = omerc_azimuth(e1, e2)
    crs = (
        f"+proj=omerc +lat_0={lat0!r} +lonc={lonc!r} "
        f"+alpha={alpha!r} +gamma=0 +ellps=sphere +R={R_EARTH:.1f}"
    )

    du, dv = b.u1 - b.u0, b.v1 - b.v0
    ext = (
        R_EARTH * (b.u0 - margin * du),
        R_EARTH * (b.v0 - margin * dv),
        R_EARTH * (b.u1 + margin * du),
        R_EARTH * (b.v1 + margin * dv),
    )
    width = max(1, round((ext[2] - ext[0]) / resolution_m))
    height = max(1, round((ext[3] - ext[1]) / resolution_m))
    return AreaDefinition(
        area_id, crs, width=width, height=height, area_extent=ext,
        attrs={"frame_e1": [float(c) for c in e1],
               "frame_e2": [float(c) for c in e2],
               "frame_e3": [float(c) for c in e3]},
    )


def rotated_coords(df: DataFrame, area: AreaDefinition,
                   lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Project points into a fitted area's rotated frame (meters):
    the analytic forward transform for areas built by
    :func:`compute_optimal_bb_area`."""
    e1 = area.attrs["frame_e1"]
    e2 = area.attrs["frame_e2"]
    e3 = area.attrs["frame_e3"]
    x, y, z = _unit_xyz(lon_col, lat_col)

    def dot(v):
        return x * float(v[0]) + y * float(v[1]) + z * float(v[2])

    u = F.atan2(dot(e2), dot(e1))
    v = F.asin(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), dot(e3))))
    return df.withColumn("bb_x", u * R_EARTH).withColumn("bb_y", v * R_EARTH)
