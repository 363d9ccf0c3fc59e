"""Data reduction: coarse spatial filters emitted as pushable predicates.

Reference parity:
- ``data_reduce`` winding-number boundary classification + buffered
  lat/lon bbox filter: pyresample/data_reduce.py:224-307
  (entry points :28-222).
- ``GridFilter`` mask-grid lookup filter: pyresample/geo_filter.py:26-105.
- Slicer / crop: pyresample/slicer.py:38-248, geometry.py:2654-2689.

Spark-first: all three are *planner-side* computations that emit plain
``filter()`` predicates (or a broadcast join against a tiny mask table).
Catalyst pushes the predicates into the parquet scan (PushedFilters →
row-group min/max pruning), which is the 100 TB version of the
reference's "reduce_data=True": the cluster never reads pixels outside
the target's buffered bounding box.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyresample_spark.functions.geo import R_EARTH
from pyresample_spark.geometry import AreaDefinition


def valid_lonlat_predicate(lon_col: str = "lon", lat_col: str = "lat") -> Column:
    """Valid-coordinate filter (kd_tree.py:406,454): lon∈[-180,180],
    lat∈[-90,90]."""
    lon, lat = F.col(lon_col), F.col(lat_col)
    return (
        (lon >= -180.0) & (lon <= 180.0) & (lat >= -90.0) & (lat <= 90.0)
    )


def bbox_bounds(
    area: AreaDefinition, radius_of_influence: float = 0.0
) -> tuple:
    """Buffered lat/lon bounds of a longlat target area
    (data_reduce.py:254-268: bbox buffered by radius/R in degrees).

    Returns (lon_min, lon_max, lat_min, lat_max), clamped to valid range.
    Driver-side planning: tiny, runs once per query.
    """
    llx, lly, urx, ury = area.area_extent
    buf_deg = math.degrees(radius_of_influence / R_EARTH)
    return (
        max(-180.0, llx - buf_deg),
        min(180.0, urx + buf_deg),
        max(-90.0, lly - buf_deg),
        min(90.0, ury + buf_deg),
    )


def bbox_reduce_predicate(
    area: AreaDefinition,
    radius_of_influence: float = 0.0,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> Column:
    """The data-reduce predicate (data_reduce.py:224-307) as a pushable
    Column. Antimeridian-crossing extents split into an OR of two lon
    ranges (data_reduce.py:282-305)."""
    lon_min, lon_max, lat_min, lat_max = bbox_bounds(area, radius_of_influence)
    lon, lat = F.col(lon_col), F.col(lat_col)
    lat_pred = (lat >= lat_min) & (lat <= lat_max)
    if lon_min <= lon_max:
        lon_pred = (lon >= lon_min) & (lon <= lon_max)
    else:  # crosses the antimeridian
        lon_pred = (lon >= lon_min) | (lon <= lon_max)
    return lat_pred & lon_pred


def bbox_reduce_sql(
    area: AreaDefinition,
    radius_of_influence: float = 0.0,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> str:
    """SQL twin of :func:`bbox_reduce_predicate` for oracles."""
    lon_min, lon_max, lat_min, lat_max = bbox_bounds(area, radius_of_influence)
    lat_pred = f"{lat_col} >= {lat_min!r} AND {lat_col} <= {lat_max!r}"
    if lon_min <= lon_max:
        lon_pred = f"{lon_col} >= {lon_min!r} AND {lon_col} <= {lon_max!r}"
    else:
        lon_pred = f"({lon_col} >= {lon_min!r} OR {lon_col} <= {lon_max!r})"
    return f"({lat_pred} AND {lon_pred})"


def grid_filter(
    points: DataFrame,
    mask_df: DataFrame,
    area: AreaDefinition,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """GridFilter (geo_filter.py:26-105): keep points whose projected
    cell has mask=true.

    ``mask_df`` is (cell_id, mask boolean) — a mask grid is at most a few
    million rows, so it is **broadcast**; the points side never shuffles.
    """
    from pyresample_spark.operators.bucket import assign_cells

    assigned = assign_cells(points, area, x_col=lon_col, y_col=lat_col)
    return assigned.join(
        F.broadcast(mask_df.filter(F.col("mask")).select("cell_id")),
        "cell_id",
        "inner",
    )


def slice_crop(area: AreaDefinition, crop_extent: tuple) -> tuple:
    """Compute (row0, row1, col0, col1) slices of ``area`` that enclose
    ``crop_extent`` (slicer.py:188-211, get_area_slices geometry.py:2654).

    Driver-side planning math; the result feeds ``area[r0:r1, c0:c1]``
    and a pushable WHERE row/col BETWEEN predicate.
    """
    llx, lly, urx, ury = crop_extent
    c0 = max(0, int(math.floor((llx - area.area_extent[0]) / area.pixel_size_x)))
    c1 = min(area.width, int(math.ceil((urx - area.area_extent[0]) / area.pixel_size_x)))
    r0 = max(0, int(math.floor((area.area_extent[3] - ury) / area.pixel_size_y)))
    r1 = min(area.height, int(math.ceil((area.area_extent[3] - lly) / area.pixel_size_y)))
    if c0 >= c1 or r0 >= r1:
        raise ValueError("IncompatibleAreas: crop does not overlap area")
    return r0, r1, c0, c1


def area_reduce_info(area: AreaDefinition, radius_of_influence: float,
                     r_earth: float = 6370997.0) -> dict:
    """PROJECTED-area data reduction bounds — the general form of
    :func:`bbox_bounds` (reference data_reduce.py:174-307
    get_valid_index_from_lonlat_grid): walk the target grid's four
    boundary edges (pixel centers) through the area's analytic
    inverse, detect pole coverage by the winding-number angle sum, and
    buffer the lon/lat window by the radius (lon buffered with the
    1/sin(max|lat|) convergence factor of the respective side, exactly
    as the reference does). Driver-side planning: O(perimeter) scalar
    inversions, runs once per query.

    Returns {"mode": "np"|"sp"|"window"|"all", "lat_min", "lat_max",
    "lon_min", "lon_max", "dateline": bool}.
    """
    import math as _m

    from pyresample_spark.operators.crs import inverse_scalar

    inv = inverse_scalar(area.crs)
    w, h = area.width, area.height
    llx, lly, urx, ury = area.area_extent
    psx, psy = (urx - llx) / w, (ury - lly) / h

    def _pt(row, col):
        return inv(llx + (col + 0.5) * psx, ury - (row + 0.5) * psy)

    side1 = [_pt(0, c) for c in range(w)]            # top
    side2 = [_pt(r, w - 1) for r in range(h)]        # right
    side3 = [_pt(h - 1, c) for c in range(w)]        # bottom
    side4 = [_pt(r, 0) for r in range(h)]            # left
    sides = [side1, side2, side3, side4]
    if any(p is None for s in sides for p in s):
        return {"mode": "all"}  # boundary leaves the projection domain

    angle_sum = 0.0
    for s in (side1, side2, list(reversed(side3)), list(reversed(side4))):
        prev = None
        for lon, _lat in s:
            if prev is not None:
                delta = lon - prev
                if abs(delta) > 180.0:
                    delta = (abs(delta) - 360.0) * (delta // abs(delta))
                angle_sum += delta
            prev = lon

    lats_all = [la for s in sides for _lo, la in s]
    buf = _m.degrees(radius_of_influence / r_earth)
    lat_min_b = min(lats_all) - buf
    lat_max_b = max(lats_all) + buf
    if round(angle_sum) == -360:
        return {"mode": "np", "lat_min": lat_min_b}
    if round(angle_sum) == 360:
        return {"mode": "sp", "lat_max": lat_max_b}
    if round(angle_sum) != 0:
        return {"mode": "all"}

    max_s2 = max(abs(la) for _lo, la in side2)
    max_s4 = max(abs(la) for _lo, la in side4)
    if max_s2 == 0.0 or max_s4 == 0.0:
        # a lateral side entirely at lat 0 (e.g. a height-1 equatorial
        # grid): the reference's numpy 1/sin degrades to an inf lon
        # buffer and keeps everything — match that instead of raising
        # ZeroDivisionError (ADVICE r5)
        return {"mode": "all"}
    lon_min_b = min(lo for lo, _la in side4) - _m.degrees(
        radius_of_influence / (_m.sin(_m.radians(max_s4)) * r_earth)
    )
    lon_max_b = max(lo for lo, _la in side2) + _m.degrees(
        radius_of_influence / (_m.sin(_m.radians(max_s2)) * r_earth)
    )
    dateline = min(lo for lo, _la in side2) <= max(lo for lo, _la in side4)
    return {
        "mode": "window", "lat_min": lat_min_b, "lat_max": lat_max_b,
        "lon_min": lon_min_b, "lon_max": lon_max_b, "dateline": dateline,
    }


def area_reduce_predicate(area: AreaDefinition, radius_of_influence: float,
                          lon_col: str = "lon", lat_col: str = "lat",
                          r_earth: float = 6370997.0) -> Column:
    """The projected-area reduce window as a pushable Column
    (data_reduce.py:282-307 branch semantics verbatim)."""
    info = area_reduce_info(area, radius_of_influence, r_earth)
    lon, lat = F.col(lon_col), F.col(lat_col)
    if info["mode"] == "np":
        return lat >= info["lat_min"]
    if info["mode"] == "sp":
        return lat <= info["lat_max"]
    if info["mode"] == "all":
        return F.lit(True)
    lat_pred = (lat >= info["lat_min"]) & (lat <= info["lat_max"])
    if not info["dateline"]:
        lon_pred = (lon >= info["lon_min"]) & (lon <= info["lon_max"])
    else:
        lon_pred = ((lon >= info["lon_min"]) & (lon <= 180.0)) | (
            (lon <= info["lon_max"]) & (lon >= -180.0)
        )
    return lat_pred & lon_pred
