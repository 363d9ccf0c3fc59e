"""Geometry data model: areas as small driver-side structs, grids as
lazily-generated DataFrames.

Reference parity (pyresample, see SURVEY.md §1):
- ``AreaDefinition`` mirrors pyresample/geometry.py:1510 — CRS + width/
  height + area_extent, pixel size derived (geometry.py:1593-1594), pixel
  centers computed on demand (get_proj_coords geometry.py:2449).
- ``DynamicAreaDefinition.freeze`` mirrors geometry.py:1043,1127-1197 —
  extent from data min/max.
- ``StackedAreaDefinition`` mirrors geometry.py:2922 — vertical concat of
  areas sharing width/CRS.

Spark-first design: an area is **never materialized** unless a query needs
its pixel table; then it is generated with ``spark.range(h*w)`` + affine
column expressions — a single narrow stage, no shuffle, no driver data.
At 100 TB the grid side of a resample join is therefore free to generate
per-partition and is trivially re-partitionable on the cell key.
"""

from __future__ import annotations

import hashlib
import json
import math
from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class AreaDefinition:
    """A uniform projected grid: CRS + shape + extent.

    ``area_extent`` is (llx, lly, urx, ury) in projection units
    (pyresample geometry.py:1540). Pixel (row=0, col=0) is the upper-left
    pixel; pixel centers are offset half a pixel inward.
    """

    area_id: str
    crs: str  # PROJ string / name; "longlat" means degrees
    width: int
    height: int
    area_extent: tuple  # (llx, lly, urx, ury)
    description: str = ""
    attrs: dict = field(default_factory=dict, compare=False, hash=False)

    # --- derived scalars (geometry.py:1593-1594) ---
    @property
    def pixel_size_x(self) -> float:
        return (self.area_extent[2] - self.area_extent[0]) / self.width

    @property
    def pixel_size_y(self) -> float:
        return (self.area_extent[3] - self.area_extent[1]) / self.height

    @property
    def size(self) -> int:
        return self.width * self.height

    @property
    def shape(self) -> tuple:
        return (self.height, self.width)

    def geometry_hash(self) -> str:
        """Stable hash for LUT-cache keys (mirrors resampler.py:69-78)."""
        payload = json.dumps(
            {
                "crs": self.crs,
                "width": self.width,
                "height": self.height,
                "extent": [round(v, 9) for v in self.area_extent],
            },
            sort_keys=True,
        )
        return hashlib.sha1(payload.encode()).hexdigest()

    # --- pixel-center expressions (geometry.py:2418-2524) ---
    def cx_expr(self, col="col"):
        return F.lit(self.area_extent[0]) + (F.col(col) + F.lit(0.5)) * F.lit(
            self.pixel_size_x
        )

    def cy_expr(self, row="row"):
        return F.lit(self.area_extent[3]) - (F.col(row) + F.lit(0.5)) * F.lit(
            self.pixel_size_y
        )

    def grid(self, spark: SparkSession, num_partitions: int | None = None) -> DataFrame:
        """Generate the pixel-center table (cell_id, row, col, cx, cy).

        One ``range`` scan + column math: narrow, codegen'd, no shuffle.
        ``num_partitions`` controls parallelism at scale (default: let
        Spark size it from ``spark.default.parallelism``).
        """
        rng = (
            spark.range(0, self.size, 1, num_partitions)
            if num_partitions
            else spark.range(self.size)
        )
        w = self.width
        return (
            rng.withColumnRenamed("id", "cell_id")
            .withColumn("row", (F.col("cell_id") / w).cast("bigint"))
            .withColumn("col", (F.col("cell_id") % w).cast("bigint"))
            .withColumn("cx", self.cx_expr())
            .withColumn("cy", self.cy_expr())
        )

    def grid_sql(self) -> str:
        """DuckDB SQL generating the identical grid (for oracles)."""
        llx, lly, urx, ury = self.area_extent
        return (
            f"SELECT range AS cell_id, "
            f"CAST(range // {self.width} AS BIGINT) AS row, "
            f"CAST(range % {self.width} AS BIGINT) AS col, "
            f"{llx} + (range % {self.width} + 0.5) * {self.pixel_size_x!r} AS cx, "
            f"{ury} - (range // {self.width} + 0.5) * {self.pixel_size_y!r} AS cy "
            f"FROM range({self.size})"
        )

    # --- index/coord converters as expressions (geometry.py:2161-2336) ---
    def col_from_x(self, x):
        return F.floor((x - F.lit(self.area_extent[0])) / F.lit(self.pixel_size_x))

    def row_from_y(self, y):
        return F.floor((F.lit(self.area_extent[3]) - y) / F.lit(self.pixel_size_y))

    def in_bounds(self, row_col, col_col):
        return (
            (row_col >= 0)
            & (row_col < self.height)
            & (col_col >= 0)
            & (col_col < self.width)
        )

    # --- constructor classmethods (geometry.py:1726-1890) ---
    @classmethod
    def from_extent(cls, area_id, crs, shape, area_extent, **kw):
        """AreaDefinition.from_extent (geometry.py:1745): shape=(h, w)."""
        h, w = shape
        return cls(area_id, crs, width=w, height=h,
                   area_extent=tuple(area_extent), **kw)

    @classmethod
    def from_ul_corner(cls, area_id, crs, shape, upper_left_extent,
                       resolution, **kw):
        """AreaDefinition.from_ul_corner (geometry.py:1890): extent from
        the upper-left corner + per-pixel resolution."""
        h, w = shape
        rx, ry = (resolution if isinstance(resolution, (tuple, list))
                  else (resolution, resolution))
        ulx, uly = upper_left_extent
        return cls(area_id, crs, width=w, height=h,
                   area_extent=(ulx, uly - h * ry, ulx + w * rx, uly), **kw)

    @classmethod
    def from_area_of_interest(cls, area_id, crs, shape, center,
                              resolution, **kw):
        """AreaDefinition.from_area_of_interest (geometry.py:1844):
        extent centered on ``center``."""
        h, w = shape
        rx, ry = (resolution if isinstance(resolution, (tuple, list))
                  else (resolution, resolution))
        cx, cy = center
        return cls(
            area_id, crs, width=w, height=h,
            area_extent=(cx - w * rx / 2.0, cy - h * ry / 2.0,
                         cx + w * rx / 2.0, cy + h * ry / 2.0), **kw)

    @classmethod
    def from_circle(cls, area_id, crs, center, radius, resolution=None,
                    shape=None, **kw):
        """AreaDefinition.from_circle (geometry.py:1788): square area of
        half-width ``radius`` around ``center``; give ``resolution`` or
        ``shape``."""
        rx, ry = (radius if isinstance(radius, (tuple, list))
                  else (radius, radius))
        cx, cy = center
        extent = (cx - rx, cy - ry, cx + rx, cy + ry)
        if shape is not None:
            h, w = shape
            return cls(area_id, crs, width=w, height=h,
                       area_extent=extent, **kw)
        if resolution is None:
            raise ValueError("from_circle needs resolution or shape")
        px, py = (resolution if isinstance(resolution, (tuple, list))
                  else (resolution, resolution))
        return cls(area_id, crs, width=round(2 * rx / px),
                   height=round(2 * ry / py), area_extent=extent, **kw)

    @classmethod
    def from_epsg(cls, code, resolution, **kw):
        """AreaDefinition.from_epsg (geometry.py:1726): full area of use
        of an EPSG CRS. Uses pyproj when importable; otherwise a small
        builtin table of common geographic codes (this container has no
        pyproj — SURVEY.md §2.2 pandas-UDF wrapper has the same
        analytic fallback)."""
        code = int(str(code).replace("EPSG:", ""))
        try:  # pragma: no cover - pyproj absent in the build container
            from pyproj import CRS

            crs = CRS.from_epsg(code)
            aou = crs.area_of_use
            extent = (aou.west, aou.south, aou.east, aou.north)
            crs_str = f"EPSG:{code}"
        except ImportError:
            builtin = {4326: (-180.0, -90.0, 180.0, 90.0),
                       4258: (-16.1, 32.88, 40.18, 84.73)}
            if code not in builtin:
                raise NotImplementedError(
                    f"EPSG:{code} needs pyproj (builtin: {sorted(builtin)})"
                ) from None
            extent = builtin[code]
            crs_str = "longlat"
        rx, ry = (resolution if isinstance(resolution, (tuple, list))
                  else (resolution, resolution))
        return cls(
            f"epsg_{code}", crs_str,
            width=round((extent[2] - extent[0]) / rx),
            height=round((extent[3] - extent[1]) / ry),
            area_extent=extent, **kw)

    def __getitem__(self, key):
        """Slice the area (geometry.py:2664-2689): area[rows, cols]."""
        rows, cols = key
        r0, r1, _ = rows.indices(self.height)
        c0, c1, _ = cols.indices(self.width)
        llx, lly, urx, ury = self.area_extent
        new_extent = (
            llx + c0 * self.pixel_size_x,
            ury - r1 * self.pixel_size_y,
            llx + c1 * self.pixel_size_x,
            ury - r0 * self.pixel_size_y,
        )
        return replace(
            self,
            area_id=f"{self.area_id}[{r0}:{r1},{c0}:{c1}]",
            width=c1 - c0,
            height=r1 - r0,
            area_extent=new_extent,
        )


@dataclass(frozen=True)
class DynamicAreaDefinition:
    """Area with unknown extent; freeze() computes it from data bounds
    (pyresample geometry.py:1043,1127-1197), including the antimeridian
    modes of geometry.py:1224-1294."""

    area_id: str
    crs: str
    resolution: tuple | None = None  # (resx, resy)
    shape: tuple | None = None  # (height, width)

    def freeze(
        self,
        bounds_df: DataFrame,
        x_col: str = "x",
        y_col: str = "y",
        antimeridian_mode: str | None = None,
    ) -> AreaDefinition:
        """Compute extent from min/max of projected coords — one global agg
        (map-side partial + single-row final; negligible at any scale).

        ``antimeridian_mode`` (geometry.py:1224-1294; lonlat x only):
        - ``None``: plain min/max (a dateline-crossing swath degrades to
          a near-global extent, like the reference default).
        - ``"modify_extents"``: if the data crosses ±180°, express the
          extent in a shifted frame — llx in (0, 180], urx in (180, 360)
          — so the frozen area stays tight around the swath.
        - ``"global_extents"``: if the data crosses, snap x to the full
          [-180, 180] span.
        Crossing is detected by comparing the x-span in the natural and
        the [0, 360) frames (both computed in the same single agg).
        """
        shifted = (F.col(x_col) + 360.0) % 360.0
        row = bounds_df.agg(
            F.min(x_col).alias("minx"),
            F.max(x_col).alias("maxx"),
            F.min(y_col).alias("miny"),
            F.max(y_col).alias("maxy"),
            F.min(shifted).alias("sminx"),
            F.max(shifted).alias("smaxx"),
        ).collect()[0]
        minx, maxx, miny, maxy = row["minx"], row["maxx"], row["miny"], row["maxy"]
        if antimeridian_mode is not None:
            crosses = (row["smaxx"] - row["sminx"]) < (maxx - minx)
            if crosses and antimeridian_mode == "modify_extents":
                minx, maxx = row["sminx"], row["smaxx"]
            elif crosses and antimeridian_mode == "global_extents":
                minx, maxx = -180.0, 180.0
            elif antimeridian_mode not in ("modify_extents", "global_extents"):
                raise ValueError(
                    f"unknown antimeridian_mode {antimeridian_mode!r}"
                )
        # Data min/max are pixel CENTERS, not edges (reference
        # compute_domain, geometry.py:1167-1197): pad the extent by half
        # a resolution so boundary points stay strictly inside, and —
        # in resolution mode — floor/ceil-align the extent to resolution
        # multiples so pixel size equals the requested resolution exactly.
        if self.shape is not None:
            height, width = self.shape
            resx = (maxx - minx) * 1.0 / max(width - 1, 1)
            resy = (maxy - miny) * 1.0 / max(height - 1, 1)
            extent = (
                minx - resx / 2.0,
                miny - resy / 2.0,
                maxx + resx / 2.0,
                maxy + resy / 2.0,
            )
        else:
            resx, resy = self.resolution
            extent = (
                math.floor((minx - resx / 2.0) / resx) * resx,
                math.floor((miny - resy / 2.0) / resy) * resy,
                math.ceil((maxx + resx / 2.0) / resx) * resx,
                math.ceil((maxy + resy / 2.0) / resy) * resy,
            )
            width = int(round((extent[2] - extent[0]) / resx))
            height = int(round((extent[3] - extent[1]) / resy))
        return AreaDefinition(
            area_id=self.area_id,
            crs=self.crs,
            width=width,
            height=height,
            area_extent=extent,
        )


@dataclass(frozen=True)
class StackedAreaDefinition:
    """Vertical stack of areas sharing width/CRS (geometry.py:2922-3032).

    ``grid`` = union of component grids with row offsets — Spark unions
    are plan-level concatenation (no shuffle)."""

    area_id: str
    defs: tuple

    def append(self, other: AreaDefinition) -> "StackedAreaDefinition":
        last = self.defs[-1] if self.defs else None
        if last is not None and (
            last.width != other.width or last.crs != other.crs
        ):
            raise ValueError("appended area must share width and CRS")
        # adjacent areas merge (geometry.py:2948-2992)
        if (
            last is not None
            and abs(last.area_extent[1] - other.area_extent[3]) < 1e-9
            and last.area_extent[0] == other.area_extent[0]
        ):
            merged = replace(
                last,
                height=last.height + other.height,
                area_extent=(
                    last.area_extent[0],
                    other.area_extent[1],
                    last.area_extent[2],
                    last.area_extent[3],
                ),
            )
            return StackedAreaDefinition(self.area_id, self.defs[:-1] + (merged,))
        return StackedAreaDefinition(self.area_id, self.defs + (other,))

    def squeeze(self) -> AreaDefinition | "StackedAreaDefinition":
        return self.defs[0] if len(self.defs) == 1 else self

    def grid(self, spark: SparkSession) -> DataFrame:
        dfs = []
        row_offset = 0
        for d in self.defs:
            g = d.grid(spark).withColumn("row", F.col("row") + F.lit(row_offset))
            dfs.append(g.drop("cell_id"))
            row_offset += d.height
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        total_w = self.defs[0].width
        return out.withColumn("cell_id", F.col("row") * total_w + F.col("col"))


def enclose_areas(*areas: AreaDefinition, area_id: str = "enclosed") -> AreaDefinition:
    """Smallest area covering all inputs, same CRS (geometry.py:3106-3143).

    Pure driver-side min/max over extents; resolution taken from the first.
    """
    if not areas:
        raise ValueError("need at least one area")
    crs = areas[0].crs
    if any(a.crs != crs for a in areas):
        raise ValueError("all areas must share a CRS")
    llx = min(a.area_extent[0] for a in areas)
    lly = min(a.area_extent[1] for a in areas)
    urx = max(a.area_extent[2] for a in areas)
    ury = max(a.area_extent[3] for a in areas)
    psx = areas[0].pixel_size_x
    psy = areas[0].pixel_size_y
    width = max(1, int(round((urx - llx) / psx)))
    height = max(1, int(round((ury - lly) / psy)))
    return AreaDefinition(area_id, crs, width, height, (llx, lly, urx, ury))
