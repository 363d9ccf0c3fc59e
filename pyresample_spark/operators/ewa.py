"""EWA (elliptical weighted averaging) resampler — fornav re-expressed
as footprint explode + weighted hash aggregation.

Reference parity: ewa/ewa.py:83-188 (fornav), Cython kernels
ewa/_fornav.pyx:119-206 (per-pixel footprint weight accumulation),
:517 (finalize Σwv/Σw where Σw ≥ weight_sum_min); ll2cr static path
ewa/_ll2cr.pyx:208; dask partial/final combine dask_ewa.py:110-167.

Spark-first: each source pixel is projected to fractional target grid
coordinates (ll2cr = pure column math), then **exploded over the cells
its footprint covers** (a (2R+1)² offset grid filtered to the footprint
radius); each (pixel, cell) pair gets a gaussian-of-distance² weight,
and a single groupBy(cell) accumulates Σw·v and Σw — Catalyst's
partial+final hash aggregation IS the reference's hand-rolled dask
tree-reduce. The circular footprint here is the isotropic special case
of the reference's per-scanline ellipse; the ellipse generalization is
the same plan with per-(scan, column) coefficient columns joined in
(SURVEY §7 hard part 5).

Scale: explode factor is bounded by the footprint area (25× for R=2) on
ids+fractional coords only; the aggregation shuffles one partial row
per (task, cell). No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyresample_spark.geometry import AreaDefinition


def ewa_fornav(
    pts: DataFrame,
    area: AreaDefinition,
    value_col: str = "value",
    lon_col: str = "lon",
    lat_col: str = "lat",
    footprint_cells: float = 1.5,
    weight_sum_min: float = 0.1,
) -> DataFrame:
    """Circular-footprint fornav: returns (cell_id, ewa_value,
    weight_sum, n_contrib) per covered target cell."""
    llx, lly, urx, ury = area.area_extent
    colf = (F.col(lon_col) - llx) / area.pixel_size_x
    rowf = (ury - F.col(lat_col)) / area.pixel_size_y
    r = int(footprint_cells) + 1
    offsets = F.expr(
        f"explode(flatten(transform(sequence({-r},{r}), dr -> "
        f"transform(sequence({-r},{r}), dc -> struct(dr, dc)))))"
    )
    t = (
        pts.withColumn("colf", colf)
        .withColumn("rowf", rowf)
        .withColumn("c0", F.floor("colf"))
        .withColumn("r0", F.floor("rowf"))
        .select(value_col, "colf", "rowf", "c0", "r0", offsets.alias("o"))
        .withColumn("cell_col", F.col("c0") + F.col("o.dc"))
        .withColumn("cell_row", F.col("r0") + F.col("o.dr"))
        .drop("o")
    )
    t = t.filter(area.in_bounds(F.col("cell_row"), F.col("cell_col")))
    dx = F.col("colf") - (F.col("cell_col") + 0.5)
    dy = F.col("rowf") - (F.col("cell_row") + 0.5)
    d2 = dx * dx + dy * dy
    fp2 = footprint_cells * footprint_cells
    t = t.withColumn("d2", d2).filter(F.col("d2") <= fp2).withColumn(
        "w", F.exp(-F.col("d2"))
    )
    v, w = F.col(value_col), F.col("w")
    out = (
        t.withColumn("cell_id", F.col("cell_row") * area.width + F.col("cell_col"))
        .groupBy("cell_id")
        .agg(
            (F.sum(w * v) / F.sum(w)).alias("ewa_value"),
            F.sum(w).alias("weight_sum"),
            F.count(F.lit(1)).alias("n_contrib"),
        )
        .filter(F.col("weight_sum") >= weight_sum_min)
    )
    return out


def ewa_fornav_sql(
    area: AreaDefinition,
    pts_sql: str,
    footprint_cells: float = 1.5,
    weight_sum_min: float = 0.1,
) -> str:
    """DuckDB twin of :func:`ewa_fornav` (oracle)."""
    llx, lly, urx, ury = area.area_extent
    r = int(footprint_cells) + 1
    vals = ", ".join(f"({i})" for i in range(-r, r + 1))
    fp2 = footprint_cells * footprint_cells
    return f"""
    WITH pts AS (
      SELECT value,
             (lon - ({llx!r})) / {area.pixel_size_x!r} AS colf,
             ({ury!r} - lat) / {area.pixel_size_y!r} AS rowf
      FROM ({pts_sql})
    ),
    fp AS (
      SELECT value, colf, rowf,
             CAST(FLOOR(colf) AS BIGINT) + oc.dc AS cell_col,
             CAST(FLOOR(rowf) AS BIGINT) + orr.dr AS cell_row
      FROM pts
      CROSS JOIN (VALUES {vals}) AS oc(dc)
      CROSS JOIN (VALUES {vals}) AS orr(dr)
    ),
    wp AS (
      SELECT value,
             cell_row * {area.width} + cell_col AS cell_id,
             exp(-((colf - (cell_col + 0.5)) * (colf - (cell_col + 0.5))
                 + (rowf - (cell_row + 0.5)) * (rowf - (cell_row + 0.5)))) AS w
      FROM fp
      WHERE cell_row BETWEEN 0 AND {area.height - 1}
        AND cell_col BETWEEN 0 AND {area.width - 1}
        AND ((colf - (cell_col + 0.5)) * (colf - (cell_col + 0.5))
           + (rowf - (cell_row + 0.5)) * (rowf - (cell_row + 0.5))) <= {fp2!r}
    )
    SELECT cell_id,
           ROUND(SUM(w * value) / SUM(w), 6) + 0.0 AS ewa_value,
           ROUND(SUM(w), 6) + 0.0 AS weight_sum,
           CAST(COUNT(*) AS BIGINT) AS n_contrib
    FROM wp GROUP BY cell_id
    HAVING SUM(w) >= {weight_sum_min!r}
    """
