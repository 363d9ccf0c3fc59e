"""Grid↔grid resampling: linesample (quick nn), regular-grid bilinear,
and analytic affine/projection regrid (the gradient-search replacement).

Reference parity:
- Quick linesample: pyresample/grid.py:91-128 (get_linesample),
  :28-88 (get_image_from_linesample), utils/__init__.py:71-158.
- Regular-grid bilinear with fractional-index weights:
  pyresample/gradient/__init__.py:362-393 (block_bilinear_interpolator),
  modf weights :366-380.
- Gradient search area↔area: pyresample/gradient/__init__.py:54-60,
  236-274, Cython core gradient/_gradient_search.pyx:104-235. For
  projected uniform grids the iterative index walk is unnecessary on
  Spark: the source index is an **analytic affine/projection inverse**
  of the target coordinate — pure column math feeding an equi-join.

Scale: the target side is a generated grid (no IO); the source image is
joined on computed (row, col) keys — a plain hash join that Catalyst
broadcasts when the source fits (≤ spark.sql.autoBroadcastJoinThreshold)
and shuffles on the key otherwise. Nothing here uses a UDF.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyresample_spark.functions.geo import R_EARTH
from pyresample_spark.geometry import AreaDefinition


def synth_image(spark: SparkSession, area: AreaDefinition) -> DataFrame:
    """Deterministic synthetic source image over an area:
    value = ((row*31 + col*17) % 97) + 0.5. Exact integer math so Spark
    and DuckDB derive identical pixels (FIXTURES.md golden style)."""
    g = area.grid(spark)
    return g.withColumn(
        "value",
        ((F.col("row") * 31 + F.col("col") * 17) % 97).cast("double") + 0.5,
    )


def synth_image_sql(area: AreaDefinition) -> str:
    return (
        f"SELECT *, CAST((row * 31 + col * 17) % 97 AS DOUBLE) + 0.5 AS value "
        f"FROM ({area.grid_sql()})"
    )


def linesample(
    tgt: DataFrame,
    src_area: AreaDefinition,
    src_img: DataFrame,
    x_col: str = "cx",
    y_col: str = "cy",
) -> DataFrame:
    """Quick nearest-neighbor gather (grid.py:91-128): compute source
    (row, col) for every target pixel by the affine inverse, equi-join
    the source image, NULL outside bounds."""
    sr = src_area.row_from_y(F.col(y_col))
    sc = src_area.col_from_x(F.col(x_col))
    t = tgt.withColumn("src_row", sr).withColumn("src_col", sc).filter(
        src_area.in_bounds(F.col("src_row"), F.col("src_col"))
    )
    s = src_img.select(
        F.col("row").alias("src_row"),
        F.col("col").alias("src_col"),
        F.col("value").alias("src_value"),
    )
    return t.join(F.broadcast(s), ["src_row", "src_col"], "left")


def bilinear_regular(
    tgt: DataFrame,
    src_area: AreaDefinition,
    src_img: DataFrame,
    x_col: str = "cx",
    y_col: str = "cy",
) -> DataFrame:
    """Regular-grid bilinear as pure column math + 4 corner joins
    (gradient/__init__.py:362-380 fractional-index weights; the
    irregular-swath variant lives in operators/bilinear_irregular.py).

    Fractional position in cell-center space: xf = (x-llx)/psx - 0.5;
    corners floor(xf)/floor(xf)+1 clamped to the grid; weights are the
    fractional remainders. Corner gathers are 4 broadcast hash joins
    (or shuffle joins on (row,col) when the source image is large).
    """
    llx, lly, urx, ury = src_area.area_extent
    xf = (F.col(x_col) - llx) / src_area.pixel_size_x - 0.5
    yf = (ury - F.col(y_col)) / src_area.pixel_size_y - 0.5
    t = (
        tgt.withColumn("xf", xf)
        .withColumn("yf", yf)
        .withColumn("c0", F.floor(F.col("xf")))
        .withColumn("r0", F.floor(F.col("yf")))
        .withColumn("tx", F.col("xf") - F.col("c0"))
        .withColumn("ty", F.col("yf") - F.col("r0"))
    )

    def clamp(col, hi):
        return F.greatest(F.lit(0), F.least(F.lit(hi), col))

    t = (
        t.withColumn("c0c", clamp(F.col("c0"), src_area.width - 1))
        .withColumn("c1c", clamp(F.col("c0") + 1, src_area.width - 1))
        .withColumn("r0c", clamp(F.col("r0"), src_area.height - 1))
        .withColumn("r1c", clamp(F.col("r0") + 1, src_area.height - 1))
    )
    s = src_img.select("row", "col", "value")
    for tag, rc, cc in (
        ("v00", "r0c", "c0c"),
        ("v01", "r0c", "c1c"),
        ("v10", "r1c", "c0c"),
        ("v11", "r1c", "c1c"),
    ):
        si = F.broadcast(
            s.select(
                F.col("row").alias(f"_r_{tag}"),
                F.col("col").alias(f"_c_{tag}"),
                F.col("value").alias(tag),
            )
        )
        t = t.join(
            si,
            (F.col(rc) == F.col(f"_r_{tag}")) & (F.col(cc) == F.col(f"_c_{tag}")),
            "inner",
        ).drop(f"_r_{tag}", f"_c_{tag}")
    tx, ty = F.col("tx"), F.col("ty")
    interp = (
        (1.0 - tx) * (1.0 - ty) * F.col("v00")
        + tx * (1.0 - ty) * F.col("v01")
        + (1.0 - tx) * ty * F.col("v10")
        + tx * ty * F.col("v11")
    )
    return t.withColumn("bilinear_value", interp)


def eqc_area_world(width: int = 400, height: int = 200) -> AreaDefinition:
    """World extent in eqc meters (x = R·λ, y = R·φ)."""
    return AreaDefinition(
        "eqc_world",
        "eqc",
        width=width,
        height=height,
        area_extent=(
            -math.pi * R_EARTH,
            -math.pi / 2.0 * R_EARTH,
            math.pi * R_EARTH,
            math.pi / 2.0 * R_EARTH,
        ),
    )


def affine_regrid_nn(
    tgt: DataFrame,
    src_area_eqc: AreaDefinition,
    src_img: DataFrame,
    lon_col: str = "cx",
    lat_col: str = "cy",
) -> DataFrame:
    """Analytic regrid longlat-target ← eqc-source, nearest neighbor:
    project the target pixel center (column math), invert the source
    affine, equi-join (the Spark-native gradient search;
    gradient/__init__.py:319-336)."""
    px = F.radians(F.col(lon_col)) * R_EARTH
    py = F.radians(F.col(lat_col)) * R_EARTH
    t = tgt.withColumn("px", px).withColumn("py", py)
    # Snap the fractional index to 9 decimals before floor: projection
    # math (radians) differs by a last ulp across engines, and source
    # cell boundaries can land exactly on target centers (e.g. lon=0 on
    # a world grid) — without the snap, floor() flips a whole cell.
    llx, lly, urx, ury = src_area_eqc.area_extent
    rowf = F.round((F.lit(ury) - F.col("py")) / src_area_eqc.pixel_size_y, 9)
    colf = F.round((F.col("px") - F.lit(llx)) / src_area_eqc.pixel_size_x, 9)
    t = t.withColumn("src_row", F.floor(rowf)).withColumn(
        "src_col", F.floor(colf)
    ).filter(src_area_eqc.in_bounds(F.col("src_row"), F.col("src_col")))
    s = src_img.select(
        F.col("row").alias("src_row"),
        F.col("col").alias("src_col"),
        F.col("value").alias("src_value"),
    )
    return t.join(F.broadcast(s), ["src_row", "src_col"], "left")
