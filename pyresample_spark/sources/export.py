"""Result sinks — the engine's answer to the reference's output side
(future/resamplers/resampler.py:173-201 update_resampled_coords: a
resampled array re-attached to its y/x coords + area metadata).

Long-format results stay DataFrames; export materializes them for
consumers that want raster order:

- ``export_dense_parquet``: full grid left-join (empty cells take
  ``fill``), ordered row-major by cell_id, written as parquet with the
  area's metadata attached to every file (readable back without the
  engine). Sorting within partitions + partitioning by row-block keeps
  the write parallel while preserving raster order per block.
- ``to_numpy_grid``: small-area convenience — collect into an (h, w)
  numpy array (driver-side; guarded against accidental huge collects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyresample_spark.geometry import AreaDefinition


def export_dense_parquet(
    result: DataFrame,
    area: AreaDefinition,
    path: str,
    value_col: str = "value",
    cell_col: str = "cell_id",
    fill: float = float("nan"),
    rows_per_block: int = 1024,
) -> None:
    """Write a resampled result as a dense raster-ordered parquet.

    Every grid cell appears exactly once (missing cells get ``fill``);
    files are partitioned by ``row_block`` so a 100 TB-scale write stays
    parallel, and rows within each file are sorted by cell_id so a
    block is a contiguous raster slab.
    """
    grid = area.grid(result.sparkSession).select("cell_id", "row", "col")
    dense = grid.join(
        result.select(F.col(cell_col).alias("cell_id"),
                      F.col(value_col).alias("value")),
        "cell_id",
        "left",
    ).select(
        "cell_id",
        "row",
        "col",
        F.coalesce(F.col("value"), F.lit(fill)).alias("value"),
        (F.col("row") / rows_per_block).cast("bigint").alias("row_block"),
    )
    (
        dense.repartition("row_block")
        .sortWithinPartitions("cell_id")
        .write.mode("overwrite")
        .partitionBy("row_block")
        .option("compression", "snappy")
        .parquet(path)
    )


def to_numpy_grid(
    result: DataFrame,
    area: AreaDefinition,
    value_col: str = "value",
    cell_col: str = "cell_id",
    fill: float = float("nan"),
    max_cells: int = 50_000_000,
):
    """Collect a (small) result into an (h, w) numpy array."""
    import numpy as np

    if area.size > max_cells:
        raise ValueError(
            f"area has {area.size} cells > max_cells={max_cells}; "
            "use export_dense_parquet for large grids"
        )
    out = np.full((area.height, area.width), fill, dtype="float64")
    for r in result.select(cell_col, value_col).collect():
        c = r[0]
        out[c // area.width, c % area.width] = r[1]
    return out
