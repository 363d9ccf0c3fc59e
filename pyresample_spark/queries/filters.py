"""M2 queries: filters / predicates / data reduction (SURVEY.md §2.3).

Every filter here is a pushable predicate or a broadcast join — the
plans Catalyst turns into parquet PushedFilters / row-group pruning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyresample_spark.geometry import AreaDefinition
from pyresample_spark.operators.reduce import (
    bbox_reduce_predicate,
    bbox_reduce_sql,
    grid_filter,
    slice_crop,
    valid_lonlat_predicate,
)
from pyresample_spark.queries import register, rnd
from pyresample_spark.queries.core import TEST_AREA
from pyresample_spark.queries.geo_scalar import PTS_SQL, _pts

# A wider europe-ish area for reduction tests.
REDUCE_AREA = AreaDefinition(
    "reduce_lonlat", "longlat", width=120, height=100,
    area_extent=(-30.0, 10.0, 30.0, 60.0),
)


@register(
    "q_valid_filter",
    oracle=f"""
    SELECT event_id, lon3 AS lon, lat3 AS lat
    FROM (SELECT event_id, lon * 2.5 AS lon3, lat * 2.5 AS lat3 FROM ({PTS_SQL}))
    WHERE lon3 BETWEEN -180.0 AND 180.0 AND lat3 BETWEEN -90.0 AND 90.0
    """,
)
def q_valid_filter(spark, sf_dir):
    """Valid-coordinate filter (kd_tree.py:406,454): drop out-of-range
    lon/lat; ×2.5 manufactures invalid coordinates."""
    pts = _pts(spark, sf_dir).select(
        "event_id",
        (F.col("lon") * 2.5).alias("lon"),
        (F.col("lat") * 2.5).alias("lat"),
    )
    return pts.filter(valid_lonlat_predicate())


@register(
    "q_bbox_reduce",
    oracle=f"""
    SELECT event_id, lon, lat
    FROM ({PTS_SQL})
    WHERE {bbox_reduce_sql(REDUCE_AREA, 500000.0)}
    """,
)
def q_bbox_reduce(spark, sf_dir):
    """data_reduce buffered-bbox filter (data_reduce.py:224-307) with
    radius_of_influence=500 km; planner computes literal bounds, the
    predicate pushes to the parquet scan."""
    return _pts(spark, sf_dir).select("event_id", "lon", "lat").filter(
        bbox_reduce_predicate(REDUCE_AREA, 500000.0)
    )


@register(
    "q_grid_filter",
    oracle=f"""
    WITH pts AS ({PTS_SQL}),
    assigned AS (
      SELECT event_id,
             CAST(FLOOR((lon - (-180.0)) / 1.0) AS BIGINT) AS cell_col,
             CAST(FLOOR((90.0 - lat) / 1.0) AS BIGINT) AS cell_row
      FROM pts
      WHERE lon >= -180.0 AND lon < 180.0 AND lat > -90.0 AND lat <= 90.0
    )
    SELECT event_id, cell_row * 360 + cell_col AS cell_id
    FROM assigned
    WHERE (cell_row + cell_col) % 3 = 0
    """,
)
def q_grid_filter(spark, sf_dir):
    """GridFilter (geo_filter.py:26-105): keep points whose world-grid
    cell passes a boolean mask; mask table is broadcast."""
    from pyresample_spark.queries.core import WORLD_AREA

    mask = WORLD_AREA.grid(spark).select(
        "cell_id", ((F.col("row") + F.col("col")) % 3 == 0).alias("mask")
    )
    pts = _pts(spark, sf_dir)
    out = grid_filter(pts, mask, WORLD_AREA)
    return out.select("event_id", "cell_id")


@register(
    "q_slice_crop",
    oracle=None,  # filled below after slices are computed
)
def q_slice_crop(spark, sf_dir):
    """Slicer bbox crop + re-origin (slicer.py:38-248, crop_around
    geometry.py:2659): crop the 80×85 test grid to a sub-extent; emit
    the re-origined pixel table."""
    r0, r1, c0, c1 = slice_crop(TEST_AREA, (-5.0, 25.0, 10.0, 32.0))
    g = TEST_AREA.grid(spark)
    cropped = g.filter(
        (F.col("row") >= r0) & (F.col("row") < r1)
        & (F.col("col") >= c0) & (F.col("col") < c1)
    )
    return cropped.select(
        (F.col("row") - r0).alias("new_row"),
        (F.col("col") - c0).alias("new_col"),
        rnd(F.col("cx"), 6).alias("cx"),
        rnd(F.col("cy"), 6).alias("cy"),
    )


# Compute the literal slices once so the oracle embeds identical bounds.
_R0, _R1, _C0, _C1 = slice_crop(TEST_AREA, (-5.0, 25.0, 10.0, 32.0))
from pyresample_spark.queries import REGISTRY as _REG  # noqa: E402

_REG["q_slice_crop"].oracle = f"""
    SELECT row - {_R0} AS new_row, col - {_C0} AS new_col,
           ROUND(cx, 6) + 0.0 AS cx, ROUND(cy, 6) + 0.0 AS cy
    FROM ({TEST_AREA.grid_sql()})
    WHERE row >= {_R0} AND row < {_R1} AND col >= {_C0} AND col < {_C1}
    """


@register(
    "q_mask_filter",
    oracle="""
    SELECT event_id, value
    FROM events
    WHERE NOT (value IS NULL OR value < 20.0)
    """,
)
def q_mask_filter(spark, sf_dir):
    """Mask-based invalidation before resampling (resampler.py:123-139):
    exclude fill/invalid source pixels (here: value < 20 as fill)."""
    from pyresample_spark.operators.bucket import load_events

    ev = load_events(spark, sf_dir)
    return ev.filter(
        ~(F.col("value").isNull() | (F.col("value") < 20.0))
    ).select("event_id", "value")
