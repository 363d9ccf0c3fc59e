"""M3 queries: bucket resampler aggregations (SURVEY.md §2.5).

Input: events points with FIXTURES.md derived lon/lat, bucketed onto the
360×180 world grid. ``value`` is nulled for event_type='error' to
exercise the reference's missing-data semantics (NULL is the engine's
single missing value; SURVEY §7 hard part 1).

All are one-shuffle groupBy aggregations: map-side partial agg + AQE
handles scale and skew; the reference's sort/digitize/histogram
machinery (bucket/__init__.py:32-90) is unnecessary on Spark.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pyresample_spark.operators.bucket import BucketResampler, events_points
from pyresample_spark.queries import register, rnd
from pyresample_spark.queries.geo_scalar import PTS_SQL

# Shared assigned-points CTE (world 1° grid; matches assign_cells on
# WORLD_AREA: col=floor((lon+180)/1), row=floor((90-lat)/1), bounds mask).
ASSIGNED_SQL = f"""
    SELECT event_id, event_type,
           CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value,
           CAST(FLOOR((lon - (-180.0)) / 1.0) AS BIGINT) AS cell_col,
           CAST(FLOOR((90.0 - lat) / 1.0) AS BIGINT) AS cell_row,
           CAST(FLOOR((90.0 - lat) / 1.0) * 360 + FLOOR((lon - (-180.0)) / 1.0) AS BIGINT) AS cell_id
    FROM ({PTS_SQL})
    WHERE lon >= -180.0 AND lon < 180.0 AND lat > -90.0 AND lat <= 90.0
"""


def _assigned(spark, sf_dir):
    from pyresample_spark.queries.core import WORLD_AREA

    pts = events_points(spark, sf_dir).withColumn(
        "value",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.col("value")
        ),
    )
    return BucketResampler(pts, WORLD_AREA, x_col="lon", y_col="lat")


@register(
    "q_bucket_assign",
    oracle=f"SELECT event_id, cell_row, cell_col, cell_id FROM ({ASSIGNED_SQL})",
)
def q_bucket_assign(spark, sf_dir):
    """Bucket index calc: floor division + bounds mask + ravel
    (bucket/__init__.py:168-203, ewa/_ll2cr.pyx:208)."""
    return _assigned(spark, sf_dir).assigned.select(
        "event_id", "cell_row", "cell_col", "cell_id"
    )


@register(
    "q_bucket_sum",
    oracle=f"""
    SELECT cell_id,
           ROUND(SUM(value), 6) + 0.0 AS sum_skipna,
           CASE WHEN MAX(CASE WHEN value IS NULL THEN 1 ELSE 0 END) > 0
                THEN NULL ELSE ROUND(SUM(value), 6) + 0.0 END AS sum_strict
    FROM ({ASSIGNED_SQL})
    GROUP BY cell_id
    """,
)
def q_bucket_sum(spark, sf_dir):
    """Bucket get_sum with both skipna modes (bucket/__init__.py:205-267):
    skipna = native NULL-skipping sum; strict = NaN-poisoning (any NULL
    contributor nulls the bucket)."""
    r = _assigned(spark, sf_dir)
    v = F.col("value")
    return r._group().agg(
        rnd(F.sum(v), 6).alias("sum_skipna"),
        F.when(F.max(v.isNull().cast("int")) > 0, F.lit(None))
        .otherwise(rnd(F.sum(v), 6))
        .alias("sum_strict"),
    ).select("cell_id", "sum_skipna", "sum_strict")


@register(
    "q_bucket_count",
    oracle=f"""
    SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(COUNT(value) AS BIGINT) AS n_valid
    FROM ({ASSIGNED_SQL}) GROUP BY cell_id
    """,
)
def q_bucket_count(spark, sf_dir):
    """Bucket get_count (bucket/__init__.py:374-392)."""
    r = _assigned(spark, sf_dir)
    return r._group().agg(
        F.count(F.lit(1)).alias("n_all"), F.count("value").alias("n_valid")
    ).select("cell_id", "n_all", "n_valid")


@register(
    "q_bucket_avg",
    oracle=f"""
    SELECT cell_id,
           ROUND(SUM(value) / COUNT(value), 6) + 0.0 AS avg_value
    FROM ({ASSIGNED_SQL}) GROUP BY cell_id
    HAVING COUNT(value) > 0
    """,
)
def q_bucket_avg(spark, sf_dir):
    """Bucket get_average: sum / count-of-valid (bucket/__init__.py:394-429)."""
    r = _assigned(spark, sf_dir)
    v = F.col("value")
    return (
        r._group()
        .agg(
            rnd(F.sum(v) / F.count(v), 6).alias("avg_value"),
            F.count(v).alias("_nv"),
        )
        .filter(F.col("_nv") > 0)
        .select("cell_id", "avg_value")
    )


@register(
    "q_get_average_skipna",
    oracle=f"""
    SELECT cell_id,
           CASE WHEN MAX(CASE WHEN value IS NULL THEN 1 ELSE 0 END) > 0
                THEN NULL
                ELSE ROUND(SUM(value) / COUNT(value), 6) + 0.0
           END AS avg_strict
    FROM ({ASSIGNED_SQL}) GROUP BY cell_id
    """,
)
def q_get_average_skipna(spark, sf_dir):
    """Bucket get_average(skipna=False): NaN-poisoned mean — any missing
    contributor nulls the bucket (bucket/__init__.py:394-429, the
    reference's skipna=False mode; same poisoning pattern as get_sum)."""
    r = _assigned(spark, sf_dir)
    out = r.get_average("value", skipna=False)
    return out.select("cell_id", rnd(F.col("avg_value"), 6).alias("avg_strict"))


@register(
    "q_bucket_min",
    oracle=f"""
    SELECT cell_id, MIN(value) AS min_value
    FROM ({ASSIGNED_SQL}) GROUP BY cell_id HAVING COUNT(value) > 0
    """,
)
def q_bucket_min(spark, sf_dir):
    """Bucket get_min (bucket/__init__.py:269-300) — Spark hash-agg
    replaces the reference's sort+digitize first-per-bin machinery."""
    r = _assigned(spark, sf_dir)
    return (
        r._group()
        .agg(F.min("value").alias("min_value"), F.count("value").alias("_nv"))
        .filter(F.col("_nv") > 0)
        .select("cell_id", "min_value")
    )


@register(
    "q_bucket_max",
    oracle=f"""
    SELECT cell_id, MAX(value) AS max_value
    FROM ({ASSIGNED_SQL}) GROUP BY cell_id HAVING COUNT(value) > 0
    """,
)
def q_bucket_max(spark, sf_dir):
    """Bucket get_max (bucket/__init__.py:302-332)."""
    r = _assigned(spark, sf_dir)
    return (
        r._group()
        .agg(F.max("value").alias("max_value"), F.count("value").alias("_nv"))
        .filter(F.col("_nv") > 0)
        .select("cell_id", "max_value")
    )


@register(
    "q_bucket_absmax",
    oracle=f"""
    SELECT cell_id, value AS absmax_value
    FROM (
      SELECT cell_id, value,
             row_number() OVER (PARTITION BY cell_id
                                ORDER BY abs(value) DESC, value DESC) AS rn
      FROM ({ASSIGNED_SQL}) WHERE value IS NOT NULL
    ) WHERE rn = 1
    """,
)
def q_bucket_absmax(spark, sf_dir):
    """Bucket get_abs_max: signed value of max |v| (bucket/__init__.py:
    334-372); values shifted by -100 upstream of this query would add
    negatives. max_by over a (|v|, v) struct key planned a
    SortAggregate (struct keys have no mutable hash-agg buffer —
    EXPLAINS r10 flag), so the tie-break folds into two primitive
    maxes instead: the max |v| plus the max NON-NEGATIVE value; the
    signed answer is +a when a non-negative value attains |v| = a
    (the "v DESC" tie preference), else -a. One HashAggregate with
    map-side partials."""
    r = _assigned(spark, sf_dir)
    v = F.col("value")
    agg = (
        r.assigned.filter(v.isNotNull())
        .groupBy("cell_id")
        .agg(
            F.max(F.abs(v)).alias("a"),
            F.max(F.when(v >= 0, v)).alias("p"),
        )
    )
    return agg.select(
        "cell_id",
        F.when(F.col("p") == F.col("a"), F.col("a"))
        .otherwise(-F.col("a"))
        .alias("absmax_value"),
    )


@register(
    "q_bucket_fractions",
    oracle=f"""
    SELECT cell_id,
           CAST((SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS frac_click_q6,
           CAST((SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS frac_view_q6,
           CAST((SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS frac_purchase_q6
    FROM ({ASSIGNED_SQL}) GROUP BY cell_id
    """,
)
def q_bucket_fractions(spark, sf_dir):
    """Bucket get_fractions: per-cell categorical fractions
    (bucket/__init__.py:431-469) — pivot-style conditional counts.

    Fractions are emitted as EXACT 1e-6-quantized integers
    (count·10⁶ div n): AVG of 0/1 is a small-denominator rational that
    can land exactly on a ROUND half-way boundary where Spark's and
    DuckDB's double→decimal rounding disagree (observed on the
    sibling q_sessionize_gap at sf0.1); integer division is
    bit-identical on both engines at any scale."""
    r = _assigned(spark, sf_dir)
    aggs = [
        F.expr(
            f"sum(case when event_type = '{c}' then 1 else 0 end)"
            f" * 1000000 div count(*)"
        ).alias(f"frac_{c}_q6")
        for c in ["click", "view", "purchase"]
    ]
    return r._group().agg(*aggs).select(
        "cell_id", "frac_click_q6", "frac_view_q6", "frac_purchase_q6"
    )


@register(
    "q_first_per_bin",
    oracle=f"""
    SELECT cell_id, event_id AS first_event, value AS first_value
    FROM (
      SELECT cell_id, event_id, value,
             row_number() OVER (PARTITION BY cell_id
                                ORDER BY value ASC, event_id ASC) AS rn
      FROM ({ASSIGNED_SQL}) WHERE value IS NOT NULL
    ) WHERE rn = 1
    """,
)
def q_first_per_bin(spark, sf_dir):
    """First-per-bin after value sort (bucket/__init__.py:32-71) — the
    top-1-per-group window idiom; event_id tie-break keeps double ties
    deterministic."""
    r = _assigned(spark, sf_dir)
    w = W.partitionBy("cell_id").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return (
        r.assigned.filter(F.col("value").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cell_id",
            F.col("event_id").alias("first_event"),
            F.col("value").alias("first_value"),
        )
    )


@register(
    "q_coarsen_avg",
    oracle=f"""
    SELECT CAST(cell_row // 4 AS BIGINT) AS crow,
           CAST(cell_col // 4 AS BIGINT) AS ccol,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) / COUNT(*) / 1000000.0, 6) + 0.0 AS avg_value
    FROM ({ASSIGNED_SQL}) WHERE value IS NOT NULL
    GROUP BY crow, ccol
    """,
)
def q_coarsen_avg(spark, sf_dir):
    """Swath/area aggregate (coarsen) — ky×kx window averaging
    (geometry.py:864-899): groupBy(floor(row/k), floor(col/k)).avg.
    Exact integer-micro sums keep the mean order-insensitive."""
    r = _assigned(spark, sf_dir)
    df = r.assigned.filter(F.col("value").isNotNull())
    v_u = F.round(F.col("value") * 1e6, 0).cast("bigint")
    return (
        df.groupBy(
            F.floor(F.col("cell_row") / 4).alias("crow"),
            F.floor(F.col("cell_col") / 4).alias("ccol"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.sum(v_u) / F.count(F.lit(1)) / 1e6, 6).alias("avg_value"),
        )
    )


@register(
    "q_domain_bounds",
    oracle=f"""
    SELECT ROUND(MIN(lon), 6) + 0.0 AS min_lon, ROUND(MAX(lon), 6) + 0.0 AS max_lon,
           ROUND(MIN(lat), 6) + 0.0 AS min_lat, ROUND(MAX(lat), 6) + 0.0 AS max_lat,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ({PTS_SQL})
    """,
)
def q_domain_bounds(spark, sf_dir):
    """DynamicAreaDefinition.freeze domain bounds (geometry.py:1127-1345):
    global min/max agg → extent."""
    pts = events_points(spark, sf_dir)
    return pts.agg(
        rnd(F.min("lon"), 6).alias("min_lon"),
        rnd(F.max("lon"), 6).alias("max_lon"),
        rnd(F.min("lat"), 6).alias("min_lat"),
        rnd(F.max("lat"), 6).alias("max_lat"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_freeze_antimeridian",
    oracle=f"""
    WITH pts AS (
      SELECT ((lon / 10.0 + 190.5 + 540.0) % 360.0) - 180.0 AS x, lat AS y
      FROM ({PTS_SQL})
    ),
    a AS (
      SELECT MIN(x) AS minx, MAX(x) AS maxx, MIN(y) AS miny, MAX(y) AS maxy,
             MIN((x + 360.0) % 360.0) AS sminx, MAX((x + 360.0) % 360.0) AS smaxx
      FROM pts
    ),
    m AS (SELECT *, (smaxx - sminx) < (maxx - minx) AS crosses FROM a),
    -- one row per mode with that mode's pixel-CENTER corners
    c AS (
      SELECT 'default' AS mode, minx AS cx0, miny AS cy0, maxx AS cx1, maxy AS cy1 FROM m
      UNION ALL
      SELECT 'modify_extents',
             CASE WHEN crosses THEN sminx ELSE minx END, miny,
             CASE WHEN crosses THEN smaxx ELSE maxx END, maxy FROM m
      UNION ALL
      SELECT 'global_extents',
             CASE WHEN crosses THEN -180.0 ELSE minx END, miny,
             CASE WHEN crosses THEN 180.0 ELSE maxx END, maxy FROM m
    )
    -- compute_domain padding: corners are pixel centers; pad by half a
    -- resolution (1.0 here) and floor/ceil-align to resolution multiples
    SELECT mode,
           ROUND(FLOOR(cx0 - 0.5), 6) + 0.0 AS llx,
           ROUND(FLOOR(cy0 - 0.5), 6) + 0.0 AS lly,
           ROUND(CEIL(cx1 + 0.5), 6) + 0.0 AS urx,
           ROUND(CEIL(cy1 + 0.5), 6) + 0.0 AS ury,
           CAST(ROUND(CEIL(cx1 + 0.5) - FLOOR(cx0 - 0.5)) AS BIGINT) AS width
    FROM c
    """,
)
def q_freeze_antimeridian(spark, sf_dir):
    """DynamicAreaDefinition.freeze antimeridian modes
    (geometry.py:1224-1294): a dateline-straddling swath (events lons
    compressed and recentered on 180°) frozen under default /
    modify_extents / global_extents. Crossing detection and both candidate
    extents come from ONE aggregation (natural and [0,360)-shifted frames
    in the same pass); the mode choice is driver-side planning."""
    from pyresample_spark.geometry import DynamicAreaDefinition

    pts = events_points(spark, sf_dir).select(
        (((F.col("lon") / 10.0 + 190.5 + 540.0) % 360.0) - 180.0).alias("x"),
        F.col("lat").alias("y"),
    )
    dyn = DynamicAreaDefinition("dyn", "longlat", resolution=(1.0, 1.0))
    rows = []
    for mode in (None, "modify_extents", "global_extents"):
        a = dyn.freeze(pts, antimeridian_mode=mode)
        llx, lly, urx, ury = a.area_extent
        rows.append(
            (
                mode or "default",
                round(llx, 6) + 0.0,
                round(lly, 6) + 0.0,
                round(urx, 6) + 0.0,
                round(ury, 6) + 0.0,
                a.width,
            )
        )
    return spark.createDataFrame(
        rows, "mode string, llx double, lly double, urx double, ury double, width long"
    )
