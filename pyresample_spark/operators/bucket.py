"""Bucket resampler — drop-in-a-bucket aggregation onto a target grid.

Reference parity: pyresample/bucket/__init__.py —
- cell assignment (ll2cr-style floor division + bounds mask): :155-203
- get_sum (incl. skipna semantics): :205-267
- get_count: :374-392, get_average: :394-429
- get_min/get_max (sort + first-per-bin machinery): :32-90, 269-332
- get_abs_max: :334-372, get_fractions: :431-469

Spark-first rewrite: the entire sort/digitize/histogram machinery of the
reference collapses to ``groupBy(cell).agg(...)`` — Catalyst hash-agg
already does partial (map-side) + final aggregation, which is exactly the
dask tree-reduce the reference hand-rolls. At 100 TB the only shuffle is
on the cell key; hot cells (many swath pixels per target cell) are
handled by AQE skew-split plus map-side partial agg (a cell's rows are
pre-combined within each task before shuffling).

Missing-value semantics: the engine's single missing value is NULL
(SURVEY.md §7 hard part 1). ``skipna=True`` = Spark's native aggregate
behaviour (aggregates skip NULLs). ``skipna=False`` = NaN-poisoning of
the reference (:261-267): any NULL contribution poisons the cell —
implemented with a ``max(is_null)`` flag + ``when``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyresample_spark.functions.geo import derived_lat, derived_lon
from pyresample_spark.geometry import AreaDefinition


def assign_cells(
    df: DataFrame,
    area: AreaDefinition,
    x_col: str = "x",
    y_col: str = "y",
    keep_out_of_bounds: bool = False,
) -> DataFrame:
    """Add (cell_row, cell_col, cell_id) for each point (bucket
    __init__.py:168-203, ewa/_ll2cr.pyx:208 static path).

    Pure column math — no join, no shuffle; stays in WholeStageCodegen.
    """
    out = df.withColumn("cell_col", area.col_from_x(F.col(x_col))).withColumn(
        "cell_row", area.row_from_y(F.col(y_col))
    )
    if not keep_out_of_bounds:
        out = out.filter(area.in_bounds(F.col("cell_row"), F.col("cell_col")))
    return out.withColumn(
        "cell_id", F.col("cell_row") * area.width + F.col("cell_col")
    )


class BucketResampler:
    """Fluent bucket aggregations over an assigned point table.

    ``stats`` composes multiple statistics in ONE aggregation pass (one
    shuffle) — the reference computes each statistic as a separate dask
    graph; here a combined pass is free.
    """

    def __init__(self, df: DataFrame, area: AreaDefinition, x_col="x", y_col="y"):
        self.area = area
        self.assigned = assign_cells(df, area, x_col, y_col)

    def _group(self):
        return self.assigned.groupBy("cell_row", "cell_col", "cell_id")

    def get_count(self) -> DataFrame:
        return self._group().agg(F.count(F.lit(1)).alias("n"))

    def get_sum(self, value_col: str, skipna: bool = True) -> DataFrame:
        v = F.col(value_col)
        if skipna:
            agg = F.sum(v).alias("sum_value")
        else:
            # NaN-poisoning (bucket/__init__.py:261-267): any missing
            # contribution nulls the bucket.
            agg = F.when(
                F.max(v.isNull().cast("int")) > 0, F.lit(None)
            ).otherwise(F.sum(v)).alias("sum_value")
        return self._group().agg(agg)

    def get_average(self, value_col: str, skipna: bool = True) -> DataFrame:
        # sum / count-of-non-null (bucket/__init__.py:394-429);
        # skipna=False poisons a bucket containing any missing value,
        # matching reference get_average(skipna=False).
        v = F.col(value_col)
        avg = F.sum(v) / F.count(v)
        if not skipna:
            avg = F.when(
                F.max(v.isNull().cast("int")) > 0, F.lit(None)
            ).otherwise(avg)
        return self._group().agg(avg.alias("avg_value"))

    def get_min(self, value_col: str) -> DataFrame:
        return self._group().agg(F.min(value_col).alias("min_value"))

    def get_max(self, value_col: str) -> DataFrame:
        return self._group().agg(F.max(value_col).alias("max_value"))

    def get_abs_max(self, value_col: str) -> DataFrame:
        # signed value of max |v| (bucket/__init__.py:334-372);
        # max_by(v, (|v|, v)) with v as deterministic tie-break when
        # -x and +x both present.
        v = F.col(value_col)
        return self._group().agg(
            F.max_by(v, F.struct(F.abs(v), v)).alias("absmax_value")
        )

    def get_fractions(self, cat_col: str, categories: list) -> DataFrame:
        # per-cell fraction of each category (bucket/__init__.py:431-469)
        aggs = [
            F.avg(F.when(F.col(cat_col) == c, 1.0).otherwise(0.0)).alias(
                f"frac_{c}"
            )
            for c in categories
        ]
        return self._group().agg(*aggs)

    def stats(self, value_col: str) -> DataFrame:
        """count/sum/avg/min/max in a single shuffle."""
        v = F.col(value_col)
        return self._group().agg(
            F.count(v).alias("n"),
            F.sum(v).alias("sum_value"),
            F.avg(v).alias("avg_value"),
            F.min(v).alias("min_value"),
            F.max(v).alias("max_value"),
        )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table with ``ts`` normalized to BIGINT epoch-ns.

    The generated events.parquet has shipped with two timestamp
    flavors: TIMESTAMP(NANOS) (Spark 4 rejects by default — read as raw
    int64 via ``nanosAsLong``) and TIMESTAMP(MICROS) (reads natively as
    TIMESTAMP_NTZ). Either way the contract downstream is the same:
    ``ts`` is BIGINT epoch-nanoseconds, so all window math is integer
    arithmetic, exact on both Spark and the DuckDB oracle
    (``epoch_us(ts)`` there, ``ts div 1000`` here). The NTZ→epoch
    conversion is exact because the session timezone is pinned to UTC
    (session.py)."""
    import os

    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = ev.schema["ts"].dataType
    if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        ev = ev.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
        )
    return ev


def events_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table with deterministic derived lon/lat (FIXTURES.md §3)."""
    ev = load_events(spark, sf_dir)
    return ev.withColumn("lon", derived_lon()).withColumn("lat", derived_lat())


def flagship_bucket_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: bucket-average events.value onto the 360×180 world grid.

    scan → derive lon/lat → cell assign (column math) → groupBy agg.
    One shuffle on the cell key; at 100 TB this is a pure map-side-
    combined hash aggregation over ~65k groups.
    """
    from pyresample_spark.queries.core import WORLD_AREA

    pts = events_points(spark, sf_dir)
    r = BucketResampler(pts, WORLD_AREA, x_col="lon", y_col="lat")
    return (
        r.get_average("value")
        .withColumn("avg_value", F.round("avg_value", 6))
        .select("cell_id", "cell_row", "cell_col", "avg_value")
    )
