"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (bucket-average resample of the
events table onto a 360×180 world grid — scan → derive lon/lat → cell
assignment → groupBy agg, the canonical pyresample "bucket" pipeline,
SURVEY.md §2.5). ``queries()``/``oracle_sql()`` expose the full operator
registry from ``pyresample_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyresample_spark.queries import load_all

_REGISTRY = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyresample_spark.operators.bucket import flagship_bucket_average

    return flagship_bucket_average(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    operators — the driver then records a weaker rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in _REGISTRY.items()
        if spec.oracle is not None
    }
