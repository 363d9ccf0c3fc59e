"""Query registry: one entry per implemented operator (SURVEY.md §2).

Each query is a ``QuerySpec`` holding a Spark plan builder
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a DuckDB
oracle SQL string over the pre-registered views (region nation customer
supplier part orders lineitem events documents embeddings). The driver
compares row-count + schema + order-insensitive value-hash at sf0.01.

Hash-stability rules used by every query here:
- Per-row computed doubles are rounded to 6 decimals (FIXTURES.md §4).
- Sums of doubles are made order-insensitive and engine-exact by rounding
  per-row to fixed decimals, casting to BIGINT, and summing integers.
- Ranks over doubles order by (round(key, 9), id) so a last-ulp libm
  difference cannot flip the ordering.
- No raw timestamps in output schemas — cast to epoch BIGINT or strings.
- Aggregates of integers are CAST to BIGINT on the DuckDB side (DuckDB
  sums integers into HUGEINT).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


def rnd(col, n: int = 6):
    """Round a double for hash-stable output, normalizing -0.0 → +0.0
    (DuckDB keeps the sign of a rounded negative underflow; Spark does
    not — ``+ 0.0`` makes both engines emit +0.0)."""
    from pyspark.sql import functions as F

    return F.round(col, n) + F.lit(0.0)


def rnd_sql(expr: str, n: int = 6) -> str:
    return f"(ROUND({expr}, {n}) + 0.0)"


@dataclass
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple = ()
    doc: str = ""


REGISTRY: dict = {}


def register(name: str, oracle: str | None = None, tags: tuple = ()):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags, doc=fn.__doc__ or "")
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all() -> dict:
    """Import every query module so REGISTRY is fully populated."""
    from pyresample_spark.queries import (  # noqa: F401
        core,
        geo_scalar,
        filters,
        bucket,
        joins,
        resample,
        setops,
        events,
        textops,
        similarity,
        multimodal,
        olap,
    )

    return REGISTRY
