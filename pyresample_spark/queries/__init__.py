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


# ROUND-12 WINDOW (VERDICT r11 items 1-2): the NEW never-checked
# q_regrid_datum (native +towgs84 Helmert datum shift, this round's
# headline operator) goes first, then the three r6-latest rows
# (q_bucket_sum, q_embed_quantize, q_embed_covariance — judge
# re-verified cell-for-cell in the r11 judging session, but driver
# evidence is still r6), then the 46 oldest-r7 rows in registry order.
# Eleven r7 rows did not fit and roll to r13: q_minhash_band_tuning,
# q_semdedup, q_cluster_balance, q_ann_ivf_reuse, q_pq_encode,
# q_pq_search, q_pq_recall, q_mrl_recall, q_exists_semi,
# q_percentiles, q_cube_agg (each yielded its slot to one of the
# eight NEW never-checked round-12 queries: q_regrid_datum,
# q_regrid_gk, q_regrid_ease2, q_regrid_ease2_north, q_regrid_etrs89,
# q_cog_ingest, q_regrid_lcc93, q_regrid_merc3395).
#
# ROUND-13 PLAN (recompute with the same latest-round-per-query
# procedure over all CORRECTNESS_r*.json): any new never-checked
# queries first, then the 4 leftover r7 rows above, then the
# oldest-r9 rows (48 at r9 as of r11) to fill 50.
_PRIORITY = [
    "q_regrid_datum",
    "q_regrid_gk",
    "q_regrid_ease2",
    "q_regrid_ease2_north",
    "q_regrid_etrs89",
    "q_cog_ingest",
    "q_regrid_lcc93",
    "q_regrid_merc3395",
    "q_bucket_sum",
    "q_embed_quantize",
    "q_embed_covariance",
    "q_proj_abi",
    "q_tile_assign",
    "q_zorder_key",
    "q_tile_pyramid",
    "q_proj_udf",
    "q_knn_join",
    "q_nn_gather",
    "q_gauss_agg",
    "q_weighted_avg",
    "q_custom_weight",
    "q_multichannel_gauss",
    "q_linesample_join",
    "q_bilinear_regular",
    "q_affine_regrid",
    "q_ewa_fornav",
    "q_bilinear_irregular",
    "q_regrid_ortho",
    "q_regrid_cea",
    "q_regrid_sinu",
    "q_regrid_ups",
    "q_regrid_bessel",
    "q_regrid_abi",
    "q_gradient_walk",
    "q_ewa_multiband",
    "q_approx_distinct",
    "q_funnel",
    "q_events_retention",
    "q_bm25",
    "q_curation_pipeline",
    "q_dup_span",
    "q_bigram_logprob",
    "q_token_histogram",
    "q_dedup_span_mask",
    "q_contamination_frac",
    "q_line_dedup",
    "q_gopher_rules",
    "q_doc_chunk",
    "q_data_card",
    "q_quality_logreg",
]

def load_all() -> dict:
    """Import every query module so REGISTRY is fully populated.

    Returns the registry with ``_PRIORITY`` names first (driver-unchecked
    and new queries), then everything else in registration order.
    """
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

    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise RuntimeError(
            f"_PRIORITY lists unregistered queries: {missing} — "
            "implement them or remove the names (VERDICT r3 item 2)"
        )
    front = {n: REGISTRY[n] for n in _PRIORITY}
    rest = {n: s for n, s in REGISTRY.items() if n not in front}
    return {**front, **rest}
