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


# Names listed here are moved to the FRONT of the registry, in this order.
# The per-round driver correctness gate checks the first 50 entries only
# (observed rounds 1-5: CORRECTNESS_r0N.json == list(load_all())[:50]).
#
# Round-6 window (VERDICT r5 item 1): the 13 round-5 queries that have
# never had a driver row, followed by 37 of the 50 queries whose latest
# driver row is r3. q_approx_distinct (permanently `no_oracle` — HLL
# sketches differ across engines by design) stays behind the window.
#
# ROUND-7 WINDOW PLAN (VERDICT r5 item 5 — keep the rotation cadence
# alive across builder context resets): the 13 r3-latest rows that did
# NOT fit in this window, then the oldest r4-latest rows to fill 50:
#   r3 leftovers (13): q_bigram_logprob q_dup_span q_curation_pipeline
#     q_bm25 q_token_histogram q_funnel q_events_retention q_regrid_sinu
#     q_regrid_cea q_regrid_ortho q_cube_agg q_exists_semi q_percentiles
#   plus the 21 new round-6 queries with no driver row yet
#   (q_regrid_ups q_regrid_bessel q_contamination_frac q_semdedup
#   q_line_dedup q_cluster_balance q_gopher_rules q_ann_ivf_reuse
#   q_pq_encode q_pq_search q_pq_recall q_proj_abi q_regrid_abi
#   q_doc_chunk q_data_card q_quality_logreg q_tile_assign
#   q_zorder_key q_minhash_band_tuning q_tile_pyramid
#   q_mrl_recall),
#   then the oldest r4-latest rows (CORRECTNESS_r04.json keys minus
#   any re-run since), e.g. q_gauss_agg q_weighted_avg q_ewa_fornav
#   q_coarsen_avg q_bucket_max q_bucket_absmax q_first_per_bin ...
#   to fill 50 (recompute: latest-round-per-query over
#   CORRECTNESS_r0*.json).
_PRIORITY = [
    # --- 13 round-5 queries with no driver row yet ---
    "q_proj_aeqd",
    "q_regrid_aeqd",
    "q_proj_gnom",
    "q_regrid_gnom",
    "q_proj_stere_ell",
    "q_regrid_stere_ell",
    "q_regrid_stere_wgs84",
    "q_proj_geos_ell",
    "q_regrid_geos_ell",
    "q_edit_distance_rank",
    "q_embed_covariance",
    "q_bloom_decontaminate",
    "q_token_entropy",
    # --- 37 r3-latest rows (oldest driver evidence), registry order ---
    "q_scan_lineitem",
    "q_grid_gen",
    "q_lonlat2xyz",
    "q_haversine",
    "q_proj_eqc",
    "q_lonlat_to_cell",
    "q_wrap_lons",
    "q_round_resolution",
    "q_math_suite",
    "q_geocentric_res",
    "q_gradient_lead_lag",
    "q_proj_stere",
    "q_proj_laea",
    "q_valid_filter",
    "q_bbox_reduce",
    "q_grid_filter",
    "q_slice_crop",
    "q_mask_filter",
    "q_bucket_assign",
    "q_bucket_sum",
    "q_bucket_count",
    "q_bucket_avg",
    "q_bucket_min",
    "q_regrid_stere",
    "q_regrid_laea",
    "q_proj_merc",
    "q_get_average_skipna",
    "q_asof_join",
    "q_range_join",
    "q_countmin",
    "q_kmeans_iter",
    "q_hard_negatives",
    "q_embedding_stats",
    "q_embed_quantize",
    "q_ann_ivf_probe2",
    "q_ann_recall",
    "q_dup_inflation",
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
