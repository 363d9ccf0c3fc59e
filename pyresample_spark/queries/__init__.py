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


# ROUND-10 WINDOW (VERDICT r9 item 1, carried from r8): the 48 queries
# whose latest driver evidence is round 5, plus the never-checked NEW
# round-10 query q_multiband_ingest and the oldest-r6 row
# (q_scan_lineitem) to fill 50. Computed as latest-round-per-query
# over CORRECTNESS_r0*.json, never-checked first, then ascending
# round, registration order as tie-break.
#
# ROUND-11 WINDOW PLAN: after r10 lands, rotate the remaining
# r6-latest rows (q_grid_gen first — it yielded its fill slot to
# q_multiband_ingest), then oldest-r7 rows to fill 50 (recompute with
# the same latest-round-per-query procedure).
_PRIORITY = [
    "q_multiband_ingest",
    "q_optimal_bb",
    "q_ewa_ellipse",
    "q_regrid_omerc_exact",
    "q_multiband_resample",
    "q_overlap_rate",
    "q_geos_boundary",
    "q_events_session",
    "q_events_late",
    "q_distinct_agg",
    "q_json_extract",
    "q_events_sliding",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_dedup_ngram_jaccard",
    "q_text_stats",
    "q_lang_id",
    "q_quality_score",
    "q_token_count",
    "q_fingerprint",
    "q_hash_split",
    "q_domain_quota",
    "q_seq_pack",
    "q_dedup_clusters",
    "q_unigram_logprob",
    "q_stratified_sample",
    "q_repetition_ratio",
    "q_decontaminate",
    "q_tfidf",
    "q_mix_weights",
    "q_pii_scrub",
    "q_vocab_stats",
    "q_bloom_filter",
    "q_cosine_topk",
    "q_dedup_embedding",
    "q_ann_ivf",
    "q_ann_lsh",
    "q_dedup_canonical",
    "q_multimodal_meta",
    "q_frame_sample",
    "q_ppm_decode",
    "q_wav_decode",
    "q_ppm_video",
    "q_star_join",
    "q_rollup_agg",
    "q_window_suite",
    "q_pivot",
    "q_grouping_sets",
    "q_scan_lineitem",
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
