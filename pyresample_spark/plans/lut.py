"""Neighbour-info LUT precompute + persistence (SURVEY.md §4, M5).

Reference parity: BaseResampler.precompute caching keyed by geometry
hash (resampler.py:69-88), bilinear zarr LUT save/load
(bilinear/xarr.py:198-219), JSON slice cache (_caching.py:21-113).

Spark-first: the "neighbour info" IS a DataFrame
(tgt_id, src_id, dist_m[, nn_rank]) — the materialized join result.
Caching = ``persist()`` within a session and parquet write/read across
sessions, keyed by (source geometry hash, target geometry hash, radius,
k). Reusing the LUT across channels/datasets is the reference's main
performance lever ("can increase performance greatly",
docs/concepts/resampling.rst:98-101): at 100 TB, one expensive spatial
join amortizes over every subsequent gather, which becomes a plain
equi-join on src_id.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession


class LutCache:
    """Parquet-backed cache of precomputed join LUTs."""

    def __init__(self, base_dir: str):
        self.base_dir = base_dir

    def key(self, src_hash: str, tgt_hash: str, radius_m: float, k) -> str:
        payload = f"{src_hash}|{tgt_hash}|{radius_m!r}|{k!r}"
        return hashlib.sha1(payload.encode()).hexdigest()[:20]

    def path(self, key: str) -> str:
        return os.path.join(self.base_dir, f"lut_{key}.parquet")

    def load(self, spark: SparkSession, key: str) -> DataFrame | None:
        p = self.path(key)
        if os.path.exists(p):
            return spark.read.parquet(p)
        return None

    def save(self, lut: DataFrame, key: str) -> DataFrame:
        p = self.path(key)
        os.makedirs(self.base_dir, exist_ok=True)
        # Write partitioned by nothing (LUTs are already key-sorted by
        # the window); at cluster scale add .repartition(n, "tgt_id")
        # so the apply-side join co-locates.
        lut.write.mode("overwrite").parquet(p)
        return lut.sparkSession.read.parquet(p)

    def get_or_compute(
        self,
        spark: SparkSession,
        src_hash: str,
        tgt_hash: str,
        radius_m: float,
        k,
        compute,
    ) -> DataFrame:
        key = self.key(src_hash, tgt_hash, radius_m, k)
        cached = self.load(spark, key)
        if cached is not None:
            return cached
        return self.save(compute(), key)
