"""Measured evidence that the incremental-dedup probe cost is
O(new batch), not O(corpus history) — PERF.md datum for
q_dedup_incremental / streaming_lsh_probe.

Builds the historical LSH band index at several amplifications (each
replica's docs get distinct ids and a salt word so signatures differ),
persists each through LutCache (bucketed by sig), then times the SAME
fixed new batch probing each index, warm. If the plan is right, probe
wall-clock stays ~flat while the index grows N×.

Run: python tools/scale_probe_incremental.py [N ...]  (default 1 4 16)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    from pyresample_spark.operators.dedup import minhash_bands_inrow
    from pyresample_spark.plans.lut import LutCache
    from pyresample_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-probe-incremental")
    spark.range(10).count()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base = docs.filter(F.col("doc_id") % 10 < 8).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 10 >= 8).select("doc_id", "text")
    n_new = new.count()
    cache_dir = tempfile.mkdtemp(prefix="probe_inc_luts_")
    cache = LutCache(cache_dir, bucket_col="sig")
    for n in ns:
        hist = (
            base.withColumn("r", F.explode(F.expr(f"sequence(0, {n - 1})")))
            .select(
                (F.col("doc_id") * n + F.col("r")).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" salt"),
                         F.col("r").cast("string")).alias("text"),
            )
        )
        key_name = f"hist{n}x"
        index = cache.get_or_compute(
            spark, key_name, "bands", 0.0, ("inc", n),
            lambda: minhash_bands_inrow(hist, 3),
        )
        idx_rows = index.count()

        def probe():
            from pyresample_spark.operators.dedup import lsh_probe_pairs

            pairs = lsh_probe_pairs(
                minhash_bands_inrow(new, 3), index
            ).groupBy("new_doc", "matched_doc").agg(
                F.count(F.lit(1)).alias("nb")
            )
            pairs.write.format("noop").mode("overwrite").save()

        probe()  # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            probe()
            ts.append(time.time() - t0)
        ts.sort()
        print(
            f"history={n:3d}x index_rows={idx_rows:>9,} "
            f"new_batch={n_new} probe_median={ts[1]:.2f}s "
            f"({ts[0]:.2f}-{ts[-1]:.2f})"
        )


if __name__ == "__main__":
    main()
