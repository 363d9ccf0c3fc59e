"""Measured scaling of the fused gaussian kNN resample (PERF.md
evidence for the round-4 knn_gauss_fold plan).

Amplifies the source point cloud in-plan N× — each replica's points are
jittered by a deterministic per-replica offset (~0.005° · replica) so
density grows linearly and every replica contributes distinct
candidates. The target grid is FIXED (the 2° world grid), so the
experiment measures how the one-shuffle fold plan absorbs a growing
build side: candidate pairs grow ~linearly with N, the aggregate state
stays one row per target.

Run: python tools/scale_probe_gauss.py [N ...]   (default 1 2 4 8)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyresample_spark.operators.knn import knn_gauss_fold
from pyresample_spark.queries.joins import RADIUS_M, SIGMA, _src, _tgt
from pyresample_spark.session import get_spark


def main():
    ns = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-probe-gauss")
    spark.range(10).count()
    base = _src(spark, sf_dir)
    tgt = _tgt(spark)
    for n in ns:
        src = (
            base.withColumn("r", F.explode(F.expr(f"sequence(0, {n - 1})")))
            .select(
                (F.col("src_id") * n + F.col("r")).alias("src_id"),
                "value",
                (F.col("lon") + F.col("r") * 0.005).alias("lon"),
                (F.col("lat") + F.col("r") * 0.003).alias("lat"),
            )
        )
        t0 = time.time()
        out = knn_gauss_fold(src, tgt, RADIUS_M, k=8, sigma=SIGMA)
        rows = out.count()
        dt = time.time() - t0
        print(
            f"N={n:3d} src_rows≈{n}×base targets_hit={rows} "
            f"wall={dt:.2f}s per_replica={dt / n:.2f}s"
        )


if __name__ == "__main__":
    main()
