"""Measured scaling of the MinHash near-dup pipeline (PERF.md evidence).

Amplifies the shingle stream in-plan N× — each replica's shingles are
salted with the replica index and its doc_ids remapped, so content is
decorrelated across replicas and the candidate-pair structure grows
linearly (the honest throughput experiment; un-salted copies would be
mutual near-dups and grow candidates quadratically, measuring a
different workload).

Pipeline under test = exactly what minhash_candidates runs after
shingling: one wide groupBy(doc_id) with 16 min(h0 ^ Cj) columns →
stack() band unpivot → band equi-self-join → pair agg.

Run: python tools/scale_probe_minhash.py [N ...]   (default 1 4 16 64)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyresample_spark.operators.dedup import minhash_bands_wide, shingles
from pyresample_spark.queries import table
from pyresample_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def amplified_candidates(spark, n: int):
    docs = table(spark, SF, "documents").select("doc_id", "text")
    sh = shingles(docs, 3)
    amp = (
        sh.select(
            "doc_id",
            "shingle",
            F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("rep"),
        )
        .select(
            (F.col("doc_id") * n + F.col("rep")).alias("doc_id"),
            F.concat_ws("\x1f", "shingle", F.col("rep").cast("string")).alias(
                "shingle"
            ),
        )
    )
    sigs = minhash_bands_wide(amp)
    a = sigs.select(F.col("doc_id").alias("doc1"), "band", "sig")
    b = sigs.select(F.col("doc_id").alias("doc2"), "band", "sig")
    pairs = a.join(b, ["band", "sig"]).filter(F.col("doc1") < F.col("doc2"))
    return pairs.groupBy("doc1", "doc2").agg(
        F.count(F.lit(1)).alias("n_shared_bands")
    )


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 64]
    spark = get_spark("scale-probe-minhash")
    spark.range(10).count()  # JVM warm-up
    for n in ns:
        t0 = time.monotonic()
        cnt = amplified_candidates(spark, n).count()
        dt = time.monotonic() - t0
        print(f"N={n:>3}  candidates={cnt:>8}  wall={dt:6.2f}s", flush=True)


if __name__ == "__main__":
    main()
