"""A/B: apply-side gauss fold over the persisted LUT, bucketed-table
layout vs plain parquet (VERDICT r4 item 2).

The apply side is q_gauss_lut_reuse's shape: LUT scan + broadcast
channel join + groupBy(tgt_id) agg. Bucketed layout removes the final
Exchange; plain parquet shuffles the full (tgt_id, src_id, dist_m)
pair table. Run: python tools/ab_lut_bucketing.py [sf_dir] [reps]
"""
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyresample_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab_lut_bucketing")

    from pyresample_spark.operators.knn import gauss_weight
    from pyresample_spark.queries.joins import SIGMA, _src, gauss_lut

    with tempfile.TemporaryDirectory() as td:
        lut_b = gauss_lut(spark, sf_dir, cache_dir=os.path.join(td, "b"))
        plain_p = os.path.join(td, "plain.parquet")
        lut_b.write.mode("overwrite").parquet(plain_p)
        lut_p = spark.read.parquet(plain_p)

        ch = _src(spark, sf_dir).select(
            "src_id", (F.col("value") * 0.5 + 10.0).alias("ch2"))

        def apply_side(lut):
            wp = lut.join(F.broadcast(ch), "src_id").withColumn(
                "w", gauss_weight(F.col("dist_m"), SIGMA))
            return wp.groupBy("tgt_id").agg(
                (F.sum(F.col("w") * F.col("ch2")) / F.sum("w")).alias("v"),
                F.count(F.lit(1)).alias("n"))

        out = {}
        for name, lut in (("bucketed", lut_b), ("plain_parquet", lut_p)):
            plan = apply_side(lut)._jdf.queryExecution().executedPlan().toString()
            # shuffle exchanges only — BroadcastExchange (the channel
            # dim) is not a shuffle
            n_exch = plan.count("Exchange hashpartitioning")
            ts = []
            for _ in range(reps):
                t0 = time.monotonic()
                apply_side(lut).write.mode("overwrite").format("noop").save()
                ts.append(time.monotonic() - t0)
            out[name] = {"exchanges": n_exch,
                         "median_s": round(statistics.median(ts), 3),
                         "all_s": [round(t, 3) for t in ts]}
        import json
        print(json.dumps({"sf_dir": sf_dir, "lut_rows": lut_b.count(),
                          **out}))


if __name__ == "__main__":
    main()
