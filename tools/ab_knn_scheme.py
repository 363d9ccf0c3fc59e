"""A/B probe: 27-neighbor/c cells vs 8-neighbor/2c cells for the kNN
cell join (operators/knn.py _radius_pairs neighbor_scheme).

Both schemes are EXACT (identical pair sets — pytest-enforced); they
trade probe-side shuffle volume (27x vs 8x row amplification of
ids+coords) against candidate-filter compute (cells of side 2c hold
8x the volume, so ~2.4x the candidate pairs reach the exact distance
filter). On local[32] the join is compute-bound, so c27 is expected
to win; on a network-bound cluster the 3.4x probe-shuffle saving of
2c8 is the argument for keeping it implemented and measured.

Run: python tools/ab_knn_scheme.py [n_src] [n_tgt] [reps]
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyresample_spark.session import get_spark


def main():
    n_src = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_tgt = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    radius = 50_000.0
    spark = get_spark("knn_scheme_ab")

    from pyresample_spark.operators.knn import (
        _radius_pairs,
        chord_length,
        knn_join,
    )

    # dense uniform-ish swath (hash-scattered over a 40x20 degree box)
    src = spark.range(n_src).select(
        F.col("id").alias("src_id"),
        (F.pmod(F.hash(F.col("id") * 7 + 1), F.lit(40_000)) / 1000.0)
        .alias("lon"),
        (30.0 + F.pmod(F.hash(F.col("id") * 13 + 5), F.lit(20_000)) / 1000.0)
        .alias("lat"),
    )
    tgt = spark.range(n_tgt).select(
        F.col("id").alias("tgt_id"),
        (F.pmod(F.hash(F.col("id") * 3 + 2), F.lit(40_000)) / 1000.0)
        .alias("lon"),
        (30.0 + F.pmod(F.hash(F.col("id") * 5 + 9), F.lit(20_000)) / 1000.0)
        .alias("lat"),
    )
    c = chord_length(radius)

    from pyresample_spark.operators.knn import with_cells, with_geocentric

    def prefilter_count(scheme):
        """Join cardinality BEFORE the exact distance filter — the
        rows the filter must chew through (the compute side of the
        trade; _radius_pairs itself returns post-filter pairs, which
        are scheme-independent by correctness)."""
        if scheme == "shift2":
            cell = 2.0 * c

            def shift2(df, idc):
                return df.withColumn(
                    "grid", F.explode(F.array(F.lit(0), F.lit(1)))
                ).select(
                    idc,
                    "grid",
                    F.floor(F.col("gx") / cell + F.col("grid") * 0.5).alias("cx3"),
                    F.floor(F.col("gy") / cell + F.col("grid") * 0.5).alias("cy3"),
                    F.floor(F.col("gz") / cell + F.col("grid") * 0.5).alias("cz3"),
                )

            sc = shift2(with_geocentric(src), "src_id")
            tc = shift2(with_geocentric(tgt), "tgt_id")
            return tc.hint("shuffle_hash").join(
                sc, ["grid", "cx3", "cy3", "cz3"]
            ).count()
        cell = c if scheme == "c27" else 2.0 * c
        sc = with_cells(with_geocentric(src), cell).select(
            "src_id", "cx3", "cy3", "cz3"
        )
        tk = with_cells(with_geocentric(tgt), cell)
        if scheme == "c27":
            off = F.expr(
                "explode(flatten(transform(sequence(-1,1), dx -> "
                "flatten(transform(sequence(-1,1), dy -> "
                "transform(sequence(-1,1), dz -> struct(dx, dy, dz)))))))"
            )
        else:
            for ax, g in (("bx", "gx"), ("by", "gy"), ("bz", "gz")):
                tk = tk.withColumn(
                    ax,
                    F.when(
                        F.col(g) - F.col(f"c{ax[1]}3") * cell < c,
                        F.lit(-1),
                    ).otherwise(F.lit(1)).cast("long"),
                )
            off = F.expr(
                "explode(flatten(transform(array(0L, bx), dx -> "
                "flatten(transform(array(0L, by), dy -> "
                "transform(array(0L, bz), dz -> struct(dx, dy, dz)))))))"
            )
        tc = tk.select(
            "tgt_id", "cx3", "cy3", "cz3", off.alias("o")
        ).selectExpr(
            "tgt_id", "cx3 + o.dx AS cx3", "cy3 + o.dy AS cy3",
            "cz3 + o.dz AS cz3",
        )
        return tc.hint("shuffle_hash").join(
            sc, ["cx3", "cy3", "cz3"]
        ).count()

    out = {"n_src": n_src, "n_tgt": n_tgt, "radius_m": radius,
           "load1_start": round(os.getloadavg()[0], 2)}
    for scheme in ("c27", "2c8", "shift2"):
        cand = prefilter_count(scheme)
        # warm
        knn_join(src, tgt, radius, k=1, neighbor_scheme=scheme) \
            .write.mode("overwrite").format("noop").save()
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            knn_join(src, tgt, radius, k=1, neighbor_scheme=scheme) \
                .write.mode("overwrite").format("noop").save()
            ts.append(round(time.monotonic() - t0, 2))
        out[scheme] = {
            "prefilter_pairs": cand,
            "knn_wall_s": ts,
            "knn_median_s": statistics.median(ts),
        }
    # recall@1 / coverage of the approximate shift2 tier vs exact c27
    exact = knn_join(src, tgt, radius, k=1).select(
        "tgt_id", F.col("src_id").alias("e_src")
    )
    approx = knn_join(
        src, tgt, radius, k=1, neighbor_scheme="shift2"
    ).select("tgt_id", F.col("src_id").alias("a_src"))
    j = exact.join(approx, "tgt_id", "left").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count("a_src").alias("n_found"),
        F.coalesce(
            F.sum(F.when(F.col("a_src") == F.col("e_src"), 1).otherwise(0)),
            F.lit(0),
        ).alias("n_same"),
    ).collect()[0]
    out["shift2_recall_at_1"] = round(j.n_same / max(j.n_exact, 1), 4)
    out["shift2_coverage"] = round(j.n_found / max(j.n_exact, 1), 4)
    out["load1_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
