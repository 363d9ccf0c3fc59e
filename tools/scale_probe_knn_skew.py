"""Skewed-cell kNN stress probe (VERDICT r4 item 5): EVERY source row
in ONE 3-D cell — the pathological hot key the cell join degrades on —
AQE-only vs salted.

Two measurements:
- DETERMINISTIC (noise-free): pair rows per join task via
  spark_partition_id() over the candidate table — the skew itself.
  Unsalted, ONE task owns all n_src × n_tgt pairs; salted, the max
  task holds ~1/salt of them. This is the number that decides whether
  a 100 TB run OOMs a task, independent of machine load.
- wall-clock medians for knn_join end-to-end (load1 recorded; on a
  noisy machine trust the distribution, not the seconds).

Measured 2026-08-14 (local[32], quiet start, load1=0.61):
n_src=4M, one cell, 8 probes → unsalted 1 task × 32M pairs,
salt=8 → 7 tasks × ≤8M pairs; wall 17.4 s vs 12.1 s (quiet reps).
The planner heuristic (operators/knn.py choose_salt_factor) picks the
salt from a one-scan per-cell max count against HOT_CELL_ROWS=2M.

Run: python tools/scale_probe_knn_skew.py [n_src] [n_tgt] [reps]
     python tools/scale_probe_knn_skew.py polar [n_src] [n_tgt] [reps]

``polar`` mode (VERDICT r16 item 5): instead of the synthetic
everything-in-one-cell worst case, a GENUINE polar-orbit swath —
ground tracks of a 98.6°-inclination orbit with nodal regression, so
sample density piles up near the ±81.4° turning latitude exactly the
way real polar-orbiter archives do (the dlat/dt → 0 pileup plus
cross-orbit track convergence). The probe reports the realized
per-cell max/median occupancy ratio, what choose_salt_factor decides
at that density, and the deterministic pair distribution + wall for
AQE-only vs salted at that decision.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyresample_spark.session import get_spark


def polar_swath(spark, n: int):
    """Ground track of a 98.6°-inclination orbit, ~5000 samples per
    revolution, nodal regression spreading successive orbits in
    longitude — the shape whose density at the ±81.4° turning
    latitude is ~40× the equatorial density."""
    import math

    incl = math.radians(98.6)
    t = F.col("id") / 5000.0  # orbit phase (revolutions)
    ang = 2 * math.pi * t
    lat = F.degrees(F.asin(math.sin(incl) * F.sin(ang)))
    # true track longitude: in-plane sweep + ~25.5°/orbit regression
    lon_orb = F.degrees(F.atan2(
        math.cos(incl) * F.sin(ang), F.cos(ang)))
    lon = ((lon_orb - t * 25.5 + 540.0) % 360.0) - 180.0
    return spark.range(n).select(
        F.col("id").alias("src_id"), lon.alias("lon"), lat.alias("lat"))


def main():
    polar = len(sys.argv) > 1 and sys.argv[1] == "polar"
    argv = sys.argv[2:] if polar else sys.argv[1:]
    n_src = int(argv[0]) if len(argv) > 0 else 4_000_000
    n_tgt = int(argv[1]) if len(argv) > 1 else 8
    reps = int(argv[2]) if len(argv) > 2 else 2
    radius = 50_000.0
    spark = get_spark("knn_skew_probe")

    from pyresample_spark.operators.knn import (
        _radius_pairs,
        choose_salt_factor,
        chord_length,
        knn_join,
    )

    cell_stats = None
    if polar:
        src = polar_swath(spark, n_src)
        # probes in the turning-latitude pileup band, spread in lon
        tgt = spark.range(n_tgt).select(
            F.col("id").alias("tgt_id"),
            ((F.col("id") * 360.0 / n_tgt + 180.0) % 360.0 - 180.0)
            .alias("lon"),
            F.lit(81.2).alias("lat"),
        )
        # realized skew: per-cell occupancy max vs median
        from pyresample_spark.operators.knn import (
            cell_side,
            with_cells,
            with_geocentric,
        )
        c0 = cell_side(chord_length(radius))
        occ = (
            with_cells(with_geocentric(src, "lon", "lat"), c0)
            .groupBy("cx3", "cy3", "cz3").count()
            .agg(F.max("count").alias("mx"),
                 F.expr("percentile_approx(count, 0.5)").alias("med"),
                 F.count("*").alias("cells")).collect()[0]
        )
        cell_stats = {"max_cell_rows": occ["mx"],
                      "median_cell_rows": occ["med"],
                      "occupied_cells": occ["cells"],
                      "skew_ratio": round(occ["mx"] / max(occ["med"], 1), 1)}
    else:
        # all sources inside ~100 m — one cell at this radius
        src = spark.range(n_src).select(
            F.col("id").alias("src_id"),
            (10.0 + (F.col("id") % 1000) * 1e-6).alias("lon"),
            (50.0 + ((F.col("id") / 1000).cast("long") % 1000) * 1e-6)
            .alias("lat"),
        )
        tgt = spark.range(n_tgt).select(
            F.col("id").alias("tgt_id"),
            (10.0005 + F.col("id") * 1e-5).alias("lon"),
            (50.0005 + F.col("id") * 1e-5).alias("lat"),
        )

    salt = choose_salt_factor(src, radius)
    forced = salt or 8
    c = chord_length(radius)

    def pair_distribution(sf):
        d = (
            _radius_pairs(src, tgt, c, salt_factor=sf)
            .groupBy(F.spark_partition_id().alias("p")).count().collect()
        )
        counts = sorted((r["count"] for r in d), reverse=True)
        return {
            "tasks_with_pairs": len(counts),
            "max_task_pairs": counts[0] if counts else 0,
            "total_pairs": sum(counts),
        }

    def run(sf):
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            knn_join(src, tgt, radius, k=4, salt_factor=sf) \
                .write.mode("overwrite").format("noop").save()
            ts.append(round(time.monotonic() - t0, 2))
        return ts

    # warm the code path so rep 1 isn't JVM/codegen warmup
    knn_join(src.limit(10_000), tgt, radius, k=4) \
        .write.mode("overwrite").format("noop").save()

    load0 = round(os.getloadavg()[0], 2)
    unsalted, salted = run(None), run(forced)
    print(json.dumps({
        "mode": "polar" if polar else "one_cell",
        "cell_stats": cell_stats,
        "n_src": n_src, "n_tgt": n_tgt, "radius_m": radius,
        "heuristic_salt": salt, "forced_salt": forced,
        "unsalted_dist": pair_distribution(None),
        "salted_dist": pair_distribution(forced),
        "aqe_only_s": unsalted,
        "aqe_only_median_s": statistics.median(unsalted),
        "salted_s": salted,
        "salted_median_s": statistics.median(salted),
        "load1_start": load0,
        "load1_end": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
