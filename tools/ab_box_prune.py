"""Interleaved A/B for the neighbor-cell box-distance prune
(operators/knn.py BOX_PRUNE, VERDICT r15 item 4).

Run-to-run bench comparisons on this host are poisoned by a slow
time trend (the r15 session measured the SAME plan's executorCpuTime
drifting 11.1 → 17.2 cpu-s across back-to-back bench invocations while
load climbed), so this probe alternates A (no prune) and B (prune)
plans for each query WITHIN one Spark session — A/B/A/B… × reps — and
compares per-arm medians of the REST-scraped executorCpuTime delta.
The trend hits both arms equally; the difference is the prune.

Also asserts the exactness claim directly: for each query the A and B
results are COLLECTED once and compared row-for-row (sorted) — the
prune must be invisible downstream.

Run: python tools/ab_box_prune.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4049
QUERIES = ("q_knn_join", "q_gauss_agg", "q_weighted_avg",
           "q_bilinear_irregular", "q_nn_gather")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyresample_spark.operators import knn
    from pyresample_spark.queries import load_all
    from pyresample_spark.session import get_spark

    registry = load_all()
    spark = get_spark("ab-box-prune", ui_port=UI_PORT)
    spark.range(10).count()
    app_id = spark.sparkContext.applicationId

    def cpu_now():
        with urllib.request.urlopen(
            f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
            "/stages", timeout=10,
        ) as r:
            return sum(s.get("executorCpuTime", 0) or 0
                       for s in json.load(r))

    # exactness gate first: identical sorted rows with and without
    for name in QUERIES:
        rows = {}
        for arm in (False, True):
            knn.BOX_PRUNE = arm
            df = registry[name].builder(spark, sf_dir)
            rows[arm] = sorted(
                tuple(r) for r in df.collect()
            )
        assert rows[False] == rows[True], f"{name}: prune changed rows!"
        print(f"{name}: rows identical with/without prune "
              f"({len(rows[True])})")

    # warm both arms once so codegen/compile never lands in a sample
    for arm in (False, True):
        knn.BOX_PRUNE = arm
        for name in QUERIES:
            registry[name].builder(spark, sf_dir).write.format(
                "noop").mode("overwrite").save()

    def shuffle_recs_now():
        with urllib.request.urlopen(
            f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
            "/stages", timeout=10,
        ) as r:
            return sum(s.get("shuffleWriteRecords", 0) or 0
                       for s in json.load(r))

    # PAIRED measurement: A and B back-to-back per query per rep, order
    # alternating per rep (ABBA), drift judged by the per-pair RATIO —
    # the box-state time trend on this host (r15: same plan's cpu
    # drifting 11→17 cpu-s across bench invocations) cancels inside a
    # pair window of seconds but poisons arm-level sequencing.
    ratios = {n: [] for n in QUERIES}
    cpus = {n: {False: [], True: []} for n in QUERIES}
    recs = {n: {False: 0, True: 0} for n in QUERIES}
    for rep in range(reps):
        order = (False, True) if rep % 2 == 0 else (True, False)
        for name in QUERIES:
            pair = {}
            for arm in order:
                knn.BOX_PRUNE = arm
                c0, r0 = cpu_now(), shuffle_recs_now()
                registry[name].builder(spark, sf_dir).write.format(
                    "noop").mode("overwrite").save()
                d = (cpu_now() - c0) / 1e9
                recs[name][arm] = shuffle_recs_now() - r0
                if d > 0:
                    pair[arm] = d
                    cpus[name][arm].append(d)
            if False in pair and True in pair:
                ratios[name].append(pair[True] / pair[False])
    knn.BOX_PRUNE = True

    med = statistics.median
    print(f"\n{'query':22s} {'medB/A':>7s} {'A cpu':>8s} {'B cpu':>8s} "
          f"{'A shufrec':>10s} {'B shufrec':>10s} {'rec%':>6s}")
    for name in QUERIES:
        ra, rb = recs[name][False], recs[name][True]
        print(f"{name:22s} {med(ratios[name]):7.3f} "
              f"{med(cpus[name][False]):8.2f} "
              f"{med(cpus[name][True]):8.2f} "
              f"{ra:10d} {rb:10d} {100*(rb-ra)/max(ra,1):+5.1f}%")


if __name__ == "__main__":
    main()
