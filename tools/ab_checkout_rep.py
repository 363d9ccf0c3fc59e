"""One arm-rep of a cross-CHECKOUT interleaved A/B (VERDICT r16 item 1).

Child process: loads the package from the given checkout dir, builds
one Spark session, runs one untimed warm pass of the query, then
``timed_reps`` timed passes, and prints ONE JSON line with per-pass
wall seconds, executorCpuTime deltas (REST-scraped, the load-invariant
anchor) and shuffle-write-record deltas (the deterministic structural
metric). The PARENT (tools/ab_bilinear_head_r14.py) interleaves child
invocations across checkouts in ABBA order so the host's slow
degradation trend (memory: bench-host-degradation) hits both arms
equally.

Run: python tools/ab_checkout_rep.py <checkout_dir> <query> <sf_dir>
     <timed_reps> [ui_port]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def main():
    checkout, query, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    timed_reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    ui_port = int(sys.argv[5]) if len(sys.argv) > 5 else 4051

    sys.path.insert(0, checkout)
    from pyresample_spark.queries import load_all
    from pyresample_spark.session import get_spark

    registry = load_all()
    spark = get_spark("ab-checkout", ui_port=ui_port)
    spark.range(10).count()
    app_id = spark.sparkContext.applicationId

    def counters():
        with urllib.request.urlopen(
            f"http://localhost:{ui_port}/api/v1/applications/{app_id}"
            "/stages", timeout=10,
        ) as r:
            st = json.load(r)
        return (sum(s.get("executorCpuTime", 0) or 0 for s in st),
                sum(s.get("shuffleWriteRecords", 0) or 0 for s in st))

    def run_once():
        df = registry[query].builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

    load1 = os.getloadavg()[0]
    run_once()  # untimed warm (plan compile + codegen)
    walls, cpus, shufs = [], [], []
    for _ in range(timed_reps):
        c0, s0 = counters()
        t0 = time.time()
        run_once()
        walls.append(round(time.time() - t0, 3))
        c1, s1 = counters()
        cpus.append(round((c1 - c0) / 1e9, 3))
        shufs.append(s1 - s0)
    print(json.dumps({
        "checkout": checkout, "query": query, "start_load1": round(load1, 2),
        "wall": walls, "cpu": cpus, "shuffle_write_records": shufs,
    }))


if __name__ == "__main__":
    main()
