"""Attribute the host's ~200× executorCpuTime blowups (r17 A/B caught
3411 and 3321 cpu-s reps of 14-16 cpu-s plans, one on each A/B arm).

One JVM, one byte-identical plan (q_bilinear_irregular at sf0.1), N
reps; per rep: wall, executorCpuTime delta, jvmGcTime delta, start
load1. If a blowup rep shows a matching jvmGcTime spike it is heap
pressure inside our JVM; if GC stays flat while cpu explodes, the
inflation is external to the JVM (cgroup throttling / a noisy
neighbor charging steal into thread cpu / kernel contention).

Run: python tools/probe_cpu_blowup.py [sf_dir] [reps]
Prints one JSON line per rep and a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4055
QUERY = "q_bilinear_irregular"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    from pyresample_spark.queries import load_all
    from pyresample_spark.session import get_spark

    registry = load_all()
    spark = get_spark("blowup-probe", ui_port=UI_PORT)
    spark.range(10).count()
    app_id = spark.sparkContext.applicationId

    def counters():
        with urllib.request.urlopen(
            f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
            "/stages", timeout=10,
        ) as r:
            st = json.load(r)
        return (sum(s.get("executorCpuTime", 0) or 0 for s in st),
                sum(s.get("jvmGcTime", 0) or 0 for s in st),
                sum(s.get("executorRunTime", 0) or 0 for s in st))

    def run_once():
        registry[QUERY].builder(spark, sf_dir).write.format(
            "noop").mode("overwrite").save()

    run_once()  # warm
    rows = []
    blowups = 0
    for i in range(reps):
        l1 = os.getloadavg()[0]
        c0, g0, r0 = counters()
        t0 = time.time()
        run_once()
        wall = time.time() - t0
        c1, g1, r1 = counters()
        row = {
            "rep": i, "wall": round(wall, 2),
            "cpu_s": round((c1 - c0) / 1e9, 2),
            "gc_s": round((g1 - g0) / 1e3, 2),
            "run_s": round((r1 - r0) / 1e3, 2),
            "load1": round(l1, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        if i >= 3:
            med = sorted(r["cpu_s"] for r in rows[:3])[1]
            if row["cpu_s"] > 5 * med:
                blowups += 1
                if blowups >= 2:
                    break
    cpus = [r["cpu_s"] for r in rows]
    med = sorted(cpus)[len(cpus) // 2]
    blown = [r for r in rows if r["cpu_s"] > 5 * med]
    print(json.dumps({
        "summary": True, "reps": len(rows), "cpu_median": med,
        "blowup_reps": [r["rep"] for r in blown],
        "blowup_cpu": [r["cpu_s"] for r in blown],
        "blowup_gc": [r["gc_s"] for r in blown],
        "normal_gc_max": max((r["gc_s"] for r in rows
                              if r not in blown), default=None),
        "verdict": (
            "no blowup observed" if not blown else
            "GC-DRIVEN (heap pressure)" if all(
                r["gc_s"] > 0.3 * r["cpu_s"] for r in blown) else
            "NOT GC (external to the JVM: throttling/steal/contention)"
            if all(r["gc_s"] < 0.05 * r["cpu_s"] for r in blown)
            else "mixed — read the rows"),
    }))


if __name__ == "__main__":
    main()
