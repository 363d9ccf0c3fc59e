"""Measured shuffle volume for the PQ/IVF-reuse ANN stack (VERDICT r6
item 7 — PERF.md evidence).

Runs ``q_pq_search`` and ``q_ann_ivf_reuse`` at the given sf_dir in a
UI-enabled session and reports, per query:

- total shuffle WRITE records/bytes and READ records/bytes summed over
  the job's stages (Spark REST API — real executor metrics, not plan
  guesses), and
- the number of Exchange nodes in the formatted plan,

verifying the two structural claims made in similarity.py docstrings:
the PQ search's only exchange is the per-probe top-k aggregate over
16-byte (id, code) rows (shuffle bytes ≪ corpus embedding bytes), and
the bucketed persisted IVF index is probed with ZERO index-side
shuffle (the only exchanges left are the tiny probe/top-k sides).

Run: python tools/scale_probe_pq.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4049


def make_spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-probe-pq")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.warehouse.dir", "/tmp/pyresample_spark_warehouse")
        .config("spark.driver.extraJavaOptions",
                "-Dderby.system.home=/tmp/pyresample_spark_derby")
        .getOrCreate()
    )


def rest(path):
    with urllib.request.urlopen(
        f"http://localhost:{UI_PORT}/api/v1/{path}", timeout=10
    ) as r:
        return json.load(r)


def stage_totals(app_id, after_stage):
    tot = dict(sw_rec=0, sw_mb=0.0, sr_rec=0, sr_mb=0.0, stages=0)
    for st in rest(f"applications/{app_id}/stages"):
        if st["stageId"] <= after_stage or st["status"] == "SKIPPED":
            continue
        tot["stages"] += 1
        tot["sw_rec"] += st.get("shuffleWriteRecords", 0)
        tot["sw_mb"] += st.get("shuffleWriteBytes", 0) / 1e6
        tot["sr_rec"] += st.get("shuffleReadRecords", 0)
        tot["sr_mb"] += st.get("shuffleReadBytes", 0) / 1e6
    return tot


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = make_spark()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10).count()
    app_id = spark.sparkContext.applicationId

    import pyresample_spark.queries as Q

    reg = Q.load_all()
    for name in ("q_pq_search", "q_ann_ivf_reuse"):
        b = reg[name].builder
        # warm pass: JIT/codegen + (for ivf_reuse) the one-time index
        # build — the steady-state search is what we meter
        b(spark, sf_dir).write.format("noop").mode("overwrite").save()
        last = max(
            (s["stageId"] for s in rest(f"applications/{app_id}/stages")),
            default=-1,
        )
        df = b(spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        n_exchanges = sum(
            1 for ln in plan.splitlines() if ") Exchange" in ln
        )
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        tot = stage_totals(app_id, last)
        print(
            f"{name}: wall={dt:.2f}s plan_exchanges={n_exchanges} "
            f"stages={tot['stages']} "
            f"shuffle_write={tot['sw_rec']} rec / {tot['sw_mb']:.2f} MB  "
            f"shuffle_read={tot['sr_rec']} rec / {tot['sr_mb']:.2f} MB"
        )


if __name__ == "__main__":
    main()
