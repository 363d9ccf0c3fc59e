"""Measured shuffle volume for the grid-shift datum paths (round 14 —
PERF.md evidence for the new national-scale and vertical pipelines).

Runs ``q_regrid_ntv2_national`` (the >16-subgrid flat-selection path:
LEAST gid + broadcast META join + broadcast cell join, ×3 unrolled
inverse lookups), ``q_geoid_height`` (GTX vertical: one broadcast
corner join) and ``q_regrid_vdatum`` (the r15 composed
inv-hgridshift → inv-vgridshift pipeline: 3+1 broadcast lookups in
one plan) in a UI-enabled session and reports, per query:

- total shuffle WRITE/READ records and bytes summed over the query's
  stages (Spark REST API — real executor metrics, not plan guesses),
- the number of Exchange nodes in the formatted plan,

verifying the structural claim: the POINT side of every grid-shift
lookup never shuffles — the only exchanges are the broadcast builds of
the few-hundred-row meta/cell tables, so shuffle volume is
corpus-size-INDEPENDENT and the design holds at 100 TB.

Run: python tools/scale_probe_gridshift.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4047


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
    from pyresample_spark.session import get_spark

    spark = get_spark("scale-probe-gridshift", ui_port=UI_PORT)
    spark.range(10).count()
    app_id = spark.sparkContext.applicationId

    import pyresample_spark.queries as Q

    reg = Q.load_all()
    for name in ("q_regrid_ntv2_national", "q_regrid_nad27",
                 "q_geoid_height", "q_regrid_vdatum"):
        b = reg[name].builder
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
        n_bcast = plan.count("BroadcastHashJoin")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        tot = stage_totals(app_id, last)
        print(
            f"{name}: wall={dt:.2f}s plan_exchanges={n_exchanges} "
            f"broadcast_hash_joins={n_bcast} stages={tot['stages']} "
            f"shuffle_write={tot['sw_rec']} rec / {tot['sw_mb']:.3f} MB  "
            f"shuffle_read={tot['sr_rec']} rec / {tot['sr_mb']:.3f} MB"
        )


if __name__ == "__main__":
    main()
