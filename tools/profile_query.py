"""Per-stage CPU/row attribution for one or more registry queries.

Runs each named query N times (first run warms codegen/JIT; the LAST
run's stages are attributed), then prints, per stage of that run:
executorRunTime, executorCpuTime, task count, input records, shuffle
read/write records — the empirical loop of guide §1.1/§7.1, REST-scraped
so it works without a live UI browser.

Usage: python tools/profile_query.py q_knn_join [q_gauss_agg ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = int(os.environ.get("SPARK_GRAFT_PROFILE_UI_PORT", "4053"))


def rest(app_id, path):
    with urllib.request.urlopen(
        f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}{path}",
        timeout=20,
    ) as r:
        return json.load(r)


def main():
    names = sys.argv[1:]
    reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyresample_spark.queries import load_all
    from pyresample_spark.session import get_spark

    registry = load_all()
    spark = get_spark("profile_query", ui_port=UI_PORT)
    spark.range(10).count()
    app_id = spark.sparkContext.applicationId

    for name in names:
        spec = registry[name]
        for i in range(reps - 1):
            spec.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        before = {st["stageId"] for st in rest(app_id, "/stages")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        spec.builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        stages = [
            st
            for st in rest(app_id, "/stages")
            if st["stageId"] not in before and st["status"] != "SKIPPED"
        ]
        stages.sort(key=lambda st: -(st.get("executorCpuTime") or 0))
        tot_cpu = sum(st.get("executorCpuTime") or 0 for st in stages) / 1e9
        tot_run = sum(st.get("executorRunTime") or 0 for st in stages) / 1e3
        print(f"\n=== {name}: wall {wall:.2f}s, stage-cpu {tot_cpu:.2f}s, "
              f"task-run {tot_run:.2f}s, {len(stages)} stages ===")
        print(f"{'stage':>6} {'cpu_s':>8} {'run_s':>8} {'tasks':>5} "
              f"{'in_rec':>10} {'sh_r_rec':>10} {'sh_w_rec':>10}  name")
        for st in stages:
            print(
                f"{st['stageId']:>6} "
                f"{(st.get('executorCpuTime') or 0)/1e9:>8.3f} "
                f"{(st.get('executorRunTime') or 0)/1e3:>8.3f} "
                f"{st.get('numCompleteTasks',0):>5} "
                f"{st.get('inputRecords',0):>10} "
                f"{st.get('shuffleReadRecords',0):>10} "
                f"{st.get('shuffleWriteRecords',0):>10}  "
                f"{(st.get('name') or '')[:60]}"
            )


if __name__ == "__main__":
    main()
