"""Core-scaling probe at amplified scale (VERDICT r17 item 5).

The driver's sf0.1 scaling block shows 8-core ≈ 32-core ratios ≈ 1
because per-query compute sits under the ~0.3 s fixed per-query
overhead at that SF. This probe amplifies the inputs N× (default 5 ≈
sf0.5; pass 10 for ≈ sf1) with the scale_probe_soak deterministic
replication recipe — replica i shifts ids into a disjoint range and
jitters longitudes by i·0.0003° (~33 m, same cells, densified swath;
the realistic 100 TB shape) — and times the heaviest headline queries
at 8 and at 32 cores in SEPARATE processes (the bench's own
``local[$SPARK_GRAFT_CPUS]`` contract), writing
``scale_probe_r18.json`` with per-query medians/minima and the 8v32
ratio. The amplified parquet is written by Spark (multiple row
groups/files), so the scan-spread gate is inert here by construction —
exactly the production posture the r17 doc claims.

Run: python tools/scale_probe_cores_r18.py [N] [reps]
Worker (internal): python tools/scale_probe_cores_r18.py --worker <dir> <reps> <out>
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    q for q in os.environ.get(
        "PROBE_QUERIES",
        "q_bilinear_irregular,q_gauss_agg,q_weighted_avg,q_knn_join,"
        "q_dedup_span_mask,q_dedup_minhash",
    ).split(",") if q
]

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_amplified(n: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from pyresample_spark.session import get_spark

    spark = get_spark("scale-probe-build", ui_port=None)
    os.makedirs(out_dir, exist_ok=True)
    plans = {
        # id column and replica stride; event lon/lat DERIVE from
        # (user_id, event_id), and 2^33 is not divisible by the 100/97
        # moduli, so shifted replicas densify each user's 1° cell at
        # new sub-degree positions — the realistic swath-pileup shape
        # 2^29 keeps replica ids inside the packed-key id range of the
        # kNN top-k (pack ≈ 2^62 / max_dist_mm ≈ 3·10^10)
        "events": ("event_id", 1 << 29),
        "documents": ("doc_id", 1 << 29),
        "embeddings": ("vec_id", 1 << 24),
    }
    for name, (id_col, stride) in plans.items():
        src = spark.read.parquet(os.path.join(BASE, f"{name}.parquet"))
        reps = []
        for i in range(n):
            r = src.withColumn(id_col, F.col(id_col) + F.lit(i * stride))
            reps.append(r)
        df = reps[0]
        for r in reps[1:]:
            df = df.unionByName(r)
        df.repartition(8).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    # remaining tables: plain copies (small dimension tables)
    import shutil

    for f in os.listdir(BASE):
        dst = os.path.join(out_dir, f)
        if not os.path.exists(dst):
            src_p = os.path.join(BASE, f)
            if os.path.isdir(src_p):
                shutil.copytree(src_p, dst)
            else:
                shutil.copy(src_p, dst)
    spark.stop()


def worker(sf_dir: str, reps: int, out_path: str) -> None:
    from pyresample_spark.queries import load_all
    from pyresample_spark.session import get_spark

    spark = get_spark("scale-probe-cores", ui_port=None)
    spark.range(10).count()
    registry = load_all()
    res = {}
    for name in QUERIES:
        spec = registry[name]
        spec.builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warm (codegen/JIT), untimed — same policy as bench.py
        ts, execs = [], []
        for _ in range(reps):
            t0 = time.time()
            df = spec.builder(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            ts.append(t2 - t0)
            execs.append(t2 - t1)
        res[name] = {
            "median": round(statistics.median(ts), 3),
            "min": round(min(ts), 3),
            "reps": [round(t, 3) for t in ts],
            # driver-side plan construction is core-count-invariant
            # and dilutes the 8v32 ratio; exec isolates the cluster
            # work the ratio is ABOUT
            "exec_median": round(statistics.median(execs), 3),
            "exec_min": round(min(execs), 3),
        }
        print(f"  {name}: {res[name]}", flush=True)
    with open(out_path, "w") as f:
        json.dump(res, f)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]), sys.argv[4])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--build":
        build_amplified(int(sys.argv[2]), sys.argv[3])
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_dir = f"/tmp/pyresample_spark_sfx{n}"
    marker = os.path.join(out_dir, ".complete")
    if not os.path.exists(marker):
        print(f"building {n}x amplified inputs under {out_dir} …",
              flush=True)
        # build in a SUBPROCESS: spark.stop() leaves the 48g JVM alive
        # until the Python process exits, and a zombie local[32] JVM
        # poisons the workers' wall timings (measured: the first probe
        # run's 32-core pass was 2-3x inflated next to a rerun on a
        # clean box)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--build",
             str(n), out_dir],
            check=True,
        )
        open(marker, "w").write("ok")
    results = {"amplification": n, "base": BASE, "reps": reps,
               "queries": QUERIES, "cores": {}}
    for cpus in ("8", "32"):
        print(f"== {cpus} cores ==", flush=True)
        out_path = f"/tmp/scale_probe_r18_c{cpus}.json"
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = cpus
        env["SPARK_GRAFT_SF_DIR"] = out_dir
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             out_dir, str(reps), out_path],
            check=True, env=env,
        )
        with open(out_path) as f:
            results["cores"][cpus] = json.load(f)
    ratios, ratios_exec = {}, {}
    for q in QUERIES:
        t8 = results["cores"]["8"][q]["median"]
        t32 = results["cores"]["32"][q]["median"]
        ratios[q] = round(t8 / t32, 2) if t32 else None
        e8 = results["cores"]["8"][q]["exec_median"]
        e32 = results["cores"]["32"][q]["exec_median"]
        ratios_exec[q] = round(e8 / e32, 2) if e32 else None
    results["ratio_8v32_median"] = ratios
    results["ratio_8v32_exec_median"] = ratios_exec
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "scale_probe_r18.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"ratios_8v32": ratios}))


if __name__ == "__main__":
    main()
