"""Stage isolation for q_bilinear_irregular (r18 opt round, guide §1):
times, in ONE session with interleaved reps, the cumulative slices of
the fused plan — (a) candidate pairs only, (b) + top-k window cut,
(c) + quadrant windows + pivot, (d) full query with the staged solve —
so the per-slice delta attributes the 4.2 cpu-s fused stage.

Run: python tools/probe_bilinear_r18.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4054


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from pyresample_spark.operators.knn import (
        BROADCAST_SRC_BYTES,
        _radius_pairs,
        _scan_bytes_hint,
        chord_length,
    )
    from pyresample_spark.operators.bilinear_irregular import (
        _ts_chain_staged,
    )
    from pyresample_spark.queries import load_all
    from pyresample_spark.session import get_spark

    registry = load_all()
    spark = get_spark("probe-bilinear-r18", ui_port=UI_PORT)
    if os.environ.get("PROBE_OHA_THRESHOLD"):
        spark.conf.set(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            os.environ["PROBE_OHA_THRESHOLD"],
        )
    spark.range(10).count()
    app_id = spark.sparkContext.applicationId

    # mirror queries/resample.py q_bilinear_irregular inputs exactly
    from pyresample_spark.queries.joins import _src

    src = _src(spark, sf_dir)
    tgt = (
        src.filter(F.col("src_id") % 20 == 0)
        .select(
            F.col("src_id").alias("tgt_id"),
            (F.col("lon") + 0.21).alias("lon"),
            (F.col("lat") + 0.13).alias("lat"),
        )
    )
    spec = registry["q_bilinear_irregular"]
    full_df = spec.builder(spark, sf_dir)

    RADIUS, K = 150_000.0, 32
    c = chord_length(RADIUS)
    src2 = src.select(
        "src_id", "lon", "lat",
        F.col("lon").alias("s_lon"), F.col("lat").alias("s_lat"), "value",
    )
    nbytes = _scan_bytes_hint(src)
    assert nbytes is not None and nbytes <= BROADCAST_SRC_BYTES
    npart = spark.sparkContext.defaultParallelism
    tgt2 = tgt.select(
        "tgt_id", "lon", "lat",
        F.col("lon").alias("xx"), F.col("lat").alias("yy"),
    ).repartition(npart, F.col("tgt_id"))
    pairs = _radius_pairs(
        src2, tgt2, c,
        extra_src_cols=("s_lon", "s_lat", "value"),
        extra_tgt_cols=("xx", "yy"),
    )
    w1 = W.partitionBy("tgt_id").orderBy(
        F.col("dist_mm").asc(), F.col("src_id").asc()
    )
    top = pairs.withColumn("rn", F.row_number().over(w1)).filter(
        F.col("rn") <= K
    )
    qex = (
        F.when((F.col("s_lon") < F.col("xx")) & (F.col("s_lat") > F.col("yy")), 1)
        .when((F.col("s_lon") > F.col("xx")) & (F.col("s_lat") > F.col("yy")), 2)
        .when((F.col("s_lon") < F.col("xx")) & (F.col("s_lat") < F.col("yy")), 3)
        .when((F.col("s_lon") > F.col("xx")) & (F.col("s_lat") < F.col("yy")), 4)
    )
    topq = top.withColumn("q", qex).filter(F.col("q").isNotNull())
    w2 = W.partitionBy("tgt_id", "q").orderBy(
        F.col("dist_mm").asc(), F.col("src_id").asc()
    )
    best = topq.withColumn("rn2", F.row_number().over(w2)).filter(
        F.col("rn2") == 1
    )
    aggs = []
    for i in (1, 2, 3, 4):
        cond = F.col("q") == i
        aggs += [
            F.max(F.when(cond, F.col("s_lon"))).alias(f"x{i}"),
            F.max(F.when(cond, F.col("s_lat"))).alias(f"y{i}"),
            F.max(F.when(cond, F.col("value"))).alias(f"v{i}"),
            F.max(F.when(cond, F.col("src_id"))).alias(f"id{i}"),
        ]
    wide = (
        best.groupBy("tgt_id", "xx", "yy").agg(*aggs)
        .filter("id1 IS NOT NULL AND id2 IS NOT NULL "
                "AND id3 IS NOT NULL AND id4 IS NOT NULL")
    )

    # ---- candidate rewrite: ONE ObjectHashAggregate replaces both
    # windows + the pivot aggregate (packed-key idiom from knn_join)
    max_dist_mm = round(c * 1000.0)
    pack = (1 << 62) // max(max_dist_mm + 1, 1)
    key = F.col("dist_mm") * pack + F.col("src_id")
    p2 = pairs.withColumn("q", qex).withColumn("k_", key)
    aggs2 = [
        F.element_at(
            F.slice(F.array_sort(F.collect_list("k_")), 1, K), -1
        ).alias("kth"),
        F.min("src_id").alias("_id_lo"),
        F.max("src_id").alias("_id_hi"),
    ]
    for i in (1, 2, 3, 4):
        cond = F.col("q") == i
        kq = F.when(cond, F.col("k_"))
        aggs2 += [
            F.min(kq).alias(f"b{i}"),
            F.min_by(F.when(cond, F.col("s_lon")), kq).alias(f"x{i}"),
            F.min_by(F.when(cond, F.col("s_lat")), kq).alias(f"y{i}"),
            F.min_by(F.when(cond, F.col("value")), kq).alias(f"v{i}"),
        ]
    g2 = p2.groupBy("tgt_id", "xx", "yy").agg(*aggs2)
    valid = None
    for i in (1, 2, 3, 4):
        vi = F.col(f"b{i}").isNotNull() & (F.col(f"b{i}") <= F.col("kth"))
        valid = vi if valid is None else (valid & vi)
    wide2 = g2.filter(valid).select(
        "tgt_id", "xx", "yy",
        *[F.col(f"x{i}") for i in (1, 2, 3, 4)],
        *[F.col(f"y{i}") for i in (1, 2, 3, 4)],
        *[F.col(f"v{i}") for i in (1, 2, 3, 4)],
        *[(F.col(f"b{i}") % pack).alias(f"id{i}") for i in (1, 2, 3, 4)],
    )
    solved2 = _ts_chain_staged(wide2).filter(
        "r.t IS NOT NULL AND r.s IS NOT NULL"
    )
    full2 = solved2.selectExpr(
        "tgt_id",
        "CAST(id3 AS LONG) AS c00",
        "CAST(id4 AS LONG) AS c01",
        "CAST(id1 AS LONG) AS c10",
        "CAST(id2 AS LONG) AS c11",
        "r.t AS t", "r.s AS s", "r.v AS bilinear_value",
    ).selectExpr(
        "tgt_id", "c00", "c01", "c10", "c11",
        "ROUND(t, 6) + 0.0 AS t", "ROUND(s, 6) + 0.0 AS s",
        "ROUND(bilinear_value, 6) + 0.0 AS bilinear_value",
    )

    # exactness gate: identical sorted rows, old full query vs rewrite
    rows_old = sorted(tuple(r) for r in full_df.collect())
    rows_new = sorted(tuple(r) for r in full2.collect())
    assert rows_old == rows_new, (
        f"rewrite changed rows! {len(rows_old)} vs {len(rows_new)}; "
        f"first diff: "
        f"{next((a, b) for a, b in zip(rows_old, rows_new) if a != b)}"
    )
    print(f"rewrite rows identical ({len(rows_new)})")

    # f: threshold-only aggregate (collect_list kth + 4 packed mins, no
    # min_by) — attrs would come from a later broadcast join-back; this
    # slice isolates the collect_list + min cost.
    aggs3 = [
        F.element_at(
            F.slice(F.array_sort(F.collect_list("k_")), 1, K), -1
        ).alias("kth"),
    ]
    for i in (1, 2, 3, 4):
        aggs3.append(F.min(F.when(F.col("q") == i, F.col("k_"))).alias(f"b{i}"))
    g3 = p2.groupBy("tgt_id", "xx", "yy").agg(*aggs3)
    # g: mins+min_by only (no collect_list) — isolates the min_by cost
    g4 = p2.groupBy("tgt_id", "xx", "yy").agg(*aggs2[1:])

    # h: narrow-sort variant — pack (dist_mm, src_id) into one long,
    # compute the quadrant BEFORE the top-k window, drop xx/yy (and
    # dist_mm/src_id as separate columns) from the sorted rows, rank on
    # the single packed key, then select corners with the cheap
    # min/min_by aggregate on the ≤k·|tgt| survivors and join xx/yy
    # back from the 1×-sized target side.
    pairs_n = pairs.select(
        "tgt_id",
        qex.alias("q"),
        key.alias("k_"),
        "s_lon", "s_lat", "value", "src_id",
    )
    w1n = W.partitionBy("tgt_id").orderBy(F.col("k_").asc())
    top_n = (
        pairs_n.withColumn("rn", F.row_number().over(w1n))
        .filter(F.col("rn") <= K)
        .filter(F.col("q").isNotNull())
    )
    aggs_h = [
        F.min("src_id").alias("_id_lo"),
        F.max("src_id").alias("_id_hi"),
    ]
    for i in (1, 2, 3, 4):
        cond = F.col("q") == i
        kq = F.when(cond, F.col("k_"))
        aggs_h += [
            F.min(kq).alias(f"b{i}"),
            F.min_by(F.when(cond, F.col("s_lon")), kq).alias(f"x{i}"),
            F.min_by(F.when(cond, F.col("s_lat")), kq).alias(f"y{i}"),
            F.min_by(F.when(cond, F.col("value")), kq).alias(f"v{i}"),
        ]
    gh = top_n.groupBy("tgt_id").agg(*aggs_h).filter(
        "b1 IS NOT NULL AND b2 IS NOT NULL "
        "AND b3 IS NOT NULL AND b4 IS NOT NULL"
    )
    tco = tgt.select(
        "tgt_id", F.col("lon").alias("xx"), F.col("lat").alias("yy")
    )
    wide_h = gh.join(F.broadcast(tco), "tgt_id").select(
        "tgt_id", "xx", "yy",
        *[F.col(f"x{i}") for i in (1, 2, 3, 4)],
        *[F.col(f"y{i}") for i in (1, 2, 3, 4)],
        *[F.col(f"v{i}") for i in (1, 2, 3, 4)],
        *[(F.col(f"b{i}") % pack).alias(f"id{i}") for i in (1, 2, 3, 4)],
    )
    solved_h = _ts_chain_staged(wide_h).filter(
        "r.t IS NOT NULL AND r.s IS NOT NULL"
    )
    full_h = solved_h.selectExpr(
        "tgt_id",
        "CAST(id3 AS LONG) AS c00",
        "CAST(id4 AS LONG) AS c01",
        "CAST(id1 AS LONG) AS c10",
        "CAST(id2 AS LONG) AS c11",
        "r.t AS t", "r.s AS s", "r.v AS bilinear_value",
    ).selectExpr(
        "tgt_id", "c00", "c01", "c10", "c11",
        "ROUND(t, 6) + 0.0 AS t", "ROUND(s, 6) + 0.0 AS s",
        "ROUND(bilinear_value, 6) + 0.0 AS bilinear_value",
    )
    rows_h = sorted(tuple(r) for r in full_h.collect())
    assert rows_old == rows_h, (
        f"narrow-sort variant changed rows! {len(rows_old)} vs "
        f"{len(rows_h)}"
    )
    print(f"narrow-sort variant rows identical ({len(rows_h)})")

    slices = [
        ("a_pairs", pairs),
        ("b_topk", top),
        ("d_full", full_df),
        ("h_narrow", full_h),
    ]

    def cpu_now():
        with urllib.request.urlopen(
            f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
            "/stages", timeout=10,
        ) as r:
            return sum(s.get("executorCpuTime", 0) or 0 for s in json.load(r))

    n_pairs = pairs.count()
    print(f"pairs after radius filter: {n_pairs}")

    # warm
    for _, df in slices:
        df.write.format("noop").mode("overwrite").save()

    cpu = {n: [] for n, _ in slices}
    wall = {n: [] for n, _ in slices}
    for _ in range(reps):
        for name, df in slices:
            c0, t0 = cpu_now(), time.time()
            df.write.format("noop").mode("overwrite").save()
            wall[name].append(time.time() - t0)
            cpu[name].append((cpu_now() - c0) / 1e9)

    med = statistics.median
    print(f"{'slice':12s} {'wall_med':>9s} {'cpu_med':>9s} {'cpu_min':>9s}")
    for name, _ in slices:
        print(f"{name:12s} {med(wall[name]):9.3f} {med(cpu[name]):9.3f} "
              f"{min(cpu[name]):9.3f}")


if __name__ == "__main__":
    main()
