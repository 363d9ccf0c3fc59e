"""Timed micro-bench for the streaming battery (VERDICT r17 item 8).

Each stream-static join / watermarked window / stateful operator is
driven over a bounded file stream (the sf events/documents/embeddings
parquet replicated M× into a feed directory, maxFilesPerTrigger=1 →
M micro-batches — the test suite's own harness shape, timed) and the
artifact records wall seconds to drain the feed, micro-batch count,
input and output rows, and derived rows/s. Written to
``STREAM_BENCH_r18.json`` (committed) — the first perf artifact for
the 20 streaming twins, whose only prior machine evidence was
pytest parity.

Run: python tools/stream_bench_r18.py [M_replicas] [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = (
        sys.argv[2] if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    from pyresample_spark.session import get_spark
    from pyresample_spark.streaming.windows import (
        events_stream,
        running_user_totals,
        session_windows,
        stream_stream_interval_join,
        streaming_bucket_average,
        streaming_cosine_topk,
        streaming_decontaminate,
        streaming_dedup,
        streaming_gauss_resample,
        streaming_tile_counts,
        tumbling_counts,
    )

    spark = get_spark("stream-bench-r18", ui_port=None)
    spark.range(10).count()

    work = tempfile.mkdtemp(prefix="stream_bench_")

    def feed(table: str) -> str:
        d = os.path.join(work, table)
        os.makedirs(d, exist_ok=True)
        src = os.path.join(sf_dir, f"{table}.parquet")
        for i in range(m):
            shutil.copy(src, os.path.join(d, f"part{i}.parquet"))
        return d

    ev_feed = feed("events")
    doc_feed = feed("documents")
    # probe stream = the batch twin's probe subset (vec_id % 100 == 0),
    # not the whole corpus — one probe file copied M× (each batch
    # re-scores the same probes; the memory sink keeps the last state)
    emb_feed = os.path.join(work, "emb_probes")
    os.makedirs(emb_feed, exist_ok=True)
    probes_tmp = os.path.join(work, "_probes_once")
    spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).filter(
        F.col("vec_id") % 100 == 0
    ).coalesce(1).write.mode("overwrite").parquet(probes_tmp)
    probe_file = [
        f for f in os.listdir(probes_tmp) if f.endswith(".parquet")
    ][0]
    for i in range(m):
        shutil.copy(
            os.path.join(probes_tmp, probe_file),
            os.path.join(emb_feed, f"part{i}.parquet"),
        )

    def ev_stream():
        return events_stream(
            spark, ev_feed, glob="*.parquet", max_files_per_trigger=1
        )

    doc_schema = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).schema
    emb_schema = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).schema

    def doc_stream():
        return (
            spark.readStream.format("parquet").schema(doc_schema)
            .option("maxFilesPerTrigger", "1").load(doc_feed)
        )

    def emb_stream():
        return (
            spark.readStream.format("parquet").schema(emb_schema)
            .option("maxFilesPerTrigger", "1").load(emb_feed)
        )

    from pyresample_spark.geometry import AreaDefinition

    area = AreaDefinition(
        "buck_s", "longlat", width=36, height=18,
        area_extent=(-180.0, -90.0, 180.0, 90.0),
    )
    corpus = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    from pyresample_spark.operators.dedup import shingles

    ev_ngrams = (
        shingles(docs.filter(F.col("doc_id") % 37 == 0), 3)
        .select("shingle").distinct()
    )
    tgt = spark.range(0, 12 * 12).select(
        F.col("id").alias("tgt_id"),
        ((F.col("id") % 12) * 3.0 - 178.5).alias("lon"),
        ((F.col("id") / 12).cast("int") * 3.0 - 88.5).alias("lat"),
    )

    cases = [
        ("tumbling_counts", "complete",
         lambda: tumbling_counts(ev_stream())),
        ("session_windows", "complete",
         lambda: session_windows(ev_stream())),
        ("bucket_average", "complete",
         lambda: streaming_bucket_average(ev_stream(), area)),
        ("tile_counts", "complete",
         lambda: streaming_tile_counts(ev_stream())),
        ("gauss_resample", "complete",
         lambda: streaming_gauss_resample(
             ev_stream(), tgt, 600_000.0, 300_000.0)),
        ("running_user_totals", "update",
         lambda: running_user_totals(ev_stream())),
        ("dedup_within_watermark", "append",
         lambda: streaming_dedup(ev_stream())),
        ("interval_join", "append",
         lambda: stream_stream_interval_join(
             ev_stream().filter(F.col("event_type") == "click"),
             ev_stream().filter(F.col("event_type") == "view"))),
        ("cosine_topk", "complete",
         lambda: streaming_cosine_topk(emb_stream(), corpus, k=5)),
        ("decontaminate", "append",
         lambda: streaming_decontaminate(doc_stream(), ev_ngrams)),
    ]

    base_rows = {
        "events": spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")).count(),
        "documents": docs.count(),
        "embeddings": corpus.count(),
    }
    results = {
        "replicas": m, "sf_dir": sf_dir,
        "base_rows": base_rows, "ops": {},
    }
    for name, mode, build in cases:
        df = build()
        q = (
            df.writeStream.outputMode(mode).format("memory")
            .queryName(f"sb_{name}").start()
        )
        t0 = time.time()
        try:
            q.processAllAvailable()
            wall = time.time() - t0
            n_batches = len(
                [p for p in q.recentProgress if p.get("numInputRows", 0)]
            )
            in_rows = sum(
                p.get("numInputRows", 0) for p in q.recentProgress
            )
        finally:
            q.stop()
        out_rows = spark.sql(f"SELECT COUNT(*) c FROM sb_{name}").collect()[0].c
        results["ops"][name] = {
            "mode": mode,
            "wall_s": round(wall, 3),
            "batches": n_batches,
            "input_rows": in_rows,
            "output_rows": out_rows,
            "rows_per_s": round(in_rows / wall, 1) if wall > 0 else None,
        }
        print(name, results["ops"][name], flush=True)
    shutil.rmtree(work, ignore_errors=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "STREAM_BENCH_r18.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("wrote STREAM_BENCH_r18.json")


if __name__ == "__main__":
    main()
