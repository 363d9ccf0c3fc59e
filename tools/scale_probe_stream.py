"""Measured throughput of the stream-static gaussian resampler
(PERF.md evidence for streaming/windows.py streaming_gauss_resample).

Replays the sf events table through a bounded file stream
(maxFilesPerTrigger=1 over N replica parquet files written to a temp
dir) so micro-batch sizes are realistic, and reports end-to-end rows/s
through the full pipeline: cell-key derivation -> broadcast exploded-
grid join -> radius filter -> watermarked windowed weighted sums.

The probe answers the 100 TB question for the streaming path: the
per-batch cost is the broadcast hash join + partial aggregation (no
stream-side shuffle before the state store), so throughput should
scale ~linearly with replicas until the state store (windows x cells)
saturates -- which is bounded by the watermark horizon, not by rows.

Run: python tools/scale_probe_stream.py [N_replicas ...]  (default 1 4 8)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyresample_spark.session import get_spark
from pyresample_spark.streaming.windows import streaming_gauss_resample


def main():
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-probe-stream")
    spark.range(10).count()

    from pyresample_spark.streaming.windows import events_stream

    # static 2°-step target grid over the events footprint
    tgt = spark.range(0, 90 * 45).select(
        F.col("id").alias("tgt_id"),
        ((F.col("id") % 90) * 4.0 - 178.0).alias("lon"),
        ((F.col("id") / 90).cast("int") * 4.0 - 88.0).alias("lat"),
    )

    base = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n_rows = base.count()
    work = tempfile.mkdtemp(prefix="stream_probe_")
    try:
        for n in ns:
            src_dir = os.path.join(work, f"replicas_{n}")
            # N distinct files -> N micro-batches with maxFilesPerTrigger=1
            for r in range(n):
                base.withColumn(
                    "event_id", F.col("event_id") + F.lit(r * n_rows)
                ).coalesce(1).write.mode(
                    "append" if r else "overwrite"
                ).parquet(src_dir)

            stream = events_stream(spark, src_dir, max_files_per_trigger=1)
            out = streaming_gauss_resample(
                stream, tgt, radius_m=400_000.0, sigma=200_000.0
            )
            t0 = time.time()
            q = (
                out.writeStream.outputMode("complete")
                .format("memory")
                .queryName(f"probe_{n}")
                .start()
            )
            q.processAllAvailable()
            q.stop()
            dt = time.time() - t0
            got = spark.sql(f"SELECT COUNT(*) c FROM probe_{n}").first().c
            total = n * n_rows
            print(
                f"N={n:2d}  rows={total:>9,}  wall={dt:6.2f}s  "
                f"throughput={total / dt:>12,.0f} rows/s  out_cells={got}"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
