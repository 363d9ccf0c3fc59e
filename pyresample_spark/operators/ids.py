"""Deterministic compact row ids — the DataFrame zipWithIndex idiom.

``monotonically_increasing_id()`` is pid·2^33 + row-in-partition: ids are
sparse (they overflow the packed-bigint top-k key in operators/knn.py for
≥ ~6 partitions at default radii) and nondeterministic-by-contract on
recompute. ``with_compact_id`` fixes both:

1. ``localCheckpoint`` materializes the frame, pinning partition contents
   and order (so the derived ids are stable across the multiple join
   branches that reference them; reference analog: dask's single-graph
   evaluation gives this for free).
2. Per-partition row counts (a tiny one-job aggregate over #partitions
   rows) become prefix-sum offsets; ``compact = offset[pid] + row_in_pid``
   yields dense ids in [0, N) with NO global sort and NO shuffle of the
   data itself — the only extra cost is the offsets broadcast join.

Scale: offsets are one row per partition (100 TB / 128 MB splits ≈ 1M
rows — still driver-trivial); the data-side plan is map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MONO_PART = 1 << 33  # monotonically_increasing_id partition stride


def with_compact_id(df: DataFrame, id_col: str = "src_id") -> DataFrame:
    """Add a dense, deterministic BIGINT id column in [0, count).

    The returned frame is localCheckpoint-ed (lineage truncated, blocks
    freed on GC); callers need not persist it again.
    """
    mono = df.withColumn("_mono", F.monotonically_increasing_id())
    mono = mono.localCheckpoint(eager=True)
    pid = F.col("_mono").bitwiseAND(F.lit(~(_MONO_PART - 1)))
    counts = (
        mono.groupBy(pid.alias("_pid")).count().orderBy("_pid").collect()
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["_pid"], acc))
        acc += r["count"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "_pid long, _off long")
    return (
        mono.withColumn("_pid", pid)
        .join(F.broadcast(off_df), "_pid")
        .withColumn(
            id_col, F.col("_off") + F.col("_mono") % F.lit(_MONO_PART)
        )
        .drop("_pid", "_off", "_mono")
    )
