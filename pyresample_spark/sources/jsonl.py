"""JSONL document corpus source/sink — the interchange format LLM
training corpora actually ship in (one JSON object per line, gz-shardable,
appendable). The reference engine has no text-corpus IO; this source
exists for the §2.10 training-data operators, which consume the same
``documents`` schema from parquet or JSONL interchangeably.

Scale rules encoded here:

- ALWAYS pass an explicit schema. ``inferSchema`` on JSON is a full
  extra pass over the data — at 100 TB that doubles ingest cost and can
  silently widen types between shards.
- Write partitioned by low-cardinality selection columns (lang, split,
  source): downstream readers get partition PRUNING (directory-level
  skip) for free, which is the only filter that costs literally zero
  bytes of IO.
- JSONL is a row format with no column projection or predicate
  pushdown — it is the INGEST format. Convert to parquet after the
  first pass; every operator in this engine runs on either, but only
  parquet scans prune columns and push filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: T.StructType = DOCUMENTS_SCHEMA
) -> DataFrame:
    """Read a JSONL document corpus with an explicit schema (never
    infer at scale). Malformed lines surface as all-null rows under the
    default PERMISSIVE mode; pass ``spark.read.option("mode",
    "FAILFAST")`` semantics by validating downstream if ingest must be
    strict."""
    return spark.read.schema(schema).json(path)


def write_documents_jsonl(
    df: DataFrame, path: str, partition_by: tuple = ("lang",)
) -> None:
    """Write a document corpus as JSONL partitioned by selection
    columns. Partition directories give directory-level pruning to any
    reader; within a partition the files are plain shardable JSONL."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
