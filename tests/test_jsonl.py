"""JSONL corpus source/sink: round-trip fidelity + partition pruning."""

import os

from pyspark.sql import functions as F

from pyresample_spark.sources.jsonl import (
    read_documents_jsonl,
    write_documents_jsonl,
)


def test_jsonl_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = str(tmp_path / "corpus")
    write_documents_jsonl(docs, out, partition_by=("lang",))

    back = read_documents_jsonl(spark, out)
    # fidelity: same rows, same content (partition column round-trips)
    assert back.count() == docs.count()
    a = sorted(
        (r.doc_id, r.text, r.lang, r.source, r.n_chars)
        for r in back.collect()
    )
    b = sorted(
        (r.doc_id, r.text, r.lang, r.source, r.n_chars)
        for r in docs.collect()
    )
    assert a == b

    # partition pruning: the lang filter must become a PartitionFilter
    # on the scan (directory-level skip), not a post-scan Filter
    en = back.filter(F.col("lang") == "en")
    plan = en._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    assert en.count() == docs.filter(F.col("lang") == "en").count()
