"""Adaptive scan-spread (queries.table, r17-opt): an unsplittable
single-row-group parquet scan is round-robin repartitioned to the
session's parallelism; splittable or tiny inputs are left alone."""

import os

import pytest

from pyresample_spark.queries import _spread_parts, table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _docs_path():
    return os.path.join(SF_DIR, "documents.parquet")


def test_spread_fires_on_single_row_group():
    # the test tables are written as one row group (that is the very
    # problem the spread fixes) — guard the fixture assumption first
    import pyarrow.parquet as pq

    md = pq.ParquetFile(_docs_path()).metadata
    assert md.num_row_groups == 1
    n = _spread_parts(_docs_path(), cores=32)
    assert 2 <= n <= 32
    # a task should own at least the configured minimum rows
    assert md.num_rows // n >= 16


def test_spread_declines_when_splittable_or_small(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # many row groups >= target parts: the scan can already split
    t = pa.table({"x": list(range(4096))})
    multi = tmp_path / "multi.parquet"
    pq.write_table(t, multi, row_group_size=64)  # 64 row groups
    assert _spread_parts(str(multi), cores=32) == 0

    # too few rows for tasks to be worth scheduling
    tiny = tmp_path / "tiny.parquet"
    pq.write_table(pa.table({"x": [1, 2, 3]}), tiny)
    assert _spread_parts(str(tiny), cores=32) == 0

    # non-file (directory) sources are never spread
    assert _spread_parts(str(tmp_path), cores=32) == 0
    assert _spread_parts(str(tmp_path / "absent.parquet"), cores=32) == 0


def test_spread_preserves_rows_and_parallelizes(spark):
    base = spark.read.parquet(_docs_path())
    spread = table(spark, SF_DIR, "documents")
    assert spread.rdd.getNumPartitions() > 1
    a = sorted(r["doc_id"] for r in base.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in spread.select("doc_id").collect())
    assert a == b


def test_spread_opt_out(spark):
    df = table(spark, SF_DIR, "documents", spread=False)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Repartition" not in plan
