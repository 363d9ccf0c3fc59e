"""The driver-contract gate, in-repo: every registered query's Spark
result must match its DuckDB oracle cell-for-cell (stricter than the
driver's order-insensitive value hash)."""

import math

import pytest

from pyresample_spark.queries import load_all

REGISTRY = load_all()


def canon(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = []
    for _, r in df_pandas[cols].iterrows():
        row = []
        for v in r:
            if isinstance(v, float):
                row.append("NaN" if math.isnan(v) else repr(round(v, 9)))
            elif v is None:
                row.append("NULL")
            else:
                row.append(repr(v))
        rows.append(tuple(row))
    return sorted(rows), cols


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only check (driver records "weak")
        return
    odf = duck.execute(spec.oracle).df()
    s_rows, s_cols = canon(sdf)
    o_rows, o_cols = canon(odf)
    assert s_cols == o_cols
    assert len(s_rows) == len(o_rows)
    assert s_rows == o_rows
