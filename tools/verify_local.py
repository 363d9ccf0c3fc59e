"""Local mimic of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle on the same
parquet tables, then compares row count, sorted column names, and
cell-exact values (rows sorted canonically). Stricter than the driver's
order-insensitive value hash — if this passes, the hash matches.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_rows(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = []
    for _, r in df_pandas[cols].iterrows():
        row = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(repr(round(v, 9)))
            elif v is None:
                row.append("NULL")
            else:
                row.append(repr(v))
        rows.append(tuple(row))
    return sorted(rows), cols


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyresample_spark.queries import load_all
    from pyresample_spark.session import get_spark

    registry = load_all()
    spark = get_spark("verify_local")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = n_weak = 0
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.builder(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"WEAK {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            odf = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        s_rows, s_cols = canon_rows(sdf)
        o_rows, o_cols = canon_rows(odf)
        if s_cols != o_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={o_cols}")
            n_fail += 1
        elif len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(o_rows)}")
            n_fail += 1
        elif s_rows != o_rows:
            diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs (spark vs duck):")
            for a, b in diffs:
                print(f"   S {a}\n   D {b}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(s_rows)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
