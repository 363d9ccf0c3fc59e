"""Decompose q_bilinear_irregular's cost: time (1) candidate pairs,
(2) + top-k aggregate, (3) + corner pick, (4) + full t/s chain, each
via the noop sink, min of N reps. Attribution = successive diffs.

Usage: python tools/probe_bilinear_stages.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyresample_spark.operators.bilinear_irregular import (
        QUAD_CONDS,
        _ts_chain_expr,
        chord_length,
    )
    from pyresample_spark.operators.knn import _radius_pairs
    from pyresample_spark.queries.joins import _src
    from pyresample_spark.session import get_spark

    spark = get_spark("probe_bilinear", ui_port=4054)
    spark.range(10).count()

    src = _src(spark, sf_dir)
    tgt = (
        src.filter(F.col("src_id") % 20 == 0)
        .select(
            F.col("src_id").alias("tgt_id"),
            (F.col("lon") + 0.21).alias("lon"),
            (F.col("lat") + 0.13).alias("lat"),
        )
    )
    c = chord_length(150_000.0)
    src2 = src.select(
        "src_id", "lon", "lat",
        F.col("lon").alias("s_lon"), F.col("lat").alias("s_lat"), "value",
    )
    tgt2 = tgt.select("tgt_id", "lon", "lat")
    pairs = _radius_pairs(
        src2, tgt2, c, extra_src_cols=("s_lon", "s_lat", "value"),
    )
    g0 = pairs.groupBy("tgt_id").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct("dist_mm", "src_id", "s_lon", "s_lat", "value")
                )
            ),
            1, 32,
        ).alias("ks"),
    )
    tcoords = tgt.select(
        "tgt_id", F.col("lon").alias("xx"), F.col("lat").alias("yy")
    )
    g = g0.join(tcoords.hint("shuffle_hash"), "tgt_id")
    corners = g.selectExpr(
        "tgt_id", "xx", "yy",
        *[
            f"try_element_at(filter(ks, x -> {cond}), 1) AS {name}"
            for name, cond in QUAD_CONDS
        ],
    ).filter(
        "p1 IS NOT NULL AND p2 IS NOT NULL "
        "AND p3 IS NOT NULL AND p4 IS NOT NULL"
    )
    wide = corners.selectExpr(
        "tgt_id", "xx", "yy",
        *[
            e
            for i in (1, 2, 3, 4)
            for e in (
                f"p{i}.s_lon AS x{i}", f"p{i}.s_lat AS y{i}",
                f"p{i}.value AS v{i}", f"p{i}.src_id AS id{i}",
            )
        ],
    )
    solved = wide.selectExpr(
        "tgt_id", "id1", "id2", "id3", "id4",
        _ts_chain_expr() + " AS r",
    ).filter("r.t IS NOT NULL AND r.s IS NOT NULL")

    steps = [
        ("pairs", pairs),
        ("agg", g0),
        ("join", g),
        ("corners", corners),
        ("wide", wide),
        ("solved", solved),
    ]
    for name, df in steps:
        df.write.format("noop").mode("overwrite").save()  # warm
        best = None
        for _ in range(reps):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:8s} best {best:7.3f}s")


if __name__ == "__main__":
    main()
