"""OLAP breadth queries: star-schema broadcast join chain + rollup
aggregation (extension beyond the reference's operator set — the table
shapes a 100 TB training-data pipeline needs; SURVEY.md §2.10 spirit).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyresample_spark.queries import register, table


@register(
    "q_star_join",
    oracle="""
    SELECT r.r_name AS region_name,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_c
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("bench",),
)
def q_star_join(spark, sf_dir):
    """Star-schema revenue rollup: fact table joined through a broadcast
    dimension chain (orders→customer→nation→region). At 100 TB the fact
    side never shuffles — every dimension is broadcast; the only
    exchange is the final 5-row aggregation."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    cents = F.round(
        F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0, 0
    ).cast("bigint")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(cents).alias("revenue_c"),
        )
    )


@register(
    "q_rollup_agg",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS rf,
           COALESCE(l_linestatus, '<all>') AS ls,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS qty_c
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_agg(spark, sf_dir):
    """ROLLUP hierarchy aggregation (subtotals + grand total) — Catalyst
    expands to a single expand+hash-agg pass; no reference analog (the
    reference has no grouping sets, SURVEY §2.5 note) but a training-
    data pipeline staple."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_quantity") * 100.0, 0).cast("bigint")).alias(
                "qty_c"
            ),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("<all>")).alias("rf"),
            F.coalesce(F.col("l_linestatus"), F.lit("<all>")).alias("ls"),
            "n",
            "qty_c",
        )
    )
