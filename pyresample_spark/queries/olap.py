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


from pyspark.sql.window import Window as W  # noqa: E402

from pyresample_spark.queries import rnd  # noqa: E402


@register(
    "q_window_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(row_number() OVER w AS INT) AS rn,
           CAST(rank() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS INT) AS qty_rank,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT))
                OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_price_c,
           lag(l_orderkey) OVER w AS prev_order,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
    """,
)
def q_window_suite(spark, sf_dir):
    """Window-function surface (SURVEY §2.6): row_number / rank /
    running integer-cents sum / lag / ntile over a fully tie-broken
    ordering (shipdate, orderkey, linenumber is unique)."""
    li = table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    w_qty = W.partitionBy("l_suppkey").orderBy(F.col("l_quantity").desc())
    cents = F.round(F.col("l_extendedprice") * 100.0, 0).cast("bigint")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w_qty).alias("qty_rank"),
        F.sum(cents).over(w.rowsBetween(W.unboundedPreceding, 0)).alias(
            "running_price_c"
        ),
        F.lag("l_orderkey").over(w).alias("prev_order"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "q_exists_semi",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45.0)
      AND NOT EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = o.o_orderkey AND l2.l_discount > 0.08)
    """,
)
def q_exists_semi(spark, sf_dir):
    """EXISTS / NOT EXISTS as left-semi + left-anti joins — the
    relational form of the reference's mask-based inclusion filters."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = li.filter(F.col("l_quantity") > 45.0).select("l_orderkey")
    disc = li.filter(F.col("l_discount") > 0.08).select("l_orderkey")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(disc, o.o_orderkey == disc.l_orderkey, "left_anti")
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "q_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) + 0.0 AS p50,
           ROUND(quantile_cont(value, 0.9), 6) + 0.0 AS p90,
           ROUND(MIN(value), 6) + 0.0 AS p0,
           ROUND(MAX(value), 6) + 0.0 AS p100
    FROM events GROUP BY event_type
    """,
)
def q_percentiles(spark, sf_dir):
    """Exact linear-interpolated percentiles per group (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``); the sketch-based
    approximate twin is q_approx_distinct (rows-only)."""
    from pyresample_spark.operators.bucket import load_events

    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        rnd(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        rnd(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        rnd(F.min("value"), 6).alias("p0"),
        rnd(F.max("value"), 6).alias("p100"),
    )


@register(
    "q_cube_agg",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS rf,
           COALESCE(CAST(l_linenumber AS VARCHAR), '<all>') AS ln,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
             AS price_c
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linenumber)
    """,
)
def q_cube_agg(spark, sf_dir):
    """CUBE aggregation (every grouping-set combination, incl. each
    single-dimension margin) — the pivot-table twin of q_rollup_agg;
    one expand+hash-agg pass, money summed in integer cents."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linenumber")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100.0, 0).cast("bigint")
            ).alias("price_c"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("<all>")).alias("rf"),
            F.coalesce(
                F.col("l_linenumber").cast("string"), F.lit("<all>")
            ).alias("ln"),
            "n",
            "price_c",
        )
    )


@register(
    "q_pivot",
    oracle="""
    SELECT l_returnflag AS rf,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                 THEN CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS f_price_c,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                 THEN CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS o_price_c,
           CAST(COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT)
             AS f_n,
           CAST(COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT)
             AS o_n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark, sf_dir):
    """PIVOT (long → wide): line-status categories become columns of
    integer-cents revenue + counts per return flag. Values are listed
    explicitly (``pivot(col, values)``) so Catalyst skips the extra
    distinct-values job and the plan is ONE map-side-combined hash agg
    — at 100 TB an unpinned pivot would pay a full scan just to learn
    the column set. Spark's pivot compiles to the same
    CASE-WHEN-per-category aggregate the oracle spells out."""
    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100.0, 0).cast("bigint")
    wide = (
        li.withColumn("cents", cents)
        .groupBy(F.col("l_returnflag").alias("rf"))
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum("cents").alias("price_c"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return wide.select(
        "rf",
        F.coalesce(F.col("F_price_c"), F.lit(0)).alias("f_price_c"),
        F.coalesce(F.col("O_price_c"), F.lit(0)).alias("o_price_c"),
        F.coalesce(F.col("F_n"), F.lit(0)).alias("f_n"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("o_n"),
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderstatus, '<all>') AS st,
           COALESCE(o_orderpriority, '<all>') AS pri,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
             AS total_c
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS — an asymmetric set list (detail,
    priority margin, grand total) that neither ROLLUP nor CUBE
    expresses, plus GROUPING() markers to tell a margin row from a
    genuine NULL group. Catalyst expands to one Expand + hash agg —
    the same single-pass shape as q_rollup_agg/q_cube_agg; both
    source columns are non-null so COALESCE sentinels are
    unambiguous."""
    li = table(spark, sf_dir, "orders")
    li.createOrReplaceTempView("q_gsets_orders")
    return spark.sql("""
        SELECT COALESCE(o_orderstatus, '<all>') AS st,
               COALESCE(o_orderpriority, '<all>') AS pri,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                    AS BIGINT) AS gid,
               COUNT(*) AS n,
               SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) AS total_c
        FROM q_gsets_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderpriority), ())
    """)
