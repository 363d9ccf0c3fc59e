"""Streaming-shaped queries over the events table (SURVEY.md §2.9),
expressed as batch SQL so DuckDB can oracle them; the Structured
Streaming wrappers over the same logic live in
pyresample_spark/streaming/windows.py.

Time base: events.parquet has shipped in two timestamp flavors
(TIMESTAMP(NANOS) and TIMESTAMP(MICROS)); ``load_events``
(operators/bucket.py) normalizes ``ts`` to BIGINT epoch-nanoseconds
regardless of flavor. Every query then converts to **epoch
microseconds** (Spark: ``ts div 1000``, DuckDB: ``epoch_us(ts)``)
and does exact integer window math.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pyresample_spark.operators.bucket import load_events
from pyresample_spark.operators.dedup import md5_bigint
from pyresample_spark.queries import register, rnd, rnd_sql

HOUR_US = 3_600_000_000
GAP_US = 30 * 60 * 1_000_000  # 30 min session gap
DAY_US = 24 * HOUR_US


def _ev_us(spark, sf_dir):
    return load_events(spark, sf_dir).withColumn(
        "ts_us", F.expr("ts div 1000")
    )


EV_US_SQL = "SELECT *, epoch_us(ts) AS ts_us FROM events"


@register(
    "q_events_tumbling",
    oracle=f"""
    SELECT (ts_us // {HOUR_US}) * {HOUR_US} AS win_start_us,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM ({EV_US_SQL})
    GROUP BY win_start_us, event_type
    """,
    tags=("bench",),
)
def q_events_tumbling(spark, sf_dir):
    """Tumbling 1h window aggregation (streaming groupBy(window(ts,1h))
    batch twin; SURVEY §2.9 q_events_tumbling)."""
    ev = _ev_us(spark, sf_dir)
    return ev.groupBy(
        (F.expr(f"ts_us div {HOUR_US}") * HOUR_US).alias("win_start_us"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100.0, 0).cast("bigint")).alias(
            "sum_value_c"
        ),
    )


@register(
    "q_events_session",
    oracle=f"""
    WITH ev AS ({EV_US_SQL}),
    flagged AS (
      SELECT user_id, event_id, ts_us,
             CASE WHEN lag(ts_us) OVER w IS NULL
                    OR ts_us - lag(ts_us) OVER w > {GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    sessions AS (
      SELECT user_id, ts_us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_num
      FROM flagged
    )
    SELECT user_id, CAST(session_num AS BIGINT) AS session_num,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us
    FROM sessions GROUP BY user_id, session_num
    """,
)
def q_events_session(spark, sf_dir):
    """Sessionization: 30-min-gap sessions via lag + cumulative sum
    (batch formulation of session windows; SURVEY §2.9)."""
    ev = _ev_us(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    lag_ts = F.lag("ts_us").over(w)
    flagged = ev.withColumn(
        "is_new",
        F.when(
            lag_ts.isNull() | (F.col("ts_us") - lag_ts > GAP_US), 1
        ).otherwise(0),
    )
    cum = W.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    sessions = flagged.withColumn(
        "session_num", F.sum("is_new").over(cum)
    )
    return sessions.groupBy("user_id", "session_num").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
    )


@register(
    "q_events_late",
    oracle=f"""
    SELECT event_id, ts_us
    FROM ({EV_US_SQL})
    WHERE ts_us >= (SELECT MAX(ts_us) FROM ({EV_US_SQL})) - {DAY_US}
    """,
)
def q_events_late(spark, sf_dir):
    """Watermark-style late-data predicate: keep events within 1 day of
    the max event time (SURVEY §2.9 q_events_late)."""
    ev = _ev_us(spark, sf_dir).select("event_id", "ts_us")
    mx = ev.agg(F.max("ts_us").alias("max_us"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .filter(F.col("ts_us") >= F.col("max_us") - DAY_US)
        .select("event_id", "ts_us")
    )


@register(
    "q_distinct_agg",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
)
def q_distinct_agg(spark, sf_dir):
    """Exact distinct aggregation twin of q_approx_distinct (hash-
    verifiable; the approximate variant can't match across engines)."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# Portable HLL constants (q_approx_distinct). p=8 → m=256 registers;
# md5_bigint is 60 bits → 52-bit register stream, max rho = 53.
_HLL_M = 256
_HLL_MAXRHO = 53
# alpha_m · m² · 2^53 — the raw-estimate numerator, embedded as the
# SAME literal text in both engines so the parsed double is identical.
_HLL_NUM = repr(
    0.7213 / (1.0 + 1.079 / _HLL_M) * _HLL_M * _HLL_M * float(2 ** 53)
)


@register(
    "q_approx_distinct",
    oracle=f"""
    WITH h AS (
      SELECT event_type,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h0
      FROM events
    ),
    regs AS (
      SELECT event_type, (h0 & 255) AS j,
             MAX(CASE WHEN (h0 >> 8) = 0 THEN {_HLL_MAXRHO}
                 ELSE bit_count(((h0 >> 8) & -(h0 >> 8)) - 1) + 1
                 END) AS m_j
      FROM h GROUP BY event_type, j
    ),
    sk AS (
      SELECT event_type,
             CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_MAXRHO} - m_j))
                  + ({_HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << {_HLL_MAXRHO})
                  AS BIGINT) AS z_int,
             CAST({_HLL_M} - COUNT(*) AS BIGINT) AS v_zero
      FROM regs GROUP BY event_type
    ),
    ex AS (
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type
    ),
    est AS (
      SELECT event_type, z_int, v_zero, n_exact,
             CASE WHEN {_HLL_NUM} / z_int <= 2.5 * {_HLL_M} AND v_zero > 0
                  THEN {_HLL_M} * ln({_HLL_M}.0 / v_zero)
                  ELSE {_HLL_NUM} / z_int END AS e
      FROM sk JOIN ex USING (event_type)
    )
    SELECT event_type, n_exact, z_int, v_zero,
           {rnd_sql('e')} AS hll_est,
           {rnd_sql('(e - n_exact) / n_exact')} AS rel_err
    FROM est
    """,
)
def q_approx_distinct(spark, sf_dir):
    """Approximate distinct users per event_type via an EXPLICIT
    portable HyperLogLog (SURVEY §2.10; replaces the engine-opaque
    ``approx_count_distinct``, the registry's last un-oracle-able row —
    VERDICT r6 item 2). Same design move as ``q_countmin``: build the
    sketch from portable md5 hashes with pure integer arithmetic so it
    is bit-identical across engines, then audit estimate vs exact.

    m=256 registers; register index = low 8 hash bits, observable =
    trailing-zero count of the remaining 52-bit stream (exact via
    ``bit_count((w & -w) - 1)`` — no float log2 anywhere). The
    indicator sum Σ 2^-M_j is kept as an INTEGER (Σ 2^(53-M_j), max
    511·2^52 < 2^63) so it is order-insensitive and engine-exact; the
    only floats are the final α·m²/Z division and the small-range
    linear-counting branch m·ln(m/V), both single expressions rounded
    to 6 decimals. ``rel_err`` exposes the sketch error a deployment
    monitors (|rel_err| ≲ 1.04/√m ≈ 6.5%).

    Scale: two stacked map-side-combined hash aggs — rows → (type,
    256 registers) → (type); shuffle volume is types × 256 ints,
    independent of corpus size. Exactly how a 100 TB cardinality
    sweep should run. Reference analog: none (the reference has no
    sketches); this is charter 'novel sketch' surface."""
    ev = load_events(spark, sf_dir)
    h0 = md5_bigint(F.col("user_id").cast("string"))
    regs = (
        ev.select("event_type", h0.alias("h0"))
        .select(
            "event_type",
            F.expr("h0 & 255").alias("j"),
            F.expr("h0 >> 8").alias("w"),
        )
        .groupBy("event_type", "j")
        .agg(
            F.max(
                F.when(F.col("w") == 0, F.lit(_HLL_MAXRHO)).otherwise(
                    F.expr("bit_count((w & -w) - 1) + 1")
                )
            ).alias("m_j")
        )
    )
    sk = regs.groupBy("event_type").agg(
        (
            F.sum(F.expr(f"shiftleft(1L, CAST({_HLL_MAXRHO} - m_j AS INT))"))
            + (F.lit(_HLL_M) - F.count(F.lit(1)))
            * F.lit(2 ** _HLL_MAXRHO)
        ).cast("bigint").alias("z_int"),
        (F.lit(_HLL_M) - F.count(F.lit(1))).cast("bigint").alias("v_zero"),
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    raw = F.expr(f"{_HLL_NUM} / z_int")
    e = F.when(
        (raw <= 2.5 * _HLL_M) & (F.col("v_zero") > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / F.col("v_zero")),
    ).otherwise(raw)
    return (
        sk.join(ex, "event_type")
        .withColumn("e", e)
        .select(
            "event_type",
            "n_exact",
            "z_int",
            "v_zero",
            rnd(F.col("e")).alias("hll_est"),
            rnd((F.col("e") - F.col("n_exact")) / F.col("n_exact")).alias(
                "rel_err"
            ),
        )
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def q_json_extract(spark, sf_dir):
    """Semi-structured props parsing: JSON path extraction as a column
    expression (training-pipeline metadata access; no reference analog
    — satellite attrs are opaque there)."""
    ev = load_events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


@register(
    "q_events_sliding",
    oracle=f"""
    SELECT ((ts_us // {HOUR_US}) - k.k) * {HOUR_US} AS win_start_us,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM ({EV_US_SQL}) CROSS JOIN (VALUES (0), (1)) AS k(k)
    GROUP BY win_start_us, event_type
    """,
)
def q_events_sliding(spark, sf_dir):
    """Sliding (hopping) window aggregation — 2 h windows every 1 h,
    the batch twin of streaming ``window(ts, '2 hours', '1 hour')``.
    Expressed exactly as Spark's own physical expansion: each event
    explodes into size/hop = 2 hop-offsets, then one hash aggregation
    on (win_start, type) — map-side-combined, no window function, no
    sort. At 100 TB the 2× explode carries three small columns and the
    partial agg collapses it before the only shuffle (same amplify-
    then-combine shape as the EWA footprint explode)."""
    ev = _ev_us(spark, sf_dir)
    return (
        ev.select(
            "event_type", "value", "ts_us",
            F.explode(F.array(F.lit(0), F.lit(1))).alias("k"),
        )
        .groupBy(
            ((F.expr(f"ts_us div {HOUR_US}") - F.col("k")) * HOUR_US).alias(
                "win_start_us"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100.0, 0).cast("bigint")).alias(
                "sum_value_c"
            ),
        )
    )


@register(
    "q_funnel",
    oracle=f"""
    WITH ev AS ({EV_US_SQL}),
    v AS (SELECT user_id, MIN(ts_us) AS t_view FROM ev
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(ts_us) AS t_click
          FROM ev e JOIN v USING (user_id)
          WHERE event_type = 'click' AND ts_us > t_view
            AND ts_us <= t_view + {HOUR_US} GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(ts_us) AS t_purchase
          FROM ev e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND ts_us > t_click
            AND ts_us <= t_click + {HOUR_US} GROUP BY e.user_id),
    u AS (SELECT DISTINCT user_id FROM ev),
    staged AS (
      SELECT u.user_id,
             CASE WHEN p.user_id IS NOT NULL THEN 3
                  WHEN c.user_id IS NOT NULL THEN 2
                  WHEN v.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS stage
      FROM u
      LEFT JOIN v USING (user_id)
      LEFT JOIN c USING (user_id)
      LEFT JOIN p USING (user_id)
    )
    SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM staged GROUP BY stage
    """,
)
def q_funnel(spark, sf_dir):
    """Strict-order conversion funnel (view → click → purchase): the
    first click must follow the user's first view within a 1 h
    attribution window, and the first purchase must follow that click
    within 1 h — the sessionized product-analytics
    staple that a loose min-per-type comparison gets wrong. Three
    user-keyed aggregations re-use one shuffle partitioning (Catalyst
    reuses the user_id exchange); every value is an integer epoch-µs or
    a count, so the result is exactly deterministic."""
    ev = _ev_us(spark, sf_dir).select("user_id", "event_type", "ts_us")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_view"))
    )
    c = (
        ev.join(v, "user_id")
        .filter(
            (F.col("event_type") == "click")
            & (F.col("ts_us") > F.col("t_view"))
            & (F.col("ts_us") <= F.col("t_view") + HOUR_US)
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_click"))
    )
    p = (
        ev.join(c, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts_us") > F.col("t_click"))
            & (F.col("ts_us") <= F.col("t_click") + HOUR_US)
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_purchase"))
    )
    u = ev.select("user_id").distinct()
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    staged = (
        u.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", stage.alias("stage"))
    )
    return staged.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "q_events_retention",
    oracle=f"""
    WITH ev AS ({EV_US_SQL}),
    act AS (
      SELECT DISTINCT user_id, ts_us // {HOUR_US} AS hour_id FROM ev
    )
    SELECT a.hour_id,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(COUNT(b.user_id) AS BIGINT) AS n_retained,
           (ROUND(COUNT(b.user_id) / (1.0 * COUNT(*)), 6) + 0.0) AS retention
    FROM act a
    LEFT JOIN act b
      ON b.user_id = a.user_id AND b.hour_id = a.hour_id + 1
    GROUP BY a.hour_id
    """,
)
def q_events_retention(spark, sf_dir):
    """Hour-over-hour cohort retention: of the users active in hour H,
    the fraction also active in H+1 — the product-analytics retention
    curve, here at hourly grain. One distinct-activity set, self-joined
    on (user, hour+1): both sides share the same shuffle key family and
    every value is an integer count, so the result is exactly
    deterministic."""
    ev = _ev_us(spark, sf_dir)
    act = ev.select(
        "user_id", F.expr(f"ts_us div {HOUR_US}").alias("hour_id")
    ).distinct()
    nxt = act.select(
        "user_id", (F.col("hour_id") - 1).alias("hour_id"),
        F.lit(1).alias("ret"),
    )
    return (
        act.join(nxt, ["user_id", "hour_id"], "left")
        .groupBy("hour_id")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.count("ret").alias("n_retained"),
        )
        .select(
            "hour_id",
            "n_active",
            "n_retained",
            rnd(F.col("n_retained") / (1.0 * F.col("n_active")), 6).alias(
                "retention"
            ),
        )
    )


@register(
    "q_asof_join",
    oracle=f"""
    WITH ev AS ({EV_US_SQL}),
    l AS (SELECT user_id, ts_us, event_id AS l_id FROM ev
          WHERE event_type = 'purchase'),
    r0 AS (SELECT user_id, ts_us, MAX(event_id) AS r_id FROM ev
           WHERE event_type = 'click' GROUP BY user_id, ts_us)
    SELECT l.user_id, l.l_id, l.ts_us,
           r0.r_id, r0.ts_us AS matched_ts
    FROM l ASOF LEFT JOIN r0
      ON l.user_id = r0.user_id AND r0.ts_us <= l.ts_us
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of join: each purchase matched to the user's most recent
    click at-or-before it (the kdb/pandas merge_asof / Flink
    temporal-join operator — the charter's canonical Spark-missing
    custom op). Implemented as a tagged union + one window pass
    (operators/asof.py): O(|L|+|R|) shuffle, no pair explosion. The
    DuckDB oracle is the engine's NATIVE ``ASOF LEFT JOIN`` — an
    independent implementation, so the parity check validates the
    operator's semantics, not a mirrored formula."""
    from pyresample_spark.operators.asof import asof_join

    ev = _ev_us(spark, sf_dir)
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", F.col("event_id").alias("l_id")
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us", F.col("event_id").alias("r_id")
    )
    return asof_join(left, right)


@register(
    "q_range_join",
    oracle=f"""
    WITH ev AS ({EV_US_SQL}),
    bands AS (
      SELECT CAST(i AS BIGINT) AS band_id,
             CAST(i * i AS DOUBLE) * 5.0 AS lo,
             CAST((i + 1) * (i + 1) AS DOUBLE) * 5.0 AS hi
      FROM range(10) t(i)
    )
    SELECT b.band_id,
           CAST(COUNT(e.event_id) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(e.value * 100.0) AS BIGINT)) AS BIGINT)
             AS sum_value_c
    FROM bands b
    LEFT JOIN ev e ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band_id
    """,
)
def q_range_join(spark, sf_dir):
    """Range (interval) join — the second custom-join operator the
    charter names alongside as-of: events banded into quadratically
    widening [lo, hi) value intervals from a generated dimension.
    Spark executes the inequality join as BroadcastNestedLoop with the
    10-row band table broadcast — which IS the right plan: at 100 TB
    the fact side streams through each task and never shuffles, and
    band count (not fact count) bounds the per-row comparison cost.
    (Equal-width bands would be a map-side `floor(value/w)` — the
    range-join formulation is for genuinely irregular intervals.)"""
    ev = _ev_us(spark, sf_dir)
    bands = spark.range(10).select(
        F.col("id").alias("band_id"),
        (F.col("id") * F.col("id") * 5.0).cast("double").alias("lo"),
        ((F.col("id") + 1) * (F.col("id") + 1) * 5.0)
        .cast("double")
        .alias("hi"),
    )
    joined = F.broadcast(bands).join(
        ev,
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        "left",
    )
    return joined.groupBy("band_id").agg(
        F.count("event_id").alias("n"),
        F.sum(F.round(F.col("value") * 100.0, 0).cast("bigint")).alias(
            "sum_value_c"
        ),
    )


@register(
    "q_sessionize_gap",
    oracle=f"""
    WITH ev AS ({EV_US_SQL}),
    flagged AS (
      SELECT user_id, event_id, ts_us,
             CASE WHEN lag(ts_us) OVER w IS NULL
                    OR ts_us - lag(ts_us) OVER w > {GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    sessions AS (
      SELECT user_id, ts_us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_num
      FROM flagged
    ),
    per_session AS (
      SELECT user_id, session_num,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MAX(ts_us) - MIN(ts_us) AS duration_us
      FROM sessions GROUP BY user_id, session_num
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(duration_us) // COUNT(*) AS BIGINT) AS avg_duration_us,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events
    FROM per_session GROUP BY user_id
    """,
)
def q_sessionize_gap(spark, sf_dir):
    """Per-user session SUMMARY over 30-min-gap sessions (the analytics
    layer above q_events_session's per-session rows): session count,
    event total, mean session duration, busiest session. Same
    lag+cumsum sessionization — one extra tiny aggregation over the
    per-session table, so the 100 TB cost profile is unchanged (two
    hash aggs after one user-partitioned sort window)."""
    ev = _ev_us(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    lag_ts = F.lag("ts_us").over(w)
    flagged = ev.withColumn(
        "is_new",
        F.when(
            lag_ts.isNull() | (F.col("ts_us") - lag_ts > GAP_US), 1
        ).otherwise(0),
    )
    cum = W.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    sessions = flagged.withColumn("session_num", F.sum("is_new").over(cum))
    per_session = sessions.groupBy("user_id", "session_num").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )
    # mean duration as EXACT integer division (floor µs): AVG + ROUND
    # landed on a half-way rounding boundary at sf0.1 (the mean is a
    # small-denominator rational, which hits boundaries often) and the
    # engines' double→decimal rounding disagreed in the last digit —
    # integer div is bit-identical everywhere and loses < 1 µs.
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.expr("sum(duration_us) div count(*)").alias("avg_duration_us"),
        F.max("n_events").alias("max_session_events"),
    )
