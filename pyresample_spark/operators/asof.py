"""As-of (temporal backward) join — a named gap in Spark's built-in
operator set (the charter's canonical custom-operator example; kdb/
Pandas `merge_asof` / Flink temporal-join semantics): each left row
matches the single most recent right row with the same key and
``right.ts <= left.ts``.

Spark-first formulation: NOT a range join (which explodes to
candidate pairs and re-ranks) but a tagged UNION + one window pass —
sort each key's merged timeline once, carry the last-seen right row
forward with ``last(..., ignorenulls=True)``, keep left rows. One
shuffle on the key, one per-key sort, zero row amplification:
wall-clock and shuffle volume are both O(|L| + |R|), the optimal
shape at 100 TB (a broadcast/range formulation is O(|L|·candidates)).

The DuckDB oracle uses the engine's NATIVE ``ASOF JOIN`` — an
independent implementation, so parity actually validates semantics
(not just arithmetic).

Determinism: right rows are deduplicated to one per (key, ts) keeping
the max id (an as-of match at an exactly-tied timestamp is otherwise
ambiguous), and the merged timeline orders right-before-left at equal
ts so ``right.ts <= left.ts`` ties match, mirroring ASOF JOIN's
closed-interval semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts_us",
    left_id: str = "l_id",
    right_id: str = "r_id",
) -> DataFrame:
    """Backward as-of join.

    ``left``: (key, ts, left_id [, ...]); ``right``: (key, ts, right_id).
    Returns (key, left_id, ts, matched right_id or NULL, matched ts or
    NULL) — one row per left row.
    """
    r1 = (
        right.groupBy(key, ts)
        .agg(F.max(right_id).alias(right_id))
        .select(
            key,
            F.col(ts).alias("_ts"),
            F.lit(0).alias("_side"),
            F.lit(None).cast("long").alias("_lid"),
            F.col(right_id).alias("_rid"),
        )
    )
    l1 = left.select(
        key,
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.col(left_id).alias("_lid"),
        F.lit(None).cast("long").alias("_rid"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = r1.unionByName(l1).select(
        key,
        "_ts",
        "_side",
        "_lid",
        F.last("_rid", ignorenulls=True).over(w).alias("_match_rid"),
        F.last(
            F.when(F.col("_rid").isNotNull(), F.col("_ts")),
            ignorenulls=True,
        ).over(w).alias("_match_ts"),
    )
    return merged.filter(F.col("_side") == 1).select(
        key,
        F.col("_lid").alias(left_id),
        F.col("_ts").alias(ts),
        F.col("_match_rid").alias(right_id),
        F.col("_match_ts").alias("matched_ts"),
    )
