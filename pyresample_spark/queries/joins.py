"""M4 queries: kNN radius join + weighted resampling aggregations
(SURVEY.md §2.4-2.5 join family).

Source = events points (FIXTURES derived lon/lat), target = a 2° world
grid. The kNN join is the engine-native cell-bucketed equi-join
(operators/knn.py); the DuckDB oracle replicates the identical
algorithm (27-neighborhood 3-D geocentric cells, mm-rounded chord
distance, (dist, src_id) ranking).
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pyresample_spark.functions.geo import R_EARTH
from pyresample_spark.geometry import AreaDefinition
from pyresample_spark.operators.bucket import events_points
from pyresample_spark.operators.knn import chord_length, gauss_weight, knn_join
from pyresample_spark.queries import register, rnd
from pyresample_spark.queries.geo_scalar import PTS_SQL

KNN_AREA = AreaDefinition(
    "knn_tgt_2deg", "longlat", width=180, height=90,
    area_extent=(-180.0, -90.0, 180.0, 90.0),
)

RADIUS_M = 250_000.0
CHORD = chord_length(RADIUS_M)
CHORD_MM = round(CHORD * 1000.0)
SIGMA = 100_000.0


def _geo_sql(lon: str, lat: str, px: str) -> str:
    r = repr(R_EARTH)
    return (
        f"{r} * cos(radians({lat})) * cos(radians({lon})) AS {px}gx, "
        f"{r} * cos(radians({lat})) * sin(radians({lon})) AS {px}gy, "
        f"{r} * sin(radians({lat})) AS {px}gz"
    )


# Target grid as SQL with lon/lat + geocentric coords.
def tgt_sql(area) -> str:
    return f"""
    SELECT cell_id AS tgt_id, cx AS lon, cy AS lat,
           {_geo_sql('cx', 'cy', 't_')}
    FROM ({area.grid_sql()})
"""


TGT_SQL = tgt_sql(KNN_AREA)

SRC_SQL = f"""
    SELECT event_id AS src_id, value, {_geo_sql('lon', 'lat', 's_')}
    FROM ({PTS_SQL})
"""


def pairs_sql(area, radius_m: float) -> str:
    """The full kNN pair table for any (target area, radius) — the
    DuckDB twin of operators/knn.py knn_join (27-neighborhood 3-D
    geocentric cells, mm-rounded chord, (dist, src_id) ranking);
    k unlimited, rank filtered per query."""
    # cells sized by cell_side(c) = c + mm-quantization slack, matching
    # operators/knn.py _radius_pairs exactly (same double → same FLOOR
    # bucketing in both engines)
    from pyresample_spark.operators.knn import cell_side

    c = repr(cell_side(chord_length(radius_m)))
    chord_mm = round(chord_length(radius_m) * 1000.0)
    return f"""
    WITH s AS (
      SELECT *, CAST(FLOOR(s_gx / {c}) AS BIGINT) AS cx3,
                CAST(FLOOR(s_gy / {c}) AS BIGINT) AS cy3,
                CAST(FLOOR(s_gz / {c}) AS BIGINT) AS cz3
      FROM ({SRC_SQL})
    ),
    t AS (
      SELECT tgt_id, t_gx, t_gy, t_gz,
             CAST(FLOOR(t_gx / {c}) AS BIGINT) + ox.dx AS cx3,
             CAST(FLOOR(t_gy / {c}) AS BIGINT) + oy.dy AS cy3,
             CAST(FLOOR(t_gz / {c}) AS BIGINT) + oz.dz AS cz3
      FROM ({tgt_sql(area)})
      CROSS JOIN (VALUES (-1), (0), (1)) AS ox(dx)
      CROSS JOIN (VALUES (-1), (0), (1)) AS oy(dy)
      CROSS JOIN (VALUES (-1), (0), (1)) AS oz(dz)
    ),
    pairs AS (
      SELECT t.tgt_id, s.src_id, s.value,
             CAST(FLOOR(sqrt((t_gx - s_gx) * (t_gx - s_gx)
                           + (t_gy - s_gy) * (t_gy - s_gy)
                           + (t_gz - s_gz) * (t_gz - s_gz)) * 1000.0 + 0.5) AS BIGINT) AS dist_mm
      FROM t JOIN s USING (cx3, cy3, cz3)
    ),
    ranked AS (
      SELECT tgt_id, src_id, value, dist_mm,
             row_number() OVER (PARTITION BY tgt_id
                                ORDER BY dist_mm ASC, src_id ASC) AS nn_rank
      FROM pairs WHERE dist_mm <= {chord_mm}
    )
"""


PAIRS_SQL = pairs_sql(KNN_AREA, RADIUS_M)


def _src(spark, sf_dir):
    from pyresample_spark.queries.geo_scalar import _pts

    # spread=False: this source feeds the cell join's broadcast build
    # (operators/knn.py) — a repartition here would only add an
    # exchange in front of the BroadcastExchange collect
    return _pts(spark, sf_dir, spread=False).select(
        F.col("event_id").alias("src_id"), "value", "lon", "lat"
    )


def _tgt(spark):
    return KNN_AREA.grid(spark).select(
        F.col("cell_id").alias("tgt_id"),
        F.col("cx").alias("lon"),
        F.col("cy").alias("lat"),
    )


def _knn_pairs(spark, sf_dir, k):
    return knn_join(
        _src(spark, sf_dir), _tgt(spark), RADIUS_M, k=k,
        src_id="src_id", tgt_id="tgt_id",
    )


@register(
    "q_knn_join",
    oracle=PAIRS_SQL
    + """
    SELECT tgt_id, src_id, dist_mm / 1000.0 AS dist_m, CAST(nn_rank AS INT) AS nn_rank
    FROM ranked WHERE nn_rank <= 1
    """,
    tags=("bench",),
)
def q_knn_join(spark, sf_dir):
    """k=1 kNN radius join via 3-D geocentric cell bucketing + top-k
    window (kd_tree.py:464-550 re-expressed; SURVEY §2.4)."""
    return _knn_pairs(spark, sf_dir, k=1)


@register(
    "q_nn_gather",
    oracle=PAIRS_SQL
    + f"""
    SELECT g.cell_id, r.src_id AS nn_event,
           COALESCE(r.value, -999.0) AS nn_value
    FROM ({KNN_AREA.grid_sql()}) g
    LEFT JOIN (SELECT * FROM ranked WHERE nn_rank = 1) r
      ON g.cell_id = r.tgt_id
    """,
)
def q_nn_gather(spark, sf_dir):
    """Nearest-neighbor gather with fill for unmatched targets
    (kd_tree.py:566-652,705-711): LEFT JOIN + coalesce(fill)."""
    nn = _knn_pairs(spark, sf_dir, k=1)
    src_vals = _src(spark, sf_dir).select("src_id", "value")
    nn_v = nn.join(F.broadcast(src_vals), "src_id", "left")
    grid = KNN_AREA.grid(spark).select("cell_id")
    # shuffle_hash on the values side: the fill join would otherwise
    # plan SortMergeJoin and sort BOTH sides (EXPLAINS r10 flag);
    # hash-building on the ≤1-row-per-cell matched side needs no sort
    # at any grid scale, and AQE still broadcasts it when truly small
    return grid.join(
        nn_v.select("tgt_id", "src_id", "value").hint("shuffle_hash"),
        grid.cell_id == nn_v.tgt_id,
        "left",
    ).select(
        "cell_id",
        F.col("src_id").alias("nn_event"),
        F.coalesce(F.col("value"), F.lit(-999.0)).alias("nn_value"),
    )


APPROX_FACTOR = 2.0


def approx_cte_sql(area, radius_m: float, factor: float) -> str:
    """Approximate-kNN CTE fragment (names sa/ta/apairs/aranked so it
    can be appended to PAIRS_SQL for side-by-side recall queries): the
    DuckDB twin of operators/knn.py neighbor_scheme="shift2" — two
    grids of cell side factor·cell_side(c), the second shifted by half
    a cell per axis; own-cell join within each grid, same mm-quantized
    chord filter and ranking (duplicate pairs from dual co-location
    are harmless under the rank-1 min)."""
    from pyresample_spark.operators.knn import cell_side

    cell = repr(factor * cell_side(chord_length(radius_m)))
    chord_mm = round(chord_length(radius_m) * 1000.0)
    return f"""
    sa AS (
      SELECT src_id, s_gx, s_gy, s_gz, g.grid,
             CAST(FLOOR(s_gx / {cell} + g.grid * 0.5) AS BIGINT) AS acx3,
             CAST(FLOOR(s_gy / {cell} + g.grid * 0.5) AS BIGINT) AS acy3,
             CAST(FLOOR(s_gz / {cell} + g.grid * 0.5) AS BIGINT) AS acz3
      FROM ({SRC_SQL}) CROSS JOIN (VALUES (0), (1)) AS g(grid)
    ),
    ta AS (
      SELECT tgt_id, t_gx, t_gy, t_gz, g.grid,
             CAST(FLOOR(t_gx / {cell} + g.grid * 0.5) AS BIGINT) AS acx3,
             CAST(FLOOR(t_gy / {cell} + g.grid * 0.5) AS BIGINT) AS acy3,
             CAST(FLOOR(t_gz / {cell} + g.grid * 0.5) AS BIGINT) AS acz3
      FROM ({tgt_sql(area)}) CROSS JOIN (VALUES (0), (1)) AS g(grid)
    ),
    apairs AS (
      SELECT ta.tgt_id, sa.src_id,
             CAST(FLOOR(sqrt((t_gx - s_gx) * (t_gx - s_gx)
                           + (t_gy - s_gy) * (t_gy - s_gy)
                           + (t_gz - s_gz) * (t_gz - s_gz)) * 1000.0 + 0.5) AS BIGINT) AS dist_mm
      FROM ta JOIN sa USING (grid, acx3, acy3, acz3)
    ),
    aranked AS (
      SELECT tgt_id, src_id, dist_mm,
             row_number() OVER (PARTITION BY tgt_id
                                ORDER BY dist_mm ASC, src_id ASC) AS nn_rank
      FROM apairs WHERE dist_mm <= {chord_mm}
    )
"""


APPROX_CTE = approx_cte_sql(KNN_AREA, RADIUS_M, APPROX_FACTOR)


def _knn_approx(spark, sf_dir):
    return knn_join(
        _src(spark, sf_dir), _tgt(spark), RADIUS_M, k=1,
        src_id="src_id", tgt_id="tgt_id",
        neighbor_scheme="shift2", approx_cell_factor=APPROX_FACTOR,
    )


@register(
    "q_knn_approx",
    oracle="WITH "
    + APPROX_CTE
    + """
    SELECT tgt_id, src_id, dist_mm / 1000.0 AS dist_m, CAST(nn_rank AS INT) AS nn_rank
    FROM aranked WHERE nn_rank <= 1
    """,
)
def q_knn_approx(spark, sf_dir):
    """Approximate k=1 kNN join — the cell-join analog of the
    reference kd-tree ``epsilon`` accuracy/speed knob (kd_tree.py:
    86-88,545-548): own-cell probe under TWO half-cell-shifted 2×
    coarser grids, so each side shuffles 2× instead of the exact
    join's 27× probe explode. Per axis a near pair cannot straddle a
    wall of both grids; only mixed-axis straddles are missed — recall
    measured by q_knn_approx_recall (0.95+ at sf0.01). Deterministic
    (same grids → same pairs → same min), hence fully oracled."""
    return _knn_approx(spark, sf_dir)


@register(
    "q_knn_approx_recall",
    oracle=PAIRS_SQL
    + ", "
    + APPROX_CTE
    + """
    , e1 AS (SELECT tgt_id, src_id FROM ranked WHERE nn_rank = 1),
    a1 AS (SELECT tgt_id, src_id FROM aranked WHERE nn_rank = 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(a1.src_id) AS BIGINT) AS n_found,
           CAST(COALESCE(SUM(CASE WHEN a1.src_id = e1.src_id THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_same,
           ROUND(CAST(COALESCE(SUM(CASE WHEN a1.src_id = e1.src_id THEN 1 ELSE 0 END), 0) AS DOUBLE)
                 / NULLIF(CAST(COUNT(*) AS DOUBLE), 0.0), 6) + 0.0 AS recall_at_1,
           ROUND(CAST(COUNT(a1.src_id) AS DOUBLE)
                 / NULLIF(CAST(COUNT(*) AS DOUBLE), 0.0), 6) + 0.0 AS coverage
    FROM e1 LEFT JOIN a1 USING (tgt_id)
    """,
)
def q_knn_approx_recall(spark, sf_dir):
    """Recall gate for the approximate kNN tier (the q_ann_recall
    pattern applied to the geo side, VERDICT r7 item 6): exact k=1 vs
    own-cell approximate k=1, reporting recall@1 (same neighbour) and
    coverage (any neighbour found). One-row diagnostic; both sides are
    deterministic so the whole comparison is oracled."""
    exact = _knn_pairs(spark, sf_dir, k=1).select(
        "tgt_id", F.col("src_id").alias("e_src")
    )
    approx = _knn_approx(spark, sf_dir).select(
        "tgt_id", F.col("src_id").alias("a_src")
    )
    # shuffle_hash: both sides are k=1 aggregates bounded by the target
    # grid size — a hash join needs no sort, and the single downstream
    # agg consumes unordered rows anyway
    j = exact.hint("shuffle_hash").join(approx, "tgt_id", "left")
    same = F.coalesce(
        F.sum(F.when(F.col("a_src") == F.col("e_src"), 1).otherwise(0)),
        F.lit(0),
    ).cast("long")
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.count("a_src").cast("long").alias("n_found"),
        same.alias("n_same"),
    )
    n_exact_d = F.nullif(F.col("n_exact").cast("double"), F.lit(0.0))
    return agg.select(
        "n_exact",
        "n_found",
        "n_same",
        rnd(F.col("n_same").cast("double") / n_exact_d, 6).alias("recall_at_1"),
        rnd(F.col("n_found").cast("double") / n_exact_d, 6).alias("coverage"),
    )


@register(
    "q_gauss_agg",
    oracle=PAIRS_SQL
    + f"""
    , wp AS (
      SELECT tgt_id, value,
             exp(-(dist_mm / 1000.0) * (dist_mm / 1000.0) / ({SIGMA!r} * {SIGMA!r})) AS w
      FROM ranked WHERE nn_rank <= 8
    )
    SELECT tgt_id,
           ROUND(SUM(w * value) / SUM(w), 6) + 0.0 AS gauss_value,
           ROUND(sqrt((SUM(w) / (SUM(w) * SUM(w) - SUM(w * w)))
                      * (SUM(w * value * value) - SUM(w * value) * SUM(w * value) / SUM(w))), 6) + 0.0 AS gauss_stddev,
           CAST(COUNT(*) AS BIGINT) AS n_neighbours
    FROM wp GROUP BY tgt_id HAVING COUNT(*) > 1
    """,
)
def q_gauss_agg(spark, sf_dir):
    """Gaussian-weighted resample with uncertainty (kd_tree.py:741-859):
    over k=8 neighbors, result = Σwv/Σw with w = exp(-d²/σ²); stddev via
    the v1/(v1²-v2)-unbiased weighted variance; plus neighbor count.

    Plan (round 4): the fused fold operator — value rides the candidate
    pairs, top-8 selection AND the four weighted sums happen in ONE
    HashAggregate + in-row array fold (operators/knn.py knn_gauss_fold)
    instead of collect→explode→value-join→re-aggregate. ~1.3× faster at
    sf0.1, identical output; the DuckDB oracle is unchanged."""
    from pyresample_spark.operators.knn import knn_gauss_fold

    sums = knn_gauss_fold(
        _src(spark, sf_dir), _tgt(spark), RADIUS_M, k=8, sigma=SIGMA
    )
    v1, v2 = F.col("v1"), F.col("v2")
    swv, swv2 = F.col("swv"), F.col("swv2")
    return sums.filter(F.col("n_neighbours") > 1).select(
        "tgt_id",
        rnd(swv / v1, 6).alias("gauss_value"),
        rnd(
            F.sqrt((v1 / (v1 * v1 - v2)) * (swv2 - swv * swv / v1)), 6
        ).alias("gauss_stddev"),
        F.col("n_neighbours").cast("long").alias("n_neighbours"),
    )


@register(
    "q_weighted_avg",
    oracle=PAIRS_SQL
    + f"""
    , wp AS (
      SELECT tgt_id, src_id, value,
             pow(1.0 - (dist_mm / 1000.0 / {RADIUS_M!r}) * (dist_mm / 1000.0 / {RADIUS_M!r}), 2) AS w
      FROM ranked
    ),
    agg AS (
      SELECT tgt_id,
             ROUND(SUM(w * value) / SUM(w), 6) + 0.0 AS ewa_value,
             ROUND(SUM(w), 6) + 0.0 AS weight_sum
      FROM wp GROUP BY tgt_id
    ),
    best AS (
      SELECT tgt_id, value AS maxw_value
      FROM (SELECT tgt_id, value,
                   row_number() OVER (PARTITION BY tgt_id
                                      ORDER BY w DESC, src_id ASC) AS rn
            FROM wp) WHERE rn = 1
    )
    SELECT agg.tgt_id, ewa_value, weight_sum, maxw_value
    FROM agg JOIN best ON agg.tgt_id = best.tgt_id
    """,
)
def q_weighted_avg(spark, sf_dir):
    """EWA-style weighted average (ewa/_fornav.pyx:119-206 re-expressed):
    all pairs within radius, polynomial kernel w=(1-(d/r)²)², per-cell
    Σwv/Σw + Σw, plus maximum_weight_mode value.

    maximum_weight_mode: ``max_by(v, struct(w, -src_id))`` would force a
    SortAggregate (struct ordering has no mutable agg buffer). The kernel
    is strictly decreasing in distance on [0, r], so max-weight ⟺
    min (dist_mm, src_id) — the same packed-bigint min() as the k=1 kNN
    path, keeping the whole agg a map-side-partial HashAggregate; the
    winner's value is fetched by one broadcast join on src_id.

    Round 4: the value column rides the candidate pairs
    (operators/knn.py _radius_pairs extra_src_cols) so the big pair
    table needs NO value join before the aggregate — one less join on
    the only large intermediate; measured ~1.3× at sf0.1, identical
    rows."""
    from pyresample_spark.operators.knn import _radius_pairs, chord_length

    src = _src(spark, sf_dir)
    pairs = _radius_pairs(
        src, _tgt(spark), chord_length(RADIUS_M), extra_src_cols=("value",)
    )
    dr = F.col("dist_mm") / 1000.0 / RADIUS_M
    wp = pairs.withColumn("w", F.pow(1.0 - dr * dr, 2))
    v, w = F.col("value"), F.col("w")
    pack = (1 << 62) // (CHORD_MM + 1)
    agg = wp.groupBy("tgt_id").agg(
        rnd(F.sum(w * v) / F.sum(w), 6).alias("ewa_value"),
        rnd(F.sum(w), 6).alias("weight_sum"),
        F.min(F.col("dist_mm") * pack + F.col("src_id")).alias("bk"),
    )
    src_vals = src.select("src_id", "value")
    best = agg.withColumn("best_src", F.col("bk") % pack)
    return best.join(
        F.broadcast(src_vals.withColumnRenamed("src_id", "best_src")),
        "best_src",
    ).select(
        "tgt_id", "ewa_value", "weight_sum", F.col("value").alias("maxw_value")
    )


@register(
    "q_custom_weight",
    oracle=PAIRS_SQL
    + f"""
    , wp AS (
      SELECT tgt_id, value,
             1.0 / (1.0 + (dist_mm / 1000.0) / {RADIUS_M!r}) AS w
      FROM ranked WHERE nn_rank <= 8
    )
    SELECT tgt_id,
           ROUND(SUM(w * value) / SUM(w), 6) + 0.0 AS custom_value,
           CAST(COUNT(*) AS BIGINT) AS n_neighbours
    FROM wp GROUP BY tgt_id
    """,
)
def q_custom_weight(spark, sf_dir):
    """resample_custom (kd_tree.py:192-253): user-supplied radial weight
    function applied between join and aggregation — the reference's one
    true user-code extension point, realized as an Arrow-vectorized
    pandas UDF on the dist column (SURVEY §2.11)."""
    @F.pandas_udf("double")
    def inv_dist_weight(d: pd.Series) -> pd.Series:
        return 1.0 / (1.0 + d / RADIUS_M)

    nn = _knn_pairs(spark, sf_dir, k=8)
    src_vals = _src(spark, sf_dir).select("src_id", "value")
    wp = nn.join(F.broadcast(src_vals), "src_id", "inner").withColumn(
        "w", inv_dist_weight(F.col("dist_m"))
    )
    v, w = F.col("value"), F.col("w")
    return wp.groupBy("tgt_id").agg(
        rnd(F.sum(w * v) / F.sum(w), 6).alias("custom_value"),
        F.count(F.lit(1)).alias("n_neighbours"),
    )


@register(
    "q_multichannel_gauss",
    oracle=PAIRS_SQL
    + f"""
    , chan AS (
      SELECT event_id AS src_id, value AS ch1,
             value * value / 100.0 AS ch2, lat AS ch3
      FROM ({PTS_SQL})
    ),
    wp AS (
      SELECT r.tgt_id, c.ch1, c.ch2, c.ch3,
             exp(-(dist_mm / 1000.0) * (dist_mm / 1000.0) / ({SIGMA!r} * {SIGMA!r})) AS w
      FROM ranked r JOIN chan c USING (src_id)
      WHERE nn_rank <= 8
    )
    SELECT tgt_id,
           ROUND(SUM(w * ch1) / SUM(w), 6) + 0.0 AS ch1,
           ROUND(SUM(w * ch2) / SUM(w), 6) + 0.0 AS ch2,
           ROUND(SUM(w * ch3) / SUM(w), 6) + 0.0 AS ch3
    FROM wp GROUP BY tgt_id
    """,
)
def q_multichannel_gauss(spark, sf_dir):
    """Multi-channel resampling (kd_tree.py:79-81 trailing channel dim;
    docs/concepts/resampling.rst:98-101 neighbour-info reuse): ONE kNN
    join's neighbor/weight set applied to 3 data channels in a single
    aggregation pass. This is the LUT-reuse story at the plan level —
    resampling k channels costs one join + one agg, not k joins; adding
    a channel adds two columns to the shuffle, not a stage."""
    nn = _knn_pairs(spark, sf_dir, k=8)
    chan = _src(spark, sf_dir).select(
        "src_id",
        F.col("value").alias("ch1"),
        (F.col("value") * F.col("value") / 100.0).alias("ch2"),
        F.col("lat").alias("ch3"),
    )
    wp = nn.join(F.broadcast(chan), "src_id", "inner").withColumn(
        "w", gauss_weight(F.col("dist_m"), SIGMA)
    )
    w = F.col("w")
    return wp.groupBy("tgt_id").agg(
        rnd(F.sum(w * F.col("ch1")) / F.sum(w), 6).alias("ch1"),
        rnd(F.sum(w * F.col("ch2")) / F.sum(w), 6).alias("ch2"),
        rnd(F.sum(w * F.col("ch3")) / F.sum(w), 6).alias("ch3"),
    )


def gauss_lut(spark, sf_dir, cache_dir: str | None = None):
    """The persisted kNN neighbour/weight LUT for (events points →
    2° world grid, r=250 km, k=8): computed once, stored as parquet
    keyed by (source identity, target geometry hash, radius, k), and
    loaded — not re-joined — on every later call (plans/lut.py).

    Reference parity: BaseResampler.precompute caching
    (resampler.py:69-88) and the bilinear zarr LUT save/load
    (bilinear/xarr.py:198-219) — "can increase performance greatly"
    (docs/concepts/resampling.rst:98-101). At 100 TB the one expensive
    spatial join amortizes over every channel/dataset gather, which
    becomes a plain equi-join on src_id."""
    import tempfile

    from pyresample_spark.plans.lut import LutCache

    cache = LutCache(
        cache_dir
        or os.environ.get("PYRESAMPLE_SPARK_LUT_DIR")
        or os.path.join(tempfile.gettempdir(), "pyresample_spark_luts")
    )
    # the source identity includes the parquet file's (size, mtime)
    # fingerprint: the driver has regenerated events.parquet in place
    # across rounds (e.g. the TIMESTAMP(NANOS)→MICROS flavor change),
    # and a path-only key would silently serve a stale LUT for the
    # new data
    ev_path = os.path.join(sf_dir, "events.parquet")
    st = os.stat(ev_path)
    src_hash = hashlib.sha1(
        f"events-points|{os.path.abspath(sf_dir)}|{st.st_size}|"
        f"{st.st_mtime_ns}".encode()
    ).hexdigest()[:16]
    tgt_hash = hashlib.sha1(repr(KNN_AREA).encode()).hexdigest()[:16]
    return cache.get_or_compute(
        spark, src_hash, tgt_hash, RADIUS_M, 8,
        lambda: _knn_pairs(spark, sf_dir, k=8).select(
            "tgt_id", "src_id", "dist_m"
        ),
    )


@register(
    "q_gauss_lut_reuse",
    oracle=PAIRS_SQL
    + f"""
    , chan AS (
      SELECT event_id AS src_id,
             value * 0.5 + 10.0 AS ch2
      FROM ({PTS_SQL})
    ),
    wp AS (
      SELECT r.tgt_id, c.ch2,
             exp(-(dist_mm / 1000.0) * (dist_mm / 1000.0) / ({SIGMA!r} * {SIGMA!r})) AS w
      FROM ranked r JOIN chan c USING (src_id)
      WHERE nn_rank <= 8
    )
    SELECT tgt_id,
           ROUND(SUM(w * ch2) / SUM(w), 6) + 0.0 AS gauss_ch2,
           CAST(COUNT(*) AS BIGINT) AS n_neighbours
    FROM wp GROUP BY tgt_id
    """,
)
def q_gauss_lut_reuse(spark, sf_dir):
    """Gaussian resample of a SECOND channel through the PERSISTED
    neighbour LUT: the kNN join runs only if the parquet LUT keyed by
    (geometry, radius, k) is absent; otherwise the plan is a parquet
    scan of (tgt_id, src_id, dist_m) + one equi-join + one hash agg —
    no spatial join at all. This is the reference's headline
    performance feature (precompute/apply split, resampler.py:69-88,
    bilinear/xarr.py:198-219) in Spark terms; the DuckDB oracle
    recomputes the same pairs from scratch, proving the persisted LUT
    is byte-equivalent to a fresh join."""
    lut = gauss_lut(spark, sf_dir)
    ch2 = _src(spark, sf_dir).select(
        "src_id", (F.col("value") * 0.5 + 10.0).alias("ch2")
    )
    wp = lut.join(F.broadcast(ch2), "src_id", "inner").withColumn(
        "w", gauss_weight(F.col("dist_m"), SIGMA)
    )
    w = F.col("w")
    return wp.groupBy("tgt_id").agg(
        rnd(F.sum(w * F.col("ch2")) / F.sum(w), 6).alias("gauss_ch2"),
        F.count(F.lit(1)).alias("n_neighbours"),
    )


_KEYED_AREA = AreaDefinition(
    "knn_tgt_4deg", "longlat", width=90, height=45,
    area_extent=(-180.0, -90.0, 180.0, 90.0),
)
_KEYED_RADIUS = 200_000.0


@register(
    "q_resample_nearest_keyed",
    oracle=pairs_sql(_KEYED_AREA, _KEYED_RADIUS)
    + """
    SELECT t.cell_id, COALESCE(r.value, -999.0) AS value
    FROM (SELECT cell_id FROM ({grid})) t
    LEFT JOIN (SELECT tgt_id, value FROM ranked WHERE nn_rank = 1) r
      ON t.cell_id = r.tgt_id
    """.format(grid=_KEYED_AREA.grid_sql()),
)
def q_resample_nearest_keyed(spark, sf_dir):
    """Nearest-neighbour resample through the ImageContainer facade
    with a CALLER-SUPPLIED natural key (``key_col='event_id'``): no
    ``with_compact_id``, no ``localCheckpoint``, no materialization —
    the id column rides the scan (VERDICT r3 item 6; reference analog:
    image.py ImageContainer where the source index is free because
    numpy arrays are positional). Gap cells fill with −999
    (kd_tree.py fill_value). At 100 TB this is the difference between
    resampling streaming straight off parquet and checkpointing the
    whole source first."""
    from pyresample_spark.image import GeoImage

    pts = events_points(spark, sf_dir).select(
        "event_id", "lon", "lat", "value"
    )
    img = GeoImage.from_swath(pts)
    out = img.resample(
        _KEYED_AREA, method="nearest", radius_m=_KEYED_RADIUS,
        fill=-999.0, key_col="event_id",
    )
    return out.df


_S50, _S100, _S200 = 50_000.0, 100_000.0, 200_000.0


@register(
    "q_gauss_multi_sigma",
    oracle=PAIRS_SQL
    + f"""
    , wp AS (
      SELECT tgt_id, value,
             exp(-(dist_mm / 1000.0) * (dist_mm / 1000.0) / ({_S50!r} * {_S50!r})) AS w1,
             exp(-(dist_mm / 1000.0) * (dist_mm / 1000.0) / ({_S100!r} * {_S100!r})) AS w2,
             exp(-(dist_mm / 1000.0) * (dist_mm / 1000.0) / ({_S200!r} * {_S200!r})) AS w3
      FROM ranked WHERE nn_rank <= 8
    )
    SELECT tgt_id,
           ROUND(SUM(w1 * value) / SUM(w1), 6) + 0.0 AS gauss_s50,
           ROUND(SUM(w2 * (2.0 * value + 1.0)) / SUM(w2), 6) + 0.0 AS gauss_s100,
           ROUND(SUM(w3 * (100.0 - value)) / SUM(w3), 6) + 0.0 AS gauss_s200,
           CAST(COUNT(*) AS BIGINT) AS n_neighbours
    FROM wp GROUP BY tgt_id HAVING COUNT(*) > 1
    """,
)
def q_gauss_multi_sigma(spark, sf_dir):
    """resample_gauss with a PER-CHANNEL sigma list (kd_tree.py:113-189
    accepts ``sigmas=[...]`` — one Gaussian width per data channel;
    the reference loops channels through the same neighbour arrays).
    Spark twin: ONE cell-join + ONE top-8 selection shared by all
    channels, then each channel is just two more in-row folds over the
    same 8-element array (w = exp(−d²/σᵢ²), Σwᵢvᵢ and Σwᵢ) inside the
    SAME HashAggregate — the neighbour search amortizes exactly like
    the reference's, and like q_ewa_multiband's footprint explode.

    Channels here are derived (v, 2v+1, 100−v) with σ = 50/100/200 km
    so the three weight profiles genuinely differ."""
    from pyresample_spark.operators.knn import _radius_pairs, chord_length

    pairs = _radius_pairs(
        _src(spark, sf_dir), _tgt(spark), chord_length(RADIUS_M),
        extra_src_cols=("value",),
    )
    # top-8 as a codegen'd row_number window + plain SUM aggregates
    # (the knn_gauss_fold r17-opt idiom — no collected struct lists,
    # no interpreted folds; summation order is the window's
    # (dist_mm, src_id) order, exactly the old fold order)
    w1 = W.partitionBy("tgt_id").orderBy(
        F.col("dist_mm").asc(), F.col("src_id").asc()
    )
    top = pairs.withColumn("rn", F.row_number().over(w1)).filter(
        F.col("rn") <= 8
    )
    d_m = F.col("dist_mm") / 1000.0
    v = F.col("value")
    chans = [
        ("gauss_s50", _S50, v),
        ("gauss_s100", _S100, 2.0 * v + 1.0),
        ("gauss_s200", _S200, 100.0 - v),
    ]
    aggs = []
    for name, sig, vx in chans:
        w = F.exp(-(d_m * d_m) / (sig * sig))
        aggs.append(F.sum(w * vx).alias(f"swv_{name}"))
        aggs.append(F.sum(w).alias(f"sw_{name}"))
    out = top.groupBy("tgt_id").agg(
        F.count(F.lit(1)).alias("n_neighbours"), *aggs
    )
    return out.filter(F.col("n_neighbours") > 1).select(
        "tgt_id",
        *[
            rnd(F.col(f"swv_{n}") / F.col(f"sw_{n}"), 6).alias(n)
            for n, _, _ in chans
        ],
        F.col("n_neighbours").cast("long").alias("n_neighbours"),
    )
