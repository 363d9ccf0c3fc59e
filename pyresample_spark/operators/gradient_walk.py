"""Iterative gradient-search index walk for swaths with NO analytic
inverse (VERDICT r6 item 3 — the one reference algorithm family that
had no direct twin).

Reference parity: pyresample/gradient/_gradient_search.pyx —
``one_step_gradient_search_no_gil`` (:147-228): per output pixel,
Newton-iterate over the source grid using local coordinate gradients
(xl, xp, yl, yp) until the fractional step (dl, dp) is < 1 pixel, then
sample with ``bil`` (:61-86) or ``nn`` (:40-56); out-of-bounds resets
clamp back into the grid; unconverged pixels stay NaN. The analytic
regrid family (operators/resample_grid.py, queries/resample.py
q_regrid_*) replaces the walk wherever an inverse projection exists;
THIS operator handles the remaining case — source coordinates that are
pure DATA (an arbitrary swath projected to the target CRS).

Spark-first re-expression — three deliberate design changes, each
making the walk a deterministic DataFrame plan instead of a stateful
scanline kernel:

1. **Fixed per-pixel seed** (source grid center) instead of the
   reference's serpentine carry of the previous pixel's solution
   (:175-186, ``last_p0/last_l0``). Every output pixel's walk is
   independent → embarrassingly parallel across executors; the cost is
   a few extra Newton steps per pixel, bounded by ``n_iters``.
2. **Fixed iteration count, unrolled** (default 8 > the reference's
   cnt>5 bail-out): each step is one equi-join of the walker state
   against the gradient table on integer (l, p) keys, with
   freeze-on-convergence semantics (a converged walker passes through
   later steps unchanged). A bounded unrolled loop is expressible as a
   pure column plan in ANY engine — which is exactly what makes the
   operator oracle-checkable in DuckDB, unlike a data-dependent while
   loop.
3. **floor() stepping** instead of C int-cast truncation (:225-226).
   Identical behavior after the bounds clamp: the two differ only for
   fractional positions in (−1, 0), which both clamp to 0 on the next
   step.

Gradients are forward differences of neighbor coordinates (one-sided
at the grid edges), built once with four clamped-key self-joins — the
DataFrame analog of the np.gradient input the reference precomputes
(gradient/__init__.py).

Exactness across engines: all iteration arithmetic is +,−,*,/ on
doubles in identical textual order, integer clamps, and exact
comparisons — feed it quantized coordinates (e.g. mm-rounded, see
q_gradient_walk) and the walk's every branch decision and final
fractional index is bit-identical between Spark and DuckDB.

Scale (100 TB): the walker state is ~40 bytes/pixel; the gradient
table is built once per geometry pair and is the natural LutCache
citizen (bucket by (l, p): all n_iters probes join against the same
layout). ``broadcast=True`` (default) is right for granule-sized
swaths (≤ a few million pixels); pass False for monster swaths to get
shuffle joins where only the walker state moves. The converged
fractional-index LUT — (tgt_id, frac_l, frac_p) — is the reusable
artifact: every subsequent channel is ONE gather join, the same
amortization the analytic regrid family uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_b(df: DataFrame, broadcast: bool) -> DataFrame:
    return F.broadcast(df) if broadcast else df


def source_gradients(
    src: DataFrame, lmax: int, pmax: int, broadcast: bool = True
) -> DataFrame:
    """(l, p, sx, sy, xl, xp, yl, yp): per-cell target-CRS coords +
    forward-difference gradients (one-sided at the far edges), via
    four clamped-key self-joins. xl = ∂sx/∂l, xp = ∂sx/∂p, etc."""
    base = src.select("l", "p", "sx", "sy")

    def look(nm):
        return base.select(
            F.col("l").alias(f"{nm}_l"),
            F.col("p").alias(f"{nm}_p"),
            F.col("sx").alias(f"{nm}_sx"),
            F.col("sy").alias(f"{nm}_sy"),
        )

    g = base.withColumn(
        "l_hi", F.least(F.col("l") + 1, F.lit(lmax))
    ).withColumn("p_hi", F.least(F.col("p") + 1, F.lit(pmax)))
    for nm, kl, kp in (
        ("a", F.col("l_hi"), F.col("p")),
        ("b", F.col("l_hi") - 1, F.col("p")),
        ("c", F.col("l"), F.col("p_hi")),
        ("d", F.col("l"), F.col("p_hi") - 1),
    ):
        g = g.join(
            _maybe_b(look(nm), broadcast),
            (kl == F.col(f"{nm}_l")) & (kp == F.col(f"{nm}_p")),
        )
    return g.select(
        "l",
        "p",
        "sx",
        "sy",
        (F.col("a_sx") - F.col("b_sx")).alias("xl"),
        (F.col("a_sy") - F.col("b_sy")).alias("yl"),
        (F.col("c_sx") - F.col("d_sx")).alias("xp"),
        (F.col("c_sy") - F.col("d_sy")).alias("yp"),
    )


def gradient_walk_lut(
    tgt: DataFrame,
    src: DataFrame,
    lmax: int,
    pmax: int,
    n_iters: int = 8,
    broadcast: bool = True,
    check_dense: bool = False,
) -> DataFrame:
    """Newton-walk every target pixel to its fractional source index
    and derive the gather geometry — the REUSABLE artifact: (tgt_id,
    l0, p0, fl, fp, it, nnl, nnp, l_a, l_b, w_l, p_a, p_b, w_p) for
    CONVERGED pixels only. Persist this once per geometry pair
    (LutCache citizen); every channel afterwards is pure gather joins
    (:func:`gradient_gather`) — the same precompute/apply split as the
    kNN and bilinear LUTs.

    ``tgt``: (tgt_id, dstx, dsty) — output pixels in the shared CRS.
    ``src``: (l, p, sx, sy) — swath coords in the SAME CRS.

    PRECONDITION: ``src`` must be DENSE — one row for every (l, p) in
    [0, lmax]×[0, pmax] (swath arrays are dense by construction; this
    is long format of a 2-D array, not a sparse point set). The walk's
    per-step equi-joins drop any walker whose clamped position has no
    gradient row — including already-converged walkers passing
    through — exactly as the reference's array indexing would fault.
    Represent bad geolocation as NaN sx/sy (the reference's
    convention): a walker stepping onto NaN gradients never satisfies
    the convergence predicate and is excluded as unconverged, matching
    _gradient_search.pyx's NaN arithmetic. Pass ``check_dense=True``
    to verify the row count up front (one cheap count; raises
    ValueError on holes)."""
    if check_dense:
        n = src.count()
        want = (lmax + 1) * (pmax + 1)
        if n != want:
            raise ValueError(
                f"gradient_walk needs a dense (l, p) grid: got {n} "
                f"rows, want {(lmax + 1)}x{(pmax + 1)} = {want}"
            )
    g = source_gradients(src, lmax, pmax, broadcast)
    gj = g.select(
        F.col("l").alias("g_l"), F.col("p").alias("g_p"),
        "sx", "sy", "xl", "xp", "yl", "yp",
    )
    st = tgt.select(
        "tgt_id",
        "dstx",
        "dsty",
        F.lit(lmax // 2).cast("long").alias("l0"),
        F.lit(pmax // 2).cast("long").alias("p0"),
        F.lit(False).alias("done"),
        F.lit(None).cast("double").alias("fl"),
        F.lit(None).cast("double").alias("fp"),
        F.lit(None).cast("int").alias("it"),
    )
    for k in range(1, n_iters + 1):
        j = (
            st.withColumn(
                "l0c",
                F.greatest(F.lit(0), F.least(F.lit(lmax), F.col("l0"))),
            )
            .withColumn(
                "p0c",
                F.greatest(F.lit(0), F.least(F.lit(pmax), F.col("p0"))),
            )
            .join(
                _maybe_b(gj, broadcast),
                (F.col("l0c") == F.col("g_l"))
                & (F.col("p0c") == F.col("g_p")),
            )
            .withColumn("dx", F.col("dstx") - F.col("sx"))
            .withColumn("dy", F.col("dsty") - F.col("sy"))
            .withColumn(
                "d", F.col("yl") * F.col("xp") - F.col("yp") * F.col("xl")
            )
            # try_divide: ANSI-safe on d = 0 (the d = 0 rows take the
            # stay-put branch below; DuckDB mirrors with an explicit
            # CASE WHEN d = 0 THEN NULL)
            .withColumn("dl", F.expr("try_divide(xp * dy - yp * dx, d)"))
            .withColumn("dp_", F.expr("try_divide(yl * dx - xl * dy, d)"))
        )
        j = j.withColumn(
            "conv",
            (~F.col("done"))
            & (F.col("d") != 0)
            & (F.abs(F.col("dl")) < 1)
            & (F.abs(F.col("dp_")) < 1),
        )
        st = j.select(
            "tgt_id",
            "dstx",
            "dsty",
            F.when(F.col("done"), F.col("l0"))
            .when(F.col("conv"), F.col("l0c"))
            .when(F.col("d") == 0, F.col("l0c"))
            .otherwise(F.floor(F.col("l0c") + F.col("dl")))
            .alias("l0"),
            F.when(F.col("done"), F.col("p0"))
            .when(F.col("conv"), F.col("p0c"))
            .when(F.col("d") == 0, F.col("p0c"))
            .otherwise(F.floor(F.col("p0c") + F.col("dp_")))
            .alias("p0"),
            (F.col("done") | F.col("conv")).alias("done"),
            F.when(F.col("done"), F.col("fl"))
            .when(F.col("conv"), F.col("l0c") + F.col("dl"))
            .alias("fl"),
            F.when(F.col("done"), F.col("fp"))
            .when(F.col("conv"), F.col("p0c") + F.col("dp_"))
            .alias("fp"),
            F.when(F.col("done"), F.col("it"))
            .when(F.col("conv"), F.lit(k))
            .alias("it"),
        )
    fin = st.filter(
        F.col("done")
        & F.col("fl").between(0, lmax)
        & F.col("fp").between(0, pmax)
    ).select(
        "tgt_id",
        "l0",
        "p0",
        "fl",
        "fp",
        "it",
        (F.col("fl") - F.col("l0")).alias("dlf"),
        (F.col("fp") - F.col("p0")).alias("dpf"),
    )
    # nn gather (_gradient_search.pyx:40-56): snap to the neighbor when
    # the fractional offset exceeds half a pixel, clamped at edges
    fin = fin.withColumn(
        "nnl",
        F.col("l0")
        + F.when((F.col("dlf") < -0.5) & (F.col("l0") > 0), F.lit(-1))
        .when((F.col("dlf") > 0.5) & (F.col("l0") < lmax), F.lit(1))
        .otherwise(F.lit(0)),
    ).withColumn(
        "nnp",
        F.col("p0")
        + F.when((F.col("dpf") < -0.5) & (F.col("p0") > 0), F.lit(-1))
        .when((F.col("dpf") > 0.5) & (F.col("p0") < pmax), F.lit(1))
        .otherwise(F.lit(0)),
    )
    # bil corners + weights (:61-86): negative offsets interpolate
    # toward the previous cell with weight 1 + d
    fin = (
        fin.withColumn(
            "l_a",
            F.when(
                F.col("dlf") < 0, F.greatest(F.lit(0), F.col("l0") - 1)
            ).otherwise(F.col("l0")),
        )
        .withColumn(
            "l_b",
            F.when(F.col("dlf") < 0, F.col("l0")).otherwise(
                F.least(F.lit(lmax), F.col("l0") + 1)
            ),
        )
        .withColumn(
            "w_l",
            F.when(F.col("dlf") < 0, F.lit(1.0) + F.col("dlf")).otherwise(
                F.col("dlf")
            ),
        )
        .withColumn(
            "p_a",
            F.when(
                F.col("dpf") < 0, F.greatest(F.lit(0), F.col("p0") - 1)
            ).otherwise(F.col("p0")),
        )
        .withColumn(
            "p_b",
            F.when(F.col("dpf") < 0, F.col("p0")).otherwise(
                F.least(F.lit(pmax), F.col("p0") + 1)
            ),
        )
        .withColumn(
            "w_p",
            F.when(F.col("dpf") < 0, F.lit(1.0) + F.col("dpf")).otherwise(
                F.col("dpf")
            ),
        )
    )
    return fin.select(
        "tgt_id", "l0", "p0", "fl", "fp", "it",
        "nnl", "nnp", "l_a", "l_b", "w_l", "p_a", "p_b", "w_p",
    )


def gradient_gather(
    lut: DataFrame,
    src: DataFrame,
    value_col: str = "value",
    broadcast: bool = True,
) -> DataFrame:
    """Apply a channel through a gradient-walk LUT: the reference's nn
    (_gradient_search.pyx:40-56) and bil (:61-86) gathers as five
    equi-joins + one weighted-sum expression. Zero walk work — this is
    the per-channel apply side of the precompute/apply split."""
    sv = src.select("l", "p", F.col(value_col).alias("_v"))

    def vtab(nm):
        return sv.select(
            F.col("l").alias(f"{nm}_l"),
            F.col("p").alias(f"{nm}_p"),
            F.col("_v").alias(f"{nm}_v"),
        )

    out = lut
    for nm, kl, kp in (
        ("nn", "nnl", "nnp"),
        ("aa", "l_a", "p_a"),
        ("ab", "l_a", "p_b"),
        ("ba", "l_b", "p_a"),
        ("bb", "l_b", "p_b"),
    ):
        out = out.join(
            _maybe_b(vtab(nm), broadcast),
            (F.col(kl) == F.col(f"{nm}_l"))
            & (F.col(kp) == F.col(f"{nm}_p")),
        )
    one = F.lit(1.0)
    bil = (
        (one - F.col("w_l")) * (one - F.col("w_p")) * F.col("aa_v")
        + (one - F.col("w_l")) * F.col("w_p") * F.col("ab_v")
        + F.col("w_l") * (one - F.col("w_p")) * F.col("ba_v")
        + F.col("w_l") * F.col("w_p") * F.col("bb_v")
    )
    return out.select(
        "tgt_id",
        "l0",
        "p0",
        "fl",
        "fp",
        "it",
        F.col("nn_v").alias("nn_value"),
        bil.alias("bil_value"),
    )


def gradient_walk(
    tgt: DataFrame,
    src: DataFrame,
    lmax: int,
    pmax: int,
    n_iters: int = 8,
    broadcast: bool = True,
) -> DataFrame:
    """Walk + gather fused (one-shot use; ``src`` needs a ``value``
    column). Returns (tgt_id, l0, p0, fl, fp, it, nn_value,
    bil_value) — see :func:`gradient_walk_lut` for the split form."""
    lut = gradient_walk_lut(tgt, src, lmax, pmax, n_iters, broadcast)
    return gradient_gather(lut, src, broadcast=broadcast)


# ---------------------------------------------------------------------------
# Demo swath for q_gradient_walk: a polynomial warp with a bilinear
# cross term, so the (l, p) → (sx, sy) mapping is NOT an affine grid
# (the analytic regrid family does not apply) yet every coordinate is
# pure +,*,/ arithmetic on small integers — bit-identical between Spark
# and DuckDB with no quantization step, so the walk's every branch
# decision matches across engines.

SWATH_L = 60  # lines   (l in 0..59)
SWATH_P = 80  # pixels  (p in 0..79)
TGT_ROWS = 40
TGT_COLS = 50

# Literals spelled CAST(x AS DOUBLE) so the SAME string parses as
# DOUBLE in both Spark SQL (bare 50.0 would be DECIMAL — silent
# decimal arithmetic through the whole walk) and DuckDB.
def _d(x: str) -> str:
    return f"CAST({x} AS DOUBLE)"


_SX = (f"{_d('50.0')} + {_d('100.0')} * p + {_d('3.0')} * l"
       f" + {_d('0.05')} * (l * p)")
_SY = (f"{_d('80.0')} + {_d('120.0')} * l + {_d('2.0')} * p"
       f" + {_d('0.04')} * (l * p)")
_VAL = f"CAST((l * 31 + p * 17) % 97 AS DOUBLE) + {_d('0.5')}"
_DSTX = f"{_d('420.0')} + {_d('150.0')} * tcol"
_DSTY = f"{_d('350.0')} + {_d('170.0')} * trow"


def demo_swath(spark) -> DataFrame:
    """(l, p, sx, sy, value) — warped swath, coordinates as DATA."""
    return (
        spark.range(SWATH_L * SWATH_P)
        .select(
            (F.col("id") / SWATH_P).cast("bigint").alias("l"),
            (F.col("id") % SWATH_P).cast("bigint").alias("p"),
        )
        .selectExpr("l", "p", f"{_SX} AS sx", f"{_SY} AS sy",
                    f"{_VAL} AS value")
    )


def demo_target(spark) -> DataFrame:
    """(tgt_id, dstx, dsty) — output pixels inside the swath's span."""
    return (
        spark.range(TGT_ROWS * TGT_COLS)
        .select(
            F.col("id").alias("tgt_id"),
            (F.col("id") / TGT_COLS).cast("bigint").alias("trow"),
            (F.col("id") % TGT_COLS).cast("bigint").alias("tcol"),
        )
        .selectExpr("tgt_id", f"{_DSTX} AS dstx", f"{_DSTY} AS dsty")
    )


def gradient_walk_oracle_sql(n_iters: int = 8,
                             value_sql: str | None = None) -> str:
    """DuckDB replay of demo_swath → gradient_walk, operation-for-
    operation: same generation arithmetic, same forward-difference
    gradient joins, the same ``n_iters``-step unrolled Newton walk
    (clamp → join → step/freeze CASE texts shared with the Spark
    column plan), then the identical nn / bil gathers. Every double op
    is +,−,*,/ in the same textual order, so the result is
    bit-identical — the final ROUND(…, 9/6) is belt-and-braces only.

    ``value_sql`` substitutes the gathered channel (the LUT-reuse twin
    gathers a derived second channel through the SAME walk)."""
    lmax, pmax = SWATH_L - 1, SWATH_P - 1
    sql = f"""
    WITH src AS (
      SELECT l, p, {_SX} AS sx, {_SY} AS sy,
             {value_sql or _VAL} AS value
      FROM (SELECT CAST(range // {SWATH_P} AS BIGINT) AS l,
                   CAST(range % {SWATH_P} AS BIGINT) AS p
            FROM range({SWATH_L * SWATH_P}))
    ),
    grad AS (
      SELECT s.l, s.p, s.sx, s.sy,
             a.sx - b.sx AS xl, a.sy - b.sy AS yl,
             c.sx - d.sx AS xp, c.sy - d.sy AS yp
      FROM src s
      JOIN src a ON a.l = LEAST(s.l + 1, {lmax}) AND a.p = s.p
      JOIN src b ON b.l = LEAST(s.l + 1, {lmax}) - 1 AND b.p = s.p
      JOIN src c ON c.l = s.l AND c.p = LEAST(s.p + 1, {pmax})
      JOIN src d ON d.l = s.l AND d.p = LEAST(s.p + 1, {pmax}) - 1
    ),
    st0 AS (
      SELECT tgt_id, {_DSTX} AS dstx, {_DSTY} AS dsty,
             CAST({lmax // 2} AS BIGINT) AS l0,
             CAST({pmax // 2} AS BIGINT) AS p0,
             FALSE AS done,
             CAST(NULL AS DOUBLE) AS fl, CAST(NULL AS DOUBLE) AS fp,
             CAST(NULL AS INTEGER) AS it
      FROM (SELECT range AS tgt_id,
                   CAST(range // {TGT_COLS} AS BIGINT) AS trow,
                   CAST(range % {TGT_COLS} AS BIGINT) AS tcol
            FROM range({TGT_ROWS * TGT_COLS}))
    )"""
    for k in range(1, n_iters + 1):
        sql += f""",
    st{k} AS (
      SELECT tgt_id, dstx, dsty,
             CASE WHEN done THEN l0 WHEN conv THEN l0c
                  WHEN d = 0 THEN l0c
                  ELSE CAST(FLOOR(l0c + dl) AS BIGINT) END AS l0,
             CASE WHEN done THEN p0 WHEN conv THEN p0c
                  WHEN d = 0 THEN p0c
                  ELSE CAST(FLOOR(p0c + dp) AS BIGINT) END AS p0,
             (done OR conv) AS done,
             CASE WHEN done THEN fl WHEN conv THEN l0c + dl END AS fl,
             CASE WHEN done THEN fp WHEN conv THEN p0c + dp END AS fp,
             CASE WHEN done THEN it WHEN conv THEN {k} END AS it
      FROM (
        SELECT t1.*,
               ((NOT done) AND d <> 0
                AND ABS(dl) < 1 AND ABS(dp) < 1) AS conv
        FROM (
          SELECT t0.*,
                 CASE WHEN d = 0 THEN NULL
                      ELSE (xp * dy - yp * dx) / d END AS dl,
                 CASE WHEN d = 0 THEN NULL
                      ELSE (yl * dx - xl * dy) / d END AS dp
          FROM (
            SELECT st.tgt_id, st.dstx, st.dsty, st.l0, st.p0,
                   st.done, st.fl, st.fp, st.it,
                   GREATEST(0, LEAST({lmax}, st.l0)) AS l0c,
                   GREATEST(0, LEAST({pmax}, st.p0)) AS p0c,
                   g.sx, g.sy, g.xl, g.xp, g.yl, g.yp,
                   st.dstx - g.sx AS dx, st.dsty - g.sy AS dy,
                   g.yl * g.xp - g.yp * g.xl AS d
            FROM st{k - 1} st
            JOIN grad g
              ON GREATEST(0, LEAST({lmax}, st.l0)) = g.l
             AND GREATEST(0, LEAST({pmax}, st.p0)) = g.p
          ) t0
        ) t1
      )
    )"""
    sql += f""",
    fin AS (
      SELECT tgt_id, l0, p0, fl, fp, it,
             fl - l0 AS dlf, fp - p0 AS dpf
      FROM st{n_iters}
      WHERE done AND fl BETWEEN 0 AND {lmax} AND fp BETWEEN 0 AND {pmax}
    ),
    gw AS (
      SELECT *,
             l0 + CASE WHEN dlf < -0.5 AND l0 > 0 THEN -1
                       WHEN dlf > 0.5 AND l0 < {lmax} THEN 1
                       ELSE 0 END AS nnl,
             p0 + CASE WHEN dpf < -0.5 AND p0 > 0 THEN -1
                       WHEN dpf > 0.5 AND p0 < {pmax} THEN 1
                       ELSE 0 END AS nnp,
             CASE WHEN dlf < 0 THEN GREATEST(0, l0 - 1) ELSE l0 END AS l_a,
             CASE WHEN dlf < 0 THEN l0 ELSE LEAST({lmax}, l0 + 1) END AS l_b,
             CASE WHEN dlf < 0 THEN 1.0 + dlf ELSE dlf END AS w_l,
             CASE WHEN dpf < 0 THEN GREATEST(0, p0 - 1) ELSE p0 END AS p_a,
             CASE WHEN dpf < 0 THEN p0 ELSE LEAST({pmax}, p0 + 1) END AS p_b,
             CASE WHEN dpf < 0 THEN 1.0 + dpf ELSE dpf END AS w_p
      FROM fin
    )
    SELECT gw.tgt_id, gw.l0, gw.p0,
           (ROUND(gw.fl, 9) + 0.0) AS fl,
           (ROUND(gw.fp, 9) + 0.0) AS fp,
           gw.it,
           nn.value AS nn_value,
           (ROUND((1.0 - w_l) * (1.0 - w_p) * aa.value
                + (1.0 - w_l) * w_p * ab.value
                + w_l * (1.0 - w_p) * ba.value
                + w_l * w_p * bb.value, 6) + 0.0) AS bil_value
    FROM gw
    JOIN src nn ON gw.nnl = nn.l AND gw.nnp = nn.p
    JOIN src aa ON gw.l_a = aa.l AND gw.p_a = aa.p
    JOIN src ab ON gw.l_a = ab.l AND gw.p_b = ab.p
    JOIN src ba ON gw.l_b = ba.l AND gw.p_a = ba.p
    JOIN src bb ON gw.l_b = bb.l AND gw.p_b = bb.p
    """
    return sql
