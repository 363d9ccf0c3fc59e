"""Golden-value test: the irregular-swath bilinear kernel must
reproduce exact analytic bilinear interpolation when the 'swath' is a
regular grid in disguise (the reference's cross-implementation
equivalence idiom, test_dask_ewa.py:325 style)."""

import pytest
from pyspark.sql import functions as F

from pyresample_spark.operators.bilinear_irregular import bilinear_irregular


def test_irregular_matches_analytic_on_regular_grid(spark):
    # 'swath' = 1° regular lon/lat grid, value = closed form of (i, j)
    src_rows = [
        (i * 100 + j, float(j), float(i), float(i * 10 + j))
        for i in range(10)
        for j in range(10)
    ]
    src = spark.createDataFrame(
        src_rows, "src_id long, lon double, lat double, value double"
    )
    # targets at known fractional positions: (lon=j+0.25, lat=i+0.75)
    tgt_rows = [
        (i * 100 + j, j + 0.25, i + 0.75)
        for i in range(2, 7)
        for j in range(2, 7)
    ]
    tgt = spark.createDataFrame(
        tgt_rows, "tgt_id long, lon double, lat double"
    )
    out = {
        r.tgt_id: r
        for r in bilinear_irregular(src, tgt, 300_000.0, k=16).collect()
    }
    assert len(out) == 25
    for (tid, lon, lat) in tgt_rows:
        i0, j0 = int(lat), int(lon)
        t, s = lon - j0, lat - i0  # fractions in x (t) and y (s)
        exact = (
            (1 - t) * (1 - s) * (i0 * 10 + j0)
            + t * (1 - s) * (i0 * 10 + j0 + 1)
            + (1 - t) * s * ((i0 + 1) * 10 + j0)
            + t * s * ((i0 + 1) * 10 + j0 + 1)
        )
        assert out[tid].bilinear_value == pytest.approx(exact, abs=1e-6), tid


def test_proj_columns_analytic(spark):
    from pyresample_spark.functions.geo import R_EARTH
    from pyresample_spark.operators.proj_udf import proj_columns

    df = spark.createDataFrame([(10.0, 45.0)], "lon double, lat double")
    out = proj_columns(df, "eqc").first()
    import math

    assert out.x == pytest.approx(math.radians(10.0) * R_EARTH)
    assert out.y == pytest.approx(math.radians(45.0) * R_EARTH)
    ll = proj_columns(df, "longlat").first()
    assert ll.x == 10.0 and ll.y == 45.0

    import pyresample_spark.operators.proj_udf as pu

    if not pu.HAS_PYPROJ:
        with pytest.raises(NotImplementedError):
            proj_columns(df, "+proj=stere +lat_0=90")


def test_bilinear_lut_persist_and_reuse(spark, sf_dir, tmp_path):
    """The bilinear precompute/apply split (VERDICT r4 item 6,
    reference bilinear/xarr.py:198-219): the corner/weight LUT persists
    once; a second channel goes through bilinear_apply whose plan has
    NO kNN cell-join stages (no applyInPandas kernel, no explode, no
    ranking) and NO shuffle exchange (bucketed LUT), and its values
    equal the full kernel's output on the same channel."""
    import os

    from pyspark.sql import functions as F

    from pyresample_spark.operators.bilinear_irregular import (
        bilinear_apply,
        bilinear_irregular,
        bilinear_lut,
    )
    from pyresample_spark.plans.lut import LutCache
    from pyresample_spark.queries.joins import _src

    src = _src(spark, sf_dir)
    tgt = src.filter(F.col("src_id") % 20 == 0).select(
        F.col("src_id").alias("tgt_id"),
        (F.col("lon") + 0.21).alias("lon"),
        (F.col("lat") + 0.13).alias("lat"),
    )
    cache = LutCache(str(tmp_path / "bl_luts"))
    kw = dict(cache=cache, src_hash="s1", tgt_hash="t1")

    lut1 = bilinear_lut(src, tgt, 150_000.0, k=32, **kw)
    n1 = lut1.count()
    assert n1 > 0
    # second call loads — same table, no recompute (files untouched)
    files = sorted(os.listdir(str(tmp_path / "bl_luts")))
    lut2 = bilinear_lut(src, tgt, 150_000.0, k=32, **kw)
    assert sorted(os.listdir(str(tmp_path / "bl_luts"))) == files
    plan = lut2._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan  # no kernel
    assert "Generate" not in plan  # no cell explode
    assert "lut_" in plan

    # apply a second channel: plan must stay free of the kNN join AND
    # of shuffle exchanges (bucketed tgt_id layout + broadcast values)
    ch2 = src.select("src_id", (F.col("value") * 2.0 + 1.0).alias("v2"))
    applied = bilinear_apply(lut2, ch2, value_col="v2")
    aplan = applied._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in aplan
    assert "Exchange hashpartitioning" not in aplan, aplan

    # value parity: apply(ch2) == kernel(ch2) per target
    got = {
        r.tgt_id: round(r.bilinear_value, 6) for r in applied.collect()
    }
    src2 = src.withColumn("value", F.col("value") * 2.0 + 1.0)
    want = {
        r.tgt_id: round(r.bilinear_value, 6)
        for r in bilinear_irregular(src2, tgt, 150_000.0, k=32).collect()
    }
    assert got == want and len(got) > 0


def test_reference_golden_fractional_distances():
    """Reference _get_fractional_distances goldens
    (test_bilinear.py:178-207): the irregular quadrilateral gives
    (t, s) = (0.375, 0.5); the uprights-parallel and parallelogram
    fixtures give (0.5, 0.5) through the fallback chain; and the
    published division-by-zero corner set solves to
    (0.30769689, 0.74616628). Only the corner constants come from the
    reference; the solver is this engine's closed-form chain
    (operators/bilinear_irregular.py _solve_ts_quadratic)."""
    from pyresample_spark.operators.bilinear_irregular import (
        _solve_ts_quadratic,
    )

    irregular = [(-1.0, 1.0), (1.0, 2.0), (-2.0, -1.0), (2.0, -4.0)]
    t, s = _solve_ts_quadratic(irregular, 0.0, 0.0)
    assert t == pytest.approx(0.375, abs=1e-12)
    assert s == pytest.approx(0.5, abs=1e-12)

    both_parallel = [(-1.0, 1.0), (1.0, 1.0), (-1.0, -1.0), (1.0, -1.0)]
    t, s = _solve_ts_quadratic(both_parallel, 0.0, 0.0)
    assert (t, s) == (pytest.approx(0.5), pytest.approx(0.5))

    vert_parallel = [(-1.0, 1.0), (1.0, 2.0), (-1.0, -1.0), (1.0, -2.0)]
    t, s = _solve_ts_quadratic(vert_parallel, 0.0, 0.0)
    assert (t, s) == (pytest.approx(0.5), pytest.approx(0.5))

    div_zero = [
        (-64.9936752319336, -5.140199184417725),
        (-64.98487091064453, -5.142156600952148),
        (-64.98683166503906, -5.151054859161377),
        (-64.97802734375, -5.153012275695801),
    ]
    t, s = _solve_ts_quadratic(div_zero, -64.985, -5.145)
    assert t == pytest.approx(0.30769689, abs=1e-7)
    assert s == pytest.approx(0.74616628, abs=1e-7)


def test_fused_plan_matches_pandas_kernel(spark, sf_dir):
    """Round 6: the let-bound column-expression plan (the production
    path — no Python in the plan) must reproduce the reference-shaped
    per-target Arrow kernel row-for-row on the real swath fixture,
    including corner ids and the (t, s) fallback-chain branches."""
    from pyresample_spark.operators.bilinear_irregular import (
        bilinear_irregular_pandas,
    )
    from pyresample_spark.queries.joins import _src

    src = _src(spark, sf_dir)
    tgt = src.filter(F.col("src_id") % 20 == 0).select(
        F.col("src_id").alias("tgt_id"),
        (F.col("lon") + 0.21).alias("lon"),
        (F.col("lat") + 0.13).alias("lat"),
    )
    a = bilinear_irregular(src, tgt, 150_000.0, k=32).toPandas()
    b = bilinear_irregular_pandas(src, tgt, 150_000.0, k=32).toPandas()
    assert len(a) == len(b) > 0
    ka = sorted(map(tuple, a.round(9).values.tolist()))
    kb = sorted(map(tuple, b.round(9).values.tolist()))
    assert ka == kb
