"""General CRS transforms: pandas-UDF pyproj wrapper with analytic
fallbacks (SURVEY.md §2.2).

Reference parity: the ubiquitous ``Proj(...)(lons, lats)`` calls
(bucket/__init__.py:165, grid.py:119), the multiprocess variant
_spatial_mp.Proj_MP (:108), and DaskFriendlyTransformer
(utils/proj4.py:108-165).

pyproj is not installed in this environment, so the UDF path is gated
behind an import-try; the analytic projections the engine implements
natively (longlat, eqc) are pure column expressions — they stay in
WholeStageCodegen and are preferred whenever the CRS allows. On a real
cluster with pyproj, ``proj_columns`` transparently switches to the
Arrow-batched UDF (the dask-chunk analog).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyresample_spark.functions.geo import R_EARTH

try:  # pragma: no cover - optional dependency
    import pyproj  # noqa: F401

    HAS_PYPROJ = True
except ImportError:
    HAS_PYPROJ = False


ANALYTIC_CRS = ("longlat", "eqc")


def proj_columns(
    df: DataFrame,
    crs: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    x_out: str = "x",
    y_out: str = "y",
    transformer_factory=None,
) -> DataFrame:
    """Add projected (x, y) columns for the given CRS.

    ``transformer_factory``: optional zero-arg callable (must be
    picklable — module-level function, not a lambda over live state)
    returning an object with ``.transform(lons, lats) -> (x, y)``
    numpy arrays. Defaults to a pyproj ``Transformer`` for ``crs``;
    injecting a pure-python transformer exercises the full UDF path
    (Arrow batching, struct schema, NaN passthrough) without pyproj —
    see tests/test_operators.py test_proj_udf_mock_transformer.
    """
    crs_key = crs.replace("+proj=", "").split()[0] if crs else "longlat"
    if transformer_factory is None:
        if crs_key == "longlat":
            return df.withColumn(
                x_out, F.col(lon_col).cast("double")
            ).withColumn(y_out, F.col(lat_col).cast("double"))
        if crs_key == "eqc":
            return df.withColumn(
                x_out, F.radians(F.col(lon_col)) * R_EARTH
            ).withColumn(y_out, F.radians(F.col(lat_col)) * R_EARTH)
        if not HAS_PYPROJ:
            raise NotImplementedError(
                f"CRS {crs!r} needs pyproj (not installed); analytic CRSs "
                f"available without it: {ANALYTIC_CRS}"
            )
        transformer_factory = _pyproj_factory(crs)
    return _proj_udf_columns(
        df, transformer_factory, lon_col, lat_col, x_out, y_out
    )


def _pyproj_factory(crs: str):  # pragma: no cover - needs pyproj
    def make():
        import pyproj

        return pyproj.Transformer.from_crs(
            "EPSG:4326", crs, always_xy=True
        )

    return make


def _proj_udf_columns(df, transformer_factory, lon_col, lat_col, x_out, y_out):
    """Arrow-batched transform through an injected transformer.

    One transformer is built PER EXECUTOR PYTHON WORKER (lazily, first
    batch) and reused across batches — the dask-chunk economics of
    DaskFriendlyTransformer (utils/proj4.py:108-165): construction cost
    (datum grids, CRS parsing) is amortized over every batch the worker
    sees, and nothing non-picklable crosses the driver→executor wire.
    """
    from pyspark.sql import types as T

    state = {}

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("x", T.DoubleType()),
                T.StructField("y", T.DoubleType()),
            ]
        )
    )
    def tf(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        if "t" not in state:
            state["t"] = transformer_factory()
        x, y = state["t"].transform(lon.to_numpy(), lat.to_numpy())
        return pd.DataFrame({"x": x, "y": y})

    out = df.withColumn("_xy", tf(F.col(lon_col), F.col(lat_col)))
    return (
        out.withColumn(x_out, F.col("_xy.x"))
        .withColumn(y_out, F.col("_xy.y"))
        .drop("_xy")
    )
