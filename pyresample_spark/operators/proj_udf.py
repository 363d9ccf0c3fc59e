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
) -> DataFrame:
    """Add projected (x, y) columns for the given CRS."""
    crs_key = crs.replace("+proj=", "").split()[0] if crs else "longlat"
    if crs_key == "longlat":
        return df.withColumn(x_out, F.col(lon_col).cast("double")).withColumn(
            y_out, F.col(lat_col).cast("double")
        )
    if crs_key == "eqc":
        return df.withColumn(
            x_out, F.radians(F.col(lon_col)) * R_EARTH
        ).withColumn(y_out, F.radians(F.col(lat_col)) * R_EARTH)
    if not HAS_PYPROJ:
        raise NotImplementedError(
            f"CRS {crs!r} needs pyproj (not installed); analytic CRSs "
            f"available without it: {ANALYTIC_CRS}"
        )
    return _proj_udf_columns(df, crs, lon_col, lat_col, x_out, y_out)


def _proj_udf_columns(df, crs, lon_col, lat_col, x_out, y_out):  # pragma: no cover
    """Arrow-batched pyproj transform (requires pyproj)."""
    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("x", T.DoubleType()),
                T.StructField("y", T.DoubleType()),
            ]
        )
    )
    def tf(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        import pyproj

        transformer = pyproj.Transformer.from_crs(
            "EPSG:4326", crs, always_xy=True
        )
        x, y = transformer.transform(lon.to_numpy(), lat.to_numpy())
        return pd.DataFrame({"x": x, "y": y})

    out = df.withColumn("_xy", tf(F.col(lon_col), F.col(lat_col)))
    return (
        out.withColumn(x_out, F.col("_xy.x"))
        .withColumn(y_out, F.col("_xy.y"))
        .drop("_xy")
    )
