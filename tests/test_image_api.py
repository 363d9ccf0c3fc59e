"""Fluent GeoImage facade: every registered resample method runs
end-to-end on a small swath (ImageContainer analog, image.py:29-299)."""

import pytest
from pyspark.sql import functions as F

from pyresample_spark.geometry import AreaDefinition
from pyresample_spark.image import GeoImage

AREA = AreaDefinition("t", "longlat", 20, 20, (-10.0, -10.0, 10.0, 10.0))


@pytest.fixture(scope="module")
def swath(spark):
    rows = [
        (float(-9.5 + i), float(-9.5 + j), float(i * 20 + j))
        for i in range(20)
        for j in range(20)
    ]
    return GeoImage.from_swath(
        spark.createDataFrame(rows, "lon double, lat double, value double")
    )


@pytest.mark.parametrize("method", ["bucket_avg", "nearest", "gauss", "ewa", "bilinear"])
def test_resample_methods(swath, method):
    kw = {"radius_m": 200_000.0} if method in ("nearest", "gauss", "bilinear") else {}
    out = swath.resample(AREA, method=method, **kw)
    rows = out.df.collect()
    assert len(rows) > 0
    assert out.area == AREA
    vals = [r.value for r in rows if r.value is not None]
    assert all(-1.0 <= v <= 400.0 for v in vals)


def test_noop_elimination(spark, swath):
    img = GeoImage.from_area(AREA.grid(spark), AREA)
    assert img.resample(AREA) is img


def test_unknown_method(swath):
    with pytest.raises(KeyError):
        swath.resample(AREA, method="nope")
