"""Geometry struct tests (golden-value style, mirroring the reference's
test_geometry suite shapes)."""

import math

import pytest

from pyresample_spark.geometry import (
    AreaDefinition,
    DynamicAreaDefinition,
    StackedAreaDefinition,
    enclose_areas,
)

AREA = AreaDefinition("t", "longlat", 85, 80, (-20.0, 20.0, 20.0, 35.0))


def test_pixel_sizes():
    assert AREA.pixel_size_x == pytest.approx(40.0 / 85)
    assert AREA.pixel_size_y == pytest.approx(15.0 / 80)
    assert AREA.size == 6800
    assert AREA.shape == (80, 85)


def test_grid_generation(spark):
    g = AREA.grid(spark)
    assert g.count() == 6800
    first = g.orderBy("cell_id").first()
    assert first["row"] == 0 and first["col"] == 0
    assert first["cx"] == pytest.approx(-20.0 + 0.5 * 40.0 / 85)
    assert first["cy"] == pytest.approx(35.0 - 0.5 * 15.0 / 80)


def test_slicing():
    sub = AREA[10:20, 5:15]
    assert sub.height == 10 and sub.width == 10
    assert sub.area_extent[0] == pytest.approx(-20.0 + 5 * AREA.pixel_size_x)
    assert sub.area_extent[3] == pytest.approx(35.0 - 10 * AREA.pixel_size_y)


def test_geometry_hash_stable():
    a = AreaDefinition("x", "longlat", 85, 80, (-20.0, 20.0, 20.0, 35.0))
    assert a.geometry_hash() == AREA.geometry_hash()
    b = AreaDefinition("x", "longlat", 85, 80, (-20.0, 20.0, 20.0, 36.0))
    assert b.geometry_hash() != AREA.geometry_hash()


def test_dynamic_freeze(spark):
    pts = spark.createDataFrame(
        [(0.0, 0.0), (10.0, 5.0), (-3.0, 8.0)], "x double, y double"
    )
    dyn = DynamicAreaDefinition("d", "longlat", resolution=(1.0, 1.0))
    frozen = dyn.freeze(pts)
    assert frozen.area_extent == (-3.0, 0.0, 10.0, 8.0)
    assert frozen.width == 13 and frozen.height == 8


def test_stacked_append_merges_adjacent(spark):
    top = AreaDefinition("a", "longlat", 85, 40, (-20.0, 27.5, 20.0, 35.0))
    bottom = AreaDefinition("b", "longlat", 85, 40, (-20.0, 20.0, 20.0, 27.5))
    stacked = StackedAreaDefinition("s", (top,)).append(bottom)
    assert len(stacked.defs) == 1  # adjacent → merged
    merged = stacked.squeeze()
    assert merged.height == 80
    assert merged.area_extent == (-20.0, 20.0, 20.0, 35.0)
    assert stacked.grid(spark).count() == 6800


def test_enclose_areas():
    other = AreaDefinition("o", "longlat", 10, 10, (-30.0, 10.0, -25.0, 15.0))
    enc = enclose_areas(AREA, other)
    assert enc.area_extent == (-30.0, 10.0, 20.0, 35.0)
    assert enc.width == round(50.0 / AREA.pixel_size_x)
