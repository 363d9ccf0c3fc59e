"""Optional geospatial-format area readers (SURVEY.md §2.1):
CF-NetCDF grid mappings and GeoTIFF transforms → AreaDefinition.

Reference parity: load_cf_area (utils/cf.py:413),
get_area_def_from_raster (utils/rasterio.py:77).

Classic NetCDF (CDF-1/CDF-2/CDF-5) and baseline GeoTIFF parse NATIVELY via
the pure-python readers in :mod:`binary_raster` — no IO library
needed; only NetCDF4/HDF5 and exotic TIFF variants fall back to the
import-gated xarray/rasterio paths. The extent/transform math lives in
:func:`area_from_cf_attrs` / :func:`area_from_geotransform`, shared by
both paths.
"""

from __future__ import annotations

import struct

from pyresample_spark.geometry import AreaDefinition


def area_from_geotransform(
    area_id: str,
    crs: str,
    width: int,
    height: int,
    geotransform: tuple,
) -> AreaDefinition:
    """GDAL-style geotransform (x0, psx, 0, y0, 0, -psy) → area.

    (x0, y0) is the upper-left *corner*; rotation terms must be 0
    (utils/rasterio.py:77-110 supports only axis-aligned transforms)."""
    x0, psx, rot1, y0, rot2, npsy = geotransform
    if rot1 != 0 or rot2 != 0:
        raise ValueError("rotated geotransforms are not supported")
    psy = -npsy
    return AreaDefinition(
        area_id=area_id,
        crs=crs,
        width=width,
        height=height,
        area_extent=(x0, y0 - height * psy, x0 + width * psx, y0),
    )


def area_from_cf_attrs(
    area_id: str,
    crs: str,
    x_coords,
    y_coords,
) -> AreaDefinition:
    """CF 1-D coordinate vectors (pixel centers, evenly spaced) → area
    (the core translation inside load_cf_area, utils/cf.py:413-880)."""
    if len(x_coords) < 2 or len(y_coords) < 2:
        raise ValueError("need at least 2 coordinates per axis")
    psx = x_coords[1] - x_coords[0]
    psy = abs(y_coords[1] - y_coords[0])
    y_desc = y_coords[1] < y_coords[0]
    top = y_coords[0] if y_desc else y_coords[-1]
    bottom = y_coords[-1] if y_desc else y_coords[0]
    return AreaDefinition(
        area_id=area_id,
        crs=crs,
        width=len(x_coords),
        height=len(y_coords),
        area_extent=(
            x_coords[0] - psx / 2.0,
            bottom - psy / 2.0,
            x_coords[-1] + psx / 2.0,
            top + psy / 2.0,
        ),
    )


def load_cf_area(path: str, variable: str | None = None):
    """Read a CF-compliant NetCDF grid mapping → AreaDefinition
    (load_cf_area, utils/cf.py:413).

    Classic NetCDF (CDF-1/CDF-2/CDF-5) and netCDF4-classic-model HDF5 files
    (superblock v0, v1 headers, contiguous/chunked+deflate layouts —
    the netcdf-c defaults) parse with the built-in pure-python readers
    (sources/binary_raster.py, sources/hdf5.py) — no IO library
    needed. HDF5 structures outside that subset fall back to xarray
    when installed."""
    native_err = None
    with open(path, "rb") as f:
        head = f.read(8)
        if head[:3] == b"CDF":
            buf = head + f.read()
            from pyresample_spark.sources.binary_raster import (
                load_cf_area_nc3,
            )

            area, _ = load_cf_area_nc3(buf, variable)
            return area
        from pyresample_spark.sources.hdf5 import HDF5_MAGIC

        if head == HDF5_MAGIC:
            buf = head + f.read()
            from pyresample_spark.sources.hdf5 import load_cf_area_h5

            import zlib

            try:
                area, _ = load_cf_area_h5(buf, variable)
                return area
            except (ValueError, NotImplementedError, struct.error,
                    IndexError, KeyError, zlib.error,
                    UnicodeDecodeError) as e:
                native_err = e  # outside the native subset → xarray
    try:  # pragma: no cover - optional dependency
        import xarray as xr  # noqa: F401
    except ImportError as e:
        detail = f" (native HDF5 reader: {native_err})" if native_err else ""
        raise NotImplementedError(
            "this NetCDF4/HDF5 file needs xarray/netCDF4 (classic "
            "CDF-1/2 and netcdf-c-default HDF5 parse natively)"
            + detail + "; install them on the cluster"
        ) from e
    ds = xr.open_dataset(path)  # pragma: no cover
    var = ds[variable] if variable else next(iter(ds.data_vars.values()))
    # CF: grid_mapping names a container VARIABLE whose attrs carry the
    # projection — resolve it like the native nc3 path does; a bare
    # value that is not a variable is used as the CRS string directly
    gm = var.attrs.get("grid_mapping")
    crs = "longlat"
    if gm and gm in ds.variables:
        from pyresample_spark.sources.cf_gm import resolve_cf_crs

        crs = resolve_cf_crs(dict(ds[gm].attrs))
    elif gm:
        crs = str(gm)
    ydim, xdim = var.dims[-2], var.dims[-1]
    return area_from_cf_attrs(
        variable or var.name,
        crs,
        ds[xdim].values.tolist(),
        ds[ydim].values.tolist(),
    )


def get_area_def_from_raster(path: str):
    """GeoTIFF → AreaDefinition (get_area_def_from_raster,
    utils/rasterio.py:77).

    Classic baseline TIFFs parse with the built-in pure-python reader
    (sources/binary_raster.py); anything it rejects (JPEG
    compression, unmapped EPSG codes, rotated transforms) falls back
    to rasterio when installed."""
    with open(path, "rb") as f:
        buf = f.read()
    try:
        from pyresample_spark.sources.binary_raster import area_from_geotiff

        return area_from_geotiff(buf, area_id=path)
    # truncated/odd files can surface as struct/index errors from the
    # byte walker, not just the parser's own ValueErrors — ALL native
    # rejections must reach the rasterio fallback
    except (ValueError, KeyError, IndexError, struct.error) as native_err:
        try:  # pragma: no cover - optional dependency
            import rasterio  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                f"native TIFF parser rejected the file ({native_err}); "
                "the rasterio fallback is not installed"
            ) from e
    with rasterio.open(path) as src:  # pragma: no cover
        t = src.transform
        return area_from_geotransform(
            path, str(src.crs), src.width, src.height,
            (t.c, t.a, t.b, t.f, t.d, t.e),
        )
