"""Measured granule-ingest throughput (PERF.md evidence for the
binaryFile + mapInPandas decode path, sources/binary_raster.py).

Generates N classic-NetCDF granules of H×W float64 pixels in a temp
dir (pure-python writer), then times the distributed decode at
several N: wall-clock should scale with N/parallelism (one file per
task), and per-file time should stay flat — the property that makes
a 100 TB granule feed a directory listing plus one scan.

Run: python tools/scale_probe_raster.py [N ...]   (default 4 16 64)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 256, 512  # 1 MiB of float64 pixels per granule


def make_granules(n: int, fmt: str = "nc3") -> str:
    from pyresample_spark.sources.binary_raster import netcdf3_bytes
    from pyresample_spark.sources.hdf5 import hdf5_grid_bytes

    d = tempfile.mkdtemp(prefix="pyresample_spark_probe_granules_")
    xs = np.arange(W) + 0.5
    for i in range(n):
        ys = -(np.arange(H) + 0.5) - i * H
        rows = np.arange(H)[:, None] + i * H
        cols = np.arange(W)[None, :]
        data = ((rows * 31 + cols * 17) % 97 + 0.5).astype(float)
        if fmt in ("szip", "scaleoffset", "nbit", "zstd"):
            # the r15/r16 filters: uint16 NN-szip (the NASA L1B
            # shape, sequential Rice decode) vs float64 D-scaled
            # scale-offset vs 12-of-16-bit nbit (both vectorized
            # decodes) — same ingest plan
            band = (np.round(data / 4.0, 2).astype("<f8")
                    if fmt == "scaleoffset" else data.astype("<u2"))
            buf = hdf5_grid_bytes(
                {
                    "x": (xs.astype(float), {"CLASS": "DIMENSION_SCALE"}),
                    "y": (ys.astype(float), {"CLASS": "DIMENSION_SCALE"}),
                    "crs": (None, {"proj4": "eqc"}),
                    "band": (band, {"grid_mapping": "crs"}),
                },
                chunks={"band": (64, 128)},
                deflate=False,
                szip={"ppb": 16, "option": "nn"} if fmt == "szip"
                else None,
                zstd=fmt == "zstd",
                scaleoffset={"factor": 2} if fmt == "scaleoffset"
                else None,
                nbit={"precision": 12} if fmt == "nbit" else None,
            )
        elif fmt in ("hdf5", "hdf5_fa"):
            buf = hdf5_grid_bytes(
                {
                    "x": (xs.astype(float), {"CLASS": "DIMENSION_SCALE"}),
                    "y": (ys.astype(float), {"CLASS": "DIMENSION_SCALE"}),
                    "crs": (None, {"proj4": "eqc"}),
                    "band": (data.astype("<f8"),
                             {"grid_mapping": "crs"}),
                },
                chunks={"band": (64, 128)},  # netcdf-c-style deflate
                # hdf5_fa: the libver=latest container (v2 superblock,
                # v4 layout, Fixed Array index) instead of v0+v1-btree
                superblock=2 if fmt == "hdf5_fa" else 0,
                chunk_index="fixed_array" if fmt == "hdf5_fa"
                else "btree1",
            )
        elif fmt in ("jpeg", "jpeg_progressive", "jpeg_arith",
                     "jpeg_arith_progressive"):
            # uint8 tag-7 JPEG strips (baseline vs progressive SOF2,
            # r17): the per-bit entropy walk is the per-core cost
            # center — measure its per-file amortization and the
            # progressive multi-scan overhead at granule scale
            from pyresample_spark.sources.binary_raster import (
                geotiff_bytes,
            )

            buf = geotiff_bytes(
                (data % 251).astype("u1"), 1.0, 1.0, 0.0,
                float(-i * H), compress=fmt, rows_per_strip=64,
            )
        elif fmt in ("tiff_pred3", "tiff_plain"):
            # float32 DEFLATE, with/without floating-point predictor 3
            # — the byte-plane transform adds a per-row numpy pass on
            # decode; measure what it costs against plain DEFLATE
            from pyresample_spark.sources.binary_raster import (
                geotiff_bytes,
            )

            buf = geotiff_bytes(
                data.astype("f4"), 1.0, 1.0, 0.0, float(-i * H),
                compress=True,
                predictor=3 if fmt == "tiff_pred3" else 1,
            )
        elif fmt == "cog":
            # cloud-optimized layout: full-res + 3 chained overview
            # IFDs (2x/4x/8x NEAREST); the read-path probe compares
            # decoding IFD 0 vs the auto-selected coarse level
            from pyresample_spark.sources.binary_raster import (
                geotiff_bytes,
            )

            buf = geotiff_bytes(
                data.astype("f4"), 1.0, 1.0, 0.0, float(-i * H),
                compress=True, overviews=3,
            )
        elif fmt in ("mbtiff", "mbtiff_planar"):
            # multiband (SamplesPerPixel=3) float32 DEFLATE GeoTIFF,
            # chunky or planar interleave — the geotiff_multiband
            # distributed-ingest path
            from pyresample_spark.sources.binary_raster import (
                _demo_multiband_tiff_bytes,
            )

            chans = np.arange(3)[:, None, None]
            data3 = ((rows[None] * 31 + cols[None] * 17 + chans * 7)
                     % 97).astype("f4") + 0.5
            buf = _demo_multiband_tiff_bytes(
                data3, 1.0, 1.0, 0.0, float(-i * H), compress=True,
                planar=2 if fmt == "mbtiff_planar" else 1,
            )
        else:
            buf = netcdf3_bytes(
                [("y", H), ("x", W)],
                [
                    ("x", ["x"], {}, xs.astype(float)),
                    ("y", ["y"], {}, ys.astype(float)),
                    ("crs", [], {"proj4": "eqc"}, None),
                    ("band", ["y", "x"], {"grid_mapping": "crs"}, data),
                ],
            )
        ext = ("tif" if fmt in ("mbtiff", "mbtiff_planar", "tiff_pred3",
                                "tiff_plain", "cog", "jpeg",
                                "jpeg_progressive", "jpeg_arith",
                                "jpeg_arith_progressive")
               else "nc")
        with open(os.path.join(d, f"g{i:04d}.{ext}"), "wb") as f:
            f.write(buf)
    return d


def main():
    ns = [int(a) for a in sys.argv[1:]] or [4, 16, 64]
    from pyspark.sql import functions as F

    from pyresample_spark.session import get_spark
    from pyresample_spark.sources.binary_raster import read_raster_pixels

    spark = get_spark("scale-probe-raster")
    spark.range(10).count()
    fmt = os.environ.get("SPARK_GRAFT_PROBE_FMT", "nc3")
    if fmt == "cog":
        return cog_main(ns)
    multi = fmt in ("mbtiff", "mbtiff_planar")
    tiff1 = fmt in ("tiff_pred3", "tiff_plain", "jpeg",
                    "jpeg_progressive", "jpeg_arith",
                    "jpeg_arith_progressive")
    ingest_fmt = ("geotiff_multiband" if multi
                  else "geotiff" if tiff1 else "netcdf3")
    px_per_file = (3 if multi else 1) * H * W
    bytes_per_px = (4 if (multi or fmt in ("tiff_pred3", "tiff_plain"))
                    else 1 if fmt in ("jpeg", "jpeg_progressive",
                                      "jpeg_arith",
                                      "jpeg_arith_progressive")
                    else 2 if fmt in ("szip", "nbit", "zstd") else 8)
    for n in ns:
        d = make_granules(n, fmt)
        try:
            glob_pat = "*.tif" if (multi or tiff1) else "*.nc"
            px = read_raster_pixels(spark, os.path.join(d, glob_pat),
                                    ingest_fmt)
            agg = px.groupBy("file").agg(
                F.count(F.lit(1)).alias("c"),
                F.sum(F.floor(F.col("value") * 1e6 + F.lit(0.5))
                      .cast("bigint")).alias("s"),
            )
            t0 = time.time()
            rows = agg.collect()
            dt = time.time() - t0
            assert len(rows) == n and all(
                r["c"] == px_per_file for r in rows)
            mb = n * px_per_file * bytes_per_px / 1e6
            print(
                f"fmt={fmt} N={n:3d} files "
                f"pixels={n * px_per_file / 1e6:.1f}M "
                f"wall={dt:.2f}s {mb / dt:.0f} MB/s "
                f"per_file={dt / n * 1000:.0f} ms"
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)


def cog_main(ns):
    """COG overview read-path probe: the same granule set ingested at
    full resolution vs auto-selected overview (target 8x coarser than
    the source). The overview read decodes ~64x fewer pixels; at
    100 TB that is the difference between scanning the archive and
    scanning ~1.6 TB of overview bytes for a coarse regrid."""
    from pyspark.sql import functions as F

    from pyresample_spark.session import get_spark
    from pyresample_spark.sources.binary_raster import read_raster_pixels

    spark = get_spark("scale-probe-cog")
    spark.range(10).count()
    for n in ns:
        d = make_granules(n, "cog")
        try:
            pat = os.path.join(d, "*.tif")
            fsz = sum(os.path.getsize(os.path.join(d, f))
                      for f in os.listdir(d))
            for label, kw in (
                ("full-res", {}),
                ("overview", {"target_resolution": 8.0}),
            ):
                px = read_raster_pixels(spark, pat, "geotiff", **kw)
                agg = px.groupBy("file").agg(
                    F.count(F.lit(1)).alias("c"))
                t0 = time.time()
                rows = agg.collect()
                dt = time.time() - t0
                npx = sum(r["c"] for r in rows)
                print(
                    f"fmt=cog N={n:3d} {label:9s} "
                    f"pixels={npx / 1e6:.2f}M wall={dt:.2f}s "
                    f"file_bytes={fsz / 1e6:.1f}MB "
                    f"per_file={dt / n * 1000:.0f} ms"
                )
        finally:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
