"""Measured scale evidence for the NTv2 grid-shift regrid (PERF.md
datum for q_regrid_nad27 / q_regrid_to_nad27).

Two axes:
1. TARGET growth — the q_regrid_nad27 plan (polar inverse → 3
   fixed-point bilinear lookups, each a broadcast hash join → Clarke
   1866 lcc forward → equi-join gather) over a 64×-growing WGS84
   target against the fixed NAD27 source. Expectation: output-linear,
   no data-proportional shuffle.
2. GRID growth — the same fixed target probed through synthetic
   NTv2 grids densified up to ~641k nodes (the real NOAA conus file
   is ~1.2M). The grid is the BROADCAST side of every lookup, so the
   probe wall should stay ~flat while the cell table grows 1600×
   (only the broadcast build grows, bounded by grid bytes).

Run: python tools/scale_probe_gridshift.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sink(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from pyresample_spark.geometry import AreaDefinition
    from pyresample_spark.operators import gridshift as GS
    from pyresample_spark.operators.crs import regrid_nearest
    from pyresample_spark.operators.resample_grid import synth_image
    from pyresample_spark.queries.resample import _NAD27_SRC, _NAD27_TGT
    from pyresample_spark.session import get_spark
    from pyresample_spark.sources.ntv2 import demo_ntv2_grid_bytes, parse_ntv2

    spark = get_spark("scale-probe-gridshift")
    spark.range(10).count()
    src_img = synth_image(spark, _NAD27_SRC)

    print("== target growth (fixed 441-node demo grid) ==")
    w0, h0 = _NAD27_TGT.width, _NAD27_TGT.height
    for k in range(4):
        s = 2 ** k
        tgt = AreaDefinition(
            f"probe_tgt_{s}", _NAD27_TGT.crs, w0 * s, h0 * s,
            _NAD27_TGT.area_extent)
        df = regrid_nearest(tgt, _NAD27_SRC, src_img)
        sink(df)  # warm (plan compile + broadcast build)
        t0 = time.time()
        sink(df)
        print(f"target cells {w0 * s * h0 * s:>8}  wall {time.time() - t0:.2f} s")

    print("== grid growth (fixed 268k-cell target) ==")
    tgt = AreaDefinition("probe_tgt_8", _NAD27_TGT.crs, w0 * 8, h0 * 8,
                         _NAD27_TGT.area_extent)
    base = parse_ntv2(demo_ntv2_grid_bytes())["subgrids"][0]
    t = tgt.grid(spark)
    from pyresample_spark.operators.crs import inverse
    inv = inverse(tgt.crs)
    lon, lat = inv("cx", "cy")
    pts = t.select("cell_id", lon.alias("lon"), lat.alias("lat"))
    for dens in (1, 10, 40):
        sub = dict(base)
        n = 20 * dens + 1
        sub["lat_inc"] = base["lat_inc"] / dens
        sub["long_inc"] = base["long_inc"] / dens
        sub["nrows"] = sub["ncols"] = n
        u = np.linspace(0.0, 1.0, n)
        uu, vv = np.meshgrid(u, u, indexing="ij")
        sub["lat_shift"] = (0.15 + 0.55 * uu + 0.20 * vv
                            - 0.25 * uu * vv).astype(np.float32)
        sub["lon_shift"] = (1.10 + 0.80 * vv - 0.45 * uu
                            + 0.35 * uu * vv).astype(np.float32)
        tb = time.time()
        cells = GS.cell_df(spark, sub)
        build = time.time() - tb
        df = GS.shift_inverse(pts, cells, sub)
        sink(df)  # warm
        t0 = time.time()
        sink(df)
        ncells = (n - 1) * (n - 1)
        print(f"grid cells {ncells:>7}  build {build:.2f} s  "
              f"probe wall {time.time() - t0:.2f} s")


if __name__ == "__main__":
    main()
