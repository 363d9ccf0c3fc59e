"""Irregular-swath bilinear resampling (SURVEY.md §2.4 M6).

Reference parity: pyresample/bilinear/_base.py — 32 knn candidates →
4 bounding corners by quadrant (:316-335, :523), fractional distances
(t, s) from the inverse bilinear mapping (:367-521), interpolation
(:635-642).

Spark-first: candidates come from the cell-bucketed kNN join
(operators/knn.py); corner selection + the (t, s) solve are genuinely
numeric-iterative, so they run in an Arrow-batched ``applyInPandas``
kernel per target group — the engine's designated slow path (SURVEY
§2.11 port rule: dask-chunk callable → pandas UDF). The solve is a
plain 2-D Newton iteration on the bilinear surface (standard published
method), not a port of the reference's quadratic special-casing.

Scale: the expensive part is the kNN join (shuffle on 3-D cells); the
Newton kernel is O(k) per target over Arrow batches. The resulting LUT
(tgt_id, 4 corner ids, t, s) is exactly what LutCache persists — apply
to any number of channels as 4 equi-joins + a weighted-sum expression.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyresample_spark.operators.knn import knn_join

OUT_SCHEMA = (
    "tgt_id long, c00 long, c01 long, c10 long, c11 long, "
    "t double, s double, bilinear_value double"
)


def _solve_ts(corners_xy: np.ndarray, p: np.ndarray, iters: int = 12):
    """Newton solve for (t, s) with P(t,s) = (1-t)(1-s)P00 + t(1-s)P01
    + (1-t)s P10 + t s P11 = p. corners_xy: (4, 2) [P00,P01,P10,P11]."""
    p00, p01, p10, p11 = corners_xy
    t, s = 0.5, 0.5
    for _ in range(iters):
        one_t, one_s = 1.0 - t, 1.0 - s
        cur = one_t * one_s * p00 + t * one_s * p01 + one_t * s * p10 + t * s * p11
        r = cur - p
        dt = one_s * (p01 - p00) + s * (p11 - p10)
        ds = one_t * (p10 - p00) + t * (p11 - p01)
        j = np.array([[dt[0], ds[0]], [dt[1], ds[1]]])
        det = j[0, 0] * j[1, 1] - j[0, 1] * j[1, 0]
        if abs(det) < 1e-14:
            return None
        step = np.linalg.solve(j, r)
        t, s = t - step[0], s - step[1]
    if -0.2 <= t <= 1.2 and -0.2 <= s <= 1.2:
        return float(t), float(s)
    return None


def _per_target(pdf: pd.DataFrame) -> pd.DataFrame:
    tgt_id = pdf["tgt_id"].iloc[0]
    tx, ty = pdf["t_lon"].iloc[0], pdf["t_lat"].iloc[0]
    dlon = pdf["s_lon"].to_numpy() - tx
    dlat = pdf["s_lat"].to_numpy() - ty
    dist = pdf["dist_m"].to_numpy()
    # one corner per quadrant: nearest candidate with the right signs
    quads = {
        "c00": (dlon <= 0) & (dlat <= 0),  # lower-left
        "c01": (dlon > 0) & (dlat <= 0),   # lower-right
        "c10": (dlon <= 0) & (dlat > 0),   # upper-left
        "c11": (dlon > 0) & (dlat > 0),    # upper-right
    }
    idx = {}
    for name, mask in quads.items():
        if not mask.any():
            return pd.DataFrame(columns=pdf.columns[:0])
        cand = np.flatnonzero(mask)
        idx[name] = cand[np.argmin(dist[cand])]
    corners_xy = np.array(
        [
            [pdf["s_lon"].iloc[idx[n]], pdf["s_lat"].iloc[idx[n]]]
            for n in ("c00", "c01", "c10", "c11")
        ]
    )
    ts = _solve_ts(corners_xy, np.array([tx, ty]))
    if ts is None:
        return pd.DataFrame(columns=pdf.columns[:0])
    t, s = ts
    vals = np.array(
        [pdf["value"].iloc[idx[n]] for n in ("c00", "c01", "c10", "c11")]
    )
    v = (
        (1 - t) * (1 - s) * vals[0]
        + t * (1 - s) * vals[1]
        + (1 - t) * s * vals[2]
        + t * s * vals[3]
    )
    return pd.DataFrame(
        {
            "tgt_id": [tgt_id],
            "c00": [pdf["src_id"].iloc[idx["c00"]]],
            "c01": [pdf["src_id"].iloc[idx["c01"]]],
            "c10": [pdf["src_id"].iloc[idx["c10"]]],
            "c11": [pdf["src_id"].iloc[idx["c11"]]],
            "t": [t],
            "s": [s],
            "bilinear_value": [v],
        }
    )


def bilinear_irregular(
    src: DataFrame,
    tgt: DataFrame,
    radius_m: float,
    k: int = 16,
) -> DataFrame:
    """src: (src_id, lon, lat, value); tgt: (tgt_id, lon, lat) →
    (tgt_id, 4 corner ids, t, s, bilinear_value)."""
    pairs = knn_join(src, tgt, radius_m, k=k)
    enriched = (
        pairs.join(
            src.select(
                F.col("src_id"),
                F.col("lon").alias("s_lon"),
                F.col("lat").alias("s_lat"),
                "value",
            ),
            "src_id",
        )
        .join(
            tgt.select(
                F.col("tgt_id"),
                F.col("lon").alias("t_lon"),
                F.col("lat").alias("t_lat"),
            ),
            "tgt_id",
        )
    )
    return enriched.groupBy("tgt_id").applyInPandas(_per_target, OUT_SCHEMA)
