"""Geostationary full-disc boundary — the horizon, not the extent,
bounds validity for geos areas (GOES/MSG full-disc imagery).

Reference parity: get_geostationary_angle_extent (geometry.py:2793),
get_full_geostationary_bounding_box_in_proj_coords (:2833),
get_geostationary_bounding_box_in_proj_coords (:2811 — shapely clip of
the disc polygon against the extent rectangle), and the boundary-sides
dispatch at geometry.py:627-650.

Spark-first split: the boundary polygon itself is plan-time geometry
(≤ ~50 points) computed on the driver — the disc ellipse in scan-angle
space clipped by Sutherland–Hodgman against the (convex) extent
rectangle, replacing shapely. The proj→lon/lat inversion of the
boundary and anything per-pixel (masks, bbox filters) stay column math
(functions/geo.py geos_inverse)."""

from __future__ import annotations

import math

from pyresample_spark.functions.geo import R_EARTH


def geostationary_angle_extent(h: float, radius: float = R_EARTH) -> float:
    """Max earth-viewing scan angle (radians) from orbit height ``h``
    (geometry.py:2793-2808, spherical: x and y extents coincide)."""
    ht = h + radius
    return math.acos(math.sqrt(1.0 - (radius / ht) ** 2))


def full_disc_boundary_proj(h: float, nb_points: int = 50,
                            radius: float = R_EARTH) -> list:
    """Disc-edge polygon in geos projection meters (geometry.py:2833-2851):
    the horizon circle in scan-angle space, shrunk by 1e-4 rad so every
    vertex stays strictly on-disc, scaled by ``h``."""
    ang = geostationary_angle_extent(h, radius)
    out = []
    for i in range(nb_points):
        t = -math.pi + 2.0 * math.pi * i / nb_points
        out.append((
            math.cos(t) * (ang - 1e-4) * h,
            -math.sin(t) * (ang - 1e-4) * h,
        ))
    return out


def clip_polygon_rect(poly: list, rect: tuple) -> list:
    """Sutherland–Hodgman clip of a polygon by an axis-aligned rectangle
    (llx, lly, urx, ury) — exact for a convex clip region, replacing the
    reference's shapely Polygon.intersection (geometry.py:2822-2826)."""
    llx, lly, urx, ury = rect

    def clip_half(pts, inside, intersect):
        out = []
        n = len(pts)
        for i in range(n):
            cur, nxt = pts[i], pts[(i + 1) % n]
            cin, nin = inside(cur), inside(nxt)
            if cin:
                out.append(cur)
                if not nin:
                    out.append(intersect(cur, nxt))
            elif nin:
                out.append(intersect(cur, nxt))
        return out

    def x_cross(a, b, x0):
        t = (x0 - a[0]) / (b[0] - a[0])
        return (x0, a[1] + t * (b[1] - a[1]))

    def y_cross(a, b, y0):
        t = (y0 - a[1]) / (b[1] - a[1])
        return (a[0] + t * (b[0] - a[0]), y0)

    for inside, intersect in (
        (lambda p: p[0] >= llx, lambda a, b: x_cross(a, b, llx)),
        (lambda p: p[0] <= urx, lambda a, b: x_cross(a, b, urx)),
        (lambda p: p[1] >= lly, lambda a, b: y_cross(a, b, lly)),
        (lambda p: p[1] <= ury, lambda a, b: y_cross(a, b, ury)),
    ):
        poly = clip_half(poly, inside, intersect)
        if not poly:
            return []
    return poly


def geos_boundary_proj(area, nb_points: int = 50) -> list:
    """Valid-pixel boundary of a geos area in projection meters
    (geometry.py:2811-2830): full-disc horizon polygon ∩ extent
    rectangle."""
    from pyresample_spark.operators.crs import _family, _params

    if _family(area.crs) != "geos":
        raise ValueError(f"not a geostationary area: {area.crs!r}")
    h = float(_params(area.crs).get("h", "35785831"))
    disc = full_disc_boundary_proj(h, nb_points)
    return clip_polygon_rect(disc, area.area_extent)
