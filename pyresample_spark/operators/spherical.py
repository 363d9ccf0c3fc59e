"""Spherical polygon algebra for plan-time geometry decisions
(SURVEY.md §2.7): polygon area, point containment, overlap fraction.

Reference parity: SphPolygon area/union/intersection
(spherical.py:519-717), overlap predicates (geometry.py:527-620).
These run at **plan build time** on boundary vertices (tens of points)
— never in the bulk data path — so plain Python is the right tool; the
implementations below use the standard published formulas (L'Huilier
spherical excess; great-circle arc intersection), not the reference's
code.
"""

from __future__ import annotations

import math


def _to_xyz(lon_deg: float, lat_deg: float) -> tuple:
    lon, lat = math.radians(lon_deg), math.radians(lat_deg)
    cl = math.cos(lat)
    return (cl * math.cos(lon), cl * math.sin(lon), math.sin(lat))


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _norm(a):
    return math.sqrt(_dot(a, a))


def _angdist(a, b) -> float:
    """Great-circle angle between two unit vectors."""
    return math.atan2(_norm(_cross(a, b)), _dot(a, b))


def spherical_polygon_area(vertices_lonlat, radius: float = 1.0) -> float:
    """Area of a simple spherical polygon (steradians × R²) via
    triangulation from the first vertex + L'Huilier's theorem."""
    if len(vertices_lonlat) < 3:
        return 0.0
    pts = [_to_xyz(lo, la) for lo, la in vertices_lonlat]
    total = 0.0
    for i in range(1, len(pts) - 1):
        a, b, c = pts[0], pts[i], pts[i + 1]
        # L'Huilier: tan(E/4)² = tan(s/2)tan((s-a)/2)tan((s-b)/2)tan((s-c)/2)
        la = _angdist(b, c)
        lb = _angdist(a, c)
        lc = _angdist(a, b)
        s = (la + lb + lc) / 2.0
        t = (
            math.tan(s / 2.0)
            * math.tan((s - la) / 2.0)
            * math.tan((s - lb) / 2.0)
            * math.tan((s - lc) / 2.0)
        )
        excess = 4.0 * math.atan(math.sqrt(max(0.0, t)))
        # signed by orientation of the triangle (normal vs centroid)
        n = _cross(
            (b[0] - a[0], b[1] - a[1], b[2] - a[2]),
            (c[0] - a[0], c[1] - a[1], c[2] - a[2]),
        )
        centroid = (
            (a[0] + b[0] + c[0]) / 3.0,
            (a[1] + b[1] + c[1]) / 3.0,
            (a[2] + b[2] + c[2]) / 3.0,
        )
        sign = 1.0 if _dot(n, centroid) >= 0 else -1.0
        total += sign * excess
    return abs(total) * radius * radius


def point_in_spherical_polygon(lon, lat, vertices_lonlat) -> bool:
    """Winding-number containment: sum of signed angles subtended at the
    point by each polygon edge ≈ ±2π inside, ≈ 0 outside
    (the reference's data_reduce classification idiom,
    data_reduce.py:224-253, re-derived from the standard formula)."""
    p = _to_xyz(lon, lat)
    total = 0.0
    n = len(vertices_lonlat)
    for i in range(n):
        a = _to_xyz(*vertices_lonlat[i])
        b = _to_xyz(*vertices_lonlat[(i + 1) % n])
        # project edge endpoints into the tangent plane at p
        ta = (a[0] - p[0] * _dot(a, p), a[1] - p[1] * _dot(a, p), a[2] - p[2] * _dot(a, p))
        tb = (b[0] - p[0] * _dot(b, p), b[1] - p[1] * _dot(b, p), b[2] - p[2] * _dot(b, p))
        na, nb = _norm(ta), _norm(tb)
        if na == 0.0 or nb == 0.0:
            return True  # on a vertex
        cosang = max(-1.0, min(1.0, _dot(ta, tb) / (na * nb)))
        ang = math.acos(cosang)
        sign = 1.0 if _dot(_cross(ta, tb), p) >= 0 else -1.0
        total += sign * ang
    return abs(total) > math.pi  # ≈ 2π inside, ≈ 0 outside


def arcs_intersect(a1, a2, b1, b2) -> bool:
    """Do great-circle arcs (a1→a2) and (b1→b2) intersect?
    (Arc.intersections, spherical.py:429-458, from first principles:
    the candidate intersection is ±(nA × nB); check it lies on both.)"""
    pa1, pa2 = _to_xyz(*a1), _to_xyz(*a2)
    pb1, pb2 = _to_xyz(*b1), _to_xyz(*b2)
    na = _cross(pa1, pa2)
    nb = _cross(pb1, pb2)
    x = _cross(na, nb)
    nx = _norm(x)
    if nx == 0.0:
        return False  # coplanar arcs
    x = (x[0] / nx, x[1] / nx, x[2] / nx)
    for cand in (x, (-x[0], -x[1], -x[2])):
        if _on_arc(cand, pa1, pa2) and _on_arc(cand, pb1, pb2):
            return True
    return False


def _on_arc(p, a, b, eps: float = 1e-12) -> bool:
    return (
        _angdist(a, p) + _angdist(p, b) <= _angdist(a, b) + eps
    )


def polygons_overlap(verts_a, verts_b) -> bool:
    """Overlap test (geometry.py:540-588 analog): any vertex of one
    inside the other, or any pair of edges intersecting."""
    if any(point_in_spherical_polygon(lo, la, verts_b) for lo, la in verts_a):
        return True
    if any(point_in_spherical_polygon(lo, la, verts_a) for lo, la in verts_b):
        return True
    na, nb = len(verts_a), len(verts_b)
    for i in range(na):
        for j in range(nb):
            if arcs_intersect(
                verts_a[i],
                verts_a[(i + 1) % na],
                verts_b[j],
                verts_b[(j + 1) % nb],
            ):
                return True
    return False


def area_boundary_vertices(area, points_per_side: int = 10) -> list:
    """Boundary polygon of a longlat area (get_bbox_lonlats,
    geometry.py:293 analog): clockwise corner walk with densified sides."""
    llx, lly, urx, ury = area.area_extent
    out = []
    for (x0, y0), (x1, y1) in (
        ((llx, ury), (urx, ury)),
        ((urx, ury), (urx, lly)),
        ((urx, lly), (llx, lly)),
        ((llx, lly), (llx, ury)),
    ):
        for i in range(points_per_side):
            f = i / points_per_side
            out.append((x0 + f * (x1 - x0), y0 + f * (y1 - y0)))
    return out


def overlap_rate(area_a, area_b) -> float:
    """Fraction of area_b covered by area_a (geometry.py:605-620
    analog) — longlat rectangles: exact spherical band integral."""
    ax0, ay0, ax1, ay1 = area_a.area_extent
    bx0, by0, bx1, by1 = area_b.area_extent
    ix0, ix1 = max(ax0, bx0), min(ax1, bx1)
    iy0, iy1 = max(ay0, by0), min(ay1, by1)
    if ix0 >= ix1 or iy0 >= iy1:
        return 0.0

    def band(x0, y0, x1, y1):
        return (
            math.radians(x1 - x0)
            * (math.sin(math.radians(y1)) - math.sin(math.radians(y0)))
        )

    return band(ix0, iy0, ix1, iy1) / band(bx0, by0, bx1, by1)
