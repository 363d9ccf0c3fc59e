"""Native Helmert datum shift (``+towgs84`` / ``+datum=``) as column math.

The reference delegates every datum transformation to pyproj
(pyresample/utils/proj4.py:108-165 builds the CRS, bucket/__init__.py:165
transforms through it); pyproj in turn hands ``+towgs84`` to PROJ's
Helmert step. This module implements the same 3-/7-parameter geocentric
shift as pure Catalyst column math so a legacy-datum product
(DHDN/Potsdam on Bessel, OSGB36 on Airy, NZGD49 on International...)
can be regridded onto a WGS84 target with no native library:

    geodetic (src ellipsoid, h=0)
      -> geocentric XYZ                       (curvature radius N)
      -> Helmert to WGS84                     (src +towgs84, position
                                               vector sign convention)
      -> Helmert from WGS84                   (dst +towgs84, linearized
                                               inverse: translate back,
                                               transposed rotation,
                                               divide by scale — the
                                               proj.4 geocentric pair)
      -> geodetic (dst ellipsoid)             (Bowring 1976 single-step
                                               closed form)

Conventions (all public):
- ``+towgs84=dx,dy,dz[,rx,ry,rz,s]`` — dx/dy/dz metres, rx/ry/rz
  arc-seconds, s ppm; POSITION VECTOR rotation (EPSG 9606), the
  convention PROJ applies to +towgs84.
- The 7-param inverse is the standard linearized inverse (subtract
  translations, apply the transposed small-angle rotation, divide by
  the scale), not an exact matrix inversion — identical to proj.4's
  ``pj_geocentric_from_wgs84``. Round-trip error is second order in
  the arc-second rotations (sub-millimetre), pinned by the property
  test in tests/test_datum.py.
- Bowring's single-step geocentric->geodetic (theta = atan2(Z*a, p*b);
  phi = atan2(Z + e'^2*b*sin^3 theta, p - e^2*a*cos^3 theta)) is exact
  to < 1e-9 degrees for near-surface points; both engines run the
  SAME formula so the oracle compare is bit-stable.

Expression discipline: the Spark column path builds ONE nested
``let_expr`` chain (functions/exprs.py) — each intermediate (sin phi,
N, X, Y, Z, p, theta...) is bound once as a lambda variable, keeping
the tree LINEAR through CollapseProject instead of multiplicative
(the q_gradient_walk lesson). The DuckDB twin emits the same formulas
as a CTE chain (one stage per let level, same op order) so the two
engines agree to the last ulp.
"""

from __future__ import annotations

import math

from pyresample_spark.functions.exprs import let_expr

# arc-second -> radian
_SEC2RAD = math.pi / 648000.0


def parse_towgs84(text: str) -> tuple:
    """``dx,dy,dz`` or ``dx,dy,dz,rx,ry,rz,s`` -> 7-tuple of floats."""
    vals = tuple(float(v) for v in text.split(","))
    if len(vals) == 3:
        return vals + (0.0, 0.0, 0.0, 0.0)
    if len(vals) == 7:
        return vals
    raise ValueError(
        f"+towgs84 takes 3 or 7 comma-separated values, got {len(vals)}: "
        f"{text!r}"
    )


def _is_identity(tw: tuple | None) -> bool:
    return tw is None or all(v == 0.0 for v in tw)


class DatumSpec:
    """One side of a datum pipeline: ellipsoid (a, b) + optional
    +towgs84 7-tuple (None = datum not pinned)."""

    __slots__ = ("a", "b", "towgs84")

    def __init__(self, a: float, b: float, towgs84: tuple | None):
        self.a, self.b, self.towgs84 = float(a), float(b), towgs84

    @property
    def es(self) -> float:
        return 1.0 - (self.b / self.a) ** 2

    def same_datum(self, other: "DatumSpec") -> bool:
        """True when no geocentric step is needed between the two:
        equal towgs84 sets AND equal ellipsoids (equal shift params on
        different ellipsoids still changes latitude)."""
        tw_a = self.towgs84 or (0.0,) * 7
        tw_b = other.towgs84 or (0.0,) * 7
        return tw_a == tw_b and (self.a, self.b) == (other.a, other.b)


# --------------------------------------------------------------------
# Stage formula emitters: one spec drives BOTH dialects so the op
# order (and therefore IEEE rounding) is engine-identical.
# --------------------------------------------------------------------


def _geocentric_stage(src: DatumSpec, v: str) -> list:
    """(name, expr) bindings computing xg/yg/zg from v.sphi/cphi/slam/
    clam/n (curvature radius bound one level up)."""
    one_m_es = 1.0 - src.es
    return [
        ("xg", f"({v}.n * {v}.cphi * {v}.clam)"),
        ("yg", f"({v}.n * {v}.cphi * {v}.slam)"),
        ("zg", f"({v}.n * {one_m_es!r} * {v}.sphi)"),
    ]


def _helmert_to_wgs84(tw: tuple, x: str, y: str, z: str) -> list:
    """proj.4 pj_geocentric_to_wgs84: X' = m*(X - rz*Y + ry*Z) + dx..."""
    dx, dy, dz, rx, ry, rz, s = tw
    if rx == ry == rz == s == 0.0:
        return [
            ("xw", f"({x} + {dx!r})"),
            ("yw", f"({y} + {dy!r})"),
            ("zw", f"({z} + {dz!r})"),
        ]
    m = 1.0 + s * 1e-6
    rxr, ryr, rzr = rx * _SEC2RAD, ry * _SEC2RAD, rz * _SEC2RAD
    return [
        ("xw", f"({m!r} * ({x} - {rzr!r} * {y} + {ryr!r} * {z}) + {dx!r})"),
        ("yw", f"({m!r} * ({rzr!r} * {x} + {y} - {rxr!r} * {z}) + {dy!r})"),
        ("zw", f"({m!r} * (-({ryr!r}) * {x} + {rxr!r} * {y} + {z}) + {dz!r})"),
    ]


def _helmert_from_wgs84(tw: tuple, x: str, y: str, z: str) -> list:
    """proj.4 pj_geocentric_from_wgs84: translate back, transposed
    rotation, divide by scale. The translated terms xt/yt/zt are
    inlined as SQL strings into a single let level (each appears three
    times in the xd/yd/zd bindings — the text duplication is bounded
    and keeps the let chain one level shorter)."""
    dx, dy, dz, rx, ry, rz, s = tw
    if rx == ry == rz == s == 0.0:
        return [
            ("xd", f"({x} - {dx!r})"),
            ("yd", f"({y} - {dy!r})"),
            ("zd", f"({z} - {dz!r})"),
        ]
    m = 1.0 + s * 1e-6
    rxr, ryr, rzr = rx * _SEC2RAD, ry * _SEC2RAD, rz * _SEC2RAD
    xt, yt, zt = f"({x} - {dx!r})", f"({y} - {dy!r})", f"({z} - {dz!r})"
    return [
        ("xd", f"(({xt} + {rzr!r} * {yt} - {ryr!r} * {zt}) / {m!r})"),
        ("yd", f"((-({rzr!r}) * {xt} + {yt} + {rxr!r} * {zt}) / {m!r})"),
        ("zd", f"(({ryr!r} * {xt} - {rxr!r} * {yt} + {zt}) / {m!r})"),
    ]


def _bowring_lat(dst: DatumSpec, p: str, z: str, sth: str, cth: str) -> str:
    e2 = dst.es
    ep2 = (dst.a ** 2 - dst.b ** 2) / dst.b ** 2
    num = f"({z} + {ep2 * dst.b!r} * {sth} * {sth} * {sth})"
    den = f"({p} - {e2 * dst.a!r} * {cth} * {cth} * {cth})"
    return f"degrees(atan2({num}, {den}))"


# --------------------------------------------------------------------
# Spark column path (nested let_expr, linear tree)
# --------------------------------------------------------------------


def datum_shift_exprs(lon: str, lat: str, src: DatumSpec,
                      dst: DatumSpec) -> tuple:
    """(lon2_sql, lat2_sql) Spark SQL expression strings shifting
    geodetic ``lon``/``lat`` column references (degrees, h=0) from the
    ``src`` datum to the ``dst`` datum. Use with ``F.expr`` /
    ``selectExpr`` after aliasing lon/lat in a Project."""

    def chain(out: str) -> str:
        # innermost-out construction: build the final body for the
        # requested output, then wrap let levels around it.
        # L6/L7 (Bowring) reference xyz-final names xf/yf/zf.
        lat2 = _bowring_lat(dst, "v7.p", "v7.zf", "v7.sth", "v7.cth")
        lon2 = "degrees(atan2(v7.yf, v7.xf))"
        body = lat2 if out == "lat" else lon2
        th = f"atan2(v6.zf * {dst.a!r}, v6.p * {dst.b!r})"
        body = let_expr(
            [("p", "v6.p"), ("zf", "v6.zf"), ("xf", "v6.xf"),
             ("yf", "v6.yf"), ("sth", f"sin({th})"), ("cth", f"cos({th})")],
            "v7", body,
        )
        # choose the Helmert legs actually needed
        x, y, z = "v3.xg", "v3.yg", "v3.zg"
        levels: list = []
        if not _is_identity(src.towgs84):
            levels.append(("v4", _helmert_to_wgs84(src.towgs84, x, y, z)))
            x, y, z = "v4.xw", "v4.yw", "v4.zw"
        if not _is_identity(dst.towgs84):
            var = "v5"
            levels.append((var, _helmert_from_wgs84(dst.towgs84, x, y, z)))
            x, y, z = "v5.xd", "v5.yd", "v5.zd"
        body = let_expr(
            [("p", f"sqrt({x} * {x} + {y} * {y})"),
             ("xf", x), ("yf", y), ("zf", z)],
            "v6", body,
        )
        for var, binds in reversed(levels):
            body = let_expr(binds, var, body)
        body = let_expr(_geocentric_stage(src, "v2"), "v3", body)
        body = let_expr(
            [("sphi", "sin(v1.phi)"), ("cphi", "cos(v1.phi)"),
             ("slam", "sin(v1.lam)"), ("clam", "cos(v1.lam)"),
             ("n", f"({src.a!r} / sqrt(1.0 - {src.es!r}"
                   f" * sin(v1.phi) * sin(v1.phi)))")],
            "v2", body,
        )
        return let_expr(
            [("phi", f"radians({lat})"), ("lam", f"radians({lon})")],
            "v1", body,
        )

    return chain("lon"), chain("lat")


def datum_shift(lon: str, lat: str, src: DatumSpec, dst: DatumSpec) -> tuple:
    """Column pair (lon2, lat2) — F.expr over column NAMES (the callers
    alias lon/lat in the previous Project, keeping substitution
    bounded)."""
    from pyspark.sql import functions as F

    lon2, lat2 = datum_shift_exprs(lon, lat, src, dst)
    return F.expr(lon2), F.expr(lat2)


# --------------------------------------------------------------------
# DuckDB twin (CTE chain, same formulas / op order)
# --------------------------------------------------------------------


def datum_shift_duckdb_ctes(rel_in: str, src: DatumSpec, dst: DatumSpec,
                            prefix: str = "ds") -> tuple:
    """(cte_text, out_relation): CTE bodies reading
    ``rel_in(cell_id, lon, lat)`` and exposing
    ``<prefix>_out(cell_id, lon2, lat2)`` — append ``cte_text`` to the
    oracle's WITH list. Same arithmetic, same order as
    :func:`datum_shift_exprs` so the engines agree bit-for-bit."""
    one_m_es = 1.0 - src.es
    ctes = [
        f"{prefix}_1 AS MATERIALIZED (SELECT cell_id, radians(lat) AS phi,"
        f" radians(lon) AS lam FROM {rel_in})",
        f"{prefix}_2 AS MATERIALIZED (SELECT cell_id, sin(phi) AS sphi, cos(phi) AS cphi,"
        f" sin(lam) AS slam, cos(lam) AS clam,"
        f" ({src.a!r} / sqrt(1.0 - {src.es!r} * sin(phi) * sin(phi))) AS n"
        f" FROM {prefix}_1)",
        f"{prefix}_3 AS MATERIALIZED (SELECT cell_id, (n * cphi * clam) AS xg,"
        f" (n * cphi * slam) AS yg, (n * {one_m_es!r} * sphi) AS zg"
        f" FROM {prefix}_2)",
    ]
    x, y, z, rel = "xg", "yg", "zg", f"{prefix}_3"
    if not _is_identity(src.towgs84):
        binds = _helmert_to_wgs84(src.towgs84, x, y, z)
        cols = ", ".join(f"{e} AS {n}" for n, e in binds)
        ctes.append(f"{prefix}_4 AS MATERIALIZED (SELECT cell_id, {cols} FROM {rel})")
        x, y, z, rel = "xw", "yw", "zw", f"{prefix}_4"
    if not _is_identity(dst.towgs84):
        binds = _helmert_from_wgs84(dst.towgs84, x, y, z)
        cols = ", ".join(f"{e} AS {n}" for n, e in binds)
        ctes.append(f"{prefix}_5 AS MATERIALIZED (SELECT cell_id, {cols} FROM {rel})")
        x, y, z, rel = "xd", "yd", "zd", f"{prefix}_5"
    ctes.append(
        f"{prefix}_6 AS MATERIALIZED (SELECT cell_id, sqrt({x} * {x} + {y} * {y}) AS p,"
        f" {x} AS xf, {y} AS yf, {z} AS zf FROM {rel})"
    )
    th = f"atan2(zf * {dst.a!r}, p * {dst.b!r})"
    ctes.append(
        f"{prefix}_7 AS MATERIALIZED (SELECT cell_id, p, xf, yf, zf,"
        f" sin({th}) AS sth, cos({th}) AS cth FROM {prefix}_6)"
    )
    lat2 = _bowring_lat(dst, "p", "zf", "sth", "cth")
    ctes.append(
        f"{prefix}_out AS MATERIALIZED (SELECT cell_id, degrees(atan2(yf, xf)) AS lon2,"
        f" {lat2} AS lat2 FROM {prefix}_7)"
    )
    return ",\n    ".join(ctes), f"{prefix}_out"


# --------------------------------------------------------------------
# Scalar twin (plan-time geometry + tests)
# --------------------------------------------------------------------


def datum_shift_scalar(lon: float, lat: float, src: DatumSpec,
                       dst: DatumSpec) -> tuple:
    """Driver-side float twin of :func:`datum_shift_exprs` — same
    formulas, for boundary polygons and test oracles."""
    phi, lam = math.radians(lat), math.radians(lon)
    sphi, cphi = math.sin(phi), math.cos(phi)
    n = src.a / math.sqrt(1.0 - src.es * sphi * sphi)
    x = n * cphi * math.cos(lam)
    y = n * cphi * math.sin(lam)
    z = n * (1.0 - src.es) * sphi
    if not _is_identity(src.towgs84):
        dx, dy, dz, rx, ry, rz, s = src.towgs84
        m = 1.0 + s * 1e-6
        rxr, ryr, rzr = rx * _SEC2RAD, ry * _SEC2RAD, rz * _SEC2RAD
        if rx == ry == rz == s == 0.0:
            x, y, z = x + dx, y + dy, z + dz
        else:
            x, y, z = (
                m * (x - rzr * y + ryr * z) + dx,
                m * (rzr * x + y - rxr * z) + dy,
                m * (-ryr * x + rxr * y + z) + dz,
            )
    if not _is_identity(dst.towgs84):
        dx, dy, dz, rx, ry, rz, s = dst.towgs84
        m = 1.0 + s * 1e-6
        rxr, ryr, rzr = rx * _SEC2RAD, ry * _SEC2RAD, rz * _SEC2RAD
        xt, yt, zt = x - dx, y - dy, z - dz
        if rx == ry == rz == s == 0.0:
            x, y, z = xt, yt, zt
        else:
            x, y, z = (
                (xt + rzr * yt - ryr * zt) / m,
                (-rzr * xt + yt + rxr * zt) / m,
                (ryr * xt - rxr * yt + zt) / m,
            )
    p = math.sqrt(x * x + y * y)
    th = math.atan2(z * dst.a, p * dst.b)
    e2 = dst.es
    ep2 = (dst.a ** 2 - dst.b ** 2) / dst.b ** 2
    lat2 = math.degrees(math.atan2(
        z + ep2 * dst.b * math.sin(th) ** 3,
        p - e2 * dst.a * math.cos(th) ** 3,
    ))
    return math.degrees(math.atan2(y, x)), lat2
