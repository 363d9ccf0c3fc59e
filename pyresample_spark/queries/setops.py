"""Set-operation queries (SURVEY.md §2.7): geometry concat/union,
enclose_areas bounds algebra."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyresample_spark.queries import register, rnd, table
from pyresample_spark.queries.core import TEST_AREA
from pyresample_spark.queries.filters import REDUCE_AREA
from pyresample_spark.queries.geo_scalar import PTS_SQL


@register(
    "q_union_swaths",
    oracle=f"""
    WITH pts AS ({PTS_SQL})
    SELECT event_id, 0 AS part, lon, lat FROM pts WHERE event_id % 2 = 0
    UNION ALL
    SELECT event_id, 1 AS part, lon + 5.0 AS lon, lat FROM pts WHERE event_id % 2 = 1
    """,
)
def q_union_swaths(spark, sf_dir):
    """Swath concatenation (geometry.py:672-691, StackedAreaDefinition
    append geometry.py:2948): unionByName of point frames — plan-level
    concat, no shuffle."""
    from pyresample_spark.queries.geo_scalar import _pts

    pts = _pts(spark, sf_dir)
    a = pts.filter(F.col("event_id") % 2 == 0).select(
        "event_id", F.lit(0).alias("part"), "lon", "lat"
    )
    b = pts.filter(F.col("event_id") % 2 == 1).select(
        "event_id",
        F.lit(1).alias("part"),
        (F.col("lon") + 5.0).alias("lon"),
        "lat",
    )
    return a.unionByName(b)


def _corners_sql(area, tag):
    llx, lly, urx, ury = area.area_extent
    return (
        f"SELECT '{tag}' AS area_id, {llx!r} AS x, {lly!r} AS y "
        f"UNION ALL SELECT '{tag}', {urx!r}, {ury!r}"
    )


@register(
    "q_enclose_areas",
    oracle=f"""
    WITH corners AS (
      {_corners_sql(TEST_AREA, 'test')}
      UNION ALL
      {_corners_sql(REDUCE_AREA, 'reduce')}
    )
    SELECT MIN(x) AS llx, MIN(y) AS lly, MAX(x) AS urx, MAX(y) AS ury,
           CAST(ROUND((MAX(x) - MIN(x)) / {TEST_AREA.pixel_size_x!r}) AS BIGINT) AS width,
           CAST(ROUND((MAX(y) - MIN(y)) / {TEST_AREA.pixel_size_y!r}) AS BIGINT) AS height
    FROM corners
    """,
)
def q_enclose_areas(spark, sf_dir):
    """enclose_areas (geometry.py:3106-3143): union of corner rows →
    min/max agg → enclosing extent + shape at the first area's
    resolution."""
    rows = []
    for tag, area in (("test", TEST_AREA), ("reduce", REDUCE_AREA)):
        llx, lly, urx, ury = area.area_extent
        rows.append((tag, float(llx), float(lly)))
        rows.append((tag, float(urx), float(ury)))
    corners = spark.createDataFrame(rows, "area_id string, x double, y double")
    return corners.agg(
        F.min("x").alias("llx"),
        F.min("y").alias("lly"),
        F.max("x").alias("urx"),
        F.max("y").alias("ury"),
        F.round((F.max("x") - F.min("x")) / TEST_AREA.pixel_size_x, 0)
        .cast("bigint")
        .alias("width"),
        F.round((F.max("y") - F.min("y")) / TEST_AREA.pixel_size_y, 0)
        .cast("bigint")
        .alias("height"),
    )


@register(
    "q_set_ops",
    oracle="""
    WITH buyers AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
    rich AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0)
    SELECT 'both' AS tag, custkey FROM (SELECT custkey FROM buyers INTERSECT SELECT custkey FROM rich)
    UNION ALL
    SELECT 'rich_only' AS tag, custkey FROM (SELECT custkey FROM rich EXCEPT SELECT custkey FROM buyers)
    """,
)
def q_set_ops(spark, sf_dir):
    """Set algebra (INTERSECT / EXCEPT) over key sets — the relational
    face of geometry concat/difference (SURVEY §2.7)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    buyers = o.select(F.col("o_custkey").alias("custkey")).distinct()
    rich = c.filter(F.col("c_acctbal") > 5000.0).select(
        F.col("c_custkey").alias("custkey")
    )
    both = rich.intersect(buyers).select(
        F.lit("both").alias("tag"), "custkey"
    )
    rich_only = rich.exceptAll(buyers).distinct().select(
        F.lit("rich_only").alias("tag"), "custkey"
    )
    return both.unionByName(rich_only)


_BOXES_SQL = f"""
    WITH RECURSIVE pts AS ({PTS_SQL}),
    g AS (
      SELECT user_id % 24 AS box_id,
             CAST(SUM(CAST(ROUND(lon * 1000000) AS BIGINT)) AS DOUBLE)
               / (1000000.0 * COUNT(*)) AS cx,
             CAST(SUM(CAST(ROUND(lat * 1000000) AS BIGINT)) AS DOUBLE)
               / (1000000.0 * COUNT(*)) AS cy
      FROM pts GROUP BY 1
    ),
    centers AS (
      SELECT box_id,
             cx + (box_id % 6) * 17 - 42 AS mx,
             cy + (box_id // 6) * 13 - 19 AS my
      FROM g
    ),
    boxes AS (
      SELECT box_id,
             mx - (3 + box_id % 7) AS x0, mx + (3 + box_id % 7) AS x1,
             my - (2 + box_id % 5) AS y0, my + (2 + box_id % 5) AS y1
      FROM centers
    ),
    edges AS (
      SELECT a.box_id AS src, b.box_id AS dst
      FROM boxes a JOIN boxes b
        ON NOT (a.x1 < b.x0 OR b.x1 < a.x0 OR a.y1 < b.y0 OR b.y1 < a.y0)
    )
"""


@register(
    "q_nonoverlap_unions",
    oracle=_BOXES_SQL
    + """
    , reach(src, dst) AS (
      SELECT box_id, box_id FROM boxes
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT comp, CAST(COUNT(*) AS BIGINT) AS n_members
    FROM (SELECT src, MIN(dst) AS comp FROM reach GROUP BY src)
    GROUP BY comp
    """,
)
def q_nonoverlap_unions(spark, sf_dir):
    """GetNonOverlapUnions (spherical_utils.py:28-131): merge mutually
    overlapping polygons into disjoint groups. Boxes are derived
    deterministically from per-user-group event centroids (integer-sum
    exact so both engines build the identical overlap graph); grouping
    is distributed connected components by min-label propagation
    (operators/components.py) — one shuffle-join + hash-agg per round,
    vs the reference's driver-side pairwise set merging. Oracle = the
    same closure via DuckDB recursive CTE."""
    from pyresample_spark.operators.components import connected_components
    from pyresample_spark.queries.geo_scalar import _pts

    pts = _pts(spark, sf_dir)
    n = F.count(F.lit(1))
    g = pts.groupBy(F.pmod("user_id", F.lit(24)).alias("box_id")).agg(
        (
            F.sum(F.round(F.col("lon") * 1e6, 0).cast("bigint")).cast("double")
            / (1e6 * n)
        ).alias("cx"),
        (
            F.sum(F.round(F.col("lat") * 1e6, 0).cast("bigint")).cast("double")
            / (1e6 * n)
        ).alias("cy"),
    )
    mx = F.col("cx") + F.pmod("box_id", F.lit(6)) * 17 - 42
    my = F.col("cy") + F.expr("box_id div 6") * 13 - 19
    sx = 3 + F.pmod("box_id", F.lit(7))
    sy = 2 + F.pmod("box_id", F.lit(5))
    boxes = g.select(
        "box_id",
        (mx - sx).alias("x0"),
        (mx + sx).alias("x1"),
        (my - sy).alias("y0"),
        (my + sy).alias("y1"),
    )
    a, b = boxes.alias("a"), boxes.alias("b")
    edges = a.join(
        b,
        ~(
            (F.col("a.x1") < F.col("b.x0"))
            | (F.col("b.x1") < F.col("a.x0"))
            | (F.col("a.y1") < F.col("b.y0"))
            | (F.col("b.y1") < F.col("a.y0"))
        ),
    ).select(F.col("a.box_id").alias("src"), F.col("b.box_id").alias("dst"))
    labels = connected_components(edges)
    return labels.groupBy("comp").agg(F.count(F.lit(1)).alias("n_members"))


_SW_W, _SW_H = 50, 20  # swath shape for the boundary query


@register(
    "q_swath_boundary",
    oracle=f"""
    WITH pts AS ({PTS_SQL}),
    sw AS (
      SELECT event_id, lon, lat,
             event_id // {_SW_W} AS y, event_id % {_SW_W} AS x
      FROM pts WHERE event_id < {_SW_W * _SW_H}
    )
    SELECT 1 AS side, x AS seq, lon, lat FROM sw WHERE y = 0
    UNION ALL
    SELECT 2, y, lon, lat FROM sw WHERE x = {_SW_W - 1}
    UNION ALL
    SELECT 3, {_SW_W - 1} - x, lon, lat FROM sw WHERE y = {_SW_H - 1}
    UNION ALL
    SELECT 4, {_SW_H - 1} - y, lon, lat FROM sw WHERE x = 0
    """,
)
def q_swath_boundary(spark, sf_dir):
    """Swath boundary extraction (BaseDefinition.get_bbox_lonlats
    geometry.py:293, side build/reversal geometry.py:341-423): the four
    clockwise sides of a (scanline, pixel)-indexed swath — top row,
    right column, bottom row reversed, left column reversed — each with
    a sequence index. Pure filters + column math on the long-format
    swath; no shuffle until the (tiny) result."""
    from pyresample_spark.queries.geo_scalar import _pts

    sw = (
        _pts(spark, sf_dir)
        .filter(F.col("event_id") < _SW_W * _SW_H)
        .select(
            "event_id", "lon", "lat",
            F.expr(f"event_id div {_SW_W}").alias("y"),
            (F.col("event_id") % _SW_W).alias("x"),
        )
    )
    top = sw.filter(F.col("y") == 0).select(
        F.lit(1).alias("side"), F.col("x").alias("seq"), "lon", "lat"
    )
    right = sw.filter(F.col("x") == _SW_W - 1).select(
        F.lit(2).alias("side"), F.col("y").alias("seq"), "lon", "lat"
    )
    bottom = sw.filter(F.col("y") == _SW_H - 1).select(
        F.lit(3).alias("side"),
        (F.lit(_SW_W - 1) - F.col("x")).alias("seq"),
        "lon",
        "lat",
    )
    left = sw.filter(F.col("x") == 0).select(
        F.lit(4).alias("side"),
        (F.lit(_SW_H - 1) - F.col("y")).alias("seq"),
        "lon",
        "lat",
    )
    return top.unionByName(right).unionByName(bottom).unionByName(left)


# --- q_overlap_rate: spherical polygon containment at scale ----------
# A (south stere) boundary polygon vs B (EASE south laea) grid: the
# VERDICT r1 "missing #3" gap. The boundary polygon + its xyz edge
# literals come from the driver (plan-time geometry, tens of points);
# the per-sample winding-number containment — the part that scales with
# data — is ONE shared SQL text both engines run: 64-edge VALUES table
# × sample points, signed tangent-plane angles summed per point,
# inside ⇔ total < −π (clockwise-interior convention,
# operators/spherical.py point_in_spherical_polygon). The builder also
# cross-checks the Greiner–Hormann intersection-area overlap_rate
# (operators/spherical.py sph_intersection) against the sampled rate.

def _ovr_areas():
    from pyresample_spark.geometry import AreaDefinition

    a = AreaDefinition(
        "ovr_stere", "+proj=stere +lat_0=-90 +lat_ts=-70", 40, 40,
        (1.1e5, 2.3e5, 4.1e6, 3.9e6),
    )
    b = AreaDefinition(
        "ovr_ease", "+proj=laea +lat_0=-90", 60, 60,
        (-3.0e6, -3.0e6, 3.0e6, 3.0e6),
    )
    return a, b


def _ovr_edges_sql() -> str:
    """Boundary polygon of A as an xyz edge VALUES table (driver-side
    plan geometry; literals rounded to 12 dp so both engines parse the
    identical doubles)."""
    import math

    from pyresample_spark.operators.spherical import area_boundary_vertices

    a, _ = _ovr_areas()
    verts = area_boundary_vertices(a, 16)
    xyz = []
    for lon, lat in verts:
        lo, la = math.radians(lon), math.radians(lat)
        xyz.append((
            round(math.cos(la) * math.cos(lo), 12),
            round(math.cos(la) * math.sin(lo), 12),
            round(math.sin(la), 12),
        ))
    rows = []
    for i, p in enumerate(xyz):
        q = xyz[(i + 1) % len(xyz)]
        rows.append(
            f"({p[0]!r}, {p[1]!r}, {p[2]!r}, {q[0]!r}, {q[1]!r}, {q[2]!r})"
        )
    return "(VALUES " + ", ".join(rows) + ") AS e(ax, ay, az, bx, by, bz)"


def _ovr_winding_sql(pts_ref: str) -> str:
    """Shared winding-number SQL: pts_ref must provide
    (cell_id, px, py, pz) unit vectors."""
    return f"""
    WITH tp AS (
      SELECT cell_id, px, py, pz,
             ax - px * (ax*px + ay*py + az*pz) AS tax,
             ay - py * (ax*px + ay*py + az*pz) AS tay,
             az - pz * (ax*px + ay*py + az*pz) AS taz,
             bx - px * (bx*px + by*py + bz*pz) AS tbx,
             by - py * (bx*px + by*py + bz*pz) AS tby,
             bz - pz * (bx*px + by*py + bz*pz) AS tbz
      FROM {pts_ref} CROSS JOIN {_ovr_edges_sql()}
    ),
    ang AS (
      SELECT cell_id,
             CASE WHEN (tay*tbz - taz*tby) * px
                       + (taz*tbx - tax*tbz) * py
                       + (tax*tby - tay*tbx) * pz >= 0.0
                  THEN 1.0 ELSE -1.0 END
             * acos(least(1.0, greatest(-1.0,
                 (tax*tbx + tay*tby + taz*tbz)
                 / (sqrt(tax*tax + tay*tay + taz*taz)
                    * sqrt(tbx*tbx + tby*tby + tbz*tbz))))) AS a
      FROM tp
    )
    SELECT cell_id, (sum(a) < -3.141592653589793) AS inside
    FROM ang GROUP BY cell_id
    """


def _ovr_oracle() -> str:
    from pyresample_spark.queries.resample import _laea_s_inv_sql

    _, b = _ovr_areas()
    lon, lat = _laea_s_inv_sql("cx", "cy")
    return _ovr_winding_sql(f"""(
      SELECT cell_id,
             cos(radians(lat)) * cos(radians(lon)) AS px,
             cos(radians(lat)) * sin(radians(lon)) AS py,
             sin(radians(lat)) AS pz
      FROM (SELECT cell_id, {lon} AS lon, {lat} AS lat
            FROM ({b.grid_sql()}))
    ) p""")


@register("q_overlap_rate", oracle=_ovr_oracle())
def q_overlap_rate(spark, sf_dir):
    """Per-grid-cell spherical containment of the EASE-south grid in a
    stereographic swath boundary polygon (geometry.py:527-620
    overlap/overlap_rate semantics, distributed form): the plan is one
    broadcast-able 64-row edge table × grid cross join + hash agg —
    the 100 TB shape for 'which cells of this grid does that granule
    cover'. Driver cross-check asserts the Greiner–Hormann
    area(∩)/area(B) rate (spherical.py:630-717 parity) agrees with the
    sampled fraction."""
    from pyresample_spark.operators.crs import inverse
    from pyresample_spark.operators.spherical import overlap_rate

    a, b = _ovr_areas()
    inv = inverse(b.crs)
    lon, lat = inv("cx", "cy")
    grid = b.grid(spark).select(
        "cell_id", lon.alias("lon"), lat.alias("lat")
    )
    lo, la = F.radians(F.col("lon")), F.radians(F.col("lat"))
    pts = grid.select(
        "cell_id",
        (F.cos(la) * F.cos(lo)).alias("px"),
        (F.cos(la) * F.sin(lo)).alias("py"),
        F.sin(la).alias("pz"),
    )
    pts.createOrReplaceTempView("ovr_pts")
    out = spark.sql(_ovr_winding_sql("ovr_pts"))

    sampled = out.agg(
        F.avg(F.col("inside").cast("double"))
    ).collect()[0][0]
    gh = overlap_rate(a, b)
    assert abs(gh - sampled) < 0.03, (gh, sampled)
    return out


# --- q_geos_boundary: geostationary valid-pixel boundary -------------

def _geos_sector_area():
    from pyresample_spark.geometry import AreaDefinition

    # a sector extent that CUTS the full disc (upper-right quadrant plus
    # some off-disc margin) so the clip genuinely mixes horizon arcs and
    # extent edges (geometry.py:2811-2830 behavior)
    return AreaDefinition(
        "geos_sector", "+proj=geos +h=35785831 +lon_0=0 +sweep=y",
        width=32, height=32,
        area_extent=(-1.0e6, -2.0e6, 5.6e6, 5.6e6),
    )


def _geos_boundary_rows():
    import math as _m

    from pyresample_spark.operators.geos_boundary import geos_boundary_proj

    poly = geos_boundary_proj(_geos_sector_area(), nb_points=50)
    # round the proj-coord literals so both engines parse identical
    # doubles; 3 dp = millimeters
    return [
        (i, round(x, 3), round(y, 3)) for i, (x, y) in enumerate(poly)
    ]


@register(
    "q_geos_boundary",
    oracle=(lambda rows, lonlat: f"""
    WITH b(idx, bx, by) AS (VALUES {", ".join(f"({i}, {x!r}, {y!r})" for i, x, y in rows)})
    SELECT CAST(idx AS BIGINT) AS idx,
           ROUND({lonlat[0]}, 6) + 0.0 AS lon,
           ROUND({lonlat[1]}, 6) + 0.0 AS lat
    FROM b
    """)(
        _geos_boundary_rows(),
        __import__(
            "pyresample_spark.functions.geo", fromlist=["geos_inv_sql"]
        ).geos_inv_sql("bx", "by", h=35785831.0, lon_0=0.0, sweep="y"),
    ),
)
def q_geos_boundary(spark, sf_dir):
    """Geostationary valid-pixel boundary (geometry.py:627-650,
    2793-2870): the horizon disc polygon in scan-angle space clipped to
    the area extent (driver-side Sutherland–Hodgman replacing shapely,
    operators/geos_boundary.py), inverse-projected to lon/lat as pure
    column math (functions/geo.py geos_inverse). The boundary feeds
    data_reduce/swath-filter plans for full-disc GOES/MSG imagery where
    the horizon — not the extent — bounds validity."""
    from pyresample_spark.functions.geo import geos_inverse
    from pyresample_spark.queries import rnd

    rows = _geos_boundary_rows()
    b = spark.createDataFrame(rows, "idx long, bx double, by double")
    lon, lat = geos_inverse("bx", "by", h=35785831.0, lon_0=0.0, sweep="y")
    return b.select(
        "idx", rnd(lon, 6).alias("lon"), rnd(lat, 6).alias("lat")
    )
