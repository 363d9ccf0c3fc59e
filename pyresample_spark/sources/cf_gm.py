"""CF grid-mapping attributes → engine proj string.

Real CF-compliant products do not carry a ``proj4`` attribute: the
grid-mapping container variable holds ``grid_mapping_name`` plus the
numeric CF parameters (CF Conventions Appendix F — public spec). The
reference turns these into a CRS with pyproj's ``CRS.from_cf``
(pyresample/utils/cf.py); this module is the native twin for the
families the analytic registry implements, shared by the CDF-1/5,
HDF5 and xarray-fallback CF loaders.

Resolution order per loader (back-compat preserved): an explicit
``proj4`` attr wins, then ``crs_wkt`` (passed through), then the
``grid_mapping_name`` translation here, then longlat.

Ellipsoid handling: ``semi_major_axis`` + (``semi_minor_axis`` |
``inverse_flattening``) emit ``+a/+b`` and engage the ellipsoidal
family variants (stere_ell, tmerc_ell, cea_ell, laea_ell_*,
geos_ell). A SPHERICAL ``earth_radius`` (or a == b) other than the
engine default only maps for laea (whose dispatch consumes ``+a`` as
the sphere radius, the EASE-1 convention); for any other family a
non-default sphere radius raises loudly instead of silently
projecting through R_EARTH a few km off.
"""

from __future__ import annotations

from pyresample_spark.functions.geo import R_EARTH


def _plain(v):
    """Normalize reader-specific attr values: numpy scalars/arrays
    (HDF5), lists (NetCDF3), bytes, plain scalars."""
    if hasattr(v, "tolist"):
        v = v.tolist()
    return v


def _num(gma: dict, *names, default=None):
    for n in names:
        if n in gma:
            v = _plain(gma[n])
            if isinstance(v, (list, tuple)):
                v = v[0]
            return float(v)
    return default


def _std_parallels(gma: dict) -> list:
    v = gma.get("standard_parallel")
    if v is None:
        return []
    v = _plain(v)
    if isinstance(v, (list, tuple)):
        return [float(x) for x in v]
    return [float(v)]


def _ellipsoid(gma: dict):
    """(kind, payload): ('ab', (a, b)) | ('sphere', r) | (None, None)."""
    a = _num(gma, "semi_major_axis")
    b = _num(gma, "semi_minor_axis")
    rf = _num(gma, "inverse_flattening")
    if a is not None:
        if rf:
            b = a * (1.0 - 1.0 / rf)
        if b is not None and b != a:
            return "ab", (a, b)
        return "sphere", a
    r = _num(gma, "earth_radius")
    if r is not None:
        return "sphere", r
    return None, None


def cf_grid_mapping_to_crs(gma: dict) -> str:
    """Grid-mapping attr dict → proj string for the analytic registry.

    Raises NotImplementedError for grid mappings or ellipsoid
    combinations outside the native families — never silently drops a
    parameter that moves the grid.
    """
    crs = _cf_gm_base(gma)
    # CF Appendix F datum attribute previously PARSED nowhere — a
    # non-Greenwich prime meridian silently rotated the grid (the r15
    # silently-dropped class). The engine's +pm honors it generically
    # (operators/crs.py _frame_params); longlat stays a loud guard
    # there, matching the passthrough family's contract.
    pm = _num(gma, "longitude_of_prime_meridian", default=0.0)
    if pm:
        crs += f" +pm={pm!r}"
    return crs


def _cf_gm_base(gma: dict) -> str:
    name = gma.get("grid_mapping_name")
    if isinstance(name, bytes):
        name = name.decode("ascii", "replace")
    if not name:
        return "longlat"
    kind, ell = _ellipsoid(gma)

    def ell_tokens(allow_sphere_radius: bool = True,
                   as_a: bool = False) -> str:
        if kind == "ab":
            return f" +a={ell[0]!r} +b={ell[1]!r}"
        if kind == "sphere":
            if abs(ell - R_EARTH) < 0.5:
                return ""
            if as_a:
                return f" +a={ell!r}"  # laea consumes +a natively
            if allow_sphere_radius:
                # the linear spherical families honor +R generically
                # (operators/crs.py _sphere_scale)
                return f" +R={ell!r}"
            raise NotImplementedError(
                f"grid mapping {name!r} on a sphere of radius {ell} — "
                "this family couples the radius with other length "
                "parameters (satellite height / internal false "
                "easting); re-express on the default sphere "
                f"R={R_EARTH} or an explicit ellipsoid"
            )
        return ""

    lat0 = _num(gma, "latitude_of_projection_origin", default=0.0)
    lon0 = _num(gma, "longitude_of_projection_origin",
                "longitude_of_central_meridian", default=0.0)
    x0 = _num(gma, "false_easting", default=0.0)
    y0 = _num(gma, "false_northing", default=0.0)
    fe = (f" +x_0={x0!r}" if x0 else "") + (f" +y_0={y0!r}" if y0 else "")
    sp = _std_parallels(gma)

    if name == "latitude_longitude":
        return "longlat"
    if name == "lambert_azimuthal_equal_area":
        return (f"+proj=laea +lat_0={lat0!r} +lon_0={lon0!r}"
                + fe + ell_tokens(as_a=True))
    if name == "polar_stereographic":
        lon0p = _num(gma, "straight_vertical_longitude_from_pole",
                     default=lon0)
        k = _num(gma, "scale_factor_at_projection_origin")
        lat_ts = sp[0] if sp else None
        out = f"+proj=stere +lat_0={lat0!r} +lon_0={lon0p!r}"
        if lat_ts is not None:
            out += f" +lat_ts={lat_ts!r}"
        elif k is not None:
            out += f" +k={k!r}"
        return out + fe + ell_tokens()
    if name == "stereographic":
        k = _num(gma, "scale_factor_at_projection_origin", default=1.0)
        return (f"+proj=stere +lat_0={lat0!r} +lon_0={lon0!r} +k={k!r}"
                + fe + ell_tokens())
    if name == "transverse_mercator":
        k = _num(gma, "scale_factor_at_central_meridian", default=1.0)
        return (f"+proj=tmerc +lat_0={lat0!r} +lon_0={lon0!r} +k={k!r}"
                + fe + ell_tokens(allow_sphere_radius=False))
    if name == "mercator":
        k = _num(gma, "scale_factor_at_projection_origin")
        if k is not None and k != 1.0:
            raise NotImplementedError(
                "mercator scale_factor_at_projection_origin != 1 "
                "outside the native subset (use standard_parallel)"
            )
        lat_ts = sp[0] if sp else 0.0
        return (f"+proj=merc +lat_ts={lat_ts!r} +lon_0={lon0!r}"
                + fe + ell_tokens())
    if name == "lambert_cylindrical_equal_area":
        lat_ts = sp[0] if sp else 0.0
        return (f"+proj=cea +lat_ts={lat_ts!r} +lon_0={lon0!r}"
                + fe + ell_tokens())
    if name == "lambert_conformal_conic":
        if not sp:
            raise ValueError(
                "lambert_conformal_conic needs standard_parallel")
        lat1 = sp[0]
        lat2 = sp[1] if len(sp) > 1 else sp[0]
        out = (f"+proj=lcc +lat_0={lat0!r} +lat_1={lat1!r}"
               f" +lat_2={lat2!r} +lon_0={lon0!r}")
        return out + fe + ell_tokens()
    if name == "albers_conical_equal_area":
        if not sp:
            raise ValueError(
                "albers_conical_equal_area needs standard_parallel")
        lat1 = sp[0]
        lat2 = sp[1] if len(sp) > 1 else sp[0]
        return (f"+proj=aea +lat_0={lat0!r} +lat_1={lat1!r}"
                f" +lat_2={lat2!r} +lon_0={lon0!r}" + fe + ell_tokens())
    if name == "azimuthal_equidistant":
        return (f"+proj=aeqd +lat_0={lat0!r} +lon_0={lon0!r}"
                + fe + ell_tokens())
    if name == "sinusoidal":
        return f"+proj=sinu +lon_0={lon0!r}" + fe + ell_tokens()
    if name == "orthographic":
        return (f"+proj=ortho +lat_0={lat0!r} +lon_0={lon0!r}"
                + fe + ell_tokens())
    if name == "geostationary":
        h = _num(gma, "perspective_point_height")
        if h is None:
            raise ValueError("geostationary needs perspective_point_height")
        sweep = gma.get("sweep_angle_axis")
        if sweep is None and gma.get("fixed_angle_axis") is not None:
            fixed = str(gma["fixed_angle_axis"]).strip().lower()
            sweep = "y" if fixed == "x" else "x"
        sweep = str(sweep or "y").strip().lower()
        return (f"+proj=geos +h={h!r} +lon_0={lon0!r} +sweep={sweep}"
                + fe + ell_tokens(allow_sphere_radius=False))
    raise NotImplementedError(
        f"CF grid_mapping_name {name!r} outside the native subset "
        "(latitude_longitude, laea, polar/oblique stereographic, "
        "tmerc, mercator, cea, lcc, albers, aeqd, sinusoidal, "
        "orthographic, geostationary)"
    )


def resolve_cf_crs(gma: dict) -> str:
    """Loader-shared resolution order: proj4 attr wins, then crs_wkt
    (passed through), then the grid_mapping_name translation, then
    longlat. ``gma`` values may be str/bytes/number/list as parsed by
    any of the three readers."""
    p4 = gma.get("proj4")
    if p4:
        return p4 if isinstance(p4, str) else str(p4)
    wkt = gma.get("crs_wkt")
    if wkt:
        return wkt if isinstance(wkt, str) else str(wkt)
    name = gma.get("grid_mapping_name")
    if name:
        if isinstance(name, bytes):
            name = name.decode("ascii", "replace")
        if not isinstance(name, str):
            raise ValueError(
                f"grid_mapping_name is not a string: {name!r}")
        # legacy/engine-written files store a proj STRING here
        # ("+proj=eqc ...", bare "eqc"); only real CF names translate
        if "proj=" in name or name in ("eqc", "longlat", "latlong",
                                       "lonlat", "webmerc"):
            return name
        return cf_grid_mapping_to_crs(gma)
    return "longlat"
