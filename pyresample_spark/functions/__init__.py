from pyresample_spark.functions.geo import (
    R_EARTH,
    eqc_x,
    eqc_y,
    fwhm2sigma,
    haversine_m,
    lonlat2xyz,
    round_to_resolution,
    wrap_longitude,
)

__all__ = [
    "R_EARTH",
    "eqc_x",
    "eqc_y",
    "fwhm2sigma",
    "haversine_m",
    "lonlat2xyz",
    "round_to_resolution",
    "wrap_longitude",
]
