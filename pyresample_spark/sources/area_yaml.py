"""Area definition I/O: YAML load/dump + legacy cfg parse
(SURVEY.md §2.1).

Reference parity: load_area / parse_area_file / load_area_from_string
(area_config.py:69-128), create_area_def (area_config.py:426),
AreaDefinition.dump (geometry.py:2045-2113).

Driver-side only — areas are tiny structs; no cluster work.
"""

from __future__ import annotations

import yaml

from pyresample_spark.geometry import AreaDefinition


def load_area_from_string(text: str, *area_ids: str) -> list:
    """Parse a YAML area document into AreaDefinition structs.

    Supported YAML shape (the reference's modern format):

        my_area:
          description: ...
          projection: "+proj=longlat"   # or a dict / plain name
          shape: {height: 80, width: 85}
          area_extent:
            lower_left_xy: [-20, 20]
            upper_right_xy: [20, 35]
    """
    doc = yaml.safe_load(text)
    out = []
    for area_id, spec in doc.items():
        if area_ids and area_id not in area_ids:
            continue
        proj = spec.get("projection", "longlat")
        if isinstance(proj, dict):
            crs = " ".join(f"+{k}={v}" for k, v in sorted(proj.items()))
        else:
            crs = str(proj)
        shape = spec["shape"]
        ext = spec["area_extent"]
        ll = ext["lower_left_xy"]
        ur = ext["upper_right_xy"]
        out.append(
            AreaDefinition(
                area_id=area_id,
                crs=crs,
                width=int(shape["width"]),
                height=int(shape["height"]),
                area_extent=(
                    float(ll[0]),
                    float(ll[1]),
                    float(ur[0]),
                    float(ur[1]),
                ),
                description=spec.get("description", ""),
            )
        )
    if area_ids:
        by_id = {a.area_id: a for a in out}
        return [by_id[i] for i in area_ids]
    return out


def load_area(path: str, *area_ids: str) -> list:
    with open(path) as f:
        return load_area_from_string(f.read(), *area_ids)


def dump_area(area: AreaDefinition) -> str:
    """AreaDefinition → YAML (geometry.py:2045-2113 analog)."""
    doc = {
        area.area_id: {
            "description": area.description,
            "projection": area.crs,
            "shape": {"height": area.height, "width": area.width},
            "area_extent": {
                "lower_left_xy": [area.area_extent[0], area.area_extent[1]],
                "upper_right_xy": [area.area_extent[2], area.area_extent[3]],
            },
        }
    }
    return yaml.safe_dump(doc, sort_keys=False)


def create_area_def(
    area_id: str,
    crs: str,
    *,
    shape: tuple | None = None,
    area_extent: tuple | None = None,
    resolution: tuple | float | None = None,
    center: tuple | None = None,
) -> AreaDefinition:
    """Build an area from any sufficient combo of shape / extent /
    resolution / center (area_config.py:426-851 re-expressed)."""
    if area_extent is None:
        if center is None or resolution is None or shape is None:
            raise ValueError(
                "need area_extent, or center + resolution + shape"
            )
        resx, resy = (
            (resolution, resolution)
            if isinstance(resolution, (int, float))
            else resolution
        )
        h, w = shape
        cx, cy = center
        area_extent = (
            cx - w * resx / 2.0,
            cy - h * resy / 2.0,
            cx + w * resx / 2.0,
            cy + h * resy / 2.0,
        )
    if shape is None:
        if resolution is None:
            raise ValueError("need shape or resolution")
        resx, resy = (
            (resolution, resolution)
            if isinstance(resolution, (int, float))
            else resolution
        )
        w = max(1, round((area_extent[2] - area_extent[0]) / resx))
        h = max(1, round((area_extent[3] - area_extent[1]) / resy))
        shape = (h, w)
    return AreaDefinition(
        area_id=area_id,
        crs=crs,
        width=shape[1],
        height=shape[0],
        area_extent=tuple(float(v) for v in area_extent),
    )


def parse_legacy_cfg(text: str) -> list:
    """Parse the legacy ``REGION: id { KEY: value; };`` area format
    (area_config.py legacy path; test fixture areas.cfg shape)."""
    import re

    out = []
    for m in re.finditer(r"REGION:\s*(\S+)\s*{([^}]*)}", text):
        area_id, body = m.group(1), m.group(2)
        kv = {}
        for line in body.splitlines():
            line = line.strip().rstrip(";")
            if ":" in line:
                k, v = line.split(":", 1)
                kv[k.strip().upper()] = v.strip()
        extent = tuple(
            float(x)
            for x in kv["AREA_EXTENT"].strip("()").replace(",", " ").split()
        )
        crs = kv.get("PCS_DEF", "longlat")
        if "proj=" in crs and "+proj=" not in crs:
            crs = " ".join(f"+{p.strip()}" for p in crs.split(","))
        out.append(
            AreaDefinition(
                area_id=area_id,
                crs=crs,
                width=int(kv["XSIZE"]),
                height=int(kv["YSIZE"]),
                area_extent=extent,
                description=kv.get("NAME", ""),
            )
        )
    return out
