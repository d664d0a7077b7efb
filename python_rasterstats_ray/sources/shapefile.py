"""Minimal pure-Python ESRI Shapefile (.shp/.dbf) reader.

Written from the public ESRI Shapefile Technical Description (and dBASE
spec); no fiona/GDAL. Covers the subset needed by the reference's
conformance corpus (/root/reference/tests/data/*.shp): Point, MultiPoint,
PolyLine, Polygon (+Z/M variants, extra dims dropped) and C/N/F/L/D DBF
attribute fields. Replaces ``fiona_generator``
(/root/reference/src/rasterstats/io.py:32-45) for file-based features.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

from ..functions.geometry import Geom


def _signed_area(ring: np.ndarray) -> float:
    x = ring[:, 0]
    y = ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _point_in_ring(pt: np.ndarray, ring: np.ndarray) -> bool:
    x, y = pt
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cond = (y0 > y) != (y1 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
    return bool(np.count_nonzero(cond & (x < xint)) & 1)


def _assemble_polygons(rings: list[np.ndarray]) -> Geom:
    """Shapefile rings -> Polygon/MultiPolygon. Outer rings are clockwise
    (negative shoelace area with y-up); holes are assigned to the outer
    ring that contains their first vertex."""
    outers: list[list[np.ndarray]] = []
    holes: list[np.ndarray] = []
    for ring in rings:
        if len(ring) < 4:
            continue
        if _signed_area(ring) <= 0:
            outers.append([ring])
        else:
            holes.append(ring)
    if not outers:
        # degenerate: treat all rings as outers
        outers = [[r] for r in holes]
        holes = []
    for hole in holes:
        placed = False
        for rings_of in outers:
            if _point_in_ring(hole[0], rings_of[0]):
                rings_of.append(hole)
                placed = True
                break
        if not placed:
            outers[0].append(hole)
    if len(outers) == 1:
        return Geom("Polygon", polys=[outers[0]])
    return Geom("MultiPolygon", polys=outers)


def _read_shp(path: Path) -> list[Geom | None]:
    data = path.read_bytes()
    geoms: list[Geom | None] = []
    pos = 100  # skip header
    n = len(data)
    while pos + 8 <= n:
        _, content_len = struct.unpack_from(">ii", data, pos)
        pos += 8
        rec_end = pos + content_len * 2
        (stype,) = struct.unpack_from("<i", data, pos)
        base = stype % 10 if stype != 0 else 0
        p = pos + 4
        if stype == 0:
            geoms.append(None)
        elif base == 1:  # Point / PointZ / PointM
            x, y = struct.unpack_from("<2d", data, p)
            geoms.append(Geom("Point", pts=np.array([[x, y]])))
        elif base == 8:  # MultiPoint
            npts = struct.unpack_from("<i", data, p + 32)[0]
            pts = np.frombuffer(data, dtype="<f8", count=npts * 2, offset=p + 36).reshape(
                npts, 2
            )
            geoms.append(Geom("MultiPoint", pts=np.array(pts)))
        elif base in (3, 5):  # PolyLine / Polygon
            nparts, npts = struct.unpack_from("<2i", data, p + 32)
            parts = list(
                struct.unpack_from(f"<{nparts}i", data, p + 40)
            ) + [npts]
            coords = np.frombuffer(
                data, dtype="<f8", count=npts * 2, offset=p + 40 + nparts * 4
            ).reshape(npts, 2)
            rings = [np.array(coords[parts[i] : parts[i + 1]]) for i in range(nparts)]
            if base == 3:
                geoms.append(
                    Geom("LineString", paths=rings)
                    if len(rings) == 1
                    else Geom("MultiLineString", paths=rings)
                )
            else:
                geoms.append(_assemble_polygons(rings))
        else:
            raise NotImplementedError(f"Shapefile shape type {stype}")
        pos = rec_end
    return geoms


def _read_dbf(path: Path) -> list[dict]:
    if not path.exists():
        return []
    data = path.read_bytes()
    nrec = struct.unpack_from("<I", data, 4)[0]
    header_size, record_size = struct.unpack_from("<2H", data, 8)
    fields = []
    pos = 32
    while pos < header_size - 1 and data[pos] != 0x0D:
        name = data[pos : pos + 11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(data[pos + 11])
        flen = data[pos + 16]
        fdec = data[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    records = []
    pos = header_size
    for _ in range(nrec):
        if pos + record_size > len(data):
            break
        rec = data[pos : pos + record_size]
        pos += record_size
        if rec[:1] == b"*":  # deleted
            continue
        props = {}
        off = 1
        for name, ftype, flen, fdec in fields:
            raw = rec[off : off + flen]
            off += flen
            text = raw.decode("latin-1").strip()
            if ftype in ("N", "F"):
                if not text:
                    props[name] = None
                elif ftype == "N" and fdec == 0 and "." not in text:
                    try:
                        props[name] = int(text)
                    except ValueError:
                        props[name] = None
                else:
                    try:
                        props[name] = float(text)
                    except ValueError:
                        props[name] = None
            elif ftype == "L":
                props[name] = text.upper() in ("T", "Y") if text else None
            else:
                props[name] = text
        records.append(props)
    return records


def read_shapefile(path) -> list[dict]:
    """Path to .shp -> list of GeoJSON-like Feature dicts (properties from
    the sidecar .dbf when present)."""
    path = Path(path)
    geoms = _read_shp(path)
    props = _read_dbf(path.with_suffix(".dbf"))
    feats = []
    for i, geom in enumerate(geoms):
        feats.append(
            {
                "type": "Feature",
                "id": str(i),
                "properties": dict(props[i]) if i < len(props) else {},
                "geometry": None if geom is None else geom.to_geojson(),
            }
        )
    return feats
