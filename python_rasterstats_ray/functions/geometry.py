"""Geometry model + GeoJSON/WKT/WKB codecs (pure stdlib/numpy, from scratch).

Replaces the shapely surface the reference uses (shape(), .bounds, .geoms,
geom_xys at /root/reference/src/rasterstats/point.py:68-87, WKT/WKB loads at
io.py:66-78). Internal representation is coordinate ndarrays grouped by part
so rasterization and vertex queries stay vectorized.

Supported types (io.py:23-30): Point, MultiPoint, LineString,
MultiLineString, Polygon, MultiPolygon. GeometryCollection is rejected like
the reference. 3-D coordinates are accepted and flattened to 2-D
(point.py:72-74).
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import numpy as np

GEOM_TYPES = [
    "Point",
    "LineString",
    "Polygon",
    "MultiPoint",
    "MultiLineString",
    "MultiPolygon",
]

_WKB_CODE = {
    "Point": 1,
    "LineString": 2,
    "Polygon": 3,
    "MultiPoint": 4,
    "MultiLineString": 5,
    "MultiPolygon": 6,
}
_WKB_NAME = {v: k for k, v in _WKB_CODE.items()}


def _coords_array(coords) -> np.ndarray:
    """Coerce a coordinate sequence to an (N, 2) float64 array (drop Z)."""
    arr = np.asarray(coords, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr.reshape(1, -1)
    if arr.shape[-1] > 2:
        arr = arr[..., :2]
    return np.ascontiguousarray(arr)


class Geom:
    """A parsed geometry.

    - Point / MultiPoint: ``pts`` (N, 2)
    - LineString / MultiLineString: ``paths`` list of (N, 2)
    - Polygon / MultiPolygon: ``polys`` list of polygons; each polygon is a
      list of rings (exterior first), each ring an (N, 2) array.
    """

    __slots__ = ("gtype", "pts", "paths", "polys")

    def __init__(self, gtype: str, *, pts=None, paths=None, polys=None):
        if gtype not in GEOM_TYPES:
            raise ValueError(f"Unsupported geometry type: {gtype}")
        self.gtype = gtype
        self.pts = pts
        self.paths = paths
        self.polys = polys

    # ------------------------------------------------------------------ info
    @property
    def geom_type(self) -> str:
        return self.gtype

    @property
    def is_point_type(self) -> bool:
        return self.gtype in ("Point", "MultiPoint")

    @property
    def is_empty(self) -> bool:
        if self.pts is not None:
            return len(self.pts) == 0
        if self.paths is not None:
            return all(len(p) == 0 for p in self.paths) or not self.paths
        if self.polys is not None:
            # no polygons, or every polygon has no rings / only empty rings
            return not any(len(r) for rings in self.polys for r in rings)
        return True

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        """(minx, miny, maxx, maxy) over every vertex."""
        arrs = list(self._all_arrays())
        if not arrs:
            raise ValueError("Empty geometry has no bounds")
        mins = np.min([a.min(axis=0) for a in arrs if len(a)], axis=0)
        maxs = np.max([a.max(axis=0) for a in arrs if len(a)], axis=0)
        return (float(mins[0]), float(mins[1]), float(maxs[0]), float(maxs[1]))

    def _all_arrays(self) -> Iterator[np.ndarray]:
        if self.pts is not None:
            yield self.pts
        if self.paths is not None:
            yield from self.paths
        if self.polys is not None:
            for rings in self.polys:
                yield from rings

    def geom_xys(self) -> Iterator[tuple[float, float]]:
        """Flattened vertex stream; ordering parity with point.py:68-87
        (per sub-geometry: exterior ring then interiors)."""
        for arr in self._all_arrays():
            for x, y in arr:
                yield (float(x), float(y))

    def vertex_array(self) -> np.ndarray:
        """All vertices as one (N, 2) array, in geom_xys order."""
        arrs = [a for a in self._all_arrays() if len(a)]
        if not arrs:
            return np.empty((0, 2), dtype=np.float64)
        return np.concatenate(arrs, axis=0)

    # -------------------------------------------------------------- geojson
    @property
    def __geo_interface__(self) -> dict:
        return self.to_geojson()

    def to_geojson(self) -> dict:
        t = self.gtype
        if t == "Point":
            return {"type": t, "coordinates": [float(v) for v in self.pts[0]]}
        if t == "MultiPoint":
            return {"type": t, "coordinates": self.pts.tolist()}
        if t == "LineString":
            return {"type": t, "coordinates": self.paths[0].tolist()}
        if t == "MultiLineString":
            return {"type": t, "coordinates": [p.tolist() for p in self.paths]}
        if t == "Polygon":
            return {"type": t, "coordinates": [r.tolist() for r in self.polys[0]]}
        return {
            "type": t,
            "coordinates": [[r.tolist() for r in rings] for rings in self.polys],
        }


def from_geojson(obj: dict) -> Geom:
    """GeoJSON geometry dict -> Geom (3-D coords flattened)."""
    t = obj.get("type")
    coords = obj.get("coordinates")
    if t == "Point":
        return Geom(t, pts=_coords_array([coords]))
    if t == "MultiPoint":
        return Geom(t, pts=_coords_array(coords))
    if t == "LineString":
        return Geom(t, paths=[_coords_array(coords)])
    if t == "MultiLineString":
        return Geom(t, paths=[_coords_array(p) for p in coords])
    if t == "Polygon":
        return Geom(t, polys=[[_coords_array(r) for r in coords]])
    if t == "MultiPolygon":
        return Geom(
            t, polys=[[_coords_array(r) for r in rings] for rings in coords]
        )
    raise ValueError(f"Unsupported geometry type: {t}")


def make_point(x: float, y: float) -> Geom:
    return Geom("Point", pts=np.array([[x, y]], dtype=np.float64))


def make_box(w: float, s: float, e: float, n: float) -> Geom:
    """Rectangle polygon (counterclockwise, closed ring) like shapely.box."""
    ring = np.array(
        [[e, s], [e, n], [w, n], [w, s], [e, s]], dtype=np.float64
    )
    return Geom("Polygon", polys=[[ring]])


def make_multipolygon(polys: list[Geom]) -> Geom:
    return Geom("MultiPolygon", polys=[g.polys[0] for g in polys])


# ============================================================== WKT codec
class _WKTParser:
    """Recursive-descent WKT reader (2D; Z/M tokens accepted, extra dims
    dropped). Grammar per the OGC Simple Features spec (public)."""

    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def error(self, msg: str):
        raise ValueError(f"WKT parse error at {self.pos}: {msg} in {self.text[:80]!r}")

    def skip_ws(self):
        while self.pos < len(self.text) and self.text[self.pos].isspace():
            self.pos += 1

    def peek(self) -> str:
        self.skip_ws()
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def expect(self, ch: str):
        self.skip_ws()
        if self.pos >= len(self.text) or self.text[self.pos] != ch:
            self.error(f"expected {ch!r}")
        self.pos += 1

    def word(self) -> str:
        self.skip_ws()
        start = self.pos
        while self.pos < len(self.text) and (
            self.text[self.pos].isalpha() or self.text[self.pos] == "_"
        ):
            self.pos += 1
        return self.text[start : self.pos].upper()

    def number(self) -> float:
        self.skip_ws()
        start = self.pos
        while self.pos < len(self.text) and self.text[self.pos] not in " \t\n\r,()":
            self.pos += 1
        if start == self.pos:
            self.error("expected number")
        try:
            return float(self.text[start : self.pos])
        except ValueError:
            self.error(f"bad number {self.text[start:self.pos]!r}")

    def coord(self) -> list[float]:
        vals = [self.number()]
        while self.peek() not in (",", ")", ""):
            vals.append(self.number())
        return vals[:2]

    def coord_seq(self) -> np.ndarray:
        self.expect("(")
        coords = [self.coord()]
        while self.peek() == ",":
            self.expect(",")
            coords.append(self.coord())
        self.expect(")")
        return _coords_array(coords)

    def ring_seq(self) -> list[np.ndarray]:
        self.expect("(")
        rings = [self.coord_seq()]
        while self.peek() == ",":
            self.expect(",")
            rings.append(self.coord_seq())
        self.expect(")")
        return rings

    def maybe_empty(self) -> bool:
        save = self.pos
        w = self.word()
        if w == "EMPTY":
            return True
        self.pos = save
        return False

    def parse(self) -> Geom:
        tag = self.word()
        # optional dimension token
        save = self.pos
        dim = self.word()
        if dim not in ("Z", "M", "ZM"):
            self.pos = save
        if tag == "POINT":
            if self.maybe_empty():
                return Geom("Point", pts=np.empty((0, 2)))
            self.expect("(")
            c = self.coord()
            self.expect(")")
            return Geom("Point", pts=_coords_array([c]))
        if tag == "LINESTRING":
            if self.maybe_empty():
                return Geom("LineString", paths=[np.empty((0, 2))])
            return Geom("LineString", paths=[self.coord_seq()])
        if tag == "POLYGON":
            if self.maybe_empty():
                return Geom("Polygon", polys=[])
            return Geom("Polygon", polys=[self.ring_seq()])
        if tag == "MULTIPOINT":
            if self.maybe_empty():
                return Geom("MultiPoint", pts=np.empty((0, 2)))
            self.expect("(")
            pts = []
            while True:
                if self.peek() == "(":
                    self.expect("(")
                    pts.append(self.coord())
                    self.expect(")")
                else:
                    pts.append(self.coord())
                if self.peek() == ",":
                    self.expect(",")
                    continue
                break
            self.expect(")")
            return Geom("MultiPoint", pts=_coords_array(pts))
        if tag == "MULTILINESTRING":
            if self.maybe_empty():
                return Geom("MultiLineString", paths=[])
            paths = self.ring_seq()
            return Geom("MultiLineString", paths=paths)
        if tag == "MULTIPOLYGON":
            if self.maybe_empty():
                return Geom("MultiPolygon", polys=[])
            self.expect("(")
            polys = [self.ring_seq()]
            while self.peek() == ",":
                self.expect(",")
                polys.append(self.ring_seq())
            self.expect(")")
            return Geom("MultiPolygon", polys=polys)
        self.error(f"unsupported WKT tag {tag!r}")


def from_wkt(text: str) -> Geom:
    if not isinstance(text, str):
        raise ValueError("WKT input must be str")
    p = _WKTParser(text)
    g = p.parse()
    p.skip_ws()
    if p.pos != len(p.text):
        raise ValueError(f"Trailing characters in WKT: {p.text[p.pos:]!r}")
    return g


def to_wkt(geom: Geom, precision: int = 17) -> str:
    def fmt(v: float) -> str:
        s = repr(float(v))
        return s

    def seq(arr) -> str:
        return ", ".join(f"{fmt(x)} {fmt(y)}" for x, y in arr)

    t = geom.gtype
    if t == "Point":
        return f"POINT ({seq(geom.pts)})"
    if t == "MultiPoint":
        return "MULTIPOINT (" + ", ".join(f"({fmt(x)} {fmt(y)})" for x, y in geom.pts) + ")"
    if t == "LineString":
        return f"LINESTRING ({seq(geom.paths[0])})"
    if t == "MultiLineString":
        return "MULTILINESTRING (" + ", ".join(f"({seq(p)})" for p in geom.paths) + ")"
    if t == "Polygon":
        return "POLYGON (" + ", ".join(f"({seq(r)})" for r in geom.polys[0]) + ")"
    return (
        "MULTIPOLYGON ("
        + ", ".join(
            "(" + ", ".join(f"({seq(r)})" for r in rings) + ")" for rings in geom.polys
        )
        + ")"
    )


# ============================================================== WKB codec
class _WKBReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, fmt: str, bo: str):
        size = struct.calcsize(bo + fmt)
        vals = struct.unpack_from(bo + fmt, self.data, self.pos)
        self.pos += size
        return vals

    def geometry(self) -> Geom:
        (order,) = self.read("B", "<")
        bo = "<" if order == 1 else ">"
        (code,) = self.read("I", bo)
        srid_flag = bool(code & 0x20000000)
        has_z = bool(code & 0x80000000) or (1000 <= (code & 0xFFFF) < 2000) or (3000 <= (code & 0xFFFF) < 4000)
        has_m = bool(code & 0x40000000) or (2000 <= (code & 0xFFFF) < 4000)
        base = code & 0xFFFF
        base = base % 1000
        if srid_flag:
            self.read("I", bo)  # skip SRID
        ndim = 2 + int(has_z) + int(has_m)
        name = _WKB_NAME.get(base)
        if name is None:
            raise ValueError(f"Unsupported WKB geometry code {code}")

        def points(n: int) -> np.ndarray:
            vals = self.read(f"{n * ndim}d", bo)
            arr = np.asarray(vals, dtype=np.float64).reshape(n, ndim)
            return np.ascontiguousarray(arr[:, :2])

        def linear_ring() -> np.ndarray:
            (n,) = self.read("I", bo)
            return points(n)

        if name == "Point":
            return Geom("Point", pts=points(1))
        if name == "LineString":
            return Geom("LineString", paths=[linear_ring()])
        if name == "Polygon":
            (nrings,) = self.read("I", bo)
            return Geom("Polygon", polys=[[linear_ring() for _ in range(nrings)]])
        (nparts,) = self.read("I", bo)
        subs = [self.geometry() for _ in range(nparts)]
        if name == "MultiPoint":
            pts = np.concatenate([s.pts for s in subs]) if subs else np.empty((0, 2))
            return Geom("MultiPoint", pts=pts)
        if name == "MultiLineString":
            return Geom("MultiLineString", paths=[s.paths[0] for s in subs])
        return Geom("MultiPolygon", polys=[s.polys[0] for s in subs])


def from_wkb(data: bytes) -> Geom:
    if isinstance(data, str):
        # hex-encoded WKB
        data = bytes.fromhex(data)
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("WKB input must be bytes")
    return _WKBReader(bytes(data)).geometry()


def to_wkb(geom: Geom) -> bytes:
    """Serialize as little-endian ISO WKB (2-D)."""
    out = bytearray()

    def header(name: str):
        out.append(1)
        out.extend(struct.pack("<I", _WKB_CODE[name]))

    def coords(arr: np.ndarray, with_count: bool = True):
        if with_count:
            out.extend(struct.pack("<I", len(arr)))
        out.extend(np.ascontiguousarray(arr, dtype="<f8").tobytes())

    t = geom.gtype
    if t == "Point":
        header(t)
        coords(geom.pts, with_count=False)
    elif t == "LineString":
        header(t)
        coords(geom.paths[0])
    elif t == "Polygon":
        header(t)
        out.extend(struct.pack("<I", len(geom.polys[0]) if geom.polys else 0))
        if geom.polys:
            for r in geom.polys[0]:
                coords(r)
    elif t == "MultiPoint":
        header(t)
        out.extend(struct.pack("<I", len(geom.pts)))
        for p in geom.pts:
            header("Point")
            coords(p.reshape(1, 2), with_count=False)
    elif t == "MultiLineString":
        header(t)
        out.extend(struct.pack("<I", len(geom.paths)))
        for p in geom.paths:
            header("LineString")
            coords(p)
    elif t == "MultiPolygon":
        header(t)
        out.extend(struct.pack("<I", len(geom.polys)))
        for rings in geom.polys:
            header("Polygon")
            out.extend(struct.pack("<I", len(rings)))
            for r in rings:
                coords(r)
    else:
        raise ValueError(t)
    return bytes(out)


def parse_geometry(obj) -> Geom:
    """Best-effort geometry parse: Geom / GeoJSON dict / WKT str / WKB bytes
    or hex str / __geo_interface__ object."""
    if isinstance(obj, Geom):
        return obj
    if isinstance(obj, dict):
        return from_geojson(obj)
    if isinstance(obj, (bytes, bytearray, memoryview)):
        return from_wkb(bytes(obj))
    if isinstance(obj, str):
        try:
            return from_wkt(obj)
        except ValueError:
            pass
        try:
            return from_wkb(bytes.fromhex(obj))
        except ValueError:
            raise ValueError(f"Can't parse geometry from {obj[:80]!r}")
    gi = getattr(obj, "__geo_interface__", None)
    if gi is not None:
        return from_geojson(gi)
    raise ValueError(f"Can't parse geometry from {obj!r}")
