"""Minimal affine transform for raster grids (pure stdlib/numpy).

From-scratch replacement for the public ``affine`` package API surface that
the reference engine relies on (see /root/reference/src/rasterstats/io.py:149-168
for the call sites): 6-parameter forward map (col,row)->(x,y), inversion,
``from_gdal`` ordering, point multiplication, and 9-tuple iteration.
"""

from __future__ import annotations

import math
from typing import NamedTuple


class Affine(NamedTuple):
    """Affine transform ``(a, b, c, d, e, f)``.

    Maps pixel space (col, row) to world space (x, y)::

        x = a * col + b * row + c
        y = d * col + e * row + f

    ``c, f`` are the coordinates of the top-left corner of the top-left
    pixel; for north-up rasters ``b == d == 0`` and ``e < 0``.
    """

    a: float
    b: float
    c: float
    d: float
    e: float
    f: float

    @classmethod
    def identity(cls) -> "Affine":
        return cls(1.0, 0.0, 0.0, 0.0, 1.0, 0.0)

    @classmethod
    def from_gdal(cls, c: float, a: float, b: float, f: float, d: float, e: float) -> "Affine":
        """GDAL geotransform ordering (c, a, b, f, d, e) -> Affine."""
        return cls(a, b, c, d, e, f)

    def to_gdal(self) -> tuple[float, float, float, float, float, float]:
        return (self.c, self.a, self.b, self.f, self.d, self.e)

    # NOTE: tuple(self) yields the 6 members via NamedTuple iteration, but the
    # reference unpacks 9 elements (io.py:329); provide the full 3x3 row-major
    # tuple under .g9 and keep __invert__/__mul__ semantics of the affine pkg.
    @property
    def g9(self) -> tuple[float, ...]:
        return (self.a, self.b, self.c, self.d, self.e, self.f, 0.0, 0.0, 1.0)

    @property
    def determinant(self) -> float:
        return self.a * self.e - self.b * self.d

    def __invert__(self) -> "Affine":
        det = self.determinant
        if det == 0.0:
            raise ValueError("Cannot invert degenerate affine transform")
        ia = self.e / det
        ib = -self.b / det
        id_ = -self.d / det
        ie = self.a / det
        ic = -(ia * self.c + ib * self.f)
        if_ = -(id_ * self.c + ie * self.f)
        return Affine(ia, ib, ic, id_, ie, if_)

    def __mul__(self, other):  # type: ignore[override]
        """``affine * (x, y)`` point transform, or affine composition."""
        if isinstance(other, Affine):
            sa, sb, sc, sd, se, sf = self
            oa, ob, oc, od, oe, of = other
            return Affine(
                sa * oa + sb * od,
                sa * ob + sb * oe,
                sa * oc + sb * of + sc,
                sd * oa + se * od,
                sd * ob + se * oe,
                sd * oc + se * of + sf,
            )
        x, y = other
        return (
            self.a * x + self.b * y + self.c,
            self.d * x + self.e * y + self.f,
        )

    def xy(self, col, row):
        """Vectorized forward map; accepts scalars or numpy arrays."""
        return (
            self.a * col + self.b * row + self.c,
            self.d * col + self.e * row + self.f,
        )

    def rowcol_float(self, x, y):
        """Vectorized inverse map -> fractional (row, col)."""
        inv = ~self
        col = inv.a * x + inv.b * y + inv.c
        row = inv.d * x + inv.e * y + inv.f
        return row, col

    def almost_equals(self, other: "Affine", precision: float = 1e-9) -> bool:
        return all(abs(s - o) <= precision for s, o in zip(self, other))


def guard_affine(affine) -> Affine:
    """Coerce a 6-sequence / GDAL 6-tuple-like / Affine into an Affine.

    Follows the rasterio ``guard_transform`` contract (io.py:277): a plain
    6-sequence is interpreted as (a, b, c, d, e, f) unless it looks like a
    GDAL geotransform (rotation terms in positions 2/4 with e>0 pattern is
    ambiguous; we only auto-detect the common north-up GDAL layout where
    element 1 is pixel width and element 5 is negative pixel height).
    """
    if isinstance(affine, Affine):
        return affine
    t = tuple(float(v) for v in affine)
    if len(t) == 9:
        t = t[:6]
    if len(t) != 6:
        raise ValueError(f"Cannot interpret {affine!r} as an affine transform")
    a, b, c, d, e, f = t
    # Heuristic GDAL detection: (x0, dx, 0, y0, 0, -dy)
    if b == 0.0 and d == 0.0 and a != 0.0 and e != 0.0:
        return Affine(a, b, c, d, e, f)
    if t[1] != 0.0 and t[2] == 0.0 and t[4] == 0.0 and t[5] != 0.0:
        return Affine.from_gdal(*t)
    return Affine(a, b, c, d, e, f)


def rowcol(x: float, y: float, affine: Affine, op=math.floor) -> tuple[int, int]:
    """(x, y) -> (row, col) using ``op`` rounding; parity with io.py:149-153.

    Assumes an axis-aligned (b == d == 0) transform like the reference.
    """
    r = int(op((y - affine.f) / affine.e))
    c = int(op((x - affine.c) / affine.a))
    return r, c
