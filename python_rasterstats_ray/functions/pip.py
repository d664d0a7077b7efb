"""Vectorized point-in-polygon (even-odd ray cast) over coordinate arrays.

The geometry-side primitive for the engine's point->zone spatial join
(SURVEY.md section 2.4 kNN/point lookup). Pure numpy; O(edges x points)
chunked.
"""

from __future__ import annotations

import numpy as np

from .geometry import Geom

_EDGE_CHUNK = 1024


def points_in_ring(xs: np.ndarray, ys: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Crossing-parity per point for one ring (half-open edge rule)."""
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    keep = y0 != y1
    x0, y0, x1, y1 = x0[keep], y0[keep], x1[keep], y1[keep]
    crossings = np.zeros(len(xs), dtype=np.int64)
    for s in range(0, len(x0), _EDGE_CHUNK):
        ex0 = x0[s : s + _EDGE_CHUNK, None]
        ey0 = y0[s : s + _EDGE_CHUNK, None]
        ex1 = x1[s : s + _EDGE_CHUNK, None]
        ey1 = y1[s : s + _EDGE_CHUNK, None]
        cond = (ey0 > ys) != (ey1 > ys)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = ex0 + (ys - ey0) * (ex1 - ex0) / (ey1 - ey0)
        crossings += np.count_nonzero(cond & (xs < xint), axis=0)
    return (crossings & 1).astype(bool)


def points_in_geom(xs, ys, geom: Geom) -> np.ndarray:
    """Boolean membership per point: even-odd within each polygon part
    (holes excluded), OR across parts."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    out = np.zeros(len(xs), dtype=bool)
    if geom.polys is None:
        raise ValueError("points_in_geom requires a polygonal geometry")
    for rings in geom.polys:
        inside = np.zeros(len(xs), dtype=bool)
        for ring in rings:
            inside ^= points_in_ring(xs, ys, ring)
        out |= inside
    return out
