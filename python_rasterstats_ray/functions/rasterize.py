"""From-scratch geometry rasterization with GDAL-compatible semantics.

Replaces ``rasterio.features.rasterize`` as used by the reference
(/root/reference/src/rasterstats/utils.py:33-55):

- Polygons (default): burn a pixel iff its **center** is inside the polygon
  (even-odd rule), evaluated per scanline at ``row + 0.5`` — the same
  semantics as GDAL's filled-polygon scanline renderer.
- Lines (default): Bresenham-style traversal between consecutive vertices
  (one pixel per major-axis step), endpoints floored to their pixel.
- ``all_touched=True``: every pixel whose interior the geometry touches —
  the center-rule fill plus a conservative supercover traversal of every
  ring/path segment.
- Points: the containing pixel. (The zonal path never hits this directly —
  points are boxified first, see stats.py ``boxify_points`` parity note.)

Everything is vectorized numpy; the per-(zone, window) cost is
O(edges x rows / chunk) for fills and O(cells crossed) for lines.
"""

from __future__ import annotations

import numpy as np

from .affine import Affine
from .geometry import Geom

_EDGE_CHUNK = 2048


def _to_pixel(arr: np.ndarray, affine: Affine) -> np.ndarray:
    """World (N,2) -> fractional pixel coords (N,2) as (px, py) = (col, row)."""
    inv = ~affine
    x = arr[:, 0]
    y = arr[:, 1]
    px = inv.a * x + inv.b * y + inv.c
    py = inv.d * x + inv.e * y + inv.f
    return np.column_stack([px, py])


def _close_ring(ring: np.ndarray) -> np.ndarray:
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        return np.vstack([ring, ring[:1]])
    return ring


def _fill_polygon_evenodd(rings_px: list[np.ndarray], h: int, w: int) -> np.ndarray:
    """Even-odd scanline fill at pixel centers for one polygon (with holes).

    A pixel (r, c) is set iff the number of ring-edge crossings with the
    horizontal line y = r + 0.5 at x <= c + 0.5 is odd (half-open interval
    semantics: entering edge inclusive, exiting edge exclusive).
    """
    yc = np.arange(h, dtype=np.float64) + 0.5
    # collect flattened (row, col) crossing indices, then ONE bincount —
    # measured ~1.4x faster than scatter-adds into a 2D accumulator
    idx_parts: list[np.ndarray] = []
    for ring in rings_px:
        ring = _close_ring(ring)
        if len(ring) < 4:
            continue
        ex0 = ring[:-1, 0]
        ey0 = ring[:-1, 1]
        ex1 = ring[1:, 0]
        ey1 = ring[1:, 1]
        # Skip edges entirely above/below the window.
        lo = np.minimum(ey0, ey1)
        hi = np.maximum(ey0, ey1)
        keep = (hi >= 0.5) & (lo <= h - 0.5) & (ey0 != ey1)
        if not keep.any():
            continue
        ex0, ey0, ex1, ey1 = ex0[keep], ey0[keep], ex1[keep], ey1[keep]
        slope = (ex1 - ex0) / (ey1 - ey0)
        n = len(ex0)
        for s in range(0, n, _EDGE_CHUNK):
            x0 = ex0[s : s + _EDGE_CHUNK]
            y0 = ey0[s : s + _EDGE_CHUNK]
            y1 = ey1[s : s + _EDGE_CHUNK]
            sl = slope[s : s + _EDGE_CHUNK]
            cond = (y0[:, None] > yc) != (y1[:, None] > yc)
            if not cond.any():
                continue
            ei, ri = np.nonzero(cond)
            xs = x0[ei] + (yc[ri] - y0[ei]) * sl[ei]
            cols = np.ceil(xs - 0.5).astype(np.int64)
            np.clip(cols, 0, w, out=cols)
            idx_parts.append(ri * (w + 1) + cols)
    if not idx_parts:
        return np.zeros((h, w), dtype=bool)
    idx = idx_parts[0] if len(idx_parts) == 1 else np.concatenate(idx_parts)
    # Even-odd fill = XOR-parity prefix along each row: a uint8 toggle
    # scatter (K crossings, K << h*w) + one uint8 XOR-prefix pass.
    # Identical output to the former bincount+cumsum&1 (xor of the
    # multiplicity == parity of the count) at ~3 bytes of memory traffic
    # per window pixel instead of ~25 int64 bytes — the difference
    # between compute-bound and bandwidth-bound on mega-zone windows.
    par = np.zeros(h * (w + 1), dtype=np.uint8)
    np.bitwise_xor.at(par, idx, np.uint8(1))
    return np.bitwise_xor.accumulate(
        par.reshape(h, w + 1)[:, :w], axis=1
    ).view(bool)


def _burn_bresenham(paths_px: list[np.ndarray], out: np.ndarray) -> None:
    """GDAL-style default line burn: integer Bresenham (one pixel per
    major-axis step) between floored consecutive vertices."""
    h, w = out.shape
    for path in paths_px:
        if len(path) == 0:
            continue
        cx = np.floor(path[:, 0]).astype(np.int64)
        cy = np.floor(path[:, 1]).astype(np.int64)
        for i in range(len(cx) - 1):
            x0, y0, x1, y1 = cx[i], cy[i], cx[i + 1], cy[i + 1]
            dx = abs(x1 - x0)
            dy = abs(y1 - y0)
            sx = 1 if x1 >= x0 else -1
            sy = 1 if y1 >= y0 else -1
            if dx >= dy:
                i_arr = np.arange(dx + 1, dtype=np.int64)
                xs = x0 + sx * i_arr
                if dx == 0:
                    ys = np.full_like(xs, y0)
                else:
                    ys = y0 + sy * ((2 * dy * i_arr + dx) // (2 * dx))
            else:
                i_arr = np.arange(dy + 1, dtype=np.int64)
                ys = y0 + sy * i_arr
                xs = x0 + sx * ((2 * dx * i_arr + dy) // (2 * dy))
            ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
            out[ys[ok], xs[ok]] = True
        if len(cx) == 1:
            if 0 <= cx[0] < w and 0 <= cy[0] < h:
                out[cy[0], cx[0]] = True


def _burn_all_touched(paths_px: list[np.ndarray], out: np.ndarray) -> None:
    """Supercover burn: every cell whose interior a segment passes through.

    Robust midpoint-sampling traversal: collect all parameter values where
    the segment crosses integer x or y grid lines, and burn the cell
    containing the midpoint of each sub-interval.
    """
    h, w = out.shape
    for path in paths_px:
        for i in range(len(path) - 1):
            x0, y0 = path[i]
            x1, y1 = path[i + 1]
            ts = [0.0, 1.0]
            dx = x1 - x0
            dy = y1 - y0
            if dx != 0.0:
                xlo, xhi = sorted((x0, x1))
                first = np.ceil(xlo)
                xcross = np.arange(first, np.floor(xhi) + 1.0)
                ts.extend(((xcross - x0) / dx).tolist())
            if dy != 0.0:
                ylo, yhi = sorted((y0, y1))
                first = np.ceil(ylo)
                ycross = np.arange(first, np.floor(yhi) + 1.0)
                ts.extend(((ycross - y0) / dy).tolist())
            t = np.unique(np.clip(np.asarray(ts, dtype=np.float64), 0.0, 1.0))
            if len(t) < 2:
                t = np.array([0.0, 1.0])
            mid = (t[:-1] + t[1:]) / 2.0
            mx = np.floor(x0 + mid * dx).astype(np.int64)
            my = np.floor(y0 + mid * dy).astype(np.int64)
            ok = (mx >= 0) & (mx < w) & (my >= 0) & (my < h)
            out[my[ok], mx[ok]] = True
        if len(path) == 1:
            cx = int(np.floor(path[0, 0]))
            cy = int(np.floor(path[0, 1]))
            if 0 <= cx < w and 0 <= cy < h:
                out[cy, cx] = True


def rect_geom_state(geom: Geom, window, affine: Affine) -> str:
    """Classify a pixel-window rect against a polygonal geometry without
    rasterizing: 'full' (every pixel center inside), 'empty' (none), or
    'partial' (boundary may cross -> needs the real rasterizer).

    Sound shortcut for interior tiles of mega-polygons: if no ring-edge
    bounding box intersects the rect, no boundary crosses it, so coverage
    is uniform and one center-point test decides it. Conservative: any
    bbox overlap falls back to 'partial'.
    """
    if geom.polys is None:
        return "partial"
    (r0, r1), (c0, c1) = window
    inv = ~affine
    for rings in geom.polys:
        for ring in rings:
            x = inv.a * ring[:, 0] + inv.b * ring[:, 1] + inv.c
            y = inv.d * ring[:, 0] + inv.e * ring[:, 1] + inv.f
            ex_lo = np.minimum(x[:-1], x[1:])
            ex_hi = np.maximum(x[:-1], x[1:])
            ey_lo = np.minimum(y[:-1], y[1:])
            ey_hi = np.maximum(y[:-1], y[1:])
            hit = (ex_hi >= c0) & (ex_lo <= c1) & (ey_hi >= r0) & (ey_lo <= r1)
            if hit.any():
                return "partial"
    # uniform: test the rect's central pixel center
    cx = (c0 + c1) / 2.0
    cy = (r0 + r1) / 2.0
    wx = affine.a * cx + affine.b * cy + affine.c
    wy = affine.d * cx + affine.e * cy + affine.f
    from .pip import points_in_geom

    inside = points_in_geom(np.array([wx]), np.array([wy]), geom)[0]
    return "full" if inside else "empty"


def rasterize_geom(
    geom: Geom,
    shape: tuple[int, int],
    affine: Affine,
    all_touched: bool = False,
) -> np.ndarray:
    """Geometry -> boolean mask over a raster window grid.

    Parity target: utils.py:33-55 (rasterio.features.rasterize with
    ``fill=0, default burn 1``) validated against the reference's golden
    pixel counts (tests/test_zonal.py:26-27,95-116,231-235).
    """
    h, w = int(shape[0]), int(shape[1])
    out = np.zeros((h, w), dtype=bool)
    if h <= 0 or w <= 0 or geom.is_empty:
        return out

    if geom.polys is not None:
        for rings in geom.polys:
            rings_px = [_to_pixel(r, affine) for r in rings]
            out |= _fill_polygon_evenodd(rings_px, h, w)
            if all_touched:
                _burn_all_touched([_close_ring(r) for r in rings_px], out)
    elif geom.paths is not None:
        paths_px = [_to_pixel(p, affine) for p in geom.paths]
        if all_touched:
            _burn_all_touched(paths_px, out)
        else:
            _burn_bresenham(paths_px, out)
    elif geom.pts is not None:
        px = _to_pixel(geom.pts, affine)
        cx = np.floor(px[:, 0]).astype(np.int64)
        cy = np.floor(px[:, 1]).astype(np.int64)
        ok = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
        out[cy[ok], cx[ok]] = True
    return out
