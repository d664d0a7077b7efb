"""Raster tiling + cell index (the engine's H3/S2-style key).

The cell key is a Z-ordered (tile_row, tile_col) pair packed into one
int64 over the raster's own pixel grid — the join key that co-partitions
zones and raster tiles (SURVEY.md section 2.4). Tile assignment derives
from ``bounds_window`` snapping (io.py:156-161 parity), so a zone is
assigned exactly the tiles its boundless windowed read would touch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.affine import Affine
from ..functions.windows import Window, bounds_window

DEFAULT_TILE_SIZE = 256


def cell_id(tile_row, tile_col):
    """Pack (tile_row, tile_col) -> int64. Vectorized; supports negatives
    (two's-complement low 32 bits for the column)."""
    tr = np.asarray(tile_row, dtype=np.int64)
    tc = np.asarray(tile_col, dtype=np.int64)
    return (tr << np.int64(32)) | (tc & np.int64(0xFFFFFFFF))


def cell_decode(cid):
    """int64 cell -> (tile_row, tile_col), sign-extended."""
    cid = np.asarray(cid, dtype=np.int64)
    tr = cid >> np.int64(32)
    tc = cid & np.int64(0xFFFFFFFF)
    tc = np.where(tc >= np.int64(1) << np.int64(31), tc - (np.int64(1) << np.int64(32)), tc)
    if tr.ndim == 0:
        return int(tr), int(tc)
    return tr, tc


def window_cells(window: Window, tile_size: int = DEFAULT_TILE_SIZE) -> np.ndarray:
    """All cell ids whose tile rect intersects the pixel window."""
    (r0, r1), (c0, c1) = window
    if r1 <= r0 or c1 <= c0:
        return np.empty(0, dtype=np.int64)
    tr0 = int(np.floor(r0 / tile_size))
    tr1 = int(np.floor((r1 - 1) / tile_size))
    tc0 = int(np.floor(c0 / tile_size))
    tc1 = int(np.floor((c1 - 1) / tile_size))
    trs = np.arange(tr0, tr1 + 1, dtype=np.int64)
    tcs = np.arange(tc0, tc1 + 1, dtype=np.int64)
    grid_r, grid_c = np.meshgrid(trs, tcs, indexing="ij")
    return cell_id(grid_r.ravel(), grid_c.ravel())


def points_cell(rows, cols, tile_size: int = DEFAULT_TILE_SIZE):
    """Pixel (row, col) -> containing cell id (vectorized)."""
    tr = np.floor_divide(np.asarray(rows, dtype=np.int64), tile_size)
    tc = np.floor_divide(np.asarray(cols, dtype=np.int64), tile_size)
    return cell_id(tr, tc)


def raster_to_tiles_table(
    arr: np.ndarray,
    affine: Affine,
    nodata,
    tile_size: int = DEFAULT_TILE_SIZE,
) -> pa.Table:
    """Materialize a raster as an Arrow tile table:
    (cell:int64, row_off:int32, col_off:int32, height:int32, width:int32,
    dtype:string, pixels:binary). Pixel payloads are raw C-order bytes —
    zero-copy numpy views on read."""
    h, w = arr.shape
    cells, row_offs, col_offs, hs, ws, pixels = [], [], [], [], [], []
    for tr in range(0, (h + tile_size - 1) // tile_size):
        for tc in range(0, (w + tile_size - 1) // tile_size):
            r0, c0 = tr * tile_size, tc * tile_size
            th = min(tile_size, h - r0)
            tw = min(tile_size, w - c0)
            cells.append(int(cell_id(tr, tc)))
            row_offs.append(r0)
            col_offs.append(c0)
            hs.append(th)
            ws.append(tw)
            pixels.append(np.ascontiguousarray(arr[r0 : r0 + th, c0 : c0 + tw]).tobytes())
    return pa.table(
        {
            "cell": pa.array(cells, pa.int64()),
            "row_off": pa.array(row_offs, pa.int32()),
            "col_off": pa.array(col_offs, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "width": pa.array(ws, pa.int32()),
            "dtype": pa.array([str(arr.dtype)] * len(cells), pa.string()),
            "pixels": pa.array(pixels, pa.binary()),
        }
    )


def zone_windows(
    geoms_wkb: list[bytes],
    affine: Affine,
    boxify_cellsize: bool = True,
):
    """Per-zone snapped pixel window from WKB geometry (bounds_window
    parity, incl. point boxification shrinking — utils.py:125-145)."""
    from ..functions.geometry import from_wkb
    from ..functions.stats import boxify_points

    windows = []
    geoms = []
    for wkb in geoms_wkb:
        g = from_wkb(wkb)
        if g.is_point_type and boxify_cellsize:
            g = boxify_points(g, affine)
        geoms.append(g)
        windows.append(bounds_window(g.bounds, affine))
    return geoms, windows
