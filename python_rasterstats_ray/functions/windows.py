"""Window algebra: bbox -> pixel window, boundless reads (pure numpy).

Parity targets: /root/reference/src/rasterstats/io.py:149-221 and the window
algebra tests in /root/reference/tests/test_io.py:192-257. ``bounds_window``
defines tile assignment for the distributed join (SURVEY.md section 2.4).
"""

from __future__ import annotations

import math

import numpy as np

from .affine import Affine, rowcol

Window = tuple[tuple[int, int], tuple[int, int]]


def bounds_window(bounds, affine: Affine) -> Window:
    """Full-cover window ((row_start, row_stop), (col_start, col_stop))."""
    w, s, e, n = bounds
    row_start, col_start = rowcol(w, n, affine)
    row_stop, col_stop = rowcol(e, s, affine, op=math.ceil)
    return (row_start, row_stop), (col_start, col_stop)


def window_bounds(window: Window, affine: Affine):
    """Window -> (w, s, e, n) world bounds."""
    (row_start, row_stop), (col_start, col_stop) = window
    w, s = affine * (col_start, row_stop)
    e, n = affine * (col_stop, row_start)
    return w, s, e, n


def beyond_extent(window: Window, shape) -> bool:
    """True if the window references pixels beyond the raster extent."""
    (wr_start, wr_stop), (wc_start, wc_stop) = window
    return wr_start < 0 or wc_start < 0 or wr_stop > shape[0] or wc_stop > shape[1]


def window_affine(window: Window, affine: Affine) -> Affine:
    """Affine re-anchored to the window origin (io.py:328-330)."""
    c, _, _, f = window_bounds(window, affine)
    return Affine(affine.a, affine.b, c, affine.d, affine.e, f)


def boundless_array(arr: np.ndarray, window: Window, nodata, masked: bool = False):
    """Windowed slice of ``arr`` padded with ``nodata`` outside the extent.

    2D or 3D (band-first) arrays; parity with io.py:177-221 including the
    ``masked`` post-mask ``out == nodata``.
    """
    if arr.ndim == 3:
        dim3 = True
    elif arr.ndim == 2:
        dim3 = False
    else:
        raise ValueError("Must be a 2D or 3D array")

    (wr_start, wr_stop), (wc_start, wc_stop) = window
    nrows, ncols = arr.shape[-2:]

    olr_start = max(min(wr_start, nrows), 0)
    olr_stop = max(min(wr_stop, nrows), 0)
    olc_start = max(min(wc_start, ncols), 0)
    olc_stop = max(min(wc_stop, ncols), 0)

    overlap_shape = (olr_stop - olr_start, olc_stop - olc_start)
    if dim3:
        window_shape = (arr.shape[0], wr_stop - wr_start, wc_stop - wc_start)
    else:
        window_shape = (wr_stop - wr_start, wc_stop - wc_start)

    out = np.empty(shape=window_shape, dtype=arr.dtype)
    out[:] = nodata

    nr_start = olr_start - wr_start
    nr_stop = nr_start + overlap_shape[0]
    nc_start = olc_start - wc_start
    nc_stop = nc_start + overlap_shape[1]
    if dim3:
        out[:, nr_start:nr_stop, nc_start:nc_stop] = arr[:, olr_start:olr_stop, olc_start:olc_stop]
    else:
        out[nr_start:nr_stop, nc_start:nc_stop] = arr[olr_start:olr_stop, olc_start:olc_stop]

    if masked:
        out = np.ma.MaskedArray(out, mask=(out == nodata))
    return out
