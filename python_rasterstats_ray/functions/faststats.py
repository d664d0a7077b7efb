"""Fast single-pass zone statistics on plain numpy (no np.ma).

The distributed kernels use these instead of the oracle's MaskedArray path
(main.py:230-302 semantics preserved; see stages/zonal_dist.py parity
notes). Differences vs the oracle are limited to float32 reduction
grouping for mean/sum/std (values identical to ~1e-6 relative); count,
min, max, median, percentiles, majority/minority/unique, nodata and nan
are exact.
"""

from __future__ import annotations

import numpy as np

from .windows import Window, boundless_array


def window_view(arr: np.ndarray, window: Window, nodata):
    """Zero-copy slice for in-extent windows; boundless nodata-filled copy
    otherwise."""
    (r0, r1), (c0, c1) = window
    h, w = arr.shape
    if 0 <= r0 and r1 <= h and 0 <= c0 and c1 <= w:
        return arr[r0:r1, c0:c1]
    return boundless_array(arr, window, nodata=nodata)


def zone_accumulators(block: np.ndarray, rv, nodata) -> dict:
    """Combinable partial accumulators for one (zone, block) pair.

    Mirrors the masking rules of main.py:196-208: nodata by float equality,
    NaN masked only when the block contains NaN, geometry-only mask for the
    nodata/nan counters. ``rv=None`` means full cover (every pixel in the
    geometry mask) and skips the boolean-index copy.
    """
    is_float = np.issubdtype(block.dtype, np.floating)
    gm = block.reshape(-1) if rv is None else block[rv]
    isnod = gm == nodata
    nodata_count = int(isnod.sum())
    if is_float:
        isnan = np.isnan(gm)
        nan_count = int(isnan.sum())
        # Window-level has_nan (oracle main.py:199-204) only changes the
        # output when NaN lies inside the geometry mask: the nan stat is
        # has_nan ? sum(nan_counts) : 0, and both are 0 when no masked
        # pixel is NaN — so gm-only detection is output-equivalent and
        # saves a full-block scan.
        tile_has_nan = bool(nan_count)
        if tile_has_nan:
            vals = gm[~(isnod | isnan)]
        else:
            vals = gm[~isnod]
    else:
        nan_count = 0
        tile_has_nan = False
        vals = gm[~isnod]

    count = int(vals.size)
    out = dict(
        count=count,
        sum_f=0.0,
        sum_i=0,
        sumsq=0.0,
        min=None,
        max=None,
        nodata=nodata_count,
        nan_cnt=nan_count,
        has_nan=tile_has_nan,
        is_int=not is_float,
        vals=vals,
    )
    if count:
        # dtype= reductions avoid the float64 materialized copy
        out["sum_f"] = float(vals.sum(dtype=np.float64))
        out["sumsq"] = float(np.square(vals, dtype=np.float64).sum())
        out["min"] = float(vals.min())
        out["max"] = float(vals.max())
        if not is_float:
            out["sum_i"] = int(vals.sum(dtype=np.int64))
    return out


def finalize_stats(
    stats: list[str],
    run_count: bool,
    *,
    count: int,
    sum_f: float,
    sum_i: int,
    sumsq: float,
    vmin,
    vmax,
    nodata_count: int,
    nan_count: int,
    has_nan: bool,
    is_int: bool,
    vals: np.ndarray | None,
) -> dict:
    """Accumulators -> final stat dict (main.py:230-302 formula parity;
    empty zone -> None/count=0; nodata/nan computed regardless)."""
    from .stats import get_percentile, key_assoc_val

    if count == 0:
        out = {s: None for s in stats}
        if "count" in stats:
            out["count"] = 0
        pixel_count: dict = {}
    else:
        pixel_count = {}
        if run_count and vals is not None:
            keys, counts = np.unique(vals, return_counts=True)
            pixel_count = dict(zip([k.item() for k in keys], [c.item() for c in counts]))
        out = {}
        if "min" in stats:
            out["min"] = float(vmin)
        if "max" in stats:
            out["max"] = float(vmax)
        if "mean" in stats:
            out["mean"] = (sum_i / count) if is_int else (sum_f / count)
        if "count" in stats:
            out["count"] = count
        if "sum" in stats:
            out["sum"] = float(sum_i) if is_int else sum_f
        if "std" in stats:
            mean = (sum_i / count) if is_int else (sum_f / count)
            out["std"] = float(np.sqrt(max(sumsq / count - mean * mean, 0.0)))
        if "median" in stats:
            out["median"] = float(np.median(vals))
        if "majority" in stats:
            out["majority"] = float(key_assoc_val(pixel_count, max))
        if "minority" in stats:
            out["minority"] = float(key_assoc_val(pixel_count, min))
        if "unique" in stats:
            out["unique"] = len(pixel_count)
        if "range" in stats:
            out["range"] = float(vmax) - float(vmin)
        for pct in (s for s in stats if s.startswith("percentile_")):
            out[pct] = float(np.percentile(vals, get_percentile(pct)))
    if "nodata" in stats:
        out["nodata"] = float(nodata_count)
    if "nan" in stats:
        out["nan"] = float(nan_count) if has_nan else 0.0
    return out, pixel_count
