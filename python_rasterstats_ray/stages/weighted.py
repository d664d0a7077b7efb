"""Coverage-weighted zonal statistics (exactextract-style).

The reference's rasterize rule is binary (a pixel is in or out by its
center — reference ``utils.py:33-55``); tools like exactextract instead
weight each boundary pixel by the FRACTION of its cell the zone covers.
This module adds that operator for AXIS-ALIGNED RECTANGLE zones, where
the coverage fraction has a closed form per axis:

    cov_x(col) = max(0, min(xmax, col+1) - max(xmin, col))
    weight(r, c) = cov_x(c) * cov_y(r)

Exactness scheme: zone bounds are snapped to a 1e-4 grid (the oracle
fixtures guarantee this), so both sides scale bounds by ``scale=10000``
and ROUND to int64 once; every weight, product and sum thereafter is
pure int64 arithmetic — order-independent, so the distributed
accumulation is bit-identical to the SQL mirror's, and the only float
ops are the same final divides. Weighted sums bound: scale^2 * val *
px_per_zone must fit int64 (~9e18) — at scale 1e4 and 16-bit values
that allows ~10^10 pixels per zone.

Physical plan: broadcast raster (``ray.put`` once) into an actor-pool
``map_batches`` over the zone table — the ST1 shape (reference holds
the raster open across features, ``main.py:181``). Zones whose bbox
misses the raster entirely yield coverage 0 with null stats.

Contract: the RECTANGLE is the zone's bbox — for non-rectangular WKB
input this computes bbox-coverage weighting, not polygon clipping; a
general polygon-clipping weight needs per-cell polygon area (out of
scope, documented limitation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["zonal_weighted_broadcast", "zonal_weighted_by_raster_broadcast"]


class _WeightedKernel:
    """Actor-pool kernel: raster fetched once in __init__, per-batch
    vectorized coverage-weighted accumulation in int64."""

    def __init__(self, raster_ref, scale: int):
        import ray

        arr, affine, nodata = ray.get(raster_ref)
        # pixel-space exactness needs a north-up unit-pixel grid (the
        # module docstring's integer argument); rescale general affines
        # to pixel coords first
        self.arr = np.asarray(arr)
        self.affine = affine
        self.nodata = nodata
        self.scale = int(scale)
        self.h, self.w = self.arr.shape

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.geometry import from_wkb

        S = self.scale
        a, b, c, d, e, f = self.affine
        if b or d:
            raise ValueError("sheared affines unsupported")
        zids, cov_o, mean_o, sum_o = [], [], [], []
        for zid, wkb in zip(batch["zone_id"].to_pylist(), batch["geom_wkb"].to_pylist()):
            g = from_wkb(wkb)
            xmin, ymin, xmax, ymax = g.bounds
            # world -> pixel coords (x: cols via a,c; y: rows via e,f)
            px0, px1 = (xmin - c) / a, (xmax - c) / a
            py0, py1 = (ymax - f) / e, (ymin - f) / e  # e < 0: north-up
            xi = int(np.round(min(px0, px1) * S))
            xa = int(np.round(max(px0, px1) * S))
            yi = int(np.round(min(py0, py1) * S))
            ya = int(np.round(max(py0, py1) * S))
            c0 = max(0, xi // S)
            c1 = min(self.w, -(-xa // S))
            r0 = max(0, yi // S)
            r1 = min(self.h, -(-ya // S))
            if c1 <= c0 or r1 <= r0:
                zids.append(zid)
                cov_o.append(0.0)
                mean_o.append(None)
                sum_o.append(None)
                continue
            cols = np.arange(c0, c1, dtype=np.int64)
            rows = np.arange(r0, r1, dtype=np.int64)
            wx = np.minimum(xa, (cols + 1) * S) - np.maximum(xi, cols * S)
            wy = np.minimum(ya, (rows + 1) * S) - np.maximum(yi, rows * S)
            wx = np.maximum(wx, 0)
            wy = np.maximum(wy, 0)
            win = self.arr[r0:r1, c0:c1].astype(np.float64)
            valid = win != float(self.nodata)
            vals = np.where(valid, win, 0.0).astype(np.int64)
            wgt = wy.reshape(-1, 1) * wx.reshape(1, -1)  # int64
            wall = int(wgt.sum())
            wtot = int((wgt * valid).sum())
            wsum = int((wgt * vals).sum())
            zids.append(zid)
            cov_o.append(wall / (S * S))
            mean_o.append(wsum / wtot if wtot else None)
            sum_o.append(wsum / (S * S) if wtot else None)
        return pa.table(
            {
                "zone_id": pa.array(zids, pa.int64()),
                "coverage_px": pa.array(cov_o, pa.float64()),
                "wmean": pa.array(mean_o, pa.float64()),
                "wsum": pa.array(sum_o, pa.float64()),
            }
        )


def zonal_weighted_broadcast(zones_ds, raster, scale: int = 10_000, concurrency=None):
    """Coverage-weighted zonal stats over rectangle zones: per zone,
    ``coverage_px`` (geometric cell coverage incl. nodata cells),
    ``wmean`` (coverage-weighted mean of valid pixels) and ``wsum``
    (coverage-weighted sum), null where no valid pixel is covered.
    Raster values must be integer-valued for the bit-exactness argument
    (the op itself works for any values at float accuracy)."""
    import ray

    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()
    ref = ray.put(raster)
    return zones_ds.map_batches(
        _WeightedKernel,
        fn_constructor_args=(ref, scale),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=64,
        zero_copy_batch=True,
    ).sort("zone_id")


class _WeightedByRasterKernel:
    """Actor-pool kernel: VALUE and WEIGHT rasters fetched once in
    __init__, per-batch integer accumulation over center-rule pixels."""

    def __init__(self, ref, scale: int):
        import ray

        varr, warr, affine, v_nodata, w_nodata = ray.get(ref)
        self.varr = np.asarray(varr)
        self.warr = np.asarray(warr)
        if self.varr.shape != self.warr.shape:
            raise ValueError("value and weight rasters must be grid-aligned")
        self.affine = affine
        self.v_nodata = v_nodata
        self.w_nodata = w_nodata
        self.scale = int(scale)
        self.h, self.w = self.varr.shape

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.geometry import from_wkb

        S = self.scale
        a, b, c, d, e, f = self.affine
        if b or d:
            raise ValueError("sheared affines unsupported")
        zids, n_o, wt_o, ws_o, wm_o = [], [], [], [], []
        for zid, wkb in zip(batch["zone_id"].to_pylist(), batch["geom_wkb"].to_pylist()):
            g = from_wkb(wkb)
            xmin, ymin, xmax, ymax = g.bounds
            px0, px1 = (xmin - c) / a, (xmax - c) / a
            py0, py1 = (ymax - f) / e, (ymin - f) / e
            xi = int(np.round(min(px0, px1) * S))
            xa = int(np.round(max(px0, px1) * S))
            yi = int(np.round(min(py0, py1) * S))
            ya = int(np.round(max(py0, py1) * S))
            c0 = max(0, xi // S - 1)
            c1 = min(self.w, -(-xa // S) + 1)
            r0 = max(0, yi // S - 1)
            r1 = min(self.h, -(-ya // S) + 1)
            if c1 <= c0 or r1 <= r0:
                zids.append(zid)
                n_o.append(0)
                wt_o.append(None)
                ws_o.append(None)
                wm_o.append(None)
                continue
            cols = np.arange(c0, c1, dtype=np.int64)
            rows = np.arange(r0, r1, dtype=np.int64)
            # strict center rule in scaled ints: (2c+1)S strictly inside
            mx = ((2 * cols + 1) * S > 2 * xi) & ((2 * cols + 1) * S < 2 * xa)
            my = ((2 * rows + 1) * S > 2 * yi) & ((2 * rows + 1) * S < 2 * ya)
            if not (mx.any() and my.any()):
                zids.append(zid)
                n_o.append(0)
                wt_o.append(None)
                ws_o.append(None)
                wm_o.append(None)
                continue
            rs, cs = rows[my], cols[mx]
            vwin = self.varr[np.ix_(rs, cs)].astype(np.float64)
            wwin = self.warr[np.ix_(rs, cs)].astype(np.float64)
            ok = (vwin != float(self.v_nodata)) & (wwin != float(self.w_nodata))
            v = np.rint(vwin[ok]).astype(np.int64)
            w = np.rint(wwin[ok]).astype(np.int64)
            n = int(ok.sum())
            wtot = int(w.sum())
            wsum = int((w * v).sum())
            zids.append(zid)
            n_o.append(n)
            wt_o.append(wtot if n else None)
            ws_o.append(wsum if n else None)
            wm_o.append(wsum / wtot if n and wtot else None)
        return pa.table(
            {
                "zone_id": pa.array(zids, pa.int64()),
                "n_px": pa.array(n_o, pa.int64()),
                "wtot": pa.array(wt_o, pa.int64()),
                "wsum": pa.array(ws_o, pa.int64()),
                "wmean": pa.array(wm_o, pa.float64()),
            }
        )


def zonal_weighted_by_raster_broadcast(
    zones_ds, value_raster, weight_raster, scale: int = 10_000, concurrency=None
):
    """Zonal stats of a VALUE raster weighted by a second, grid-aligned
    WEIGHT raster (exactextract ``weighted_mean`` / ``weighted_sum``
    with a weight raster): per rect zone over CENTER-RULE pixels where
    BOTH rasters are valid, n_px, wtot = sum(w), wsum = sum(w*v) as
    exact int64, wmean = wsum/wtot as the one float divide (null when
    no pixel or zero total weight). Both rasters broadcast once via one
    ``ray.put``; actor-pool map_batches over the zone table (ST1
    shape). ``value_raster``/``weight_raster``: (arr, affine, nodata)
    with identical grids."""
    import ray

    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()
    varr, affine, v_nodata = value_raster
    warr, w_affine, w_nodata = weight_raster
    if tuple(w_affine) != tuple(affine):
        raise ValueError("value and weight rasters must share one grid")
    ref = ray.put((varr, warr, affine, v_nodata, w_nodata))
    return zones_ds.map_batches(
        _WeightedByRasterKernel,
        fn_constructor_args=(ref, scale),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=64,
        zero_copy_batch=True,
    ).sort("zone_id")
