"""Distributed point query: raster sampling at point coordinates as a
vectorized map_batches stage (broadcast raster).

Parity with the sequential oracle (functions/point.py, itself parity with
reference point.py): banker's-rounding 2x2 window centering, bilinear
blend, masked -> nearest-neighbor fallback -> null; nearest mode masks
nodata only. Unlike the oracle's per-vertex 1x1/2x2 window reads, the whole
batch is one numpy gather.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.affine import Affine


def _gather_boundless(arr: np.ndarray, rows: np.ndarray, cols: np.ndarray, nodata):
    """arr[rows, cols] with out-of-extent -> nodata (vectorized)."""
    h, w = arr.shape
    valid = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
    out = np.full(rows.shape, nodata, dtype=np.float64)
    out[valid] = arr[rows[valid], cols[valid]].astype(np.float64)
    return out


class PointQueryKernel:
    """map_batches kernel: (x, y) columns -> interpolated raster value."""

    def __init__(self, raster_ref, interpolate: str = "bilinear",
                 x_col: str = "x", y_col: str = "y", value_col: str = "value"):
        import ray

        arr, affine, nodata = ray.get(raster_ref)
        if arr.ndim == 3:
            arr = arr[0]
        self.arr = arr
        self.affine = affine
        self.nodata = -999.0 if nodata is None else float(nodata)
        if interpolate not in ("nearest", "bilinear"):
            raise ValueError("interpolate must be nearest or bilinear")
        self.interpolate = interpolate
        self.x_col = x_col
        self.y_col = y_col
        self.value_col = value_col

    def _values(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        inv = ~self.affine
        fcol = inv.a * x + inv.b * y + inv.c
        frow = inv.d * x + inv.e * y + inv.f

        if self.interpolate == "nearest":
            r = np.floor(frow).astype(np.int64)
            c = np.floor(fcol).astype(np.int64)
            vals = _gather_boundless(self.arr, r, c, self.nodata)
            return np.where(vals == self.nodata, np.nan, vals)

        # bilinear: banker's rounding window centering (point.py:18 parity)
        r = np.round(frow).astype(np.int64)
        c = np.round(fcol).astype(np.int64)
        ux = 0.5 - (c - fcol)
        uy = 0.5 + (r - frow)
        ul = _gather_boundless(self.arr, r - 1, c - 1, self.nodata)
        ur = _gather_boundless(self.arr, r - 1, c, self.nodata)
        ll = _gather_boundless(self.arr, r, c - 1, self.nodata)
        lr = _gather_boundless(self.arr, r, c, self.nodata)
        m_ul, m_ur = ul == self.nodata, ur == self.nodata
        m_ll, m_lr = ll == self.nodata, lr == self.nodata
        n_masked = (
            m_ul.astype(np.int8) + m_ur.astype(np.int8)
            + m_ll.astype(np.int8) + m_lr.astype(np.int8)
        )
        blend = (
            ll * (1 - ux) * (1 - uy)
            + lr * ux * (1 - uy)
            + ul * (1 - ux) * uy
            + ur * ux * uy
        )
        # nearest fallback within the 2x2 unit square (round half-even)
        rr = np.round(1.0 - uy).astype(np.int64)  # 0 -> upper row, 1 -> lower
        cc = np.round(ux).astype(np.int64)
        near = np.choose(rr * 2 + cc, [ul, ur, ll, lr])
        near_masked = near == self.nodata
        out = np.where(n_masked == 0, blend, np.where(near_masked, np.nan, near))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch[self.x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[self.y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        vals = self._values(x, y)
        mask = np.isnan(vals)
        arr = pa.array(vals, pa.float64(), from_pandas=True)  # NaN -> null
        return batch.append_column(self.value_col, arr)


class FeaturePointQueryKernel(PointQueryKernel):
    """Per-feature vertex query (gen_point_query parity, point.py:101-207):
    each input row carries a WKB geometry; output is the per-vertex value
    list (nulls where masked), flattened to a scalar column for
    single-vertex geometries alongside the list column."""

    def __init__(self, raster_ref, interpolate: str = "bilinear",
                 geom_col: str = "geom_wkb", value_col: str = "values"):
        super().__init__(raster_ref, interpolate=interpolate, value_col=value_col)
        self.geom_col = geom_col

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        from ..functions.geometry import from_wkb

        wkbs = batch[self.geom_col].to_pylist()
        offsets = [0]
        xs, ys = [], []
        for wkb in wkbs:
            v = from_wkb(wkb).vertex_array()
            xs.append(v[:, 0])
            ys.append(v[:, 1])
            offsets.append(offsets[-1] + len(v))
        flat_x = np.concatenate(xs) if xs else np.empty(0)
        flat_y = np.concatenate(ys) if ys else np.empty(0)
        vals = self._values(flat_x, flat_y)
        lists = [
            [None if np.isnan(v) else float(v) for v in vals[offsets[i] : offsets[i + 1]]]
            for i in range(len(wkbs))
        ]
        scalars = [lst[0] if len(lst) == 1 else None for lst in lists]
        out = batch.append_column(self.value_col, pa.array(lists, pa.list_(pa.float64())))
        out = out.append_column(
            f"{self.value_col}_scalar", pa.array(scalars, pa.float64())
        )
        return out


def point_query_features(
    features_ds,
    raster,
    affine=None,
    nodata=None,
    *,
    interpolate: str = "bilinear",
    geom_col: str = "geom_wkb",
    concurrency=None,
    batch_size: int = 1024,
):
    """Features Dataset (with WKB geometry) -> per-vertex value lists."""
    import ray
    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()

    if isinstance(raster, tuple):
        arr, affine, nodata = raster
    else:
        arr = raster
    raster_ref = ray.put((arr, affine, nodata))
    return features_ds.map_batches(
        FeaturePointQueryKernel,
        fn_constructor_kwargs=dict(
            raster_ref=raster_ref, interpolate=interpolate, geom_col=geom_col
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def point_query_broadcast(
    points_ds,
    raster,
    affine=None,
    nodata=None,
    *,
    interpolate: str = "bilinear",
    x_col: str = "x",
    y_col: str = "y",
    concurrency=None,
    batch_size: int = 4096,
):
    """Points Dataset x in-memory raster -> Dataset with a ``value`` column
    (null where masked/off-grid, matching oracle None semantics)."""
    import ray
    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()

    if isinstance(raster, tuple):
        arr, affine, nodata = raster
    else:
        arr = raster
    raster_ref = ray.put((arr, affine, nodata))
    return points_ds.map_batches(
        PointQueryKernel,
        fn_constructor_kwargs=dict(
            raster_ref=raster_ref, interpolate=interpolate, x_col=x_col, y_col=y_col
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        zero_copy_batch=True,
    )
