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


def interp_values(x, y, affine, nodata, interpolate, gather):
    """Shared interpolation math for every distributed point plan:
    world (x, y) -> sampled value (NaN where masked / off-grid).

    ``gather(rows, cols) -> float64`` supplies pixel values with
    out-of-extent -> ``nodata`` — the broadcast plan backs it with one
    in-memory array, the tiled plans with per-cell tile lookups. Keeping
    the blend / banker's-rounding / masked->nearest->None logic in ONE
    function is what makes the plans bit-identical by construction
    (reference point.py:18,177-196 parity)."""
    inv = ~affine
    fcol = inv.a * x + inv.b * y + inv.c
    frow = inv.d * x + inv.e * y + inv.f

    if interpolate == "nearest":
        r = np.floor(frow).astype(np.int64)
        c = np.floor(fcol).astype(np.int64)
        vals = gather(r, c)
        return np.where(vals == nodata, np.nan, vals)

    # bilinear: banker's rounding window centering (point.py:18 parity)
    r = np.round(frow).astype(np.int64)
    c = np.round(fcol).astype(np.int64)
    ux = 0.5 - (c - fcol)
    uy = 0.5 + (r - frow)
    ul = gather(r - 1, c - 1)
    ur = gather(r - 1, c)
    ll = gather(r, c - 1)
    lr = gather(r, c)
    m_ul, m_ur = ul == nodata, ur == nodata
    m_ll, m_lr = ll == nodata, lr == nodata
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
    near_masked = near == nodata
    return np.where(n_masked == 0, blend, np.where(near_masked, np.nan, near))


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
        return interp_values(
            x, y, self.affine, self.nodata, self.interpolate,
            lambda r, c: _gather_boundless(self.arr, r, c, self.nodata),
        )

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


# ================================================== tiled point query
# The non-broadcastable-raster plans: the raster never enters any worker
# whole. point_query_tiled routes each point to the cell of its sampling
# window and a per-cell kernel fetches ONLY that cell's tile(s) through
# the zonal refmap (tiles pinned once in the object store, zero payload
# shuffle — only thin point rows move). point_query_from_store does the
# same over a write_tiles_bucketed parquet layout with targeted
# core+halo partition reads — zero exchange AND zero object-store pin.
# Both share interp_values with the broadcast plan, so the reference
# semantics (point.py:18 banker's-rounding window, point.py:177-196
# masked->nearest->None fallback) are bit-identical by construction.


def tag_points_cells(
    batch: pa.Table,
    affine,
    tile_size: int,
    x_col: str = "x",
    y_col: str = "y",
    shape=None,
) -> pa.Table:
    """Points batch -> + (cell, cell_h) columns: the owning tile of the
    pixel under each point (floor grid coords). Routing-only — the kernel
    re-derives every needed pixel exactly, so owner choice affects
    locality, never values. With ``shape`` the owner is clamped into the
    tile grid (the from-store plan's core+halo coverage guarantee);
    without it, off-grid owners are fine (the refmap returns no tile and
    the gather yields nodata). cell_h is the splitmix64-mixed shuffle key
    (raw cell ids cluster spatially -> skewed range partitions)."""
    from ..sources.tiles import cell_id
    from .zonal_dist import _mix64

    x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
    y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
    inv = ~affine
    fcol = inv.a * x + inv.b * y + inv.c
    frow = inv.d * x + inv.e * y + inv.f
    r = np.floor(frow).astype(np.int64)
    c = np.floor(fcol).astype(np.int64)
    if shape is not None:
        h, w = shape
        r = np.clip(r, 0, max(h - 1, 0))
        c = np.clip(c, 0, max(w - 1, 0))
    cells = cell_id(np.floor_divide(r, tile_size), np.floor_divide(c, tile_size))
    batch = batch.append_column("cell", pa.array(cells, pa.int64()))
    return batch.append_column("cell_h", pa.array(_mix64(cells), pa.int64()))


class TiledPointQueryKernel:
    """Per-cell-group kernel over the object-store tile refmap: gathers
    each needed pixel from its own tile (a bilinear window can straddle
    up to 4 tiles; the reader keeps the few touched superblocks
    resident). Off-refmap pixels read as nodata — boundless parity with
    _gather_boundless."""

    def __init__(self, refmap_ref, affine, nodata, tile_size: int,
                 interpolate: str = "bilinear",
                 x_col: str = "x", y_col: str = "y", value_col: str = "value"):
        if interpolate not in ("nearest", "bilinear"):
            raise ValueError("interpolate must be nearest or bilinear")
        self.refmap_ref = refmap_ref
        self.affine = affine
        self.nodata = -999.0 if nodata is None else float(nodata)
        self.tile_size = tile_size
        self.interpolate = interpolate
        self.x_col = x_col
        self.y_col = y_col
        self.value_col = value_col
        self._reader = None

    def _gather(self, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
        from ..sources.tiles import cell_id

        out = np.full(rows.shape, self.nodata, dtype=np.float64)
        if rows.size == 0:
            return out
        if self._reader is None:
            from .zonal_dist import TileRefmapReader

            # a 2x2 window can straddle a superblock boundary in both axes
            self._reader = TileRefmapReader(self.refmap_ref, max_resident=4)
        ts = self.tile_size
        cells = cell_id(np.floor_divide(rows, ts), np.floor_divide(cols, ts))
        for ucell in np.unique(cells):
            found = self._reader.lookup(int(ucell))
            if found is None:
                continue  # beyond the raster extent -> nodata
            arr, roff, coff = found
            sel = cells == ucell
            lr = rows[sel] - roff
            lc = cols[sel] - coff
            ok = (lr >= 0) & (lr < arr.shape[0]) & (lc >= 0) & (lc < arr.shape[1])
            vals = np.full(int(sel.sum()), self.nodata, dtype=np.float64)
            vals[ok] = arr[lr[ok], lc[ok]].astype(np.float64)
            out[sel] = vals
        return out

    def __call__(self, group: pa.Table) -> pa.Table:
        base = group.drop_columns(["cell", "cell_h"])
        if len(group) == 0:
            return base.append_column(self.value_col, pa.array([], pa.float64()))
        x = group[self.x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = group[self.y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        vals = interp_values(
            x, y, self.affine, self.nodata, self.interpolate, self._gather
        )
        return base.append_column(
            self.value_col, pa.array(vals, pa.float64(), from_pandas=True)
        )


def point_query_tiled(
    points_ds,
    tiles_ds,
    affine,
    nodata,
    *,
    interpolate: str = "bilinear",
    tile_size: int = 256,
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "value",
    checkpoint_before_shuffle: bool = True,
):
    """Distributed point query for a NON-broadcastable raster: the tile
    Dataset is pinned once via build_tile_refmap (superblocked, zero
    payload shuffle) and points — the only thing that moves — hash to
    their owning cell. Output: the input point columns + ``value_col``
    (null where masked/off-grid), bit-identical to point_query_broadcast.

    ``checkpoint_before_shuffle``: the sort-based groupby samples then
    re-executes its input; materializing the thin tagged rows (id+x+y
    per point) removes the recompute at no extra peak memory."""
    from .zonal_dist import build_tile_refmap

    refmap_ref, _block_refs = build_tile_refmap(tiles_ds)
    tagged = points_ds.map_batches(
        tag_points_cells,
        fn_kwargs=dict(affine=affine, tile_size=tile_size, x_col=x_col, y_col=y_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if checkpoint_before_shuffle:
        tagged = tagged.materialize()
    kernel = TiledPointQueryKernel(
        refmap_ref, affine, nodata, tile_size,
        interpolate=interpolate, x_col=x_col, y_col=y_col, value_col=value_col,
    )

    def run_cell(group: pa.Table) -> pa.Table:
        return kernel(group)

    return tagged.groupby("cell_h").map_groups(run_cell, batch_format="pyarrow")


class PointStoreQueryKernel:
    """Per-cell-group kernel over a write_tiles_bucketed store: TWO
    targeted parquet reads (core/cell=k + halo/cell=k) assemble the
    tile's 1-pixel-haloed window buffer, then one vectorized gather.
    Owner cells are grid-clamped at tag time, which guarantees every
    in-extent pixel of every point's 2x2 window lies inside this
    buffer; everything else is nodata (boundless parity)."""

    def __init__(self, store_path: str, shape, affine, nodata, tile_size: int,
                 interpolate: str = "bilinear",
                 x_col: str = "x", y_col: str = "y", value_col: str = "value"):
        if interpolate not in ("nearest", "bilinear"):
            raise ValueError("interpolate must be nearest or bilinear")
        self.store_path = store_path
        self.shape = shape
        self.affine = affine
        self.nodata = -999.0 if nodata is None else float(nodata)
        self.tile_size = tile_size
        self.interpolate = interpolate
        self.x_col = x_col
        self.y_col = y_col
        self.value_col = value_col

    def _load_window(self, cell: int):
        """(buf, got, r_lo, c_lo): the cell's core + 1px halo as a dense
        float64 buffer with a coverage mask, origin (r_lo, c_lo)."""
        import os

        import pyarrow.parquet as pq

        from ..sources.tiles import cell_decode

        h, w = self.shape
        ts = self.tile_size
        tr, tc = cell_decode(cell)
        r0, c0 = tr * ts, tc * ts
        th = min(ts, h - r0)
        tw = min(ts, w - c0)
        r_lo, c_lo = r0 - 1, c0 - 1
        buf = np.full((th + 2, tw + 2), self.nodata, dtype=np.float64)
        got = np.zeros_like(buf, dtype=bool)
        cols = ["row_off", "col_off", "height", "width", "dtype", "pixels"]
        parts = []
        core_dir = os.path.join(self.store_path, f"core/cell={cell}")
        if os.path.isdir(core_dir):
            parts.append(pq.read_table(core_dir, columns=cols))
        halo_dir = os.path.join(self.store_path, f"halo/cell={cell}")
        if os.path.isdir(halo_dir):
            parts.append(pq.read_table(halo_dir, columns=cols))
        for tbl in parts:
            for i in range(len(tbl)):
                fr0 = tbl["row_off"][i].as_py()
                fc0 = tbl["col_off"][i].as_py()
                fh = tbl["height"][i].as_py()
                fw = tbl["width"][i].as_py()
                dt = np.dtype(tbl["dtype"][i].as_py())
                frag = np.frombuffer(tbl["pixels"][i].as_buffer(), dtype=dt)
                frag = frag.reshape(fh, fw)
                # staged radius may exceed 1: clip fragments to the buffer
                a0, b0 = max(fr0, r_lo), max(fc0, c_lo)
                a1 = min(fr0 + fh, r_lo + buf.shape[0])
                b1 = min(fc0 + fw, c_lo + buf.shape[1])
                if a1 <= a0 or b1 <= b0:
                    continue
                sub = frag[a0 - fr0 : a1 - fr0, b0 - fc0 : b1 - fc0]
                buf[a0 - r_lo : a1 - r_lo, b0 - c_lo : b1 - c_lo] = sub.astype(
                    np.float64
                )
                got[a0 - r_lo : a1 - r_lo, b0 - c_lo : b1 - c_lo] = True
        return buf, got, r_lo, c_lo

    def __call__(self, group: pa.Table) -> pa.Table:
        base = group.drop_columns(["cell", "cell_h"])
        if len(group) == 0:
            return base.append_column(self.value_col, pa.array([], pa.float64()))
        cell = int(group["cell"][0].as_py())
        buf, got, r_lo, c_lo = self._load_window(cell)

        def gather(rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
            lr = rows - r_lo
            lc = cols - c_lo
            inb = (lr >= 0) & (lr < buf.shape[0]) & (lc >= 0) & (lc < buf.shape[1])
            lrc = np.clip(lr, 0, buf.shape[0] - 1)
            lcc = np.clip(lc, 0, buf.shape[1] - 1)
            ok = inb & got[lrc, lcc]
            return np.where(ok, buf[lrc, lcc], self.nodata)

        x = group[self.x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = group[self.y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        vals = interp_values(
            x, y, self.affine, self.nodata, self.interpolate, gather
        )
        return base.append_column(
            self.value_col, pa.array(vals, pa.float64(), from_pandas=True)
        )


def point_query_from_store(
    points_ds,
    store_path: str,
    shape,
    affine,
    nodata,
    *,
    interpolate: str = "bilinear",
    tile_size: int = 256,
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "value",
    checkpoint_before_shuffle: bool = True,
):
    """Point query over a write_tiles_bucketed(radius>=1) parquet store:
    the pay-once staged layout shared with the focal/zonal store plans.
    No object-store pin, no tile shuffle — each cell group is two
    targeted partition reads. Owner cells are clamped into the grid so
    far-off-extent points route to the nearest edge tile and null out
    there (their windows gather nothing). Bit-identical to
    point_query_broadcast / point_query_tiled."""
    tagged = points_ds.map_batches(
        tag_points_cells,
        fn_kwargs=dict(
            affine=affine, tile_size=tile_size, x_col=x_col, y_col=y_col,
            shape=tuple(shape),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if checkpoint_before_shuffle:
        tagged = tagged.materialize()
    kernel = PointStoreQueryKernel(
        store_path, tuple(shape), affine, nodata, tile_size,
        interpolate=interpolate, x_col=x_col, y_col=y_col, value_col=value_col,
    )

    def run_cell(group: pa.Table) -> pa.Table:
        return kernel(group)

    return tagged.groupby("cell_h").map_groups(run_cell, batch_format="pyarrow")
