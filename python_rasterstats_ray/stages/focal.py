"""Focal (stencil), resample and map-algebra raster operators.

The reference has no focal ops (rasterstats is zonal/point only), but a
raster engine needs the stencil operator class: every output pixel
depends on a (2r+1)^2 neighborhood, so tiles need a radius-r HALO from
their 8 neighbors. The distributed plan here:

1. ``tile_fragments``: flat-map each tile into fragment rows keyed by
   the TARGET cell — the whole tile to itself plus thin radius-r edge
   strips to each existing neighbor (the classic ghost-cell exchange).
2. ``groupby(cell).map_groups``: assemble the padded (h+2r, w+2r)
   window (missing fragments = beyond-extent = invalid) and compute the
   focal kernel over the core via integral-image box sums — one
   vectorized pass, no per-pixel Python.

Pixels cross the exchange exactly once (core + strips ~= (1 + 4r/T) of
the raster for tile size T) — the textbook stencil all-to-all. At 100 TB
the core move disappears entirely by keeping tiles CELL-PARTITIONED on
shared storage (``stages/bucketed.py`` shape): then only the strip table
(4r/T of the data) shuffles and each kernel reads its own tile straight
from its partition, mirroring ``zonal_stats_tiled_from_store``.

``downsample_mean`` (factor-f mean pooling) needs no halo: per-tile
partials + a thin (coarse_key, cnt, sum) merge handles tiles that
straddle coarse blocks. ``raster_calc_tiled`` (map algebra over two
grid-aligned rasters) co-locates operand tiles with one union +
groupby(cell) — at scale both operands would be cell-partitioned at
write time and the exchange vanishes the same way.

Sums/cumsums run in float64 over integer-valued pixels, so every partial
is exactly representable (< 2^53) and results are bit-identical to the
SQL oracles' sum/count/divide regardless of accumulation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.tiles import cell_decode, cell_id

__all__ = [
    "focal_mean_tiled",
    "focal_slope_tiled",
    "focal_terrain_tiled",
    "sample_terrain_pixels",
    "focal_minmax_tiled",
    "focal_majority_tiled",
    "focal_median_tiled",
    "sample_median_pixels",
    "focal_std_tiled",
    "raster_value_quantiles",
    "contour_crossings",
    "contour_polylines",
    "cost_distance_tiled",
    "sample_cost_pixels",
    "sample_alloc_pixels",
    "sample_wcost_pixels",
    "reclassify_tiled",
    "flow_direction_tiled",
    "flow_trace",
    "flow_accumulation",
    "flow_accumulation_from_store",
    "warp_nearest_tiled",
    "warp_bilinear_tiled",
    "downsample_mean",
    "downsample_mode",
    "pyramid_levels",
    "raster_calc_tiled",
    "raster_crosstab",
    "sample_focal_pixels",
    "sample_calc_pixels",
    "sample_slope_pixels",
    "sample_minmax_pixels",
    "sample_hillshade_pixels",
    "sample_pixel_centers",
]


def _tile_arrays(batch: pa.Table):
    """Zero-copy-ish decode of tile rows -> list of (cell, r0, c0, ndarray)."""
    cells = batch["cell"].to_numpy()
    r0s = batch["row_off"].to_numpy()
    c0s = batch["col_off"].to_numpy()
    hs = batch["height"].to_numpy()
    ws = batch["width"].to_numpy()
    dts = batch["dtype"].to_pylist()
    pix = batch["pixels"]
    out = []
    for i in range(len(batch)):
        buf = pix[i].as_buffer()
        arr = np.frombuffer(buf, dtype=np.dtype(dts[i])).reshape(int(hs[i]), int(ws[i]))
        out.append((int(cells[i]), int(r0s[i]), int(c0s[i]), arr))
    return out


def _n_tiles(shape: tuple[int, int], tile_size: int) -> tuple[int, int]:
    h, w = shape
    return (h + tile_size - 1) // tile_size, (w + tile_size - 1) // tile_size


def tile_fragments(
    batch: pa.Table, shape: tuple[int, int], tile_size: int, radius: int
) -> pa.Table:
    """One tile -> <= 9 fragment rows keyed by TARGET cell: itself whole,
    plus radius-wide strips to every in-raster neighbor. Fragment geometry
    is absolute pixel offsets, so assembly is a pure index placement."""
    ntr, ntc = _n_tiles(shape, tile_size)
    cells, fro, fco, fh, fw, dts, payload = [], [], [], [], [], [], []
    for cell, r0, c0, arr in _tile_arrays(batch):
        tr, tc = cell_decode(cell)
        th, tw = arr.shape
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                qr, qc = tr + dr, tc + dc
                if not (0 <= qr < ntr and 0 <= qc < ntc):
                    continue
                # slice of THIS tile the target (qr, qc) needs in its halo:
                # a target BELOW (dr=1) needs this tile's BOTTOM rows, etc.
                rs = slice(0, th) if dr == 0 else (
                    slice(max(0, th - radius), th) if dr == 1 else slice(0, min(radius, th))
                )
                cs = slice(0, tw) if dc == 0 else (
                    slice(max(0, tw - radius), tw) if dc == 1 else slice(0, min(radius, tw))
                )
                frag = arr[rs, cs]
                if frag.size == 0:
                    continue
                cells.append(int(cell_id(qr, qc)))
                fro.append(r0 + rs.start)
                fco.append(c0 + cs.start)
                fh.append(frag.shape[0])
                fw.append(frag.shape[1])
                dts.append(str(arr.dtype))
                payload.append(np.ascontiguousarray(frag).tobytes())
    return pa.table(
        {
            "cell": pa.array(cells, pa.int64()),
            "row_off": pa.array(fro, pa.int32()),
            "col_off": pa.array(fco, pa.int32()),
            "height": pa.array(fh, pa.int32()),
            "width": pa.array(fw, pa.int32()),
            "dtype": pa.array(dts, pa.string()),
            "pixels": pa.array(payload, pa.binary()),
        }
    )


def _box_sum(arr: np.ndarray, k: int) -> np.ndarray:
    """(h, w) -> (h-k+1, w-k+1) sliding k x k window sums via integral
    image; float64/int64 inputs with integer values stay exact."""
    cs = np.zeros((arr.shape[0] + 1, arr.shape[1] + 1), dtype=arr.dtype)
    np.cumsum(arr, axis=0, out=cs[1:, 1:])
    np.cumsum(cs[1:, 1:], axis=1, out=cs[1:, 1:])
    return cs[k:, k:] - cs[:-k, k:] - cs[k:, :-k] + cs[:-k, :-k]


def focal_mean_tiled(
    tiles_ds,
    shape: tuple[int, int],
    nodata: float,
    radius: int = 1,
    tile_size: int = 256,
):
    """Nodata-aware focal mean: per in-raster pixel, mean over the valid
    (in-extent, non-nodata) pixels of its (2r+1)^2 neighborhood. Returns a
    derived tile Dataset with per-pixel neighbor sums and counts:
    (cell, row_off, col_off, height, width, fsum:binary f64, fcnt:binary i64).
    Pixels whose whole neighborhood is nodata get fcnt 0 (mean -> null)."""

    if radius > tile_size:
        # halo fragments only reach the 8 adjacent tiles
        raise ValueError(f"radius {radius} exceeds tile_size {tile_size}")

    def fan(batch: pa.Table) -> pa.Table:
        return tile_fragments(batch, shape, tile_size, radius)

    def assemble(group: pa.Table) -> pa.Table:
        cell = int(group["cell"][0].as_py())
        return _compute_focal_tile(
            cell, _tile_arrays(group), shape, tile_size, radius, nodata
        )

    frags = tiles_ds.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True)
    return frags.groupby("cell").map_groups(assemble, batch_format="pyarrow")


def _assemble_window(
    cell: int,
    frag_arrays,
    shape: tuple[int, int],
    tile_size: int,
    radius: int,
    nodata: float,
):
    """Assemble one target tile's padded (th+2r, tw+2r) window from its
    fragments (core + halo strips at absolute offsets). Returns
    (r0, c0, th, tw, vals, ok): vals hold 0.0 where invalid, ok is the
    validity mask (beyond-extent / never-received cells stay 0)."""
    tr, tc = cell_decode(cell)
    r0, c0 = tr * tile_size, tc * tile_size
    th = min(tile_size, shape[0] - r0)
    tw = min(tile_size, shape[1] - c0)
    vals = np.zeros((th + 2 * radius, tw + 2 * radius), dtype=np.float64)
    ok = np.zeros_like(vals, dtype=np.int64)
    for _cell, fr0, fc0, arr in frag_arrays:
        # clip the fragment to the padded window: halo strips staged at a
        # LARGER radius (write_tiles_bucketed) overhang and must be cut
        cr0 = max(fr0, r0 - radius)
        cc0 = max(fc0, c0 - radius)
        cr1 = min(fr0 + arr.shape[0], r0 + th + radius)
        cc1 = min(fc0 + arr.shape[1], c0 + tw + radius)
        if cr1 <= cr0 or cc1 <= cc0:
            continue
        a = arr[cr0 - fr0 : cr1 - fr0, cc0 - fc0 : cc1 - fc0].astype(np.float64)
        valid = a != float(nodata)
        rr = cr0 - (r0 - radius)
        cc = cc0 - (c0 - radius)
        vals[rr : rr + a.shape[0], cc : cc + a.shape[1]] = np.where(valid, a, 0.0)
        ok[rr : rr + a.shape[0], cc : cc + a.shape[1]] = valid
    return r0, c0, th, tw, vals, ok


def _compute_focal_tile(
    cell: int,
    frag_arrays,
    shape: tuple[int, int],
    tile_size: int,
    radius: int,
    nodata: float,
) -> pa.Table:
    """Padded-window assembly + box-sum of the core."""
    k = 2 * radius + 1
    r0, c0, th, tw, vals, ok = _assemble_window(
        cell, frag_arrays, shape, tile_size, radius, nodata
    )
    fsum = _box_sum(vals * ok, k)
    fcnt = _box_sum(ok, k)
    return pa.table(
        {
            "cell": pa.array([cell], pa.int64()),
            "row_off": pa.array([r0], pa.int32()),
            "col_off": pa.array([c0], pa.int32()),
            "height": pa.array([th], pa.int32()),
            "width": pa.array([tw], pa.int32()),
            "fsum": pa.array([fsum.tobytes()], pa.binary()),
            "fcnt": pa.array([fcnt.tobytes()], pa.binary()),
        }
    )


def write_tiles_bucketed(
    tiles_ds,
    path: str,
    shape: tuple[int, int],
    tile_size: int,
    radius: int = 1,
) -> str:
    """Stage a tile table for SHUFFLE-FREE stencil ops: tile cores are
    written ``path/core/cell=<k>/`` and each tile's radius-``radius``
    border strips are written a second time under the NEIGHBOR cells
    that need them (``path/halo/cell=<k>/``). Write-time cost is one
    partitioned write of the raster + ~4r/T of it again as strips; every
    subsequent focal run (of radius <= the staged one) is a targeted
    two-partition read per tile with NO exchange at all — the same
    pay-once trade as ``write_zones_bucketed``.
    """

    def core_tag(batch: pa.Table) -> pa.Table:
        return batch  # already keyed by cell

    def halo_only(batch: pa.Table) -> pa.Table:
        # keep only strips destined for OTHER cells: the self fragment is
        # the only one whose offsets equal its target tile's own origin
        frags = tile_fragments(batch, shape, tile_size, radius)
        tr, tc = cell_decode(frags["cell"].to_numpy())
        is_core = (frags["row_off"].to_numpy() == tr * tile_size) & (
            frags["col_off"].to_numpy() == tc * tile_size
        )
        return frags.filter(pa.array(~is_core))

    tiles_ds.map_batches(core_tag, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        f"{path}/core", partition_cols=["cell"]
    )
    tiles_ds.map_batches(halo_only, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        f"{path}/halo", partition_cols=["cell"]
    )
    return path


class _FocalStoreKernel:
    """Task-pool kernel: per target cell, a pruned read of its
    ``core/cell=<k>`` + ``halo/cell=<k>`` partitions, then the same
    assemble + box-sum as the shuffle plan — zero exchanges."""

    def __init__(self, path, shape, tile_size, radius, nodata):
        self.path = path
        self.shape = shape
        self.tile_size = tile_size
        self.radius = radius
        self.nodata = nodata

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os

        import pyarrow.parquet as pq

        cols = ["row_off", "col_off", "height", "width", "dtype", "pixels"]
        out = []
        for cell in batch["cell"].to_pylist():
            cell = int(cell)
            parts = [pq.read_table(os.path.join(self.path, f"core/cell={cell}"), columns=cols)]
            halo_dir = os.path.join(self.path, f"halo/cell={cell}")
            if os.path.isdir(halo_dir):
                parts.append(pq.read_table(halo_dir, columns=cols))
            frags = pa.concat_tables(parts).append_column(
                "cell", pa.array([cell] * sum(len(p) for p in parts), pa.int64())
            )
            out.append(
                _compute_focal_tile(
                    cell, _tile_arrays(frags), self.shape, self.tile_size,
                    self.radius, self.nodata,
                )
            )
        return pa.concat_tables(out)


def focal_mean_from_store(
    path: str,
    shape: tuple[int, int],
    nodata: float,
    radius: int = 1,
    tile_size: int = 256,
):
    """Shuffle-free focal mean over a ``write_tiles_bucketed`` store:
    the driver enumerates target cells arithmetically (O(#tiles) ids, no
    index) and a task pool does targeted core+halo partition reads.
    Bit-identical to ``focal_mean_tiled`` (pytest differential)."""
    import ray.data

    from ._cluster import pool

    ntr, ntc = _n_tiles(shape, tile_size)
    grid_r, grid_c = np.meshgrid(
        np.arange(ntr, dtype=np.int64), np.arange(ntc, dtype=np.int64), indexing="ij"
    )
    cells = cell_id(grid_r.ravel(), grid_c.ravel())
    ds = ray.data.from_arrow(pa.table({"cell": pa.array(cells, pa.int64())}))
    n_blocks = max(1, min(len(cells), pool()[1] * 2))
    return ds.repartition(n_blocks).map_batches(
        _FocalStoreKernel(path, shape, tile_size, radius, nodata),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def focal_to_tiles(focal_ds, nodata: float):
    """Re-express a focal_mean_tiled result as a standard tile table
    (cell, row_off, col_off, height, width, dtype, pixels) holding the
    per-pixel neighbor SUM (float64; integer-valued for integer rasters,
    so downstream zonal aggregates stay bit-exact), with ``nodata`` burned
    where the neighborhood had no valid pixel — the derived raster can
    feed any tile consumer (zonal_stats_tiled, downsample, another focal
    pass) without materializing a full-raster array anywhere."""

    def conv(batch: pa.Table) -> pa.Table:
        payload = []
        for i in range(len(batch)):
            th = int(batch["height"][i].as_py())
            tw = int(batch["width"][i].as_py())
            s = np.frombuffer(batch["fsum"][i].as_buffer(), np.float64).reshape(th, tw)
            c = np.frombuffer(batch["fcnt"][i].as_buffer(), np.int64).reshape(th, tw)
            payload.append(np.where(c > 0, s, float(nodata)).tobytes())
        return pa.table(
            {
                "cell": batch["cell"],
                "row_off": batch["row_off"],
                "col_off": batch["col_off"],
                "height": batch["height"],
                "width": batch["width"],
                "dtype": pa.array(["float64"] * len(batch), pa.string()),
                "pixels": pa.array(payload, pa.binary()),
            }
        )

    return focal_ds.map_batches(conv, batch_format="pyarrow", zero_copy_batch=True)


def sample_focal_pixels(focal_ds, raster_width: int, mod: int):
    """Deterministic pixel sample of a focal_mean_tiled result:
    (row, col, fsum, fcnt, fmean) for pixels with (row*W + col) % mod == 0.
    fsum/fmean are null where the neighborhood had no valid pixel."""

    def sample(batch: pa.Table) -> pa.Table:
        rows_o, cols_o, s_o, c_o = [], [], [], []
        for i in range(len(batch)):
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            th = int(batch["height"][i].as_py())
            tw = int(batch["width"][i].as_py())
            fsum = np.frombuffer(batch["fsum"][i].as_buffer(), dtype=np.float64).reshape(th, tw)
            fcnt = np.frombuffer(batch["fcnt"][i].as_buffer(), dtype=np.int64).reshape(th, tw)
            rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
            cc = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
            pick = (rr * raster_width + cc) % mod == 0
            rows_o.append(np.broadcast_to(rr, (th, tw))[pick])
            cols_o.append(np.broadcast_to(cc, (th, tw))[pick])
            s_o.append(fsum[pick])
            c_o.append(fcnt[pick])
        rows = np.concatenate(rows_o) if rows_o else np.empty(0, np.int64)
        cols = np.concatenate(cols_o) if cols_o else np.empty(0, np.int64)
        s = np.concatenate(s_o) if s_o else np.empty(0, np.float64)
        c = np.concatenate(c_o) if c_o else np.empty(0, np.int64)
        empty = c == 0
        mean = np.divide(s, c, out=np.full_like(s, np.nan), where=~empty)
        return pa.table(
            {
                "row": pa.array(rows, pa.int64()),
                "col": pa.array(cols, pa.int64()),
                "fsum": pa.array(np.where(empty, np.nan, s), pa.float64(), mask=empty),
                "fcnt": pa.array(c, pa.int64()),
                "fmean": pa.array(mean, pa.float64(), mask=empty),
            }
        )

    return focal_ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def downsample_mean(tiles_ds, factor: int, nodata: float):
    """Factor-f mean pooling to a coarser grid: coarse pixel (R, C) =
    mean over non-nodata fine pixels with row//f == R, col//f == C.
    Per-tile bincount partials (handles tiles straddling coarse blocks),
    then a thin (ckey, cnt, sum) merge — only one row per coarse pixel
    per touching tile crosses the exchange. Returns
    (crow:int64, ccol:int64, cnt:int64, sum:f64 null, mean:f64 null)."""
    f = int(factor)

    def partials(batch: pa.Table) -> pa.Table:
        keys_o, cnt_o, sum_o = [], [], []
        for _cell, r0, c0, arr in _tile_arrays(batch):
            th, tw = arr.shape
            a = arr.astype(np.float64)
            gr = (r0 + np.arange(th, dtype=np.int64)) // f
            gc = (c0 + np.arange(tw, dtype=np.int64)) // f
            ur, inv_r = np.unique(gr, return_inverse=True)
            uc, inv_c = np.unique(gc, return_inverse=True)
            nr, nc = len(ur), len(uc)
            lk = (inv_r.reshape(th, 1) * nc + inv_c.reshape(1, tw)).ravel()
            valid = (a != float(nodata)).ravel()
            cnt = np.bincount(lk[valid], minlength=nr * nc).astype(np.int64)
            s = np.bincount(lk[valid], weights=a.ravel()[valid], minlength=nr * nc)
            # every coarse block the tile touches is emitted, even all-nodata
            keys = (
                (ur.reshape(nr, 1) << np.int64(32)) | uc.reshape(1, nc)
            ).ravel()
            keys_o.append(keys)
            cnt_o.append(cnt)
            sum_o.append(s)
        keys = np.concatenate(keys_o) if keys_o else np.empty(0, np.int64)
        return pa.table(
            {
                "ckey": pa.array(keys, pa.int64()),
                "cnt": pa.array(
                    np.concatenate(cnt_o) if cnt_o else np.empty(0, np.int64), pa.int64()
                ),
                "s": pa.array(
                    np.concatenate(sum_o) if sum_o else np.empty(0, np.float64), pa.float64()
                ),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        key = int(group["ckey"][0].as_py())
        cnt = int(np.sum(group["cnt"].to_numpy()))
        s = float(np.sum(group["s"].to_numpy()))
        crow, ccol = key >> 32, key & 0xFFFFFFFF
        null = cnt == 0
        return pa.table(
            {
                "crow": pa.array([crow], pa.int64()),
                "ccol": pa.array([ccol], pa.int64()),
                "cnt": pa.array([cnt], pa.int64()),
                "sum": pa.array([None if null else s], pa.float64()),
                "mean": pa.array([None if null else s / cnt], pa.float64()),
            }
        )

    part = tiles_ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("ckey").map_groups(merge, batch_format="pyarrow")


def _pool_coarse(level_ds):
    """One 2x pooling step OVER A PREVIOUS LEVEL's (crow, ccol, cnt, sum)
    rows: per-batch partials keyed (crow//2)<<32 | (ccol//2), then a thin
    per-coarse-pixel merge. Exact because pooled sums of integer-valued
    pixels are associative integers in float64; null sums (all-nodata
    blocks) contribute 0 to the pooled sum and 0 to cnt."""
    import pyarrow.compute as pc

    def partials(batch: pa.Table) -> pa.Table:
        crow = batch["crow"].to_numpy() >> 1
        ccol = batch["ccol"].to_numpy() >> 1
        cnt = batch["cnt"].to_numpy()
        s = pc.fill_null(batch["sum"], 0.0).to_numpy(zero_copy_only=False)
        keys = (crow << np.int64(32)) | ccol
        uk, inv = np.unique(keys, return_inverse=True)
        return pa.table(
            {
                "ckey": pa.array(uk, pa.int64()),
                "cnt": pa.array(np.bincount(inv, weights=cnt).astype(np.int64), pa.int64()),
                "s": pa.array(np.bincount(inv, weights=s), pa.float64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        key = int(group["ckey"][0].as_py())
        cnt = int(np.sum(group["cnt"].to_numpy()))
        s = float(np.sum(group["s"].to_numpy()))
        null = cnt == 0
        return pa.table(
            {
                "crow": pa.array([key >> 32], pa.int64()),
                "ccol": pa.array([key & 0xFFFFFFFF], pa.int64()),
                "cnt": pa.array([cnt], pa.int64()),
                "sum": pa.array([None if null else s], pa.float64()),
                "mean": pa.array([None if null else s / cnt], pa.float64()),
            }
        )

    part = level_ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("ckey").map_groups(merge, batch_format="pyarrow")


def pyramid_levels(tiles_ds, nodata: float, n_levels: int = 3):
    """Overview pyramid (gdaladdo 'average' semantics): level L pixel
    (R, C) = mean over non-nodata BASE pixels with row//2^L == R,
    col//2^L == C. Level 1 is factor-2 pooling of the base tiles
    (downsample_mean); each further level pools the PREVIOUS level's
    (cnt, sum) rows — the base raster is scanned exactly once, the coarse
    passes touch geometrically shrinking tables (the overview-build shape
    a 100-TB raster store needs). Associative integer sums make
    level-from-level bit-identical to level-from-base, which is what the
    SQL oracle computes. Returns (level, crow, ccol, cnt, sum, mean)."""

    def tag(level: int):
        def _t(batch: pa.Table) -> pa.Table:
            return batch.add_column(
                0, "level", pa.array([level] * len(batch), pa.int64())
            )

        return _t

    level = downsample_mean(tiles_ds, 2, nodata)
    out = level.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
    for lv in range(2, n_levels + 1):
        level = _pool_coarse(level)
        out = out.union(
            level.map_batches(tag(lv), batch_format="pyarrow", zero_copy_batch=True)
        )
    return out


def raster_calc_tiled(tiles_a, tiles_b, fn, nodata_a: float, nodata_b: float):
    """Map algebra over two grid-aligned tiled rasters: out = fn(a, b)
    per pixel where BOTH operands are valid, null elsewhere. One union +
    groupby(cell) co-locates operand tiles (at scale: write both
    cell-partitioned and the exchange vanishes). Returns derived tiles
    (cell, row_off, col_off, height, width, vals:binary f64,
    ok:binary u8)."""

    def tag(src: int):
        def _t(batch: pa.Table) -> pa.Table:
            return batch.append_column("src", pa.array([src] * len(batch), pa.int8()))

        return _t

    def combine(group: pa.Table) -> pa.Table:
        cell = int(group["cell"][0].as_py())
        srcs = group["src"].to_numpy()
        parts: dict[int, tuple] = {}
        for i, (_cell, r0, c0, arr) in enumerate(_tile_arrays(group)):
            parts[int(srcs[i])] = (r0, c0, arr)
        if len(parts) != 2:
            raise ValueError(f"cell {cell}: expected both operands, got {sorted(parts)}")
        (r0, c0, a), (_r1, _c1, b) = parts[0], parts[1]
        if a.shape != b.shape:
            raise ValueError(f"cell {cell}: operand shape mismatch {a.shape} vs {b.shape}")
        af = a.astype(np.float64)
        bf = b.astype(np.float64)
        ok = (af != float(nodata_a)) & (bf != float(nodata_b))
        out = np.where(ok, fn(af, bf), np.nan)
        return pa.table(
            {
                "cell": pa.array([cell], pa.int64()),
                "row_off": pa.array([r0], pa.int32()),
                "col_off": pa.array([c0], pa.int32()),
                "height": pa.array([a.shape[0]], pa.int32()),
                "width": pa.array([a.shape[1]], pa.int32()),
                "vals": pa.array([out.tobytes()], pa.binary()),
                "ok": pa.array([ok.astype(np.uint8).tobytes()], pa.binary()),
            }
        )

    both = tiles_a.map_batches(tag(0), batch_format="pyarrow").union(
        tiles_b.map_batches(tag(1), batch_format="pyarrow")
    )
    return both.groupby("cell").map_groups(combine, batch_format="pyarrow")


def raster_crosstab(tiles_a, tiles_b, nodata_a: float, nodata_b: float):
    """Cross-tabulation of two grid-aligned rasters (the GIS ``combine``
    / crosstab op): pixel counts per DISTINCT (val_a, val_b) pair where
    both operands are valid. Same one-union co-location as
    raster_calc_tiled, then per-cell integer pair-count partials (one
    np.unique over packed keys per tile — no per-pixel Python) merge in
    one THIN groupby: only (va, vb, cnt) rows ever shuffle, bounded by
    the value-domain product, not the pixel count."""

    def tag(src: int):
        def _t(batch: pa.Table) -> pa.Table:
            return batch.append_column("src", pa.array([src] * len(batch), pa.int8()))

        return _t

    def pairs(group: pa.Table) -> pa.Table:
        cell = int(group["cell"][0].as_py())
        srcs = group["src"].to_numpy()
        parts: dict[int, tuple] = {}
        for i, (_cell, r0, c0, arr) in enumerate(_tile_arrays(group)):
            parts[int(srcs[i])] = (r0, c0, arr)
        if len(parts) != 2:
            raise ValueError(f"cell {cell}: expected both operands, got {sorted(parts)}")
        (_r0, _c0, a), (_r1, _c1, b) = parts[0], parts[1]
        if a.shape != b.shape:
            raise ValueError(f"cell {cell}: operand shape mismatch {a.shape} vs {b.shape}")
        af = np.rint(a.astype(np.float64)).astype(np.int64)
        bf = np.rint(b.astype(np.float64)).astype(np.int64)
        ok = (a.astype(np.float64) != float(nodata_a)) & (
            b.astype(np.float64) != float(nodata_b)
        )
        va, vb = af[ok], bf[ok]
        key = np.stack([va, vb], axis=1)
        uniq, cnt = (np.unique(key, axis=0, return_counts=True)
                     if len(key) else (np.empty((0, 2), np.int64), np.empty(0, np.int64)))
        return pa.table(
            {
                "val_a": pa.array(uniq[:, 0], pa.int64()),
                "val_b": pa.array(uniq[:, 1], pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "val_a": pa.array([int(group["val_a"][0].as_py())], pa.int64()),
                "val_b": pa.array([int(group["val_b"][0].as_py())], pa.int64()),
                "n_px": pa.array([int(np.sum(group["cnt"].to_numpy()))], pa.int64()),
            }
        )

    both = tiles_a.map_batches(tag(0), batch_format="pyarrow").union(
        tiles_b.map_batches(tag(1), batch_format="pyarrow")
    )
    partials = both.groupby("cell").map_groups(pairs, batch_format="pyarrow")
    return partials.groupby(["val_a", "val_b"]).map_groups(merge, batch_format="pyarrow")


def raster_global_stats(tiles_ds, nodata: float):
    """Whole-raster reduction: one row of
    (count, sum, mean, min, max, std, nodata_px, n_distinct) over all
    valid pixels, via per-tile combinable partials (value-count maps for
    the distinct count — bounded for integer-valued rasters) merged on
    the driver. Sums run in float64 over integer values (exact); std is
    the population formula mirrored by the SQL oracles."""

    def partials(batch: pa.Table) -> pa.Table:
        rows = []
        for _cell, _r0, _c0, arr in _tile_arrays(batch):
            a = arr.astype(np.float64)
            valid = a != float(nodata)
            v = a[valid]
            u = np.unique(v)
            rows.append(
                {
                    "cnt": int(valid.sum()),
                    "s": float(v.sum()),
                    "sq": float((v * v).sum()),
                    "mn": float(v.min()) if len(v) else np.nan,
                    "mx": float(v.max()) if len(v) else np.nan,
                    "nod": int((~valid).sum()),
                    "uniq": u.tobytes(),
                }
            )
        return pa.table(
            {
                "cnt": pa.array([r["cnt"] for r in rows], pa.int64()),
                "s": pa.array([r["s"] for r in rows], pa.float64()),
                "sq": pa.array([r["sq"] for r in rows], pa.float64()),
                "mn": pa.array([r["mn"] for r in rows], pa.float64()),
                "mx": pa.array([r["mx"] for r in rows], pa.float64()),
                "nod": pa.array([r["nod"] for r in rows], pa.int64()),
                "uniq": pa.array([r["uniq"] for r in rows], pa.binary()),
            }
        )

    part = tiles_ds.map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    cnt = int(part["cnt"].sum())
    s = float(np.sum(part["s"].to_numpy()))
    sq = float(np.sum(part["sq"].to_numpy()))
    mn = float(np.nanmin(part["mn"].to_numpy())) if cnt else None
    mx = float(np.nanmax(part["mx"].to_numpy())) if cnt else None
    nod = int(part["nod"].sum())
    uniq = np.unique(
        np.concatenate(
            [np.frombuffer(b, np.float64) for b in part["uniq"]]
            or [np.empty(0, np.float64)]
        )
    )
    mean = s / cnt if cnt else None
    std = float(np.sqrt(max(sq / cnt - mean * mean, 0.0))) if cnt else None
    return pa.table(
        {
            "count": pa.array([cnt], pa.int64()),
            "sum": pa.array([s if cnt else None], pa.float64()),
            "mean": pa.array([mean], pa.float64()),
            "min": pa.array([mn], pa.float64()),
            "max": pa.array([mx], pa.float64()),
            "std": pa.array([std], pa.float64()),
            "nodata_px": pa.array([nod], pa.int64()),
            "n_distinct": pa.array([len(uniq)], pa.int64()),
        }
    )


def sample_calc_pixels(calc_ds, raster_width: int, mod: int):
    """(row, col, value) sample of a raster_calc_tiled result; value is
    null where either operand was nodata."""

    def sample(batch: pa.Table) -> pa.Table:
        rows_o, cols_o, v_o, ok_o = [], [], [], []
        for i in range(len(batch)):
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            th = int(batch["height"][i].as_py())
            tw = int(batch["width"][i].as_py())
            vals = np.frombuffer(batch["vals"][i].as_buffer(), dtype=np.float64).reshape(th, tw)
            ok = np.frombuffer(batch["ok"][i].as_buffer(), dtype=np.uint8).reshape(th, tw)
            rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
            cc = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
            pick = (rr * raster_width + cc) % mod == 0
            rows_o.append(np.broadcast_to(rr, (th, tw))[pick])
            cols_o.append(np.broadcast_to(cc, (th, tw))[pick])
            v_o.append(vals[pick])
            ok_o.append(ok[pick])
        rows = np.concatenate(rows_o) if rows_o else np.empty(0, np.int64)
        cols = np.concatenate(cols_o) if cols_o else np.empty(0, np.int64)
        v = np.concatenate(v_o) if v_o else np.empty(0, np.float64)
        ok = (np.concatenate(ok_o) if ok_o else np.empty(0, np.uint8)).astype(bool)
        return pa.table(
            {
                "row": pa.array(rows, pa.int64()),
                "col": pa.array(cols, pa.int64()),
                "value": pa.array(v, pa.float64(), mask=~ok),
            }
        )

    return calc_ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------- terrain derivatives


def focal_slope_tiled(
    tiles_ds,
    shape: tuple[int, int],
    nodata: float,
    tile_size: int = 256,
):
    """Horn (1981) gradient over the 3x3 neighborhood — the classic
    slope/aspect kernel (GDAL ``gdaldem slope`` semantics for fully-valid
    windows): gx = (c + 2f + i) - (a + 2d + g), gy = (g + 2h + i) -
    (a + 2b + c) over the window [[a b c] [d e f] [g h i]], rows
    increasing downward. A pixel is valid only when ALL 9 window cells
    are in-raster and non-nodata (border pixels and any window touching
    nodata are null) — that keeps gx/gy pure integers for integer
    rasters, so the distributed result is bit-exact against a SQL
    9-offset weighted join. Same radius-1 halo exchange as
    focal_mean_tiled. Returns derived tiles
    (cell, row_off, col_off, height, width, gx:binary i64, gy:binary i64,
    ok:binary u8)."""

    def fan(batch: pa.Table) -> pa.Table:
        return tile_fragments(batch, shape, tile_size, 1)

    def assemble(group: pa.Table) -> pa.Table:
        cell = int(group["cell"][0].as_py())
        r0, c0, th, tw, vals, ok = _assemble_window(
            cell, _tile_arrays(group), shape, tile_size, 1, nodata
        )
        full = _box_sum(ok, 3) == 9
        a, b, c = vals[:-2, :-2], vals[:-2, 1:-1], vals[:-2, 2:]
        d, f = vals[1:-1, :-2], vals[1:-1, 2:]
        g, h, i_ = vals[2:, :-2], vals[2:, 1:-1], vals[2:, 2:]
        gx = (c + 2.0 * f + i_) - (a + 2.0 * d + g)
        gy = (g + 2.0 * h + i_) - (a + 2.0 * b + c)
        return pa.table(
            {
                "cell": pa.array([cell], pa.int64()),
                "row_off": pa.array([r0], pa.int32()),
                "col_off": pa.array([c0], pa.int32()),
                "height": pa.array([th], pa.int32()),
                "width": pa.array([tw], pa.int32()),
                "gx": pa.array([gx.astype(np.int64).tobytes()], pa.binary()),
                "gy": pa.array([gy.astype(np.int64).tobytes()], pa.binary()),
                "ok": pa.array([full.astype(np.uint8).tobytes()], pa.binary()),
            }
        )

    frags = tiles_ds.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True)
    return frags.groupby("cell").map_groups(assemble, batch_format="pyarrow")


def sample_slope_pixels(slope_ds, raster_width: int, mod: int, cellsize: float = 1.0):
    """(row, col, gx, gy, slope_pct) sample of a focal_slope_tiled result.
    slope_pct = sqrt(gx^2 + gy^2) / (8 * cellsize) * 100 — every float op
    is a single correctly-rounded IEEE op in the same left-associated
    order as the SQL mirror, so the float64 output is bit-exact. Null
    where the 3x3 window is not fully valid."""

    def sample(batch: pa.Table) -> pa.Table:
        rows_o, cols_o, gx_o, gy_o, ok_o = [], [], [], [], []
        for i in range(len(batch)):
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            th = int(batch["height"][i].as_py())
            tw = int(batch["width"][i].as_py())
            gx = np.frombuffer(batch["gx"][i].as_buffer(), np.int64).reshape(th, tw)
            gy = np.frombuffer(batch["gy"][i].as_buffer(), np.int64).reshape(th, tw)
            ok = np.frombuffer(batch["ok"][i].as_buffer(), np.uint8).reshape(th, tw)
            rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
            cc = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
            pick = (rr * raster_width + cc) % mod == 0
            rows_o.append(np.broadcast_to(rr, (th, tw))[pick])
            cols_o.append(np.broadcast_to(cc, (th, tw))[pick])
            gx_o.append(gx[pick])
            gy_o.append(gy[pick])
            ok_o.append(ok[pick])
        rows = np.concatenate(rows_o) if rows_o else np.empty(0, np.int64)
        cols = np.concatenate(cols_o) if cols_o else np.empty(0, np.int64)
        gx = np.concatenate(gx_o) if gx_o else np.empty(0, np.int64)
        gy = np.concatenate(gy_o) if gy_o else np.empty(0, np.int64)
        bad = ~(np.concatenate(ok_o) if ok_o else np.empty(0, np.uint8)).astype(bool)
        g2 = (gx * gx + gy * gy).astype(np.float64)
        slope = np.sqrt(g2) / (8.0 * cellsize) * 100.0
        return pa.table(
            {
                "row": pa.array(rows, pa.int64()),
                "col": pa.array(cols, pa.int64()),
                "gx": pa.array(gx, pa.int64(), mask=bad),
                "gy": pa.array(gy, pa.int64(), mask=bad),
                "slope_pct": pa.array(slope, pa.float64(), mask=bad),
            }
        )

    return slope_ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def focal_median_tiled(
    tiles_ds,
    shape: tuple[int, int],
    nodata: float,
    radius: int = 1,
    tile_size: int = 256,
):
    """Nodata-aware focal MEDIAN (the classic despeckle filter): per
    in-raster pixel, the exact median of the valid pixels in its
    (2r+1)^2 neighborhood — lower/upper middle averaged for even counts
    ((m1 + m2) / 2.0, one exact float op on integer values, the SQL
    ``median()`` interpolation rule). Windowed medians aren't
    integral-image-able; the kernel stacks the k^2 shifted slices,
    sorts ONCE along the stack axis (invalid = +inf sentinel) and
    gathers the two per-pixel middles by the valid count — no per-pixel
    Python. Same radius-r halo exchange as focal_mean_tiled. Returns
    derived tiles (..., fmed:binary f64, fcnt:binary i64); fcnt 0 ->
    null median."""
    if radius > tile_size:
        raise ValueError("radius must be <= tile_size")
    k = 2 * radius + 1

    def fan(batch: pa.Table) -> pa.Table:
        return tile_fragments(batch, shape, tile_size, radius)

    def assemble(group: pa.Table) -> pa.Table:
        cell = int(group["cell"][0].as_py())
        r0, c0, th, tw, vals, ok = _assemble_window(
            cell, _tile_arrays(group), shape, tile_size, radius, nodata
        )
        cnt = _box_sum(ok, k).astype(np.int64)
        stack = np.empty((k * k, th, tw), dtype=np.float64)
        i = 0
        for dr in range(k):
            for dc in range(k):
                v = vals[dr : dr + th, dc : dc + tw]
                o = ok[dr : dr + th, dc : dc + tw]
                stack[i] = np.where(o > 0, v, np.inf)
                i += 1
        stack.sort(axis=0)
        safe = np.maximum(cnt, 1)
        m1 = np.take_along_axis(stack, ((safe - 1) // 2)[None, :, :], axis=0)[0]
        m2 = np.take_along_axis(stack, (safe // 2)[None, :, :], axis=0)[0]
        med = np.where(cnt > 0, (m1 + m2) / 2.0, np.nan)
        return pa.table(
            {
                "cell": pa.array([cell], pa.int64()),
                "row_off": pa.array([r0], pa.int32()),
                "col_off": pa.array([c0], pa.int32()),
                "height": pa.array([th], pa.int32()),
                "width": pa.array([tw], pa.int32()),
                "fmed": pa.array([med.tobytes()], pa.binary()),
                "fcnt": pa.array([np.ascontiguousarray(cnt).tobytes()], pa.binary()),
            }
        )

    frags = tiles_ds.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True)
    return frags.groupby("cell").map_groups(assemble, batch_format="pyarrow")


def sample_median_pixels(med_ds, raster_width: int, mod: int):
    """(row, col, fmed, fcnt) sample of a focal_median_tiled result;
    fmed null where the whole neighborhood is invalid."""

    def sample(batch: pa.Table) -> pa.Table:
        rows_o, cols_o, m_o, c_o = [], [], [], []
        for i in range(len(batch)):
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            th = int(batch["height"][i].as_py())
            tw = int(batch["width"][i].as_py())
            med = np.frombuffer(batch["fmed"][i].as_buffer(), np.float64).reshape(th, tw)
            cnt = np.frombuffer(batch["fcnt"][i].as_buffer(), np.int64).reshape(th, tw)
            rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
            cc = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
            pick = (rr * raster_width + cc) % mod == 0
            rows_o.append(np.broadcast_to(rr, (th, tw))[pick])
            cols_o.append(np.broadcast_to(cc, (th, tw))[pick])
            m_o.append(med[pick])
            c_o.append(cnt[pick])
        rows = np.concatenate(rows_o) if rows_o else np.empty(0, np.int64)
        cols = np.concatenate(cols_o) if cols_o else np.empty(0, np.int64)
        med = np.concatenate(m_o) if m_o else np.empty(0, np.float64)
        cnt = np.concatenate(c_o) if c_o else np.empty(0, np.int64)
        return pa.table(
            {
                "row": pa.array(rows, pa.int64()),
                "col": pa.array(cols, pa.int64()),
                "fmed": pa.array(med, pa.float64(), mask=cnt == 0),
                "fcnt": pa.array(cnt, pa.int64()),
            }
        )

    return med_ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def focal_terrain_tiled(
    tiles_ds,
    shape: tuple[int, int],
    nodata: float,
    tile_size: int = 256,
):
    """gdaldem TRI / TPI / roughness in ONE radius-1 halo pass.

    Per pixel with a FULLY-VALID 3x3 window (same validity rule as the
    Horn slope so border / nodata-adjacent pixels are null):

    - ``tri_num``  = sum over the 8 neighbors of |center - neighbor|
      (Wilson et al. TRI = tri_num / 8; gdaldem's -alg Wilson)
    - ``tpi_num``  = 8*center - sum(8 neighbors)  (TPI = tpi_num / 8 —
      center minus the neighbor mean as one exact integer numerator)
    - ``rough``    = max - min over all 9 window cells (gdaldem
      roughness; pure integer for integer rasters)

    All three are exact int64 on integer-valued rasters, so the one
    float64 divide-by-8 in the sampler is bit-identical to the SQL
    mirror. Same fragment exchange as focal_slope_tiled; returns derived
    tiles (cell, row_off, col_off, height, width, tri_num/tpi_num/rough
    : binary i64, ok: binary u8)."""

    def fan(batch: pa.Table) -> pa.Table:
        return tile_fragments(batch, shape, tile_size, 1)

    def assemble(group: pa.Table) -> pa.Table:
        cell = int(group["cell"][0].as_py())
        r0, c0, th, tw, vals, ok = _assemble_window(
            cell, _tile_arrays(group), shape, tile_size, 1, nodata
        )
        full = _box_sum(ok, 3) == 9
        e = vals[1:-1, 1:-1]
        tri = np.zeros_like(e)
        nsum = np.zeros_like(e)
        mn = e.copy()
        mx = e.copy()
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                nb = vals[1 + dr : 1 + dr + e.shape[0], 1 + dc : 1 + dc + e.shape[1]]
                tri += np.abs(e - nb)
                nsum += nb
                np.minimum(mn, nb, out=mn)
                np.maximum(mx, nb, out=mx)
        tpi = 8.0 * e - nsum
        rough = mx - mn
        return pa.table(
            {
                "cell": pa.array([cell], pa.int64()),
                "row_off": pa.array([r0], pa.int32()),
                "col_off": pa.array([c0], pa.int32()),
                "height": pa.array([th], pa.int32()),
                "width": pa.array([tw], pa.int32()),
                "tri_num": pa.array([tri.astype(np.int64).tobytes()], pa.binary()),
                "tpi_num": pa.array([tpi.astype(np.int64).tobytes()], pa.binary()),
                "rough": pa.array([rough.astype(np.int64).tobytes()], pa.binary()),
                "ok": pa.array([full.astype(np.uint8).tobytes()], pa.binary()),
            }
        )

    frags = tiles_ds.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True)
    return frags.groupby("cell").map_groups(assemble, batch_format="pyarrow")


def sample_terrain_pixels(terrain_ds, raster_width: int, mod: int):
    """(row, col, tri, tpi, roughness) sample of a focal_terrain_tiled
    result: tri = tri_num / 8.0 and tpi = tpi_num / 8.0 (ONE IEEE divide
    of an exact int64 numerator each — bit-exact vs the SQL mirror),
    roughness stays int64. Null where the 3x3 window is not fully
    valid."""

    def sample(batch: pa.Table) -> pa.Table:
        rows_o, cols_o, tri_o, tpi_o, rg_o, ok_o = [], [], [], [], [], []
        for i in range(len(batch)):
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            th = int(batch["height"][i].as_py())
            tw = int(batch["width"][i].as_py())
            tri = np.frombuffer(batch["tri_num"][i].as_buffer(), np.int64).reshape(th, tw)
            tpi = np.frombuffer(batch["tpi_num"][i].as_buffer(), np.int64).reshape(th, tw)
            rg = np.frombuffer(batch["rough"][i].as_buffer(), np.int64).reshape(th, tw)
            ok = np.frombuffer(batch["ok"][i].as_buffer(), np.uint8).reshape(th, tw)
            rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
            cc = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
            pick = (rr * raster_width + cc) % mod == 0
            rows_o.append(np.broadcast_to(rr, (th, tw))[pick])
            cols_o.append(np.broadcast_to(cc, (th, tw))[pick])
            tri_o.append(tri[pick])
            tpi_o.append(tpi[pick])
            rg_o.append(rg[pick])
            ok_o.append(ok[pick])
        rows = np.concatenate(rows_o) if rows_o else np.empty(0, np.int64)
        cols = np.concatenate(cols_o) if cols_o else np.empty(0, np.int64)
        tri = np.concatenate(tri_o) if tri_o else np.empty(0, np.int64)
        tpi = np.concatenate(tpi_o) if tpi_o else np.empty(0, np.int64)
        rg = np.concatenate(rg_o) if rg_o else np.empty(0, np.int64)
        bad = ~(np.concatenate(ok_o) if ok_o else np.empty(0, np.uint8)).astype(bool)
        return pa.table(
            {
                "row": pa.array(rows, pa.int64()),
                "col": pa.array(cols, pa.int64()),
                "tri": pa.array(tri.astype(np.float64) / 8.0, pa.float64(), mask=bad),
                "tpi": pa.array(tpi.astype(np.float64) / 8.0, pa.float64(), mask=bad),
                "roughness": pa.array(rg, pa.int64(), mask=bad),
            }
        )

    return terrain_ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def sample_hillshade_pixels(
    slope_ds,
    raster_width: int,
    mod: int,
    light: tuple[int, int, int] = (-1, -1, 1),
):
    """(row, col, hs_num, shade) hillshade sample of a focal_slope_tiled
    result. The illumination model is the standard Lambertian
    normal-dot-light, but with an INTEGER light vector so every float op
    is one correctly-rounded IEEE step reproducible in SQL:

        n      = (-gx, -gy, 8)            (surface normal scaled by 8*cellsize)
        num    = -gx*lx - gy*ly + 8*lz    (pure int64)
        shade  = max(0, num / sqrt(gx^2 + gy^2 + 64) / sqrt(lx^2+ly^2+lz^2))

    The default light (-1, -1, 1) points the sun toward the north-west
    at 45 degrees altitude (azimuth 315, the gdaldem hillshade default
    direction). Null where the 3x3 window is not fully valid."""
    lx, ly, lz = (int(v) for v in light)
    l2 = float(lx * lx + ly * ly + lz * lz)
    sqrt_l2 = float(np.sqrt(l2))

    def sample(batch: pa.Table) -> pa.Table:
        rows_o, cols_o, gx_o, gy_o, ok_o = [], [], [], [], []
        for i in range(len(batch)):
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            th = int(batch["height"][i].as_py())
            tw = int(batch["width"][i].as_py())
            gx = np.frombuffer(batch["gx"][i].as_buffer(), np.int64).reshape(th, tw)
            gy = np.frombuffer(batch["gy"][i].as_buffer(), np.int64).reshape(th, tw)
            ok = np.frombuffer(batch["ok"][i].as_buffer(), np.uint8).reshape(th, tw)
            rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
            cc = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
            pick = (rr * raster_width + cc) % mod == 0
            rows_o.append(np.broadcast_to(rr, (th, tw))[pick])
            cols_o.append(np.broadcast_to(cc, (th, tw))[pick])
            gx_o.append(gx[pick])
            gy_o.append(gy[pick])
            ok_o.append(ok[pick])
        rows = np.concatenate(rows_o) if rows_o else np.empty(0, np.int64)
        cols = np.concatenate(cols_o) if cols_o else np.empty(0, np.int64)
        gx = np.concatenate(gx_o) if gx_o else np.empty(0, np.int64)
        gy = np.concatenate(gy_o) if gy_o else np.empty(0, np.int64)
        bad = ~(np.concatenate(ok_o) if ok_o else np.empty(0, np.uint8)).astype(bool)
        num = -gx * lx - gy * ly + 8 * lz
        n2 = (gx * gx + gy * gy + 64).astype(np.float64)
        shade = np.maximum(num.astype(np.float64) / np.sqrt(n2) / sqrt_l2, 0.0)
        return pa.table(
            {
                "row": pa.array(rows, pa.int64()),
                "col": pa.array(cols, pa.int64()),
                "hs_num": pa.array(num, pa.int64(), mask=bad),
                "shade": pa.array(shade, pa.float64(), mask=bad),
            }
        )

    return slope_ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def sample_pixel_centers(tiles_ds, raster_height: int, raster_width: int, mod: int):
    """Deterministic (pt_id, row, col, x, y) pixel-CENTER sample derived
    from tile geometry (values are irrelevant — this feeds geometric
    queries like proximity): pt_id = row*W + col, x = col + 0.5,
    y = H - row - 0.5 for the unit north-up affine. All coordinates are
    dyadic floats, exact in float64."""

    def sample(batch: pa.Table) -> pa.Table:
        rows_o, cols_o = [], []
        for i in range(len(batch)):
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            th = int(batch["height"][i].as_py())
            tw = int(batch["width"][i].as_py())
            rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
            cc = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
            pick = (rr * raster_width + cc) % mod == 0
            rows_o.append(np.broadcast_to(rr, (th, tw))[pick])
            cols_o.append(np.broadcast_to(cc, (th, tw))[pick])
        rows = np.concatenate(rows_o) if rows_o else np.empty(0, np.int64)
        cols = np.concatenate(cols_o) if cols_o else np.empty(0, np.int64)
        return pa.table(
            {
                "pt_id": pa.array(rows * raster_width + cols, pa.int64()),
                "row": pa.array(rows, pa.int64()),
                "col": pa.array(cols, pa.int64()),
                "x": pa.array(cols.astype(np.float64) + 0.5, pa.float64()),
                "y": pa.array(
                    (float(raster_height) - rows.astype(np.float64)) - 0.5, pa.float64()
                ),
            }
        )

    return tiles_ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


_D8_NEIGHBORS = [
    # (dr, dc, ESRI code, metric multiplier) in PRIORITY order: ties go
    # to the earliest entry. Cardinal drops compare against diagonal
    # drops by drop/dist with dist 1 vs sqrt(2); for positive integer
    # drops that order is exactly 2*drop^2 (cardinal) vs drop^2
    # (diagonal) — pure int64, no float comparison anywhere.
    (0, 1, 1, 2),      # E
    (1, 1, 2, 1),      # SE
    (1, 0, 4, 2),      # S
    (1, -1, 8, 1),     # SW
    (0, -1, 16, 2),    # W
    (-1, -1, 32, 1),   # NW
    (-1, 0, 64, 2),    # N
    (-1, 1, 128, 1),   # NE
]


def _d8_from_window(vals, ok, th, tw):
    """(padded window) -> (d8 codes, valid-center mask): steepest-descent
    metric over the 8 neighbors, exact integer arithmetic, fixed priority
    tie-break (see _D8_NEIGHBORS)."""
    center = np.rint(vals[1:-1, 1:-1]).astype(np.int64)
    c_ok = ok[1:-1, 1:-1].astype(bool)
    best_m = np.zeros((th, tw), np.int64)
    best_d = np.zeros((th, tw), np.int64)
    for dr, dc, code, mult in _D8_NEIGHBORS:
        nb = np.rint(vals[1 + dr : 1 + dr + th, 1 + dc : 1 + dc + tw]).astype(np.int64)
        n_ok = ok[1 + dr : 1 + dr + th, 1 + dc : 1 + dc + tw].astype(bool)
        drop = center - nb
        m = mult * drop * drop
        take = n_ok & (drop > 0) & (m > best_m)
        best_m[take] = m[take]
        best_d[take] = code
    return best_d, c_ok


def flow_direction_tiled(
    tiles_ds,
    shape: tuple[int, int],
    nodata: float,
    tile_size: int = 256,
):
    """D8 flow direction (O'Callaghan & Mark 1984, ESRI encoding): per
    valid pixel, the power-of-2 code of the steepest-DESCENT neighbor
    (drop/distance maximized over valid in-raster neighbors with a
    strictly lower value), 0 for pits/flats; nodata centers invalid.
    Distance weighting is exact integer arithmetic (see _D8_NEIGHBORS);
    ties break by fixed E,SE,S,SW,W,NW,N,NE priority. Same radius-1 halo
    exchange. Returns derived tiles (cell, row_off, col_off, height,
    width, d8:binary i64, ok:binary u8)."""

    def fan(batch: pa.Table) -> pa.Table:
        return tile_fragments(batch, shape, tile_size, 1)

    def assemble(group: pa.Table) -> pa.Table:
        cell = int(group["cell"][0].as_py())
        r0, c0, th, tw, vals, ok = _assemble_window(
            cell, _tile_arrays(group), shape, tile_size, 1, nodata
        )
        best_d, c_ok = _d8_from_window(vals, ok, th, tw)
        return pa.table(
            {
                "cell": pa.array([cell], pa.int64()),
                "row_off": pa.array([r0], pa.int32()),
                "col_off": pa.array([c0], pa.int32()),
                "height": pa.array([th], pa.int32()),
                "width": pa.array([tw], pa.int32()),
                "d8": pa.array([best_d.tobytes()], pa.binary()),
                "ok": pa.array([c_ok.astype(np.uint8).tobytes()], pa.binary()),
            }
        )

    frags = tiles_ds.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True)
    return frags.groupby("cell").map_groups(assemble, batch_format="pyarrow")


def sample_d8_pixels(d8_ds, raster_width: int, mod: int):
    """(row, col, d8) sample of a flow_direction_tiled result over VALID
    centers only (nodata centers are dropped, matching the SQL mirror's
    valid-pixel base table)."""

    def sample(batch: pa.Table) -> pa.Table:
        rows_o, cols_o, d_o = [], [], []
        for i in range(len(batch)):
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            th = int(batch["height"][i].as_py())
            tw = int(batch["width"][i].as_py())
            d8 = np.frombuffer(batch["d8"][i].as_buffer(), np.int64).reshape(th, tw)
            ok = np.frombuffer(batch["ok"][i].as_buffer(), np.uint8).reshape(th, tw)
            rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
            cc = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
            pick = ((rr * raster_width + cc) % mod == 0) & ok.astype(bool)
            rows_o.append(np.broadcast_to(rr, (th, tw))[pick])
            cols_o.append(np.broadcast_to(cc, (th, tw))[pick])
            d_o.append(d8[pick])
        return pa.table(
            {
                "row": pa.array(
                    np.concatenate(rows_o) if rows_o else np.empty(0, np.int64), pa.int64()
                ),
                "col": pa.array(
                    np.concatenate(cols_o) if cols_o else np.empty(0, np.int64), pa.int64()
                ),
                "d8": pa.array(
                    np.concatenate(d_o) if d_o else np.empty(0, np.int64), pa.int64()
                ),
            }
        )

    return d8_ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def focal_minmax_tiled(
    tiles_ds,
    shape: tuple[int, int],
    nodata: float,
    radius: int = 1,
    tile_size: int = 256,
):
    """Morphological erosion/dilation: per pixel the min and max over the
    VALID (in-raster, non-nodata) cells of its (2r+1)^2 neighborhood —
    null when the whole neighborhood is invalid. Windowed extrema are not
    integral-image-able, so the kernel reduces (2r+1)^2 shifted slices
    with np.minimum/maximum (vectorized; O(k^2) slices, no per-pixel
    Python). Same halo exchange. Returns derived tiles
    (cell, row_off, col_off, height, width, fmin/fmax:binary f64,
    fcnt:binary i64)."""

    if radius > tile_size:
        raise ValueError(f"radius {radius} exceeds tile_size {tile_size}")
    k = 2 * radius + 1

    def fan(batch: pa.Table) -> pa.Table:
        return tile_fragments(batch, shape, tile_size, radius)

    def assemble(group: pa.Table) -> pa.Table:
        cell = int(group["cell"][0].as_py())
        r0, c0, th, tw, vals, ok = _assemble_window(
            cell, _tile_arrays(group), shape, tile_size, radius, nodata
        )
        lo = np.where(ok.astype(bool), vals, np.inf)
        hi = np.where(ok.astype(bool), vals, -np.inf)
        fmin = np.full((th, tw), np.inf)
        fmax = np.full((th, tw), -np.inf)
        for dr in range(k):
            for dc in range(k):
                np.minimum(fmin, lo[dr : dr + th, dc : dc + tw], out=fmin)
                np.maximum(fmax, hi[dr : dr + th, dc : dc + tw], out=fmax)
        fcnt = _box_sum(ok, k)
        return pa.table(
            {
                "cell": pa.array([cell], pa.int64()),
                "row_off": pa.array([r0], pa.int32()),
                "col_off": pa.array([c0], pa.int32()),
                "height": pa.array([th], pa.int32()),
                "width": pa.array([tw], pa.int32()),
                "fmin": pa.array([fmin.tobytes()], pa.binary()),
                "fmax": pa.array([fmax.tobytes()], pa.binary()),
                "fcnt": pa.array([fcnt.tobytes()], pa.binary()),
            }
        )

    frags = tiles_ds.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True)
    return frags.groupby("cell").map_groups(assemble, batch_format="pyarrow")


def sample_minmax_pixels(minmax_ds, raster_width: int, mod: int):
    """(row, col, fmin, fmax, fcnt) sample of a focal_minmax_tiled result;
    fmin/fmax null where the neighborhood had no valid pixel."""

    def sample(batch: pa.Table) -> pa.Table:
        rows_o, cols_o, mn_o, mx_o, c_o = [], [], [], [], []
        for i in range(len(batch)):
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            th = int(batch["height"][i].as_py())
            tw = int(batch["width"][i].as_py())
            fmin = np.frombuffer(batch["fmin"][i].as_buffer(), np.float64).reshape(th, tw)
            fmax = np.frombuffer(batch["fmax"][i].as_buffer(), np.float64).reshape(th, tw)
            fcnt = np.frombuffer(batch["fcnt"][i].as_buffer(), np.int64).reshape(th, tw)
            rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
            cc = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
            pick = (rr * raster_width + cc) % mod == 0
            rows_o.append(np.broadcast_to(rr, (th, tw))[pick])
            cols_o.append(np.broadcast_to(cc, (th, tw))[pick])
            mn_o.append(fmin[pick])
            mx_o.append(fmax[pick])
            c_o.append(fcnt[pick])
        rows = np.concatenate(rows_o) if rows_o else np.empty(0, np.int64)
        cols = np.concatenate(cols_o) if cols_o else np.empty(0, np.int64)
        mn = np.concatenate(mn_o) if mn_o else np.empty(0, np.float64)
        mx = np.concatenate(mx_o) if mx_o else np.empty(0, np.float64)
        c = np.concatenate(c_o) if c_o else np.empty(0, np.int64)
        empty = c == 0
        return pa.table(
            {
                "row": pa.array(rows, pa.int64()),
                "col": pa.array(cols, pa.int64()),
                "fmin": pa.array(np.where(empty, np.nan, mn), pa.float64(), mask=empty),
                "fmax": pa.array(np.where(empty, np.nan, mx), pa.float64(), mask=empty),
                "fcnt": pa.array(c, pa.int64()),
            }
        )

    return minmax_ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------ affine NN warp


def _warp_out_range(k0: int, k1: int, num: int, off: int, den: int, n_out: int):
    """Output indices r whose source floor((r*num + off) / den) lands in
    [k0, k1): the mapping is monotone non-decreasing (num > 0), so the
    range is contiguous — [ceil((k0*den - off) / num),
    ceil((k1*den - off) / num)) clamped to [0, n_out)."""
    lo = -((-(k0 * den - off)) // num)  # ceil division for any sign
    hi = -((-(k1 * den - off)) // num)
    return max(0, lo), min(n_out, hi)


def warp_nearest_tiled(
    tiles_ds,
    shape: tuple[int, int],
    out_shape: tuple[int, int],
    nodata: float,
    y_map: tuple[int, int, int],
    x_map: tuple[int, int, int],
    tile_size: int = 256,
):
    """Nearest-neighbor affine warp/resample to a new grid: output pixel
    (r, c) reads source pixel (floor((r*ny + oy) / dy),
    floor((c*nx + ox) / dx)) with y_map = (ny, oy, dy), x_map =
    (nx, ox, dx) — integer rational mapping, so routing and the result
    are exact. Out-of-bounds or nodata sources are null.

    Distributed plan: each SOURCE tile computes (closed-form interval
    arithmetic, no index) which OUTPUT tiles sample from it and ships the
    needed sub-rect to each — pixels cross the exchange once, like the
    stencil halo. groupby(out_cell) gathers. Output schema matches
    raster_calc_tiled (vals:f64 + ok:u8), so sample_calc_pixels and any
    derived-tile consumer apply unchanged."""
    oh, ow = out_shape
    ny, oy, dy = y_map
    nx, ox, dx = x_map
    if ny <= 0 or nx <= 0 or dy <= 0 or dx <= 0:
        raise ValueError("warp mapping requires positive numerators/denominators")
    ntr_o = (oh + tile_size - 1) // tile_size
    ntc_o = (ow + tile_size - 1) // tile_size

    def fan(batch: pa.Table) -> pa.Table:
        cells, fro, fco, fh, fw, dts, payload = [], [], [], [], [], [], []
        for _cell, r0, c0, arr in _tile_arrays(batch):
            th, tw = arr.shape
            olo_r, ohi_r = _warp_out_range(r0, r0 + th, ny, oy, dy, oh)
            olo_c, ohi_c = _warp_out_range(c0, c0 + tw, nx, ox, dx, ow)
            if olo_r >= ohi_r or olo_c >= ohi_c:
                continue  # no output pixel samples this tile
            for otr in range(olo_r // tile_size, (ohi_r - 1) // tile_size + 1):
                # output rows of THIS output tile that read from this tile
                a_r = max(olo_r, otr * tile_size)
                b_r = min(ohi_r, (otr + 1) * tile_size)
                # source rows they touch (inclusive bounds, clipped to tile)
                sr_a = max(r0, (a_r * ny + oy) // dy)
                sr_b = min(r0 + th - 1, ((b_r - 1) * ny + oy) // dy)
                for otc in range(olo_c // tile_size, (ohi_c - 1) // tile_size + 1):
                    a_c = max(olo_c, otc * tile_size)
                    b_c = min(ohi_c, (otc + 1) * tile_size)
                    sc_a = max(c0, (a_c * nx + ox) // dx)
                    sc_b = min(c0 + tw - 1, ((b_c - 1) * nx + ox) // dx)
                    frag = arr[sr_a - r0 : sr_b + 1 - r0, sc_a - c0 : sc_b + 1 - c0]
                    if frag.size == 0:
                        continue
                    cells.append(int(cell_id(otr, otc)))
                    fro.append(sr_a)
                    fco.append(sc_a)
                    fh.append(frag.shape[0])
                    fw.append(frag.shape[1])
                    dts.append(str(arr.dtype))
                    payload.append(np.ascontiguousarray(frag).tobytes())
        return pa.table(
            {
                "cell": pa.array(cells, pa.int64()),
                "row_off": pa.array(fro, pa.int32()),
                "col_off": pa.array(fco, pa.int32()),
                "height": pa.array(fh, pa.int32()),
                "width": pa.array(fw, pa.int32()),
                "dtype": pa.array(dts, pa.string()),
                "pixels": pa.array(payload, pa.binary()),
            }
        )

    def assemble(group: pa.Table) -> pa.Table:
        cell = int(group["cell"][0].as_py())
        otr, otc = cell_decode(cell)
        or0, oc0 = otr * tile_size, otc * tile_size
        th = min(tile_size, oh - or0)
        tw = min(tile_size, ow - oc0)
        # source rect this output tile reads (for in-bounds outputs)
        sr = ((or0 + np.arange(th, dtype=np.int64)) * ny + oy) // dy
        sc = ((oc0 + np.arange(tw, dtype=np.int64)) * nx + ox) // dx
        in_r = (sr >= 0) & (sr < shape[0])
        in_c = (sc >= 0) & (sc < shape[1])
        # local gather buffer covering the touched source rows/cols
        r_lo = int(sr[in_r].min()) if in_r.any() else 0
        r_hi = int(sr[in_r].max()) + 1 if in_r.any() else 0
        c_lo = int(sc[in_c].min()) if in_c.any() else 0
        c_hi = int(sc[in_c].max()) + 1 if in_c.any() else 0
        buf = np.zeros((max(r_hi - r_lo, 1), max(c_hi - c_lo, 1)), np.float64)
        got = np.zeros_like(buf, dtype=bool)
        for _cell, fr0, fc0, arr in _tile_arrays(group):
            a0 = max(fr0, r_lo)
            b0 = max(fc0, c_lo)
            a1 = min(fr0 + arr.shape[0], r_hi)
            b1 = min(fc0 + arr.shape[1], c_hi)
            if a1 <= a0 or b1 <= b0:
                continue
            sub = arr[a0 - fr0 : a1 - fr0, b0 - fc0 : b1 - fc0].astype(np.float64)
            buf[a0 - r_lo : a1 - r_lo, b0 - c_lo : b1 - c_lo] = sub
            got[a0 - r_lo : a1 - r_lo, b0 - c_lo : b1 - c_lo] = True
        rr = np.clip(sr - r_lo, 0, buf.shape[0] - 1)
        cc = np.clip(sc - c_lo, 0, buf.shape[1] - 1)
        vals = buf[rr.reshape(th, 1), cc.reshape(1, tw)]
        received = got[rr.reshape(th, 1), cc.reshape(1, tw)]
        ok = (
            in_r.reshape(th, 1)
            & in_c.reshape(1, tw)
            & received
            & (vals != float(nodata))
        )
        return pa.table(
            {
                "cell": pa.array([cell], pa.int64()),
                "row_off": pa.array([or0], pa.int32()),
                "col_off": pa.array([oc0], pa.int32()),
                "height": pa.array([th], pa.int32()),
                "width": pa.array([tw], pa.int32()),
                "vals": pa.array([np.where(ok, vals, np.nan).tobytes()], pa.binary()),
                "ok": pa.array([ok.astype(np.uint8).tobytes()], pa.binary()),
            }
        )

    import ray.data

    # output tiles no source pixel feeds (fully out-of-bounds) still need
    # rows: seed every output cell with an empty marker fragment
    seeds = []
    for otr in range(ntr_o):
        for otc in range(ntc_o):
            seeds.append(int(cell_id(otr, otc)))
    seed_tbl = pa.table(
        {
            "cell": pa.array(seeds, pa.int64()),
            "row_off": pa.array([0] * len(seeds), pa.int32()),
            "col_off": pa.array([0] * len(seeds), pa.int32()),
            "height": pa.array([0] * len(seeds), pa.int32()),
            "width": pa.array([0] * len(seeds), pa.int32()),
            "dtype": pa.array(["float64"] * len(seeds), pa.string()),
            "pixels": pa.array([b""] * len(seeds), pa.binary()),
        }
    )
    frags = tiles_ds.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True).union(
        ray.data.from_arrow(seed_tbl)
    )
    return frags.groupby("cell").map_groups(assemble, batch_format="pyarrow")


def warp_bilinear_tiled(
    tiles_ds,
    shape: tuple[int, int],
    out_shape: tuple[int, int],
    nodata: float,
    y_map: tuple[int, int, int],
    x_map: tuple[int, int, int],
    tile_size: int = 256,
):
    """Bilinear affine warp/resample: output (r, c) samples the source at
    the CONTINUOUS rational coordinate ((r*ny + oy) / dy,
    (c*nx + ox) / dx) and blends the (up to) 4 surrounding pixels with
    exact integer fixed-point weights — V = (dy-my)*((dx-mx)*v00 +
    mx*v01) + my*((dx-mx)*v10 + mx*v11) is pure int64 (my/mx are the
    integer remainders), finished by ONE float64 divide by dx*dy, so the
    result is bit-exact against a SQL mirror. Zero-weight neighbors are
    ignored (my == 0 needs no i0+1 row); any NEEDED neighbor that is
    out-of-bounds or nodata nulls the output pixel (strict rule — unlike
    point_query's masked->nearest fallback, which stays a per-point
    semantic; documented divergence).

    Same one-exchange routing as warp_nearest_tiled, with the shipped
    sub-rects padded one source row/col down-right for the +1 neighbors.
    Output schema matches raster_calc_tiled (vals:f64 + ok:u8)."""
    oh, ow = out_shape
    ny, oy, dy = y_map
    nx, ox, dx = x_map
    if ny <= 0 or nx <= 0 or dy <= 0 or dx <= 0 or oy < 0 or ox < 0:
        raise ValueError("bilinear warp requires non-negative offsets and positive terms")
    ntr_o = (oh + tile_size - 1) // tile_size
    ntc_o = (ow + tile_size - 1) // tile_size

    def fan(batch: pa.Table) -> pa.Table:
        cells, fro, fco, fh, fw, dts, payload = [], [], [], [], [], [], []
        for _cell, r0, c0, arr in _tile_arrays(batch):
            th, tw = arr.shape
            # outputs whose floor lands in [r0-1, r0+th) touch this tile
            # (the -1 covers outputs whose +1 neighbor row is here)
            olo_r, ohi_r = _warp_out_range(r0 - 1, r0 + th, ny, oy, dy, oh)
            olo_c, ohi_c = _warp_out_range(c0 - 1, c0 + tw, nx, ox, dx, ow)
            if olo_r >= ohi_r or olo_c >= ohi_c:
                continue
            for otr in range(olo_r // tile_size, (ohi_r - 1) // tile_size + 1):
                a_r = max(olo_r, otr * tile_size)
                b_r = min(ohi_r, (otr + 1) * tile_size)
                sr_a = max(r0, (a_r * ny + oy) // dy)
                sr_b = min(r0 + th - 1, ((b_r - 1) * ny + oy) // dy + 1)
                for otc in range(olo_c // tile_size, (ohi_c - 1) // tile_size + 1):
                    a_c = max(olo_c, otc * tile_size)
                    b_c = min(ohi_c, (otc + 1) * tile_size)
                    sc_a = max(c0, (a_c * nx + ox) // dx)
                    sc_b = min(c0 + tw - 1, ((b_c - 1) * nx + ox) // dx + 1)
                    if sr_b < sr_a or sc_b < sc_a:
                        continue
                    frag = arr[sr_a - r0 : sr_b + 1 - r0, sc_a - c0 : sc_b + 1 - c0]
                    if frag.size == 0:
                        continue
                    cells.append(int(cell_id(otr, otc)))
                    fro.append(sr_a)
                    fco.append(sc_a)
                    fh.append(frag.shape[0])
                    fw.append(frag.shape[1])
                    dts.append(str(arr.dtype))
                    payload.append(np.ascontiguousarray(frag).tobytes())
        return pa.table(
            {
                "cell": pa.array(cells, pa.int64()),
                "row_off": pa.array(fro, pa.int32()),
                "col_off": pa.array(fco, pa.int32()),
                "height": pa.array(fh, pa.int32()),
                "width": pa.array(fw, pa.int32()),
                "dtype": pa.array(dts, pa.string()),
                "pixels": pa.array(payload, pa.binary()),
            }
        )

    def assemble(group: pa.Table) -> pa.Table:
        cell = int(group["cell"][0].as_py())
        otr, otc = cell_decode(cell)
        or0, oc0 = otr * tile_size, otc * tile_size
        th = min(tile_size, oh - or0)
        tw = min(tile_size, ow - oc0)
        sy_num = (or0 + np.arange(th, dtype=np.int64)) * ny + oy
        sx_num = (oc0 + np.arange(tw, dtype=np.int64)) * nx + ox
        i0 = sy_num // dy
        j0 = sx_num // dx
        my = sy_num % dy
        mx = sx_num % dx
        # source rows/cols this tile reads: i0 plus i0+1 where my > 0
        need_r = np.concatenate([i0, i0[my > 0] + 1])
        need_c = np.concatenate([j0, j0[mx > 0] + 1])
        in_need_r = (need_r >= 0) & (need_r < shape[0])
        in_need_c = (need_c >= 0) & (need_c < shape[1])
        r_lo = int(need_r[in_need_r].min()) if in_need_r.any() else 0
        r_hi = int(need_r[in_need_r].max()) + 1 if in_need_r.any() else 0
        c_lo = int(need_c[in_need_c].min()) if in_need_c.any() else 0
        c_hi = int(need_c[in_need_c].max()) + 1 if in_need_c.any() else 0
        buf = np.zeros((max(r_hi - r_lo, 1), max(c_hi - c_lo, 1)), np.int64)
        got = np.zeros_like(buf, dtype=bool)
        for _cell, fr0, fc0, arr in _tile_arrays(group):
            a0 = max(fr0, r_lo)
            b0 = max(fc0, c_lo)
            a1 = min(fr0 + arr.shape[0], r_hi)
            b1 = min(fc0 + arr.shape[1], c_hi)
            if a1 <= a0 or b1 <= b0:
                continue
            sub = arr[a0 - fr0 : a1 - fr0, b0 - fc0 : b1 - fc0]
            buf[a0 - r_lo : a1 - r_lo, b0 - c_lo : b1 - c_lo] = np.rint(
                sub.astype(np.float64)
            ).astype(np.int64)
            got[a0 - r_lo : a1 - r_lo, b0 - c_lo : b1 - c_lo] = True
        ndv = np.int64(np.rint(float(nodata)))

        def corner(ri, ci):
            """(value, valid) grids for neighbor offset (ri, ci)."""
            rr = i0 + ri
            cc = j0 + ci
            inb = ((rr >= 0) & (rr < shape[0])).reshape(th, 1) & (
                (cc >= 0) & (cc < shape[1])
            ).reshape(1, tw)
            rcl = np.clip(rr - r_lo, 0, buf.shape[0] - 1)
            ccl = np.clip(cc - c_lo, 0, buf.shape[1] - 1)
            v = buf[rcl.reshape(th, 1), ccl.reshape(1, tw)]
            g = got[rcl.reshape(th, 1), ccl.reshape(1, tw)]
            okc = inb & g & (v != ndv)
            return np.where(okc, v, 0), okc

        v00, k00 = corner(0, 0)
        v01, k01 = corner(0, 1)
        v10, k10 = corner(1, 0)
        v11, k11 = corner(1, 1)
        need_y = (my > 0).reshape(th, 1)
        need_x = (mx > 0).reshape(1, tw)
        ok = (
            k00
            & (k01 | ~need_x)
            & (k10 | ~need_y)
            & (k11 | ~(need_y & need_x))
        )
        myc = my.reshape(th, 1)
        mxc = mx.reshape(1, tw)
        V = (dy - myc) * ((dx - mxc) * v00 + mxc * v01) + myc * (
            (dx - mxc) * v10 + mxc * v11
        )
        vals = V.astype(np.float64) / float(dx * dy)
        return pa.table(
            {
                "cell": pa.array([cell], pa.int64()),
                "row_off": pa.array([or0], pa.int32()),
                "col_off": pa.array([oc0], pa.int32()),
                "height": pa.array([th], pa.int32()),
                "width": pa.array([tw], pa.int32()),
                "vals": pa.array([np.where(ok, vals, np.nan).tobytes()], pa.binary()),
                "ok": pa.array([ok.astype(np.uint8).tobytes()], pa.binary()),
            }
        )

    import ray.data

    seeds = [int(cell_id(otr, otc)) for otr in range(ntr_o) for otc in range(ntc_o)]
    seed_tbl = pa.table(
        {
            "cell": pa.array(seeds, pa.int64()),
            "row_off": pa.array([0] * len(seeds), pa.int32()),
            "col_off": pa.array([0] * len(seeds), pa.int32()),
            "height": pa.array([0] * len(seeds), pa.int32()),
            "width": pa.array([0] * len(seeds), pa.int32()),
            "dtype": pa.array(["float64"] * len(seeds), pa.string()),
            "pixels": pa.array([b""] * len(seeds), pa.binary()),
        }
    )
    frags = tiles_ds.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True).union(
        ray.data.from_arrow(seed_tbl)
    )
    return frags.groupby("cell").map_groups(assemble, batch_format="pyarrow")


def flow_trace(d8_ds, shape: tuple[int, int], seed_mod: int):
    """Trace each seed pixel's D8 flow path to its terminal pit: returns
    (row, col, steps, term_row, term_col) for every valid pixel with
    (row*W + col) % seed_mod == 0.

    Two-level contraction (the hierarchical-delta-stepping shape):

    1. Per D8 tile, VECTORIZED pointer doubling resolves every pixel's
       path WITHIN the tile to either an in-tile pit (done) or its first
       out-of-tile hop target — O(log tile-diameter) numpy passes, no
       per-pixel Python. Only the tile's outer RING pixels (every
       cross-tile hop lands in the target tile's 1-ring) plus its seed
       pixels emit contraction rows: O(4*T + seeds) per tile, never the
       tile area.
    2. The contracted graph (ring pixels -> next ring pixel or pit) is
       pointer-doubled once more. Its size is O(perimeter) = 4/T of the
       raster — the documented small side, same bound class as
       select_top_exact's boundary table; past that bound the same
       doubling runs as K = log2(max hops) groupby supersteps.

    D8 descent strictly decreases the (integer) pixel value, so paths are
    acyclic and hop counts are bounded by the value range."""
    h, w = shape
    DR = np.array([0, 1, 1, 1, 0, -1, -1, -1], np.int64)  # code 2^k order E..NE
    DC = np.array([1, 1, 0, -1, -1, -1, 0, 1], np.int64)

    def contract(batch: pa.Table) -> pa.Table:
        pix_o, cur_o, steps_o, done_o, kind_o = [], [], [], [], []
        for i in range(len(batch)):
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            th = int(batch["height"][i].as_py())
            tw = int(batch["width"][i].as_py())
            d8 = np.frombuffer(batch["d8"][i].as_buffer(), np.int64).reshape(th, tw).ravel()
            ok = (
                np.frombuffer(batch["ok"][i].as_buffer(), np.uint8)
                .reshape(th, tw)
                .ravel()
                .astype(bool)
            )
            rr = (r0 + np.arange(th, dtype=np.int64)).repeat(tw)
            cc = np.tile(c0 + np.arange(tw, dtype=np.int64), th)
            self_abs = rr * w + cc
            code_idx = np.zeros(th * tw, np.int64)
            nz = d8 > 0
            code_idx[nz] = np.round(np.log2(d8[nz])).astype(np.int64)
            tr = rr + np.where(nz, DR[code_idx], 0)
            tc = cc + np.where(nz, DC[code_idx], 0)
            terminal = ok & ~nz
            cur = np.where(terminal, self_abs, tr * w + tc)
            in_tile = (tr >= r0) & (tr < r0 + th) & (tc >= c0) & (tc < c0 + tw)
            # done = LOCAL resolution finished (pit reached OR exited the
            # tile); term = actually at a pit. Exited rows continue
            # through the contracted ring graph at the driver.
            done = terminal | ~in_tile
            term = terminal.copy()
            steps = np.where(terminal, 0, 1).astype(np.int64)
            # pointer-double within the tile
            for _ in range(64):
                active = ok & ~done
                if not active.any():
                    break
                q = cur[active]
                ql = (q // w - r0) * tw + (q % w - c0)
                steps[active] += steps[ql]
                done[active] = done[ql]
                term[active] = term[ql]
                cur[active] = cur[ql]
            else:  # pragma: no cover - 2^64 hops is impossible
                raise RuntimeError("flow_trace: local doubling did not converge")
            lr = np.arange(th * tw, dtype=np.int64) // tw
            lc = np.arange(th * tw, dtype=np.int64) % tw
            ring = (lr == 0) | (lr == th - 1) | (lc == 0) | (lc == tw - 1)
            is_node = ok & ring
            is_seed = ok & (self_abs % seed_mod == 0)
            for mask, kind in ((is_node, 0), (is_seed, 1)):
                pix_o.append(self_abs[mask])
                cur_o.append(cur[mask])
                steps_o.append(steps[mask])
                done_o.append(term[mask])
                kind_o.append(np.full(int(mask.sum()), kind, np.int8))
        cat = lambda xs, dt: np.concatenate(xs) if xs else np.empty(0, dt)  # noqa: E731
        return pa.table(
            {
                "pix": pa.array(cat(pix_o, np.int64), pa.int64()),
                "cur": pa.array(cat(cur_o, np.int64), pa.int64()),
                "steps": pa.array(cat(steps_o, np.int64), pa.int64()),
                "done": pa.array(cat(done_o, bool), pa.bool_()),
                "kind": pa.array(cat(kind_o, np.int8), pa.int8()),
            }
        )

    import ray.data

    rows = pa.concat_tables(
        d8_ds.map_batches(contract, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"
        )
    )
    kind = rows["kind"].to_numpy()
    n_pix = rows["pix"].to_numpy()
    n_cur = rows["cur"].to_numpy().copy()
    n_steps = rows["steps"].to_numpy().copy()
    n_done = rows["done"].to_numpy(zero_copy_only=False).copy()
    node = kind == 0
    order = np.argsort(n_pix[node], kind="stable")
    np_pix = n_pix[node][order]
    np_cur = n_cur[node][order]
    np_steps = n_steps[node][order]
    np_done = n_done[node][order]
    for _ in range(64):
        active = ~np_done
        if not active.any():
            break
        pos = np.searchsorted(np_pix, np_cur[active])
        if not np.array_equal(np_pix[pos], np_cur[active]):
            raise RuntimeError("flow_trace: cross-tile hop target missing from ring set")
        np_steps[active] += np_steps[pos]
        np_done[active] = np_done[pos]
        np_cur[active] = np_cur[pos]
    else:  # pragma: no cover
        raise RuntimeError("flow_trace: contracted doubling did not converge")
    s_pix = n_pix[~node]
    s_cur = n_cur[~node]
    s_steps = n_steps[~node]
    s_done = n_done[~node]
    open_ = ~s_done
    if open_.any():
        pos = np.searchsorted(np_pix, s_cur[open_])
        s_steps[open_] = s_steps[open_] + np_steps[pos]
        s_cur[open_] = np_cur[pos]
    return ray.data.from_arrow(
        pa.table(
            {
                "row": pa.array(s_pix // w, pa.int64()),
                "col": pa.array(s_pix % w, pa.int64()),
                "steps": pa.array(s_steps, pa.int64()),
                "term_row": pa.array(s_cur // w, pa.int64()),
                "term_col": pa.array(s_cur % w, pa.int64()),
            }
        )
    )


def _d8_targets(d8: np.ndarray, rr: np.ndarray, cc: np.ndarray, w: int):
    """Flat D8 codes -> absolute flat target indices (self at pits)."""
    DR = np.array([0, 1, 1, 1, 0, -1, -1, -1], np.int64)
    DC = np.array([1, 1, 0, -1, -1, -1, 0, 1], np.int64)
    nz = d8 > 0
    idx = np.zeros(d8.shape, np.int64)
    idx[nz] = np.round(np.log2(d8[nz])).astype(np.int64)
    tr = rr + np.where(nz, DR[idx], 0)
    tc = cc + np.where(nz, DC[idx], 0)
    return tr * w + tc, nz


def _accumulate_local(vals, d8, ok, r0, c0, th, tw, w, mass):
    """Level-ordered in-tile mass routing: acc[p] = total mass arriving at
    p (its own included) following only IN-TILE d8 edges. Strict integer
    descent means same-value pixels never connect, so one vectorized
    np.add.at per distinct value level (high -> low) is exact."""
    rr = (r0 + np.arange(th, dtype=np.int64)).repeat(tw)
    cc = np.tile(c0 + np.arange(tw, dtype=np.int64), th)
    tgt_abs, moving = _d8_targets(d8, rr, cc, w)
    in_tile = (
        (tgt_abs // w >= r0) & (tgt_abs // w < r0 + th)
        & (tgt_abs % w >= c0) & (tgt_abs % w < c0 + tw)
    )
    routable = ok & moving & in_tile
    tgt_local = (tgt_abs // w - r0) * tw + (tgt_abs % w - c0)
    acc = mass.astype(np.int64).copy()
    lv = vals[routable]
    order = np.argsort(-lv, kind="stable")
    sel_idx = np.flatnonzero(routable)[order]
    lv_sorted = lv[order]
    # group boundaries of equal-value runs (desc)
    cuts = np.flatnonzero(np.diff(lv_sorted)) + 1
    for grp in np.split(sel_idx, cuts):
        np.add.at(acc, tgt_local[grp], acc[grp])
    exits = ok & moving & ~in_tile
    return acc, tgt_abs, exits


def _flowacc_pass1_tile(cell, frag_arrays, shape, tile_size, nodata):
    """Pass-1 kernel for ONE tile (shared by the halo-shuffle and the
    bucketed-store plans): derive the D8 grid from the assembled window,
    route the tile's own unit masses (acc0), emit per-crossing source
    terms (kind 0), ring-entry exit rows (kind 1) and the derived
    D8+values tile (kind 2) pass 3 reuses."""
    w = shape[1]
    r0, c0, th, tw, vals, okw = _assemble_window(
        cell, frag_arrays, shape, tile_size, 1, nodata
    )
    d8_grid, c_ok = _d8_from_window(vals, okw, th, tw)
    d8 = d8_grid.ravel()
    ok = c_ok.ravel()
    vflat = np.rint(vals[1:-1, 1:-1]).astype(np.int64).ravel()
    acc0, tgt_abs, exits = _accumulate_local(
        vflat, d8, ok, r0, c0, th, tw, w, ok.astype(np.int64)
    )
    # source terms: per distinct crossing target, the carried mass
    q_abs = tgt_abs[exits]
    b_mass = acc0[exits]
    uq, inv = np.unique(q_abs, return_inverse=True)
    b_sum = np.bincount(inv, weights=b_mass).astype(np.int64)
    # ring entries: in-tile path exit via pointer doubling
    rr = (r0 + np.arange(th, dtype=np.int64)).repeat(tw)
    cc = np.tile(c0 + np.arange(tw, dtype=np.int64), th)
    self_abs = rr * w + cc
    in_tile = (
        (tgt_abs // w >= r0) & (tgt_abs // w < r0 + th)
        & (tgt_abs % w >= c0) & (tgt_abs % w < c0 + tw)
    )
    moving = d8 > 0
    terminal = ok & ~moving
    cur = np.where(terminal, self_abs, tgt_abs)
    done = terminal | ~in_tile
    term = terminal.copy()
    for _ in range(64):
        active = ok & ~done
        if not active.any():
            break
        q = cur[active]
        ql = (q // w - r0) * tw + (q % w - c0)
        done[active] = done[ql]
        term[active] = term[ql]
        cur[active] = cur[ql]
    else:  # pragma: no cover
        raise RuntimeError("flow_accumulation: local doubling did not converge")
    lr = np.arange(th * tw, dtype=np.int64) // tw
    lc = np.arange(th * tw, dtype=np.int64) % tw
    ring = ((lr == 0) | (lr == th - 1) | (lc == 0) | (lc == tw - 1)) & ok
    e_pix = self_abs[ring]
    e_val = vflat[ring]
    e_exit = np.where(term[ring], -1, cur[ring])
    n_b, n_e = len(uq), len(e_pix)
    return pa.table(
        {
            "kind": pa.array([0] * n_b + [1] * n_e + [2], pa.int8()),
            "pix": pa.array(np.concatenate([uq, e_pix, [0]]), pa.int64()),
            "aux": pa.array(np.concatenate([b_sum, e_val, [0]]), pa.int64()),
            "exit": pa.array(
                np.concatenate([np.full(n_b, -1, np.int64), e_exit, [0]]), pa.int64()
            ),
            "cell": pa.array([cell] * (n_b + n_e + 1), pa.int64()),
            "row_off": pa.array([r0] * (n_b + n_e + 1), pa.int32()),
            "col_off": pa.array([c0] * (n_b + n_e + 1), pa.int32()),
            "height": pa.array([th] * (n_b + n_e + 1), pa.int32()),
            "width": pa.array([tw] * (n_b + n_e + 1), pa.int32()),
            "d8": pa.array([None] * (n_b + n_e) + [d8_grid.tobytes()], pa.binary()),
            "vals": pa.array([None] * (n_b + n_e) + [vflat.tobytes()], pa.binary()),
            "ok": pa.array(
                [None] * (n_b + n_e) + [c_ok.astype(np.uint8).tobytes()], pa.binary()
            ),
        }
    )


class _FlowAccStoreKernel:
    """Task-pool pass-1 kernel over a ``write_tiles_bucketed`` store:
    targeted core+halo partition reads per cell, zero exchanges (the
    stencil store plan applied to hydrology)."""

    def __init__(self, path, shape, tile_size, nodata):
        self.path = path
        self.shape = shape
        self.tile_size = tile_size
        self.nodata = nodata

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os

        import pyarrow.parquet as pq

        cols = ["row_off", "col_off", "height", "width", "dtype", "pixels"]
        out = []
        for cell in batch["cell"].to_pylist():
            cell = int(cell)
            parts = [pq.read_table(os.path.join(self.path, f"core/cell={cell}"), columns=cols)]
            halo_dir = os.path.join(self.path, f"halo/cell={cell}")
            if os.path.isdir(halo_dir):
                parts.append(pq.read_table(halo_dir, columns=cols))
            frags = pa.concat_tables(parts).append_column(
                "cell", pa.array([cell] * sum(len(p) for p in parts), pa.int64())
            )
            out.append(
                _flowacc_pass1_tile(
                    cell, _tile_arrays(frags), self.shape, self.tile_size, self.nodata
                )
            )
        return pa.concat_tables(out)


def _flowacc_finish(mixed, shape, sample_mod):
    """Contracted boundary-inflow solve (driver, O(perimeter)) + pass 3
    re-routing over the derived D8 tiles emitted by pass 1."""
    import ray

    import pyarrow.compute as pc

    w = shape[1]
    contracted = pa.concat_tables(
        mixed.map_batches(
            lambda b: b.filter(pc.less(b["kind"], 2)).select(
                ["kind", "pix", "aux", "exit"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).iter_batches(batch_format="pyarrow")
    )
    kind = contracted["kind"].to_numpy()
    is_b = kind == 0
    e_pix = contracted["pix"].to_numpy()[~is_b]
    e_val = contracted["aux"].to_numpy()[~is_b]
    e_exit = contracted["exit"].to_numpy()[~is_b]
    order = np.argsort(e_pix, kind="stable")
    e_pix, e_val, e_exit = e_pix[order], e_val[order], e_exit[order]
    inflow = np.zeros(len(e_pix), np.int64)
    b_pix = contracted["pix"].to_numpy()[is_b]
    b_mass = contracted["aux"].to_numpy()[is_b]
    pos = np.searchsorted(e_pix, b_pix)
    if len(b_pix) and not np.array_equal(e_pix[np.clip(pos, 0, len(e_pix) - 1)], b_pix):
        raise RuntimeError("flow_accumulation: crossing target missing from ring set")
    np.add.at(inflow, pos, b_mass)
    # descending-value sweep over the contracted DAG (vectorized per level)
    has_exit = e_exit >= 0
    lv = e_val[has_exit]
    sel = np.flatnonzero(has_exit)[np.argsort(-lv, kind="stable")]
    lv_sorted = e_val[sel]
    cuts = np.flatnonzero(np.diff(lv_sorted)) + 1
    for grp in np.split(sel, cuts):
        tpos = np.searchsorted(e_pix, e_exit[grp])
        np.add.at(inflow, tpos, inflow[grp])
    ring_ref = ray.put((e_pix, inflow))

    def pass3(batch: pa.Table) -> pa.Table:
        ring_pix, ring_in = ray.get(ring_ref)
        rows_o, cols_o, acc_o = [], [], []
        tiles = batch.filter(pc.equal(batch["kind"], 2))
        for i in range(len(tiles)):
            r0 = int(tiles["row_off"][i].as_py())
            c0 = int(tiles["col_off"][i].as_py())
            th = int(tiles["height"][i].as_py())
            tw = int(tiles["width"][i].as_py())
            d8 = np.frombuffer(tiles["d8"][i].as_buffer(), np.int64)
            vflat = np.frombuffer(tiles["vals"][i].as_buffer(), np.int64)
            ok = np.frombuffer(tiles["ok"][i].as_buffer(), np.uint8).astype(bool)
            rr = (r0 + np.arange(th, dtype=np.int64)).repeat(tw)
            cc = np.tile(c0 + np.arange(tw, dtype=np.int64), th)
            self_abs = rr * w + cc
            mass = ok.astype(np.int64)
            p = np.searchsorted(ring_pix, self_abs)
            p = np.clip(p, 0, max(len(ring_pix) - 1, 0))
            hit = (ring_pix[p] == self_abs) if len(ring_pix) else np.zeros(len(p), bool)
            mass = mass + np.where(hit & ok, ring_in[p] if len(ring_pix) else 0, 0)
            acc, _tgt, _ex = _accumulate_local(
                vflat, d8, ok, r0, c0, th, tw, w, mass
            )
            pick = ok & (self_abs % sample_mod == 0)
            rows_o.append(rr[pick])
            cols_o.append(cc[pick])
            acc_o.append(acc[pick])
        cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64)  # noqa: E731
        return pa.table(
            {
                "row": pa.array(cat(rows_o), pa.int64()),
                "col": pa.array(cat(cols_o), pa.int64()),
                "acc": pa.array(cat(acc_o), pa.int64()),
            }
        )

    return mixed.map_batches(pass3, batch_format="pyarrow", zero_copy_batch=True)


def flow_accumulation(tiles_ds, shape: tuple[int, int], nodata: float,
                      sample_mod: int, tile_size: int = 256):
    """D8 flow accumulation (the number of pixels draining through each
    pixel, itself included) — the Barnes (2017) two-pass tile scheme:

    1. One halo exchange derives each tile's D8 grid; a LEVEL-ORDERED
       vectorized pass routes the tile's own unit masses (acc0), records
       each cross-tile crossing's carried mass (the source term b), and
       pointer-doubles every ring pixel's in-tile path to its exit.
    2. The contracted ring graph (O(perimeter) nodes: inflow(q) = b(q) +
       sum of inflow over entries exiting at q) is solved by one
       descending-value sweep — acyclic by strict integer descent.
    3. A second per-tile pass re-routes mass with the solved boundary
       inflows seeded at entry pixels; pixels cross no further exchange
       (the derived D8 tiles from pass 1 are reused).

    ``flow_accumulation_from_store`` is the shuffle-free variant over a
    ``write_tiles_bucketed`` store (bit-identical, pytest differential).

    Returns (row, col, acc) for valid pixels with (row*W + col) %
    sample_mod == 0; acc is exact int64."""

    def fan(batch: pa.Table) -> pa.Table:
        return tile_fragments(batch, shape, tile_size, 1)

    def pass1(group: pa.Table) -> pa.Table:
        cell = int(group["cell"][0].as_py())
        return _flowacc_pass1_tile(cell, _tile_arrays(group), shape, tile_size, nodata)

    frags = tiles_ds.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True)
    mixed = frags.groupby("cell").map_groups(pass1, batch_format="pyarrow").materialize()
    return _flowacc_finish(mixed, shape, sample_mod)


def flow_accumulation_from_store(
    path: str,
    shape: tuple[int, int],
    nodata: float,
    sample_mod: int,
    tile_size: int = 256,
):
    """Shuffle-free flow accumulation over a ``write_tiles_bucketed``
    store (staged radius >= 1): pass 1 becomes a task-pool of targeted
    core+halo partition reads — NO pixel crosses an exchange at query
    time, mirroring ``focal_mean_from_store``."""
    import ray.data

    from ._cluster import pool

    ntr, ntc = _n_tiles(shape, tile_size)
    grid_r, grid_c = np.meshgrid(
        np.arange(ntr, dtype=np.int64), np.arange(ntc, dtype=np.int64), indexing="ij"
    )
    cells = cell_id(grid_r.ravel(), grid_c.ravel())
    ds = ray.data.from_arrow(pa.table({"cell": pa.array(cells, pa.int64())}))
    n_blocks = max(1, min(len(cells), pool()[1] * 2))
    mixed = ds.repartition(n_blocks).map_batches(
        _FlowAccStoreKernel(path, shape, tile_size, nodata),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    return _flowacc_finish(mixed, shape, sample_mod)


def sample_aspect_pixels(slope_ds, raster_width: int, mod: int):
    """(row, col, gx, gy, aspect_d8) sample of a focal_slope_tiled result:
    aspect as the D8 code (ESRI powers of two) of the steepest-DESCENT
    compass direction implied by the Horn gradient — the direction d
    maximizing the downslope derivative -(gx*dx + gy*dy)/|d|. The same
    exact integer metric as flow direction (2*proj^2 cardinal vs proj^2
    diagonal, positive projections only, fixed E,SE,S,... priority
    tie-break); 0 where the gradient is flat. Null where the 3x3 window
    is not fully valid. No trig anywhere, so SQL mirrors it bit-exactly."""

    def sample(batch: pa.Table) -> pa.Table:
        rows_o, cols_o, gx_o, gy_o, ok_o = [], [], [], [], []
        for i in range(len(batch)):
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            th = int(batch["height"][i].as_py())
            tw = int(batch["width"][i].as_py())
            gx = np.frombuffer(batch["gx"][i].as_buffer(), np.int64).reshape(th, tw)
            gy = np.frombuffer(batch["gy"][i].as_buffer(), np.int64).reshape(th, tw)
            ok = np.frombuffer(batch["ok"][i].as_buffer(), np.uint8).reshape(th, tw)
            rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
            cc = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
            pick = (rr * raster_width + cc) % mod == 0
            rows_o.append(np.broadcast_to(rr, (th, tw))[pick])
            cols_o.append(np.broadcast_to(cc, (th, tw))[pick])
            gx_o.append(gx[pick])
            gy_o.append(gy[pick])
            ok_o.append(ok[pick])
        rows = np.concatenate(rows_o) if rows_o else np.empty(0, np.int64)
        cols = np.concatenate(cols_o) if cols_o else np.empty(0, np.int64)
        gx = np.concatenate(gx_o) if gx_o else np.empty(0, np.int64)
        gy = np.concatenate(gy_o) if gy_o else np.empty(0, np.int64)
        bad = ~(np.concatenate(ok_o) if ok_o else np.empty(0, np.uint8)).astype(bool)
        best_m = np.zeros(len(gx), np.int64)
        best_d = np.zeros(len(gx), np.int64)
        for dr, dc, code, mult in _D8_NEIGHBORS:
            proj = -(gx * dc + gy * dr)
            m = mult * proj * proj
            take = (proj > 0) & (m > best_m)
            best_m[take] = m[take]
            best_d[take] = code
        return pa.table(
            {
                "row": pa.array(rows, pa.int64()),
                "col": pa.array(cols, pa.int64()),
                "gx": pa.array(gx, pa.int64(), mask=bad),
                "gy": pa.array(gy, pa.int64(), mask=bad),
                "aspect_d8": pa.array(best_d, pa.int64(), mask=bad),
            }
        )

    return slope_ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def focal_majority_tiled(
    tiles_ds,
    shape: tuple[int, int],
    nodata: float,
    radius: int = 1,
    tile_size: int = 256,
):
    """Focal majority (mode) filter for CATEGORICAL rasters: per pixel
    the most frequent valid value in the (2r+1)^2 neighborhood, ties to
    the SMALLEST value (the zonal majority convention, main.py:259-266
    of the reference); null where the whole neighborhood is invalid.

    Per-window counts are one integral-image box sum PER DISTINCT CLASS
    in the padded window — O(k) vectorized passes, documented bound:
    small-cardinality categorical rasters (the gdal sieve/majority
    use case). Same radius-r halo exchange. Returns derived tiles
    (cell, row_off, col_off, height, width, maj:binary i64,
    majcnt:binary i64, fcnt:binary i64)."""
    if radius > tile_size:
        raise ValueError(f"radius {radius} exceeds tile_size {tile_size}")
    k = 2 * radius + 1

    def fan(batch: pa.Table) -> pa.Table:
        return tile_fragments(batch, shape, tile_size, radius)

    def assemble(group: pa.Table) -> pa.Table:
        cell = int(group["cell"][0].as_py())
        r0, c0, th, tw, vals, ok = _assemble_window(
            cell, _tile_arrays(group), shape, tile_size, radius, nodata
        )
        iv = np.rint(vals).astype(np.int64)
        okb = ok.astype(bool)
        fcnt = _box_sum(ok, k)
        best_cnt = np.zeros((th, tw), np.int64)
        best_val = np.zeros((th, tw), np.int64)
        for v in np.unique(iv[okb]):  # ascending -> smallest wins ties
            cnt = _box_sum((okb & (iv == v)).astype(np.int64), k)
            take = cnt > best_cnt
            best_cnt[take] = cnt[take]
            best_val[take] = v
        return pa.table(
            {
                "cell": pa.array([cell], pa.int64()),
                "row_off": pa.array([r0], pa.int32()),
                "col_off": pa.array([c0], pa.int32()),
                "height": pa.array([th], pa.int32()),
                "width": pa.array([tw], pa.int32()),
                "maj": pa.array([best_val.tobytes()], pa.binary()),
                "majcnt": pa.array([best_cnt.tobytes()], pa.binary()),
                "fcnt": pa.array([fcnt.tobytes()], pa.binary()),
            }
        )

    frags = tiles_ds.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True)
    return frags.groupby("cell").map_groups(assemble, batch_format="pyarrow")


def sample_majority_pixels(maj_ds, raster_width: int, mod: int):
    """(row, col, maj_val, maj_cnt, fcnt) sample of a focal_majority
    result; maj_val/maj_cnt null where the neighborhood is empty."""

    def sample(batch: pa.Table) -> pa.Table:
        rows_o, cols_o, v_o, c_o, f_o = [], [], [], [], []
        for i in range(len(batch)):
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            th = int(batch["height"][i].as_py())
            tw = int(batch["width"][i].as_py())
            maj = np.frombuffer(batch["maj"][i].as_buffer(), np.int64).reshape(th, tw)
            mc = np.frombuffer(batch["majcnt"][i].as_buffer(), np.int64).reshape(th, tw)
            fc = np.frombuffer(batch["fcnt"][i].as_buffer(), np.int64).reshape(th, tw)
            rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
            cc = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
            pick = (rr * raster_width + cc) % mod == 0
            rows_o.append(np.broadcast_to(rr, (th, tw))[pick])
            cols_o.append(np.broadcast_to(cc, (th, tw))[pick])
            v_o.append(maj[pick])
            c_o.append(mc[pick])
            f_o.append(fc[pick])
        cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64)  # noqa: E731
        fc = cat(f_o)
        empty = fc == 0
        return pa.table(
            {
                "row": pa.array(cat(rows_o), pa.int64()),
                "col": pa.array(cat(cols_o), pa.int64()),
                "maj_val": pa.array(cat(v_o), pa.int64(), mask=empty),
                "maj_cnt": pa.array(cat(c_o), pa.int64(), mask=empty),
                "fcnt": pa.array(fc, pa.int64()),
            }
        )

    return maj_ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def reclassify_tiled(tiles_ds, mapping: dict, nodata: float):
    """Broadcast-map reclassification (gdal reclass / category remap as a
    standalone raster op): out(px) = mapping[val] for valid pixels whose
    integer value is mapped; UNMAPPED valid pixels and nodata pixels are
    both invalid in the output. Stateless map_batches (the mapping rides
    the closure — O(k) smal side), searchsorted gather per tile, no
    exchange. Output schema matches raster_calc_tiled (vals f64 + ok)."""
    keys = np.array(sorted(mapping), dtype=np.int64)
    outs = np.array([float(mapping[k]) for k in keys], dtype=np.float64)

    def conv(batch: pa.Table) -> pa.Table:
        cells, fro, fco, fh, fw, vals_o, ok_o = [], [], [], [], [], [], []
        for cell, r0, c0, arr in _tile_arrays(batch):
            th, tw = arr.shape
            valid = arr != float(nodata)
            iv = np.rint(arr.astype(np.float64)).astype(np.int64)
            pos = np.clip(np.searchsorted(keys, iv), 0, max(len(keys) - 1, 0))
            hit = (keys[pos] == iv) if len(keys) else np.zeros(iv.shape, bool)
            ok = valid & hit
            out = np.where(ok, outs[pos] if len(keys) else 0.0, np.nan)
            cells.append(cell)
            fro.append(r0)
            fco.append(c0)
            fh.append(th)
            fw.append(tw)
            vals_o.append(out.tobytes())
            ok_o.append(ok.astype(np.uint8).tobytes())
        return pa.table(
            {
                "cell": pa.array(cells, pa.int64()),
                "row_off": pa.array(fro, pa.int32()),
                "col_off": pa.array(fco, pa.int32()),
                "height": pa.array(fh, pa.int32()),
                "width": pa.array(fw, pa.int32()),
                "vals": pa.array(vals_o, pa.binary()),
                "ok": pa.array(ok_o, pa.binary()),
            }
        )

    return tiles_ds.map_batches(conv, batch_format="pyarrow", zero_copy_batch=True)


def focal_std_tiled(
    tiles_ds,
    shape: tuple[int, int],
    nodata: float,
    radius: int = 1,
    tile_size: int = 256,
):
    """Focal standard deviation (terrain roughness / texture): per pixel
    the population std of the valid neighbors in the (2r+1)^2 window —
    box sums of v and v^2 per assembled halo window (both exact integers
    in float64 for integer rasters), finished per pixel by the same IEEE
    chain the SQL mirror uses: sqrt(max(sq/cnt - (s/cnt)*(s/cnt), 0)).
    Returns derived tiles (..., fsum/fsq:binary f64, fcnt:binary i64)."""
    if radius > tile_size:
        raise ValueError(f"radius {radius} exceeds tile_size {tile_size}")
    k = 2 * radius + 1

    def fan(batch: pa.Table) -> pa.Table:
        return tile_fragments(batch, shape, tile_size, radius)

    def assemble(group: pa.Table) -> pa.Table:
        cell = int(group["cell"][0].as_py())
        r0, c0, th, tw, vals, ok = _assemble_window(
            cell, _tile_arrays(group), shape, tile_size, radius, nodata
        )
        fsum = _box_sum(vals * ok, k)
        fsq = _box_sum(vals * vals * ok, k)
        fcnt = _box_sum(ok, k)
        return pa.table(
            {
                "cell": pa.array([cell], pa.int64()),
                "row_off": pa.array([r0], pa.int32()),
                "col_off": pa.array([c0], pa.int32()),
                "height": pa.array([th], pa.int32()),
                "width": pa.array([tw], pa.int32()),
                "fsum": pa.array([fsum.tobytes()], pa.binary()),
                "fsq": pa.array([fsq.tobytes()], pa.binary()),
                "fcnt": pa.array([fcnt.tobytes()], pa.binary()),
            }
        )

    frags = tiles_ds.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True)
    return frags.groupby("cell").map_groups(assemble, batch_format="pyarrow")


def sample_std_pixels(std_ds, raster_width: int, mod: int):
    """(row, col, fsum, fsq, fcnt, fstd) sample of a focal_std result;
    null std where the neighborhood is empty."""

    def sample(batch: pa.Table) -> pa.Table:
        rows_o, cols_o, s_o, q_o, c_o = [], [], [], [], []
        for i in range(len(batch)):
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            th = int(batch["height"][i].as_py())
            tw = int(batch["width"][i].as_py())
            fsum = np.frombuffer(batch["fsum"][i].as_buffer(), np.float64).reshape(th, tw)
            fsq = np.frombuffer(batch["fsq"][i].as_buffer(), np.float64).reshape(th, tw)
            fcnt = np.frombuffer(batch["fcnt"][i].as_buffer(), np.int64).reshape(th, tw)
            rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
            cc = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
            pick = (rr * raster_width + cc) % mod == 0
            rows_o.append(np.broadcast_to(rr, (th, tw))[pick])
            cols_o.append(np.broadcast_to(cc, (th, tw))[pick])
            s_o.append(fsum[pick])
            q_o.append(fsq[pick])
            c_o.append(fcnt[pick])
        rows = np.concatenate(rows_o) if rows_o else np.empty(0, np.int64)
        cols = np.concatenate(cols_o) if cols_o else np.empty(0, np.int64)
        s = np.concatenate(s_o) if s_o else np.empty(0, np.float64)
        q = np.concatenate(q_o) if q_o else np.empty(0, np.float64)
        c = np.concatenate(c_o) if c_o else np.empty(0, np.int64)
        empty = c == 0
        cs = np.where(empty, 1, c).astype(np.float64)
        mean = s / cs
        std = np.sqrt(np.maximum(q / cs - mean * mean, 0.0))
        return pa.table(
            {
                "row": pa.array(rows, pa.int64()),
                "col": pa.array(cols, pa.int64()),
                "fsum": pa.array(np.where(empty, np.nan, s), pa.float64(), mask=empty),
                "fsq": pa.array(np.where(empty, np.nan, q), pa.float64(), mask=empty),
                "fcnt": pa.array(c, pa.int64()),
                "fstd": pa.array(std, pa.float64(), mask=empty),
            }
        )

    return std_ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def raster_value_quantiles(tiles_ds, nodata: float, qs: tuple = (0.25, 0.5, 0.9)):
    """EXACT raster quantiles via the value-histogram: per-tile
    (value, count) partials -> one thin groupby -> a driver-side
    cumulative scan over the (bounded-cardinality) distinct values.
    quantile(q) = the smallest value whose cumulative count reaches
    ceil(q * n) — integer arithmetic end to end, no sampling, no sort of
    pixels. Documented bound: distinct-value table fits the driver (the
    integer-raster analogue of select_top_exact's score histogram).
    Returns Dataset(q, value, cum_count, n_valid)."""
    import ray.data

    def partials(batch: pa.Table) -> pa.Table:
        vs_o, cn_o = [], []
        for _cell, _r0, _c0, arr in _tile_arrays(batch):
            a = np.rint(arr.astype(np.float64)).astype(np.int64).ravel()
            valid = arr.ravel() != float(nodata)
            uv, cnt = np.unique(a[valid], return_counts=True)
            vs_o.append(uv)
            cn_o.append(cnt.astype(np.int64))
        cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64)  # noqa: E731
        return pa.table(
            {"value": pa.array(cat(vs_o), pa.int64()), "cnt": pa.array(cat(cn_o), pa.int64())}
        )

    def merge(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "value": pa.array([int(group["value"][0].as_py())], pa.int64()),
                "cnt": pa.array([int(np.sum(group["cnt"].to_numpy()))], pa.int64()),
            }
        )

    hist = (
        tiles_ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("value")
        .map_groups(merge, batch_format="pyarrow")
    )
    tbl = pa.concat_tables(hist.iter_batches(batch_format="pyarrow"))
    vals = tbl["value"].to_numpy()
    cnts = tbl["cnt"].to_numpy()
    order = np.argsort(vals, kind="stable")
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    q_o, v_o, c_o = [], [], []
    for q in qs:
        target = -(-int(round(q * 1000)) * n // 1000)  # ceil(q*n) in exact integers
        idx = int(np.searchsorted(cum, max(target, 1)))
        q_o.append(int(round(q * 1000)))
        v_o.append(int(vals[idx]) if n else None)
        c_o.append(int(cum[idx]) if n else None)
    return ray.data.from_arrow(
        pa.table(
            {
                "q_millis": pa.array(q_o, pa.int64()),
                "value": pa.array(v_o, pa.int64()),
                "cum_count": pa.array(c_o, pa.int64()),
                "n_valid": pa.array([n] * len(qs), pa.int64()),
            }
        )
    )


# ----------------------------------------------------- contour extraction


def contour_crossings(
    tiles_ds,
    shape: tuple[int, int],
    nodata: float,
    levels,
    tile_size: int = 256,
    mod: int = 1,
):
    """Iso-level edge crossings — the marching-squares building block of
    ``gdal_contour``: for every adjacent VALID pixel pair (right and
    down neighbors, each pair owned by its left/top pixel so it is
    emitted exactly once) whose values strictly straddle a level L
    (``(a < L) != (b < L)``; a == L counts as not-below), the linear
    interpolation offset ``t = (L - a) / (b - a)`` of the crossing along
    the edge. One float64 divide of exact integer operands per crossing,
    bit-identical to the SQL mirror. Assembling crossings into polylines
    is the tile-local trace + contracted-graph stitch already proven by
    ``polygonize_tiled``; the crossings themselves are the exact,
    SQL-checkable core.

    Same radius-1 halo exchange as the focal family (a pixel's right /
    down neighbor may live in the next tile). ``mod`` samples owner
    pixels by ``(row*W + col) % mod == 0``. Output rows:
    (level:int64, row, col, dir 0=toward col+1 / 1=toward row+1, t)."""
    levels = [int(lv) for lv in levels]

    def fan(batch: pa.Table) -> pa.Table:
        return tile_fragments(batch, shape, tile_size, 1)

    def crossings(group: pa.Table) -> pa.Table:
        cell = int(group["cell"][0].as_py())
        r0, c0, th, tw, vals, ok = _assemble_window(
            cell, _tile_arrays(group), shape, tile_size, 1, nodata
        )
        e = vals[1:-1, 1:-1]
        oke = ok[1:-1, 1:-1] > 0
        rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
        cc = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
        own = (rr * shape[1] + cc) % mod == 0
        lv_o, r_o, c_o, d_o, t_o = [], [], [], [], []
        for direction, nb, okn in (
            (0, vals[1:-1, 2:], ok[1:-1, 2:] > 0),
            (1, vals[2:, 1:-1], ok[2:, 1:-1] > 0),
        ):
            pair = oke & okn & own
            for lv in levels:
                hit = pair & ((e < lv) != (nb < lv))
                if not hit.any():
                    continue
                a = e[hit]
                b = nb[hit]
                t = (float(lv) - a) / (b - a)
                n = int(hit.sum())
                lv_o.append(np.full(n, lv, np.int64))
                r_o.append(np.broadcast_to(rr, (th, tw))[hit])
                c_o.append(np.broadcast_to(cc, (th, tw))[hit])
                d_o.append(np.full(n, direction, np.int64))
                t_o.append(t)
        cat = lambda xs, dt: np.concatenate(xs) if xs else np.empty(0, dt)  # noqa: E731
        return pa.table(
            {
                "level": pa.array(cat(lv_o, np.int64), pa.int64()),
                "row": pa.array(cat(r_o, np.int64), pa.int64()),
                "col": pa.array(cat(c_o, np.int64), pa.int64()),
                "dir": pa.array(cat(d_o, np.int64), pa.int64()),
                "t": pa.array(cat(t_o, np.float64), pa.float64()),
            }
        )

    frags = tiles_ds.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True)
    return frags.groupby("cell").map_groups(crossings, batch_format="pyarrow")


# ----------------------------------------------------- cost distance

_COST_INF = np.int64(1) << np.int64(62)
_WCOST_INF = np.int64(1) << np.int64(54)  # dist portion of the packed int
_WCOST_MASK = np.int64(127)  # low 7 bits carry the pixel's own weight


def cost_distance_tiled(
    tiles_ds,
    shape: tuple[int, int],
    nodata: float,
    seeds,
    tile_size: int = 128,
    passable_fn=None,
    max_rounds: int | None = None,
    allocate: bool = False,
    weighted: bool = False,
):
    """Geodesic (4-connected, unit-step) distance to the nearest seed
    pixel through PASSABLE pixels only — cost distance with obstacles,
    the gdal_proximity generalization that respects barriers.

    With ``allocate=True`` the relaxed quantity is the COMPOSITE integer
    ``dist * n_seeds + seed_index`` (cost ALLOCATION): min-plus over the
    composite minimizes distance first, then the seed index as the
    tie-break, and a unit step adds ``n_seeds`` — the identical sweep /
    convergence machinery yields nearest-seed ids with zero extra
    exchanges. Decode with ``sample_alloc_pixels``.

    With ``weighted=True`` (gdal cost-distance semantics; exclusive
    with ``allocate``) the step a -> b costs ``value(a) + value(b)``
    and the relaxed quantity is the packed integer
    ``dist * 128 + value`` — each pixel's own cost rides in the low 7
    bits (weights must be integers in [0, 127]) so the halo exchange
    still moves ONE int64 per pixel and the identical min-plus sweep
    computes exact Dijkstra distances (Bellman-Ford over tiles; the
    fixpoint of a nonnegative min-plus system is the shortest-path
    vector). Decode with ``sample_wcost_pixels``. No SQL oracle exists
    for weighted shortest paths (a recursive CTE's state space explodes
    in the distance term) — exactness is pinned by the sequential
    Dijkstra differential in tests/test_focal.py.

    Distributed plan: superstep halo iteration (Bellman-Ford over
    tiles, the pagerank-style materialize barrier). Each round the
    current distance field exchanges radius-1 halos (``tile_fragments``
    on the DERIVED dist tiles), every tile relaxes to its LOCAL
    fixpoint with one vectorized min-plus frontier sweep (4 shifted
    slices, no per-pixel Python), and the loop stops the first round
    nothing changes — which certifies the unique global min-plus
    fixpoint, i.e. exact BFS distances. #rounds = max number of tile
    boundary crossings along any geodesic (diameter/tile_size for
    convex obstacle fields), NOT the pixel diameter; each exchange
    moves one int64 per pixel (core + 4/T strips). At 100 TB the core
    move vanishes with cell-partitioned dist tiles on storage exactly
    like ``focal_mean_from_store``.

    ``seeds``: iterable of (row, col); seeds on impassable pixels are
    ignored (the SQL oracle filters them identically).
    ``passable_fn(arr, valid) -> bool mask`` refines validity (e.g.
    value-derived barriers); default = valid (non-nodata) pixels.
    Impassable pixels carry -1; unreachable passable pixels keep
    ``_COST_INF`` (sampled as null). Raises RuntimeError if
    ``max_rounds`` elapses before convergence (runaway guard only —
    convergence is the termination criterion).
    """
    import pyarrow.compute as pc

    if allocate and weighted:
        raise ValueError("allocate and weighted are mutually exclusive packings")
    seeds = list(seeds)
    seed_r = np.asarray([r for r, _ in seeds], dtype=np.int64)
    seed_c = np.asarray([c for _, c in seeds], dtype=np.int64)
    step = np.int64(len(seeds)) if allocate else np.int64(1)
    seed_val = np.arange(len(seeds), dtype=np.int64) if allocate else np.zeros(
        len(seeds), np.int64
    )
    ntr, ntc = _n_tiles(shape, tile_size)
    if max_rounds is None:
        # runaway guard: a geodesic crosses at most (path length) tile
        # boundaries, and an optimal path never revisits a pixel
        # (non-negative step costs), so #rounds <= h*w always — even on
        # adversarial serpentine mazes where h+w would false-trip.
        max_rounds = shape[0] * shape[1] + 2

    def init(batch: pa.Table) -> pa.Table:
        cells, fro, fco, fh, fw, dts, payload = [], [], [], [], [], [], []
        for cell, r0, c0, arr in _tile_arrays(batch):
            th, tw = arr.shape
            valid = arr.astype(np.float64) != float(nodata)
            ok = passable_fn(arr, valid) if passable_fn is not None else valid
            sel = (seed_r >= r0) & (seed_r < r0 + th) & (seed_c >= c0) & (seed_c < c0 + tw)
            sr, sc = seed_r[sel] - r0, seed_c[sel] - c0
            on = ok[sr, sc]
            if weighted:
                v = np.rint(arr.astype(np.float64)).astype(np.int64)
                if bool(((v[ok] < 0) | (v[ok] > _WCOST_MASK)).any()):
                    raise ValueError("weighted cost distance needs weights in [0, 127]")
                d = np.where(ok, _WCOST_INF * 128 + v, np.int64(-1))
                # seed dist 0: packed = value only
                np.minimum.at(d, (sr[on], sc[on]), v[sr[on], sc[on]])
            else:
                d = np.where(ok, _COST_INF, np.int64(-1))
                # smallest seed index wins a shared pixel (matches the
                # composite's tie-break)
                np.minimum.at(d, (sr[on], sc[on]), seed_val[sel][on])
            cells.append(cell)
            fro.append(r0)
            fco.append(c0)
            fh.append(th)
            fw.append(tw)
            dts.append("int64")
            payload.append(d.tobytes())
        return pa.table(
            {
                "cell": pa.array(cells, pa.int64()),
                "row_off": pa.array(fro, pa.int32()),
                "col_off": pa.array(fco, pa.int32()),
                "height": pa.array(fh, pa.int32()),
                "width": pa.array(fw, pa.int32()),
                "dtype": pa.array(dts, pa.string()),
                "pixels": pa.array(payload, pa.binary()),
            }
        )

    def fan(batch: pa.Table) -> pa.Table:
        return tile_fragments(batch, shape, tile_size, 1)

    def sweep(group: pa.Table) -> pa.Table:
        cell = int(group["cell"][0].as_py())
        tr, tc = cell_decode(cell)
        r0, c0 = tr * tile_size, tc * tile_size
        th = min(tile_size, shape[0] - r0)
        tw = min(tile_size, shape[1] - c0)
        # padded int64 window; beyond-extent = impassable (-1)
        win = np.full((th + 2, tw + 2), np.int64(-1), dtype=np.int64)
        for _cell, fr0, fc0, arr in _tile_arrays(group):
            rr = fr0 - (r0 - 1)
            cc = fc0 - (c0 - 1)
            win[rr : rr + arr.shape[0], cc : cc + arr.shape[1]] = arr
        blocked = win < 0
        inf_pack = (_WCOST_INF * 128 + _WCOST_MASK) if weighted else _COST_INF
        dv = np.where(blocked, inf_pack, win)
        core_block = blocked[1:-1, 1:-1]
        before = dv[1:-1, 1:-1].copy()
        while True:
            if weighted:
                d_all = dv >> np.int64(7)
                v_all = dv & np.int64(_WCOST_MASK)
                v_c = v_all[1:-1, 1:-1]
                cand_d = (
                    np.minimum(
                        np.minimum(
                            d_all[:-2, 1:-1] + v_all[:-2, 1:-1],
                            d_all[2:, 1:-1] + v_all[2:, 1:-1],
                        ),
                        np.minimum(
                            d_all[1:-1, :-2] + v_all[1:-1, :-2],
                            d_all[1:-1, 2:] + v_all[1:-1, 2:],
                        ),
                    )
                    + v_c
                )
                np.minimum(cand_d, _WCOST_INF, out=cand_d)
                cand = cand_d * np.int64(128) + v_c
            else:
                cand = (
                    np.minimum(
                        np.minimum(dv[:-2, 1:-1], dv[2:, 1:-1]),
                        np.minimum(dv[1:-1, :-2], dv[1:-1, 2:]),
                    )
                    + step
                )
            core = dv[1:-1, 1:-1]
            new = np.minimum(core, cand)
            new[core_block] = inf_pack
            if np.array_equal(new, core):
                break
            dv[1:-1, 1:-1] = new
        out = np.where(core_block, np.int64(-1), dv[1:-1, 1:-1])
        changed = int(np.count_nonzero(out[~core_block] != before[~core_block]))
        return pa.table(
            {
                "cell": pa.array([cell], pa.int64()),
                "row_off": pa.array([r0], pa.int32()),
                "col_off": pa.array([c0], pa.int32()),
                "height": pa.array([th], pa.int32()),
                "width": pa.array([tw], pa.int32()),
                "dtype": pa.array(["int64"], pa.string()),
                "pixels": pa.array([np.ascontiguousarray(out).tobytes()], pa.binary()),
                "changed": pa.array([changed], pa.int64()),
            }
        )

    cur = tiles_ds.map_batches(init, batch_format="pyarrow", zero_copy_batch=True).materialize()
    for _round in range(max_rounds):
        frags = cur.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True)
        swept = frags.groupby("cell").map_groups(sweep, batch_format="pyarrow").materialize()
        total_changed = 0
        for b in swept.select_columns(["changed"]).iter_batches(batch_format="pyarrow"):
            s = pc.sum(b["changed"]).as_py()
            total_changed += int(s or 0)
        cur = swept.drop_columns(["changed"])
        if total_changed == 0:
            return cur
    raise RuntimeError(f"cost_distance_tiled did not converge in {max_rounds} rounds")


def sample_cost_pixels(dist_ds, raster_width: int, mod: int):
    """(row, col, dist) for PASSABLE pixels with (row*W + col) % mod == 0;
    dist is null for unreachable pixels."""

    def sample(batch: pa.Table) -> pa.Table:
        rows_o, cols_o, d_o = [], [], []
        for _cell, r0, c0, arr in _tile_arrays(batch):
            th, tw = arr.shape
            rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
            cc = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
            pick = ((rr * raster_width + cc) % mod == 0) & (arr >= 0)
            rows_o.append(np.broadcast_to(rr, (th, tw))[pick])
            cols_o.append(np.broadcast_to(cc, (th, tw))[pick])
            d_o.append(arr[pick])
        rows = np.concatenate(rows_o) if rows_o else np.empty(0, np.int64)
        cols = np.concatenate(cols_o) if cols_o else np.empty(0, np.int64)
        d = np.concatenate(d_o) if d_o else np.empty(0, np.int64)
        unreach = d >= _COST_INF
        return pa.table(
            {
                "row": pa.array(rows, pa.int64()),
                "col": pa.array(cols, pa.int64()),
                "dist": pa.array(d, pa.int64(), mask=unreach),
            }
        )

    return dist_ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def sample_wcost_pixels(wdist_ds, raster_width: int, mod: int):
    """Decode a ``cost_distance_tiled(..., weighted=True)`` packed
    field: (row, col, dist) with dist = packed >> 7 for passable
    sampled pixels, null where unreachable."""

    def sample(batch: pa.Table) -> pa.Table:
        rows_o, cols_o, d_o = [], [], []
        for _cell, r0, c0, arr in _tile_arrays(batch):
            th, tw = arr.shape
            rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
            cc = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
            pick = ((rr * raster_width + cc) % mod == 0) & (arr >= 0)
            rows_o.append(np.broadcast_to(rr, (th, tw))[pick])
            cols_o.append(np.broadcast_to(cc, (th, tw))[pick])
            d_o.append(arr[pick] >> np.int64(7))
        rows = np.concatenate(rows_o) if rows_o else np.empty(0, np.int64)
        cols = np.concatenate(cols_o) if cols_o else np.empty(0, np.int64)
        d = np.concatenate(d_o) if d_o else np.empty(0, np.int64)
        unreach = d >= _WCOST_INF
        return pa.table(
            {
                "row": pa.array(rows, pa.int64()),
                "col": pa.array(cols, pa.int64()),
                "dist": pa.array(d, pa.int64(), mask=unreach),
            }
        )

    return wdist_ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def sample_alloc_pixels(alloc_ds, raster_width: int, mod: int, n_seeds: int):
    """Decode a ``cost_distance_tiled(..., allocate=True)`` composite:
    (row, col, dist, seed) for passable sampled pixels — dist = c //
    n_seeds, seed = c % n_seeds (the seed's index in the caller's list);
    both null for unreachable pixels."""

    def sample(batch: pa.Table) -> pa.Table:
        rows_o, cols_o, d_o = [], [], []
        for _cell, r0, c0, arr in _tile_arrays(batch):
            th, tw = arr.shape
            rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
            cc = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
            pick = ((rr * raster_width + cc) % mod == 0) & (arr >= 0)
            rows_o.append(np.broadcast_to(rr, (th, tw))[pick])
            cols_o.append(np.broadcast_to(cc, (th, tw))[pick])
            d_o.append(arr[pick])
        rows = np.concatenate(rows_o) if rows_o else np.empty(0, np.int64)
        cols = np.concatenate(cols_o) if cols_o else np.empty(0, np.int64)
        comp = np.concatenate(d_o) if d_o else np.empty(0, np.int64)
        unreach = comp >= _COST_INF
        safe = np.where(unreach, 0, comp)
        return pa.table(
            {
                "row": pa.array(rows, pa.int64()),
                "col": pa.array(cols, pa.int64()),
                "dist": pa.array(safe // n_seeds, pa.int64(), mask=unreach),
                "seed": pa.array(safe % n_seeds, pa.int64(), mask=unreach),
            }
        )

    return alloc_ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


# Marching-squares segment table: per 4-bit BELOW mask (TL=1, TR=2,
# BR=4, BL=8), the crossed-edge pairs to connect. Edges: T, R, B, L.
# Saddle cases 5/10 use the FIXED (T,L)+(B,R) / (T,R)+(B,L) rule (no
# center sampling) — any fixed rule yields consistent lines; the
# sequential reference in tests uses the same table.
_MS_SEGMENTS = {
    0: [], 15: [],
    1: [("T", "L")], 14: [("T", "L")],
    2: [("T", "R")], 13: [("T", "R")],
    4: [("R", "B")], 11: [("R", "B")],
    8: [("B", "L")], 7: [("B", "L")],
    3: [("L", "R")], 12: [("L", "R")],
    6: [("T", "B")], 9: [("T", "B")],
    5: [("T", "L"), ("B", "R")],
    10: [("T", "R"), ("B", "L")],
}




def contour_polylines(
    tiles_ds,
    shape: tuple[int, int],
    nodata: float,
    levels,
    tile_size: int = 256,
    max_iter: int = 256,
):
    """Assembled contour LINES (the rest of ``gdal_contour`` on top of
    ``contour_crossings``): marching squares over every fully-valid 2x2
    pixel cell connects the cell's edge crossings into segments (fixed
    saddle rule, ``_MS_SEGMENTS``), and two-level connected components
    yield one row per polyline: (level, line_id, n_pts, closed).

    Distributed plan — contours are LONG PATH GRAPHS, so flat min-label
    propagation would need O(line length) supersteps; instead the
    polygonize/flow_trace contraction applies:

    1. Per tile (cells owned by their top-left pixel; the radius-1 halo
       provides the other corners, so each segment is emitted exactly
       once), a LOCAL pointer-jumping CC chains the tile's segments into
       polyline FRAGMENTS — O(log tile diameter) numpy passes. The tile
       emits one thin stats row per fragment (min node key, n_nodes,
       n_edges) plus (node, fragment) claims for every node.
    2. ``groupby(node)`` over the claims: a node claimed by k fragments
       emits k-1 contracted union edges and a (k-1) node-count
       correction (shared border crossings are counted once).
       ``components_auto`` resolves the contracted fragment graph whose
       diameter is ~line length / tile_size, then a broadcast root map +
       one small groupby roll up each line.

    line_id = min crossing key of the line ((row*w + col)*2 + dir scaled
    by level index — the contour_crossings identity), layout-invariant;
    ``closed`` = n_edges == n_pts (every crossing has degree 2; an open
    line has n_edges == n_pts - 1)."""
    import pyarrow.compute as pc  # noqa: F401

    from .graph import components_auto

    levels = [int(lv) for lv in levels]
    nlv = len(levels)
    h, w = shape

    def frags_of(batch: pa.Table) -> pa.Table:
        return tile_fragments(batch, shape, tile_size, 1)

    def local(group: pa.Table) -> pa.Table:
        cell = int(group["cell"][0].as_py())
        r0, c0, th, tw, vals, ok = _assemble_window(
            cell, _tile_arrays(group), shape, tile_size, 1, nodata
        )
        tl = vals[1:-1, 1:-1]
        tr_ = vals[1:-1, 2:]
        bl = vals[2:, 1:-1]
        br = vals[2:, 2:]
        ok4 = (
            (ok[1:-1, 1:-1] > 0) & (ok[1:-1, 2:] > 0)
            & (ok[2:, 1:-1] > 0) & (ok[2:, 2:] > 0)
        )
        rr = r0 + np.arange(th, dtype=np.int64).reshape(th, 1)
        cc = c0 + np.arange(tw, dtype=np.int64).reshape(1, tw)
        base = ok4 & (rr < h - 1) & (cc < w - 1)
        rows = np.broadcast_to(rr, (th, tw))
        cols = np.broadcast_to(cc, (th, tw))
        src_o, dst_o = [], []
        for li, lv in enumerate(levels):
            case = (
                (tl < lv).astype(np.int64)
                + 2 * (tr_ < lv).astype(np.int64)
                + 4 * (br < lv).astype(np.int64)
                + 8 * (bl < lv).astype(np.int64)
            )
            for code, pairs in _MS_SEGMENTS.items():
                if not pairs:
                    continue
                m = base & (case == code)
                if not m.any():
                    continue
                r = rows[m]
                c = cols[m]
                key = {
                    "T": (r * w + c) * 2,
                    "B": ((r + 1) * w + c) * 2,
                    "L": (r * w + c) * 2 + 1,
                    "R": (r * w + c + 1) * 2 + 1,
                }
                for ea, eb in pairs:
                    src_o.append(key[ea] * nlv + li)
                    dst_o.append(key[eb] * nlv + li)
        if not src_o:
            return pa.table(
                {
                    "kind": pa.array([], pa.int8()),
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        src = np.concatenate(src_o)
        dst = np.concatenate(dst_o)
        # local pointer-jumping CC over the tile's segments
        nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        si, di = inv[: len(src)], inv[len(src):]
        lab = np.arange(len(nodes), dtype=np.int64)
        for _ in range(128):
            new = lab.copy()
            np.minimum.at(new, di, lab[si])
            np.minimum.at(new, si, lab[di])
            new = new[new]
            new = new[new]
            if np.array_equal(new, lab):
                break
            lab = new
        else:  # pragma: no cover - log2(nodes per tile) << 128
            raise RuntimeError("contour_polylines: local CC did not converge")
        frag = nodes[lab]  # fragment id = min node key, globally unique
        roots, rinv = np.unique(frag, return_inverse=True)
        n_nodes = np.bincount(rinv, minlength=len(roots)).astype(np.int64)
        n_edges = np.bincount(rinv[si], minlength=len(roots)).astype(np.int64)
        # kind 0: per-fragment stats (a=frag, b=n_nodes, c=n_edges)
        # kind 1: per-node claims   (a=node, b=frag)
        k0 = len(roots)
        k1 = len(nodes)
        return pa.table(
            {
                "kind": pa.array([0] * k0 + [1] * k1, pa.int8()),
                "a": pa.array(np.concatenate([roots, nodes]), pa.int64()),
                "b": pa.array(np.concatenate([n_nodes, frag]), pa.int64()),
                "c": pa.array(
                    np.concatenate([n_edges, np.zeros(k1, np.int64)]), pa.int64()
                ),
            }
        )

    fanned = tiles_ds.map_batches(frags_of, batch_format="pyarrow", zero_copy_batch=True)
    both = fanned.groupby("cell").map_groups(local, batch_format="pyarrow").materialize()

    import pyarrow.compute as _pc

    stats = both.map_batches(
        lambda t: t.filter(_pc.equal(t["kind"], 0)).select(["a", "b", "c"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    claims = both.map_batches(
        lambda t: t.filter(_pc.equal(t["kind"], 1)).select(["a", "b"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def stitch(group: pa.Table) -> pa.Table:
        frs = np.unique(group["b"].to_numpy())
        k = len(group) - 1  # claims for this node beyond the first
        # contracted union edges chain the claiming fragments; the node
        # was counted len(group) times across fragments -> correct by k
        m = len(frs) - 1  # union edges
        has_corr = 1 if k > 0 else 0
        src = list(frs[:-1]) + [None] * has_corr
        dst = list(frs[1:]) + [None] * has_corr
        cf = [None] * m + ([int(frs[0])] if has_corr else [])
        cv = [None] * m + ([k] if has_corr else [])
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "corr_frag": pa.array(cf, pa.int64()),
                "corr": pa.array(cv, pa.int64()),
            }
        )

    stitched = claims.groupby("a").map_groups(stitch, batch_format="pyarrow").materialize()

    union_edges = stitched.map_batches(
        lambda t: t.select(["src", "dst"]).drop_null(),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def node_stream(batch: pa.Table) -> pa.Table:
        ns = np.unique(np.concatenate([batch["src"].to_numpy(), batch["dst"].to_numpy()]))
        return pa.table({"node": pa.array(ns, pa.int64())})

    import ray

    if union_edges.count() > 0:
        nodes = (
            union_edges.map_batches(node_stream, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("node")
            .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        )
        cc = components_auto(union_edges, nodes, max_iter=max_iter)
        cc_tbl = pa.concat_tables(cc.iter_batches(batch_format="pyarrow"))
        order = np.argsort(cc_tbl["node"].to_numpy(), kind="stable")
        root_ref = ray.put(
            (cc_tbl["node"].to_numpy()[order], cc_tbl["lbl"].to_numpy()[order])
        )
    else:
        root_ref = ray.put((np.empty(0, np.int64), np.empty(0, np.int64)))

    def to_line(col: str):
        def _f(batch: pa.Table) -> pa.Table:
            nodes_s, roots = ray.get(root_ref)
            v = batch[col].to_numpy()
            if len(nodes_s) and len(v):
                p = np.clip(np.searchsorted(nodes_s, v), 0, len(nodes_s) - 1)
                hit = nodes_s[p] == v
                v = np.where(hit, roots[p], v)
            return batch.set_column(
                batch.schema.get_field_index(col), col, pa.array(v, pa.int64())
            )

        return _f

    lined_stats = stats.map_batches(to_line("a"), batch_format="pyarrow", zero_copy_batch=True)
    lined_corr = stitched.map_batches(
        lambda t: t.select(["corr_frag", "corr"]).drop_null(),
        batch_format="pyarrow", zero_copy_batch=True,
    ).map_batches(to_line("corr_frag"), batch_format="pyarrow", zero_copy_batch=True)

    # one combined thin stream: per line sum n_nodes, n_edges, corrections
    stats_rows = lined_stats.map_batches(
        lambda t: pa.table(
            {"line": t["a"], "n": t["b"], "e": t["c"],
             "corr": pa.array(np.zeros(len(t), np.int64), pa.int64())}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    corr_rows = lined_corr.map_batches(
        lambda t: pa.table(
            {"line": t["corr_frag"],
             "n": pa.array(np.zeros(len(t), np.int64), pa.int64()),
             "e": pa.array(np.zeros(len(t), np.int64), pa.int64()),
             "corr": t["corr"]}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    lv_arr = np.asarray(levels, np.int64)

    def rollup(group: pa.Table) -> pa.Table:
        line = int(group["line"][0].as_py())
        n = int(np.sum(group["n"].to_numpy())) - int(np.sum(group["corr"].to_numpy()))
        e = int(np.sum(group["e"].to_numpy()))
        return pa.table(
            {
                "level": pa.array([int(lv_arr[line % nlv])], pa.int64()),
                "line_id": pa.array([line], pa.int64()),
                "n_pts": pa.array([n], pa.int64()),
                "closed": pa.array([e == n], pa.bool_()),
            }
        )

    return stats_rows.union(corr_rows).groupby("line").map_groups(
        rollup, batch_format="pyarrow"
    )


def downsample_mode(tiles_ds, factor: int, nodata: float):
    """Factor-f MODE pooling (the categorical overview level,
    ``gdaladdo -r mode``): coarse pixel (R, C) = most frequent valid
    value among fine pixels with row//f == R, col//f == C, ties to the
    SMALLEST value (the zonal-majority convention). Per-tile
    (ckey, value, cnt) partials — one row per (coarse block, distinct
    value) per touching tile — merge in one thin groupby; all-nodata
    coarse blocks emit cnt 0 / null mode. Returns
    (crow, ccol, n_valid:int64, mode_val:int64 null)."""
    f = int(factor)

    def partials(batch: pa.Table) -> pa.Table:
        keys_o, val_o, cnt_o = [], [], []
        for _cell, r0, c0, arr in _tile_arrays(batch):
            th, tw = arr.shape
            a = np.rint(arr.astype(np.float64)).astype(np.int64)
            gr = (r0 + np.arange(th, dtype=np.int64)).reshape(th, 1) // f
            gc = (c0 + np.arange(tw, dtype=np.int64)).reshape(1, tw) // f
            ckey = (np.broadcast_to(gr, (th, tw)) << np.int64(32)) | np.broadcast_to(
                gc, (th, tw)
            )
            valid = arr.astype(np.float64) != float(nodata)
            trip = np.stack([ckey[valid], a[valid]], axis=1)
            if len(trip):
                uniq, cnt = np.unique(trip, axis=0, return_counts=True)
                keys_o.append(uniq[:, 0])
                val_o.append(uniq[:, 1])
                cnt_o.append(cnt.astype(np.int64))
            # all-nodata coarse blocks this tile touches still emit a row
            touched = np.unique(ckey)
            seen = np.unique(ckey[valid]) if valid.any() else np.empty(0, np.int64)
            empty = np.setdiff1d(touched, seen, assume_unique=True)
            if len(empty):
                keys_o.append(empty)
                val_o.append(np.zeros(len(empty), np.int64))
                cnt_o.append(np.zeros(len(empty), np.int64))
        cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64)  # noqa: E731
        return pa.table(
            {
                "ckey": pa.array(cat(keys_o), pa.int64()),
                "val": pa.array(cat(val_o), pa.int64()),
                "cnt": pa.array(cat(cnt_o), pa.int64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        key = int(group["ckey"][0].as_py())
        vals = group["val"].to_numpy()
        cnts = group["cnt"].to_numpy()
        uv, inv = np.unique(vals, return_inverse=True)
        tot = np.zeros(len(uv), np.int64)
        np.add.at(tot, inv, cnts)
        n_valid = int(tot.sum())
        if n_valid:
            best = int(np.lexsort((uv, -tot))[0])  # cnt DESC, val ASC
            mode_val = int(uv[best])
        else:
            mode_val = None
        return pa.table(
            {
                "crow": pa.array([key >> 32], pa.int64()),
                "ccol": pa.array([key & 0xFFFFFFFF], pa.int64()),
                "n_valid": pa.array([n_valid], pa.int64()),
                "mode_val": pa.array([mode_val], pa.int64()),
            }
        )

    part = tiles_ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("ckey").map_groups(merge, batch_format="pyarrow")
