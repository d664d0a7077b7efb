"""Distributed zonal statistics on Ray Data.

Two physical plans (SURVEY.md sections 2.4/3.4):

1. **Broadcast path** (`zonal_stats_broadcast`): the raster fits in worker
   memory. It is ``ray.put`` once; an actor-pool ``map_batches`` stage reads
   it zero-copy from the object store in ``__init__`` and runs the sequential
   oracle kernel per zone. No shuffle; bit-identical to the oracle. This is
   the engine analog of the reference's single open raster shared across
   features (main.py:181 / ST1 in SURVEY.md).

2. **Tiled cell-join path** (`zonal_stats_tiled`): raster lives as a tile
   table keyed by int64 cell ids. Zones are exploded to (cell, zone) rows
   using exactly the tiles their boundless windowed read would touch
   (``bounds_window`` snapping, io.py:156-161). Both sides are union-ed and
   hash-shuffled by ``groupby('cell')``; a per-cell kernel rasterizes each
   zone over the window-cap-cell sub-window and emits **combinable partial
   accumulators** (count / sum / sumsq / min / max / nodata / nan (+ the
   compressed value multiset only when an exact holistic stat needs it)).
   A second ``groupby('zone_id')`` merges partials into final stats.
   Mega-polygons are therefore split-by-tile automatically — per-cell work
   is bounded by the tile budget regardless of zone size (skew rule from
   BASELINE.json north_star).

Parity notes vs the oracle (documented divergence): for float rasters,
``mean``/``sum``/``std`` are accumulated in float64 across tiles instead of
numpy's single-pass float32 window reduction — equal to ~1e-6 relative.
``median``/``percentile_*``/``majority``/``minority``/``unique``/categorical
are **exact** (value multisets are merged). Integer rasters are exact for
every stat (int64 accumulators, main.py:210-215 parity).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.affine import Affine
from ..functions.geometry import Geom, from_wkb
from ..functions.rasterize import rasterize_geom
from ..functions.stats import boxify_points, check_stats, get_percentile, key_assoc_val
from ..functions.windows import boundless_array, bounds_window, window_affine
from ..functions.zonal import compute_feature_stats
from ..sources.raster import Raster
from ..sources.tiles import DEFAULT_TILE_SIZE, cell_decode, window_cells

# ------------------------------------------------------------------ schema


def stat_fields(stats: list[str], categorical: bool) -> list[tuple[str, pa.DataType]]:
    fields: list[tuple[str, pa.DataType]] = []
    for s in stats:
        if s in ("count", "unique"):
            fields.append((s, pa.int64()))
        else:
            fields.append((s, pa.float64()))
    if categorical:
        fields.append(("cat_values", pa.list_(pa.float64())))
        fields.append(("cat_counts", pa.list_(pa.int64())))
    return fields


def _stats_dict_to_columns(
    rows: list[dict], stats: list[str], categorical: bool
) -> dict[str, list]:
    """rows carry stat values under string keys plus, when categorical, a
    '_pixel_count' dict of raw-pixel-value -> count."""
    cols: dict[str, list] = {name: [] for name, _ in stat_fields(stats, categorical)}
    for r in rows:
        for s in stats:
            cols[s].append(r.get(s))
        if categorical:
            pc_dict = r.get("_pixel_count") or {}
            ks = sorted(pc_dict)
            cols["cat_values"].append([float(k) for k in ks])
            cols["cat_counts"].append([int(pc_dict[k]) for k in ks])
    return cols


# ------------------------------------------------------------- broadcast


class BroadcastZonalKernel:
    """Actor-pool map_batches kernel: zones batch -> stats batch.

    The raster tuple (array, affine, nodata) is fetched from the object
    store once per actor in ``__init__`` (zero-copy for the pixel array).
    """

    def __init__(
        self,
        raster_ref,
        stats=None,
        all_touched: bool = False,
        categorical: bool = False,
        category_map=None,
        zone_func=None,
        add_stats=None,
        geom_col: str = "geom_wkb",
        passthrough: bool = True,
    ):
        import ray

        arr, affine, nodata = ray.get(raster_ref)
        self.rast = Raster(arr, affine=affine, nodata=nodata)
        self.stats, self.run_count = check_stats(stats, categorical)
        self.all_touched = all_touched
        self.categorical = categorical
        self.category_map = category_map
        self.zone_func = zone_func
        self.add_stats = add_stats
        self.geom_col = geom_col
        self.passthrough = passthrough

    def _zone_stats(self, wkb: bytes) -> dict:
        geom = from_wkb(wkb)
        if geom.is_point_type:
            geom = boxify_points(geom, self.rast.affine)
        fsrc = self.rast.read(bounds=geom.bounds, boundless=True)
        rv_array = rasterize_geom(
            geom, shape=fsrc.shape, affine=fsrc.affine, all_touched=self.all_touched
        )
        isnodata = fsrc.array == fsrc.nodata
        has_nan = np.issubdtype(fsrc.array.dtype, np.floating) and np.isnan(
            fsrc.array.min()
        )
        if has_nan:
            isnodata = isnodata | np.isnan(fsrc.array)
        masked = np.ma.MaskedArray(fsrc.array, mask=(isnodata | ~rv_array))
        if self.zone_func is not None:
            value = self.zone_func(masked)
            if value is not None:
                masked = value
        # categorical=False here: raw pixel-value keys ride in '_pixel_count'
        # so the Arrow schema stays fixed (cat_values/cat_counts list cols).
        out = compute_feature_stats(masked, self.stats, self.run_count, False, None)
        if self.categorical and masked.compressed().size:
            keys, counts = np.unique(masked.compressed(), return_counts=True)
            out["_pixel_count"] = dict(
                zip([k.item() for k in keys], [c.item() for c in counts])
            )
        if "nodata" in self.stats or "nan" in self.stats:
            featmasked = np.ma.MaskedArray(fsrc.array, mask=(~rv_array))
            if "nodata" in self.stats:
                out["nodata"] = float((featmasked == fsrc.nodata).sum())
            if "nan" in self.stats:
                out["nan"] = float(np.isnan(featmasked).sum()) if has_nan else 0
        if self.add_stats:
            for name, fn in self.add_stats.items():
                out[name] = fn(masked)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        wkbs = batch[self.geom_col].to_pylist()
        rows = [self._zone_stats(w) for w in wkbs]
        cols = _stats_dict_to_columns(rows, self.stats, self.categorical)
        if self.add_stats:
            for name in self.add_stats:
                cols[name] = [r.get(name) for r in rows]
        out: dict[str, pa.Array] = {}
        if self.passthrough:
            for name in batch.column_names:
                if name != self.geom_col:
                    out[name] = batch[name]
        for name, vals in cols.items():
            out[name] = pa.array(vals)
        return pa.table(out)


def zonal_stats_broadcast(
    zones_ds,
    raster,
    affine=None,
    nodata=None,
    *,
    stats=None,
    all_touched: bool = False,
    categorical: bool = False,
    category_map=None,
    zone_func=None,
    add_stats=None,
    geom_col: str = "geom_wkb",
    concurrency=(1, 8),
    batch_size: int = 64,
):
    """zones Dataset x in-memory raster -> stats Dataset (no shuffle)."""
    import ray

    if isinstance(raster, tuple):
        arr, affine, nodata = raster
    else:
        arr = raster
    raster_ref = ray.put((arr, affine, nodata))
    return zones_ds.map_batches(
        BroadcastZonalKernel,
        fn_constructor_kwargs=dict(
            raster_ref=raster_ref,
            stats=stats,
            all_touched=all_touched,
            categorical=categorical,
            category_map=category_map,
            zone_func=zone_func,
            add_stats=add_stats,
            geom_col=geom_col,
        ),
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )


# ----------------------------------------------------------- tiled path


def assign_zones_to_cells(
    batch: pa.Table,
    affine: Affine,
    tile_size: int,
    geom_col: str = "geom_wkb",
) -> pa.Table:
    """Zones batch -> exploded (cell, zone_id, geom_wkb) rows, one per tile
    the zone's boundless window touches. Tile-assignment parity =
    bounds_window snapping. Zones with degenerate (empty) windows emit one
    row with cell null so they still surface in the final output."""
    zone_ids = batch["zone_id"].to_numpy(zero_copy_only=False)
    wkbs = batch[geom_col].to_pylist()
    out_cell, out_zone, out_wkb = [], [], []
    for zid, wkb in zip(zone_ids, wkbs):
        g = from_wkb(wkb)
        if g.is_point_type:
            g = boxify_points(g, affine)
            wkb = None  # re-derived in kernel; ship boxified wkb instead
            from ..functions.geometry import to_wkb as _to_wkb

            wkb = _to_wkb(g)
        win = bounds_window(g.bounds, affine)
        cells = window_cells(win, tile_size)
        if len(cells) == 0:
            out_cell.append(None)
            out_zone.append(int(zid))
            out_wkb.append(wkb)
        else:
            out_cell.extend(int(c) for c in cells)
            out_zone.extend([int(zid)] * len(cells))
            out_wkb.extend([wkb] * len(cells))
    return pa.table(
        {
            "cell": pa.array(out_cell, pa.int64()),
            "zone_id": pa.array(out_zone, pa.int64()),
            "geom_wkb": pa.array(out_wkb, pa.binary()),
            "kind": pa.array(np.ones(len(out_cell), dtype=np.int8)),
            "row_off": pa.nulls(len(out_cell), pa.int32()),
            "col_off": pa.nulls(len(out_cell), pa.int32()),
            "height": pa.nulls(len(out_cell), pa.int32()),
            "width": pa.nulls(len(out_cell), pa.int32()),
            "dtype": pa.nulls(len(out_cell), pa.string()),
            "pixels": pa.nulls(len(out_cell), pa.binary()),
        }
    )


def tag_tiles(batch: pa.Table) -> pa.Table:
    n = len(batch)
    return pa.table(
        {
            "cell": batch["cell"],
            "zone_id": pa.nulls(n, pa.int64()),
            "geom_wkb": pa.nulls(n, pa.binary()),
            "kind": pa.array(np.zeros(n, dtype=np.int8)),
            "row_off": batch["row_off"],
            "col_off": batch["col_off"],
            "height": batch["height"],
            "width": batch["width"],
            "dtype": batch["dtype"],
            "pixels": batch["pixels"],
        }
    )


class CellKernel:
    """Per-cell group kernel: one optional tile row + N zone rows ->
    per-(zone, cell) partial accumulator rows."""

    def __init__(
        self,
        affine: Affine,
        nodata,
        tile_size: int,
        raster_dtype: str,
        all_touched: bool = False,
        need_vals: bool = False,
    ):
        self.affine = affine
        self.nodata = -999.0 if nodata is None else nodata
        self.tile_size = tile_size
        self.raster_dtype = np.dtype(raster_dtype)
        self.all_touched = all_touched
        self.need_vals = need_vals

    def __call__(self, group: pa.Table) -> pa.Table:
        kinds = group["kind"].to_numpy(zero_copy_only=False)
        tile_idx = np.nonzero(kinds == 0)[0]
        zone_idx = np.nonzero(kinds == 1)[0]
        if len(zone_idx) == 0:
            return _empty_partials()

        cell_val = group["cell"][int(zone_idx[0])].as_py()

        tile_arr = None
        t_roff = t_coff = 0
        if len(tile_idx) > 0:
            i = int(tile_idx[0])
            th = group["height"][i].as_py()
            tw = group["width"][i].as_py()
            dt = np.dtype(group["dtype"][i].as_py())
            buf = group["pixels"][i].as_buffer()
            tile_arr = np.frombuffer(buf, dtype=dt).reshape(th, tw)
            t_roff = group["row_off"][i].as_py()
            t_coff = group["col_off"][i].as_py()

        if cell_val is None:
            rect = None  # degenerate windows: emit zero partials
        else:
            tr, tc = cell_decode(cell_val)
            rect = (
                (tr * self.tile_size, (tr + 1) * self.tile_size),
                (tc * self.tile_size, (tc + 1) * self.tile_size),
            )

        rows = []
        zids = group["zone_id"].to_numpy(zero_copy_only=False)
        wkbs = group["geom_wkb"].to_pylist()
        for i in zone_idx:
            zid = int(zids[i])
            geom = from_wkb(wkbs[i])
            rows.append(self._partial(zid, geom, rect, tile_arr, t_roff, t_coff))
        return _partials_table(rows)

    def _partial(self, zid, geom: Geom, rect, tile_arr, t_roff, t_coff) -> dict:
        p = dict(
            zone_id=zid,
            count=0,
            sum_f=0.0,
            sum_i=0,
            sumsq=0.0,
            min=None,
            max=None,
            nodata=0,
            nan_cnt=0,
            has_nan=False,
            is_int=False,
            vals=b"",
        )
        if rect is None:
            return p
        win = bounds_window(geom.bounds, self.affine)
        (wr0, wr1), (wc0, wc1) = win
        (rr0, rr1), (rc0, rc1) = rect
        r0, r1 = max(wr0, rr0), min(wr1, rr1)
        c0, c1 = max(wc0, rc0), min(wc1, rc1)
        if r1 <= r0 or c1 <= c0:
            return p
        sub = ((r0, r1), (c0, c1))
        if tile_arr is not None:
            rel = ((r0 - t_roff, r1 - t_roff), (c0 - t_coff, c1 - t_coff))
            block = boundless_array(tile_arr, rel, nodata=self.nodata)
        else:
            block = np.full((r1 - r0, c1 - c0), self.nodata, dtype=self.raster_dtype)

        aff = window_affine(sub, self.affine)
        rv = rasterize_geom(geom, block.shape, aff, self.all_touched)

        isnodata = block == self.nodata
        is_float = np.issubdtype(block.dtype, np.floating)
        tile_has_nan = bool(is_float and np.isnan(block).any())
        if tile_has_nan:
            isnodata = isnodata | np.isnan(block)
        valid = rv & ~isnodata
        vals = block[valid]

        p["count"] = int(valid.sum())
        if p["count"]:
            v64 = vals.astype(np.float64)
            p["sum_f"] = float(v64.sum())
            p["sumsq"] = float((v64 * v64).sum())
            p["min"] = float(vals.min())
            p["max"] = float(vals.max())
            if not is_float:
                p["sum_i"] = int(vals.astype(np.int64).sum())
        p["is_int"] = not is_float
        gm = block[rv]
        p["nodata"] = int((gm == self.nodata).sum())
        p["nan_cnt"] = int(np.isnan(gm).sum()) if is_float else 0
        p["has_nan"] = tile_has_nan
        if self.need_vals and p["count"]:
            p["vals"] = vals.tobytes()
        return p


_PARTIAL_SCHEMA = pa.schema(
    [
        ("zone_id", pa.int64()),
        ("count", pa.int64()),
        ("sum_f", pa.float64()),
        ("sum_i", pa.int64()),
        ("sumsq", pa.float64()),
        ("min", pa.float64()),
        ("max", pa.float64()),
        ("nodata", pa.int64()),
        ("nan_cnt", pa.int64()),
        ("has_nan", pa.bool_()),
        ("is_int", pa.bool_()),
        ("vals", pa.binary()),
    ]
)


def _partials_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=_PARTIAL_SCHEMA)


def _empty_partials() -> pa.Table:
    return _PARTIAL_SCHEMA.empty_table()


class MergeKernel:
    """Per-zone group: partial accumulators -> final stat row."""

    def __init__(self, stats, categorical, category_map, raster_dtype: str):
        self.stats, self.run_count = check_stats(stats, categorical)
        self.categorical = categorical
        self.category_map = category_map
        self.raster_dtype = np.dtype(raster_dtype)

    def __call__(self, group: pa.Table) -> pa.Table:
        zid = group["zone_id"][0].as_py()
        count = int(pc.sum(group["count"]).as_py() or 0)
        stats = self.stats
        out: dict = {}

        need_vals = self.run_count or any(
            s.startswith("percentile_") or s == "median" for s in stats
        )
        vals = None
        if need_vals:
            bufs = [v for v in group["vals"].to_pylist() if v]
            if bufs:
                vals = np.frombuffer(b"".join(bufs), dtype=self.raster_dtype)
            else:
                vals = np.empty(0, dtype=self.raster_dtype)

        if count == 0:
            out = {s: None for s in stats}
            if "count" in stats:
                out["count"] = 0
            cat_values, cat_counts = [], []
        else:
            is_int = bool(group["is_int"][0].as_py())
            sum_i = int(pc.sum(group["sum_i"]).as_py() or 0)
            sum_f = float(pc.sum(group["sum_f"]).as_py() or 0.0)
            sumsq = float(pc.sum(group["sumsq"]).as_py() or 0.0)
            mn = pc.min(group["min"]).as_py()
            mx = pc.max(group["max"]).as_py()

            pixel_count: dict = {}
            if self.run_count and vals is not None:
                keys, counts = np.unique(vals, return_counts=True)
                pixel_count = dict(
                    zip([k.item() for k in keys], [c.item() for c in counts])
                )

            if "min" in stats:
                out["min"] = float(mn)
            if "max" in stats:
                out["max"] = float(mx)
            if "mean" in stats:
                out["mean"] = (sum_i / count) if is_int else (sum_f / count)
            if "count" in stats:
                out["count"] = count
            if "sum" in stats:
                out["sum"] = float(sum_i) if is_int else sum_f
            if "std" in stats:
                mean = (sum_i / count) if is_int else (sum_f / count)
                var = max(sumsq / count - mean * mean, 0.0)
                out["std"] = float(np.sqrt(var))
            if "median" in stats:
                out["median"] = float(np.median(vals))
            if "majority" in stats:
                out["majority"] = float(key_assoc_val(pixel_count, max))
            if "minority" in stats:
                out["minority"] = float(key_assoc_val(pixel_count, min))
            if "unique" in stats:
                out["unique"] = len(pixel_count)
            if "range" in stats:
                out["range"] = float(mx) - float(mn)
            for pct in [s for s in stats if s.startswith("percentile_")]:
                out[pct] = float(np.percentile(vals, get_percentile(pct)))

            cat_values, cat_counts = [], []
            if self.categorical:
                ks = sorted(pixel_count)
                cat_values = [float(k) for k in ks]
                cat_counts = [int(pixel_count[k]) for k in ks]

        if "nodata" in stats:
            out["nodata"] = float(pc.sum(group["nodata"]).as_py() or 0)
        if "nan" in stats:
            has_nan = bool(pc.any(group["has_nan"]).as_py())
            out["nan"] = float(pc.sum(group["nan_cnt"]).as_py() or 0) if has_nan else 0.0

        cols: dict = {"zone_id": pa.array([zid], pa.int64())}
        for name, typ in stat_fields(stats, self.categorical):
            if name == "cat_values":
                cols[name] = pa.array([cat_values], typ)
            elif name == "cat_counts":
                cols[name] = pa.array([cat_counts], typ)
            else:
                cols[name] = pa.array([out.get(name)], typ)
        return pa.table(cols)


def zonal_stats_tiled(
    zones_ds,
    tiles_ds,
    affine: Affine,
    nodata,
    raster_dtype: str = "float32",
    *,
    stats=None,
    all_touched: bool = False,
    categorical: bool = False,
    category_map=None,
    tile_size: int = DEFAULT_TILE_SIZE,
    geom_col: str = "geom_wkb",
):
    """Cell-key shuffle-join zonal stats: zones Dataset x tiles Dataset ->
    per-zone stats Dataset sorted by zone_id."""
    stats_list, run_count = check_stats(stats, categorical)
    need_vals = run_count or any(
        s.startswith("percentile_") or s == "median" for s in stats_list
    )

    zones_tagged = zones_ds.map_batches(
        assign_zones_to_cells,
        fn_kwargs=dict(affine=affine, tile_size=tile_size, geom_col=geom_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tiles_tagged = tiles_ds.map_batches(
        tag_tiles, batch_format="pyarrow", zero_copy_batch=True
    )

    unioned = zones_tagged.union(tiles_tagged)

    cell_kernel = CellKernel(
        affine=affine,
        nodata=nodata,
        tile_size=tile_size,
        raster_dtype=raster_dtype,
        all_touched=all_touched,
        need_vals=need_vals,
    )
    merge_kernel = MergeKernel(
        stats=stats,
        categorical=categorical,
        category_map=category_map,
        raster_dtype=raster_dtype,
    )

    def cell_partials(group: pa.Table) -> pa.Table:
        return cell_kernel(group)

    def merge_partials(group: pa.Table) -> pa.Table:
        return merge_kernel(group)

    partials = unioned.groupby("cell").map_groups(
        cell_partials, batch_format="pyarrow"
    )
    merged = partials.groupby("zone_id").map_groups(
        merge_partials, batch_format="pyarrow"
    )
    return merged.sort("zone_id")
