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

import inspect
import io

from ..functions.affine import Affine
from ..functions.faststats import finalize_stats, window_view, zone_accumulators
from ..functions.geometry import Geom, from_wkb
from ..functions.rasterize import rasterize_geom, rect_geom_state
from ..functions.stats import boxify_points, check_stats, get_percentile, key_assoc_val
from ..functions.windows import boundless_array, bounds_window, window_affine
from ..functions.zonal import compute_feature_stats
from ..sources.raster import Raster
from ..sources.tiles import DEFAULT_TILE_SIZE, cell_decode, window_cells

# ------------------------------------------------------------------ schema


def stat_fields(
    stats: list[str], categorical: bool, category_map=None
) -> list[tuple[str, pa.DataType]]:
    fields: list[tuple[str, pa.DataType]] = []
    for s in stats:
        if s in ("count", "unique"):
            fields.append((s, pa.int64()))
        else:
            fields.append((s, pa.float64()))
    if categorical:
        if category_map:
            # remapped category labels may be strings -> string key column
            fields.append(("cat_keys", pa.list_(pa.string())))
        else:
            fields.append(("cat_values", pa.list_(pa.float64())))
        fields.append(("cat_counts", pa.list_(pa.int64())))
    return fields


def np_to_bytes(a: np.ndarray) -> bytes:
    """npy-serialize an array (dtype+shape preserved, no pickle)."""
    b = io.BytesIO()
    np.save(b, a, allow_pickle=False)
    return b.getvalue()


def np_from_bytes(b: bytes) -> np.ndarray:
    return np.load(io.BytesIO(b), allow_pickle=False)


def unpack_mini_raster(row: dict):
    """mini_raster_* columns -> (np.ma.MaskedArray, affine 6-tuple, nodata)
    — the distributed equivalent of the oracle's raster_out payload
    (reference main.py:318-321)."""
    data = np_from_bytes(row["mini_raster_array"])
    mask = np_from_bytes(row["mini_raster_mask"])
    return (
        np.ma.MaskedArray(data, mask=mask),
        Affine(*row["mini_raster_affine"]),
        row["mini_raster_nodata"],
    )


# Fast-path zone windows above this pixel count process in row-band
# chunks (see BroadcastZonalKernel._chunked_accumulators): bounds every
# numpy temp to a few MB so glibc reuses heap pages instead of paying an
# mmap+page-zero per mega-zone, and caps per-task resident footprint.
_ZONE_CHUNK_PX = 1 << 21

_MINI_FIELDS = [
    ("mini_raster_array", pa.binary()),
    ("mini_raster_mask", pa.binary()),
    ("mini_raster_affine", pa.list_(pa.float64(), 6)),
    ("mini_raster_nodata", pa.float64()),
]


def _mini_raster_values(masked: np.ma.MaskedArray | None, affine6, nodata):
    if masked is None:
        return None, None, None, None
    return (
        np_to_bytes(np.ma.getdata(masked)),
        np_to_bytes(np.ma.getmaskarray(masked)),
        [float(v) for v in affine6],
        float(nodata),
    )


def _add_stats_arity(add_stats) -> dict[str, int]:
    return {
        name: len(inspect.signature(fn).parameters) for name, fn in (add_stats or {}).items()
    }


def _dispatch_add_stats(add_stats, arity, masked, properties, rv_array) -> dict:
    """Arity-1/2/3 add_stats dispatch (reference main.py:304-316)."""
    out = {}
    for name, fn in add_stats.items():
        n = arity[name]
        if n == 3:
            out[name] = fn(masked, properties, rv_array)
        elif n == 2:
            out[name] = fn(masked, properties)
        else:
            out[name] = fn(masked)
    return out


def _remapped_histogram(pixel_count: dict, category_map) -> tuple[list, list]:
    """Reference remap semantics (utils.py:106-114 / functions/stats.py
    remap_categories): unmapped raw values pass through; when two raw
    values map to one label, the later raw key (ascending value order,
    np.unique insertion order) OVERWRITES — counts are not summed."""
    remapped: dict = {}
    for k in sorted(pixel_count):
        remapped[category_map.get(k, k)] = pixel_count[k]
    return [str(k) for k in remapped], [int(v) for v in remapped.values()]


def _stats_dict_to_columns(
    rows: list[dict], stats: list[str], categorical: bool, category_map=None
) -> dict[str, list]:
    """rows carry stat values under string keys plus, when categorical, a
    '_pixel_count' dict of raw-pixel-value -> count."""
    cols: dict[str, list] = {
        name: [] for name, _ in stat_fields(stats, categorical, category_map)
    }
    for r in rows:
        for s in stats:
            cols[s].append(r.get(s))
        if categorical:
            pc_dict = r.get("_pixel_count") or {}
            if category_map:
                ks, cs = _remapped_histogram(pc_dict, category_map)
                cols["cat_keys"].append(ks)
                cols["cat_counts"].append(cs)
            else:
                ks = sorted(pc_dict)
                cols["cat_values"].append([float(k) for k in ks])
                cols["cat_counts"].append([int(pc_dict[k]) for k in ks])
    return cols


# ------------------------------------------------------------- broadcast


class BroadcastZonalKernel:
    """Actor-pool map_batches kernel: zones batch -> stats batch.

    The raster tuple (array, affine, nodata) is fetched from the object
    store once per actor in ``__init__`` (zero-copy for the pixel array).
    Alternatively ``raster_ref`` may be ``("npy", path, affine, nodata)``:
    the worker then memory-maps the array straight from storage — the
    multi-node shape where every node reads a shared raster from the
    filesystem/object storage instead of holding a plasma copy (also the
    faster path on hosts whose shared-memory tier is degraded; see
    BASELINE.md host addendum).
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
        raster_out: bool = False,
        geom_col: str = "geom_wkb",
        passthrough: bool = True,
    ):
        import ray

        if (
            isinstance(raster_ref, tuple)
            and raster_ref
            and isinstance(raster_ref[0], str)
            and raster_ref[0] == "npy"
        ):
            import numpy as _np

            _, path, affine, nodata = raster_ref
            arr = _np.load(path, mmap_mode="r")
            try:
                # async read-ahead hint: the kernel prefetches the file
                # in the background instead of this worker stalling on a
                # synchronous fault storm at first touch (cold-run cost,
                # VERDICT r2 #4); harmless no-op where unsupported
                import mmap as _mmap

                arr.base.madvise(_mmap.MADV_WILLNEED)
            except (AttributeError, ValueError, OSError):
                pass
        elif isinstance(raster_ref, tuple) and len(raster_ref) == 3:
            # direct (arr, affine, nodata) — local/test use, no object store
            arr, affine, nodata = raster_ref
        else:
            arr, affine, nodata = ray.get(raster_ref)
        self.rast = Raster(arr, affine=affine, nodata=nodata)
        self.stats, self.run_count = check_stats(stats, categorical)
        self.all_touched = all_touched
        self.categorical = categorical
        self.category_map = category_map
        self.zone_func = zone_func
        self.add_stats = add_stats
        self.add_arity = _add_stats_arity(add_stats)
        self.raster_out = raster_out
        self.geom_col = geom_col
        self.passthrough = passthrough

    def _zone_stats(self, wkb: bytes, properties: dict | None = None) -> dict:
        geom = from_wkb(wkb)
        if geom.is_point_type:
            geom = boxify_points(geom, self.rast.affine)
        win = bounds_window(geom.bounds, self.rast.affine)
        nodata = self.rast.nodata if self.rast.nodata is not None else -999
        aff = window_affine(win, self.rast.affine)
        (r0, r1), (c0, c1) = win
        shape = (r1 - r0, c1 - c0)

        if self.zone_func is None and self.add_stats is None and not self.raster_out:
            # fast path: plain-numpy accumulators on the extracted values
            # (zero-copy window view when fully in-extent). Mega-zone
            # windows process in bounded row-band chunks: every temp stays
            # a few MB (allocator-reused heap pages instead of a fresh
            # >32 MB mmap+zero per zone — the memory-bandwidth bill that
            # made whole-window megas the broadcast path's straggler),
            # and the chunk partials combine exactly (they're the same
            # mergeable accumulators the tiled plan ships between nodes).
            npx = shape[0] * shape[1]
            if npx > _ZONE_CHUNK_PX and shape[0] > 1:
                acc = self._chunked_accumulators(geom, win, nodata)
            else:
                rv_array = rasterize_geom(
                    geom, shape=shape, affine=aff, all_touched=self.all_touched
                )
                block = window_view(self.rast.array, win, nodata)
                acc = zone_accumulators(block, rv_array, nodata)
            out, pixel_count = finalize_stats(
                self.stats,
                self.run_count or self.categorical,
                count=acc["count"],
                sum_f=acc["sum_f"],
                sum_i=acc["sum_i"],
                sumsq=acc["sumsq"],
                vmin=acc["min"],
                vmax=acc["max"],
                nodata_count=acc["nodata"],
                nan_count=acc["nan_cnt"],
                has_nan=acc["has_nan"],
                is_int=acc["is_int"],
                vals=acc["vals"],
            )
            if self.categorical and pixel_count:
                out["_pixel_count"] = pixel_count
            return out

        # oracle path (zone_func / add_stats need the assembled MaskedArray)
        rv_array = rasterize_geom(
            geom, shape=shape, affine=aff, all_touched=self.all_touched
        )
        fsrc = self.rast.read(bounds=geom.bounds, boundless=True)
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
            out.update(
                _dispatch_add_stats(
                    self.add_stats, self.add_arity, masked, properties or {}, rv_array
                )
            )
        if self.raster_out:
            out["_mini"] = _mini_raster_values(masked, tuple(fsrc.affine), fsrc.nodata)
        return out

    def _chunked_accumulators(self, geom, win, nodata) -> dict:
        """Row-band-chunked equivalent of ``zone_accumulators`` over one
        zone window: rasterize + accumulate per ≤``_ZONE_CHUNK_PX`` band,
        combine the partials. Exact for every stat — value arrays are
        collected only when a vals-needing stat (median / percentile /
        majority / minority / unique / categorical) asks for them."""
        (r0, r1), (c0, c1) = win
        width = c1 - c0
        band = max(1, _ZONE_CHUNK_PX // max(width, 1))
        need_vals = (
            self.run_count
            or self.categorical
            or "median" in self.stats
            or any(s.startswith("percentile_") for s in self.stats)
        )
        tot = dict(
            count=0, sum_f=0.0, sum_i=0, sumsq=0.0, min=None, max=None,
            nodata=0, nan_cnt=0, has_nan=False, is_int=True, vals=None,
        )
        vals_parts: list[np.ndarray] = []
        for a in range(r0, r1, band):
            b = min(a + band, r1)
            sub = ((a, b), (c0, c1))
            rv = rasterize_geom(
                geom,
                shape=(b - a, width),
                affine=window_affine(sub, self.rast.affine),
                all_touched=self.all_touched,
            )
            part = zone_accumulators(
                window_view(self.rast.array, sub, nodata), rv, nodata
            )
            tot["count"] += part["count"]
            tot["sum_f"] += part["sum_f"]
            tot["sum_i"] += part["sum_i"]
            tot["sumsq"] += part["sumsq"]
            tot["nodata"] += part["nodata"]
            tot["nan_cnt"] += part["nan_cnt"]
            tot["has_nan"] = tot["has_nan"] or part["has_nan"]
            tot["is_int"] = part["is_int"]
            if part["min"] is not None:
                tot["min"] = part["min"] if tot["min"] is None else min(tot["min"], part["min"])
                tot["max"] = part["max"] if tot["max"] is None else max(tot["max"], part["max"])
            if need_vals and part["count"]:
                vals_parts.append(part["vals"])
        if need_vals:
            tot["vals"] = (
                np.concatenate(vals_parts) if vals_parts
                else np.zeros(0, dtype=self.rast.array.dtype)
            )
        return tot

    def __call__(self, batch: pa.Table) -> pa.Table:
        wkbs = batch[self.geom_col].to_pylist()
        props_rows: list[dict | None] = [None] * len(wkbs)
        if self.add_stats and max(self.add_arity.values(), default=1) >= 2:
            # feature 'properties' for arity-2/3 add_stats = the passthrough
            # input columns of the row (reference main.py:306-316)
            prop_cols = [c for c in batch.column_names if c != self.geom_col]
            pdata = {c: batch[c].to_pylist() for c in prop_cols}
            props_rows = [
                {c: pdata[c][i] for c in prop_cols} for i in range(len(wkbs))
            ]
        rows = [self._zone_stats(w, p) for w, p in zip(wkbs, props_rows)]
        cols = _stats_dict_to_columns(rows, self.stats, self.categorical, self.category_map)
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
        if self.raster_out:
            minis = [r["_mini"] for r in rows]
            for i, (mname, mtyp) in enumerate(_MINI_FIELDS):
                out[mname] = pa.array([m[i] for m in minis], mtyp)
        return pa.table(out)


# Per-worker-process kernel cache for the task-pool broadcast mode: the
# raster ObjectRef resolves zero-copy ONCE per worker (same broadcast
# semantics as the actor pool), keyed by a per-pipeline token. Bounded so
# back-to-back pipelines don't pin stale plasma objects.
#
# The per-task callable MUST be a functools.partial of this module-level
# function: cloudpickle then serializes it by module+name, so every task
# that lands on a worker shares the worker's imported-module globals
# (a nested closure would capture a private COPY of the cache per task
# and rebuild the kernel for every batch — verified empirically).
_TASK_KERNEL_CACHE: dict = {}
_TASK_KERNEL_CACHE_MAX = 2


def _task_kernel_call(batch, *, token: str, ctor: dict):
    kernel = _TASK_KERNEL_CACHE.get(token)
    if kernel is None:
        while len(_TASK_KERNEL_CACHE) >= _TASK_KERNEL_CACHE_MAX:
            _TASK_KERNEL_CACHE.pop(next(iter(_TASK_KERNEL_CACHE)))
        kernel = _TASK_KERNEL_CACHE[token] = BroadcastZonalKernel(**ctor)
    return kernel(batch)


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
    raster_out: bool = False,
    geom_col: str = "geom_wkb",
    concurrency=None,
    batch_size: int = 64,
    compute: str = "actors",
    cache_token: str | None = None,
    raster_npy: str | None = None,
):
    """zones Dataset x in-memory raster -> stats Dataset (no shuffle).

    ``compute="actors"`` (default) runs the kernel as an autoscaling
    actor pool (state built in ``__init__``). ``compute="tasks"`` runs
    the same kernel as a task-pool map with a per-worker-process cached
    raster fetch: identical semantics and still broadcast-once, but the
    scheduler starves slow workers naturally instead of pinning batches
    to a fixed actor — measurably more robust on clusters with
    heterogeneous/degraded workers (BASELINE.md host addendum: 124 s vs
    213 s on the same degraded box).

    ``raster_npy`` (tasks mode) skips the object store entirely: workers
    memory-map the array from that path (storage-resident raster — the
    multi-node shape where nodes read shared storage; ``raster`` then
    only supplies affine/nodata). ``cache_token`` (tasks mode) pins the
    per-worker kernel cache key so SEPARATE pipeline runs (e.g. an
    untimed warm pass, then a measured pass) reuse each worker's
    already-constructed kernel and mapped pages.
    """
    import functools
    import uuid

    import ray

    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()
    if compute not in ("actors", "tasks"):
        raise ValueError(f"compute must be 'actors' or 'tasks', got {compute!r}")
    if isinstance(raster, tuple):
        arr, affine, nodata = raster
    else:
        arr = raster
    if raster_npy is not None:
        if compute != "tasks":
            raise ValueError("raster_npy requires compute='tasks'")
        raster_ref = ("npy", raster_npy, affine, nodata)
    else:
        raster_ref = ray.put((arr, affine, nodata))
    ctor = dict(
        raster_ref=raster_ref,
        stats=stats,
        all_touched=all_touched,
        categorical=categorical,
        category_map=category_map,
        zone_func=zone_func,
        add_stats=add_stats,
        raster_out=raster_out,
        geom_col=geom_col,
    )
    if compute == "tasks":
        max_tasks = concurrency[1] if isinstance(concurrency, tuple) else concurrency
        token = cache_token if cache_token is not None else uuid.uuid4().hex
        return zones_ds.map_batches(
            functools.partial(_task_kernel_call, token=token, ctor=ctor),
            batch_size=batch_size,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=max_tasks,
        )
    return zones_ds.map_batches(
        BroadcastZonalKernel,
        fn_constructor_kwargs=ctor,
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
    cell_arr = np.array([c if c is not None else 0 for c in out_cell], dtype=np.int64)
    mixed = _mix64(cell_arr)
    # bijective splitmix64 mix of the cell id: Ray's groupby range-
    # partitions on sorted keys, and raw cell ids cluster mega-zone
    # hotspots spatially -> skewed reducers. The mixed key spreads hot
    # neighborhoods uniformly while preserving group identity. Null cells
    # (degenerate windows) keep a null key so they can't collide.
    cell_h = pa.array(
        [int(m) if c is not None else None for m, c in zip(mixed, out_cell)],
        pa.int64(),
    )
    return pa.table(
        {
            "cell": pa.array(out_cell, pa.int64()),
            "cell_h": cell_h,
            "zone_id": pa.array(out_zone, pa.int64()),
            "geom_wkb": pa.array(out_wkb, pa.binary()),
        }
    )


def _mix64(x: np.ndarray) -> np.ndarray:
    """Bijective splitmix64 finalizer (uint64 wraparound intended)."""
    x = x.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return x.astype(np.int64)


class CellKernel:
    """Per-cell group kernel: N zone rows -> per-(zone, cell) partial
    accumulator rows. The cell's raster tile is fetched zero-copy from the
    object store through the broadcast refmap (build_tile_refmap); cells
    with no tile (beyond the raster extent) are boundless nodata fill."""

    def __init__(
        self,
        refmap_ref,
        affine: Affine,
        nodata,
        tile_size: int,
        raster_dtype: str,
        all_touched: bool = False,
        need_vals: bool = False,
        carry_px: bool = False,
    ):
        self.refmap_ref = refmap_ref
        self.affine = affine
        self.nodata = -999.0 if nodata is None else nodata
        self.tile_size = tile_size
        self.raster_dtype = np.dtype(raster_dtype)
        self.all_touched = all_touched
        self.need_vals = need_vals
        # carry the sub-window pixel block + geometry mask in each partial
        # so the merge stage can assemble the zone's mini-raster
        # (distributed raster_out / add_stats, reference main.py:304-321)
        self.carry_px = carry_px
        self._reader = None

    def _lookup_tile(self, cell: int):
        """cell id -> (array view, row_off, col_off) | None via the
        O(#superblocks) range refmap + searchsorted (no per-cell index)."""
        if self._reader is None:
            # one resident superblock: a zonal cell group touches one cell
            self._reader = TileRefmapReader(self.refmap_ref, max_resident=1)
        return self._reader.lookup(cell)

    def __call__(self, group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _empty_partials()
        cell_val = group["cell"][0].as_py()

        tile_arr = None
        t_roff = t_coff = 0
        if cell_val is None:
            rect = None  # degenerate windows: emit zero partials
        else:
            found = self._lookup_tile(int(cell_val))
            if found is not None:
                tile_arr, t_roff, t_coff = found
            tr, tc = cell_decode(cell_val)
            rect = (
                (tr * self.tile_size, (tr + 1) * self.tile_size),
                (tc * self.tile_size, (tc + 1) * self.tile_size),
            )

        rows = []
        zids = group["zone_id"].to_numpy(zero_copy_only=False)
        wkbs = group["geom_wkb"].to_pylist()
        for i in range(len(group)):
            zid = int(zids[i])
            geom = from_wkb(wkbs[i])
            rows.append(self._partial(zid, geom, rect, tile_arr, t_roff, t_coff))
        return _partials_table(rows)

    def _partial(self, zid, geom: Geom, rect, tile_arr, t_roff, t_coff) -> dict:
        win = bounds_window(geom.bounds, self.affine)
        (wr0, wr1), (wc0, wc1) = win
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
            has_nan=0,
            is_int=0,
            vals=b"",
            wr0=wr0,
            wr1=wr1,
            wc0=wc0,
            wc1=wc1,
            r0=0,
            r1=0,
            c0=0,
            c1=0,
            px=b"",
            rv=b"",
        )
        if rect is None:
            return p
        (rr0, rr1), (rc0, rc1) = rect
        r0, r1 = max(wr0, rr0), min(wr1, rr1)
        c0, c1 = max(wc0, rc0), min(wc1, rc1)
        if r1 <= r0 or c1 <= c0:
            return p
        sub = ((r0, r1), (c0, c1))
        # interior-tile fast path: uniform cover needs no rasterization
        state = rect_geom_state(geom, sub, self.affine)
        if state == "empty":
            return p

        if tile_arr is not None:
            rel = ((r0 - t_roff, r1 - t_roff), (c0 - t_coff, c1 - t_coff))
            block = window_view(tile_arr, rel, self.nodata)
        else:
            block = np.full((r1 - r0, c1 - c0), self.nodata, dtype=self.raster_dtype)

        if state == "full":
            rv = None
        else:
            aff = window_affine(sub, self.affine)
            rv = rasterize_geom(geom, block.shape, aff, self.all_touched)

        acc = zone_accumulators(block, rv, self.nodata)
        p.update(
            count=acc["count"],
            sum_f=acc["sum_f"],
            sum_i=acc["sum_i"],
            sumsq=acc["sumsq"],
            min=acc["min"],
            max=acc["max"],
            nodata=acc["nodata"],
            nan_cnt=acc["nan_cnt"],
            has_nan=int(acc["has_nan"]),
            is_int=int(acc["is_int"]),
        )
        if self.need_vals and acc["count"]:
            p["vals"] = acc["vals"].tobytes()
        if self.carry_px:
            rv_full = np.ones(block.shape, dtype=bool) if rv is None else rv
            p.update(
                r0=r0, r1=r1, c0=c0, c1=c1,
                px=np.ascontiguousarray(block).tobytes(),
                rv=np.packbits(rv_full).tobytes(),
            )
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
        ("has_nan", pa.int8()),
        ("is_int", pa.int8()),
        ("vals", pa.binary()),
        ("wr0", pa.int64()),
        ("wr1", pa.int64()),
        ("wc0", pa.int64()),
        ("wc1", pa.int64()),
        ("r0", pa.int64()),
        ("r1", pa.int64()),
        ("c0", pa.int64()),
        ("c1", pa.int64()),
        ("px", pa.binary()),
        ("rv", pa.binary()),
    ]
)


def _partials_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=_PARTIAL_SCHEMA)


def _empty_partials() -> pa.Table:
    return _PARTIAL_SCHEMA.empty_table()


class MergeKernel:
    """Per-zone group: partial accumulators -> final stat row.

    With ``raster_out``/``add_stats`` the partials carry their sub-window
    pixel blocks + geometry masks; the kernel assembles the zone's full
    boundless window (mini-raster) and runs the arity-dispatched UDFs on
    it — the distributed equivalent of reference main.py:304-321."""

    def __init__(
        self,
        stats,
        categorical,
        category_map,
        raster_dtype: str,
        *,
        raster_out: bool = False,
        add_stats=None,
        zone_func=None,
        affine: Affine | None = None,
        nodata=None,
        props_ref=None,
    ):
        self.stats, self.run_count = check_stats(stats, categorical)
        self.categorical = categorical
        self.category_map = category_map
        self.raster_dtype = np.dtype(raster_dtype)
        self.raster_out = raster_out
        self.add_stats = add_stats
        self.add_arity = _add_stats_arity(add_stats)
        self.zone_func = zone_func
        self.affine = affine
        self.nodata = -999.0 if nodata is None else nodata
        self.props_ref = props_ref
        self._props = None

    def _properties(self, zid: int) -> dict:
        if self.props_ref is None:
            return {}
        if self._props is None:
            import ray

            self._props = ray.get(self.props_ref)
        return self._props.get(zid, {})

    def _assemble(self, group: pa.Table):
        """Paste sub-window blocks into the zone's full boundless window;
        returns (masked MaskedArray | None, rv mask, window affine)."""
        wr0 = group["wr0"][0].as_py()
        wr1 = group["wr1"][0].as_py()
        wc0 = group["wc0"][0].as_py()
        wc1 = group["wc1"][0].as_py()
        h, w = wr1 - wr0, wc1 - wc0
        if h <= 0 or w <= 0:
            return None, None, None
        data = np.full((h, w), self.nodata, dtype=self.raster_dtype)
        rvm = np.zeros((h, w), dtype=bool)
        for i in range(len(group)):
            px = group["px"][i].as_py()
            if not px:
                continue
            r0 = group["r0"][i].as_py() - wr0
            r1 = group["r1"][i].as_py() - wr0
            c0 = group["c0"][i].as_py() - wc0
            c1 = group["c1"][i].as_py() - wc0
            sh, sw = r1 - r0, c1 - c0
            data[r0:r1, c0:c1] = np.frombuffer(px, dtype=self.raster_dtype).reshape(sh, sw)
            bits = np.unpackbits(
                np.frombuffer(group["rv"][i].as_py(), dtype=np.uint8), count=sh * sw
            )
            rvm[r0:r1, c0:c1] = bits.reshape(sh, sw).astype(bool)
        isnod = data == self.nodata
        if np.issubdtype(data.dtype, np.floating) and np.isnan(data.min()):
            isnod = isnod | np.isnan(data)
        masked = np.ma.MaskedArray(data, mask=(isnod | ~rvm))
        aff = window_affine(((wr0, wr1), (wc0, wc1)), self.affine) if self.affine else None
        return masked, rvm, aff

    def _call_zone_func(self, group: pa.Table, zid: int) -> pa.Table:
        """zone_func path: stats must be computed from the TRANSFORMED
        masked array (reference main.py:217-228), so the assembled
        mini-raster replaces the partial accumulators entirely. nodata/nan
        stay on the original values (geometry-only mask, main.py:189-196)
        and merge from the partials as usual."""
        from ..functions.zonal import compute_feature_stats

        stats = self.stats
        masked, rvm, aff = self._assemble(group)
        cat_values, cat_counts = [], []
        if masked is None:
            out = {s: None for s in stats}
            if "count" in stats:
                out["count"] = 0
        else:
            # reference applies zone_func unconditionally (main.py:217-228),
            # including to fully-masked windows
            value = self.zone_func(masked)
            if value is not None:
                masked = value
            out = compute_feature_stats(masked, stats, self.run_count, False, None)
            if self.categorical and masked.compressed().size:
                keys, counts = np.unique(masked.compressed(), return_counts=True)
                pcnt = dict(zip([k.item() for k in keys], [c.item() for c in counts]))
                if self.category_map:
                    cat_values, cat_counts = _remapped_histogram(pcnt, self.category_map)
                else:
                    ks = sorted(pcnt)
                    cat_values = [float(k) for k in ks]
                    cat_counts = [int(pcnt[k]) for k in ks]
        if "nodata" in stats:
            out["nodata"] = float(pc.sum(group["nodata"]).as_py() or 0)
        if "nan" in stats:
            has_nan = (pc.max(group["has_nan"]).as_py() or 0) > 0
            out["nan"] = float(pc.sum(group["nan_cnt"]).as_py() or 0) if has_nan else 0.0

        cols: dict = {"zone_id": pa.array([zid], pa.int64())}
        for name, typ in stat_fields(stats, self.categorical, self.category_map):
            if name in ("cat_values", "cat_keys"):
                cols[name] = pa.array([cat_values], typ)
            elif name == "cat_counts":
                cols[name] = pa.array([cat_counts], typ)
            else:
                cols[name] = pa.array([out.get(name)], typ)
        if self.add_stats:
            extra = (
                _dispatch_add_stats(
                    self.add_stats, self.add_arity, masked, self._properties(zid), rvm
                )
                if masked is not None
                else {name: None for name in self.add_stats}
            )
            for name, v in extra.items():
                cols[name] = pa.array([v])
        if self.raster_out:
            mini = _mini_raster_values(
                masked, tuple(aff) if aff else (0.0,) * 6, self.nodata
            )
            for i, (mname, mtyp) in enumerate(_MINI_FIELDS):
                cols[mname] = pa.array([mini[i]], mtyp)
        return pa.table(cols)

    def __call__(self, group: pa.Table) -> pa.Table:
        zid = group["zone_id"][0].as_py()
        if self.zone_func is not None:
            return self._call_zone_func(group, zid)
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
                if self.category_map:
                    cat_values, cat_counts = _remapped_histogram(
                        pixel_count, self.category_map
                    )
                else:
                    ks = sorted(pixel_count)
                    cat_values = [float(k) for k in ks]
                    cat_counts = [int(pixel_count[k]) for k in ks]

        if "nodata" in stats:
            out["nodata"] = float(pc.sum(group["nodata"]).as_py() or 0)
        if "nan" in stats:
            has_nan = (pc.max(group["has_nan"]).as_py() or 0) > 0
            out["nan"] = float(pc.sum(group["nan_cnt"]).as_py() or 0) if has_nan else 0.0

        cols: dict = {"zone_id": pa.array([zid], pa.int64())}
        for name, typ in stat_fields(stats, self.categorical, self.category_map):
            if name in ("cat_values", "cat_keys"):
                cols[name] = pa.array([cat_values], typ)
            elif name == "cat_counts":
                cols[name] = pa.array([cat_counts], typ)
            else:
                cols[name] = pa.array([out.get(name)], typ)

        if self.raster_out or self.add_stats:
            masked, rvm, aff = self._assemble(group)
            if self.add_stats:
                extra = (
                    _dispatch_add_stats(
                        self.add_stats, self.add_arity, masked, self._properties(zid), rvm
                    )
                    if masked is not None
                    else {name: None for name in self.add_stats}
                )
                for name, v in extra.items():
                    cols[name] = pa.array([v])
            if self.raster_out:
                mini = _mini_raster_values(
                    masked, tuple(aff) if aff else (0.0,) * 6, self.nodata
                )
                for i, (mname, mtyp) in enumerate(_MINI_FIELDS):
                    cols[mname] = pa.array([mini[i]], mtyp)
        return pa.table(cols)


class BucketMergeKernel:
    """Batched holistic merge: one map_groups call per zone-id BUCKET
    (2^shift zones), not per zone. The algebraic accumulators merge with
    vectorized segment reductions (add/fmin/fmax.reduceat over the
    zone-sorted rows); per-zone Python work remains only where the exact
    value multiset demands it (median / percentiles / majority / minority
    / unique / categorical). Replaces the per-zone map_groups that
    produced one 1-row table per zone (round-1 finding #10)."""

    def __init__(self, stats, categorical, category_map, raster_dtype: str):
        self.stats, self.run_count = check_stats(stats, categorical)
        self.categorical = categorical
        self.category_map = category_map
        self.raster_dtype = np.dtype(raster_dtype)

    def __call__(self, group: pa.Table) -> pa.Table:
        stats = self.stats
        zids = group["zone_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(zids, kind="stable")
        zs = zids[order]
        uniq, starts = np.unique(zs, return_index=True)
        n = len(uniq)

        def numf(col):
            return group[col].to_numpy(zero_copy_only=False).astype(np.float64)[order]

        count = np.add.reduceat(
            group["count"].to_numpy(zero_copy_only=False).astype(np.int64)[order], starts
        )
        sum_f = np.add.reduceat(numf("sum_f"), starts)
        sum_i = np.add.reduceat(numf("sum_i"), starts)
        sumsq = np.add.reduceat(numf("sumsq"), starts)
        mn = np.fmin.reduceat(numf("min"), starts)  # NaN-safe: empty partials are null
        mx = np.fmax.reduceat(numf("max"), starts)
        nodata_c = np.add.reduceat(numf("nodata"), starts)
        nan_c = np.add.reduceat(numf("nan_cnt"), starts)
        has_nan = np.maximum.reduceat(numf("has_nan"), starts) > 0
        is_int = np.maximum.reduceat(numf("is_int"), starts) > 0
        empty = count == 0
        safe = np.maximum(count, 1).astype(np.float64)
        mean = np.where(is_int, sum_i / safe, sum_f / safe)
        var = np.maximum(sumsq / safe - mean * mean, 0.0)

        need_vals = self.run_count or any(
            s.startswith("percentile_") or s == "median" for s in stats
        )
        pct_stats = [s for s in stats if s.startswith("percentile_")]
        med = np.full(n, np.nan)
        pcts = {s: np.full(n, np.nan) for s in pct_stats}
        majority = np.full(n, np.nan)
        minority = np.full(n, np.nan)
        unique_n = np.zeros(n, dtype=np.int64)
        cat_v: list[list] = [[] for _ in range(n)]
        cat_c: list[list] = [[] for _ in range(n)]
        if need_vals:
            bufs = group["vals"].to_pylist()
            ends = np.concatenate([starts[1:], [len(zs)]])
            for zi in range(n):
                if empty[zi]:
                    continue
                chunk = b"".join(
                    bufs[order[j]] for j in range(starts[zi], ends[zi]) if bufs[order[j]]
                )
                vals = np.frombuffer(chunk, dtype=self.raster_dtype)
                if "median" in stats:
                    med[zi] = float(np.median(vals))
                for s in pct_stats:
                    pcts[s][zi] = float(np.percentile(vals, get_percentile(s)))
                if self.run_count:
                    keys, counts = np.unique(vals, return_counts=True)
                    pixel_count = dict(
                        zip([k.item() for k in keys], [c.item() for c in counts])
                    )
                    if "majority" in stats:
                        majority[zi] = float(key_assoc_val(pixel_count, max))
                    if "minority" in stats:
                        minority[zi] = float(key_assoc_val(pixel_count, min))
                    unique_n[zi] = len(pixel_count)
                    if self.categorical:
                        if self.category_map:
                            cat_v[zi], cat_c[zi] = _remapped_histogram(
                                pixel_count, self.category_map
                            )
                        else:
                            ks = sorted(pixel_count)
                            cat_v[zi] = [float(k) for k in ks]
                            cat_c[zi] = [int(pixel_count[k]) for k in ks]

        def fcol(vals):
            return pa.array(np.where(empty, np.nan, vals), pa.float64(), from_pandas=True)

        cols: dict = {"zone_id": pa.array(uniq, pa.int64())}
        for s, typ in stat_fields(stats, self.categorical, self.category_map):
            if s == "count":
                cols[s] = pa.array(count, pa.int64())
            elif s == "min":
                cols[s] = fcol(mn)
            elif s == "max":
                cols[s] = fcol(mx)
            elif s == "mean":
                cols[s] = fcol(mean)
            elif s == "sum":
                cols[s] = fcol(np.where(is_int, sum_i, sum_f))
            elif s == "std":
                cols[s] = fcol(np.sqrt(var))
            elif s == "range":
                cols[s] = fcol(mx - mn)
            elif s == "median":
                cols[s] = fcol(med)
            elif s in pcts:
                cols[s] = fcol(pcts[s])
            elif s == "majority":
                cols[s] = fcol(majority)
            elif s == "minority":
                cols[s] = fcol(minority)
            elif s == "unique":
                cols[s] = pa.array(
                    np.where(empty, None, unique_n), pa.int64(), from_pandas=True
                )
            elif s == "nodata":
                cols[s] = pa.array(nodata_c, pa.float64())
            elif s == "nan":
                cols[s] = pa.array(np.where(has_nan, nan_c, 0.0), pa.float64())
            elif s in ("cat_values", "cat_keys"):
                cols[s] = pa.array(cat_v, typ)
            elif s == "cat_counts":
                cols[s] = pa.array(cat_c, typ)
            else:  # pragma: no cover
                raise ValueError(s)
        return pa.table(cols)


def _decode_tile_row(block: pa.Table, row: int):
    """Tile table row -> (numpy array view, row_off, col_off). The pixel
    buffer is viewed zero-copy out of the Arrow binary column."""
    th = block["height"][row].as_py()
    tw = block["width"][row].as_py()
    dt = np.dtype(block["dtype"][row].as_py())
    buf = block["pixels"][row].as_buffer()
    arr = np.frombuffer(buf, dtype=dt).reshape(th, tw)
    return arr, block["row_off"][row].as_py(), block["col_off"][row].as_py()


class TileRefmapReader:
    """Worker-side consumer of a :func:`build_tile_refmap` handle: cell id
    -> (zero-copy numpy tile view, row_off, col_off) | None via the
    O(#superblocks) range map + searchsorted, keeping at most
    ``max_resident`` superblocks resident (zonal cell groups touch one
    superblock; a bilinear point window can straddle two)."""

    def __init__(self, refmap_ref, max_resident: int = 1):
        self.refmap_ref = refmap_ref
        self.max_resident = max_resident
        self._refmap = None
        self._sb_cache: dict[int, tuple[pa.Table, np.ndarray]] = {}

    def lookup(self, cell: int):
        import ray

        if self._refmap is None:
            self._refmap = ray.get(self.refmap_ref)
        lo, hi, sb_refs = self._refmap
        sbi = int(np.searchsorted(lo, cell, side="right")) - 1
        if sbi < 0 or cell > hi[sbi]:
            return None
        ent = self._sb_cache.get(sbi)
        if ent is None:
            tbl = ray.get(sb_refs[sbi])
            ent = (tbl, tbl["cell"].to_numpy(zero_copy_only=False))
            if len(self._sb_cache) >= self.max_resident:
                # evict the oldest-inserted resident superblock
                self._sb_cache.pop(next(iter(self._sb_cache)))
            self._sb_cache[sbi] = ent
        tbl, cells = ent
        row = int(np.searchsorted(cells, cell))
        if row >= len(cells) or cells[row] != cell:
            return None
        return _decode_tile_row(tbl, row)


def build_tile_refmap(tiles_ds, superblock_tiles: int = 64):
    """Pin the tile Dataset in the object store as a handful of coalesced
    "superblocks" and return (refmap_ref, superblock_refs). The refmap is
    O(#superblocks): just the per-superblock [min_cell, max_cell] ranges —
    tiles are generated in ascending cell order, so a consumer finds its
    superblock by binary search on the ranges and its row by searchsorted
    on the superblock's (sorted) cell column. No per-cell index object
    exists anywhere (a driver-side cell dict would be multi-GB at ~10^8
    tiles; the ranges stay a few KB at any raster size).

    Why superblocks: a refmap holding one ObjectRef per tile block makes
    every downstream reduce task register hundreds of refs with the owner
    (per-task RPCs that grow with parallelism — measured anti-scaling).
    Coalescing to a few big objects means each task registers O(1) refs
    and reads them zero-copy from local plasma. Payload never touches the
    driver: concat runs in remote tasks, which return only (min, max).
    At multi-node scale, superblocks bound each node's fetch granularity;
    tasks touch only the superblocks their cells live in."""
    import ray

    @ray.remote(num_cpus=0, num_returns=2)
    def _coalesce(*blocks):
        tbl = pa.concat_tables([b for b in blocks if len(b)])
        cells = tbl["cell"].to_numpy(zero_copy_only=False)
        lo = int(cells[0]) if len(cells) else 0
        hi = int(cells[-1]) if len(cells) else -1
        return tbl, (lo, hi)

    block_refs = tiles_ds.to_arrow_refs()
    futures = []
    for i in range(0, len(block_refs), superblock_tiles):
        futures.append(_coalesce.remote(*block_refs[i : i + superblock_tiles]))

    sb_refs = [tbl_ref for tbl_ref, _ in futures]
    ranges = ray.get([rng_ref for _, rng_ref in futures])
    lo = np.array([r[0] for r in ranges], dtype=np.int64)
    hi = np.array([r[1] for r in ranges], dtype=np.int64)
    return ray.put((lo, hi, sb_refs)), sb_refs


def attach_zone_columns(stats_ds, zones_ds, columns: list[str], zone_col: str = "zone_id"):
    """Re-attach zone attribute columns (the geojson_out equivalent for
    distributed outputs): broadcast a small zone_id -> attributes mapping
    and map it onto the stats rows — no shuffle join."""
    import ray

    zmap_tbl = (
        zones_ds.select_columns([zone_col] + columns)
        .to_pandas()
        .sort_values(zone_col)
        .reset_index(drop=True)
    )
    zkeys = zmap_tbl[zone_col].to_numpy().astype(np.int64)
    ztab = pa.Table.from_pandas(zmap_tbl[columns], preserve_index=False)
    ref = ray.put((zkeys, ztab))

    def attach(batch: pa.Table) -> pa.Table:
        import ray as _r

        zkeys, ztab = _r.get(ref)
        zids = batch[zone_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # sorted-key searchsorted gather (no per-row Python): missing
        # zone_ids take a masked index -> null columns
        if len(zkeys):
            pos = np.clip(np.searchsorted(zkeys, zids), 0, len(zkeys) - 1)
            hit = zkeys[pos] == zids
        else:
            pos = np.zeros(len(zids), dtype=np.int64)
            hit = np.zeros(len(zids), dtype=bool)
        idx = pa.array(pos, pa.int64(), mask=~hit)
        out = batch
        for cname in columns:
            out = out.append_column(cname, ztab[cname].take(idx))
        return out

    return stats_ds.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


def _json_col_fragments(name: str, col) -> np.ndarray:
    """Vectorized ``"name": value`` JSON fragments for one pyarrow column
    (json.dumps-compatible text: shortest-repr floats, null for NaN/None).
    Only string-ish / nested types fall back to per-value json.dumps —
    number columns (the zonal-stats hot case) stay pure numpy."""
    import json

    t = col.type
    key = json.dumps(name) + ": "
    if pa.types.is_floating(t):
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        # str(np.float64) == repr(float): shortest round-trip repr,
        # byte-identical to json.dumps output for finite values
        s = v.astype("U32")
        s[~np.isfinite(v)] = "null"
    elif pa.types.is_integer(t) and col.null_count == 0:
        s = col.to_numpy(zero_copy_only=False).astype("U24")
    elif pa.types.is_boolean(t) and col.null_count == 0:
        s = np.where(col.to_numpy(zero_copy_only=False), "true", "false")
    else:
        s = np.array([json.dumps(x) for x in col.to_pylist()], dtype=object).astype("U")
    return np.char.add(key, s.astype("U"))


def _props_fragments(tbl: pa.Table, cols) -> np.ndarray:
    """Join per-column fragments into one properties-body string per row
    (no braces) — ``"a": 1, "b": 2.5`` — all numpy char ops."""
    frags = None
    for c in cols:
        piece = _json_col_fragments(c, tbl[c])
        frags = piece if frags is None else np.char.add(np.char.add(frags, ", "), piece)
    if frags is None:
        return np.full(len(tbl), "", dtype="U1")
    return frags


def zonal_geojson_out(stats_ds, zones_ds, zone_col: str = "zone_id",
                      geom_col: str = "geom_wkb"):
    """The ``geojson_out=True`` equivalent for distributed outputs
    (reference main.py:330-335): re-attach geometry + input attributes from
    the (small) zone side via one broadcast map and emit a serialized
    GeoJSON Feature per stats row, stats merged into ``properties``.

    The zone side is pre-serialized ONCE on the driver (per-zone attrs
    fragment + geometry JSON, small side by contract) and gathered per
    batch with the same sorted-key searchsorted used by
    ``attach_zone_columns`` — no per-row dict build; stat columns
    serialize via vectorized numpy char ops (json.dumps-identical text).

    Output: one ``feature_json`` string column. The zones table is the
    small side by design; stats rows stream — no shuffle."""
    import json

    import ray

    ztbl = zones_ds.to_pandas().sort_values(zone_col).reset_index(drop=True)
    attr_cols = [c for c in ztbl.columns if c not in (zone_col, geom_col)]
    zkeys = ztbl[zone_col].to_numpy().astype(np.int64)
    zattrs = _props_fragments(
        pa.Table.from_pandas(ztbl[attr_cols], preserve_index=False)
        if attr_cols else pa.table({"_": pa.array([None] * len(ztbl))}),
        attr_cols,
    ).astype("U")
    has_attrs = bool(attr_cols)
    geom_json = np.array(
        [json.dumps(from_wkb(w).to_geojson()) for w in ztbl[geom_col]], dtype=object
    ).astype("U")
    ref = ray.put((zkeys, zattrs, geom_json))

    def emit(batch: pa.Table) -> pa.Table:
        zkeys, zattrs, geom_json = ray.get(ref)
        stat_cols = [c for c in batch.column_names if c != zone_col]
        zids = batch[zone_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(zkeys) == 0:
            if len(zids):
                raise KeyError(f"zone_id(s) absent from zone table: {zids[:5]}")
            pos = np.zeros(0, dtype=np.int64)
        else:
            pos = np.clip(np.searchsorted(zkeys, zids), 0, len(zkeys) - 1)
            if not bool((zkeys[pos] == zids).all()):
                missing = zids[zkeys[pos] != zids]
                raise KeyError(f"zone_id(s) absent from zone table: {missing[:5]}")
        za = zattrs[pos]
        if has_attrs and stat_cols:  # separator only when both sides present
            za = np.char.add(za, ", ")
        props = np.char.add(za, _props_fragments(batch, stat_cols).astype("U"))
        feats = np.char.add(
            np.char.add(
                np.char.add('{"type": "Feature", "properties": {', props),
                np.char.add('}, "geometry": ', geom_json[pos]),
            ),
            "}",
        )
        return pa.table(
            {
                zone_col: batch[zone_col],
                "feature_json": pa.array(feats.tolist(), pa.string()),
            }
        )

    return stats_ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)


def zonal_geojson_out_joined(stats_ds, zones_ds, zone_col: str = "zone_id",
                             geom_col: str = "geom_wkb",
                             zone_attr_cols=None):
    """Shuffle-join variant of :func:`zonal_geojson_out` for when the zone
    side is NOT broadcastable (the tiled-path scale regime: hundreds of
    millions of zones with attributes + geometry exceeding one worker's
    heap). Both sides hash-partition by ``zone_col`` across the native
    join's aggregator pool and each partition emits its features locally —
    no driver materialization, no ``ray.put`` of the zone table, identical
    ``feature_json`` output to the broadcast variant.

    ``zone_attr_cols``: attribute columns of the zone side to carry into
    ``properties`` (default: every zone column except zone_col/geom_col,
    discovered from the zone schema — metadata-only for parquet sources).
    """
    import json

    from .joins import hash_equi_join

    if zone_attr_cols is None:
        zone_attr_cols = [
            c for c in zones_ds.schema().names if c not in (zone_col, geom_col)
        ]
    attr_cols = list(zone_attr_cols)
    zside = zones_ds.select_columns([zone_col, geom_col] + attr_cols)
    joined = hash_equi_join(stats_ds, zside, on=[zone_col])

    def emit(batch: pa.Table) -> pa.Table:
        stat_cols = [
            c for c in batch.column_names
            if c not in (zone_col, geom_col) and c not in attr_cols
        ]
        data = {c: batch[c].to_pylist() for c in batch.column_names}
        feats = []
        for i in range(len(batch)):
            # attrs first, stats second — same property order as the
            # broadcast variant and the reference's geojson_out merge
            props = {c: data[c][i] for c in attr_cols}
            props.update({c: data[c][i] for c in stat_cols})
            feats.append(
                json.dumps(
                    {
                        "type": "Feature",
                        "properties": props,
                        "geometry": from_wkb(data[geom_col][i]).to_geojson(),
                    }
                )
            )
        return pa.table(
            {
                zone_col: batch[zone_col],
                "feature_json": pa.array(feats, pa.string()),
            }
        )

    return joined.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)


def zonal_stats_auto(
    zones_ds,
    raster,
    affine=None,
    nodata=None,
    *,
    stats=None,
    all_touched: bool = False,
    categorical: bool = False,
    category_map=None,
    add_stats=None,
    zone_func=None,
    window_px_budget: int = 4_000_000,
    tile_size: int = DEFAULT_TILE_SIZE,
    geom_col: str = "geom_wkb",
    concurrency=None,
):
    """Hybrid physical plan: zones whose snapped window exceeds
    ``window_px_budget`` pixels (mega-polygons — whole-window stragglers on
    the broadcast path) route through the split-by-tile cell join; everybody
    else takes the shuffle-free broadcast path. Results union, sorted by
    zone_id. This is the skew rule of the north star applied as a planner
    decision."""
    import ray
    import ray.data

    from ..sources.tiles import raster_to_tiles_table

    if concurrency is None:
        # both the broadcast and tiled sub-plans run in this one plan
        from ._cluster import pool

        concurrency = pool(divisor=2)
    if isinstance(raster, tuple):
        arr, affine, nodata = raster
    else:
        arr = raster

    def classify(batch: pa.Table) -> pa.Table:
        import numpy as _np

        px = _np.empty(len(batch), dtype=_np.int64)
        for i, wkb in enumerate(batch[geom_col].to_pylist()):
            g = from_wkb(wkb)
            if g.is_point_type:
                g = boxify_points(g, affine)
            (r0, r1), (c0, c1) = bounds_window(g.bounds, affine)
            px[i] = max(0, r1 - r0) * max(0, c1 - c0)
        return batch.append_column("_window_px", pa.array(px))

    classified = zones_ds.map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def keep_small(batch: pa.Table) -> pa.Table:
        mask = pc.less_equal(batch["_window_px"], window_px_budget)
        return batch.filter(mask).drop_columns(["_window_px"])

    def keep_big(batch: pa.Table) -> pa.Table:
        mask = pc.greater(batch["_window_px"], window_px_budget)
        return batch.filter(mask).drop_columns(["_window_px"])

    small = classified.map_batches(keep_small, batch_format="pyarrow", zero_copy_batch=True)
    big = classified.map_batches(keep_big, batch_format="pyarrow", zero_copy_batch=True).materialize()

    stats_list, _ = check_stats(stats, categorical)
    out_cols = ["zone_id"] + stats_list
    if categorical:
        out_cols += ["cat_keys", "cat_counts"] if category_map else ["cat_values", "cat_counts"]
    if add_stats:
        out_cols += list(add_stats)

    bc = zonal_stats_broadcast(
        small, (arr, affine, nodata), stats=stats, all_touched=all_touched,
        categorical=categorical, category_map=category_map,
        add_stats=add_stats, zone_func=zone_func,
        geom_col=geom_col, concurrency=concurrency,
    ).map_batches(
        lambda b: b.select([c for c in out_cols if c in b.column_names]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    if big.count() > 0:
        tiles = ray.data.from_arrow(raster_to_tiles_table(arr, affine, nodata, tile_size))
        td = zonal_stats_tiled(
            big, tiles, affine, nodata, raster_dtype=str(arr.dtype),
            stats=stats, all_touched=all_touched,
            categorical=categorical, category_map=category_map,
            add_stats=add_stats, zone_func=zone_func,
            tile_size=tile_size, geom_col=geom_col,
        ).map_batches(
            lambda b: b.select([c for c in out_cols if c in b.column_names]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        combined = bc.union(td).materialize()
    else:
        combined = bc.materialize()
    return combined.sort("zone_id")


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
    add_stats=None,
    zone_func=None,
    raster_out: bool = False,
    tile_size: int = DEFAULT_TILE_SIZE,
    geom_col: str = "geom_wkb",
    checkpoint_before_shuffle: bool = True,
):
    """Cell-key shuffle-join zonal stats: zones Dataset x tiles Dataset ->
    per-zone stats Dataset sorted by zone_id.

    ``checkpoint_before_shuffle`` materializes the tagged union into the
    object store before the groupby('cell') exchange. The sort-based
    shuffle samples its input and then executes it again; without the
    checkpoint the whole upstream (parquet read + tagging) runs twice.
    The all-to-all materializes the data anyway, so this adds no peak
    memory — it only removes the recompute.

    ``add_stats`` (any arity) and ``raster_out`` route the partials through
    a pixel-carrying merge: each (zone, tile) partial ships its sub-window
    block + geometry mask, and the merge stage assembles the zone's full
    mini-raster before running UDFs / emitting mini_raster_* columns.
    """
    import ray

    stats_list, run_count = check_stats(stats, categorical)
    carry_px = raster_out or add_stats is not None or zone_func is not None
    need_vals = run_count or any(
        s.startswith("percentile_") or s == "median" for s in stats_list
    )

    props_ref = None
    if add_stats and max(_add_stats_arity(add_stats).values(), default=1) >= 2:
        # arity-2/3 UDFs receive feature properties: broadcast the (small)
        # zone attribute columns once, keyed by zone_id
        attr_tbl = zones_ds.drop_columns([geom_col]).to_pandas()
        props_ref = ray.put(
            {
                int(r["zone_id"]): {k: v for k, v in r.items() if k != "zone_id"}
                for r in attr_tbl.to_dict("records")
            }
        )

    # Tiles: pinned in the object store, addressed by cell (no payload
    # shuffle). Zones: only (cell, zone_id, wkb) rows enter the exchange.
    refmap_ref, _block_refs = build_tile_refmap(tiles_ds)

    zones_tagged = zones_ds.map_batches(
        assign_zones_to_cells,
        fn_kwargs=dict(affine=affine, tile_size=tile_size, geom_col=geom_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if checkpoint_before_shuffle:
        zones_tagged = zones_tagged.materialize()

    cell_kernel = CellKernel(
        refmap_ref=refmap_ref,
        affine=affine,
        nodata=nodata,
        tile_size=tile_size,
        raster_dtype=raster_dtype,
        all_touched=all_touched,
        need_vals=need_vals,
        carry_px=carry_px,
    )
    merge_kernel = MergeKernel(
        stats=stats,
        categorical=categorical,
        category_map=category_map,
        raster_dtype=raster_dtype,
        raster_out=raster_out,
        add_stats=add_stats,
        zone_func=zone_func,
        affine=affine,
        nodata=nodata,
        props_ref=props_ref,
    )

    def cell_partials(group: pa.Table) -> pa.Table:
        return cell_kernel(group)

    def merge_partials(group: pa.Table) -> pa.Table:
        return merge_kernel(group)

    partials = zones_tagged.groupby("cell_h").map_groups(
        cell_partials, batch_format="pyarrow"
    )
    if checkpoint_before_shuffle:
        # next op is another all-to-all; pin the small accumulator rows
        partials = partials.materialize()

    return _finish_tiled_partials(
        partials,
        merge_partials=merge_partials,
        carry_px=carry_px,
        need_vals=need_vals,
        stats=stats,
        stats_list=stats_list,
        categorical=categorical,
        category_map=category_map,
        raster_dtype=raster_dtype,
        checkpoint_before_shuffle=checkpoint_before_shuffle,
    )


def _finish_tiled_partials(
    partials,
    *,
    merge_partials,
    carry_px: bool,
    need_vals: bool,
    stats,
    stats_list,
    categorical: bool,
    category_map,
    raster_dtype: str,
    checkpoint_before_shuffle: bool,
):
    """Shared tail of the tiled plans: per-(zone, cell) partial rows ->
    final per-zone stats Dataset sorted by zone_id. Used by both the
    shuffle plan (zonal_stats_tiled) and the storage-bucketed plan
    (zonal_stats_tiled_from_store)."""
    if carry_px:
        # mini-raster assembly / add_stats UDFs: inherently per-zone
        merged = partials.groupby("zone_id").map_groups(
            merge_partials, batch_format="pyarrow"
        )
    elif need_vals:
        # holistic stats: group by zone BUCKET (64 zones per group) so the
        # framework dispatches once per bucket and the algebraic part of
        # the merge runs as vectorized segment reductions — no 1-row
        # blocks, ~64x fewer per-group Python calls
        bucket_kernel = BucketMergeKernel(
            stats=stats, categorical=categorical,
            category_map=category_map, raster_dtype=raster_dtype,
        )

        def add_bucket(batch: pa.Table) -> pa.Table:
            # prune the pixel-carrying columns (px/rv/window coords) the
            # holistic merge never reads before the exchange
            batch = batch.select(
                [
                    "zone_id", "count", "sum_f", "sum_i", "sumsq", "min",
                    "max", "nodata", "nan_cnt", "has_nan", "is_int", "vals",
                ]
            )
            zb = pc.shift_right(batch["zone_id"], 6)
            return batch.append_column("zone_bucket", zb)

        def merge_bucket(group: pa.Table) -> pa.Table:
            return bucket_kernel(group)

        merged = (
            partials.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("zone_bucket")
            .map_groups(merge_bucket, batch_format="pyarrow")
        )
    else:
        # algebraic-only: TREE REDUCE instead of a sort-shuffle groupby.
        # The aggregate's OUTPUT is one thin row per zone (#zones x 11
        # numeric columns — tens of MB even at 10^6 zones), so a full
        # sample-sort exchange of the partials is overhead-bound (measured
        # 20 s of a 28 s run at 400k zones / 323 blocks): instead each
        # block pre-combines its partials by zone with one vectorized
        # Arrow group_by (no exchange), the pre-agg blocks coalesce, and
        # ONE task runs the final combine + finalize, already sorted.
        # Scale bound: the per-zone result table must fit a worker's heap
        # — the same #zones bound the broadcast path already assumes; the
        # bound is documented here rather than hedged with a slower plan.
        partials = partials.select_columns(
            [
                "zone_id", "count", "sum_f", "sum_i", "sumsq", "min",
                "max", "nodata", "nan_cnt", "has_nan", "is_int",
            ]
        )
        combine = [
            ("count", "sum"), ("sum_f", "sum"), ("sum_i", "sum"),
            ("sumsq", "sum"), ("min", "min"), ("max", "max"),
            ("nodata", "sum"), ("nan_cnt", "sum"), ("has_nan", "max"),
            ("is_int", "max"),
        ]
        names = [
            "zone_id", "sum(count)", "sum(sum_f)", "sum(sum_i)",
            "sum(sumsq)", "min(min)", "max(max)", "sum(nodata)",
            "sum(nan_cnt)", "max(has_nan)", "max(is_int)",
        ]

        def preagg(batch: pa.Table) -> pa.Table:
            g = batch.group_by("zone_id").aggregate(combine)
            # keep original column names so pre-agg composes with itself
            return g.rename_columns(
                ["zone_id"] + [c for c, _ in combine]
            )

        def final_combine(batch: pa.Table) -> pa.Table:
            g = batch.group_by("zone_id").aggregate(combine)
            g = g.rename_columns(names)
            return g.sort_by("zone_id")

        agg = (
            partials.map_batches(preagg, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(1)
            .map_batches(final_combine, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)
        )
        stats_list_f = stats_list

        def finalize_vec(batch: pa.Table) -> pa.Table:
            n = len(batch)
            count = batch["sum(count)"].to_numpy(zero_copy_only=False).astype(np.int64)
            sum_f = batch["sum(sum_f)"].to_numpy(zero_copy_only=False).astype(np.float64)
            sum_i = batch["sum(sum_i)"].to_numpy(zero_copy_only=False).astype(np.float64)
            sumsq = batch["sum(sumsq)"].to_numpy(zero_copy_only=False).astype(np.float64)
            vmin = batch["min(min)"].to_numpy(zero_copy_only=False).astype(np.float64)
            vmax = batch["max(max)"].to_numpy(zero_copy_only=False).astype(np.float64)
            nodata_c = batch["sum(nodata)"].to_numpy(zero_copy_only=False).astype(np.float64)
            nan_c = batch["sum(nan_cnt)"].to_numpy(zero_copy_only=False).astype(np.float64)
            has_nan = batch["max(has_nan)"].to_numpy(zero_copy_only=False).astype(np.int64) > 0
            is_int = batch["max(is_int)"].to_numpy(zero_copy_only=False).astype(np.int64) > 0
            empty = count == 0
            safe = np.maximum(count, 1).astype(np.float64)
            mean = np.where(is_int, sum_i / safe, sum_f / safe)
            var = np.maximum(sumsq / safe - mean * mean, 0.0)

            def fcol(vals):
                return pa.array(
                    np.where(empty, np.nan, vals), pa.float64(), from_pandas=True
                )

            cols: dict = {"zone_id": batch["zone_id"]}
            for s in stats_list_f:
                if s == "count":
                    cols[s] = pa.array(count, pa.int64())
                elif s == "min":
                    cols[s] = fcol(vmin)
                elif s == "max":
                    cols[s] = fcol(vmax)
                elif s == "mean":
                    cols[s] = fcol(mean)
                elif s == "sum":
                    cols[s] = fcol(np.where(is_int, sum_i, sum_f))
                elif s == "std":
                    cols[s] = fcol(np.sqrt(var))
                elif s == "range":
                    cols[s] = fcol(vmax - vmin)
                elif s == "nodata":
                    cols[s] = pa.array(nodata_c, pa.float64())
                elif s == "nan":
                    cols[s] = pa.array(
                        np.where(has_nan, nan_c, 0.0), pa.float64()
                    )
                else:  # pragma: no cover - guarded by need_vals
                    raise ValueError(s)
            return pa.table(cols)

        merged = agg.map_batches(finalize_vec, batch_format="pyarrow", zero_copy_batch=True)

    if checkpoint_before_shuffle:
        # the final sort samples + re-executes a lazy input; pin the (small,
        # one-row-per-zone) merge output first
        merged = merged.materialize()
    return merged.sort("zone_id")


# ------------------------------------------------- storage-bucketed tiled


def write_zones_bucketed(
    zones_ds,
    path: str,
    affine: Affine,
    tile_size: int = DEFAULT_TILE_SIZE,
    geom_col: str = "geom_wkb",
) -> str:
    """Stage zones CELL-PARTITIONED for shuffle-free tiled zonal stats:
    one streaming pass tags each zone with every tile cell its boundless
    window touches (tile-assignment parity with zonal_stats_tiled) and
    writes ``path/cell=<i>/`` parquet via Ray's partitioned write.

    This is the ``stages/bucketed.py`` trick applied to the zonal join:
    pay the zone-geometry exchange ONCE at write time; every subsequent
    zonal run against any raster sharing the tiling is a targeted
    per-cell read with NO zone shuffle at all. Degenerate (empty-window)
    zones land in ``cell=-1``.
    """

    def tag(batch: pa.Table) -> pa.Table:
        t = assign_zones_to_cells(
            batch, affine=affine, tile_size=tile_size, geom_col=geom_col
        )
        return pa.table(
            {
                "cell": pc.fill_null(t["cell"], -1),
                "zone_id": t["zone_id"],
                "geom_wkb": t["geom_wkb"],
            }
        )

    tagged = zones_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    tagged.write_parquet(path, partition_cols=["cell"])
    return path


class _StoreCellKernel:
    """Per-bucket kernel: each call processes whole cell buckets — a
    pruned parquet read of ``cell=<i>`` plus the in-memory CellKernel.
    Run as a TASK pool (per-worker cached instance via _store_cell_call):
    tasks let the scheduler starve slow workers naturally instead of
    pinning buckets to a fixed actor — same rationale as the broadcast
    path's compute="tasks" mode (BASELINE.md host addendum)."""

    def __init__(self, path, **cell_kernel_kwargs):
        import os

        self.path = path
        self.kernel = CellKernel(**cell_kernel_kwargs)
        self._os = os

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out = []
        for cell in batch["cell"].to_pylist():
            d = self._os.path.join(self.path, f"cell={cell}")
            if not self._os.path.isdir(d):
                continue
            t = pq.read_table(d, columns=["zone_id", "geom_wkb"])
            if not len(t):
                continue
            if cell == -1:  # degenerate windows: CellKernel expects null
                cell_col = pa.nulls(len(t), pa.int64())
            else:
                cell_col = pa.array(np.full(len(t), cell, np.int64), pa.int64())
            out.append(self.kernel(t.append_column("cell", cell_col)))
        if not out:
            return _empty_partials()
        return pa.concat_tables(out, promote_options="default")


def _store_cell_call(batch, *, token: str, path: str, ctor: dict):
    kernel = _TASK_KERNEL_CACHE.get(token)
    if kernel is None:
        while len(_TASK_KERNEL_CACHE) >= _TASK_KERNEL_CACHE_MAX:
            _TASK_KERNEL_CACHE.pop(next(iter(_TASK_KERNEL_CACHE)))
        kernel = _TASK_KERNEL_CACHE[token] = _StoreCellKernel(path, **ctor)
    return kernel(batch)


def store_cells(zones_path: str) -> list[int]:
    """The sorted cell-bucket ids of a ``write_zones_bucketed`` layout."""
    import os

    cells = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(zones_path)
        if d.startswith("cell=")
    )
    if not cells:
        raise FileNotFoundError(f"no cell= buckets under {zones_path}")
    return cells


def store_partials_ds(
    zones_path: str,
    cells: list[int],
    refmap_ref,
    *,
    affine: Affine,
    nodata,
    tile_size: int,
    raster_dtype: str,
    all_touched: bool,
    need_vals: bool,
    concurrency=None,
):
    """Per-(zone, cell) partial rows for the given cell buckets of a
    bucketed zone store — the shuffle-free front half of
    ``zonal_stats_tiled_from_store``, exposed separately so the
    checkpointed runner (pipelines/checkpoint.py) can execute and
    persist one cell-partition's partials at a time."""
    import uuid

    import ray.data

    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()
    # one task per cell up to a few tasks per CPU; beyond that, group
    # cells into blocks (a 100k-cell store must not become 100k 1-row
    # blocks — each task then works several buckets, batch_size=1 keeps
    # the per-call unit at one bucket); blocks are split driver-side
    # (id_blocks_ds) so no AllToAll barrier precedes the first read
    from ._cluster import cluster_cpus, id_blocks_ds

    cells_ds = id_blocks_ds(cells, max(cluster_cpus() * 16, 1), "cell")
    ctor = dict(
        refmap_ref=refmap_ref,
        affine=affine,
        nodata=nodata,
        tile_size=tile_size,
        raster_dtype=raster_dtype,
        all_touched=all_touched,
        need_vals=need_vals,
        carry_px=False,
    )
    return cells_ds.map_batches(
        _store_cell_call,
        fn_kwargs=dict(token=uuid.uuid4().hex, path=zones_path, ctor=ctor),
        batch_size=1,
        batch_format="pyarrow",
        concurrency=concurrency[1] if isinstance(concurrency, tuple) else concurrency,
    )


def finish_store_partials(
    partials,
    *,
    stats=None,
    categorical: bool = False,
    category_map=None,
    raster_dtype: str = "float32",
    checkpoint_before_shuffle: bool = True,
):
    """Per-(zone, cell) partial rows (``store_partials_ds`` output, live
    or read back from a checkpoint sink) -> final per-zone stats Dataset
    sorted by zone_id. The back half of ``zonal_stats_tiled_from_store``."""
    stats_list, run_count = check_stats(stats, categorical)
    need_vals = run_count or any(
        s.startswith("percentile_") or s == "median" for s in stats_list
    )
    return _finish_tiled_partials(
        partials,
        merge_partials=None,
        carry_px=False,
        need_vals=need_vals,
        stats=stats,
        stats_list=stats_list,
        categorical=categorical,
        category_map=category_map,
        raster_dtype=raster_dtype,
        checkpoint_before_shuffle=checkpoint_before_shuffle,
    )


def zonal_stats_tiled_from_store(
    zones_path: str,
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
    concurrency=None,
    checkpoint_before_shuffle: bool = True,
):
    """Shuffle-free tiled zonal stats over a ``write_zones_bucketed``
    layout: one task per cell bucket (a targeted parquet read — exactly
    the partition-pruned read a cluster's shared storage serves), tiles
    pinned in plasma via the refmap, then only the small per-(zone, cell)
    partial rows enter the one remaining zone-aggregate exchange.

    Compared to ``zonal_stats_tiled`` this removes BOTH the zone-tagging
    pass and the (cell, zone_id, wkb) sort shuffle from query time — the
    partitioning assumption is that the store was bucketed with the SAME
    affine/tile_size (cells are bounds_window-snapped tile ids).

    Pixel-carrying features (add_stats / zone_func / raster_out) are not
    offered here — use zonal_stats_tiled for those.

    ``checkpoint_before_shuffle`` (default True) materializes the partial
    rows into the object store before the zone-aggregate exchange. The
    tradeoff: Ray's sort-based all-to-all samples its input and then
    re-executes it, so WITHOUT the checkpoint every cell task (bucket
    read + rasterize + fused stats) runs TWICE; WITH it the partials are
    pinned once and the sort reads them back. Partials are thin (one row
    per (zone, cell) pair — 77 MB at sf0.1's 400k zones), so pinning is
    the right default up to ~10^10 zone-cell pairs. Beyond that (10^12
    zones on a 256-node cluster) the pinned copy itself becomes an
    object-store-sized commitment that forces spilling; pass ``False``
    to stream the partials straight into the exchange and pay the
    recompute instead — CPU (re-rasterize) is usually cheaper than
    spill-to-disk I/O at that scale. Both modes are bit-identical
    (tests/test_distributed.py::test_tiled_from_store_streaming_shuffle).
    """
    import os

    import ray.data

    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()
    stats_list, run_count = check_stats(stats, categorical)
    need_vals = run_count or any(
        s.startswith("percentile_") or s == "median" for s in stats_list
    )
    cells = store_cells(zones_path)
    refmap_ref, _block_refs = build_tile_refmap(tiles_ds)
    partials = store_partials_ds(
        zones_path,
        cells,
        refmap_ref,
        affine=affine,
        nodata=nodata,
        tile_size=tile_size,
        raster_dtype=raster_dtype,
        all_touched=all_touched,
        need_vals=need_vals,
        concurrency=concurrency,
    )
    if checkpoint_before_shuffle:
        partials = partials.materialize()
    return _finish_tiled_partials(
        partials,
        merge_partials=None,
        carry_px=False,
        need_vals=need_vals,
        stats=stats,
        stats_list=stats_list,
        categorical=categorical,
        category_map=category_map,
        raster_dtype=raster_dtype,
        checkpoint_before_shuffle=checkpoint_before_shuffle,
    )
