"""Driver-checkable zonal / point-query pipelines with exact DuckDB oracles.

Each query runs a REAL distributed engine path (tiled cell-join shuffle,
broadcast actor pool, hybrid auto router, vectorized point kernels) over
deterministic rectangle zones + integer-valued rasters from
``sources/oracle_fixtures.py``; the paired SQL recomputes the same result
from the exploded pixel parquet with closed-form floor arithmetic — the
engine's rasterizer / tiling / shuffle / merge code is never in the oracle
loop. See oracle_fixtures module docstring for the bit-exactness argument.

Reference semantics mirrored in SQL: center rule (utils.py:33-55),
all_touched, masking + stat formulas (main.py:196-302), point query
nearest/bilinear incl. banker's-rounding window centering and
masked->nearest->None fallback (point.py:8-65).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.oracle_fixtures import (
    ORACLE_DIR,
    ensure_fixtures,
    irregular_zone_table,
    oracle_raster,
    query_points,
    rect_zone_table,
)

HOLES_H = 512
HOLES_SHAPE_W = 512
CLASSES_H = 384


# ----------------------------------------------------------- engine side


def _zones_ds(zset: str):
    import ray.data

    ensure_fixtures()
    return ray.data.from_arrow(rect_zone_table(zset))


def _tiled(zset: str, raster_name: str, stats: str, **kw):
    import ray.data

    from ..sources.tiles import raster_to_tiles_table
    from ..stages.zonal_dist import zonal_stats_tiled

    arr, affine, nodata = oracle_raster(raster_name)
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=128)
    return zonal_stats_tiled(
        _zones_ds(zset),
        ray.data.from_arrow(tiles),
        affine,
        nodata,
        raster_dtype=str(arr.dtype),
        stats=stats,
        tile_size=128,
        **kw,
    )


def _broadcast(zset: str, raster_name: str, stats: str, **kw):
    from ..stages.zonal_dist import zonal_stats_broadcast

    arr, affine, nodata = oracle_raster(raster_name)
    return zonal_stats_broadcast(_zones_ds(zset), (arr, affine, nodata), stats=stats, **kw)


def q_zonal_tiled(sf_dir: str):
    return _tiled("main", "holes", "count min max mean sum std median nodata")


def q_zonal_tiled_store(sf_dir: str):
    """Shuffle-free storage-bucketed tiled plan over the SAME zones /
    raster / stats as zonal_synthetic_tiled (same oracle SQL): zones are
    cell-partitioned once via write_zones_bucketed, then each query is a
    targeted per-cell read with only the zone-aggregate exchange left."""
    import os

    import ray.data

    from ..sources.tiles import raster_to_tiles_table
    from ..stages.zonal_dist import (
        write_zones_bucketed,
        zonal_stats_tiled_from_store,
    )

    ensure_fixtures()
    arr, affine, nodata = oracle_raster("holes")
    store = os.path.join(ORACLE_DIR, "zones_bucketed_main")
    if not os.path.isdir(store):
        write_zones_bucketed(
            ray.data.from_arrow(rect_zone_table("main")), store, affine,
            tile_size=128,
        )
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=128)
    return zonal_stats_tiled_from_store(
        store,
        ray.data.from_arrow(tiles),
        affine,
        nodata,
        raster_dtype=str(arr.dtype),
        stats="count min max mean sum std median nodata",
        tile_size=128,
    )


def q_zonal_broadcast(sf_dir: str):
    return _broadcast("main", "holes", "count min max mean sum std median nodata range")


def q_zonal_all_touched(sf_dir: str):
    return _tiled("main", "holes", "count min max nodata", all_touched=True)


def q_zonal_categorical(sf_dir: str):
    out = _tiled("cat", "classes", "count majority minority unique median", categorical=True)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["zone_id", "count", "majority", "minority", "unique", "median"])

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def q_zonal_histogram(sf_dir: str):
    out = _tiled("cat", "classes", "count", categorical=True)

    def explode(batch: pa.Table) -> pa.Table:
        zids, vals, cnts = [], [], []
        zcol = batch["zone_id"].to_pylist()
        vlists = batch["cat_values"].to_pylist()
        clists = batch["cat_counts"].to_pylist()
        for z, vs, cs in zip(zcol, vlists, clists):
            for v, c in zip(vs, cs):
                zids.append(z)
                vals.append(v)
                cnts.append(c)
        return pa.table(
            {
                "zone_id": pa.array(zids, pa.int64()),
                "val": pa.array(vals, pa.float64()),
                "cnt": pa.array(cnts, pa.int64()),
            }
        )

    return out.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def q_zonal_auto(sf_dir: str):
    from ..stages.zonal_dist import zonal_stats_auto

    arr, affine, nodata = oracle_raster("holes")
    return zonal_stats_auto(
        _zones_ds("auto"),
        (arr, affine, nodata),
        stats="count mean sum nodata",
        window_px_budget=20_000,
    )


def q_zonal_edge(sf_dir: str):
    out = _broadcast("edge", "holes", "count min max mean sum")

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["zone_id", "count", "min", "max", "mean", "sum"])

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


_IRREG_STATS = "count min max mean sum std median nodata"


def q_zonal_irregular_tiled(sf_dir: str):
    """Tiled cell-join path over IRREGULAR jittered-quad zones (incl.
    mega-polygons and beyond-extent overhang). Oracle = SQL that derives
    pixel membership ITSELF via even-odd edge-crossing parity over the
    generator-written vertex table (_irregular_sql) — no engine
    rasterization anywhere in the oracle loop, so the full rasterize /
    tiling / shuffle / skew-split / merge machinery is what this query
    verifies."""
    import ray.data

    from ..sources.tiles import raster_to_tiles_table
    from ..stages.zonal_dist import zonal_stats_tiled

    ensure_fixtures()
    arr, affine, nodata = oracle_raster("holes")
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=128)
    return zonal_stats_tiled(
        ray.data.from_arrow(irregular_zone_table("tiled")),
        ray.data.from_arrow(tiles),
        affine,
        nodata,
        raster_dtype=str(arr.dtype),
        stats=_IRREG_STATS,
        tile_size=128,
    )


def q_zonal_irregular_broadcast(sf_dir: str):
    import ray.data

    from ..stages.zonal_dist import zonal_stats_broadcast

    ensure_fixtures()
    arr, affine, nodata = oracle_raster("holes")
    return zonal_stats_broadcast(
        ray.data.from_arrow(irregular_zone_table("broadcast")),
        (arr, affine, nodata),
        stats=_IRREG_STATS,
    )


def _udf_mean(m):
    """arity-1 add_stats: float64 mean of the assembled masked window (the
    float64 cast keeps the sum exact for integer-valued pixels, so the SQL
    mirror s/cnt is bit-identical)."""
    return float(np.ma.asarray(m).astype(np.float64).mean()) if m.count() else None


def _udf_mask_px(m, props, rv):
    """arity-3 add_stats: geometry-mask cell count (includes nodata cells),
    = the SQL count of all joined pixels."""
    return float(int(rv.sum()))


def q_zonal_udfs(sf_dir: str):
    """Distributed tiled path with add_stats UDFs (arity 1 and 3): the
    merge stage assembles each zone's mini-raster from its tile partials
    and dispatches the UDFs on it (reference main.py:304-316 semantics,
    driver-checkable because both UDFs have closed-form SQL mirrors)."""
    out = _tiled(
        "main",
        "holes",
        "count",
        add_stats={"udf_mean": _udf_mean, "udf_mask_px": _udf_mask_px},
    )

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["zone_id", "count", "udf_mean", "udf_mask_px"])

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def _points_ds():
    import ray.data

    ensure_fixtures()
    x, y = query_points()
    return ray.data.from_arrow(
        pa.table(
            {
                "pt_id": pa.array(np.arange(len(x), dtype=np.int64), pa.int64()),
                "x": pa.array(x, pa.float64()),
                "y": pa.array(y, pa.float64()),
            }
        )
    )


def _point_query(interpolate: str):
    from ..stages.point_dist import point_query_broadcast

    arr, affine, nodata = oracle_raster("holes")
    out = point_query_broadcast(_points_ds(), (arr, affine, nodata), interpolate=interpolate)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["pt_id", "value"])

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def q_point_query_bilinear(sf_dir: str):
    return _point_query("bilinear")


def q_point_query_nearest(sf_dir: str):
    return _point_query("nearest")


def q_point_query_tiled(sf_dir: str):
    """Bilinear point query through the NON-broadcastable-raster plan
    (stages/point_dist.py::point_query_tiled): tiles pinned via the zonal
    refmap, points shuffled to their owning cell, per-cell vectorized
    gather. Same points / raster / closed-form SQL oracle as
    point_query_synthetic — the plans are bit-identical by construction
    (shared interp_values) and by pytest differential."""
    import ray.data

    from ..sources.tiles import raster_to_tiles_table
    from ..stages.point_dist import point_query_tiled

    arr, affine, nodata = oracle_raster("holes")
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=128)
    out = point_query_tiled(
        _points_ds(), ray.data.from_arrow(tiles), affine, nodata,
        interpolate="bilinear", tile_size=128,
    )

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["pt_id", "value"])

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def q_point_query_tiled_store(sf_dir: str):
    """Bilinear point query over the write_tiles_bucketed parquet store
    (pay-once staged layout, zero exchange + zero object-store pin at
    query time): each cell group is two targeted partition reads. Same
    oracle as point_query_synthetic."""
    import os

    import ray.data

    from ..sources.tiles import raster_to_tiles_table
    from ..stages.focal import write_tiles_bucketed
    from ..stages.point_dist import point_query_from_store

    ensure_fixtures()
    arr, affine, nodata = oracle_raster("holes")
    # atomic staging (tmp dir + rename), same reason as ensure_fixtures:
    # a kill mid-write must not leave a half-store that later runs reuse
    # (missing partitions gather as nodata -> persistent oracle mismatch)
    store = os.path.join(ORACLE_DIR, "tiles_bucketed_holes_128")
    if not os.path.isdir(store):
        import shutil
        import tempfile

        # UNIQUE tmp dir per process: a shared ".tmp" path lets two
        # concurrent stagers rmtree/write over each other and publish a
        # mixed-content store
        tmp = tempfile.mkdtemp(prefix="tiles_bucketed_holes_128.", dir=ORACLE_DIR)
        tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=128)
        write_tiles_bucketed(
            ray.data.from_arrow(tiles), tmp, arr.shape, 128, radius=1
        )
        try:
            os.rename(tmp, store)
        except OSError:  # another process published first; theirs is whole
            shutil.rmtree(tmp, ignore_errors=True)
    out = point_query_from_store(
        _points_ds(), store, arr.shape, affine, nodata,
        interpolate="bilinear", tile_size=128,
    )

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["pt_id", "value"])

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def q_point_query_features(sf_dir: str):
    """Per-feature vertex bilinear query over the 'main' rect WKB rings,
    exploded to (zone_id, vertex_idx, value) rows for SQL comparison."""
    from ..stages.point_dist import point_query_features

    arr, affine, nodata = oracle_raster("holes")
    out = point_query_features(_zones_ds("main"), (arr, affine, nodata))

    def explode(batch: pa.Table) -> pa.Table:
        zids, idxs, vals = [], [], []
        for z, lst in zip(batch["zone_id"].to_pylist(), batch["values"].to_pylist()):
            for i, v in enumerate(lst):
                zids.append(z)
                idxs.append(i)
                vals.append(v)
        return pa.table(
            {
                "zone_id": pa.array(zids, pa.int64()),
                "vertex_idx": pa.array(idxs, pa.int64()),
                "value": pa.array(vals, pa.float64()),
            }
        )

    return out.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------- focal / resample / algebra


def _tiles_ds(raster_name: str, tile_size: int = 128):
    import ray.data

    from ..sources.tiles import raster_to_tiles_table

    ensure_fixtures()
    arr, affine, nodata = oracle_raster(raster_name)
    return ray.data.from_arrow(raster_to_tiles_table(arr, affine, nodata, tile_size=tile_size)), arr, nodata


def q_raster_focal_mean(sf_dir: str):
    """3x3 nodata-aware focal mean over 'holes' via distributed halo
    exchange (stages/focal.py): tile cores + radius-1 strips shuffle once
    on cell, integral-image box sums per assembled window. Output is a
    deterministic pixel sample (row*W + col) % 97 == 0 incl. raster
    borders and all-nodata neighborhoods (fcnt 0 -> null mean)."""
    from ..stages.focal import focal_mean_tiled, sample_focal_pixels

    tiles, arr, nodata = _tiles_ds("holes")
    focal = focal_mean_tiled(tiles, arr.shape, nodata, radius=1, tile_size=128)
    return sample_focal_pixels(focal, arr.shape[1], 97)


def q_raster_downsample(sf_dir: str):
    """Factor-8 mean pooling of 'holes' to a 64x64 grid: per-tile bincount
    partials then a thin per-coarse-pixel merge; all-nodata coarse blocks
    keep cnt 0 with null sum/mean."""
    from ..stages.focal import downsample_mean

    tiles, _arr, nodata = _tiles_ds("holes")
    return downsample_mean(tiles, 8, nodata)


def q_raster_calc_ndvi(sf_dir: str):
    """Normalized-difference map algebra (a - b) / (a + b) over the
    grid-aligned 'holes' and 'terrain' rasters: operand tiles co-located
    by one union + groupby(cell); either-nodata pixels are null. Output
    is the (row*W + col) % 89 == 0 pixel sample."""
    from ..stages.focal import raster_calc_tiled, sample_calc_pixels

    tiles_a, arr, nodata_a = _tiles_ds("holes")
    tiles_b, _arr_b, nodata_b = _tiles_ds("terrain")
    calc = raster_calc_tiled(
        tiles_a, tiles_b, lambda a, b: (a - b) / (a + b), nodata_a, nodata_b
    )
    return sample_calc_pixels(calc, arr.shape[1], 89)


def q_zonal_over_focal(sf_dir: str):
    """Operator CHAIN: 3x3 focal sum (halo-exchange stencil) -> standard
    tile table (focal_to_tiles, all-nodata neighborhoods burned as
    nodata) -> distributed tiled zonal aggregate over the 'main' rect
    zones. Focal sums of integer pixels are integers, so the whole chain
    stays bit-exact vs the SQL that recomputes both steps from exploded
    pixels."""
    import ray.data

    from ..stages.focal import focal_mean_tiled, focal_to_tiles
    from ..stages.zonal_dist import zonal_stats_tiled

    tiles, arr, nodata = _tiles_ds("holes")
    _a, affine, _n = oracle_raster("holes")
    derived = focal_to_tiles(
        focal_mean_tiled(tiles, arr.shape, nodata, radius=1, tile_size=128), nodata
    )
    return zonal_stats_tiled(
        _zones_ds("main"),
        derived,
        affine,
        nodata,
        raster_dtype="float64",
        stats="count mean sum nodata",
        tile_size=128,
    )


def q_zonal_weighted(sf_dir: str):
    """Coverage-weighted zonal stats (exactextract semantics) over the
    'main' rect zones: boundary pixels count by the FRACTION of the cell
    the rectangle covers. Bounds scale-rounded to int64 once; all
    weights/sums are integer arithmetic (order-independent), so the
    distributed result is bit-identical to the SQL mirror."""
    from ..stages.weighted import zonal_weighted_broadcast

    arr, affine, nodata = oracle_raster("holes")
    return zonal_weighted_broadcast(_zones_ds("main"), (arr, affine, nodata))


def q_zonal_weighted_raster(sf_dir: str):
    """Zonal stats of 'holes' WEIGHTED BY the grid-aligned 'terrain'
    raster (exactextract weighted_mean/weighted_sum with a weight
    raster) over the 'main' rect zones: center-rule pixels where BOTH
    rasters are valid, integer wtot/wsum, one float divide for wmean.
    Both rasters broadcast once via a single ray.put."""
    from ..stages.weighted import zonal_weighted_by_raster_broadcast

    varr, affine, v_nod = oracle_raster("holes")
    warr, w_affine, w_nod = oracle_raster("terrain")
    return zonal_weighted_by_raster_broadcast(
        _zones_ds("main"), (varr, affine, v_nod), (warr, w_affine, w_nod)
    )


def q_raster_global_stats(sf_dir: str):
    """Whole-raster reduction over 'holes' via per-tile combinable
    partials (the raster analogue of tpch_q1's pre-aggregation): one
    output row, bit-exact for the integer-valued fixture."""
    from ..stages.focal import raster_global_stats

    tiles, _arr, nodata = _tiles_ds("holes")
    return raster_global_stats(tiles, nodata)


def q_raster_slope(sf_dir: str):
    """Horn slope over 'holes' (the GDAL ``gdaldem slope`` kernel):
    integer gx/gy via the radius-1 halo exchange, slope_pct only where
    the full 3x3 window is valid (borders and nodata-adjacent pixels
    null). Deterministic (row*W + col) % 101 == 0 pixel sample."""
    from ..stages.focal import focal_slope_tiled, sample_slope_pixels

    tiles, arr, nodata = _tiles_ds("holes")
    slope = focal_slope_tiled(tiles, arr.shape, nodata, tile_size=128)
    return sample_slope_pixels(slope, arr.shape[1], 101, cellsize=1.0)


def q_raster_terrain(sf_dir: str):
    """gdaldem TRI (Wilson), TPI and roughness over 'holes' in one
    radius-1 halo pass: exact int64 numerators per fully-valid 3x3
    window, finished by one divide-by-8 each (bit-exact vs SQL).
    Deterministic (row*W + col) % 89 == 0 pixel sample."""
    from ..stages.focal import focal_terrain_tiled, sample_terrain_pixels

    tiles, arr, nodata = _tiles_ds("holes")
    terr = focal_terrain_tiled(tiles, arr.shape, nodata, tile_size=128)
    return sample_terrain_pixels(terr, arr.shape[1], 89)


def q_raster_focal_minmax(sf_dir: str):
    """5x5 morphological erosion/dilation (focal min/max) over 'holes':
    shifted-slice extrema reduction per assembled halo window; null where
    the whole neighborhood is invalid. (row*W + col) % 103 == 0 sample."""
    from ..stages.focal import focal_minmax_tiled, sample_minmax_pixels

    tiles, arr, nodata = _tiles_ds("holes")
    mm = focal_minmax_tiled(tiles, arr.shape, nodata, radius=2, tile_size=128)
    return sample_minmax_pixels(mm, arr.shape[1], 103)


def q_raster_warp(sf_dir: str):
    """Nearest-neighbor affine warp of 'holes' (512x512) to a 400x360
    grid: src_row = (r*8 + 3) // 5 (rows beyond 511 -> null, exercising
    out-of-bounds), src_col = (c*7 + 2) // 6. Source tiles ship sub-rects
    to exactly the output tiles that sample them (interval arithmetic,
    one exchange). (row*W_out + col) % 83 == 0 output sample."""
    from ..stages.focal import sample_calc_pixels, warp_nearest_tiled

    tiles, _arr, nodata = _tiles_ds("holes")
    warped = warp_nearest_tiled(
        tiles,
        (HOLES_H, HOLES_SHAPE_W),
        (400, 360),
        nodata,
        y_map=(8, 3, 5),
        x_map=(7, 2, 6),
        tile_size=128,
    )
    return sample_calc_pixels(warped, 360, 83)


def q_raster_d8_flow(sf_dir: str):
    """D8 flow direction over 'holes' (O'Callaghan & Mark, ESRI codes):
    steepest-descent neighbor with exact integer distance weighting
    (2*drop^2 cardinal vs drop^2 diagonal), fixed priority tie-break,
    0 for pits; nodata centers dropped, nodata neighbors skipped.
    (row*W + col) % 107 == 0 valid-pixel sample."""
    from ..stages.focal import flow_direction_tiled, sample_d8_pixels

    tiles, arr, nodata = _tiles_ds("holes")
    d8 = flow_direction_tiled(tiles, arr.shape, nodata, tile_size=128)
    return sample_d8_pixels(d8, arr.shape[1], 107)


def q_raster_focal_std(sf_dir: str):
    """5x5 focal standard deviation (terrain roughness) over 'holes':
    box sums of v and v^2 per halo window (exact integers in float64),
    std finished per pixel by the same IEEE chain as the SQL —
    sqrt(max(sq/cnt - (s/cnt)^2, 0)). (row*W + col) % 149 == 0 sample."""
    from ..stages.focal import focal_std_tiled, sample_std_pixels

    tiles, arr, nodata = _tiles_ds("holes")
    std = focal_std_tiled(tiles, arr.shape, nodata, radius=2, tile_size=128)
    return sample_std_pixels(std, arr.shape[1], 149)


def q_raster_quantiles(sf_dir: str):
    """EXACT whole-raster quantiles (q25/q50/q90) of 'holes' via the
    distinct-value histogram: per-tile (value, count) partials, one thin
    groupby, a driver cumulative scan (bounded distinct values —
    the integer-raster analogue of select_top_exact's score histogram).
    quantile(q) = smallest value whose cumulative count reaches
    ceil(q*n), integer arithmetic end to end."""
    from ..stages.focal import raster_value_quantiles

    tiles, _arr, nodata = _tiles_ds("holes")
    return raster_value_quantiles(tiles, nodata, qs=(0.25, 0.5, 0.9))


def q_raster_contour(sf_dir: str):
    """Iso-level edge crossings over 'holes' at levels 30 and 70 (the
    gdal_contour marching-squares core): adjacent valid pixel pairs
    strictly straddling a level emit the exact linear-interpolation
    offset t = (L-a)/(b-a); each pair owned by its left/top pixel,
    sampled (row*W + col) % 13 == 0."""
    from ..stages.focal import contour_crossings

    tiles, arr, nodata = _tiles_ds("holes")
    return contour_crossings(
        tiles, arr.shape, nodata, levels=(30, 70), tile_size=128, mod=13
    )


def q_raster_contour_lines(sf_dir: str):
    """Assembled contour polylines over 'terrain' at levels 40/70
    (gdal_contour): marching-squares segments chained by per-tile
    pointer-jumping CC + contracted fragment-graph components — one row
    per line (level, line_id, n_pts, closed). Rows-only driver check
    (line labeling is transitive closure); exactness pinned by
    tests/test_focal.py::test_contour_polylines_match_reference against
    a sequential marching-squares + union-find reference,
    layout-invariant. The crossing COORDINATES are exact-checked by the
    companion raster_contour query."""
    from ..stages.focal import contour_polylines

    tiles, arr, nodata = _tiles_ds("terrain")
    return contour_polylines(tiles, arr.shape, nodata, levels=(40, 70), tile_size=128)


def q_raster_cost_distance(sf_dir: str):
    """Cost distance with obstacles over the 96x96 top-left crop of
    'holes': exact geodesic (4-connected, unit-step) BFS distance to the
    nearest of 3 seed pixels through passable pixels only, where
    impassable = nodata OR value % 7 == 0 (a value-derived barrier field,
    ~14% obstacles, 489 unreachable pixels -> null dist). Superstep halo
    iteration (Bellman-Ford over tiles) on a 3x3 tile grid; convergence
    (a no-change round) certifies the exact min-plus fixpoint. Emits
    every passable pixel."""
    import ray.data

    from ..sources.tiles import raster_to_tiles_table
    from ..stages.focal import cost_distance_tiled, sample_cost_pixels

    ensure_fixtures()
    arr, affine, nodata = oracle_raster("holes")
    crop = arr[:96, :96]
    tiles = ray.data.from_arrow(raster_to_tiles_table(crop, affine, nodata, tile_size=32))

    def passable(a, valid):
        v = np.rint(a.astype(np.float64)).astype(np.int64)
        return valid & (v % 7 != 0)

    dist = cost_distance_tiled(
        tiles,
        crop.shape,
        nodata,
        seeds=[(5, 7), (60, 80), (90, 15)],
        tile_size=32,
        passable_fn=passable,
    )
    return sample_cost_pixels(dist, crop.shape[1], 1)


def q_raster_downsample_mode(sf_dir: str):
    """Factor-8 MODE pooling of the categorical 'classes' raster
    (gdaladdo -r mode): most frequent valid value per coarse block,
    ties to the smallest value; thin (ckey, value, cnt) partials merge
    once. All-nodata blocks keep n_valid 0 / null mode."""
    from ..stages.focal import downsample_mode

    tiles, _arr, nodata = _tiles_ds("classes")
    return downsample_mode(tiles, 8, nodata)


def q_raster_focal_median(sf_dir: str):
    """5x5 nodata-aware focal median (despeckle filter) over 'holes':
    one sort of the 25 stacked shifted slices per assembled halo window,
    two per-pixel middle gathers, (m1+m2)/2.0 — the DuckDB median()
    interpolation rule exactly. (row*W + col) % 113 == 0 sample."""
    from ..stages.focal import focal_median_tiled, sample_median_pixels

    tiles, arr, nodata = _tiles_ds("holes")
    med = focal_median_tiled(tiles, arr.shape, nodata, radius=2, tile_size=128)
    return sample_median_pixels(med, arr.shape[1], 113)


def q_raster_cost_weighted(sf_dir: str):
    """WEIGHTED cost distance (gdal cost-distance semantics) over the
    96x96 'holes' crop: step a -> b costs value(a) + value(b), exact
    Dijkstra via the packed-integer min-plus superstep sweep. Rows-only
    driver check (no SQL oracle exists for weighted shortest paths — a
    recursive CTE's state space explodes in the distance term);
    exactness pinned by tests/test_focal.py::
    test_weighted_cost_distance_matches_dijkstra."""
    import ray.data

    from ..sources.tiles import raster_to_tiles_table
    from ..stages.focal import cost_distance_tiled, sample_wcost_pixels

    ensure_fixtures()
    arr, affine, nodata = oracle_raster("holes")
    crop = arr[:96, :96]
    tiles = ray.data.from_arrow(raster_to_tiles_table(crop, affine, nodata, tile_size=32))
    wd = cost_distance_tiled(
        tiles,
        crop.shape,
        nodata,
        seeds=[(5, 7), (60, 80), (90, 15)],
        tile_size=32,
        weighted=True,
    )
    return sample_wcost_pixels(wd, crop.shape[1], 1)


def q_raster_crosstab(sf_dir: str):
    """Cross-tabulation (GIS combine) of 'holes' x 'terrain': pixel
    counts per distinct value pair where both aligned pixels are valid.
    One union + groupby(cell) co-locates tiles; only thin
    (val_a, val_b, cnt) partials reach the final groupby."""
    from ..stages.focal import raster_crosstab

    tiles_a, _arr, nodata_a = _tiles_ds("holes")
    tiles_b, _arr_b, nodata_b = _tiles_ds("terrain")
    return raster_crosstab(tiles_a, tiles_b, nodata_a, nodata_b)


def q_raster_cost_alloc(sf_dir: str):
    """Cost ALLOCATION over the same obstacle field as
    raster_cost_distance: each passable pixel's nearest seed INDEX
    (distance first, smallest seed index tie-break) via the composite
    integer dist * n_seeds + seed relaxed by the identical superstep
    sweep. Emits every passable pixel; unreachable -> both null."""
    import ray.data

    from ..sources.tiles import raster_to_tiles_table
    from ..stages.focal import cost_distance_tiled, sample_alloc_pixels

    ensure_fixtures()
    arr, affine, nodata = oracle_raster("holes")
    crop = arr[:96, :96]
    tiles = ray.data.from_arrow(raster_to_tiles_table(crop, affine, nodata, tile_size=32))

    def passable(a, valid):
        v = np.rint(a.astype(np.float64)).astype(np.int64)
        return valid & (v % 7 != 0)

    alloc = cost_distance_tiled(
        tiles,
        crop.shape,
        nodata,
        seeds=[(5, 7), (60, 80), (90, 15)],
        tile_size=32,
        passable_fn=passable,
        allocate=True,
    )
    return sample_alloc_pixels(alloc, crop.shape[1], 1, n_seeds=3)


def q_raster_majority(sf_dir: str):
    """3x3 focal majority (mode) filter over the categorical 'classes'
    raster: most frequent valid neighbor value, ties to the SMALLEST
    value (the reference's zonal majority convention); null where the
    whole neighborhood is invalid. One integral-image box sum per class.
    (row*W + col) % 137 == 0 sample."""
    from ..stages.focal import focal_majority_tiled, sample_majority_pixels

    tiles, arr, nodata = _tiles_ds("classes")
    maj = focal_majority_tiled(tiles, arr.shape, nodata, radius=1, tile_size=128)
    return sample_majority_pixels(maj, arr.shape[1], 137)


RECLASS_MAP = {1: 10, 2: 20, 3: -5, 4: 40}  # class 5 deliberately unmapped


def q_raster_reclass(sf_dir: str):
    """Broadcast-map reclassification of 'classes' (gdal reclass as a
    standalone tile->tile op): mapped classes remap, class 5 is
    deliberately UNMAPPED (-> null, like nodata), exercising the
    invalid-output rule. (row*W + col) % 139 == 0 sample."""
    from ..stages.focal import reclassify_tiled, sample_calc_pixels

    tiles, arr, nodata = _tiles_ds("classes")
    out = reclassify_tiled(tiles, RECLASS_MAP, nodata)
    return sample_calc_pixels(out, arr.shape[1], 139)


def q_raster_aspect(sf_dir: str):
    """Aspect over 'holes' as the D8 code of the steepest-descent compass
    direction implied by the Horn gradient — no trig: the same exact
    integer projection metric as flow direction (2*proj^2 cardinal vs
    proj^2 diagonal, fixed priority tie-break), 0 for flat gradients,
    null off fully-valid 3x3 windows. (row*W + col) % 113 == 0 sample."""
    from ..stages.focal import focal_slope_tiled, sample_aspect_pixels

    tiles, arr, nodata = _tiles_ds("holes")
    slope = focal_slope_tiled(tiles, arr.shape, nodata, tile_size=128)
    return sample_aspect_pixels(slope, arr.shape[1], 113)


def q_raster_flow_acc(sf_dir: str):
    """D8 flow accumulation over 'holes' (number of pixels draining
    through each pixel, itself included) — Barnes-style two-pass tile
    scheme: level-ordered in-tile routing, an O(perimeter) contracted
    boundary-inflow solve, one re-routing pass (stages/focal.py
    flow_accumulation). The SQL mirror walks EVERY valid pixel's path
    with a recursive CTE and counts visits per position — exact int64
    both sides. (row*W + col) % 173 == 0 valid-pixel sample."""
    from ..stages.focal import flow_accumulation

    tiles, arr, nodata = _tiles_ds("holes")
    return flow_accumulation(tiles, arr.shape, nodata, 173, tile_size=128)


def q_raster_polygonize(sf_dir: str):
    """Raster -> vector region extraction over 'classes' (gdal_polygonize
    shape): 4-connected equal-value regions via per-tile vectorized CC +
    cross-tile edge stitching + contracted-graph components
    (stages/polygonize.py). Rows-only driver check (region labeling is
    not SQL-expressible without transitive closure); exactness is pinned
    by tests/test_focal.py::test_polygonize_matches_flood_fill against an
    independent sequential flood fill, layout-invariant."""
    from ..stages.polygonize import polygonize_tiled

    tiles, arr, nodata = _tiles_ds("classes")
    return polygonize_tiled(tiles, arr.shape, nodata, tile_size=128)


def q_raster_region_group(sf_dir: str):
    """Region-group (ArcGIS RegionGroup) over 'classes': every sampled
    valid pixel annotated with its 4-connected region id (min flat
    index) and GLOBAL pixel count. Rows-only driver check (region
    labeling is transitive closure); exactness pinned by
    tests/test_focal.py::test_region_group_matches_flood_fill,
    layout-invariant. (row*W + col) % 29 == 0 sample."""
    from ..stages.polygonize import region_group_tiled

    tiles, arr, nodata = _tiles_ds("classes")
    return region_group_tiled(tiles, arr.shape, nodata, tile_size=128, mod=29)


def q_raster_sieve(sf_dir: str):
    """gdal_sieve over 'classes': 4-connected regions smaller than 128 px
    take the value of their largest neighbor region (size DESC, region
    id ASC tie-break; sizes on the original labeling). Rows-only driver
    check (region labeling is not SQL-expressible); exactness pinned by
    tests/test_focal.py::test_sieve_matches_reference against an
    independent sequential flood-fill sieve, layout-invariant. Output:
    the changed pixels (row, col, old_val, new_val)."""
    from ..stages.polygonize import sieve_tiled

    tiles, arr, nodata = _tiles_ds("classes")
    sieved = sieve_tiled(tiles, arr.shape, nodata, threshold=128, tile_size=128)
    before = {
        int(c): (int(r0), int(c0), a.copy())
        for c, r0, c0, a in _before_tiles(arr, nodata)
    }

    def diff(batch):
        import pyarrow as _pa

        from ..stages.focal import _tile_arrays

        r_o, c_o, ov_o, nv_o = [], [], [], []
        for cell, r0, c0, a in _tile_arrays(batch):
            _r0, _c0, orig = before[int(cell)]
            chg = a != orig
            if not chg.any():
                continue
            rr = r0 + np.arange(a.shape[0], dtype=np.int64).reshape(-1, 1)
            cc = c0 + np.arange(a.shape[1], dtype=np.int64).reshape(1, -1)
            r_o.append(np.broadcast_to(rr, a.shape)[chg])
            c_o.append(np.broadcast_to(cc, a.shape)[chg])
            ov_o.append(orig[chg].astype(np.int64))
            nv_o.append(a[chg].astype(np.int64))
        cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64)  # noqa: E731
        return _pa.table(
            {
                "row": _pa.array(cat(r_o), _pa.int64()),
                "col": _pa.array(cat(c_o), _pa.int64()),
                "old_val": _pa.array(cat(ov_o), _pa.int64()),
                "new_val": _pa.array(cat(nv_o), _pa.int64()),
            }
        )

    return sieved.map_batches(diff, batch_format="pyarrow", zero_copy_batch=True)


def _before_tiles(arr, nodata, tile_size: int = 128):
    """Original tile arrays keyed by cell (driver-side, for diffing a
    derived tile table against its source in the sieve query)."""
    from ..sources.tiles import raster_to_tiles_table
    from ..stages.focal import _tile_arrays

    tbl = raster_to_tiles_table(arr, None, nodata, tile_size=tile_size)
    return _tile_arrays(tbl)


def q_raster_flow_trace(sf_dir: str):
    """Flow-path tracing over the 'holes' D8 graph: for every valid
    pixel with (row*W + col) % 211 == 0, the hop count and terminal pit
    of its steepest-descent path. Engine: per-tile vectorized pointer
    doubling + an O(perimeter) contracted ring graph (stages/focal.py
    flow_trace). The SQL mirror re-derives D8 for every pixel and walks
    the seeds with a recursive CTE — descent strictly decreases integer
    values, so recursion depth is bounded by the value range."""
    from ..stages.focal import flow_direction_tiled, flow_trace

    tiles, arr, nodata = _tiles_ds("holes")
    d8 = flow_direction_tiled(tiles, arr.shape, nodata, tile_size=128)
    return flow_trace(d8, arr.shape, 211)


def q_raster_warp_bilinear(sf_dir: str):
    """Bilinear affine warp of 'holes' (512x512) to a 600x500 grid:
    source coords sy = (r*8 + 1)/7, sx = (c*9 + 2)/8 (both up- and
    down-sampling stretches, with out-of-bounds tails past row 447 /
    col 455). Exact integer fixed-point 4-neighbor blend finished by one
    float64 divide by 56; needed-neighbor nodata/out-of-bounds -> null.
    (row*W_out + col) % 127 == 0 output sample."""
    from ..stages.focal import sample_calc_pixels, warp_bilinear_tiled

    tiles, _arr, nodata = _tiles_ds("holes")
    warped = warp_bilinear_tiled(
        tiles,
        (HOLES_H, HOLES_SHAPE_W),
        (600, 500),
        nodata,
        y_map=(8, 1, 7),
        x_map=(9, 2, 8),
        tile_size=128,
    )
    return sample_calc_pixels(warped, 500, 127)


def q_raster_hillshade(sf_dir: str):
    """Lambertian hillshade over 'holes' from the Horn gradient tiles
    (gdaldem-hillshade direction: light (-1,-1,1) = azimuth 315, altitude
    45): shade = max(0, (-gx*lx - gy*ly + 8*lz) / sqrt(gx^2+gy^2+64)
    / sqrt(3)) — integer numerator, two correctly-rounded sqrt/divides in
    a fixed order, so the float64 output is bit-exact vs SQL. Null where
    the 3x3 window is not fully valid. (row*W + col) % 109 == 0 sample."""
    from ..stages.focal import focal_slope_tiled, sample_hillshade_pixels

    tiles, arr, nodata = _tiles_ds("holes")
    slope = focal_slope_tiled(tiles, arr.shape, nodata, tile_size=128)
    return sample_hillshade_pixels(slope, arr.shape[1], 109, light=(-1, -1, 1))


def q_raster_pyramid(sf_dir: str):
    """3-level overview pyramid of 'holes' (gdaladdo 'average'): level 1
    is factor-2 pooling of the base tiles, levels 2/3 pool the PREVIOUS
    level's (cnt, sum) rows — one base scan total. Associative integer
    sums make level-from-level bit-identical to the SQL's
    level-from-base group-bys."""
    from ..stages.focal import pyramid_levels

    tiles, _arr, nodata = _tiles_ds("holes")
    return pyramid_levels(tiles, nodata, n_levels=3)


def q_raster_proximity(sf_dir: str):
    """Proximity raster (gdal_proximity shape): for each sampled pixel
    CENTER of 'holes', the nearest of the 600 fixture points and its
    squared euclidean distance — broadcast point set + per-actor grid
    index (the kNN ST3 shape), (d^2, id) tie-break. Pixel centers are
    dyadic floats and d^2 = dx*dx + dy*dy is the same IEEE chain as the
    SQL mirror, so the float64 output is bit-exact.
    (row*W + col) % 131 == 0 sample."""
    import ray.data  # noqa: F401  (tiles dataset already built by _tiles_ds)

    from ..stages.focal import sample_pixel_centers
    from ..stages.knn_points import knn_points

    tiles, arr, _nodata = _tiles_ds("holes")
    h, w = arr.shape
    x, y = query_points()
    ids = np.arange(len(x), dtype=np.int64)
    pix = sample_pixel_centers(tiles, h, w, 131)
    res = knn_points(pix, x, y, ids, k=1)

    def finalize(batch: pa.Table) -> pa.Table:
        q = batch["query_id"].to_numpy()
        return pa.table(
            {
                "row": pa.array(q // w, pa.int64()),
                "col": pa.array(q % w, pa.int64()),
                "near_id": batch["neighbor_id"],
                "d2": batch["distance_sq"],
            }
        )

    return res.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def q_points_density(sf_dir: str):
    """Point-density raster (rasterize-points): count of fixture points
    per 'holes' pixel cell — per-batch bincount partials over flat cell
    keys, one thin groupby merge, only non-empty cells emitted (sparse
    raster). Out-of-extent points are dropped."""
    import ray.data

    ensure_fixtures()
    x, y = query_points()
    pts = ray.data.from_arrow(
        pa.table(
            {
                "pt_id": pa.array(np.arange(len(x), dtype=np.int64), pa.int64()),
                "x": pa.array(x, pa.float64()),
                "y": pa.array(y, pa.float64()),
            }
        )
    )
    h, w = HOLES_H, HOLES_SHAPE_W

    def partials(batch: pa.Table) -> pa.Table:
        xs = batch["x"].to_numpy()
        ys = batch["y"].to_numpy()
        row = np.floor(float(h) - ys).astype(np.int64)
        col = np.floor(xs).astype(np.int64)
        keep = (row >= 0) & (row < h) & (col >= 0) & (col < w)
        keys = row[keep] * w + col[keep]
        uk, cnt = np.unique(keys, return_counts=True)
        return pa.table(
            {
                "k": pa.array(uk, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        k = int(group["k"][0].as_py())
        return pa.table(
            {
                "row": pa.array([k // w], pa.int64()),
                "col": pa.array([k % w], pa.int64()),
                "n_points": pa.array([int(np.sum(group["n"].to_numpy()))], pa.int64()),
            }
        )

    part = pts.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("k").map_groups(merge, batch_format="pyarrow")


def q_point_idw(sf_dir: str):
    """Inverse-distance-squared interpolation at 600 query points from
    the 600 valued fixture points (values = (pt_id*13) % 97), k=4 via
    the per-actor grid index. Queries are the reference points shifted
    by integer (+3, -7) — the shift cancels the fixture offsets, so some
    queries land EXACTLY on reference points and exercise the
    zero-distance short-circuit. Rank-ordered left-associated float
    accumulation makes the SQL pivot mirror bit-exact."""
    import ray.data

    from ..stages.knn_points import idw_points

    ensure_fixtures()
    x, y = query_points()
    ids = np.arange(len(x), dtype=np.int64)
    vals = ((ids * 13) % 97).astype(np.float64)
    queries = pa.table(
        {
            "pt_id": pa.array(ids, pa.int64()),
            "x": pa.array(x + 3, pa.float64()),
            "y": pa.array(y - 7, pa.float64()),
        }
    )
    return idw_points(ray.data.from_arrow(queries), x, y, ids, vals, k=4)


# ------------------------------------------------------------- SQL side


def _px(name: str) -> str:
    return f"read_parquet('{ORACLE_DIR}/pixels_{name}.parquet')"


def _zsql(zset: str) -> str:
    return (
        f"(SELECT zone_id, xmin, ymin, xmax, ymax FROM "
        f"read_parquet('{ORACLE_DIR}/rect_zones.parquet') WHERE zset = '{zset}')"
    )


def _center_join(zset: str, raster: str, h: int) -> str:
    """LEFT JOIN zones to pixels whose center lies inside the rectangle."""
    return f"""
j AS (
  SELECT z.zone_id, p.val, p.is_nodata
  FROM {_zsql(zset)} z
  LEFT JOIN {_px(raster)} p
    ON (p.col + 0.5) > z.xmin AND (p.col + 0.5) < z.xmax
   AND ({h} - p.row - 0.5) > z.ymin AND ({h} - p.row - 0.5) < z.ymax
)"""


_AGG = """
agg AS (
  SELECT zone_id,
         count(CASE WHEN NOT is_nodata THEN 1 END) AS cnt,
         sum(CASE WHEN NOT is_nodata THEN val END) AS s,
         sum(CASE WHEN NOT is_nodata THEN val * val END) AS sq,
         min(CASE WHEN NOT is_nodata THEN val END) AS mn,
         max(CASE WHEN NOT is_nodata THEN val END) AS mx,
         median(CASE WHEN NOT is_nodata THEN val END) AS med,
         coalesce(sum(CASE WHEN is_nodata THEN 1 END), 0) AS nod
  FROM j GROUP BY zone_id
)"""


SQL_ZONAL_TILED = f"""
WITH {_center_join("main", "holes", HOLES_H)},
{_AGG}
SELECT zone_id, cnt AS "count", mn AS "min", mx AS "max",
       s / cnt AS mean, s AS "sum",
       CASE WHEN cnt = 0 THEN NULL
            ELSE sqrt(greatest(sq / cnt - (s / cnt) * (s / cnt), 0.0)) END AS std,
       med AS median,
       CAST(nod AS DOUBLE) AS nodata
FROM agg
"""


SQL_ZONAL_BROADCAST = f"""
WITH {_center_join("main", "holes", HOLES_H)},
{_AGG}
SELECT zone_id, cnt AS "count", mn AS "min", mx AS "max",
       s / cnt AS mean, s AS "sum",
       CASE WHEN cnt = 0 THEN NULL
            ELSE sqrt(greatest(sq / cnt - (s / cnt) * (s / cnt), 0.0)) END AS std,
       med AS median,
       CAST(nod AS DOUBLE) AS nodata,
       mx - mn AS range
FROM agg
"""


SQL_ZONAL_ALL_TOUCHED = f"""
WITH j AS (
  SELECT z.zone_id, p.val, p.is_nodata
  FROM {_zsql("main")} z
  LEFT JOIN {_px("holes")} p
    ON (p.col + 1) > z.xmin AND p.col < z.xmax
   AND ({HOLES_H} - p.row) > z.ymin AND ({HOLES_H} - p.row - 1) < z.ymax
),
{_AGG}
SELECT zone_id, cnt AS "count", mn AS "min", mx AS "max",
       CAST(nod AS DOUBLE) AS nodata
FROM agg
"""


SQL_ZONAL_CATEGORICAL = f"""
WITH {_center_join("cat", "classes", CLASSES_H)},
vc AS (
  SELECT zone_id, val, count(*) AS cnt FROM j
  WHERE is_nodata = false GROUP BY zone_id, val
),
maj AS (
  SELECT zone_id, val,
         row_number() OVER (PARTITION BY zone_id ORDER BY cnt DESC, val ASC) AS rk
  FROM vc
),
mnr AS (
  SELECT zone_id, val,
         row_number() OVER (PARTITION BY zone_id ORDER BY cnt ASC, val ASC) AS rk
  FROM vc
),
uq AS (SELECT zone_id, CAST(count(*) AS BIGINT) AS u FROM vc GROUP BY zone_id),
{_AGG}
SELECT a.zone_id, a.cnt AS "count",
       m1.val AS majority, m2.val AS minority,
       uq.u AS "unique", a.med AS median
FROM agg a
LEFT JOIN (SELECT zone_id, val FROM maj WHERE rk = 1) m1 ON m1.zone_id = a.zone_id
LEFT JOIN (SELECT zone_id, val FROM mnr WHERE rk = 1) m2 ON m2.zone_id = a.zone_id
LEFT JOIN uq ON uq.zone_id = a.zone_id
"""


SQL_ZONAL_HISTOGRAM = f"""
WITH {_center_join("cat", "classes", CLASSES_H)}
SELECT zone_id, val, CAST(count(*) AS BIGINT) AS cnt
FROM j WHERE is_nodata = false
GROUP BY zone_id, val
"""


SQL_ZONAL_AUTO = f"""
WITH {_center_join("auto", "holes", HOLES_H)},
{_AGG}
SELECT zone_id, cnt AS "count", s / cnt AS mean, s AS "sum",
       CAST(nod AS DOUBLE) AS nodata
FROM agg
"""


SQL_ZONAL_EDGE = f"""
WITH {_center_join("edge", "holes", HOLES_H)},
{_AGG}
SELECT zone_id, cnt AS "count", mn AS "min", mx AS "max",
       s / cnt AS mean, s AS "sum"
FROM agg
"""


SQL_ZONAL_UDFS = f"""
WITH {_center_join("main", "holes", HOLES_H)},
agg AS (
  SELECT zone_id,
         count(CASE WHEN NOT is_nodata THEN 1 END) AS cnt,
         sum(CASE WHEN NOT is_nodata THEN val END) AS s,
         count(val) AS mask_px
  FROM j GROUP BY zone_id
)
SELECT zone_id, cnt AS "count", s / cnt AS udf_mean,
       CAST(mask_px AS DOUBLE) AS udf_mask_px
FROM agg
"""


def _irregular_sql(zset: str) -> str:
    """Closed-form SQL for IRREGULAR polygon zones: membership is derived
    by even-odd edge-crossing parity at pixel centers over the
    generator-written vertex table — the engine's rasterizer is NOT in
    the loop (it used to write an exploded membership parquet; now both
    sides compute the mask independently).

    Mirrors ``_fill_polygon_evenodd`` exactly (single-polygon zones):
    pixel (r, c) is inside iff the count of ring edges crossing the
    horizontal line y = H - r - 0.5 at x <= c + 0.5 is odd, with the
    half-open rule (y0 < cy) != (y1 < cy). Fixture jitter keeps vertices
    off pixel-center ordinates, so strict-vs-nonstrict never bites.
    The window enumerated per zone replicates ``bounds_window`` (floor on
    (w, n), ceil on (e, s)); beyond-extent pixels fail the LEFT JOIN to
    the pixel table and count as boundless nodata fill, matching the
    engine's boundless_array semantics."""
    h = HOLES_H
    return f"""
WITH v AS (
  SELECT zone_id, ring_idx, vertex_idx, x, y
  FROM read_parquet('{ORACLE_DIR}/irregular_vertices.parquet')
  WHERE zset = '{zset}'
),
edges AS (
  SELECT a.zone_id, a.x AS x0, a.y AS y0, b.x AS x1, b.y AS y1
  FROM v a JOIN v b
    ON a.zone_id = b.zone_id AND a.ring_idx = b.ring_idx
   AND b.vertex_idx = a.vertex_idx + 1
),
bb AS (
  SELECT zone_id, min(x) AS xmin, min(y) AS ymin, max(x) AS xmax, max(y) AS ymax
  FROM v GROUP BY zone_id
),
series AS (SELECT range AS i FROM range(-256, 1024)),
cells AS (
  SELECT bb.zone_id, r.i AS row, c.i AS col
  FROM bb
  JOIN series r ON r.i >= CAST(floor({h} - bb.ymax) AS BIGINT)
               AND r.i <  CAST(ceil({h} - bb.ymin) AS BIGINT)
  JOIN series c ON c.i >= CAST(floor(bb.xmin) AS BIGINT)
               AND c.i <  CAST(ceil(bb.xmax) AS BIGINT)
),
inside AS (
  SELECT cl.zone_id, cl.row, cl.col
  FROM cells cl JOIN edges e ON e.zone_id = cl.zone_id
  WHERE ((e.y0 < ({h} - cl.row - 0.5)) != (e.y1 < ({h} - cl.row - 0.5)))
    AND e.x0 + (({h} - cl.row - 0.5) - e.y0) * (e.x1 - e.x0) / (e.y1 - e.y0)
        <= (cl.col + 0.5)
  GROUP BY cl.zone_id, cl.row, cl.col
  HAVING count(*) % 2 = 1
),
m AS (
  SELECT i.zone_id, p.val, coalesce(p.is_nodata, TRUE) AS is_nodata
  FROM inside i
  LEFT JOIN {_px("holes")} p ON p.row = i.row AND p.col = i.col
),
z AS (
  SELECT zone_id FROM read_parquet('{ORACLE_DIR}/irregular_zones.parquet')
  WHERE zset = '{zset}'
),
j AS (SELECT z.zone_id, m.val, m.is_nodata FROM z LEFT JOIN m ON m.zone_id = z.zone_id),
{_AGG}
SELECT zone_id, cnt AS "count", mn AS "min", mx AS "max",
       s / cnt AS mean, s AS "sum",
       CASE WHEN cnt = 0 THEN NULL
            ELSE sqrt(greatest(sq / cnt - (s / cnt) * (s / cnt), 0.0)) END AS std,
       med AS median,
       CAST(nod AS DOUBLE) AS nodata
FROM agg
"""


SQL_ZONAL_IRREGULAR_TILED = _irregular_sql("tiled")
SQL_ZONAL_IRREGULAR_BROADCAST = _irregular_sql("broadcast")


# 3x3 focal mean: 9-offset hash join (not a range join) over the exploded
# pixels; LEFT JOIN keeps all-nodata neighborhoods as (NULL sum, 0 cnt).
# p is pre-filtered to the sampled pixels (incl. nodata centers: the
# engine emits every in-raster pixel).
SQL_RASTER_FOCAL_MEAN = f"""
WITH offs AS (
  SELECT r.range AS dr, c.range AS dc
  FROM range(-1, 2) r CROSS JOIN range(-1, 2) c
),
p AS (
  SELECT row, col FROM {_px("holes")}
  WHERE (row * {HOLES_SHAPE_W} + col) % 97 = 0
),
n AS (
  SELECT p.row, p.col, sum(q.val) AS fsum, count(q.val) AS fcnt
  FROM p CROSS JOIN offs o
  LEFT JOIN (SELECT row, col, val FROM {_px("holes")} WHERE NOT is_nodata) q
    ON q.row = p.row + o.dr AND q.col = p.col + o.dc
  GROUP BY p.row, p.col
)
SELECT row, col, fsum, CAST(fcnt AS BIGINT) AS fcnt,
       CASE WHEN fcnt = 0 THEN NULL ELSE fsum / fcnt END AS fmean
FROM n
"""


# Horn slope: 9-offset WEIGHTED join — wx = dc * (2 - |dr|), wy =
# dr * (2 - |dc|) reproduce the [[ -1 0 1 ] [ -2 0 2 ] [ -1 0 1 ]]
# kernels. fcnt = 9 requires every window cell in-raster AND valid,
# which is exactly the engine's full-window rule (borders -> null).
# The slope expression is the same left-associated IEEE chain as the
# engine: sqrt(double(gx^2+gy^2)) / 8 * 100 with cellsize 1.
SQL_RASTER_SLOPE = f"""
WITH offs AS (
  SELECT r.range AS dr, c.range AS dc,
         c.range * (2 - abs(r.range)) AS wx,
         r.range * (2 - abs(c.range)) AS wy
  FROM range(-1, 2) r CROSS JOIN range(-1, 2) c
),
p AS (
  SELECT row, col FROM {_px("holes")}
  WHERE (row * {HOLES_SHAPE_W} + col) % 101 = 0
),
n AS (
  SELECT p.row, p.col,
         sum(o.wx * q.val) AS gx, sum(o.wy * q.val) AS gy,
         count(q.val) AS fcnt
  FROM p CROSS JOIN offs o
  LEFT JOIN (SELECT row, col, val FROM {_px("holes")} WHERE NOT is_nodata) q
    ON q.row = p.row + o.dr AND q.col = p.col + o.dc
  GROUP BY p.row, p.col
)
SELECT row, col,
       CASE WHEN fcnt = 9 THEN CAST(gx AS BIGINT) END AS gx,
       CASE WHEN fcnt = 9 THEN CAST(gy AS BIGINT) END AS gy,
       CASE WHEN fcnt = 9
            THEN sqrt(CAST(gx * gx + gy * gy AS DOUBLE)) / 8 * 100 END AS slope_pct
FROM n
"""


# TRI/TPI/roughness: the 9-offset join with the center value carried
# through the group — integer numerators, one divide-by-8 each, extrema
# over the full window; fcnt < 9 (border / nodata-adjacent) -> null.
SQL_RASTER_TERRAIN = f"""
WITH offs AS (
  SELECT r.range AS dr, c.range AS dc
  FROM range(-1, 2) r CROSS JOIN range(-1, 2) c
),
p AS (
  SELECT row, col, val FROM {_px("holes")}
  WHERE (row * {HOLES_SHAPE_W} + col) % 89 = 0
),
n AS (
  SELECT p.row, p.col,
         count(q.val) AS fcnt,
         sum(CASE WHEN NOT (o.dr = 0 AND o.dc = 0)
                  THEN abs(p.val - q.val) END) AS tri_num,
         sum(CASE WHEN NOT (o.dr = 0 AND o.dc = 0) THEN q.val END) AS nsum,
         min(q.val) AS tmin, max(q.val) AS tmax
  FROM p CROSS JOIN offs o
  LEFT JOIN (SELECT row, col, val FROM {_px("holes")} WHERE NOT is_nodata) q
    ON q.row = p.row + o.dr AND q.col = p.col + o.dc
  GROUP BY p.row, p.col, p.val
)
SELECT n.row, n.col,
       CASE WHEN fcnt = 9 THEN CAST(tri_num AS DOUBLE) / 8 END AS tri,
       CASE WHEN fcnt = 9 THEN CAST(8 * p.val - nsum AS DOUBLE) / 8 END AS tpi,
       CASE WHEN fcnt = 9 THEN CAST(tmax - tmin AS BIGINT) END AS roughness
FROM n JOIN p ON p.row = n.row AND p.col = n.col
"""


# 5x5 focal min/max: the same offset-join shape with extrema aggregates;
# all-invalid neighborhoods keep fcnt 0 -> null extrema.
SQL_RASTER_FOCAL_MINMAX = f"""
WITH offs AS (
  SELECT r.range AS dr, c.range AS dc
  FROM range(-2, 3) r CROSS JOIN range(-2, 3) c
),
p AS (
  SELECT row, col FROM {_px("holes")}
  WHERE (row * {HOLES_SHAPE_W} + col) % 103 = 0
),
n AS (
  SELECT p.row, p.col,
         min(q.val) AS fmin, max(q.val) AS fmax, count(q.val) AS fcnt
  FROM p CROSS JOIN offs o
  LEFT JOIN (SELECT row, col, val FROM {_px("holes")} WHERE NOT is_nodata) q
    ON q.row = p.row + o.dr AND q.col = p.col + o.dc
  GROUP BY p.row, p.col
)
SELECT row, col,
       CAST(fmin AS DOUBLE) AS fmin,
       CAST(fmax AS DOUBLE) AS fmax,
       CAST(fcnt AS BIGINT) AS fcnt
FROM n
"""


# D8 flow direction: candidate strictly-lower valid neighbors ranked by
# the integer descent metric (mult * drop^2 encodes drop/dist exactly
# for dist 1 vs sqrt(2)), tie-broken by fixed priority; pixels with no
# candidate (pits, all-nodata rings) coalesce to 0.
SQL_RASTER_D8_FLOW = f"""
WITH offs AS (
  SELECT * FROM (VALUES
    (0, 1, 1, 2, 1), (1, 1, 2, 1, 2), (1, 0, 4, 2, 3), (1, -1, 8, 1, 4),
    (0, -1, 16, 2, 5), (-1, -1, 32, 1, 6), (-1, 0, 64, 2, 7), (-1, 1, 128, 1, 8)
  ) AS t(dr, dc, code, mult, prio)
),
p AS (
  SELECT row, col, val FROM {_px("holes")}
  WHERE NOT is_nodata AND (row * {HOLES_SHAPE_W} + col) % 107 = 0
),
cand AS (
  SELECT p.row, p.col, o.code, o.prio,
         o.mult * CAST(p.val - q.val AS BIGINT) * CAST(p.val - q.val AS BIGINT) AS m
  FROM p CROSS JOIN offs o
  JOIN (SELECT row, col, val FROM {_px("holes")} WHERE NOT is_nodata) q
    ON q.row = p.row + o.dr AND q.col = p.col + o.dc
  WHERE q.val < p.val
),
best AS (
  SELECT row, col, code,
         row_number() OVER (PARTITION BY row, col ORDER BY m DESC, prio) AS rk
  FROM cand
)
SELECT p.row, p.col, CAST(coalesce(b.code, 0) AS BIGINT) AS d8
FROM p LEFT JOIN best b ON b.row = p.row AND b.col = p.col AND b.rk = 1
"""


# Flow-path trace: the D8 derivation of SQL_RASTER_D8_FLOW over EVERY
# valid pixel, then a recursive CTE walks each seed one hop at a time
# (pits produce no step row, terminating the branch); the terminal is
# the max-steps row per seed. Acyclic by strict integer descent.
SQL_RASTER_FLOW_TRACE = f"""
WITH RECURSIVE offs AS (
  SELECT * FROM (VALUES
    (0, 1, 1, 2, 1), (1, 1, 2, 1, 2), (1, 0, 4, 2, 3), (1, -1, 8, 1, 4),
    (0, -1, 16, 2, 5), (-1, -1, 32, 1, 6), (-1, 0, 64, 2, 7), (-1, 1, 128, 1, 8)
  ) AS t(dr, dc, code, mult, prio)
),
valid AS (SELECT row, col, val FROM {_px("holes")} WHERE NOT is_nodata),
cand AS (
  SELECT p.row, p.col, o.dr, o.dc,
         o.mult * CAST(p.val - q.val AS BIGINT) * CAST(p.val - q.val AS BIGINT) AS m,
         o.prio
  FROM valid p CROSS JOIN offs o
  JOIN valid q ON q.row = p.row + o.dr AND q.col = p.col + o.dc
  WHERE q.val < p.val
),
step AS (
  SELECT row, col, dr, dc FROM (
    SELECT row, col, dr, dc,
           row_number() OVER (PARTITION BY row, col ORDER BY m DESC, prio) AS rk
    FROM cand
  ) WHERE rk = 1
),
walk(srow, scol, crow, ccol, steps) AS (
  SELECT row, col, row, col, CAST(0 AS BIGINT)
  FROM valid WHERE (row * {HOLES_SHAPE_W} + col) % 211 = 0
  UNION ALL
  SELECT w.srow, w.scol, w.crow + s.dr, w.ccol + s.dc, w.steps + 1
  FROM walk w JOIN step s ON s.row = w.crow AND s.col = w.ccol
),
final AS (
  SELECT srow, scol, crow, ccol, steps,
         row_number() OVER (PARTITION BY srow, scol ORDER BY steps DESC) AS rk
  FROM walk
)
SELECT srow AS row, scol AS col, steps, crow AS term_row, ccol AS term_col
FROM final WHERE rk = 1
"""


CLASSES_W = 384


# Focal std: the focal-mean join shape with a second moment; the final
# expression is the identical left-associated IEEE chain as the engine.
SQL_RASTER_FOCAL_STD = f"""
WITH offs AS (
  SELECT r.range AS dr, c.range AS dc
  FROM range(-2, 3) r CROSS JOIN range(-2, 3) c
),
p AS (
  SELECT row, col FROM {_px("holes")}
  WHERE (row * {HOLES_SHAPE_W} + col) % 149 = 0
),
n AS (
  SELECT p.row, p.col,
         sum(q.val) AS fsum, sum(q.val * q.val) AS fsq, count(q.val) AS fcnt
  FROM p CROSS JOIN offs o
  LEFT JOIN (SELECT row, col, val FROM {_px("holes")} WHERE NOT is_nodata) q
    ON q.row = p.row + o.dr AND q.col = p.col + o.dc
  GROUP BY p.row, p.col
)
SELECT row, col, fsum, fsq, CAST(fcnt AS BIGINT) AS fcnt,
       CASE WHEN fcnt = 0 THEN NULL
            ELSE sqrt(greatest(fsq / fcnt - (fsum / fcnt) * (fsum / fcnt), 0.0))
       END AS fstd
FROM n
"""


# Exact quantiles from the distinct-value histogram: smallest value
# whose cumulative count reaches ceil(q*n) (pure integer arithmetic).
SQL_RASTER_QUANTILES = f"""
WITH h AS (
  SELECT CAST(val AS BIGINT) AS v, count(*) AS c
  FROM {_px("holes")} WHERE NOT is_nodata GROUP BY v
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
cum AS (SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cc FROM h),
qs AS (SELECT * FROM (VALUES (250), (500), (900)) AS t(qm)),
sel AS (
  SELECT q.qm, c.v, c.cc,
         row_number() OVER (PARTITION BY q.qm ORDER BY c.v) AS rk
  FROM qs q CROSS JOIN tot t
  JOIN cum c ON c.cc >= greatest((CAST(q.qm AS BIGINT) * t.n + 999) // 1000, 1)
)
SELECT CAST(qm AS BIGINT) AS q_millis, v AS value, cc AS cum_count,
       (SELECT n FROM tot) AS n_valid
FROM sel WHERE rk = 1
"""


# Contour crossings: adjacent-pixel self-joins (right and down), strict
# straddle predicate, one CAST-to-DOUBLE divide — the engine's exact
# expression.
SQL_RASTER_CONTOUR = f"""
WITH v AS (
  SELECT row, col, val FROM {_px("holes")} WHERE NOT is_nodata
),
own AS (
  SELECT * FROM v WHERE (row * {HOLES_SHAPE_W} + col) % 13 = 0
),
lvls AS (SELECT * FROM (VALUES (30), (70)) l(lv)),
pairs AS (
  SELECT a.row, a.col, 0 AS dir, a.val AS av, b.val AS bv
  FROM own a JOIN v b ON b.row = a.row AND b.col = a.col + 1
  UNION ALL
  SELECT a.row, a.col, 1 AS dir, a.val AS av, b.val AS bv
  FROM own a JOIN v b ON b.row = a.row + 1 AND b.col = a.col
)
SELECT CAST(l.lv AS BIGINT) AS level, p.row, p.col, CAST(p.dir AS BIGINT) AS dir,
       CAST(l.lv - p.av AS DOUBLE) / (p.bv - p.av) AS t
FROM pairs p CROSS JOIN lvls l
WHERE (p.av < l.lv) != (p.bv < l.lv)
"""


# Cost distance: recursive-CTE BFS over the passable-pixel graph (the
# 4 neighbor offsets as an equi-join); UNION-distinct (row, col, d) rows
# with d capped at 120 (true max is 86 — measured, engine-independent);
# min(d) per pixel, LEFT JOIN keeps unreachable pixels as null.
SQL_RASTER_COST_DISTANCE = f"""
WITH RECURSIVE px AS (
  SELECT row, col FROM {_px("holes")}
  WHERE NOT is_nodata AND CAST(val AS BIGINT) % 7 != 0
    AND row < 96 AND col < 96
),
offs AS (SELECT * FROM (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) o(dr, dc)),
seeds AS (SELECT * FROM (VALUES (5, 7), (60, 80), (90, 15)) s(r, c)),
bfs AS (
  SELECT p.row, p.col, 0 AS d
  FROM px p JOIN seeds s ON p.row = s.r AND p.col = s.c
  UNION
  SELECT p.row, p.col, b.d + 1
  FROM bfs b
  JOIN offs o ON true
  JOIN px p ON p.row = b.row + o.dr AND p.col = b.col + o.dc
  WHERE b.d < 120
)
SELECT p.row, p.col, CAST(min(b.d) AS BIGINT) AS dist
FROM px p LEFT JOIN bfs b ON b.row = p.row AND b.col = p.col
GROUP BY p.row, p.col
"""


# Focal median: the 5x5 offset join with DuckDB's interpolating
# median() — identical to the engine's (m1 + m2) / 2.0 rule.
SQL_RASTER_FOCAL_MEDIAN = f"""
WITH offs AS (
  SELECT r.range AS dr, c.range AS dc
  FROM range(-2, 3) r CROSS JOIN range(-2, 3) c
),
p AS (
  SELECT row, col FROM {_px("holes")}
  WHERE (row * {HOLES_SHAPE_W} + col) % 113 = 0
),
n AS (
  SELECT p.row, p.col, median(q.val) AS fmed, count(q.val) AS fcnt
  FROM p CROSS JOIN offs o
  LEFT JOIN (SELECT row, col, val FROM {_px("holes")} WHERE NOT is_nodata) q
    ON q.row = p.row + o.dr AND q.col = p.col + o.dc
  GROUP BY p.row, p.col
)
SELECT row, col, CAST(fmed AS DOUBLE) AS fmed, CAST(fcnt AS BIGINT) AS fcnt
FROM n
"""


# Crosstab: aligned-pixel equi-join, both-valid filter, GROUP BY the
# value pair.
SQL_RASTER_CROSSTAB = f"""
SELECT CAST(a.val AS BIGINT) AS val_a, CAST(b.val AS BIGINT) AS val_b,
       count(*) AS n_px
FROM {_px("holes")} a
JOIN {_px("terrain")} b ON b.row = a.row AND b.col = a.col
WHERE NOT a.is_nodata AND NOT b.is_nodata
GROUP BY val_a, val_b
"""


# Cost allocation: the BFS CTE additionally carries the seed index; the
# composite min(d * 3 + sid) decodes to (dist, nearest seed) with the
# engine's exact tie-break.
SQL_RASTER_COST_ALLOC = f"""
WITH RECURSIVE px AS (
  SELECT row, col FROM {_px("holes")}
  WHERE NOT is_nodata AND CAST(val AS BIGINT) % 7 != 0
    AND row < 96 AND col < 96
),
offs AS (SELECT * FROM (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) o(dr, dc)),
seeds AS (SELECT * FROM (VALUES (5, 7, 0), (60, 80, 1), (90, 15, 2)) s(r, c, sid)),
bfs AS (
  SELECT p.row, p.col, 0 AS d, s.sid
  FROM px p JOIN seeds s ON p.row = s.r AND p.col = s.c
  UNION
  SELECT p.row, p.col, b.d + 1, b.sid
  FROM bfs b
  JOIN offs o ON true
  JOIN px p ON p.row = b.row + o.dr AND p.col = b.col + o.dc
  WHERE b.d < 120
)
SELECT p.row, p.col,
       CAST(min(b.d * 3 + b.sid) // 3 AS BIGINT) AS dist,
       CAST(min(b.d * 3 + b.sid) % 3 AS BIGINT) AS seed
FROM px p LEFT JOIN bfs b ON b.row = p.row AND b.col = p.col
GROUP BY p.row, p.col
"""


# Focal majority: per (pixel, value) neighbor counts via the 9-offset
# join, rank (cnt DESC, val ASC) — the smallest-value tie-break.
SQL_RASTER_MAJORITY = f"""
WITH offs AS (
  SELECT r.range AS dr, c.range AS dc
  FROM range(-1, 2) r CROSS JOIN range(-1, 2) c
),
p AS (
  SELECT row, col FROM {_px("classes")}
  WHERE (row * {CLASSES_W} + col) % 137 = 0
),
n AS (
  SELECT p.row, p.col, CAST(q.val AS BIGINT) AS v, count(*) AS cnt
  FROM p CROSS JOIN offs o
  JOIN (SELECT row, col, val FROM {_px("classes")} WHERE NOT is_nodata) q
    ON q.row = p.row + o.dr AND q.col = p.col + o.dc
  GROUP BY p.row, p.col, v
),
best AS (
  SELECT row, col, v, cnt,
         row_number() OVER (PARTITION BY row, col ORDER BY cnt DESC, v) AS rk,
         sum(cnt) OVER (PARTITION BY row, col) AS fcnt
  FROM n
)
SELECT p.row, p.col, b.v AS maj_val, b.cnt AS maj_cnt,
       CAST(coalesce(b.fcnt, 0) AS BIGINT) AS fcnt
FROM p LEFT JOIN best b ON b.row = p.row AND b.col = p.col AND b.rk = 1
"""


# Reclassify: LEFT JOIN to the VALUES map; unmapped or nodata -> null.
SQL_RASTER_RECLASS = f"""
WITH m AS (
  SELECT * FROM (VALUES (1, 10.0), (2, 20.0), (3, -5.0), (4, 40.0)) AS t(v, outv)
)
SELECT p.row, p.col,
       CASE WHEN NOT p.is_nodata THEN m.outv END AS value
FROM {_px("classes")} p
LEFT JOIN m ON m.v = CAST(p.val AS BIGINT)
WHERE (p.row * {CLASSES_W} + p.col) % 139 = 0
"""


# Aspect: the slope join derives gx/gy, then the best-projection rank
# over the 8 compass directions — proj = -(gx*dc + gy*dr), metric
# mult*proj^2, positive projections only, priority tie-break; flat -> 0.
SQL_RASTER_ASPECT = f"""
WITH offs AS (
  SELECT * FROM (VALUES
    (0, 1, 1, 2, 1), (1, 1, 2, 1, 2), (1, 0, 4, 2, 3), (1, -1, 8, 1, 4),
    (0, -1, 16, 2, 5), (-1, -1, 32, 1, 6), (-1, 0, 64, 2, 7), (-1, 1, 128, 1, 8)
  ) AS t(dr, dc, code, mult, prio)
),
woffs AS (
  SELECT r.range AS dr, c.range AS dc,
         c.range * (2 - abs(r.range)) AS wx,
         r.range * (2 - abs(c.range)) AS wy
  FROM range(-1, 2) r CROSS JOIN range(-1, 2) c
),
p AS (
  SELECT row, col FROM {_px("holes")}
  WHERE (row * {HOLES_SHAPE_W} + col) % 113 = 0
),
n AS (
  SELECT p.row, p.col,
         sum(o.wx * q.val) AS gx, sum(o.wy * q.val) AS gy,
         count(q.val) AS fcnt
  FROM p CROSS JOIN woffs o
  LEFT JOIN (SELECT row, col, val FROM {_px("holes")} WHERE NOT is_nodata) q
    ON q.row = p.row + o.dr AND q.col = p.col + o.dc
  GROUP BY p.row, p.col
),
cand AS (
  SELECT n.row, n.col, o.code, o.prio,
         o.mult * CAST(-(n.gx * o.dc + n.gy * o.dr) AS BIGINT)
                * CAST(-(n.gx * o.dc + n.gy * o.dr) AS BIGINT) AS m
  FROM n CROSS JOIN offs o
  WHERE n.fcnt = 9 AND -(n.gx * o.dc + n.gy * o.dr) > 0
),
best AS (
  SELECT row, col, code,
         row_number() OVER (PARTITION BY row, col ORDER BY m DESC, prio) AS rk
  FROM cand
)
SELECT n.row, n.col,
       CASE WHEN n.fcnt = 9 THEN CAST(n.gx AS BIGINT) END AS gx,
       CASE WHEN n.fcnt = 9 THEN CAST(n.gy AS BIGINT) END AS gy,
       CASE WHEN n.fcnt = 9 THEN CAST(coalesce(b.code, 0) AS BIGINT) END AS aspect_d8
FROM n LEFT JOIN best b ON b.row = n.row AND b.col = n.col AND b.rk = 1
"""


# Flow accumulation: the walk CTE from EVERY valid pixel (not just
# seeds); each path visits a pixel at most once (acyclic), so the visit
# count per position IS the accumulation. ~6M walk rows at 512^2.
SQL_RASTER_FLOW_ACC = f"""
WITH RECURSIVE offs AS (
  SELECT * FROM (VALUES
    (0, 1, 1, 2, 1), (1, 1, 2, 1, 2), (1, 0, 4, 2, 3), (1, -1, 8, 1, 4),
    (0, -1, 16, 2, 5), (-1, -1, 32, 1, 6), (-1, 0, 64, 2, 7), (-1, 1, 128, 1, 8)
  ) AS t(dr, dc, code, mult, prio)
),
valid AS (SELECT row, col, val FROM {_px("holes")} WHERE NOT is_nodata),
cand AS (
  SELECT p.row, p.col, o.dr, o.dc,
         o.mult * CAST(p.val - q.val AS BIGINT) * CAST(p.val - q.val AS BIGINT) AS m,
         o.prio
  FROM valid p CROSS JOIN offs o
  JOIN valid q ON q.row = p.row + o.dr AND q.col = p.col + o.dc
  WHERE q.val < p.val
),
step AS (
  SELECT row, col, dr, dc FROM (
    SELECT row, col, dr, dc,
           row_number() OVER (PARTITION BY row, col ORDER BY m DESC, prio) AS rk
    FROM cand
  ) WHERE rk = 1
),
walk(crow, ccol) AS (
  SELECT row, col FROM valid
  UNION ALL
  SELECT w.crow + s.dr, w.ccol + s.dc
  FROM walk w JOIN step s ON s.row = w.crow AND s.col = w.ccol
)
SELECT crow AS row, ccol AS col, count(*) AS acc
FROM walk
WHERE (crow * {HOLES_SHAPE_W} + ccol) % 173 = 0
GROUP BY crow, ccol
"""


# Bilinear warp: integer fixed-point corner weights (my = (row*8+1) % 7,
# mx = (col*9+2) % 8), four coordinate LEFT JOINs, zero-weight neighbors
# exempt from the validity rule, one divide by 56 — the same int64
# expression tree as the engine kernel.
SQL_RASTER_WARP_BILINEAR = f"""
WITH og AS (
  SELECT r.range AS row, c.range AS col
  FROM range(0, 600) r CROSS JOIN range(0, 500) c
  WHERE (r.range * 500 + c.range) % 127 = 0
),
m AS (
  SELECT row, col,
         CAST(floor((row * 8 + 1) / 7) AS BIGINT) AS i0,
         (row * 8 + 1) % 7 AS my,
         CAST(floor((col * 9 + 2) / 8) AS BIGINT) AS j0,
         (col * 9 + 2) % 8 AS mx
  FROM og
),
v AS (
  SELECT m.*,
         q00.val AS v00, q00.is_nodata AS n00,
         q01.val AS v01, q01.is_nodata AS n01,
         q10.val AS v10, q10.is_nodata AS n10,
         q11.val AS v11, q11.is_nodata AS n11
  FROM m
  LEFT JOIN {_px("holes")} q00 ON q00.row = m.i0 AND q00.col = m.j0
  LEFT JOIN {_px("holes")} q01 ON q01.row = m.i0 AND q01.col = m.j0 + 1
  LEFT JOIN {_px("holes")} q10 ON q10.row = m.i0 + 1 AND q10.col = m.j0
  LEFT JOIN {_px("holes")} q11 ON q11.row = m.i0 + 1 AND q11.col = m.j0 + 1
)
SELECT row, col,
  CASE WHEN (v00 IS NOT NULL AND NOT n00)
        AND (mx = 0 OR (v01 IS NOT NULL AND NOT n01))
        AND (my = 0 OR (v10 IS NOT NULL AND NOT n10))
        AND (my = 0 OR mx = 0 OR (v11 IS NOT NULL AND NOT n11))
  THEN CAST((7 - my) * ((8 - mx) * CAST(v00 AS BIGINT)
                        + mx * CAST(coalesce(v01, 0) AS BIGINT))
            + my * ((8 - mx) * CAST(coalesce(v10, 0) AS BIGINT)
                    + mx * CAST(coalesce(v11, 0) AS BIGINT)) AS DOUBLE) / 56
  END AS value
FROM v
"""


# Hillshade: the slope 9-offset weighted join derives the same integer
# gx/gy, then the identical left-associated IEEE chain — integer
# numerator gx + gy + 8 (light (-1,-1,1)), two correctly-rounded
# sqrt/divides, greatest(..., 0) clamp.
SQL_RASTER_HILLSHADE = f"""
WITH offs AS (
  SELECT r.range AS dr, c.range AS dc,
         c.range * (2 - abs(r.range)) AS wx,
         r.range * (2 - abs(c.range)) AS wy
  FROM range(-1, 2) r CROSS JOIN range(-1, 2) c
),
p AS (
  SELECT row, col FROM {_px("holes")}
  WHERE (row * {HOLES_SHAPE_W} + col) % 109 = 0
),
n AS (
  SELECT p.row, p.col,
         sum(o.wx * q.val) AS gx, sum(o.wy * q.val) AS gy,
         count(q.val) AS fcnt
  FROM p CROSS JOIN offs o
  LEFT JOIN (SELECT row, col, val FROM {_px("holes")} WHERE NOT is_nodata) q
    ON q.row = p.row + o.dr AND q.col = p.col + o.dc
  GROUP BY p.row, p.col
)
SELECT row, col,
       CASE WHEN fcnt = 9 THEN CAST(gx + gy + 8 AS BIGINT) END AS hs_num,
       CASE WHEN fcnt = 9
            THEN greatest(CAST(gx + gy + 8 AS DOUBLE)
                          / sqrt(CAST(gx * gx + gy * gy + 64 AS DOUBLE))
                          / sqrt(3.0), 0.0) END AS shade
FROM n
"""


def _pyramid_level_sql(level: int) -> str:
    f = 2 ** level
    return f"""
SELECT CAST({level} AS BIGINT) AS level,
       CAST(floor(row / {f}) AS BIGINT) AS crow,
       CAST(floor(col / {f}) AS BIGINT) AS ccol,
       count(CASE WHEN NOT is_nodata THEN 1 END) AS cnt,
       sum(CASE WHEN NOT is_nodata THEN val END) AS "sum",
       sum(CASE WHEN NOT is_nodata THEN val END)
         / count(CASE WHEN NOT is_nodata THEN 1 END) AS mean
FROM {_px("holes")}
GROUP BY crow, ccol"""


# every level recomputed straight from the base pixels — the engine's
# level-from-level pooling must agree because integer sums associate.
SQL_RASTER_PYRAMID = "\nUNION ALL\n".join(
    _pyramid_level_sql(lv) for lv in (1, 2, 3)
)


# proximity: every sampled in-raster pixel center (nodata centers too —
# proximity is geometric) against all fixture points; (d2, pt_id) rank.
SQL_RASTER_PROXIMITY = f"""
WITH pts AS (
  SELECT pt_id, x, y FROM read_parquet('{ORACLE_DIR}/query_points.parquet')
),
p AS (
  SELECT row, col,
         CAST(col AS DOUBLE) + 0.5 AS px,
         (CAST({HOLES_H} AS DOUBLE) - CAST(row AS DOUBLE)) - 0.5 AS py
  FROM {_px("holes")}
  WHERE (row * {HOLES_SHAPE_W} + col) % 131 = 0
),
cand AS (
  SELECT p.row, p.col, pts.pt_id,
         (pts.x - p.px) * (pts.x - p.px) + (pts.y - p.py) * (pts.y - p.py) AS d2
  FROM p CROSS JOIN pts
),
best AS (
  SELECT row, col, pt_id, d2,
         row_number() OVER (PARTITION BY row, col ORDER BY d2, pt_id) AS rk
  FROM cand
)
SELECT row, col, pt_id AS near_id, d2 FROM best WHERE rk = 1
"""


SQL_POINTS_DENSITY = f"""
WITH pts AS (
  SELECT CAST(floor({HOLES_H} - y) AS BIGINT) AS row,
         CAST(floor(x) AS BIGINT) AS col
  FROM read_parquet('{ORACLE_DIR}/query_points.parquet')
)
SELECT row, col, count(*) AS n_points
FROM pts
WHERE row >= 0 AND row < {HOLES_H} AND col >= 0 AND col < {HOLES_SHAPE_W}
GROUP BY row, col
"""


# NN affine warp: output grid enumerated closed-form, each output pixel
# LEFT-joined to its single source pixel by the same integer rational
# mapping; no-match (out-of-bounds) and nodata sources are both null.
SQL_RASTER_WARP = f"""
WITH og AS (
  SELECT r.range AS row, c.range AS col
  FROM range(0, 400) r CROSS JOIN range(0, 360) c
  WHERE (r.range * 360 + c.range) % 83 = 0
)
SELECT og.row, og.col,
       CASE WHEN NOT p.is_nodata THEN CAST(p.val AS DOUBLE) END AS value
FROM og LEFT JOIN {_px("holes")} p
  ON p.row = CAST(floor((og.row * 8 + 3) / 5) AS BIGINT)
 AND p.col = CAST(floor((og.col * 7 + 2) / 6) AS BIGINT)
"""


SQL_RASTER_DOWNSAMPLE = f"""
SELECT CAST(floor(row / 8) AS BIGINT) AS crow,
       CAST(floor(col / 8) AS BIGINT) AS ccol,
       count(CASE WHEN NOT is_nodata THEN 1 END) AS cnt,
       sum(CASE WHEN NOT is_nodata THEN val END) AS "sum",
       sum(CASE WHEN NOT is_nodata THEN val END)
         / count(CASE WHEN NOT is_nodata THEN 1 END) AS mean
FROM {_px("holes")}
GROUP BY crow, ccol
"""


# Mode pooling: (coarse block, value) counts ranked (cnt DESC, val ASC).
SQL_RASTER_DOWNSAMPLE_MODE = f"""
WITH vc AS (
  SELECT CAST(floor(row / 8) AS BIGINT) AS crow,
         CAST(floor(col / 8) AS BIGINT) AS ccol,
         CAST(val AS BIGINT) AS v, count(*) AS c
  FROM {_px("classes")} WHERE NOT is_nodata
  GROUP BY crow, ccol, v
),
allb AS (
  SELECT CAST(floor(row / 8) AS BIGINT) AS crow,
         CAST(floor(col / 8) AS BIGINT) AS ccol,
         count(CASE WHEN NOT is_nodata THEN 1 END) AS n_valid
  FROM {_px("classes")} GROUP BY crow, ccol
),
rk AS (
  SELECT crow, ccol, v,
         row_number() OVER (PARTITION BY crow, ccol ORDER BY c DESC, v ASC) AS r
  FROM vc
)
SELECT a.crow, a.ccol, CAST(a.n_valid AS BIGINT) AS n_valid, rk.v AS mode_val
FROM allb a LEFT JOIN rk ON rk.crow = a.crow AND rk.ccol = a.ccol AND rk.r = 1
"""


# zonal aggregate over the DERIVED focal-sum raster: the SQL recomputes
# the stencil itself (9-offset join over every pixel) and then applies
# the center rule — both chained operators re-derived with no engine
# code in the loop.
SQL_ZONAL_OVER_FOCAL = f"""
WITH offs AS (
  SELECT r.range AS dr, c.range AS dc
  FROM range(-1, 2) r CROSS JOIN range(-1, 2) c
),
f AS (
  SELECT p.row, p.col, sum(q.val) AS fsum, count(q.val) AS fcnt
  FROM {_px("holes")} p CROSS JOIN offs o
  LEFT JOIN (SELECT row, col, val FROM {_px("holes")} WHERE NOT is_nodata) q
    ON q.row = p.row + o.dr AND q.col = p.col + o.dc
  GROUP BY p.row, p.col
),
j AS (
  SELECT z.zone_id, f.fsum AS val, (f.fcnt = 0) AS is_nodata
  FROM {_zsql("main")} z
  LEFT JOIN f
    ON (f.col + 0.5) > z.xmin AND (f.col + 0.5) < z.xmax
   AND ({HOLES_H} - f.row - 0.5) > z.ymin AND ({HOLES_H} - f.row - 0.5) < z.ymax
),
agg AS (
  SELECT zone_id,
         count(CASE WHEN NOT is_nodata THEN 1 END) AS cnt,
         sum(CASE WHEN NOT is_nodata THEN val END) AS s,
         coalesce(sum(CASE WHEN is_nodata THEN 1 END), 0) AS nod
  FROM j GROUP BY zone_id
)
SELECT zone_id, cnt AS "count", s / cnt AS mean, s AS "sum",
       CAST(nod AS DOUBLE) AS nodata
FROM agg
"""


# coverage-weighted zonal: bounds scale-rounded to int64 in ROW space,
# per-pixel weight = x-overlap * y-overlap (pure integer), same final
# divides as the engine. Inner join suffices: every 'main' zone covers
# pixels (zone 39 covers only nodata ones -> null wmean/wsum).
SQL_ZONAL_WEIGHTED = f"""
WITH z AS (
  SELECT zone_id,
         CAST(round(xmin * 10000) AS BIGINT) AS xi,
         CAST(round(xmax * 10000) AS BIGINT) AS xa,
         CAST(round(({HOLES_H} - ymax) * 10000) AS BIGINT) AS yi,
         CAST(round(({HOLES_H} - ymin) * 10000) AS BIGINT) AS ya
  FROM read_parquet('{ORACLE_DIR}/rect_zones.parquet') WHERE zset = 'main'
),
j AS (
  SELECT z.zone_id,
         (least(z.xa, (p.col + 1) * 10000) - greatest(z.xi, p.col * 10000))
       * (least(z.ya, (p.row + 1) * 10000) - greatest(z.yi, p.row * 10000)) AS w,
         CAST(p.val AS BIGINT) AS v, p.is_nodata
  FROM z JOIN {_px("holes")} p
    ON (p.col + 1) * 10000 > z.xi AND p.col * 10000 < z.xa
   AND (p.row + 1) * 10000 > z.yi AND p.row * 10000 < z.ya
),
agg AS (
  SELECT zone_id,
         sum(w) AS wall,
         sum(CASE WHEN NOT is_nodata THEN w END) AS wtot,
         sum(CASE WHEN NOT is_nodata THEN w * v END) AS wsum
  FROM j GROUP BY zone_id
)
SELECT zone_id,
       CAST(wall AS DOUBLE) / 100000000 AS coverage_px,
       CAST(wsum AS DOUBLE) / CAST(wtot AS DOUBLE) AS wmean,
       CAST(wsum AS DOUBLE) / 100000000 AS wsum
FROM agg
"""


# Weight-raster zonal: scaled-int strict center rule (the engine's
# exact membership arithmetic), aligned-pixel join to the weight
# raster, integer sums, one divide.
SQL_ZONAL_WEIGHTED_RASTER = f"""
WITH z AS (
  SELECT zone_id,
         CAST(round(xmin * 10000) AS BIGINT) AS xi,
         CAST(round(xmax * 10000) AS BIGINT) AS xa,
         CAST(round(({HOLES_H} - ymax) * 10000) AS BIGINT) AS yi,
         CAST(round(({HOLES_H} - ymin) * 10000) AS BIGINT) AS ya
  FROM read_parquet('{ORACLE_DIR}/rect_zones.parquet') WHERE zset = 'main'
),
j AS (
  SELECT z.zone_id, CAST(p.val AS BIGINT) AS v, CAST(w.val AS BIGINT) AS wv,
         (p.is_nodata OR w.is_nodata) AS bad
  FROM z
  LEFT JOIN ({_px("holes")} p JOIN {_px("terrain")} w
             ON w.row = p.row AND w.col = p.col)
    ON (2 * p.col + 1) * 10000 > 2 * z.xi AND (2 * p.col + 1) * 10000 < 2 * z.xa
   AND (2 * p.row + 1) * 10000 > 2 * z.yi AND (2 * p.row + 1) * 10000 < 2 * z.ya
),
agg AS (
  SELECT zone_id,
         count(CASE WHEN NOT bad THEN 1 END) AS n_px,
         sum(CASE WHEN NOT bad THEN wv END) AS wtot,
         sum(CASE WHEN NOT bad THEN wv * v END) AS wsum
  FROM j GROUP BY zone_id
)
SELECT zone_id, CAST(n_px AS BIGINT) AS n_px,
       CASE WHEN n_px > 0 THEN CAST(wtot AS BIGINT) END AS wtot,
       CASE WHEN n_px > 0 THEN CAST(wsum AS BIGINT) END AS wsum,
       CASE WHEN n_px > 0 AND wtot != 0
            THEN CAST(wsum AS DOUBLE) / CAST(wtot AS DOUBLE) END AS wmean
FROM agg
"""


# IDW: k=4 neighbors rank-pivoted to columns; the value expression uses
# the engine's exact left-associated accumulation order. Integer-only
# literals (the +3/-7 shift) keep every coordinate op bit-identical.
SQL_POINT_IDW = f"""
WITH ref AS (
  SELECT pt_id AS rid, x AS rx, y AS ry,
         CAST((pt_id * 13) % 97 AS DOUBLE) AS v
  FROM read_parquet('{ORACLE_DIR}/query_points.parquet')
),
q AS (
  SELECT pt_id AS qid, x + 3 AS qx, y - 7 AS qy
  FROM read_parquet('{ORACLE_DIR}/query_points.parquet')
),
d AS (
  SELECT q.qid, ref.v,
         (q.qx - ref.rx) * (q.qx - ref.rx) + (q.qy - ref.ry) * (q.qy - ref.ry) AS d2,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY (q.qx - ref.rx) * (q.qx - ref.rx)
                  + (q.qy - ref.ry) * (q.qy - ref.ry), ref.rid
         ) AS rk
  FROM q CROSS JOIN ref
),
p AS (
  SELECT qid,
         max(CASE WHEN rk = 1 THEN d2 END) AS d1, max(CASE WHEN rk = 1 THEN v END) AS v1,
         max(CASE WHEN rk = 2 THEN d2 END) AS dd2, max(CASE WHEN rk = 2 THEN v END) AS v2,
         max(CASE WHEN rk = 3 THEN d2 END) AS d3, max(CASE WHEN rk = 3 THEN v END) AS v3,
         max(CASE WHEN rk = 4 THEN d2 END) AS d4, max(CASE WHEN rk = 4 THEN v END) AS v4
  FROM d WHERE rk <= 4 GROUP BY qid
)
SELECT qid AS query_id,
       CASE WHEN d1 = 0 THEN v1
            ELSE ((1.0 / d1) * v1 + (1.0 / dd2) * v2 + (1.0 / d3) * v3 + (1.0 / d4) * v4)
               / ((1.0 / d1) + (1.0 / dd2) + (1.0 / d3) + (1.0 / d4)) END AS value
FROM p
"""


SQL_RASTER_GLOBAL_STATS = f"""
WITH agg AS (
  SELECT count(CASE WHEN NOT is_nodata THEN 1 END) AS cnt,
         sum(CASE WHEN NOT is_nodata THEN val END) AS s,
         sum(CASE WHEN NOT is_nodata THEN val * val END) AS sq,
         min(CASE WHEN NOT is_nodata THEN val END) AS mn,
         max(CASE WHEN NOT is_nodata THEN val END) AS mx,
         count(CASE WHEN is_nodata THEN 1 END) AS nod,
         count(DISTINCT CASE WHEN NOT is_nodata THEN val END) AS u
  FROM {_px("holes")}
)
SELECT cnt AS "count", s AS "sum", s / cnt AS mean, mn AS "min", mx AS "max",
       sqrt(greatest(sq / cnt - (s / cnt) * (s / cnt), 0.0)) AS std,
       nod AS nodata_px, u AS n_distinct
FROM agg
"""


SQL_RASTER_CALC_NDVI = f"""
SELECT a.row, a.col,
       CASE WHEN a.is_nodata OR b.is_nodata THEN NULL
            ELSE (a.val - b.val) / (a.val + b.val) END AS value
FROM {_px("holes")} a
JOIN {_px("terrain")} b ON b.row = a.row AND b.col = a.col
WHERE (a.row * {HOLES_SHAPE_W} + a.col) % 89 = 0
"""


def _bilinear_sql(pts_cte: str, id_cols: str, h: int, raster: str) -> str:
    """SQL mirror of stages/point_dist.PointQueryKernel bilinear semantics:
    banker's-round window centering (fractional parts never .0/.5 by fixture
    construction, so floor(v + 0.5) == np.round), identical IEEE blend term
    order, masked -> nearest (round-half within unit square) -> NULL."""
    return f"""
WITH pts AS ({pts_cte}),
w AS (
  SELECT {id_cols}, x, y,
         CAST(floor(x + 0.5) AS BIGINT) AS c,
         CAST(floor(({h} - y) + 0.5) AS BIGINT) AS r,
         0.5 - (CAST(floor(x + 0.5) AS BIGINT) - x) AS ux,
         0.5 + (CAST(floor(({h} - y) + 0.5) AS BIGINT) - ({h} - y)) AS uy
  FROM pts
),
g AS (
  SELECT {', '.join('w.' + c for c in id_cols.split(', '))}, w.ux, w.uy,
         ul.val AS ulv, (ul.val IS NULL OR ul.is_nodata) AS mul_,
         ur.val AS urv, (ur.val IS NULL OR ur.is_nodata) AS mur_,
         ll.val AS llv, (ll.val IS NULL OR ll.is_nodata) AS mll_,
         lr.val AS lrv, (lr.val IS NULL OR lr.is_nodata) AS mlr_
  FROM w
  LEFT JOIN {_px(raster)} ul ON ul.row = w.r - 1 AND ul.col = w.c - 1
  LEFT JOIN {_px(raster)} ur ON ur.row = w.r - 1 AND ur.col = w.c
  LEFT JOIN {_px(raster)} ll ON ll.row = w.r AND ll.col = w.c - 1
  LEFT JOIN {_px(raster)} lr ON lr.row = w.r AND lr.col = w.c
)
SELECT {id_cols},
  CASE WHEN NOT (mul_ OR mur_ OR mll_ OR mlr_) THEN
    llv * (1.0 - ux) * (1.0 - uy) + lrv * ux * (1.0 - uy)
    + ulv * (1.0 - ux) * uy + urv * ux * uy
  ELSE
    CASE
      WHEN CAST(floor(1.0 - uy + 0.5) AS BIGINT) = 0
           AND CAST(floor(ux + 0.5) AS BIGINT) = 0
        THEN CASE WHEN mul_ THEN NULL ELSE ulv END
      WHEN CAST(floor(1.0 - uy + 0.5) AS BIGINT) = 0
        THEN CASE WHEN mur_ THEN NULL ELSE urv END
      WHEN CAST(floor(ux + 0.5) AS BIGINT) = 0
        THEN CASE WHEN mll_ THEN NULL ELSE llv END
      ELSE CASE WHEN mlr_ THEN NULL ELSE lrv END
    END
  END AS value
FROM g
"""


SQL_POINT_BILINEAR = _bilinear_sql(
    f"SELECT pt_id, x, y FROM read_parquet('{ORACLE_DIR}/query_points.parquet')",
    "pt_id",
    HOLES_H,
    "holes",
)


SQL_POINT_NEAREST = f"""
WITH pts AS (SELECT pt_id, x, y FROM read_parquet('{ORACLE_DIR}/query_points.parquet'))
SELECT pt_id,
       CASE WHEN p.val IS NULL OR p.is_nodata THEN NULL ELSE p.val END AS value
FROM pts
LEFT JOIN {_px("holes")} p
  ON p.row = CAST(floor({HOLES_H} - y) AS BIGINT)
 AND p.col = CAST(floor(x) AS BIGINT)
"""


SQL_POINT_FEATURES = _bilinear_sql(
    f"SELECT zone_id, vertex_idx, x, y FROM read_parquet('{ORACLE_DIR}/rect_vertices.parquet')",
    "zone_id, vertex_idx",
    HOLES_H,
    "holes",
)


ZONAL_QUERIES = {
    "zonal_synthetic_tiled": q_zonal_tiled,
    "zonal_synthetic_broadcast": q_zonal_broadcast,
    "zonal_all_touched": q_zonal_all_touched,
    "zonal_categorical": q_zonal_categorical,
    "zonal_histogram": q_zonal_histogram,
    "zonal_auto": q_zonal_auto,
    "zonal_edge": q_zonal_edge,
    "zonal_udfs": q_zonal_udfs,
    "zonal_tiled_store": q_zonal_tiled_store,
    "zonal_irregular_tiled": q_zonal_irregular_tiled,
    "zonal_irregular_broadcast": q_zonal_irregular_broadcast,
    "point_query_synthetic": q_point_query_bilinear,
    "point_query_nearest": q_point_query_nearest,
    "point_query_features": q_point_query_features,
    "point_query_tiled": q_point_query_tiled,
    "point_query_tiled_store": q_point_query_tiled_store,
    "raster_focal_mean": q_raster_focal_mean,
    "raster_downsample": q_raster_downsample,
    "raster_calc_ndvi": q_raster_calc_ndvi,
    "zonal_over_focal": q_zonal_over_focal,
    "zonal_weighted": q_zonal_weighted,
    "zonal_weighted_raster": q_zonal_weighted_raster,
    "raster_global_stats": q_raster_global_stats,
    "point_idw": q_point_idw,
    "raster_slope": q_raster_slope,
    "raster_terrain": q_raster_terrain,
    "raster_focal_minmax": q_raster_focal_minmax,
    "raster_warp": q_raster_warp,
    "raster_d8_flow": q_raster_d8_flow,
    "raster_hillshade": q_raster_hillshade,
    "raster_warp_bilinear": q_raster_warp_bilinear,
    "raster_flow_trace": q_raster_flow_trace,
    "raster_flow_acc": q_raster_flow_acc,
    "raster_aspect": q_raster_aspect,
    "raster_majority": q_raster_majority,
    "raster_reclass": q_raster_reclass,
    "raster_focal_std": q_raster_focal_std,
    "raster_quantiles": q_raster_quantiles,
    "raster_contour": q_raster_contour,
    "raster_contour_lines": q_raster_contour_lines,
    "raster_cost_distance": q_raster_cost_distance,
    "raster_downsample_mode": q_raster_downsample_mode,
    "raster_focal_median": q_raster_focal_median,
    "raster_crosstab": q_raster_crosstab,
    "raster_cost_alloc": q_raster_cost_alloc,
    "raster_cost_weighted": q_raster_cost_weighted,
    "raster_polygonize": q_raster_polygonize,
    "raster_sieve": q_raster_sieve,
    "raster_region_group": q_raster_region_group,
    "raster_pyramid": q_raster_pyramid,
    "raster_proximity": q_raster_proximity,
    "points_density": q_points_density,
}

ZONAL_ORACLE_SQL = {
    "zonal_synthetic_tiled": SQL_ZONAL_TILED,
    "zonal_synthetic_broadcast": SQL_ZONAL_BROADCAST,
    "zonal_all_touched": SQL_ZONAL_ALL_TOUCHED,
    "zonal_categorical": SQL_ZONAL_CATEGORICAL,
    "zonal_histogram": SQL_ZONAL_HISTOGRAM,
    "zonal_auto": SQL_ZONAL_AUTO,
    "zonal_edge": SQL_ZONAL_EDGE,
    "zonal_udfs": SQL_ZONAL_UDFS,
    "zonal_tiled_store": SQL_ZONAL_TILED,
    "zonal_irregular_tiled": SQL_ZONAL_IRREGULAR_TILED,
    "zonal_irregular_broadcast": SQL_ZONAL_IRREGULAR_BROADCAST,
    "point_query_synthetic": SQL_POINT_BILINEAR,
    "point_query_nearest": SQL_POINT_NEAREST,
    "point_query_features": SQL_POINT_FEATURES,
    "point_query_tiled": SQL_POINT_BILINEAR,
    "point_query_tiled_store": SQL_POINT_BILINEAR,
    "raster_focal_mean": SQL_RASTER_FOCAL_MEAN,
    "raster_downsample": SQL_RASTER_DOWNSAMPLE,
    "raster_calc_ndvi": SQL_RASTER_CALC_NDVI,
    "zonal_over_focal": SQL_ZONAL_OVER_FOCAL,
    "zonal_weighted": SQL_ZONAL_WEIGHTED,
    "zonal_weighted_raster": SQL_ZONAL_WEIGHTED_RASTER,
    "raster_global_stats": SQL_RASTER_GLOBAL_STATS,
    "point_idw": SQL_POINT_IDW,
    "raster_slope": SQL_RASTER_SLOPE,
    "raster_terrain": SQL_RASTER_TERRAIN,
    "raster_focal_minmax": SQL_RASTER_FOCAL_MINMAX,
    "raster_warp": SQL_RASTER_WARP,
    "raster_d8_flow": SQL_RASTER_D8_FLOW,
    "raster_hillshade": SQL_RASTER_HILLSHADE,
    "raster_warp_bilinear": SQL_RASTER_WARP_BILINEAR,
    "raster_flow_trace": SQL_RASTER_FLOW_TRACE,
    "raster_flow_acc": SQL_RASTER_FLOW_ACC,
    "raster_aspect": SQL_RASTER_ASPECT,
    "raster_majority": SQL_RASTER_MAJORITY,
    "raster_reclass": SQL_RASTER_RECLASS,
    "raster_focal_std": SQL_RASTER_FOCAL_STD,
    "raster_quantiles": SQL_RASTER_QUANTILES,
    "raster_contour": SQL_RASTER_CONTOUR,
    "raster_cost_distance": SQL_RASTER_COST_DISTANCE,
    "raster_downsample_mode": SQL_RASTER_DOWNSAMPLE_MODE,
    "raster_focal_median": SQL_RASTER_FOCAL_MEDIAN,
    "raster_crosstab": SQL_RASTER_CROSSTAB,
    "raster_cost_alloc": SQL_RASTER_COST_ALLOC,
    "raster_pyramid": SQL_RASTER_PYRAMID,
    "raster_proximity": SQL_RASTER_PROXIMITY,
    "points_density": SQL_POINTS_DENSITY,
}
