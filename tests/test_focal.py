"""Differential tests for stages/focal.py: the distributed halo-exchange
focal mean, factor-f downsample and two-raster map algebra must be
bit-identical to independent sequential numpy references (plain
nested-loop / reshape implementations that share no code with the
engine's fragments/integral-image path), across tile layouts and radii.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from python_rasterstats_ray.sources.tiles import raster_to_tiles_table
from python_rasterstats_ray.stages.focal import (
    downsample_mean,
    focal_mean_tiled,
    raster_calc_tiled,
    sample_calc_pixels,
    sample_focal_pixels,
)

NODATA = -9999.0


def _rand_raster(h, w, seed, holes=True):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 100, size=(h, w)).astype(np.float32)
    if holes:
        arr[5:20, 10:30] = NODATA
        arr[h - 7 : h - 1, 2:9] = NODATA
    return arr


def _focal_reference(arr, radius):
    """Independent nested-loop reference: per pixel, sum/count of valid
    in-bounds neighbors in the (2r+1)^2 window."""
    h, w = arr.shape
    fsum = np.zeros((h, w), dtype=np.float64)
    fcnt = np.zeros((h, w), dtype=np.int64)
    a = arr.astype(np.float64)
    valid = a != NODATA
    for r in range(h):
        for c in range(w):
            r0, r1 = max(0, r - radius), min(h, r + radius + 1)
            c0, c1 = max(0, c - radius), min(w, c + radius + 1)
            win = a[r0:r1, c0:c1]
            ok = valid[r0:r1, c0:c1]
            fcnt[r, c] = int(ok.sum())
            fsum[r, c] = float(win[ok].sum())
    return fsum, fcnt


def _collect_focal(arr, radius, tile_size):
    aff = None  # raster_to_tiles_table ignores affine content for this test
    from python_rasterstats_ray.functions.affine import Affine

    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(arr.shape[0]))
    tiles = ray.data.from_arrow(
        raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size)
    )
    out = focal_mean_tiled(tiles, arr.shape, NODATA, radius=radius, tile_size=tile_size)
    got_s = np.full(arr.shape, np.nan)
    got_c = np.zeros(arr.shape, dtype=np.int64)
    for batch in out.iter_batches(batch_format="pyarrow"):
        for i in range(len(batch)):
            r0 = batch["row_off"][i].as_py()
            c0 = batch["col_off"][i].as_py()
            th = batch["height"][i].as_py()
            tw = batch["width"][i].as_py()
            s = np.frombuffer(batch["fsum"][i].as_buffer(), np.float64).reshape(th, tw)
            c = np.frombuffer(batch["fcnt"][i].as_buffer(), np.int64).reshape(th, tw)
            got_s[r0 : r0 + th, c0 : c0 + tw] = s
            got_c[r0 : r0 + th, c0 : c0 + tw] = c
    return got_s, got_c


@pytest.mark.parametrize("radius,tile_size", [(1, 32), (2, 32), (1, 48), (3, 16)])
def test_focal_matches_reference(ray_session, radius, tile_size):
    arr = _rand_raster(96, 80, seed=7)
    ref_s, ref_c = _focal_reference(arr, radius)
    got_s, got_c = _collect_focal(arr, radius, tile_size)
    assert np.array_equal(got_c, ref_c)
    assert np.array_equal(got_s, ref_s)  # integer-valued: bit-exact


def test_focal_layout_invariant(ray_session):
    """Same raster, different tile sizes -> identical result (non-divisible
    edge tiles included)."""
    arr = _rand_raster(70, 53, seed=11)
    a = _collect_focal(arr, 1, 16)
    b = _collect_focal(arr, 1, 70)
    assert np.array_equal(a[1], b[1])
    assert np.array_equal(a[0], b[0])


def test_focal_sample_null_on_empty_neighborhood(ray_session):
    """A pixel deep inside a nodata patch has fcnt 0 and null fsum/fmean."""
    arr = np.full((12, 12), 5.0, dtype=np.float32)
    arr[2:9, 2:9] = NODATA  # interior of the patch has all-nodata 3x3
    from python_rasterstats_ray.functions.affine import Affine

    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 12.0)
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=8))
    out = focal_mean_tiled(tiles, arr.shape, NODATA, radius=1, tile_size=8)
    tbl = pa.concat_tables(
        sample_focal_pixels(out, 12, 1).iter_batches(batch_format="pyarrow")  # every pixel
    )
    df = tbl.to_pandas().set_index(["row", "col"])
    center = df.loc[(5, 5)]
    assert center["fcnt"] == 0
    assert np.isnan(center["fsum"]) and np.isnan(center["fmean"])
    corner = df.loc[(0, 0)]  # 2x2 in-bounds window, all valid
    assert corner["fcnt"] == 4 and corner["fmean"] == 5.0


def test_focal_radius_exceeds_tile_raises(ray_session):
    arr = _rand_raster(8, 8, seed=1, holes=False)
    from python_rasterstats_ray.functions.affine import Affine

    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 8.0)
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=4))
    with pytest.raises(ValueError):
        focal_mean_tiled(tiles, arr.shape, NODATA, radius=5, tile_size=4)


@pytest.mark.parametrize("factor,tile_size", [(8, 32), (5, 16), (7, 32)])
def test_downsample_matches_reference(ray_session, factor, tile_size):
    """Non-divisible factors make coarse blocks straddle tiles AND the
    raster edge; partial blocks average over available pixels only."""
    arr = _rand_raster(67, 45, seed=23)
    from python_rasterstats_ray.functions.affine import Affine

    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(arr.shape[0]))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size))
    got = (
        pa.concat_tables(
            downsample_mean(tiles, factor, NODATA).iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .set_index(["crow", "ccol"])
        .sort_index()
    )
    h, w = arr.shape
    a = arr.astype(np.float64)
    for cr in range(-(-h // factor)):
        for cc in range(-(-w // factor)):
            blk = a[cr * factor : (cr + 1) * factor, cc * factor : (cc + 1) * factor]
            ok = blk != NODATA
            row = got.loc[(cr, cc)]
            assert row["cnt"] == int(ok.sum())
            if ok.sum() == 0:
                assert np.isnan(row["sum"]) and np.isnan(row["mean"])
            else:
                assert row["sum"] == float(blk[ok].sum())
                assert row["mean"] == float(blk[ok].sum()) / int(ok.sum())


def test_raster_calc_matches_reference(ray_session):
    arr_a = _rand_raster(50, 41, seed=3)
    arr_b = _rand_raster(50, 41, seed=4, holes=False).astype(np.float32) + 10.0
    arr_b[30:35, 5:12] = NODATA  # b's own nodata patch
    from python_rasterstats_ray.functions.affine import Affine

    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 50.0)
    ta = ray.data.from_arrow(raster_to_tiles_table(arr_a, aff, NODATA, tile_size=16))
    tb = ray.data.from_arrow(raster_to_tiles_table(arr_b, aff, NODATA, tile_size=16))
    calc = raster_calc_tiled(ta, tb, lambda a, b: (a - b) / (a + b), NODATA, NODATA)
    got = (
        pa.concat_tables(
            sample_calc_pixels(calc, 41, 1).iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .set_index(["row", "col"])
        .sort_index()
    )
    a = arr_a.astype(np.float64)
    b = arr_b.astype(np.float64)
    ok = (a != NODATA) & (b != NODATA)
    ref = np.where(ok, (a - b) / np.where(ok, a + b, 1.0), np.nan)
    got_mat = got["value"].to_numpy().reshape(50, 41)
    assert np.array_equal(np.isnan(got_mat), ~ok)
    assert np.array_equal(got_mat[ok], ref[ok])


def test_select_top_exact_matches_reference(ray_session):
    """Exact top-frac selection vs a plain pandas sort reference,
    including heavy ties at the boundary score and tiny corpora."""
    import pandas as pd

    from python_rasterstats_ray.stages.ordering import select_top_exact

    rng = np.random.default_rng(5)
    n = 1000
    # scores drawn from a SMALL set so the boundary score has many ties
    scores = rng.integers(0, 12, size=n).astype(np.int64)
    ids = rng.permutation(n).astype(np.int64)
    tbl = pa.table({"doc_id": ids, "n_chars": scores})
    for frac in (0.25, 0.5, 0.001, 1.0):
        ds = ray.data.from_arrow(tbl).repartition(7)
        got = select_top_exact(ds, frac).to_pandas()
        k = int(np.floor(n * frac))
        ref = (
            pd.DataFrame({"doc_id": ids, "n_chars": scores})
            .sort_values(["n_chars", "doc_id"], ascending=[False, True])
            .head(k)
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(got) == k
        assert got["doc_id"].tolist() == ref["doc_id"].tolist()
        assert got["n_chars"].tolist() == ref["n_chars"].tolist()


def test_select_top_layout_invariant(ray_session):
    from python_rasterstats_ray.stages.ordering import select_top_exact

    rng = np.random.default_rng(9)
    tbl = pa.table(
        {
            "doc_id": np.arange(500, dtype=np.int64),
            "n_chars": rng.integers(50, 400, size=500).astype(np.int64),
        }
    )
    a = select_top_exact(ray.data.from_arrow(tbl).repartition(3), 0.25).to_pandas()
    b = select_top_exact(ray.data.from_arrow(tbl).repartition(17), 0.25).to_pandas()
    assert a.equals(b)


def test_focal_store_matches_shuffle_plan(ray_session, tmp_path):
    """write_tiles_bucketed + focal_mean_from_store (zero-shuffle targeted
    partition reads) is bit-identical to the halo-exchange shuffle plan."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import (
        focal_mean_from_store,
        write_tiles_bucketed,
    )

    arr = _rand_raster(96, 70, seed=31)  # non-divisible width -> edge tiles
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 96.0)
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=32))
    store = str(tmp_path / "tile_store")
    write_tiles_bucketed(tiles, store, arr.shape, tile_size=32, radius=2)

    for radius in (1, 2):
        got = focal_mean_from_store(store, arr.shape, NODATA, radius=radius, tile_size=32)
        ref_s, ref_c = _focal_reference(arr, radius)
        out_s = np.full(arr.shape, np.nan)
        out_c = np.zeros(arr.shape, dtype=np.int64)
        for batch in got.iter_batches(batch_format="pyarrow"):
            for i in range(len(batch)):
                r0 = batch["row_off"][i].as_py()
                c0 = batch["col_off"][i].as_py()
                th = batch["height"][i].as_py()
                tw = batch["width"][i].as_py()
                out_s[r0 : r0 + th, c0 : c0 + tw] = np.frombuffer(
                    batch["fsum"][i].as_buffer(), np.float64
                ).reshape(th, tw)
                out_c[r0 : r0 + th, c0 : c0 + tw] = np.frombuffer(
                    batch["fcnt"][i].as_buffer(), np.int64
                ).reshape(th, tw)
        assert np.array_equal(out_c, ref_c), f"radius {radius}"
        assert np.array_equal(out_s, ref_s), f"radius {radius}"


def test_zonal_weighted_hand_cases(ray_session):
    """Coverage-weighted zonal against hand-computable rectangles."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.functions.geometry import make_box, to_wkb
    from python_rasterstats_ray.stages.weighted import zonal_weighted_broadcast

    arr = np.arange(100, dtype=np.float32).reshape(10, 10)  # val = row*10+col
    arr[0, 3] = NODATA
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 10.0)
    rects = {
        # zone 0: exactly pixels rows 8..9 (y 0..2), cols 2..5 -> 6 cells
        0: (2.0, 0.0, 5.0, 2.0),
        # zone 1: half of one pixel: x 0..0.5, y 9..10 -> pixel (0,0), cov 0.5
        1: (0.0, 9.0, 0.5, 10.0),
        # zone 2: fully outside
        2: (20.0, 20.0, 25.0, 25.0),
        # zone 3: quarter of the NODATA pixel (0,3) only -> cov .25, null stats
        3: (3.0, 9.5, 3.5, 10.0),
    }
    tbl = pa.table(
        {
            "zone_id": pa.array(sorted(rects), pa.int64()),
            "geom_wkb": pa.array(
                [to_wkb(make_box(*rects[z])) for z in sorted(rects)], pa.binary()
            ),
        }
    )
    got = (
        zonal_weighted_broadcast(ray.data.from_arrow(tbl), (arr, aff, NODATA))
        .to_pandas()
        .set_index("zone_id")
    )
    z0 = got.loc[0]
    vals0 = arr[8:10, 2:5].astype(np.float64)
    assert z0["coverage_px"] == 6.0
    assert z0["wmean"] == vals0.mean() and z0["wsum"] == vals0.sum()
    z1 = got.loc[1]
    assert z1["coverage_px"] == 0.5
    assert z1["wmean"] == 0.0 and z1["wsum"] == 0.0  # pixel (0,0) value 0
    z2 = got.loc[2]
    assert z2["coverage_px"] == 0.0 and np.isnan(z2["wmean"]) and np.isnan(z2["wsum"])
    z3 = got.loc[3]
    assert z3["coverage_px"] == 0.25
    assert np.isnan(z3["wmean"]) and np.isnan(z3["wsum"])


def test_zonal_weighted_boundary_fraction(ray_session):
    """A rect overlapping pixel columns fractionally: weights match the
    closed-form fractions."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.functions.geometry import make_box, to_wkb
    from python_rasterstats_ray.stages.weighted import zonal_weighted_broadcast

    arr = np.array([[2.0, 4.0, 8.0]], dtype=np.float32)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 1.0)
    # x from 0.25 to 2.75, full y: weights 0.75, 1.0, 0.75
    tbl = pa.table(
        {
            "zone_id": pa.array([0], pa.int64()),
            "geom_wkb": pa.array([to_wkb(make_box(0.25, 0.0, 2.75, 1.0))], pa.binary()),
        }
    )
    got = zonal_weighted_broadcast(ray.data.from_arrow(tbl), (arr, aff, NODATA)).to_pandas()
    w = np.array([0.75, 1.0, 0.75])
    v = np.array([2.0, 4.0, 8.0])
    assert got["coverage_px"][0] == w.sum()
    assert got["wsum"][0] == (w * v).sum()
    assert got["wmean"][0] == (w * v).sum() / w.sum()


def test_idw_matches_bruteforce(ray_session):
    """IDW kernel vs a brute-force numpy reference (same rank order and
    accumulation), including exact-hit queries."""
    from python_rasterstats_ray.stages.knn_points import idw_points

    rng = np.random.default_rng(17)
    n = 300
    rx = rng.uniform(0, 100, n)
    ry = rng.uniform(0, 100, n)
    ids = np.arange(n, dtype=np.int64)
    vals = rng.integers(0, 50, n).astype(np.float64)
    qx = np.concatenate([rng.uniform(0, 100, 80), rx[:5]])  # 5 exact hits
    qy = np.concatenate([rng.uniform(0, 100, 80), ry[:5]])
    qids = np.arange(len(qx), dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "pt_id": pa.array(qids, pa.int64()),
                "x": pa.array(qx, pa.float64()),
                "y": pa.array(qy, pa.float64()),
            }
        )
    ).repartition(4)
    got = idw_points(ds, rx, ry, ids, vals, k=4).to_pandas().set_index("query_id")["value"]
    for qi in qids:
        d2 = (qx[qi] - rx) ** 2 + (qy[qi] - ry) ** 2
        order = np.lexsort((ids, d2))[:4]
        if d2[order[0]] == 0.0:
            ref = vals[order[0]]
        else:
            num = 0.0
            den = 0.0
            for j in order:
                w = 1.0 / d2[j]
                num = num + w * vals[j]
                den = den + w
            ref = num / den
        assert got.loc[qi] == ref, qi


# ------------------------------------------------- slope / minmax / warp


def _slope_reference(arr):
    """Nested-loop Horn gradient; valid only for fully-valid 3x3 windows."""
    h, w = arr.shape
    a = arr.astype(np.float64)
    valid = a != NODATA
    gx = np.zeros((h, w), np.int64)
    gy = np.zeros((h, w), np.int64)
    ok = np.zeros((h, w), bool)
    for r in range(1, h - 1):
        for c in range(1, w - 1):
            win = a[r - 1 : r + 2, c - 1 : c + 2]
            if not valid[r - 1 : r + 2, c - 1 : c + 2].all():
                continue
            ok[r, c] = True
            gx[r, c] = int(
                (win[0, 2] + 2 * win[1, 2] + win[2, 2])
                - (win[0, 0] + 2 * win[1, 0] + win[2, 0])
            )
            gy[r, c] = int(
                (win[2, 0] + 2 * win[2, 1] + win[2, 2])
                - (win[0, 0] + 2 * win[0, 1] + win[0, 2])
            )
    return gx, gy, ok


@pytest.mark.parametrize("tile_size", [16, 32, 96])
def test_slope_matches_reference(ray_session, tile_size):
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import focal_slope_tiled

    arr = _rand_raster(96, 80, seed=23)
    ref_gx, ref_gy, ref_ok = _slope_reference(arr)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(arr.shape[0]))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size))
    out = focal_slope_tiled(tiles, arr.shape, NODATA, tile_size=tile_size)
    got_gx = np.zeros(arr.shape, np.int64)
    got_gy = np.zeros(arr.shape, np.int64)
    got_ok = np.zeros(arr.shape, bool)
    for batch in out.iter_batches(batch_format="pyarrow"):
        for i in range(len(batch)):
            r0, c0 = batch["row_off"][i].as_py(), batch["col_off"][i].as_py()
            th, tw = batch["height"][i].as_py(), batch["width"][i].as_py()
            gx = np.frombuffer(batch["gx"][i].as_buffer(), np.int64).reshape(th, tw)
            gy = np.frombuffer(batch["gy"][i].as_buffer(), np.int64).reshape(th, tw)
            ok = np.frombuffer(batch["ok"][i].as_buffer(), np.uint8).reshape(th, tw)
            got_gx[r0 : r0 + th, c0 : c0 + tw] = gx
            got_gy[r0 : r0 + th, c0 : c0 + tw] = gy
            got_ok[r0 : r0 + th, c0 : c0 + tw] = ok.astype(bool)
    assert np.array_equal(got_ok, ref_ok)
    assert np.array_equal(got_gx[got_ok], ref_gx[ref_ok])
    assert np.array_equal(got_gy[got_ok], ref_gy[ref_ok])


def _minmax_reference(arr, radius):
    h, w = arr.shape
    a = arr.astype(np.float64)
    valid = a != NODATA
    fmin = np.full((h, w), np.nan)
    fmax = np.full((h, w), np.nan)
    fcnt = np.zeros((h, w), np.int64)
    for r in range(h):
        for c in range(w):
            r0, r1 = max(0, r - radius), min(h, r + radius + 1)
            c0, c1 = max(0, c - radius), min(w, c + radius + 1)
            win = a[r0:r1, c0:c1]
            ok = valid[r0:r1, c0:c1]
            fcnt[r, c] = int(ok.sum())
            if fcnt[r, c]:
                fmin[r, c] = win[ok].min()
                fmax[r, c] = win[ok].max()
    return fmin, fmax, fcnt


@pytest.mark.parametrize("radius,tile_size", [(1, 32), (2, 16), (2, 96)])
def test_minmax_matches_reference(ray_session, radius, tile_size):
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import focal_minmax_tiled

    arr = _rand_raster(96, 80, seed=29)
    ref_mn, ref_mx, ref_c = _minmax_reference(arr, radius)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(arr.shape[0]))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size))
    out = focal_minmax_tiled(tiles, arr.shape, NODATA, radius=radius, tile_size=tile_size)
    got_mn = np.full(arr.shape, np.nan)
    got_mx = np.full(arr.shape, np.nan)
    got_c = np.zeros(arr.shape, np.int64)
    for batch in out.iter_batches(batch_format="pyarrow"):
        for i in range(len(batch)):
            r0, c0 = batch["row_off"][i].as_py(), batch["col_off"][i].as_py()
            th, tw = batch["height"][i].as_py(), batch["width"][i].as_py()
            mn = np.frombuffer(batch["fmin"][i].as_buffer(), np.float64).reshape(th, tw)
            mx = np.frombuffer(batch["fmax"][i].as_buffer(), np.float64).reshape(th, tw)
            c = np.frombuffer(batch["fcnt"][i].as_buffer(), np.int64).reshape(th, tw)
            got_mn[r0 : r0 + th, c0 : c0 + tw] = mn
            got_mx[r0 : r0 + th, c0 : c0 + tw] = mx
            got_c[r0 : r0 + th, c0 : c0 + tw] = c
    assert np.array_equal(got_c, ref_c)
    has = ref_c > 0
    assert np.array_equal(got_mn[has], ref_mn[has])
    assert np.array_equal(got_mx[has], ref_mx[has])
    assert np.all(np.isinf(got_mn[~has]) | np.isnan(got_mn[~has]))


def _warp_reference(arr, out_shape, y_map, x_map):
    oh, ow = out_shape
    ny, oy, dy = y_map
    nx, ox, dx = x_map
    vals = np.full((oh, ow), np.nan)
    ok = np.zeros((oh, ow), bool)
    for r in range(oh):
        for c in range(ow):
            sr = (r * ny + oy) // dy
            sc = (c * nx + ox) // dx
            if 0 <= sr < arr.shape[0] and 0 <= sc < arr.shape[1]:
                v = float(arr[sr, sc])
                if v != NODATA:
                    vals[r, c] = v
                    ok[r, c] = True
    return vals, ok


@pytest.mark.parametrize(
    "out_shape,y_map,x_map,tile_size",
    [
        ((50, 40), (8, 3, 5), (7, 2, 6), 16),   # down+up mix, oob rows
        ((120, 100), (2, 0, 3), (1, 5, 2), 32),  # upsample y, downsample x
        ((30, 30), (4, 1, 1), (4, 0, 1), 16),    # strong downsample
    ],
)
def test_warp_matches_reference(ray_session, out_shape, y_map, x_map, tile_size):
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import warp_nearest_tiled

    arr = _rand_raster(64, 56, seed=31)
    ref_v, ref_ok = _warp_reference(arr, out_shape, y_map, x_map)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(arr.shape[0]))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size))
    out = warp_nearest_tiled(
        tiles, arr.shape, out_shape, NODATA, y_map, x_map, tile_size=tile_size
    )
    got_v = np.full(out_shape, np.nan)
    got_ok = np.zeros(out_shape, bool)
    seen = np.zeros(out_shape, bool)
    for batch in out.iter_batches(batch_format="pyarrow"):
        for i in range(len(batch)):
            r0, c0 = batch["row_off"][i].as_py(), batch["col_off"][i].as_py()
            th, tw = batch["height"][i].as_py(), batch["width"][i].as_py()
            v = np.frombuffer(batch["vals"][i].as_buffer(), np.float64).reshape(th, tw)
            ok = np.frombuffer(batch["ok"][i].as_buffer(), np.uint8).reshape(th, tw)
            got_v[r0 : r0 + th, c0 : c0 + tw] = v
            got_ok[r0 : r0 + th, c0 : c0 + tw] = ok.astype(bool)
            seen[r0 : r0 + th, c0 : c0 + tw] = True
    assert seen.all()  # every output pixel emitted exactly once
    assert np.array_equal(got_ok, ref_ok)
    assert np.array_equal(got_v[got_ok], ref_v[ref_ok])


def _d8_reference(arr):
    """Nested-loop D8 reference with the same integer metric and
    E,SE,S,SW,W,NW,N,NE priority."""
    neigh = [
        (0, 1, 1, 2), (1, 1, 2, 1), (1, 0, 4, 2), (1, -1, 8, 1),
        (0, -1, 16, 2), (-1, -1, 32, 1), (-1, 0, 64, 2), (-1, 1, 128, 1),
    ]
    h, w = arr.shape
    a = np.rint(arr.astype(np.float64)).astype(np.int64)
    valid = arr != NODATA
    d8 = np.zeros((h, w), np.int64)
    for r in range(h):
        for c in range(w):
            if not valid[r, c]:
                continue
            best_m, best_d = 0, 0
            for dr, dc, code, mult in neigh:
                rr, cc = r + dr, c + dc
                if not (0 <= rr < h and 0 <= cc < w and valid[rr, cc]):
                    continue
                drop = int(a[r, c]) - int(a[rr, cc])
                if drop <= 0:
                    continue
                m = mult * drop * drop
                if m > best_m:
                    best_m, best_d = m, code
            d8[r, c] = best_d
    return d8, valid


@pytest.mark.parametrize("tile_size", [16, 48, 96])
def test_d8_matches_reference(ray_session, tile_size):
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import flow_direction_tiled

    arr = _rand_raster(96, 80, seed=37)
    arr[40:45, 40:45] = 7.0  # flat plateau -> pits (d8 = 0) inside
    ref_d8, ref_ok = _d8_reference(arr)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(arr.shape[0]))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size))
    out = flow_direction_tiled(tiles, arr.shape, NODATA, tile_size=tile_size)
    got_d8 = np.full(arr.shape, -1, np.int64)
    got_ok = np.zeros(arr.shape, bool)
    for batch in out.iter_batches(batch_format="pyarrow"):
        for i in range(len(batch)):
            r0, c0 = batch["row_off"][i].as_py(), batch["col_off"][i].as_py()
            th, tw = batch["height"][i].as_py(), batch["width"][i].as_py()
            d8 = np.frombuffer(batch["d8"][i].as_buffer(), np.int64).reshape(th, tw)
            ok = np.frombuffer(batch["ok"][i].as_buffer(), np.uint8).reshape(th, tw)
            got_d8[r0 : r0 + th, c0 : c0 + tw] = d8
            got_ok[r0 : r0 + th, c0 : c0 + tw] = ok.astype(bool)
    assert np.array_equal(got_ok, ref_ok)
    assert np.array_equal(got_d8[got_ok], ref_d8[ref_ok])


def test_hillshade_matches_reference(ray_session):
    """Hillshade vs an independent per-pixel reference computing the
    Lambertian dot product from the Horn gradient (nested loops, shared
    code only in numpy)."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import (
        focal_slope_tiled,
        sample_hillshade_pixels,
    )

    arr = _rand_raster(96, 80, seed=41)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(arr.shape[0]))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=32))
    slope = focal_slope_tiled(tiles, arr.shape, NODATA, tile_size=32)
    got = (
        pa.concat_tables(
            sample_hillshade_pixels(slope, arr.shape[1], 1).iter_batches(
                batch_format="pyarrow"
            )
        )
        .to_pandas()
        .set_index(["row", "col"])
        .sort_index()
    )
    h, w = arr.shape
    a = arr.astype(np.float64)
    valid = a != NODATA
    lx, ly, lz = -1, -1, 1
    sq3 = float(np.sqrt(3.0))
    for r in range(h):
        for c in range(w):
            rec = got.loc[(r, c)]
            if r == 0 or c == 0 or r == h - 1 or c == w - 1 or not valid[
                r - 1 : r + 2, c - 1 : c + 2
            ].all():
                assert np.isnan(rec["shade"])
                continue
            win = a[r - 1 : r + 2, c - 1 : c + 2]
            gx = (win[0, 2] + 2 * win[1, 2] + win[2, 2]) - (
                win[0, 0] + 2 * win[1, 0] + win[2, 0]
            )
            gy = (win[2, 0] + 2 * win[2, 1] + win[2, 2]) - (
                win[0, 0] + 2 * win[0, 1] + win[0, 2]
            )
            num = -gx * lx - gy * ly + 8 * lz
            shade = max(num / np.sqrt(gx * gx + gy * gy + 64.0) / sq3, 0.0)
            assert rec["hs_num"] == num
            assert rec["shade"] == shade


def test_pyramid_matches_base_pooling(ray_session):
    """Level-from-level pyramid == direct factor-2^L pooling from base
    (associative integer sums), for every level, incl. all-nodata coarse
    blocks and non-divisible raster edges."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import pyramid_levels

    arr = _rand_raster(67, 45, seed=43)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(arr.shape[0]))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=16))
    got = (
        pa.concat_tables(
            pyramid_levels(tiles, NODATA, n_levels=3).iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .set_index(["level", "crow", "ccol"])
        .sort_index()
    )
    h, w = arr.shape
    a = arr.astype(np.float64)
    n_rows = 0
    for lv in (1, 2, 3):
        f = 2 ** lv
        for cr in range(-(-h // f)):
            for cc in range(-(-w // f)):
                blk = a[cr * f : (cr + 1) * f, cc * f : (cc + 1) * f]
                ok = blk != NODATA
                rec = got.loc[(lv, cr, cc)]
                n_rows += 1
                assert rec["cnt"] == int(ok.sum())
                if ok.sum() == 0:
                    assert np.isnan(rec["sum"]) and np.isnan(rec["mean"])
                else:
                    assert rec["sum"] == float(blk[ok].sum())
                    assert rec["mean"] == float(blk[ok].sum()) / int(ok.sum())
    assert len(got) == n_rows


def test_proximity_and_density_match_bruteforce(ray_session):
    """Pixel-center proximity (k=1 grid-index lookup) vs a brute-force
    argmin over all reference points; point-density raster vs a numpy
    floor-binning reference."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import sample_pixel_centers
    from python_rasterstats_ray.stages.knn_points import knn_points

    h, w = 48, 40
    arr = _rand_raster(h, w, seed=47, holes=False)
    rng = np.random.default_rng(53)
    px = rng.uniform(-5.0, w + 5.0, 37)
    py = rng.uniform(-5.0, h + 5.0, 37)
    ids = np.arange(37, dtype=np.int64)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=16))
    pix = sample_pixel_centers(tiles, h, w, 7)
    res = (
        pa.concat_tables(
            knn_points(pix, px, py, ids, k=1).iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .set_index("query_id")
        .sort_index()
    )
    for flat in range(0, h * w, 7):
        r, c = divmod(flat, w)
        qx, qy = c + 0.5, h - r - 0.5
        d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
        best = int(np.lexsort((ids, d2))[0])
        assert res.loc[flat]["neighbor_id"] == best
        assert res.loc[flat]["distance_sq"] == d2[best]


@pytest.mark.parametrize(
    "out_shape,y_map,x_map,tile_size",
    [((80, 70), (8, 1, 7), (9, 2, 8), 32), ((30, 90), (5, 0, 3), (2, 1, 5), 16)],
)
def test_warp_bilinear_matches_reference(ray_session, out_shape, y_map, x_map, tile_size):
    """Bilinear warp vs a per-pixel nested-loop reference with the same
    integer fixed-point semantics: zero-weight neighbors ignored, any
    needed out-of-bounds/nodata neighbor nulls the pixel."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import warp_bilinear_tiled

    arr = _rand_raster(64, 56, seed=59)
    h, w = arr.shape
    oh, ow = out_shape
    ny, oy, dy = y_map
    nx, ox, dx = x_map
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size))
    out = warp_bilinear_tiled(
        tiles, arr.shape, out_shape, NODATA, y_map=y_map, x_map=x_map, tile_size=tile_size
    )
    got = np.full(out_shape, np.nan)
    got_ok = np.zeros(out_shape, bool)
    seen = np.zeros(out_shape, bool)
    for batch in out.iter_batches(batch_format="pyarrow"):
        for i in range(len(batch)):
            r0, c0 = batch["row_off"][i].as_py(), batch["col_off"][i].as_py()
            th, tw = batch["height"][i].as_py(), batch["width"][i].as_py()
            vals = np.frombuffer(batch["vals"][i].as_buffer(), np.float64).reshape(th, tw)
            ok = np.frombuffer(batch["ok"][i].as_buffer(), np.uint8).reshape(th, tw)
            got[r0 : r0 + th, c0 : c0 + tw] = vals
            got_ok[r0 : r0 + th, c0 : c0 + tw] = ok.astype(bool)
            seen[r0 : r0 + th, c0 : c0 + tw] = True
    assert seen.all()
    a = np.rint(arr.astype(np.float64)).astype(np.int64)
    valid = arr != NODATA
    for r in range(oh):
        for c in range(ow):
            i0, my = divmod(r * ny + oy, dy)
            j0, mx = divmod(c * nx + ox, dx)
            # explicit 4-corner loop (weights (dy-my|my) x (dx-mx|mx))
            ok = True
            V = 0
            for ri, wy in ((0, dy - my), (1, my)):
                for ci, wx in ((0, dx - mx), (1, mx)):
                    wgt = wy * wx
                    if wgt == 0:
                        continue
                    rr, cc = i0 + ri, j0 + ci
                    if not (0 <= rr < h and 0 <= cc < w) or not valid[rr, cc]:
                        ok = False
                        break
                    V += wgt * int(a[rr, cc])
                if not ok:
                    break
            if not ok:
                assert not got_ok[r, c]
            else:
                assert got_ok[r, c]
                assert got[r, c] == V / float(dx * dy)


@pytest.mark.parametrize("tile_size", [16, 32, 96])
def test_flow_trace_matches_walk(ray_session, tile_size):
    """flow_trace (per-tile pointer doubling + contracted ring graph) vs
    a naive per-seed Python walk over the reference D8 grid; small tiles
    force many cross-tile hops through the contraction."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import flow_direction_tiled, flow_trace

    arr = _rand_raster(96, 80, seed=61)
    h, w = arr.shape
    ref_d8, ref_ok = _d8_reference(arr)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size))
    d8 = flow_direction_tiled(tiles, arr.shape, NODATA, tile_size=tile_size)
    got = (
        pa.concat_tables(flow_trace(d8, arr.shape, 13).iter_batches(batch_format="pyarrow"))
        .to_pandas()
        .set_index(["row", "col"])
        .sort_index()
    )
    code_step = {1: (0, 1), 2: (1, 1), 4: (1, 0), 8: (1, -1),
                 16: (0, -1), 32: (-1, -1), 64: (-1, 0), 128: (-1, 1)}
    n_seeds = 0
    for flat in range(0, h * w, 13):
        r, c = divmod(flat, w)
        if not ref_ok[r, c]:
            continue
        n_seeds += 1
        cr, cc, steps = r, c, 0
        while ref_d8[cr, cc] != 0:
            dr, dc = code_step[int(ref_d8[cr, cc])]
            cr, cc = cr + dr, cc + dc
            steps += 1
        rec = got.loc[(r, c)]
        assert rec["steps"] == steps
        assert rec["term_row"] == cr and rec["term_col"] == cc
    assert len(got) == n_seeds


def _flood_fill_regions(arr):
    """Independent sequential BFS flood fill: region_id = min flat index."""
    from collections import deque

    h, w = arr.shape
    valid = arr != NODATA
    seen = np.zeros_like(valid)
    regions = {}
    for r in range(h):
        for c in range(w):
            if not valid[r, c] or seen[r, c]:
                continue
            v = arr[r, c]
            q = deque([(r, c)])
            seen[r, c] = True
            members = []
            while q:
                rr, cc = q.popleft()
                members.append((rr, cc))
                for dr, dc in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                    nr, nc = rr + dr, cc + dc
                    if (
                        0 <= nr < h and 0 <= nc < w
                        and valid[nr, nc] and not seen[nr, nc]
                        and arr[nr, nc] == v
                    ):
                        seen[nr, nc] = True
                        q.append((nr, nc))
            rid = min(m[0] * w + m[1] for m in members)
            rs = [m[0] for m in members]
            cs = [m[1] for m in members]
            regions[rid] = (int(v), len(members), min(rs), min(cs), max(rs), max(cs))
    return regions


@pytest.mark.parametrize("tile_size", [16, 25, 64])
def test_polygonize_matches_flood_fill(ray_session, tile_size):
    """Distributed two-level CC polygonize vs a sequential flood fill:
    region ids, values, counts and bboxes all bit-equal; small and
    non-divisible tiles force regions to span many tiles."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.polygonize import polygonize_tiled

    rng = np.random.default_rng(67)
    arr = rng.integers(1, 4, size=(60, 50)).astype(np.float32)
    arr[10:20, 5:15] = NODATA
    h, w = arr.shape
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size))
    got = (
        pa.concat_tables(
            polygonize_tiled(tiles, arr.shape, NODATA, tile_size=tile_size).iter_batches(
                batch_format="pyarrow"
            )
        )
        .to_pandas()
        .set_index("region_id")
        .sort_index()
    )
    ref = _flood_fill_regions(arr)
    assert len(got) == len(ref)
    for rid, (v, n, r0, c0, r1, c1) in ref.items():
        g = got.loc[rid]
        assert g["value"] == v and g["px_count"] == n
        assert (g["min_row"], g["min_col"], g["max_row"], g["max_col"]) == (r0, c0, r1, c1)


def test_polygonize_single_region_spanning_all_tiles(ray_session):
    """One giant constant region across every tile (the worst stitch
    case) plus isolated single pixels."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.polygonize import polygonize_tiled

    arr = np.full((40, 40), 7.0, dtype=np.float32)
    arr[5, 5] = 9.0
    arr[30, 33] = 9.0
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 40.0)
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=8))
    got = (
        pa.concat_tables(
            polygonize_tiled(tiles, arr.shape, NODATA, tile_size=8).iter_batches(
                batch_format="pyarrow"
            )
        )
        .to_pandas()
        .set_index("region_id")
        .sort_index()
    )
    assert len(got) == 3
    big = got.loc[0]
    assert big["value"] == 7 and big["px_count"] == 40 * 40 - 2
    assert got.loc[5 * 40 + 5]["px_count"] == 1
    assert got.loc[30 * 40 + 33]["px_count"] == 1


@pytest.mark.parametrize("tile_size", [16, 25, 96])
def test_flow_accumulation_matches_walk(ray_session, tile_size):
    """flow_accumulation (two-pass tile contraction) vs a naive reference
    that walks every valid pixel's D8 path and counts visits."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import flow_accumulation

    arr = _rand_raster(96, 80, seed=71)
    h, w = arr.shape
    ref_d8, ref_ok = _d8_reference(arr)
    code_step = {1: (0, 1), 2: (1, 1), 4: (1, 0), 8: (1, -1),
                 16: (0, -1), 32: (-1, -1), 64: (-1, 0), 128: (-1, 1)}
    ref_acc = np.zeros((h, w), np.int64)
    for r in range(h):
        for c in range(w):
            if not ref_ok[r, c]:
                continue
            cr, cc = r, c
            ref_acc[cr, cc] += 1
            while ref_d8[cr, cc] != 0:
                dr, dc = code_step[int(ref_d8[cr, cc])]
                cr, cc = cr + dr, cc + dc
                ref_acc[cr, cc] += 1
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size))
    got = (
        pa.concat_tables(
            flow_accumulation(tiles, arr.shape, NODATA, 1, tile_size=tile_size).iter_batches(
                batch_format="pyarrow"
            )
        )
        .to_pandas()
        .set_index(["row", "col"])
        .sort_index()
    )
    assert len(got) == int(ref_ok.sum())
    for (r, c), rec in got.iterrows():
        assert rec["acc"] == ref_acc[r, c], (r, c)


def test_flow_accumulation_store_matches_shuffle(ray_session, tmp_path):
    """The shuffle-free store plan is bit-identical to the halo-exchange
    plan on the same raster."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import (
        flow_accumulation,
        flow_accumulation_from_store,
        write_tiles_bucketed,
    )

    arr = _rand_raster(96, 80, seed=73)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(arr.shape[0]))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=32))
    store = str(tmp_path / "facc_store")
    write_tiles_bucketed(tiles, store, arr.shape, tile_size=32, radius=1)
    a = (
        pa.concat_tables(
            flow_accumulation(tiles, arr.shape, NODATA, 7, tile_size=32).iter_batches(
                batch_format="pyarrow"
            )
        )
        .to_pandas()
        .sort_values(["row", "col"])
        .reset_index(drop=True)
    )
    b = (
        pa.concat_tables(
            flow_accumulation_from_store(store, arr.shape, NODATA, 7, tile_size=32)
            .iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .sort_values(["row", "col"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_aspect_matches_reference(ray_session):
    """Aspect-octant sample vs a nested-loop reference computing the
    Horn gradient and the best-projection D8 code directly."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import (
        focal_slope_tiled,
        sample_aspect_pixels,
    )

    arr = _rand_raster(60, 50, seed=79)
    h, w = arr.shape
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=16))
    slope = focal_slope_tiled(tiles, arr.shape, NODATA, tile_size=16)
    got = (
        pa.concat_tables(
            sample_aspect_pixels(slope, w, 1).iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .set_index(["row", "col"])
        .sort_index()
    )
    a = arr.astype(np.float64)
    valid = a != NODATA
    dirs = [(0, 1, 1, 2), (1, 1, 2, 1), (1, 0, 4, 2), (1, -1, 8, 1),
            (0, -1, 16, 2), (-1, -1, 32, 1), (-1, 0, 64, 2), (-1, 1, 128, 1)]
    n_flat = n_dir = 0
    for r in range(h):
        for c in range(w):
            rec = got.loc[(r, c)]
            if (r == 0 or c == 0 or r == h - 1 or c == w - 1
                    or not valid[r - 1 : r + 2, c - 1 : c + 2].all()):
                assert np.isnan(rec["aspect_d8"])
                continue
            win = a[r - 1 : r + 2, c - 1 : c + 2]
            gx = (win[0, 2] + 2 * win[1, 2] + win[2, 2]) - (
                win[0, 0] + 2 * win[1, 0] + win[2, 0]
            )
            gy = (win[2, 0] + 2 * win[2, 1] + win[2, 2]) - (
                win[0, 0] + 2 * win[0, 1] + win[0, 2]
            )
            best_m, best_code = 0, 0
            for dr, dc, code, mult in dirs:
                proj = -(gx * dc + gy * dr)
                m = mult * proj * proj
                if proj > 0 and m > best_m:
                    best_m, best_code = m, code
            assert rec["aspect_d8"] == best_code
            if best_code == 0:
                n_flat += 1
            else:
                n_dir += 1
    assert n_dir > 0  # the surface actually slopes somewhere


@pytest.mark.parametrize("radius,tile_size", [(1, 16), (2, 32)])
def test_majority_matches_reference(ray_session, radius, tile_size):
    """Focal majority vs a nested-loop mode reference with the
    smallest-value tie-break."""
    from collections import Counter

    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import (
        focal_majority_tiled,
        sample_majority_pixels,
    )

    rng = np.random.default_rng(83)
    arr = rng.integers(1, 5, size=(48, 40)).astype(np.float32)
    arr[10:16, 8:20] = NODATA
    h, w = arr.shape
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size))
    maj = focal_majority_tiled(tiles, arr.shape, NODATA, radius=radius, tile_size=tile_size)
    got = (
        pa.concat_tables(
            sample_majority_pixels(maj, w, 1).iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .set_index(["row", "col"])
        .sort_index()
    )
    valid = arr != NODATA
    for r in range(h):
        for c in range(w):
            r0, r1 = max(0, r - radius), min(h, r + radius + 1)
            c0, c1 = max(0, c - radius), min(w, c + radius + 1)
            win = arr[r0:r1, c0:c1]
            ok = valid[r0:r1, c0:c1]
            rec = got.loc[(r, c)]
            assert rec["fcnt"] == int(ok.sum())
            if ok.sum() == 0:
                assert np.isnan(rec["maj_val"])
                continue
            cnt = Counter(int(v) for v in win[ok])
            best = min(cnt, key=lambda v: (-cnt[v], v))
            assert rec["maj_val"] == best and rec["maj_cnt"] == cnt[best]


def test_reclassify_matches_reference(ray_session):
    """Reclassify: mapped values remap, unmapped valid values and nodata
    both null."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import reclassify_tiled, sample_calc_pixels

    rng = np.random.default_rng(89)
    arr = rng.integers(1, 6, size=(30, 25)).astype(np.float32)
    arr[3:6, 3:9] = NODATA
    mapping = {1: 10.0, 2: 20.0, 3: -5.0, 4: 40.0}
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 30.0)
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=8))
    got = (
        pa.concat_tables(
            sample_calc_pixels(reclassify_tiled(tiles, mapping, NODATA), 25, 1)
            .iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .set_index(["row", "col"])
        .sort_index()
    )
    for r in range(30):
        for c in range(25):
            v = arr[r, c]
            rec = got.loc[(r, c)]
            if v == NODATA or int(v) not in mapping:
                assert np.isnan(rec["value"])
            else:
                assert rec["value"] == mapping[int(v)]


def test_focal_std_matches_reference(ray_session):
    """Focal std vs a nested-loop population-std reference using the
    identical IEEE expression."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import focal_std_tiled, sample_std_pixels

    arr = _rand_raster(48, 40, seed=97)
    h, w = arr.shape
    radius = 2
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=16))
    std = focal_std_tiled(tiles, arr.shape, NODATA, radius=radius, tile_size=16)
    got = (
        pa.concat_tables(
            sample_std_pixels(std, w, 1).iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
        .set_index(["row", "col"])
        .sort_index()
    )
    a = arr.astype(np.float64)
    valid = a != NODATA
    for r in range(h):
        for c in range(w):
            r0, r1 = max(0, r - radius), min(h, r + radius + 1)
            c0, c1 = max(0, c - radius), min(w, c + radius + 1)
            win = a[r0:r1, c0:c1]
            ok = valid[r0:r1, c0:c1]
            rec = got.loc[(r, c)]
            cnt = int(ok.sum())
            assert rec["fcnt"] == cnt
            if cnt == 0:
                assert np.isnan(rec["fstd"])
                continue
            s = float(win[ok].sum())
            q = float((win[ok] * win[ok]).sum())
            mean = s / cnt
            ref = np.sqrt(max(q / cnt - mean * mean, 0.0))
            assert rec["fsum"] == s and rec["fsq"] == q
            assert rec["fstd"] == ref


def test_raster_quantiles_match_sorted(ray_session):
    """Exact histogram quantiles vs a plain sorted-array reference,
    across tile layouts."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import raster_value_quantiles

    arr = _rand_raster(50, 44, seed=101)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 50.0)
    vals = np.sort(
        np.rint(arr[arr != NODATA].astype(np.float64)).astype(np.int64)
    )
    n = len(vals)
    for tile_size in (16, 50):
        tiles = ray.data.from_arrow(
            raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size)
        )
        got = (
            pa.concat_tables(
                raster_value_quantiles(tiles, NODATA, qs=(0.25, 0.5, 0.9)).iter_batches(
                    batch_format="pyarrow"
                )
            )
            .to_pandas()
            .set_index("q_millis")
            .sort_index()
        )
        for qm in (250, 500, 900):
            target = -(-qm * n // 1000)
            ref = int(vals[max(target, 1) - 1])
            assert got.loc[qm]["value"] == ref
            assert got.loc[qm]["n_valid"] == n


def test_cost_distance_matches_bfs(ray_session):
    """Distributed superstep cost distance vs a sequential deque BFS,
    across tile layouts, incl. value-derived obstacles, unreachable
    pockets (null dist) and a seed on an impassable pixel (ignored)."""
    from collections import deque

    import pandas as pd

    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import (
        cost_distance_tiled,
        sample_cost_pixels,
    )

    arr = _rand_raster(60, 52, seed=131)
    h, w = arr.shape
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    vals = np.rint(arr.astype(np.float64)).astype(np.int64)
    passable = (arr != NODATA) & (vals % 5 != 0)
    seeds = [(3, 4), (50, 40), (0, 0)]  # (0,0) may be impassable: ignored

    INF = 1 << 62
    ref = np.full(arr.shape, INF, dtype=np.int64)
    dq = deque()
    for s in seeds:
        if passable[s]:
            ref[s] = 0
            dq.append(s)
    while dq:
        r, c = dq.popleft()
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nr, nc = r + dr, c + dc
            if 0 <= nr < h and 0 <= nc < w and passable[nr, nc] and ref[nr, nc] > ref[r, c] + 1:
                ref[nr, nc] = ref[r, c] + 1
                dq.append((nr, nc))

    def passable_fn(a, valid):
        v = np.rint(a.astype(np.float64)).astype(np.int64)
        return valid & (v % 5 != 0)

    for tile_size in (16, 32, 64):
        tiles = ray.data.from_arrow(
            raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size)
        )
        dist = cost_distance_tiled(
            tiles, arr.shape, NODATA, seeds, tile_size=tile_size, passable_fn=passable_fn
        )
        got = (
            pa.concat_tables(
                sample_cost_pixels(dist, w, 1).iter_batches(batch_format="pyarrow")
            )
            .to_pandas()
            .set_index(["row", "col"])
            .sort_index()
        )
        assert len(got) == int(passable.sum())
        for (r, c), rec in got.iterrows():
            if ref[r, c] >= INF:
                assert pd.isna(rec["dist"]), (r, c)
            else:
                assert rec["dist"] == ref[r, c], (r, c)


def test_cost_distance_no_reachable_seed(ray_session):
    """All seeds impassable -> every passable pixel unreachable (null)."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import (
        cost_distance_tiled,
        sample_cost_pixels,
    )

    arr = np.full((20, 20), 3.0, dtype=np.float32)
    arr[5, 5] = NODATA
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 20.0)
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=8))
    dist = cost_distance_tiled(tiles, arr.shape, NODATA, [(5, 5)], tile_size=8)
    got = pa.concat_tables(
        sample_cost_pixels(dist, 20, 1).iter_batches(batch_format="pyarrow")
    ).to_pandas()
    assert len(got) == 399
    assert got["dist"].isna().all()


def _terrain_reference(arr):
    """Nested-loop TRI/TPI/roughness on fully-valid 3x3 windows."""
    h, w = arr.shape
    a = arr.astype(np.float64)
    valid = a != NODATA
    tri = np.zeros((h, w), np.int64)
    tpi = np.zeros((h, w), np.int64)
    rough = np.zeros((h, w), np.int64)
    ok = np.zeros((h, w), bool)
    for r in range(1, h - 1):
        for c in range(1, w - 1):
            win = a[r - 1 : r + 2, c - 1 : c + 2]
            if not valid[r - 1 : r + 2, c - 1 : c + 2].all():
                continue
            ok[r, c] = True
            e = a[r, c]
            nb = np.delete(win.ravel(), 4)
            tri[r, c] = int(np.abs(e - nb).sum())
            tpi[r, c] = int(8 * e - nb.sum())
            rough[r, c] = int(win.max() - win.min())
    return tri, tpi, rough, ok


@pytest.mark.parametrize("tile_size", [16, 32, 96])
def test_terrain_matches_reference(ray_session, tile_size):
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import focal_terrain_tiled

    arr = _rand_raster(96, 80, seed=47)
    ref_tri, ref_tpi, ref_rough, ref_ok = _terrain_reference(arr)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(arr.shape[0]))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size))
    out = focal_terrain_tiled(tiles, arr.shape, NODATA, tile_size=tile_size)
    got_tri = np.zeros(arr.shape, np.int64)
    got_tpi = np.zeros(arr.shape, np.int64)
    got_rough = np.zeros(arr.shape, np.int64)
    got_ok = np.zeros(arr.shape, bool)
    for batch in out.iter_batches(batch_format="pyarrow"):
        for i in range(len(batch)):
            r0, c0 = batch["row_off"][i].as_py(), batch["col_off"][i].as_py()
            th, tw = batch["height"][i].as_py(), batch["width"][i].as_py()
            sl = np.s_[r0 : r0 + th, c0 : c0 + tw]
            got_tri[sl] = np.frombuffer(batch["tri_num"][i].as_buffer(), np.int64).reshape(th, tw)
            got_tpi[sl] = np.frombuffer(batch["tpi_num"][i].as_buffer(), np.int64).reshape(th, tw)
            got_rough[sl] = np.frombuffer(batch["rough"][i].as_buffer(), np.int64).reshape(th, tw)
            got_ok[sl] = np.frombuffer(batch["ok"][i].as_buffer(), np.uint8).reshape(th, tw).astype(bool)
    assert np.array_equal(got_ok, ref_ok)
    assert np.array_equal(got_tri[got_ok], ref_tri[ref_ok])
    assert np.array_equal(got_tpi[got_ok], ref_tpi[ref_ok])
    assert np.array_equal(got_rough[got_ok], ref_rough[ref_ok])


@pytest.mark.parametrize("tile_size", [16, 32, 96])
def test_contour_crossings_match_reference(ray_session, tile_size):
    """Every straddling valid pair emitted exactly once (incl. pairs
    spanning tile borders), exact t, nodata pairs skipped."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import contour_crossings

    arr = _rand_raster(60, 52, seed=71)
    h, w = arr.shape
    a = arr.astype(np.float64)
    valid = a != NODATA
    levels = (20, 65)
    ref = {}
    for r in range(h):
        for c in range(w):
            if not valid[r, c]:
                continue
            for direction, (nr, nc) in ((0, (r, c + 1)), (1, (r + 1, c))):
                if nr >= h or nc >= w or not valid[nr, nc]:
                    continue
                for lv in levels:
                    if (a[r, c] < lv) != (a[nr, nc] < lv):
                        ref[(lv, r, c, direction)] = (float(lv) - a[r, c]) / (
                            a[nr, nc] - a[r, c]
                        )
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size))
    out = contour_crossings(tiles, arr.shape, NODATA, levels, tile_size=tile_size, mod=1)
    got = {}
    for batch in out.iter_batches(batch_format="pyarrow"):
        for rec in batch.to_pylist():
            key = (rec["level"], rec["row"], rec["col"], rec["dir"])
            assert key not in got, f"duplicate crossing {key}"
            got[key] = rec["t"]
    assert got.keys() == ref.keys()
    for k, t in ref.items():
        assert got[k] == t, k


def _sieve_reference(arr, nodata, threshold):
    """Sequential one-pass sieve: flood-fill regions, sizes on the
    original labeling, each small region takes the value of its largest
    neighbor (size DESC, region id ASC); no valid neighbor -> keep."""
    from collections import deque

    h, w = arr.shape
    a = np.rint(arr.astype(np.float64)).astype(np.int64)
    valid = arr != nodata
    lab = np.full((h, w), -1, np.int64)
    for r in range(h):
        for c in range(w):
            if not valid[r, c] or lab[r, c] >= 0:
                continue
            rid = r * w + c
            lab[r, c] = rid
            dq = deque([(r, c)])
            while dq:
                cr, cc = dq.popleft()
                for nr, nc in ((cr + 1, cc), (cr - 1, cc), (cr, cc + 1), (cr, cc - 1)):
                    if (0 <= nr < h and 0 <= nc < w and valid[nr, nc]
                            and lab[nr, nc] < 0 and a[nr, nc] == a[cr, cc]):
                        lab[nr, nc] = rid
                        dq.append((nr, nc))
    regions = {}
    for r in range(h):
        for c in range(w):
            if valid[r, c]:
                regions.setdefault(lab[r, c], [0, int(a[r, c])])[0] += 1
    adj = {}
    for r in range(h):
        for c in range(w):
            if not valid[r, c]:
                continue
            for nr, nc in ((r + 1, c), (r, c + 1)):
                if nr < h and nc < w and valid[nr, nc] and lab[nr, nc] != lab[r, c]:
                    adj.setdefault(lab[r, c], set()).add(lab[nr, nc])
                    adj.setdefault(lab[nr, nc], set()).add(lab[r, c])
    out = arr.copy()
    for rid, (size, _val) in regions.items():
        if size >= threshold or rid not in adj:
            continue
        best = min(adj[rid], key=lambda n: (-regions[n][0], n))
        out[lab == rid] = np.asarray(regions[best][1]).astype(arr.dtype)
    return out


@pytest.mark.parametrize("tile_size", [16, 32, 96])
def test_sieve_matches_reference(ray_session, tile_size):
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.polygonize import sieve_tiled

    rng = np.random.default_rng(91)
    arr = rng.integers(0, 4, size=(60, 52)).astype(np.float32)
    arr[rng.random((60, 52)) < 0.05] = NODATA  # nodata holes
    ref = _sieve_reference(arr, NODATA, threshold=6)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 60.0)
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size))
    out = sieve_tiled(tiles, arr.shape, NODATA, threshold=6, tile_size=tile_size)
    got = np.full(arr.shape, NODATA, np.float32)
    for batch in out.iter_batches(batch_format="pyarrow"):
        for i in range(len(batch)):
            r0, c0 = batch["row_off"][i].as_py(), batch["col_off"][i].as_py()
            th, tw = batch["height"][i].as_py(), batch["width"][i].as_py()
            got[r0 : r0 + th, c0 : c0 + tw] = np.frombuffer(
                batch["pixels"][i].as_buffer(), dtype=np.dtype(batch["dtype"][i].as_py())
            ).reshape(th, tw)
    assert np.array_equal(got, ref)
    assert (got != arr).any()  # the workload actually sieves something


def test_sieve_region_spanning_tiles(ray_session):
    """A small region split across 4 tiles is measured at its GLOBAL
    size: 4 corner pixels of one value meeting at the tile cross must
    count as one region of 4, not four regions of 1."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.polygonize import sieve_tiled

    arr = np.zeros((8, 8), dtype=np.float32)
    arr[3:5, 3:5] = 7.0  # 2x2 region of value 7 spanning the 4x4 tile cross
    ref = _sieve_reference(arr, NODATA, threshold=5)
    assert (ref[3:5, 3:5] == 0.0).all()  # size 4 < 5: sieved into the 0-sea
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 8.0)
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=4))
    out = sieve_tiled(tiles, arr.shape, NODATA, threshold=5, tile_size=4)
    got = np.zeros(arr.shape, np.float32)
    for batch in out.iter_batches(batch_format="pyarrow"):
        for i in range(len(batch)):
            r0, c0 = batch["row_off"][i].as_py(), batch["col_off"][i].as_py()
            th, tw = batch["height"][i].as_py(), batch["width"][i].as_py()
            got[r0 : r0 + th, c0 : c0 + tw] = np.frombuffer(
                batch["pixels"][i].as_buffer(), dtype=np.dtype(batch["dtype"][i].as_py())
            ).reshape(th, tw)
    assert np.array_equal(got, ref)

    # threshold 4 keeps it (size 4 >= 4)
    out2 = sieve_tiled(tiles, arr.shape, NODATA, threshold=4, tile_size=4)
    got2 = np.zeros(arr.shape, np.float32)
    for batch in out2.iter_batches(batch_format="pyarrow"):
        for i in range(len(batch)):
            r0, c0 = batch["row_off"][i].as_py(), batch["col_off"][i].as_py()
            th, tw = batch["height"][i].as_py(), batch["width"][i].as_py()
            got2[r0 : r0 + th, c0 : c0 + tw] = np.frombuffer(
                batch["pixels"][i].as_buffer(), dtype=np.dtype(batch["dtype"][i].as_py())
            ).reshape(th, tw)
    assert np.array_equal(got2, arr)


def test_cost_allocation_matches_bfs(ray_session):
    """allocate=True vs a sequential (dist, seed-index) lexicographic
    BFS, incl. a pixel shared by two seeds (smallest index wins) and
    equidistant frontier ties."""
    from collections import deque

    import pandas as pd

    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import (
        cost_distance_tiled,
        sample_alloc_pixels,
    )

    arr = _rand_raster(48, 40, seed=57)
    h, w = arr.shape
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    vals = np.rint(arr.astype(np.float64)).astype(np.int64)
    passable = (arr != NODATA) & (vals % 6 != 0)
    seeds = [(2, 3), (40, 35), (2, 3), (20, 20)]  # duplicate pixel: index 0 wins

    INF = 1 << 62
    n = len(seeds)
    comp = np.full(arr.shape, INF, dtype=np.int64)
    dq = deque()
    for i, s in enumerate(seeds):
        if passable[s] and comp[s] > i:
            comp[s] = i
            dq.append(s)
    while dq:
        r, c = dq.popleft()
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nr, nc = r + dr, c + dc
            if (0 <= nr < h and 0 <= nc < w and passable[nr, nc]
                    and comp[nr, nc] > comp[r, c] + n):
                comp[nr, nc] = comp[r, c] + n
                dq.append((nr, nc))

    def passable_fn(a, valid):
        v = np.rint(a.astype(np.float64)).astype(np.int64)
        return valid & (v % 6 != 0)

    for tile_size in (16, 48):
        tiles = ray.data.from_arrow(
            raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size)
        )
        alloc = cost_distance_tiled(
            tiles, arr.shape, NODATA, seeds, tile_size=tile_size,
            passable_fn=passable_fn, allocate=True,
        )
        got = (
            pa.concat_tables(
                sample_alloc_pixels(alloc, w, 1, n_seeds=n).iter_batches(
                    batch_format="pyarrow"
                )
            )
            .to_pandas()
            .set_index(["row", "col"])
            .sort_index()
        )
        assert len(got) == int(passable.sum())
        for (r, c), rec in got.iterrows():
            if comp[r, c] >= INF:
                assert pd.isna(rec["dist"]) and pd.isna(rec["seed"]), (r, c)
            else:
                assert rec["dist"] == comp[r, c] // n, (r, c)
                assert rec["seed"] == comp[r, c] % n, (r, c)


def test_zonal_weighted_by_raster_hand_cases(ray_session):
    """Weight-raster zonal against hand-computable rectangles: center
    rule membership, both-valid requirement, zero-weight totals."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.functions.geometry import make_box, to_wkb
    from python_rasterstats_ray.stages.weighted import (
        zonal_weighted_by_raster_broadcast,
    )

    varr = np.arange(100, dtype=np.float32).reshape(10, 10)  # v = row*10+col
    varr[0, 3] = NODATA  # nodata VALUE at (0,3)
    warr = np.ones((10, 10), dtype=np.float32) * 2.0
    warr[0, 4] = NODATA  # nodata WEIGHT at (0,4)
    warr[9, 0] = 0.0     # zero weight at (9,0)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 10.0)
    rects = {
        # zone 0: pixels rows 8..9, cols 2..5 (6 cells), all valid, w=2
        0: (2.0, 0.0, 5.0, 2.0),
        # zone 1: top row cols 2..6 -> pixels (0,2..5); (0,3) v-nodata,
        # (0,4) w-nodata -> valid {(0,2),(0,5)}
        1: (2.0, 9.0, 6.0, 10.0),
        # zone 2: fully outside
        2: (20.0, 20.0, 25.0, 25.0),
        # zone 3: ONLY the zero-weight pixel (9,0) -> wtot 0, wmean null
        3: (0.0, 0.0, 1.0, 1.0),
        # zone 4: boundary exactness: x 2.5..4.5 strictly excludes the
        # center of col 2 (2.5 not > 2.5) and of col 4 -> col 3 only
        4: (2.5, 0.0, 4.5, 1.0),
    }
    tbl = pa.table(
        {
            "zone_id": pa.array(sorted(rects), pa.int64()),
            "geom_wkb": pa.array(
                [to_wkb(make_box(*rects[z])) for z in sorted(rects)], pa.binary()
            ),
        }
    )
    got = (
        zonal_weighted_by_raster_broadcast(
            ray.data.from_arrow(tbl), (varr, aff, NODATA), (warr, aff, NODATA)
        )
        .to_pandas()
        .set_index("zone_id")
    )
    z0 = got.loc[0]
    v0 = varr[8:10, 2:5].astype(np.int64)
    assert z0["n_px"] == 6 and z0["wtot"] == 12
    assert z0["wsum"] == 2 * v0.sum() and z0["wmean"] == v0.mean()
    z1 = got.loc[1]
    assert z1["n_px"] == 2 and z1["wtot"] == 4
    assert z1["wsum"] == 2 * (2 + 5) and z1["wmean"] == (2 + 5) / 2
    z2 = got.loc[2]
    assert z2["n_px"] == 0 and np.isnan(z2["wmean"])
    z3 = got.loc[3]
    assert z3["n_px"] == 1 and z3["wtot"] == 0 and z3["wsum"] == 0
    assert np.isnan(z3["wmean"])
    z4 = got.loc[4]
    assert z4["n_px"] == 1 and z4["wsum"] == 2 * 93  # pixel (9,3): v=93


def _median_reference(arr, radius):
    h, w = arr.shape
    a = arr.astype(np.float64)
    valid = a != NODATA
    med = np.full((h, w), np.nan)
    cnt = np.zeros((h, w), np.int64)
    for r in range(h):
        for c in range(w):
            r0, r1 = max(0, r - radius), min(h, r + radius + 1)
            c0, c1 = max(0, c - radius), min(w, c + radius + 1)
            v = np.sort(a[r0:r1, c0:c1][valid[r0:r1, c0:c1]])
            cnt[r, c] = len(v)
            if len(v):
                med[r, c] = (v[(len(v) - 1) // 2] + v[len(v) // 2]) / 2.0
    return med, cnt


@pytest.mark.parametrize("radius,tile_size", [(1, 32), (2, 16), (2, 96)])
def test_focal_median_matches_reference(ray_session, radius, tile_size):
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import focal_median_tiled

    arr = _rand_raster(60, 52, seed=83)
    ref_m, ref_c = _median_reference(arr, radius)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 60.0)
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size))
    out = focal_median_tiled(tiles, arr.shape, NODATA, radius=radius, tile_size=tile_size)
    got_m = np.full(arr.shape, np.nan)
    got_c = np.zeros(arr.shape, np.int64)
    for batch in out.iter_batches(batch_format="pyarrow"):
        for i in range(len(batch)):
            r0, c0 = batch["row_off"][i].as_py(), batch["col_off"][i].as_py()
            th, tw = batch["height"][i].as_py(), batch["width"][i].as_py()
            got_m[r0 : r0 + th, c0 : c0 + tw] = np.frombuffer(
                batch["fmed"][i].as_buffer(), np.float64
            ).reshape(th, tw)
            got_c[r0 : r0 + th, c0 : c0 + tw] = np.frombuffer(
                batch["fcnt"][i].as_buffer(), np.int64
            ).reshape(th, tw)
    assert np.array_equal(got_c, ref_c)
    ok = ref_c > 0
    assert np.array_equal(got_m[ok], ref_m[ok])
    assert np.isnan(got_m[~ok]).all()


def _polylines_reference(arr, nodata, levels):
    """Sequential marching squares (same fixed saddle table) +
    union-find; returns {(level, line_id, n_pts, closed)}."""
    from python_rasterstats_ray.stages.focal import _MS_SEGMENTS

    h, w = arr.shape
    a = arr.astype(np.float64)
    valid = a != nodata
    nlv = len(levels)
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx

    edges = set()
    for li, lv in enumerate(levels):
        for r in range(h - 1):
            for c in range(w - 1):
                if not (valid[r, c] and valid[r, c + 1] and valid[r + 1, c] and valid[r + 1, c + 1]):
                    continue
                case = (
                    int(a[r, c] < lv) + 2 * int(a[r, c + 1] < lv)
                    + 4 * int(a[r + 1, c + 1] < lv) + 8 * int(a[r + 1, c] < lv)
                )
                def ekey(e):
                    if e == "T":
                        return (r * w + c) * 2
                    if e == "B":
                        return ((r + 1) * w + c) * 2
                    if e == "L":
                        return (r * w + c) * 2 + 1
                    return (r * w + c + 1) * 2 + 1
                for ea, eb in _MS_SEGMENTS[case]:
                    ka, kb = ekey(ea) * nlv + li, ekey(eb) * nlv + li
                    for k in (ka, kb):
                        if k not in parent:
                            parent[k] = k
                    union(ka, kb)
                    edges.add((min(ka, kb), max(ka, kb)))
    comp_nodes, comp_edges = {}, {}
    for k in parent:
        comp_nodes.setdefault(find(k), set()).add(k)
    for ka, kb in edges:
        comp_edges[find(ka)] = comp_edges.get(find(ka), 0) + 1
    out = set()
    for root, ns in comp_nodes.items():
        ne = comp_edges.get(root, 0)
        lid = min(ns)
        out.add((levels[lid % nlv], lid, len(ns), ne == len(ns)))
    return out


@pytest.mark.parametrize("tile_size", [16, 32, 96])
def test_contour_polylines_match_reference(ray_session, tile_size):
    """Closed loop around a bump, open lines hitting the border, a
    nodata hole cutting a line, cross-tile stitching."""
    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import contour_polylines

    h, w = 40, 36
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    # a smooth bump (closed contours) + a linear ramp (open contours)
    arr = (
        60.0 * np.exp(-((yy - 20) ** 2 + (xx - 18) ** 2) / 60.0) + xx
    ).astype(np.float32)
    arr = np.rint(arr).astype(np.float32)
    arr[5, 5] = NODATA
    levels = (20, 45)
    ref = _polylines_reference(arr, NODATA, levels)
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size))
    out = contour_polylines(tiles, arr.shape, NODATA, levels, tile_size=tile_size)
    got = {
        (r["level"], r["line_id"], r["n_pts"], r["closed"])
        for b in out.iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    assert got == ref
    assert any(cl for (_l, _i, _n, cl) in ref)      # at least one closed loop
    assert any(not cl for (_l, _i, _n, cl) in ref)  # and one open line


def test_weighted_cost_distance_matches_dijkstra(ray_session):
    """weighted=True vs a sequential heapq Dijkstra (edge a->b costs
    v(a)+v(b)), incl. obstacles, unreachable pockets and layouts that
    force paths to recross tile boundaries."""
    import heapq

    import pandas as pd

    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.focal import (
        cost_distance_tiled,
        sample_wcost_pixels,
    )

    rng = np.random.default_rng(101)
    h, w = 40, 36
    arr = rng.integers(1, 100, size=(h, w)).astype(np.float32)
    arr[rng.random((h, w)) < 0.08] = NODATA
    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    passable = arr != NODATA
    vals = np.rint(arr.astype(np.float64)).astype(np.int64)
    seeds = [(2, 3), (35, 30)]

    INF = 1 << 60
    ref = np.full((h, w), INF, np.int64)
    pq = []
    for s in seeds:
        if passable[s]:
            ref[s] = 0
            heapq.heappush(pq, (0, s))
    while pq:
        d, (r, c) = heapq.heappop(pq)
        if d > ref[r, c]:
            continue
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nr, nc = r + dr, c + dc
            if 0 <= nr < h and 0 <= nc < w and passable[nr, nc]:
                nd = d + int(vals[r, c]) + int(vals[nr, nc])
                if nd < ref[nr, nc]:
                    ref[nr, nc] = nd
                    heapq.heappush(pq, (nd, (nr, nc)))

    for tile_size in (16, 48):
        tiles = ray.data.from_arrow(
            raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size)
        )
        wd = cost_distance_tiled(
            tiles, arr.shape, NODATA, seeds, tile_size=tile_size, weighted=True
        )
        got = (
            pa.concat_tables(
                sample_wcost_pixels(wd, w, 1).iter_batches(batch_format="pyarrow")
            )
            .to_pandas()
            .set_index(["row", "col"])
            .sort_index()
        )
        assert len(got) == int(passable.sum())
        for (r, c), rec in got.iterrows():
            if ref[r, c] >= INF:
                assert pd.isna(rec["dist"]), (r, c)
            else:
                assert rec["dist"] == ref[r, c], (r, c, rec["dist"], ref[r, c])


@pytest.mark.parametrize("tile_size", [16, 96])
def test_region_group_matches_flood_fill(ray_session, tile_size):
    """Per-pixel region sizes match a sequential flood fill; region ids
    are min flat indices; nodata pixels absent."""
    from collections import deque

    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.polygonize import region_group_tiled

    rng = np.random.default_rng(17)
    arr = rng.integers(0, 3, size=(50, 44)).astype(np.float32)
    arr[rng.random((50, 44)) < 0.05] = NODATA
    h, w = arr.shape
    a = np.rint(arr.astype(np.float64)).astype(np.int64)
    valid = arr != NODATA
    lab = np.full((h, w), -1, np.int64)
    size = {}
    for r in range(h):
        for c in range(w):
            if not valid[r, c] or lab[r, c] >= 0:
                continue
            rid = r * w + c
            lab[r, c] = rid
            n = 1
            dq = deque([(r, c)])
            while dq:
                cr, cc = dq.popleft()
                for nr, nc in ((cr + 1, cc), (cr - 1, cc), (cr, cc + 1), (cr, cc - 1)):
                    if (0 <= nr < h and 0 <= nc < w and valid[nr, nc]
                            and lab[nr, nc] < 0 and a[nr, nc] == a[cr, cc]):
                        lab[nr, nc] = rid
                        dq.append((nr, nc))
                        n += 1
            size[rid] = n

    aff = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    tiles = ray.data.from_arrow(raster_to_tiles_table(arr, aff, NODATA, tile_size=tile_size))
    out = region_group_tiled(tiles, arr.shape, NODATA, tile_size=tile_size, mod=1)
    got = pa.concat_tables(out.iter_batches(batch_format="pyarrow")).to_pandas()
    assert len(got) == int(valid.sum())
    for rec in got.itertuples():
        assert lab[rec.row, rec.col] == rec.region_id, (rec.row, rec.col)
        assert size[rec.region_id] == rec.region_px
