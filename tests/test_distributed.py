"""Differential tests: distributed Ray Data zonal pipelines vs the
sequential oracle — row-identical stats and tile assignments
(SURVEY.md section 5 engine test plan, FIXTURES.md section 4)."""

import numpy as np
import pytest

from python_rasterstats_ray import zonal_stats
from python_rasterstats_ray.functions.geometry import from_wkb
from python_rasterstats_ray.sources.synthetic import generate_raster, generate_zones
from python_rasterstats_ray.sources.tiles import (
    raster_to_tiles_table,
    window_cells,
    cell_decode,
)
from python_rasterstats_ray.functions.windows import bounds_window

STATS = "count min max mean sum std median majority minority unique range nodata nan percentile_25 percentile_90"


@pytest.fixture(scope="module")
def fixture_inputs():
    arr, affine, nodata = generate_raster((300, 400), kind="holes", seed=7)
    zones = generate_zones(
        40, extent=(-20.0, -30.0, 420.0, 310.0), seed=11, with_holes=True, mega_every=13
    )
    return arr, affine, nodata, zones


def _oracle_rows(arr, affine, nodata, zones, **kw):
    feats = [
        {"type": "Feature", "properties": {}, "geometry": from_wkb(w).to_geojson()}
        for w in zones["geom_wkb"].to_pylist()
    ]
    return zonal_stats(feats, arr, affine=affine, nodata=nodata, stats=STATS, **kw)


def _compare(df, oracle, exact_keys, approx_keys):
    assert len(df) == len(oracle)
    for i, orow in enumerate(oracle):
        row = df.iloc[i]
        for k in exact_keys:
            expected = orow[k]
            got = row[k]
            if expected is None:
                assert got is None or (isinstance(got, float) and np.isnan(got)), (i, k, got)
            else:
                assert got == expected, (i, k, got, expected)
        for k in approx_keys:
            expected = orow[k]
            got = row[k]
            if expected is None:
                assert got is None or (isinstance(got, float) and np.isnan(got)), (i, k, got)
            else:
                assert got == pytest.approx(expected, rel=1e-6, abs=1e-9), (i, k)


def test_broadcast_matches_oracle(ray_session, fixture_inputs):
    import ray.data
    from python_rasterstats_ray.stages.zonal_dist import zonal_stats_broadcast

    arr, affine, nodata, zones = fixture_inputs
    ds = ray.data.from_arrow(zones)
    out = zonal_stats_broadcast(
        ds, (arr, affine, nodata), stats=STATS, batch_size=8
    )
    df = out.to_pandas().sort_values("zone_id").reset_index(drop=True)
    oracle = _oracle_rows(arr, affine, nodata, zones)
    # fast path accumulates float mean/sum/std in float64 (documented
    # divergence ~1e-6 rel); every holistic/integer stat stays exact
    _compare(
        df,
        oracle,
        exact_keys=[
            "count", "min", "max", "median", "majority",
            "minority", "unique", "range", "nodata", "nan", "percentile_25",
            "percentile_90",
        ],
        approx_keys=["mean", "sum", "std"],
    )
    # passthrough of input columns
    assert "zcat" in df.columns


def test_tiled_matches_oracle(ray_session, fixture_inputs):
    import ray.data
    from python_rasterstats_ray.stages.zonal_dist import zonal_stats_tiled

    arr, affine, nodata, zones = fixture_inputs
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=128)
    out = zonal_stats_tiled(
        ray.data.from_arrow(zones),
        ray.data.from_arrow(tiles),
        affine,
        nodata,
        raster_dtype=str(arr.dtype),
        stats=STATS,
        tile_size=128,
    )
    df = out.to_pandas().reset_index(drop=True)
    oracle = _oracle_rows(arr, affine, nodata, zones)
    _compare(
        df,
        oracle,
        exact_keys=[
            "count", "min", "max", "median", "majority", "minority", "unique",
            "nodata", "nan", "percentile_25", "percentile_90",
        ],
        approx_keys=["mean", "sum", "std", "range"],
    )


def test_tiled_from_store_identical(ray_session, fixture_inputs, tmp_path):
    """The storage-bucketed plan (write_zones_bucketed +
    zonal_stats_tiled_from_store) must be BIT-identical to the shuffle
    plan on the same inputs — same tile assignment, same partials, same
    merge — for both algebraic-only and holistic stat sets."""
    import ray.data
    from python_rasterstats_ray.stages.zonal_dist import (
        write_zones_bucketed,
        zonal_stats_tiled,
        zonal_stats_tiled_from_store,
    )

    arr, affine, nodata, zones = fixture_inputs
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=128)
    store = write_zones_bucketed(
        ray.data.from_arrow(zones), str(tmp_path / "zstore"), affine, tile_size=128
    )
    for stats in ("count min max mean sum std nodata", STATS):
        a = zonal_stats_tiled(
            ray.data.from_arrow(zones),
            ray.data.from_arrow(tiles),
            affine,
            nodata,
            raster_dtype=str(arr.dtype),
            stats=stats,
            tile_size=128,
        ).to_pandas().reset_index(drop=True)
        b = zonal_stats_tiled_from_store(
            store,
            ray.data.from_arrow(tiles),
            affine,
            nodata,
            raster_dtype=str(arr.dtype),
            stats=stats,
            tile_size=128,
            concurrency=(1, 2),
        ).to_pandas().reset_index(drop=True)
        assert list(a.columns) == list(b.columns)
        # order-independent stats are bit-identical; Sum-reduced floats
        # (mean/sum/std on this FLOAT-valued raster) may differ by
        # accumulation order between the two plans (on the integer-valued
        # oracle rasters both are exact — see pipelines/zonal_queries.py)
        order_dep = {"mean", "sum", "std"}
        for c in a.columns:
            if c in order_dep:
                assert np.allclose(a[c], b[c], rtol=1e-9, atol=0.0, equal_nan=True), c
            else:
                assert a[c].equals(b[c]), c


def test_tiled_from_store_streaming_shuffle(ray_session, fixture_inputs, tmp_path):
    """checkpoint_before_shuffle=False (stream partials straight into the
    zone-aggregate exchange, paying recompute instead of pinning — the
    10^12-zone mode documented on zonal_stats_tiled_from_store) must be
    bit-identical to the default pinned mode."""
    import ray.data
    from python_rasterstats_ray.stages.zonal_dist import (
        write_zones_bucketed,
        zonal_stats_tiled_from_store,
    )

    arr, affine, nodata, zones = fixture_inputs
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=128)
    store = write_zones_bucketed(
        ray.data.from_arrow(zones), str(tmp_path / "zstore_s"), affine, tile_size=128
    )
    kw = dict(
        affine=affine,
        nodata=nodata,
        raster_dtype=str(arr.dtype),
        stats=STATS,
        tile_size=128,
        concurrency=(1, 2),
    )
    a = zonal_stats_tiled_from_store(
        store, ray.data.from_arrow(tiles), checkpoint_before_shuffle=True, **kw
    ).to_pandas().reset_index(drop=True)
    b = zonal_stats_tiled_from_store(
        store, ray.data.from_arrow(tiles), checkpoint_before_shuffle=False, **kw
    ).to_pandas().reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        assert a[c].equals(b[c]), c


def test_tiled_all_touched_and_categorical(ray_session):
    import ray.data
    from python_rasterstats_ray.stages.zonal_dist import zonal_stats_tiled

    arr, affine, nodata = generate_raster((200, 200), kind="classes", seed=3)
    zones = generate_zones(12, extent=(10.0, 10.0, 190.0, 190.0), seed=5)
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=64)
    out = zonal_stats_tiled(
        ray.data.from_arrow(zones),
        ray.data.from_arrow(tiles),
        affine,
        nodata,
        raster_dtype=str(arr.dtype),
        stats="count",
        categorical=True,
        all_touched=True,
        tile_size=64,
    )
    df = out.to_pandas().reset_index(drop=True)
    feats = [
        {"type": "Feature", "properties": {}, "geometry": from_wkb(w).to_geojson()}
        for w in zones["geom_wkb"].to_pylist()
    ]
    oracle = zonal_stats(
        feats, arr, affine=affine, nodata=nodata, stats="count",
        categorical=True, all_touched=True,
    )
    for i, orow in enumerate(oracle):
        cat = {
            k: v for k, v in orow.items() if not isinstance(k, str)
        }
        got = dict(zip(df.iloc[i]["cat_values"], df.iloc[i]["cat_counts"]))
        assert got == {float(k): v for k, v in cat.items()}, i
        assert df.iloc[i]["count"] == orow["count"]


def test_tile_assignment_matches_windows(fixture_inputs):
    """Every zone is assigned exactly the tiles its bounds_window touches."""
    arr, affine, nodata, zones = fixture_inputs
    T = 128
    for wkb in zones["geom_wkb"].to_pylist():
        g = from_wkb(wkb)
        win = bounds_window(g.bounds, affine)
        cells = window_cells(win, T)
        (r0, r1), (c0, c1) = win
        for cid in cells:
            tr, tc = cell_decode(int(cid))
            # tile rect must intersect the window
            assert tr * T < r1 and (tr + 1) * T > r0
            assert tc * T < c1 and (tc + 1) * T > c0
        # count parity: number of tiles = product of touched ranges
        n_r = (r1 - 1) // T - r0 // T + 1
        n_c = (c1 - 1) // T - c0 // T + 1
        assert len(cells) == n_r * n_c


def test_point_zones_distributed(ray_session):
    import ray.data
    from python_rasterstats_ray.functions.geometry import Geom, to_wkb
    import pyarrow as pa
    from python_rasterstats_ray.stages.zonal_dist import (
        zonal_stats_broadcast,
        zonal_stats_tiled,
    )

    arr, affine, nodata = generate_raster((100, 100), seed=13)
    rng = np.random.default_rng(4)
    pts = rng.uniform(5, 95, size=(20, 2))
    zones = pa.table(
        {
            "zone_id": pa.array(range(20), pa.int64()),
            "geom_wkb": pa.array(
                [to_wkb(Geom("Point", pts=p.reshape(1, 2))) for p in pts], pa.binary()
            ),
        }
    )
    feats = [
        {"type": "Feature", "properties": {}, "geometry": from_wkb(w).to_geojson()}
        for w in zones["geom_wkb"].to_pylist()
    ]
    oracle = zonal_stats(feats, arr, affine=affine, nodata=nodata, stats="count mean")
    bc = (
        zonal_stats_broadcast(
            ray.data.from_arrow(zones), (arr, affine, nodata), stats="count mean"
        )
        .to_pandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=32)
    td = (
        zonal_stats_tiled(
            ray.data.from_arrow(zones),
            ray.data.from_arrow(tiles),
            affine,
            nodata,
            raster_dtype=str(arr.dtype),
            stats="count mean",
            tile_size=32,
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    for i, orow in enumerate(oracle):
        assert bc.iloc[i]["count"] == orow["count"]
        assert td.iloc[i]["count"] == orow["count"]
        assert bc.iloc[i]["mean"] == orow["mean"]
        assert td.iloc[i]["mean"] == pytest.approx(orow["mean"], rel=1e-6)


def test_broadcast_tasks_mode_identical(ray_session, fixture_inputs):
    """compute='tasks' (per-worker cached fetch) must produce exactly the
    actor-pool result — same kernel, different scheduler."""
    import ray.data

    from python_rasterstats_ray.stages.zonal_dist import zonal_stats_broadcast

    arr, affine, nodata, zones = fixture_inputs
    ds = ray.data.from_arrow(zones)
    a = (
        zonal_stats_broadcast(ds, (arr, affine, nodata), stats=STATS, batch_size=8)
        .to_pandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )
    t = (
        zonal_stats_broadcast(
            ds, (arr, affine, nodata), stats=STATS, batch_size=8, compute="tasks"
        )
        .to_pandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )
    assert list(a.columns) == list(t.columns)
    for c in a.columns:
        av, tv = a[c].to_numpy(), t[c].to_numpy()
        if av.dtype.kind == "f":
            assert np.allclose(av, tv, rtol=0, atol=0, equal_nan=True), c
        else:
            na_a, na_t = a[c].isna().to_numpy(), t[c].isna().to_numpy()
            assert (na_a == na_t).all(), c
            assert (av[~na_a] == tv[~na_t]).all(), c
