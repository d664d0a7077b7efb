"""Differential tests for the distributed category_map / add_stats /
raster_out paths vs the sequential oracle (reference main.py:250-253,
304-321 semantics)."""

import numpy as np
import pytest

from python_rasterstats_ray import zonal_stats
from python_rasterstats_ray.functions.geometry import from_wkb
from python_rasterstats_ray.sources.synthetic import generate_raster, generate_zones
from python_rasterstats_ray.sources.tiles import raster_to_tiles_table


@pytest.fixture(scope="module")
def class_inputs():
    arr, affine, nodata = generate_raster((200, 200), kind="classes", seed=3)
    zones = generate_zones(14, extent=(-15.0, -15.0, 215.0, 215.0), seed=5, mega_every=9)
    return arr, affine, nodata, zones


def _feats(zones):
    return [
        {
            "type": "Feature",
            "properties": {"zcat": int(z)},
            "geometry": from_wkb(w).to_geojson(),
        }
        for w, z in zip(zones["geom_wkb"].to_pylist(), zones["zcat"].to_pylist())
    ]


CMAP = {1.0: "low", 2.0: "low-mid", 4.0: "high"}  # partial map: 3.0/5.0 pass through


def _oracle_cat(arr, affine, nodata, zones):
    rows = zonal_stats(
        _feats(zones), arr, affine=affine, nodata=nodata,
        stats="count majority", categorical=True, category_map=CMAP,
    )
    out = []
    for r in rows:
        hist = {str(k): v for k, v in r.items() if k not in ("count", "majority")}
        out.append((hist, r["count"], r["majority"]))
    return out


def _check_cat(df, oracle):
    for i, (hist, count, majority) in enumerate(oracle):
        got = dict(zip(df.iloc[i]["cat_keys"], df.iloc[i]["cat_counts"]))
        assert got == hist, (i, got, hist)
        assert df.iloc[i]["count"] == count
        m = df.iloc[i]["majority"]
        if majority is None:
            assert m is None or np.isnan(m)
        else:
            assert m == majority


def test_category_map_broadcast(ray_session, class_inputs):
    import ray.data

    from python_rasterstats_ray.stages.zonal_dist import zonal_stats_broadcast

    arr, affine, nodata, zones = class_inputs
    df = (
        zonal_stats_broadcast(
            ray.data.from_arrow(zones), (arr, affine, nodata),
            stats="count majority", categorical=True, category_map=CMAP,
        )
        .to_pandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )
    _check_cat(df, _oracle_cat(arr, affine, nodata, zones))


def test_category_map_tiled(ray_session, class_inputs):
    import ray.data

    from python_rasterstats_ray.stages.zonal_dist import zonal_stats_tiled

    arr, affine, nodata, zones = class_inputs
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=64)
    df = (
        zonal_stats_tiled(
            ray.data.from_arrow(zones), ray.data.from_arrow(tiles), affine, nodata,
            raster_dtype=str(arr.dtype), stats="count majority",
            categorical=True, category_map=CMAP, tile_size=64,
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    _check_cat(df, _oracle_cat(arr, affine, nodata, zones))


ADD_STATS = {
    "mymean": lambda m: float(m.mean()) if m.count() else None,
    "zcat_echo": lambda m, props: props["zcat"],
    "mask_px": lambda m, props, rv: int(rv.sum()),
}


def _oracle_add(arr, affine, nodata, zones):
    return zonal_stats(
        _feats(zones), arr, affine=affine, nodata=nodata,
        stats="count", add_stats=ADD_STATS,
    )


def _check_add(df, oracle):
    for i, orow in enumerate(oracle):
        for k in ("mymean", "zcat_echo", "mask_px"):
            got, want = df.iloc[i][k], orow[k]
            if want is None:
                assert got is None or np.isnan(got), (i, k)
            else:
                assert got == pytest.approx(want, rel=1e-12), (i, k, got, want)


def test_add_stats_arity_broadcast(ray_session, class_inputs):
    import ray.data

    from python_rasterstats_ray.stages.zonal_dist import zonal_stats_broadcast

    arr, affine, nodata, zones = class_inputs
    df = (
        zonal_stats_broadcast(
            ray.data.from_arrow(zones), (arr, affine, nodata),
            stats="count", add_stats=ADD_STATS,
        )
        .to_pandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )
    _check_add(df, _oracle_add(arr, affine, nodata, zones))


def test_add_stats_arity_tiled(ray_session, class_inputs):
    import ray.data

    from python_rasterstats_ray.stages.zonal_dist import zonal_stats_tiled

    arr, affine, nodata, zones = class_inputs
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=64)
    df = (
        zonal_stats_tiled(
            ray.data.from_arrow(zones), ray.data.from_arrow(tiles), affine, nodata,
            raster_dtype=str(arr.dtype), stats="count",
            add_stats=ADD_STATS, tile_size=64,
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    _check_add(df, _oracle_add(arr, affine, nodata, zones))


def _oracle_mini(arr, affine, nodata, zones):
    return zonal_stats(
        _feats(zones), arr, affine=affine, nodata=nodata,
        stats="count", raster_out=True,
    )


def _check_mini(df, oracle):
    from python_rasterstats_ray.stages.zonal_dist import unpack_mini_raster

    for i, orow in enumerate(oracle):
        got, aff, nod = unpack_mini_raster(df.iloc[i])
        want = orow["mini_raster_array"]
        assert got.shape == want.shape, i
        assert (np.ma.getmaskarray(got) == np.ma.getmaskarray(want)).all(), i
        if got.count():
            assert (got.compressed() == want.compressed()).all(), i
        assert tuple(aff) == tuple(orow["mini_raster_affine"]), i
        assert nod == orow["mini_raster_nodata"], i


def test_raster_out_broadcast(ray_session, class_inputs):
    import ray.data

    from python_rasterstats_ray.stages.zonal_dist import zonal_stats_broadcast

    arr, affine, nodata, zones = class_inputs
    df = (
        zonal_stats_broadcast(
            ray.data.from_arrow(zones), (arr, affine, nodata),
            stats="count", raster_out=True,
        )
        .to_pandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )
    _check_mini(df, _oracle_mini(arr, affine, nodata, zones))


def test_raster_out_tiled(ray_session, class_inputs):
    import ray.data

    from python_rasterstats_ray.stages.zonal_dist import zonal_stats_tiled

    arr, affine, nodata, zones = class_inputs
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=64)
    df = (
        zonal_stats_tiled(
            ray.data.from_arrow(zones), ray.data.from_arrow(tiles), affine, nodata,
            raster_dtype=str(arr.dtype), stats="count",
            raster_out=True, tile_size=64,
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    _check_mini(df, _oracle_mini(arr, affine, nodata, zones))


def test_zonal_geojson_out_distributed(ray_session, class_inputs):
    """Distributed geojson_out: tiled stats re-joined to geometry +
    attributes must match the oracle's geojson_out features."""
    import json

    import ray.data

    from python_rasterstats_ray import gen_zonal_stats
    from python_rasterstats_ray.stages.zonal_dist import (
        zonal_geojson_out,
        zonal_stats_tiled,
    )

    arr, affine, nodata, zones = class_inputs
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=64)
    zds = ray.data.from_arrow(zones)
    stats = zonal_stats_tiled(
        zds, ray.data.from_arrow(tiles), affine, nodata,
        raster_dtype=str(arr.dtype), stats="count min max", tile_size=64,
    )
    out = zonal_geojson_out(stats, ray.data.from_arrow(zones)).to_pandas()
    out = out.sort_values("zone_id").reset_index(drop=True)

    oracle = list(
        gen_zonal_stats(
            _feats(zones), arr, affine=affine, nodata=nodata,
            stats="count min max", geojson_out=True,
        )
    )
    assert len(out) == len(oracle)
    for i, orow in enumerate(oracle):
        feat = json.loads(out.iloc[i]["feature_json"])
        assert feat["geometry"] == orow["geometry"]
        for kk in ("count", "min", "max"):
            got, want = feat["properties"][kk], orow["properties"][kk]
            if want is None:
                assert got is None
            else:
                assert got == want, (i, kk)
        # input attribute passthrough (zcat came from the zone table)
        assert feat["properties"]["zcat"] == zones["zcat"][i].as_py()


def test_zonal_geojson_out_joined_matches_broadcast(ray_session, class_inputs):
    """The shuffle-join geojson_out (zone side not broadcastable) must
    produce byte-identical feature_json to the broadcast variant."""
    import ray.data

    from python_rasterstats_ray.stages.zonal_dist import (
        zonal_geojson_out,
        zonal_geojson_out_joined,
        zonal_stats_tiled,
    )

    arr, affine, nodata, zones = class_inputs
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=64)
    stats = zonal_stats_tiled(
        ray.data.from_arrow(zones), ray.data.from_arrow(tiles), affine, nodata,
        raster_dtype=str(arr.dtype), stats="count min max", tile_size=64,
    )
    a = (
        zonal_geojson_out(stats, ray.data.from_arrow(zones))
        .to_pandas().sort_values("zone_id").reset_index(drop=True)
    )
    b = (
        zonal_geojson_out_joined(stats, ray.data.from_arrow(zones))
        .to_pandas().sort_values("zone_id").reset_index(drop=True)
    )
    assert list(a["zone_id"]) == list(b["zone_id"])
    assert list(a["feature_json"]) == list(b["feature_json"])


def test_zonal_geojson_out_no_stat_cols(ray_session, class_inputs):
    """Stats dataset carrying ONLY zone_col: the emitted properties object
    must still be valid JSON (regression: a trailing comma used to be
    appended after the zone attrs assuming stat columns always follow)."""
    import json

    import ray.data

    from python_rasterstats_ray.stages.zonal_dist import zonal_geojson_out

    arr, affine, nodata, zones = class_inputs
    stats = ray.data.from_arrow(zones.select(["zone_id"]))
    out = zonal_geojson_out(stats, ray.data.from_arrow(zones)).to_pandas()
    assert len(out) == len(zones)
    for s in out["feature_json"]:
        feat = json.loads(s)  # raises on the trailing-comma bug
        assert "zcat" in feat["properties"]


def test_zone_func_tiled(ray_session, class_inputs):
    """zone_func on the tiled path: stats are recomputed from the
    transformed assembled window, matching the oracle exactly."""
    import ray.data

    from python_rasterstats_ray.stages.zonal_dist import zonal_stats_tiled

    def double(masked):
        return masked * 2.0

    arr, affine, nodata, zones = class_inputs
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=64)
    df = (
        zonal_stats_tiled(
            ray.data.from_arrow(zones), ray.data.from_arrow(tiles), affine, nodata,
            raster_dtype=str(arr.dtype), stats="count min max mean nodata",
            zone_func=double, tile_size=64,
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    oracle = zonal_stats(
        _feats(zones), arr, affine=affine, nodata=nodata,
        stats="count min max mean nodata", zone_func=double,
    )
    for i, orow in enumerate(oracle):
        for k in ("count", "min", "max", "mean", "nodata"):
            got, want = df.iloc[i][k], orow[k]
            if want is None:
                assert got is None or np.isnan(got), (i, k)
            else:
                assert got == pytest.approx(want, rel=1e-12), (i, k, got, want)


def test_chunked_accumulators_match_whole_window(monkeypatch):
    """Row-band-chunked mega-zone fast path (zonal_dist._ZONE_CHUNK_PX)
    vs the whole-window kernel: every stat equal (exact for count / min /
    max / nodata / nan / median / percentiles / majority / unique,
    ~1e-12 rel for the float64-accumulated mean/sum/std) on in-extent,
    straddling and beyond-extent windows, all_touched both ways."""
    import python_rasterstats_ray.stages.zonal_dist as zd
    from python_rasterstats_ray.stages.zonal_dist import BroadcastZonalKernel

    arr, affine, nodata = generate_raster((160, 180), kind="holes", seed=21)
    zones = generate_zones(
        12, extent=(-40.0, -40.0, 220.0, 200.0), seed=23, mega_every=3, n_vertices=24
    )
    stats = "count min max mean sum std median percentile_25 majority unique nodata nan"
    for all_touched in (False, True):
        whole = BroadcastZonalKernel(
            (arr, affine, nodata), stats=stats, all_touched=all_touched
        )
        out_whole = whole(zones).to_pandas()
        monkeypatch.setattr(zd, "_ZONE_CHUNK_PX", 97)  # force many bands
        chunked = BroadcastZonalKernel(
            (arr, affine, nodata), stats=stats, all_touched=all_touched
        )
        out_chunked = chunked(zones).to_pandas()
        monkeypatch.undo()
        for col in out_whole.columns:
            a, b = out_whole[col], out_chunked[col]
            for i in range(len(a)):
                if a[i] is None or (isinstance(a[i], float) and np.isnan(a[i])):
                    assert b[i] is None or np.isnan(b[i]), (col, i)
                elif isinstance(a[i], float):
                    assert b[i] == pytest.approx(a[i], rel=1e-12), (col, i)
                else:
                    assert a[i] == b[i], (col, i)
