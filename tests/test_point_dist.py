"""Distributed point-query differential tests vs the sequential oracle."""

import numpy as np
import pyarrow as pa
import pytest

from python_rasterstats_ray import point_query
from python_rasterstats_ray.sources.synthetic import generate_raster, generate_zones
from python_rasterstats_ray.functions.geometry import Geom, from_wkb, to_wkb


@pytest.mark.parametrize("interp", ["bilinear", "nearest"])
def test_point_query_broadcast_matches_oracle(ray_session, interp):
    import ray.data

    from python_rasterstats_ray.stages.point_dist import point_query_broadcast

    arr, affine, nodata = generate_raster((120, 140), kind="holes", seed=31)
    rng = np.random.default_rng(7)
    pts = rng.uniform(-5, 145, size=(200, 2))
    tbl = pa.table(
        {
            "pt_id": pa.array(range(200), pa.int64()),
            "x": pa.array(pts[:, 0]),
            "y": pa.array(pts[:, 1]),
        }
    )
    out = (
        point_query_broadcast(
            ray.data.from_arrow(tbl), (arr, affine, nodata), interpolate=interp
        )
        .to_pandas()
        .sort_values("pt_id")
        .reset_index(drop=True)
    )
    feats = [
        {"type": "Feature", "properties": {},
         "geometry": {"type": "Point", "coordinates": [float(x), float(y)]}}
        for x, y in pts
    ]
    oracle = point_query(feats, arr, affine=affine, nodata=nodata, interpolate=interp)
    for i, expect in enumerate(oracle):
        got = out.loc[i, "value"]
        if expect is None:
            assert got is None or np.isnan(got), i
        else:
            assert got == pytest.approx(expect, rel=1e-12), i


def test_point_query_features_matches_oracle(ray_session):
    import ray.data

    from python_rasterstats_ray.stages.point_dist import point_query_features

    arr, affine, nodata = generate_raster((150, 150), kind="holes", seed=33)
    zones = generate_zones(12, extent=(5.0, 5.0, 145.0, 145.0), seed=34)
    # add a point feature (scalar flattening path)
    pt = to_wkb(Geom("Point", pts=np.array([[40.3, 77.7]])))
    tbl = pa.table(
        {
            "zone_id": pa.array(list(range(12)) + [12], pa.int64()),
            "geom_wkb": pa.array(zones["geom_wkb"].to_pylist() + [pt], pa.binary()),
        }
    )
    out = (
        point_query_features(ray.data.from_arrow(tbl), (arr, affine, nodata))
        .to_pandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )
    feats = [
        {"type": "Feature", "properties": {}, "geometry": from_wkb(w).to_geojson()}
        for w in tbl["geom_wkb"].to_pylist()
    ]
    oracle = point_query(feats, arr, affine=affine, nodata=nodata)
    for i, expect in enumerate(oracle):
        got = out.loc[i, "values"]
        if isinstance(expect, list):
            assert len(got) == len(expect)
            for g, e in zip(got, expect):
                if e is None:
                    # Arrow list nulls surface as None or NaN via pandas
                    assert g is None or (isinstance(g, float) and np.isnan(g))
                else:
                    assert g == pytest.approx(e, rel=1e-12)
            sc = out.loc[i, "values_scalar"]
            assert sc is None or np.isnan(sc) or len(expect) == 1
        else:
            # single vertex flattened to scalar
            assert out.loc[i, "values_scalar"] == pytest.approx(expect, rel=1e-12)


@pytest.mark.parametrize("tile_size", [32, 64])
@pytest.mark.parametrize("interp", ["bilinear", "nearest"])
def test_point_query_tiled_bit_identical_to_broadcast(ray_session, tile_size, interp):
    """The non-broadcastable-raster plans (refmap cell-join AND the
    write_tiles_bucketed store) must be BIT-identical to the broadcast
    plan across tile layouts, both interpolation modes, nodata holes,
    edge-straddling windows and far-off-extent points."""
    import tempfile

    import ray.data

    from python_rasterstats_ray.sources.tiles import raster_to_tiles_table
    from python_rasterstats_ray.stages.focal import write_tiles_bucketed
    from python_rasterstats_ray.stages.point_dist import (
        point_query_broadcast,
        point_query_from_store,
        point_query_tiled,
    )

    arr, affine, nodata = generate_raster((120, 140), kind="holes", seed=31)
    h, w = arr.shape
    rng = np.random.default_rng(17)
    # interior + just-off-extent + far-off-extent + exact pixel centers /
    # corners (banker's-rounding edge cases land on .0/.5 fractions)
    pts = np.concatenate(
        [
            rng.uniform(-5, 145, size=(300, 2)),
            rng.uniform(-400, 600, size=(60, 2)),
            np.array([[0.0, 0.0], [0.5, 0.5], [139.5, 119.5], [70.0, 60.5]]),
        ]
    )
    n = len(pts)
    tbl = pa.table(
        {
            "pt_id": pa.array(range(n), pa.int64()),
            "x": pa.array(pts[:, 0]),
            "y": pa.array(pts[:, 1]),
        }
    )
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=tile_size)
    store = tempfile.mkdtemp(prefix="prsr_pqstore_", dir="/tmp")
    write_tiles_bucketed(
        ray.data.from_arrow(tiles), store, (h, w), tile_size, radius=1
    )

    def run(fn):
        return (
            fn().to_pandas().sort_values("pt_id").reset_index(drop=True)["value"]
            .to_numpy()
        )

    a = run(lambda: point_query_broadcast(
        ray.data.from_arrow(tbl), (arr, affine, nodata), interpolate=interp))
    b = run(lambda: point_query_tiled(
        ray.data.from_arrow(tbl), ray.data.from_arrow(tiles), affine, nodata,
        interpolate=interp, tile_size=tile_size))
    c = run(lambda: point_query_from_store(
        ray.data.from_arrow(tbl), store, (h, w), affine, nodata,
        interpolate=interp, tile_size=tile_size))
    for name, o in (("tiled", b), ("store", c)):
        same = (np.isnan(a) & np.isnan(o)) | (a == o)
        assert same.all(), (name, np.nonzero(~same)[0][:5])
    # the layout must actually exercise masking: some nulls, some values
    assert np.isnan(a).any() and (~np.isnan(a)).any()
