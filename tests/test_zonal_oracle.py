"""Golden-parity tests for the sequential zonal oracle.

Golden values are the reference's own pinned assertions
(/root/reference/tests/test_zonal.py) evaluated against the reference's own
fixture corpus, which we read with from-scratch GeoTIFF/Shapefile readers.
"""

import json

import numpy as np
import pytest

from python_rasterstats_ray import zonal_stats
from python_rasterstats_ray.functions.affine import Affine
from python_rasterstats_ray.functions.stats import stats_to_csv, VALID_STATS

from conftest import REF_DATA

slope = f"{REF_DATA}/slope.tif"
polys = f"{REF_DATA}/polygons.shp"


def test_default_stats_and_goldens(slope_tif, polygons):
    stats = zonal_stats(polygons, slope_tif)
    assert len(stats) == 2
    for key in ("count", "min", "max", "mean"):
        assert key in stats[0]
    assert [s["count"] for s in stats] == [75, 50]
    assert round(stats[0]["mean"], 2) == 14.66
    assert stats[0]["mean"] == pytest.approx(14.660084635416666)
    assert stats[1]["mean"] == pytest.approx(56.60576171875)


def test_all_touched(slope_tif, polygons):
    stats = zonal_stats(polygons, slope_tif, all_touched=True)
    assert [s["count"] for s in stats] == [95, 73]


@pytest.mark.parametrize(
    "shp,expected",
    [
        ("lines.shp", [58, 32]),
        ("multipolygons.shp", [125]),
        ("multipoints.shp", [3]),
    ],
)
def test_geometry_type_counts(shp, expected, slope_tif):
    stats = zonal_stats(f"{REF_DATA}/{shp}", slope_tif)
    assert [s["count"] for s in stats] == expected


def test_multilines_platform_tolerance(slope_tif):
    stats = zonal_stats(f"{REF_DATA}/multilines.shp", slope_tif)
    assert stats[0]["count"] in (89, 90)


def test_points(slope_tif):
    stats = zonal_stats(f"{REF_DATA}/points.shp", slope_tif)
    assert len(stats) == 3
    assert sum(s["count"] for s in stats) == 3
    assert round(stats[0]["mean"], 3) == 11.386
    assert round(stats[1]["mean"], 3) == 35.547


def test_categorical_and_map(polygons):
    classes = f"{REF_DATA}/slope_classes.tif"
    stats = zonal_stats(polygons, classes, categorical=True)
    assert stats[0] == {1.0: 75}
    assert stats[1] == {1.0: 1, 2.0: 9, 5.0: 40}
    mapped = zonal_stats(
        polygons, classes, categorical=True, category_map={1.0: "low", 5.0: "high"}
    )
    assert mapped[0] == {"low": 75}
    assert mapped[1] == {"low": 1, 2.0: 9, "high": 40}


def test_points_categorical():
    stats = zonal_stats(f"{REF_DATA}/points.shp", f"{REF_DATA}/slope_classes.tif", categorical=True)
    assert len(stats) == 3
    assert "mean" not in stats[0]
    assert stats[0][1.0] == 1
    assert stats[1][2.0] == 1


def test_nodata_override_categorical(polygons):
    # nodata=1.0 masks the majority class entirely (tests/test_zonal.py:192-204)
    stats = zonal_stats(
        polygons, f"{REF_DATA}/slope_classes.tif", stats="*", categorical=True, nodata=1.0
    )
    assert stats[0]["majority"] is None
    assert stats[0]["count"] == 0
    assert stats[1]["minority"] == 2.0
    assert stats[1]["count"] == 49
    assert "1.0" not in stats[0]


def test_nodata_and_all_nodata(polygons):
    stats = zonal_stats(polygons, f"{REF_DATA}/slope_nodata.tif", stats="nodata count")
    assert [(s["nodata"], s["count"]) for s in stats] == [(36, 39), (19, 31)]
    stats = zonal_stats(polygons, f"{REF_DATA}/all_nodata.tif", stats=["nodata", "count"])
    assert [(s["nodata"], s["count"]) for s in stats] == [(75, 0), (50, 0)]
    # empty zones: everything None but count
    stats = zonal_stats(polygons, f"{REF_DATA}/all_nodata.tif", stats=["mean", "median", "percentile_90"])
    assert stats[0]["mean"] is None
    assert stats[0]["percentile_90"] is None


def test_partial_and_no_overlap(slope_tif):
    stats = zonal_stats(f"{REF_DATA}/polygons_partial_overlap.shp", slope_tif, stats="count")
    assert all(s["count"] > 0 for s in stats)
    stats = zonal_stats(f"{REF_DATA}/polygons_no_overlap.shp", slope_tif, stats="count")
    assert all(s["count"] == 0 for s in stats)


def test_range_consistency(slope_tif, polygons):
    stats = zonal_stats(polygons, slope_tif, stats="range min max")
    for s in stats:
        assert s["range"] == s["max"] - s["min"]


def test_percentile_median_consistency(slope_tif, polygons):
    stats = zonal_stats(polygons, slope_tif, stats="median percentile_50 percentile_90")
    # odd pixel count -> exact middle element, identical to the median
    # (reference asserts this only for zone 0, tests/test_zonal.py:340-346)
    assert stats[0]["median"] == stats[0]["percentile_50"]
    for s in stats:
        assert s["percentile_90"] >= s["percentile_50"]
    with pytest.raises(ValueError):
        zonal_stats(polygons, slope_tif, stats="percentile_101")
    with pytest.raises(ValueError):
        zonal_stats(polygons, slope_tif, stats="percentile_-1")


def test_all_stats_star(slope_tif, polygons):
    stats = zonal_stats(polygons, slope_tif, stats="*")
    for key in VALID_STATS:
        assert key in stats[0]
    stats2 = zonal_stats(polygons, slope_tif, stats="ALL")
    assert set(stats2[0]) == set(stats[0])


def test_invalid_stat(slope_tif, polygons):
    with pytest.raises(ValueError):
        zonal_stats(polygons, slope_tif, stats="bogus")


def test_ndarray_equals_file(slope_raster, polygons, slope_tif):
    arr, affine, nodata = slope_raster
    stats_arr = zonal_stats(polygons, arr, affine=affine, nodata=nodata)
    stats_file = zonal_stats(polygons, slope_tif)
    assert stats_arr == stats_file


def test_geojson_inputs_equivalent(slope_tif):
    with open(f"{REF_DATA}/featurecollection.geojson") as f:
        fc = json.load(f)
    s_fc = zonal_stats(fc, slope_tif)
    s_feats = zonal_stats(fc["features"], slope_tif)
    s_geoms = zonal_stats([f["geometry"] for f in fc["features"]], slope_tif)
    s_str = zonal_stats(json.dumps(fc), slope_tif)
    assert s_fc == s_feats == s_geoms == s_str
    assert [s["count"] for s in s_fc] == [75, 50]


def test_geojson_out_preserves_properties(slope_tif, polygons):
    feats = zonal_stats(polygons, slope_tif, geojson_out=True)
    for i, f in enumerate(feats):
        assert f["type"] == "Feature"
        assert "count" in f["properties"]
        assert f["properties"]["id"] == i + 1


def test_prefix(slope_tif, polygons):
    stats = zonal_stats(polygons, slope_tif, prefix="z_")
    assert "z_count" in stats[0] and "count" not in stats[0]


def test_add_stats_and_zone_func(slope_tif, polygons):
    def mymean(x):
        return np.ma.mean(x)

    stats = zonal_stats(polygons, slope_tif, add_stats={"mymean": mymean})
    for s in stats:
        assert s["mymean"] == s["mean"]

    def two_arg(x, props):
        return props["id"]

    stats = zonal_stats(polygons, slope_tif, add_stats={"idcopy": two_arg})
    assert [s["idcopy"] for s in stats] == [1, 2]

    def three_arg(x, props, rv):
        return int(rv.sum())

    stats = zonal_stats(polygons, slope_tif, add_stats={"rvsum": three_arg}, stats="count")
    assert [s["rvsum"] for s in stats] == [s["count"] for s in stats]

    def zero_out(arr):
        return np.ma.MaskedArray(np.zeros_like(arr.data), mask=arr.mask)

    stats = zonal_stats(polygons, slope_tif, zone_func=zero_out, stats="mean")
    assert all(s["mean"] == 0.0 for s in stats)

    with pytest.raises(TypeError):
        zonal_stats(polygons, slope_tif, zone_func="not callable")


def test_raster_out_roundtrip(slope_tif, polygons):
    stats = zonal_stats(polygons, slope_tif, raster_out=True, stats="count mean")
    for s in stats:
        mini = s["mini_raster_array"]
        assert int(mini.count()) == s["count"]
        assert float(mini.mean()) == pytest.approx(s["mean"])
        assert isinstance(s["mini_raster_affine"], Affine)


def test_dataset_mask(polygons):
    # internal mask band honored like rasterio per-dataset masks
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        stats = zonal_stats(polygons, f"{REF_DATA}/dataset_mask.tif", stats="count")
    assert [s["count"] for s in stats] == [75, 0]


def test_nodata_literal_fixtures():
    # tests/test_zonal.py:439-452 literal fixture
    arr = np.array([[np.nan, 12.25], [-999, 12.75]])
    affine = Affine(1, 0, 0, 0, -1, 2)
    poly = "POLYGON ((0 0, 0 2, 2 2, 2 0, 0 0))"
    stats = zonal_stats(poly, arr, affine=affine, nodata=-999, stats="nodata nan count mean")
    assert stats[0]["nodata"] == 1
    assert stats[0]["nan"] == 1
    assert stats[0]["count"] == 2
    assert stats[0]["mean"] == 12.5

    # tests/test_zonal.py:534-558 literal fixture
    arr = np.array(
        [
            [np.nan, np.nan, np.nan],
            [0.0, 0.0, 0.0],
            [1.0, 4.0, 5.0],
        ]
    )
    affine = Affine(1, 0, 0, 0, -1, 3)
    poly = "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))"
    stats = zonal_stats(poly, arr, affine=affine, nodata=0.0, stats="count nodata nan")
    assert stats[0]["count"] == 3
    assert stats[0]["nodata"] == 3
    assert stats[0]["nan"] == 3


def test_geojson_out_with_literal_array():
    # tests/test_zonal.py:510-520 literal fixture
    arr = np.array([[100.0, 1.0], [100.0, 1.0]])
    affine = Affine(1, 0, 0, 0, -1, 2)
    poly = {
        "type": "Polygon",
        "coordinates": [[[0.5, 0.5], [0.5, 1.5], [1.5, 1.5], [1.5, 0.5], [0.5, 0.5]]],
    }
    stats = zonal_stats(poly, arr, affine=affine, stats="mean", geojson_out=True)
    assert len(stats) == 1


def test_transform_deprecation(slope_raster, polygons):
    arr, affine, nodata = slope_raster
    gdal_transform = affine.to_gdal()
    with pytest.warns(DeprecationWarning):
        stats = zonal_stats(polygons, arr, transform=gdal_transform, nodata=nodata)
    assert [s["count"] for s in stats] == [75, 50]


def test_alias_raster_stats(slope_tif, polygons):
    from python_rasterstats_ray import raster_stats

    with pytest.warns(DeprecationWarning):
        stats = raster_stats(polygons, slope_tif)
    assert [s["count"] for s in stats] == [75, 50]


def test_stats_to_csv(slope_tif, polygons):
    stats = zonal_stats(polygons, slope_tif)
    csv_text = stats_to_csv(stats)
    lines = csv_text.strip().splitlines()
    assert lines[0] == "count,max,mean,min"
    assert len(lines) == 3


def test_json_serializable(slope_tif, polygons):
    stats = zonal_stats(polygons, slope_tif, stats="*")
    json.dumps(stats)  # must not raise
    cat = zonal_stats(polygons, f"{REF_DATA}/slope_classes.tif", categorical=True)
    json.dumps(cat)


def test_zonal_nodata_and_global_extent(slope_tif, polygons):
    # tests/test_zonal.py:40-52: nodata=0 leaves slope counts unchanged;
    # global_src_extent=True is a no-op on results
    stats = zonal_stats(polygons, slope_tif, nodata=0)
    assert [s["count"] for s in stats] == [75, 50]
    assert zonal_stats(polygons, slope_tif, global_src_extent=True) == zonal_stats(
        polygons, slope_tif
    )


def test_doesnt_exist_and_nonsense(slope_tif, polygons):
    # tests/test_zonal.py:55-69 error contract
    with pytest.raises(ValueError):
        zonal_stats(f"{REF_DATA}/DOESNOTEXIST.shp", slope_tif)
    with pytest.raises(ValueError):
        zonal_stats("blaghrlargh", slope_tif)
    with pytest.raises(OSError):
        zonal_stats(polygons, "blercherlerch")
    with pytest.raises(ValueError):
        zonal_stats(["blaghrlargh"], slope_tif)


def test_percentile_nodata_golden(polygons):
    # tests/test_zonal.py:378-385: nodata=1 empties zone 0 entirely
    stats = zonal_stats(
        polygons, f"{REF_DATA}/slope_classes.tif", stats=["percentile_90"], nodata=1
    )
    assert [s["percentile_90"] for s in stats] == [None, 5.0]


def test_zone_func_constant_return(slope_tif, polygons):
    # tests/test_zonal.py:349-358: zone_func returning a fresh array wins
    def ones(zone_arr):
        return np.ma.masked_array(np.full(zone_arr.shape, 1))

    stats = zonal_stats(polygons, slope_tif, zone_func=ones)
    assert stats[0]["max"] == stats[0]["min"] == stats[0]["mean"] == 1


def test_mini_raster_self_roundtrip(slope_tif, polygons):
    # tests/test_zonal.py:326-337: feeding the mini raster back in
    # reproduces itself on exactly the valid pixels
    stats = zonal_stats(polygons, slope_tif, raster_out=True)
    stats2 = zonal_stats(
        polygons,
        stats[0]["mini_raster_array"],
        raster_out=True,
        affine=stats[0]["mini_raster_affine"],
    )
    assert (
        stats[0]["mini_raster_array"] == stats2[0]["mini_raster_array"]
    ).sum() == stats[0]["count"]
