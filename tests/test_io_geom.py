"""Input polymorphism, geometry codecs, window algebra (reference
tests/test_io.py coverage re-expressed for the from-scratch parsers)."""

import json
import math

import numpy as np
import pytest

from python_rasterstats_ray.functions.affine import Affine
from python_rasterstats_ray.functions.geometry import (
    from_geojson,
    from_wkb,
    from_wkt,
    parse_geometry,
    to_wkb,
    to_wkt,
)
from python_rasterstats_ray.functions.windows import (
    beyond_extent,
    boundless_array,
    bounds_window,
    window_bounds,
)
from python_rasterstats_ray.sources.features import parse_feature, read_features
from python_rasterstats_ray.sources.raster import Raster

from conftest import REF_DATA


# ---------------------------------------------------------------- features
def test_read_features_shp():
    feats = list(read_features(f"{REF_DATA}/polygons.shp"))
    assert len(feats) == 2
    assert feats[0]["geometry"]["type"] == "Polygon"
    assert feats[0]["properties"]["id"] == 1


def test_read_features_geojson_file():
    feats = list(read_features(f"{REF_DATA}/featurecollection.geojson"))
    assert len(feats) == 2


def test_read_features_variants():
    with open(f"{REF_DATA}/feature.geojson") as f:
        feat = json.load(f)
    # mapping feature / geometry / json strings / iterables
    assert list(read_features(feat))[0]["geometry"] == feat["geometry"]
    assert list(read_features(feat["geometry"]))[0]["geometry"] == feat["geometry"]
    assert list(read_features(json.dumps(feat)))[0]["geometry"] == feat["geometry"]
    assert len(list(read_features([feat, feat]))) == 2

    class GeoThing:
        __geo_interface__ = feat["geometry"]

    assert list(read_features(GeoThing()))[0]["geometry"] == feat["geometry"]


def test_read_features_wkt_wkb():
    wkt = "POINT (245309 1000064)"
    feats = list(read_features(wkt))
    assert feats[0]["geometry"]["type"] == "Point"
    wkb = to_wkb(from_wkt(wkt))
    feats = list(read_features(wkb))
    assert feats[0]["geometry"]["coordinates"] == [245309.0, 1000064.0]


def test_read_features_invalid():
    with pytest.raises(ValueError):
        read_features("not a geometry at all {{{")
    with pytest.raises(ValueError):
        parse_feature(12345)


# ---------------------------------------------------------------- codecs
@pytest.mark.parametrize(
    "wkt",
    [
        "POINT (1 2)",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
        "MULTIPOINT ((1 2), (3 4))",
        "MULTIPOINT (1 2, 3 4)",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    ],
)
def test_wkt_wkb_roundtrip(wkt):
    g = from_wkt(wkt)
    g2 = from_wkb(to_wkb(g))
    assert g.gtype == g2.gtype
    assert g.to_geojson() == g2.to_geojson()
    g3 = from_wkt(to_wkt(g))
    assert g3.to_geojson() == g.to_geojson()


def test_wkb_big_endian():
    import struct

    # hand-built big-endian WKB point
    be = b"\x00" + struct.pack(">I", 1) + struct.pack(">2d", 1.5, 2.5)
    g = from_wkb(be)
    assert g.to_geojson()["coordinates"] == [1.5, 2.5]


def test_wkt_z_dropped():
    g = from_wkt("LINESTRING Z (0 0 5, 1 1 6)")
    assert g.paths[0].shape == (1 + 1, 2)


def test_duplicated_vertex_tolerated():
    # feature.geojson carries a duplicated vertex; parser must tolerate it
    with open(f"{REF_DATA}/feature.geojson") as f:
        geom = json.load(f)["geometry"]
    g = from_geojson(geom)
    assert g.bounds[0] < g.bounds[2]


def test_geometry_collection_rejected():
    with pytest.raises(ValueError):
        from_geojson({"type": "GeometryCollection", "geometries": []})


# ---------------------------------------------------------------- affine
def test_affine_roundtrip():
    a = Affine(25.5, 0, 244300.6, 0, -25.5, 1000868.8)
    inv = ~a
    x, y = a * (10, 20)
    col, row = inv * (x, y)
    assert col == pytest.approx(10)
    assert row == pytest.approx(20)
    assert Affine.from_gdal(*a.to_gdal()) == a
    assert len(a.g9) == 9


# ---------------------------------------------------------------- windows
def test_window_algebra():
    affine = Affine(1, 0, 0, 0, -1, 10)  # 10-high unit grid, origin top-left
    win = bounds_window((2.5, 3.5, 5.5, 7.5), affine)
    assert win == ((2, 7), (2, 6))
    w, s, e, n = window_bounds(win, affine)
    assert (w, s, e, n) == (2.0, 3.0, 6.0, 8.0)
    # roundtrip: window_bounds then bounds_window is identity on snapped windows
    assert bounds_window((w, s, e, n), affine) == win


def test_beyond_extent():
    assert beyond_extent(((-1, 5), (0, 5)), (10, 10))
    assert beyond_extent(((0, 11), (0, 5)), (10, 10))
    assert not beyond_extent(((0, 10), (0, 10)), (10, 10))


def test_boundless_array_fill():
    arr = np.arange(16, dtype=float).reshape(4, 4)
    out = boundless_array(arr, ((-1, 3), (-1, 3)), nodata=-1)
    assert out.shape == (4, 4)
    assert out[0, 0] == -1
    assert out[1, 1] == arr[0, 0]
    # 3D
    out3 = boundless_array(arr.reshape(1, 4, 4), ((-1, 3), (-1, 3)), nodata=-1)
    assert out3.shape == (1, 4, 4)
    with pytest.raises(ValueError):
        boundless_array(np.zeros(4), ((0, 1), (0, 1)), nodata=0)
    # masked variant
    outm = boundless_array(arr, ((-1, 3), (-1, 3)), nodata=-1, masked=True)
    assert outm.mask[0, 0]


# ---------------------------------------------------------------- raster
def test_raster_ndarray_vs_file_equivalence():
    from python_rasterstats_ray.sources.geotiff import read_geotiff

    tif = read_geotiff(f"{REF_DATA}/slope.tif")
    r_file = Raster(f"{REF_DATA}/slope.tif")
    r_arr = Raster(tif.band(1), affine=tif.affine, nodata=tif.nodata)
    bounds = (244500, 1000200, 245000, 1000700)
    a = r_file.read(bounds=bounds)
    b = r_arr.read(bounds=bounds)
    assert np.array_equal(a.array, b.array)
    assert a.affine == b.affine
    assert a.nodata == b.nodata


def test_raster_requires_affine():
    with pytest.raises(ValueError):
        Raster(np.zeros((3, 3)))


def test_raster_boundless_controls():
    r = Raster(np.zeros((3, 3)), affine=Affine(1, 0, 0, 0, -1, 3), nodata=0)
    with pytest.raises(ValueError):
        r.read(bounds=(-5, -5, -1, -1), boundless=False)
    with pytest.raises(ValueError):
        r.read()
    with pytest.raises(ValueError):
        r.read(bounds=(0, 0, 1, 1), window=((0, 1), (0, 1)))


def test_nodata_warning_default():
    import warnings
    from python_rasterstats_ray.sources import raster as raster_mod

    raster_mod.already_warned_nodata = False
    r = Raster(np.ones((3, 3)), affine=Affine(1, 0, 0, 0, -1, 3))
    with pytest.warns(raster_mod.NodataWarning):
        out = r.read(bounds=(-2, 1, 1, 4))
    assert out.nodata == -999
    # second read doesn't re-warn
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        r.read(bounds=(-2, 1, 1, 4))


def test_layer_by_index_and_name():
    """Directory datasources select layers by index or name (reference
    io.py:94-101, tests/test_io.py:58-64)."""
    import pytest

    from python_rasterstats_ray.sources.features import list_layers, read_features

    data_dir = "/root/reference/tests/data"
    direct = list(read_features(data_dir + "/polygons.shp"))
    layers = list_layers(data_dir)
    assert "polygons" in layers
    by_name = list(read_features(data_dir, layer="polygons"))
    by_index = list(read_features(data_dir, layer=layers.index("polygons")))
    assert [f["geometry"] for f in by_name] == [f["geometry"] for f in direct]
    assert [f["geometry"] for f in by_index] == [f["geometry"] for f in direct]
    with pytest.raises(ValueError, match="not found"):
        read_features(data_dir, layer="no_such_layer")
    with pytest.raises(ValueError, match="out of range"):
        read_features(data_dir, layer=99)
