"""GeoPackage reader/writer (sources/geopackage.py).

Reference parity target: fiona-backed multi-driver vector IO
(/root/reference/src/rasterstats/io.py:32-45, 94-101) with layer
selection by name or index (reference tests/test_io.py:58-64).
"""

import struct

import pytest

from python_rasterstats_ray.functions.geometry import from_wkt, to_wkb
from python_rasterstats_ray.sources.features import read_features
from python_rasterstats_ray.sources.geopackage import (
    gpb_decode,
    gpb_encode,
    list_gpkg_layers,
    read_geopackage,
    write_geopackage,
)

POLY = {
    "type": "Polygon",
    "coordinates": [[(0.0, 0.0), (10.0, 0.0), (10.0, 8.0), (0.0, 8.0), (0.0, 0.0)]],
}
PT = {"type": "Point", "coordinates": (3.5, 4.25)}


def _two_layer_fixture(path):
    write_geopackage(
        path,
        [
            {"type": "Feature", "properties": {"name": "a", "v": 1, "w": 0.5}, "geometry": POLY},
            {"type": "Feature", "properties": {"name": "b", "v": 2, "w": None}, "geometry": None},
        ],
        layer="polys",
    )
    write_geopackage(path, [PT], layer="points")
    return path


def test_roundtrip_two_layers(tmp_path):
    p = _two_layer_fixture(str(tmp_path / "two.gpkg"))
    assert list_gpkg_layers(p) == ["polys", "points"]

    by_name = read_geopackage(p, "polys")
    by_index = read_geopackage(p, 0)
    assert by_name == by_index
    assert len(by_name) == 2
    f0, f1 = by_name
    assert f0["geometry"]["type"] == "Polygon"
    assert [tuple(xy) for xy in f0["geometry"]["coordinates"][0]] == POLY["coordinates"][0]
    assert f0["properties"] == {"name": "a", "v": 1, "w": 0.5}
    assert f1["geometry"] is None
    assert f1["properties"] == {"name": "b", "v": 2, "w": None}

    pts = read_geopackage(p, "points")
    assert pts[0]["geometry"]["type"] == "Point"
    assert tuple(pts[0]["geometry"]["coordinates"]) == PT["coordinates"]


def test_read_features_polymorphism(tmp_path):
    p = _two_layer_fixture(str(tmp_path / "rf.gpkg"))
    feats = list(read_features(p))  # default layer 0
    assert len(feats) == 2
    assert [f["geometry"]["type"] for f in read_features(p, layer="points")] == ["Point"]
    assert [f["geometry"]["type"] for f in read_features(p, layer=1)] == ["Point"]
    with pytest.raises(ValueError):
        read_geopackage(p, "nope")
    with pytest.raises(ValueError):
        read_geopackage(p, 5)


def test_gpb_envelope_and_big_endian():
    """Decode a hand-built GPB blob: big-endian header ints + XY envelope
    + big-endian WKB payload (writers like OGR may emit either order)."""
    g = from_wkt("POINT (7 -2)")
    wkb_le = to_wkb(g)
    # header: magic, version 0, flags: env indicator 1 (XY), big-endian (bit0=0)
    flags = 0b0000010
    hdr = b"GP\x00" + bytes([flags]) + struct.pack(">i", 4326)
    env = struct.pack(">4d", 7.0, 7.0, -2.0, -2.0)
    blob = hdr + env + wkb_le
    out = gpb_decode(blob)
    assert out.gtype == "Point" and tuple(out.pts[0]) == (7.0, -2.0)
    # empty-geometry flag: the trailing WKB (here a zero-ring POLYGON —
    # 'POLYGON EMPTY') is decoded to an EMPTY geometry object, NOT None;
    # OGR/fiona surface empty geometries, reserving null for NULL blobs
    wkb_empty_poly = b"\x01\x03\x00\x00\x00\x00\x00\x00\x00"
    empty = b"GP\x00" + bytes([0b10001]) + struct.pack("<i", 0) + wkb_empty_poly
    out = gpb_decode(empty)
    assert out is not None and out.gtype == "Polygon" and out.is_empty
    # empty flag with the mandatory WKB omitted entirely -> NULL
    assert gpb_decode(b"GP\x00" + bytes([0b10001]) + struct.pack("<i", 0)) is None
    # raw WKB fallback
    assert gpb_decode(wkb_le).gtype == "Point"


def test_gpb_encode_decode_all_types():
    wkts = [
        "POINT (1 2)",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        "MULTIPOINT ((0 0), (1 1))",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    ]
    for w in wkts:
        g = from_wkt(w)
        assert gpb_decode(gpb_encode(g, srs_id=4326)).to_geojson() == g.to_geojson()


def test_zonal_stats_gpkg_matches_shp(tmp_path):
    """zonal_stats over a .gpkg datasource == over the reference .shp."""
    from python_rasterstats_ray import zonal_stats
    from python_rasterstats_ray.sources.shapefile import read_shapefile

    D = "/root/reference/tests/data/"
    feats = read_shapefile(D + "polygons.shp")
    p = str(tmp_path / "polygons.gpkg")
    write_geopackage(p, feats, layer="polygons")
    a = zonal_stats(p, D + "slope.tif")
    b = zonal_stats(D + "polygons.shp", D + "slope.tif")
    assert a == b


def test_gpb_empty_point_decodes_as_empty():
    """The GPKG spec encodes POINT EMPTY as POINT(NaN NaN) under the
    empty-geometry flag; the decoded Geom must report is_empty (a
    one-NaN-vertex Point would pass is_empty guards and poison bounds
    and GeoJSON emission)."""
    import struct

    from python_rasterstats_ray.sources.geopackage import gpb_decode

    wkb = b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", float("nan"), float("nan"))
    # flags: little-endian (bit0) + empty-geometry (bit4), no envelope
    blob = b"GP\x00" + bytes([0b10001]) + struct.pack("<i", 0) + wkb
    g = gpb_decode(blob)
    assert g is not None and g.geom_type == "Point" and g.is_empty
    # NULL blob stays None (strictly reserved)
    assert gpb_decode(None) is None
