"""Golden-parity tests for the point-query oracle (reference
tests/test_point.py assertions on its own fixtures)."""

import math

import pytest

from python_rasterstats_ray import point_query
from python_rasterstats_ray.functions.affine import Affine
from python_rasterstats_ray.functions.point import bilinear, point_window_unitxy
from python_rasterstats_ray.functions.geometry import from_wkt

from conftest import REF_DATA

slope = f"{REF_DATA}/slope.tif"


def test_point_window_unitxy():
    # slope.tif affine; goldens from tests/test_point.py:15-55
    from python_rasterstats_ray.sources.geotiff import read_geotiff

    affine = read_geotiff(slope).affine
    win, unitxy = point_window_unitxy(245300, 1000073, affine)
    assert win == ((30, 32), (38, 40))
    ux, uy = unitxy
    assert 0.0 <= ux <= 1.0 and 0.0 <= uy <= 1.0


def test_bilinear_identities():
    import numpy as np

    arr = np.array([[1.0, 2.0], [3.0, 4.0]])
    # corners return the corner values
    assert bilinear(arr, 0, 1) == 1.0
    assert bilinear(arr, 1, 1) == 2.0
    assert bilinear(arr, 0, 0) == 3.0
    assert bilinear(arr, 1, 0) == 4.0
    # center is the mean of all four
    assert bilinear(arr, 0.5, 0.5) == arr.mean()


def test_masked_bilinear_fallbacks():
    import numpy as np

    arr = np.ma.MaskedArray(
        np.array([[1.0, 2.0], [3.0, 4.0]]),
        mask=[[False, True], [False, False]],
    )
    # nearest-neighbor fallback
    assert bilinear(arr, 0.1, 0.1) == 3.0
    # nearest is masked -> None
    assert bilinear(arr, 0.9, 0.9) is None


def test_point_query_bilinear_golden():
    vals = point_query("POINT(245309 1000064)", slope)
    assert vals[0] == pytest.approx(74.09817594635244)


def test_point_query_nearest():
    vals = point_query("POINT(245309 1000064)", slope, interpolate="nearest")
    assert vals[0] == pytest.approx(74.0, abs=1.0)


def test_point_query_nodata_none():
    # point over an interior nodata hole -> None (tests/test_point.py:98-117)
    vals = point_query("POINT(245309 1000308)", f"{REF_DATA}/slope_nodata.tif")
    assert vals[0] is None


def test_point_query_nodata_nearest_fallback():
    vals = point_query("POINT(245905 1000361)", f"{REF_DATA}/slope_nodata.tif")
    assert vals[0] == pytest.approx(43.0, abs=1.0)


def test_point_query_off_grid_none():
    vals = point_query("POINT(-100 -100)", slope)
    assert vals[0] is None


def test_points_file_three_values():
    vals = point_query(f"{REF_DATA}/points.shp", slope)
    assert len(vals) == 3
    assert vals[0] == pytest.approx(14.037668283186257)
    assert vals[1] == pytest.approx(33.1370268256543)
    assert vals[2] == pytest.approx(36.46848854950241)


@pytest.mark.parametrize(
    "shp,flat",
    [
        ("points.shp", True),  # single vertex -> scalar
        ("multipoints.shp", False),
        ("lines.shp", False),
        ("polygons.shp", False),
    ],
)
def test_vertex_flattening(shp, flat):
    vals = point_query(f"{REF_DATA}/{shp}", slope)
    if flat:
        assert all(not isinstance(v, list) for v in vals)
    else:
        assert all(isinstance(v, list) and len(v) > 1 for v in vals)


def test_3d_coords_flattened():
    g = from_wkt("POINT Z (245309 1000064 999)")
    assert g.pts.shape == (1, 2)
    vals = point_query([g.to_geojson()], slope)
    assert vals[0] == pytest.approx(74.09817594635244)


def test_interpolate_validation():
    with pytest.raises(ValueError):
        point_query("POINT(0 0)", slope, interpolate="cubic")


def test_geojson_out_property():
    feats = point_query(
        f"{REF_DATA}/points.shp", slope, geojson_out=True, property_name="elev"
    )
    assert all("elev" in f["properties"] for f in feats)
