"""Point-query oracle: nearest / bilinear raster sampling at geometry
vertices. Parity: /root/reference/src/rasterstats/point.py (round-half-even
window centering at :18, masked->nearest->None fallback at :50-57, vertex
flattening at :68-87 and single-vertex scalar flattening at :198-199)."""

from __future__ import annotations

import numpy as np

from ..sources.features import read_features
from ..sources.raster import Raster
from .affine import Affine
from .geometry import from_geojson


def point_window_unitxy(x: float, y: float, affine: Affine):
    """2x2 window whose cell centers bracket (x, y), plus the point's
    coordinates on the unit square spanned by those centers.

    Uses banker's rounding (python round / np.round) like the reference.
    """
    inv = ~affine
    fcol = inv.a * x + inv.b * y + inv.c
    frow = inv.d * x + inv.e * y + inv.f
    r, c = round(frow), round(fcol)
    new_win = ((r - 1, r + 1), (c - 1, c + 1))
    unitxy = (0.5 - (c - fcol), 0.5 + (r - frow))
    return new_win, unitxy


def bilinear(arr, x: float, y: float):
    """Bilinear interpolation on a 2x2 array whose centers form the unit
    square; masked cells trigger nearest-neighbor fallback, fully masked
    nearest returns None."""
    assert arr.shape == (2, 2)
    ulv, urv, llv, lrv = arr[0:2, 0:2].flatten().tolist()
    assert 0.0 <= x <= 1.0
    assert 0.0 <= y <= 1.0

    if hasattr(arr, "count") and arr.count() != 4:
        val = arr[round(1 - y), round(x)]
        if val is np.ma.masked:
            return None
        return val.item()

    return (
        (llv * (1 - x) * (1 - y))
        + (lrv * x * (1 - y))
        + (ulv * (1 - x) * y)
        + (urv * x * y)
    )


def geom_xys(geom):
    """Flattened (x, y) vertex stream of any geometry."""
    yield from from_geojson(geom).geom_xys() if isinstance(geom, dict) else geom.geom_xys()


def point_query(*args, **kwargs):
    """Raster values at each vertex of each feature; returns a list."""
    return list(gen_point_query(*args, **kwargs))


def gen_point_query(
    vectors,
    raster,
    band=1,
    layer=0,
    nodata=None,
    affine=None,
    interpolate="bilinear",
    property_name="value",
    geojson_out=False,
    boundless=True,
):
    """Generator: per feature, a scalar (single vertex) or list of values
    (one per vertex); None for masked/off-grid vertices."""
    if interpolate not in ["nearest", "bilinear"]:
        raise ValueError("interpolate must be nearest or bilinear")

    features_iter = read_features(vectors, layer)

    with Raster(raster, nodata=nodata, affine=affine, band=band) as rast:
        for feat in features_iter:
            geom = from_geojson(feat["geometry"])
            vals = []
            for x, y in geom.geom_xys():
                if interpolate == "nearest":
                    r, c = rast.index(x, y)
                    window = ((int(r), int(r + 1)), (int(c), int(c + 1)))
                    src_array = rast.read(
                        window=window, masked=True, boundless=boundless
                    ).array
                    val = src_array[0, 0]
                    if val is np.ma.masked:
                        vals.append(None)
                    else:
                        vals.append(val.item())
                else:
                    window, unitxy = point_window_unitxy(x, y, rast.affine)
                    src_array = rast.read(
                        window=window, masked=True, boundless=boundless
                    ).array
                    vals.append(bilinear(src_array, *unitxy))

            if len(vals) == 1:
                vals = vals[0]

            if geojson_out:
                if "properties" not in feat or feat["properties"] is None:
                    feat["properties"] = {}
                feat["properties"][property_name] = vals
                yield feat
            else:
                yield vals
