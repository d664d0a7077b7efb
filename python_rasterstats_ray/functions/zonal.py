"""Sequential zonal-statistics oracle — the drop-in ``zonal_stats`` API.

Semantics parity with /root/reference/src/rasterstats/main.py:57-337
(windowed boundless read, GDAL-rule rasterization, nodata/NaN masking,
int64 accumulator widening, population std, majority/minority ascending
tie-break, empty-zone None/count=0, nodata/nan over the geometry-only mask,
percentiles, categorical histograms, add_stats/zone_func/raster_out/prefix/
geojson_out). This kernel is also the conformance oracle for the
distributed Ray Data pipeline (stages/zonal_dist.py): the differential test
requires row-identical output.
"""

from __future__ import annotations

import inspect
import sys
import warnings

import numpy as np

from ..sources.features import read_features
from ..sources.raster import Raster
from .affine import Affine
from .geometry import from_geojson
from .rasterize import rasterize_geom
from .stats import boxify_points, check_stats, get_percentile, key_assoc_val, remap_categories


def raster_stats(*args, **kwargs):
    """Deprecated alias of zonal_stats."""
    warnings.warn(
        "'raster_stats' is an alias to 'zonal_stats' and will disappear in 1.0",
        DeprecationWarning,
    )
    return zonal_stats(*args, **kwargs)


def zonal_stats(*args, **kwargs):
    """Zonal statistics of raster values aggregated to vector geometries;
    returns a list (see ``gen_zonal_stats``)."""
    return list(gen_zonal_stats(*args, **kwargs))


def compute_feature_stats(
    masked: np.ma.MaskedArray,
    stats: list[str],
    run_count: bool,
    categorical: bool = False,
    category_map: dict | None = None,
) -> dict:
    """Stat-dict assembly for one zone's masked pixel window
    (main.py:230-302). Shared by the oracle and the distributed finalizer."""
    if sys.maxsize > 2**32 and issubclass(masked.dtype.type, np.integer):
        accum_dtype = "int64"
    else:
        accum_dtype = None

    if masked.compressed().size == 0:
        feature_stats = {stat: None for stat in stats}
        if "count" in stats:
            feature_stats["count"] = 0
        return feature_stats

    pixel_count: dict = {}
    if run_count:
        keys, counts = np.unique(masked.compressed(), return_counts=True)
        pixel_count = dict(zip([k.item() for k in keys], [c.item() for c in counts]))

    if categorical:
        feature_stats = dict(pixel_count)
        if category_map:
            feature_stats = remap_categories(category_map, feature_stats)
    else:
        feature_stats = {}

    if "min" in stats:
        feature_stats["min"] = float(masked.min())
    if "max" in stats:
        feature_stats["max"] = float(masked.max())
    if "mean" in stats:
        feature_stats["mean"] = float(masked.mean(dtype=accum_dtype))
    if "count" in stats:
        feature_stats["count"] = int(masked.count())
    if "sum" in stats:
        feature_stats["sum"] = float(masked.sum(dtype=accum_dtype))
    if "std" in stats:
        feature_stats["std"] = float(masked.std())
    if "median" in stats:
        feature_stats["median"] = float(np.median(masked.compressed()))
    if "majority" in stats:
        feature_stats["majority"] = float(key_assoc_val(pixel_count, max))
    if "minority" in stats:
        feature_stats["minority"] = float(key_assoc_val(pixel_count, min))
    if "unique" in stats:
        feature_stats["unique"] = len(pixel_count.keys())
    if "range" in stats:
        rmin = feature_stats.get("min")
        if rmin is None:
            rmin = float(masked.min())
        rmax = feature_stats.get("max")
        if rmax is None:
            rmax = float(masked.max())
        feature_stats["range"] = rmax - rmin
    for pctile in [s for s in stats if s.startswith("percentile_")]:
        q = get_percentile(pctile)
        feature_stats[pctile] = float(np.percentile(masked.compressed(), q))
    return feature_stats


def gen_zonal_stats(
    vectors,
    raster,
    layer=0,
    band=1,
    nodata=None,
    affine=None,
    stats=None,
    all_touched=False,
    categorical=False,
    category_map=None,
    add_stats=None,
    zone_func=None,
    raster_out=False,
    prefix=None,
    geojson_out=False,
    boundless=True,
    **kwargs,
):
    """Generator form of zonal_stats; one dict (or GeoJSON feature) per
    input feature, in input order."""
    stats, run_count = check_stats(stats, categorical)

    # 1.0 deprecation shims (main.py:159-179)
    transform = kwargs.get("transform")
    if transform:
        warnings.warn(
            "GDAL-style transforms will disappear in 1.0. "
            "Use affine=Affine.from_gdal(*transform) instead",
            DeprecationWarning,
        )
        if not affine:
            affine = Affine.from_gdal(*transform)
    if kwargs.get("copy_properties"):
        warnings.warn("Use `geojson_out` to preserve feature properties", DeprecationWarning)
    band_num = kwargs.get("band_num")
    if band_num:
        warnings.warn("Use `band` to specify band number", DeprecationWarning)
        band = band_num

    with Raster(raster, affine, nodata, band) as rast:
        features_iter = read_features(vectors, layer)
        for feat in features_iter:
            geom = from_geojson(feat["geometry"])

            if "Point" in geom.geom_type:
                geom = boxify_points(geom, rast.affine)

            geom_bounds = tuple(geom.bounds)
            fsrc = rast.read(bounds=geom_bounds, boundless=boundless)

            rv_array = rasterize_geom(
                geom, shape=fsrc.shape, affine=fsrc.affine, all_touched=all_touched
            )

            isnodata = fsrc.array == fsrc.nodata

            has_nan = np.issubdtype(fsrc.array.dtype, np.floating) and np.isnan(
                fsrc.array.min()
            )
            if has_nan:
                isnodata = isnodata | np.isnan(fsrc.array)

            masked = np.ma.MaskedArray(fsrc.array, mask=(isnodata | ~rv_array))

            if zone_func is not None:
                if not callable(zone_func):
                    raise TypeError(
                        "zone_func must be a callable function "
                        "which accepts a single `zone_array` arg."
                    )
                value = zone_func(masked)
                if value is not None:
                    masked = value

            feature_stats = compute_feature_stats(
                masked, stats, run_count, categorical, category_map
            )

            if "nodata" in stats or "nan" in stats:
                featmasked = np.ma.MaskedArray(fsrc.array, mask=(~rv_array))
                if "nodata" in stats:
                    feature_stats["nodata"] = float((featmasked == fsrc.nodata).sum())
                if "nan" in stats:
                    feature_stats["nan"] = (
                        float(np.isnan(featmasked).sum()) if has_nan else 0
                    )

            if add_stats is not None:
                for stat_name, stat_func in add_stats.items():
                    n_params = len(inspect.signature(stat_func).parameters.keys())
                    if n_params == 3:
                        feature_stats[stat_name] = stat_func(
                            masked, feat["properties"], rv_array
                        )
                    elif n_params == 2:
                        feature_stats[stat_name] = stat_func(masked, feat["properties"])
                    else:
                        feature_stats[stat_name] = stat_func(masked)

            if raster_out:
                feature_stats["mini_raster_array"] = masked
                feature_stats["mini_raster_affine"] = fsrc.affine
                feature_stats["mini_raster_nodata"] = fsrc.nodata

            if prefix is not None:
                feature_stats = {f"{prefix}{k}": v for k, v in feature_stats.items()}

            if geojson_out:
                if "properties" not in feat or feat["properties"] is None:
                    feat["properties"] = {}
                for key, val in feature_stats.items():
                    feat["properties"][key] = val
                yield feat
            else:
                yield feature_stats
