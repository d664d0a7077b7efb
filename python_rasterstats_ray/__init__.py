"""python_rasterstats_ray — a Ray-Data-native zonal-statistics / spatial-join
engine with the query surface of perrygeo/python-rasterstats, rebuilt from
scratch on ray.data.Dataset + zero-copy Arrow batches.

Top-level API mirrors the reference package surface
(/root/reference/src/rasterstats/__init__.py): ``zonal_stats``,
``gen_zonal_stats``, ``point_query``, ``gen_point_query``, ``raster_stats``
— these run the sequential oracle kernels. The distributed Ray Data
pipelines live in ``python_rasterstats_ray.pipelines`` and
``python_rasterstats_ray.stages``.
"""

from .functions.point import gen_point_query, point_query  # noqa: F401
from .functions.zonal import gen_zonal_stats, raster_stats, zonal_stats  # noqa: F401

__version__ = "0.1.0"

__all__ = [
    "zonal_stats",
    "gen_zonal_stats",
    "raster_stats",
    "point_query",
    "gen_point_query",
]
