"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import numpy as np
import pytest

REF_DATA = "/root/reference/tests/data"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def slope_tif():
    return f"{REF_DATA}/slope.tif"


@pytest.fixture(scope="session")
def polygons():
    return f"{REF_DATA}/polygons.shp"


@pytest.fixture(scope="session")
def slope_raster():
    """(array, affine, nodata) of slope.tif via the pure-Python reader."""
    from python_rasterstats_ray.sources.geotiff import read_geotiff

    t = read_geotiff(f"{REF_DATA}/slope.tif")
    return t.band(1), t.affine, t.nodata
