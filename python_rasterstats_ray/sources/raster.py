"""Raster abstraction over ndarray+affine or a GeoTIFF path (io.py:234-362
parity, minus rasterio: file access goes through the pure-Python reader in
``geotiff.py``)."""

from __future__ import annotations

import math
import warnings

import numpy as np

from ..functions.affine import Affine, guard_affine
from ..functions.windows import (
    beyond_extent,
    boundless_array,
    bounds_window,
    window_affine,
)
from .geotiff import read_geotiff


class NodataWarning(UserWarning):
    pass


# module-global once-only flag, mirroring io.py:228-231
already_warned_nodata = False


class Raster:
    """2/3-D raster with affine georeferencing.

    ``raster`` may be a numpy array (requires ``affine``) or a path to a
    GeoTIFF readable by :func:`read_geotiff`. ``read`` returns a new Raster
    whose affine is re-anchored to the window origin; boundless reads fill
    with nodata (default -999 with a once-per-process NodataWarning when the
    source declares none, io.py:332-340). Datasets carrying an internal
    validity mask force masked reads like rasterio's per-dataset masks
    (io.py:349-356).
    """

    def __init__(self, raster, affine=None, nodata=None, band: int = 1):
        self.array = None
        self.src = None
        self.dataset_mask = None
        self.band = band

        if isinstance(raster, np.ndarray):
            if affine is None:
                raise ValueError("Specify affine transform for numpy arrays")
            self.array = raster
            self.affine = guard_affine(affine)
            self.shape = raster.shape
            self.nodata = nodata
        else:
            tif = read_geotiff(str(raster))
            self.src = tif
            self.affine = guard_affine(affine) if affine is not None else tif.affine
            self.array = tif.band(band)
            self.shape = self.array.shape
            self.dataset_mask = tif.mask
            self.nodata = float(nodata) if nodata is not None else tif.nodata

    def index(self, x: float, y: float) -> tuple[int, int]:
        """(x, y) world -> (row, col) pixel via full inverse affine floor."""
        inv = ~self.affine
        col = math.floor(inv.a * x + inv.b * y + inv.c)
        row = math.floor(inv.d * x + inv.e * y + inv.f)
        return row, col

    def read(self, bounds=None, window=None, masked: bool = False, boundless: bool = True):
        if bounds and window:
            raise ValueError("Specify either bounds or window")
        if bounds:
            win = bounds_window(bounds, self.affine)
        elif window:
            win = window
        else:
            raise ValueError("Specify either bounds or window")

        if not boundless and beyond_extent(win, self.shape):
            raise ValueError(
                "Window/bounds is outside dataset extent, boundless reads are disabled"
            )

        new_affine = window_affine(win, self.affine)

        nodata = self.nodata
        if nodata is None:
            nodata = -999
            global already_warned_nodata
            if not already_warned_nodata:
                warnings.warn(
                    "Setting nodata to -999; specify nodata explicitly", NodataWarning
                )
                already_warned_nodata = True

        if self.dataset_mask is not None and not masked:
            masked = True
            warnings.warn("Setting masked to True because dataset mask has been detected")

        new_array = boundless_array(self.array, window=win, nodata=nodata, masked=masked)

        if self.dataset_mask is not None:
            valid = boundless_array(
                self.dataset_mask.astype(np.uint8), window=win, nodata=0
            ).astype(bool)
            prior = np.ma.getmaskarray(new_array) if np.ma.isMaskedArray(new_array) else False
            new_array = np.ma.MaskedArray(
                np.ma.getdata(new_array), mask=(prior | ~valid)
            )

        return Raster(new_array, new_affine, nodata)

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.src = None
