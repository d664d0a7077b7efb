"""Property-style cross-validation of the rasterizer.

The scanline fill (functions/rasterize.py) and the per-point even-odd ray
cast (functions/pip.py) are independent implementations of the same
center-rule semantics: for ANY polygon, the fill mask must equal
points_in_geom evaluated at every pixel center. Randomized (seeded)
polygons; also checks fill-subset-of-all_touched and window invariance.
"""

import numpy as np
import pytest

from python_rasterstats_ray.functions.affine import Affine
from python_rasterstats_ray.functions.geometry import Geom
from python_rasterstats_ray.functions.pip import points_in_geom
from python_rasterstats_ray.functions.rasterize import rasterize_geom, rect_geom_state
from python_rasterstats_ray.functions.windows import bounds_window, window_affine


def _random_polygon(rng, n_vertices: int, with_hole: bool) -> Geom:
    cx, cy = rng.uniform(10, 40, 2)
    theta = np.sort(rng.uniform(0, 2 * np.pi, n_vertices))
    rad = rng.uniform(3, 14, n_vertices)
    ring = np.column_stack([cx + rad * np.cos(theta), cy + rad * np.sin(theta)])
    ring = np.vstack([ring, ring[:1]])
    rings = [ring]
    if with_hole:
        hr = rng.uniform(0.5, 2.0)
        hole = np.column_stack(
            [cx + hr * np.cos(theta[::2]), cy + hr * np.sin(theta[::2])]
        )
        hole = np.vstack([hole, hole[:1]])
        rings.append(hole)
    return Geom("Polygon", polys=[rings])


@pytest.mark.parametrize("seed", range(12))
def test_fill_equals_center_pip(seed):
    rng = np.random.default_rng(seed)
    geom = _random_polygon(rng, n_vertices=int(rng.integers(3, 24)), with_hole=seed % 3 == 0)
    affine = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 50.0)
    win = bounds_window(geom.bounds, affine)
    aff = window_affine(win, affine)
    h = win[0][1] - win[0][0]
    w = win[1][1] - win[1][0]
    mask = rasterize_geom(geom, (h, w), aff)

    cols, rows = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    xs = aff.a * cols.ravel() + aff.b * rows.ravel() + aff.c
    ys = aff.d * cols.ravel() + aff.e * rows.ravel() + aff.f
    pip = points_in_geom(xs, ys, geom).reshape(h, w)
    assert np.array_equal(mask, pip), f"seed={seed}: scanline != per-center PIP"


@pytest.mark.parametrize("seed", range(8))
def test_fill_subset_of_all_touched(seed):
    rng = np.random.default_rng(100 + seed)
    geom = _random_polygon(rng, n_vertices=int(rng.integers(3, 16)), with_hole=False)
    affine = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 50.0)
    win = bounds_window(geom.bounds, affine)
    aff = window_affine(win, affine)
    shape = (win[0][1] - win[0][0], win[1][1] - win[1][0])
    fill = rasterize_geom(geom, shape, aff, all_touched=False)
    touched = rasterize_geom(geom, shape, aff, all_touched=True)
    assert not (fill & ~touched).any()
    assert touched.sum() >= fill.sum()


@pytest.mark.parametrize("seed", range(8))
def test_subwindow_invariance(seed):
    """Rasterizing a sub-window must equal the slice of the full-window
    rasterization (the property the split-by-tile join relies on)."""
    rng = np.random.default_rng(200 + seed)
    geom = _random_polygon(rng, n_vertices=int(rng.integers(3, 20)), with_hole=seed % 2 == 0)
    affine = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 50.0)
    win = bounds_window(geom.bounds, affine)
    (r0, r1), (c0, c1) = win
    full = rasterize_geom(geom, (r1 - r0, c1 - c0), window_affine(win, affine))
    # random interior sub-window
    sr0 = int(rng.integers(r0, max(r0 + 1, r1 - 1)))
    sc0 = int(rng.integers(c0, max(c0 + 1, c1 - 1)))
    sr1 = int(rng.integers(sr0 + 1, r1 + 1))
    sc1 = int(rng.integers(sc0 + 1, c1 + 1))
    sub = ((sr0, sr1), (sc0, sc1))
    part = rasterize_geom(geom, (sr1 - sr0, sc1 - sc0), window_affine(sub, affine))
    assert np.array_equal(part, full[sr0 - r0 : sr1 - r0, sc0 - c0 : sc1 - c0])
    # and rect_geom_state's 'full'/'empty' verdicts agree with the mask
    state = rect_geom_state(geom, sub, affine)
    if state == "full":
        assert part.all()
    elif state == "empty":
        assert not part.any()
