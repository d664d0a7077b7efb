"""The rect-zone oracle fixtures rest on one property: for axis-aligned
rectangles with boundary-avoiding offsets, the engine's scanline rasterizer
(center rule + all_touched) equals closed-form floor arithmetic — the same
arithmetic the DuckDB oracle SQL evaluates. Pin it here for every fixture
zone set so a rasterizer change can't silently detach the oracles."""

import numpy as np

from python_rasterstats_ray.functions.geometry import make_box
from python_rasterstats_ray.functions.rasterize import rasterize_geom
from python_rasterstats_ray.sources.oracle_fixtures import (
    ensure_fixtures,
    oracle_raster,
    rect_zone_sets,
)


def _analytic_center(h, w, xmin, ymin, xmax, ymax):
    cc = np.arange(w) + 0.5
    rr = h - np.arange(h) - 0.5
    return ((rr[:, None] > ymin) & (rr[:, None] < ymax)) & (
        (cc[None, :] > xmin) & (cc[None, :] < xmax)
    )


def _analytic_all_touched(h, w, xmin, ymin, xmax, ymax):
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    return ((h - r > ymin) & (h - r - 1 < ymax)) & ((c + 1 > xmin) & (c < xmax))


def test_rect_rasterization_matches_floor_arithmetic():
    shapes = {"main": "holes", "cat": "classes", "edge": "holes", "auto": "holes"}
    for zset, rname in shapes.items():
        arr, affine, _ = oracle_raster(rname)
        h, w = arr.shape
        for zid, xmin, ymin, xmax, ymax in rect_zone_sets()[zset]:
            g = make_box(xmin, ymin, xmax, ymax)
            got = rasterize_geom(g, (h, w), affine, False)
            exp = _analytic_center(h, w, xmin, ymin, xmax, ymax)
            assert (got == exp).all(), (zset, zid, "center")
            got_t = rasterize_geom(g, (h, w), affine, True)
            exp_t = _analytic_all_touched(h, w, xmin, ymin, xmax, ymax)
            assert (got_t == exp_t).all(), (zset, zid, "all_touched")


def test_fixture_boundary_offsets():
    """No rect bound may coincide with a pixel center (x.5) or cell edge
    (integer) — that would make strict-vs-non-strict comparisons visible."""
    for zones in rect_zone_sets().values():
        for _, *bounds in zones:
            for b in bounds:
                frac = b - np.floor(b)
                assert abs(frac - 0.5) > 1e-4 and frac > 1e-4 and frac < 1 - 1e-4


def test_query_points_avoid_half_integers():
    from python_rasterstats_ray.sources.oracle_fixtures import query_points

    x, y = query_points()
    for v in (x, 512.0 - y):  # fcol and frow for the holes raster
        frac = v - np.floor(v)
        assert (np.abs(frac - 0.5) > 1e-4).all() and (frac > 1e-4).all()


def test_ensure_fixtures_idempotent(tmp_path, monkeypatch):
    import python_rasterstats_ray.sources.oracle_fixtures as of

    d = str(tmp_path / "oracle")
    monkeypatch.setattr(of, "ORACLE_DIR", d)
    p1 = of.ensure_fixtures()
    import os

    files = sorted(os.listdir(p1))
    p2 = of.ensure_fixtures()
    assert p1 == p2 == d and sorted(os.listdir(p2)) == files
    assert "_DONE" in files and "pixels_holes.parquet" in files
