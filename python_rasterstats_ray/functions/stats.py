"""Stat-spec parsing, categorical helpers, CSV output, point boxification.

Parity targets: /root/reference/src/rasterstats/utils.py (check_stats:80-103,
get_percentile:21-30, key_assoc_val:117-122, remap_categories:106-114,
stats_to_csv:58-77, boxify_points:125-145).
"""

from __future__ import annotations

import numpy as np

from .affine import Affine
from .geometry import Geom, make_multipolygon
from .windows import window_bounds

DEFAULT_STATS = ["count", "min", "max", "mean"]
VALID_STATS = DEFAULT_STATS + [
    "sum",
    "std",
    "median",
    "majority",
    "minority",
    "unique",
    "range",
    "nodata",
    "nan",
]


def get_percentile(stat: str) -> float:
    if not stat.startswith("percentile_"):
        raise ValueError("must start with 'percentile_'")
    q = float(stat.replace("percentile_", ""))
    if q > 100.0:
        raise ValueError("percentiles must be <= 100")
    if q < 0.0:
        raise ValueError("percentiles must be >= 0")
    return q


def check_stats(stats, categorical: bool):
    """Normalize a stats spec; returns (stats_list, run_count)."""
    if not stats:
        stats = [] if categorical else DEFAULT_STATS
    elif isinstance(stats, str):
        if stats in ("*", "ALL"):
            stats = list(VALID_STATS)
        else:
            stats = stats.split()
    for x in stats:
        if x.startswith("percentile_"):
            get_percentile(x)
        elif x not in VALID_STATS:
            raise ValueError(f"Stat {x!r} not valid; must be one of \n {VALID_STATS}")
    run_count = bool(
        categorical or "majority" in stats or "minority" in stats or "unique" in stats
    )
    return stats, run_count


def remap_categories(category_map: dict, stats: dict) -> dict:
    return {category_map.get(k, k): v for k, v in stats.items()}


def key_assoc_val(d: dict, func):
    """Key whose value == func(values); first match wins (ties -> smallest
    key because inputs come from np.unique, which sorts ascending)."""
    vs = list(d.values())
    ks = list(d.keys())
    return ks[vs.index(func(vs))]


def stats_to_csv(stats: list[dict]) -> str:
    import csv
    from io import StringIO

    keys = set()
    for stat in stats:
        keys.update(stat.keys())
    fieldnames = sorted(keys, key=str)
    fh = StringIO()
    writer = csv.DictWriter(fh, delimiter=",", fieldnames=fieldnames)
    writer.writerow({fn: fn for fn in fieldnames})
    for row in stats:
        writer.writerow(row)
    contents = fh.getvalue()
    fh.close()
    return contents


def boxify_points(geom: Geom, affine: Affine) -> Geom:
    """Point/MultiPoint -> MultiPolygon of boxes shrunk 1% of cellsize and
    centered on the **containing raster cell**, so center-rule rasterization
    burns exactly that cell (utils.py:125-145 semantics)."""
    if not geom.is_point_type:
        raise ValueError("Points or multipoints only")
    buff = -0.01 * abs(min(affine.a, affine.e))
    inv = ~affine
    boxes = []
    for x, y in geom.pts:
        col = int(np.floor(inv.a * x + inv.b * y + inv.c))
        row = int(np.floor(inv.d * x + inv.e * y + inv.f))
        w, s, e, n = window_bounds(((row, row + 1), (col, col + 1)), affine)
        # inset box by |buff| on each side (negative shapely buffer parity)
        ring = np.array(
            [
                [e + buff, s - buff],
                [e + buff, n + buff],
                [w - buff, n + buff],
                [w - buff, s - buff],
                [e + buff, s - buff],
            ],
            dtype=np.float64,
        )
        boxes.append(Geom("Polygon", polys=[[ring]]))
    return make_multipolygon(boxes)
