"""Scale-headroom probe: 2.5x the bench workload through the headline
tiled zonal plan (storage-bucketed). 1,000,000 zones (64-vertex jittered
polygons incl. megas) x 16384^2 float32 holed raster, 512px tiles.

Staging (raster, tiles, cell-bucketed zone store) is untimed — it is the
at-scale storage layout. The timed run is `zonal_stats_tiled_from_store`
at 32 CPUs; the claim to check is zones/s >= the 400k-zone bench number
(the fixed ramp must amortize, per-zone cost must stay flat, and no
driver-side structure may grow with the input).

Usage: python scripts/headroom.py [num_cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Defaults = the 2.5x probe; override via env for the bigger notches
# (e.g. HEADROOM_ZONES=2000000 HEADROOM_DIR=/tmp/prsr_headroom_2m for the
# 5x / 2M-zone rerun). Layout positions scale with the zone count so zone
# density per tile stays comparable.
D = os.environ.get("HEADROOM_DIR", "/tmp/prsr_headroom_r3")
H = int(os.environ.get("HEADROOM_H", 16384))
TILE = 512
N_ZONES = int(os.environ.get("HEADROOM_ZONES", 1_000_000))
N_LAYOUT = max(50_000, N_ZONES // 20)
MEGA_EVERY = 100_003
N_VERTICES = 64


def stage() -> None:
    import numpy as np
    import pyarrow.parquet as pq

    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.sources.synthetic import generate_raster, generate_zones
    from python_rasterstats_ray.sources.tiles import raster_to_tiles_table
    from python_rasterstats_ray.stages.zonal_dist import assign_zones_to_cells

    marker = f"{D}/_staged_{H}_{N_ZONES}"
    if os.path.exists(marker):
        return
    os.makedirs(D, exist_ok=True)
    t0 = time.time()
    arr, affine, nodata = generate_raster((H, H), kind="holes", seed=7)
    print(f"raster gen {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=TILE)
    os.makedirs(f"{D}/tiles", exist_ok=True)
    step = (len(tiles) + 31) // 32
    for i in range(32):
        part = tiles.slice(i * step, step)
        if len(part):
            pq.write_table(part, f"{D}/tiles/part-{i:04d}.parquet", row_group_size=4)
    del tiles, arr
    print(f"tiles staged {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    zones = generate_zones(
        N_ZONES,
        extent=(-50.0, -50.0, H + 50.0, H + 50.0),
        seed=11,
        mega_every=MEGA_EVERY,
        n_vertices=N_VERTICES,
        layout_positions=N_LAYOUT,
    )
    print(f"zones gen {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    import pyarrow as pa
    import pyarrow.compute as pc
    import numpy as np

    tagged = assign_zones_to_cells(
        zones.select(["zone_id", "geom_wkb"]), affine=affine, tile_size=TILE
    )
    tagged = pa.table(
        {
            "cell": pc.fill_null(tagged["cell"], -1),
            "zone_id": tagged["zone_id"],
            # large_binary: at 2M+ zones the tagged WKB exceeds 2 GB and a
            # 32-bit-offset binary column overflows in the sort gather
            "geom_wkb": tagged["geom_wkb"].cast(pa.large_binary()),
        }
    )
    order = pc.sort_indices(tagged["cell"])
    tagged = tagged.take(order)
    cells = tagged["cell"].to_numpy(zero_copy_only=False)
    bounds = np.flatnonzero(np.diff(cells)) + 1
    starts = np.concatenate([[0], bounds])
    stops = np.concatenate([bounds, [len(cells)]])
    os.makedirs(f"{D}/zones_bucketed", exist_ok=True)
    for s, e in zip(starts, stops):
        cell = int(cells[s])
        d = os.path.join(D, "zones_bucketed", f"cell={cell}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            tagged.slice(s, e - s).select(["zone_id", "geom_wkb"]),
            os.path.join(d, "part-0.parquet"),
        )
    print(f"bucketed store staged {time.time() - t0:.1f}s "
          f"({len(starts)} buckets, {len(tagged)} rows)", flush=True)
    with open(marker, "w") as f:
        f.write("ok")


def run(num_cpus: int) -> None:
    import ray
    import ray.data

    from python_rasterstats_ray.functions.affine import Affine
    from python_rasterstats_ray.stages.zonal_dist import zonal_stats_tiled_from_store

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    affine = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(H))
    tiles = ray.data.read_parquet(f"{D}/tiles")
    t0 = time.time()
    out = zonal_stats_tiled_from_store(
        f"{D}/zones_bucketed", tiles, affine, -9999.0,
        raster_dtype="float32",
        stats="count min max mean sum std nodata",
        tile_size=TILE,
    )
    n = out.count()
    dt = time.time() - t0
    assert n == N_ZONES, n
    print(f"headroom: {dt:.1f}s = {n / dt:.0f} zones/s ({num_cpus} cpus)",
          flush=True)
    ray.shutdown()


if __name__ == "__main__":
    stage()
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
