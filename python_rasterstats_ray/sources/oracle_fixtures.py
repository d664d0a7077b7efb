"""Driver-visible oracle fixtures for the zonal / point-query family.

Zonal statistics over arbitrary polygons are not natively SQL-expressible,
but for AXIS-ALIGNED RECTANGLE zones over an integer-valued raster the
reference's pixel-selection rules reduce to closed-form floor arithmetic
that DuckDB can evaluate with no engine code in the loop:

- center rule (reference utils.py:33-55): pixel (r, c) is in the zone iff
  its center (c + 0.5, H - r - 0.5) lies strictly inside the rectangle
  (rect bounds carry .0003/.0007-style offsets so no center or cell edge
  ever lands exactly on a boundary -> strict vs non-strict is moot);
- all_touched: positive-area overlap of the unit cell with the rectangle.

This module materializes, under ``ORACLE_DIR``:

- ``pixels_holes.parquet`` / ``pixels_classes.parquet``: exploded
  (row, col, val DOUBLE, is_nodata BOOL) pixel tables written straight from
  the raster *generator* — the oracle side never touches the rasterizer /
  tiling / shuffle code under test;
- ``rect_zones.parquet``: (zset, zone_id, xmin, ymin, xmax, ymax) zone sets;
  the engine receives the same rectangles as WKB polygons;
- ``rect_vertices.parquet``: (zone_id, vertex_idx, x, y) — the WKB ring
  vertex stream of the 'main' set (closed ring, 5 vertices, the order
  ``make_box`` emits) for per-feature point-query oracles;
- ``query_points.parquet``: (pt_id, x, y) sample points whose grid
  coordinates never have fractional part 0 or 0.5, so banker's rounding
  equals floor(v + 0.5) in the SQL mirror.

Pixel values are small integers stored float32 (exactly representable), so
every checked statistic is bit-exact in float64 on both sides: sums are
exact, and mean/std/bilinear mirror the engine's IEEE op order in SQL.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.affine import Affine
from ..functions.geometry import make_box, to_wkb

ORACLE_DIR = "/tmp/prsr_oracle_v6"

HOLES_SHAPE = (512, 512)
CLASSES_SHAPE = (384, 384)
NODATA = -9999.0


def oracle_raster(name: str):
    """Deterministic integer-valued raster -> (float32 array, affine, nodata).

    'holes': 512x512 integer surface (~0..100) with two rectangular nodata
    patches. 'classes': 384x384 small-int codes 1..5 with one nodata patch.
    'terrain': 512x512 strictly-positive integer surface (10..110) with its
    own nodata patch, grid-aligned with 'holes' for map-algebra oracles.
    """
    if name == "terrain":
        h, w = HOLES_SHAPE
        rows = np.arange(h, dtype=np.float64).reshape(h, 1)
        cols = np.arange(w, dtype=np.float64).reshape(1, w)
        base = 60.0 + 45.0 * np.sin(rows / 29.0 + 1.0) * np.cos(cols / 31.0 + 2.0)
        arr = np.floor(base).clip(10.0, None).astype(np.float32)
        arr[220:260, 100:150] = NODATA
        affine = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
        return arr, affine, NODATA
    if name == "holes":
        h, w = HOLES_SHAPE
        rows = np.arange(h, dtype=np.float64).reshape(h, 1)
        cols = np.arange(w, dtype=np.float64).reshape(1, w)
        base = 50.0 + 40.0 * np.sin(cols / 17.0 + 7.0) * np.cos(rows / 23.0) + 10.0 * np.sin(
            (rows + cols) / 41.0
        )
        arr = np.floor(base).astype(np.float32)
        arr[100:140, 200:260] = NODATA
        arr[300:312, 48:70] = NODATA
    elif name == "classes":
        h, w = CLASSES_SHAPE
        rows = np.arange(h, dtype=np.float64).reshape(h, 1)
        cols = np.arange(w, dtype=np.float64).reshape(1, w)
        base = 50.0 + 40.0 * np.sin(cols / 13.0 + 3.0) * np.cos(rows / 19.0)
        arr = (np.floor(base / 25.0).clip(0, 4) + 1.0).astype(np.float32)
        arr[50:60, 100:120] = NODATA
    else:
        raise ValueError(name)
    affine = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    return arr, affine, NODATA



def _snap(v: float, off: float) -> float:
    """Snap to a 1/1000 grid then add a small safe offset, so the bound's
    fractional part is never within 1e-4 of 0, 0.5 or 1 (no pixel center or
    cell edge can coincide with a zone boundary)."""
    return np.floor(v * 1000.0) / 1000.0 + off


def _clip_rect(xmin, ymin, xmax, ymax, extent):
    w, s, e, n = extent
    return (max(xmin, w), max(ymin, s), min(xmax, e), min(ymax, n))


def rect_zone_sets() -> dict[str, list[tuple[int, float, float, float, float]]]:
    """Deterministic rectangle zone sets keyed by set name.

    All bounds end in .0003/.0007 so pixel centers (x.5) and
    cell edges (integers) never coincide with a zone boundary.
    """
    out: dict[str, list] = {}

    # --- main: 40 zones over the 512^2 'holes' raster, all strictly inside
    rng = np.random.default_rng(101)
    zones = []
    side = 7
    step = 512.0 / side
    for zid in range(39):
        gy, gx = divmod(zid, side)
        cx = (gx + 0.5) * step + float(rng.uniform(-12, 12))
        cy = (gy % side + 0.5) * step + float(rng.uniform(-12, 12))
        hx = float(rng.uniform(14, 34))
        hy = float(rng.uniform(14, 34))
        r = _clip_rect(
            _snap(cx - hx, 0.0003),
            _snap(cy - hy, 0.0007),
            _snap(cx + hx, 0.0003),
            _snap(cy + hy, 0.0007),
            (0.0003, 0.0003, 511.9991, 511.9991),
        )
        zones.append((zid, *r))
    # zone 39 sits entirely inside the [100:140, 200:260] nodata patch
    # (y in (372, 412), x in (200, 260)) -> count 0 but nodata > 0
    zones.append((39, 206.0003, 380.0007, 228.0003, 398.0007))
    out["main"] = zones

    # --- cat: 24 zones over the 384^2 'classes' raster
    rng = np.random.default_rng(202)
    zones = []
    side = 5
    step = 384.0 / side
    for zid in range(23):
        gy, gx = divmod(zid, side)
        cx = (gx + 0.5) * step + float(rng.uniform(-9, 9))
        cy = (gy % side + 0.5) * step + float(rng.uniform(-9, 9))
        hx = float(rng.uniform(12, 30))
        hy = float(rng.uniform(12, 30))
        r = _clip_rect(
            _snap(cx - hx, 0.0003),
            _snap(cy - hy, 0.0007),
            _snap(cx + hx, 0.0003),
            _snap(cy + hy, 0.0007),
            (0.0003, 0.0003, 383.9991, 383.9991),
        )
        zones.append((zid, *r))
    # zone 23 inside the classes nodata patch ([50:60, 100:120] -> y (324,334))
    zones.append((23, 102.0003, 325.0007, 117.0003, 332.0007))
    out["cat"] = zones

    # --- edge: 12 zones straddling / beyond the 512^2 extent (no nodata
    # stat in their query: out-of-extent boundless fill must stay invisible)
    rng = np.random.default_rng(303)
    zones = []
    anchors = [
        (-40.0, -40.0), (-30.0, 250.0), (-25.0, 490.0),
        (250.0, -35.0), (490.0, -28.0), (495.0, 495.0),
        (505.0, 250.0), (250.0, 505.0), (-55.0, -55.0),
        (540.0, 540.0),   # fully outside (NE)
        (-90.0, 250.0),   # fully outside (W)
        (250.0, 250.0),   # fully inside control
    ]
    for zid, (ax, ay) in enumerate(anchors):
        hx = float(rng.uniform(15, 28))
        hy = float(rng.uniform(15, 28))
        zones.append(
            (
                zid,
                _snap(ax - hx, 0.0003),
                _snap(ay - hy, 0.0007),
                _snap(ax + hx, 0.0003),
                _snap(ay + hy, 0.0007),
            )
        )
    out["edge"] = zones

    # --- auto: 27 small + 3 mega rects (router skew case), all inside
    rng = np.random.default_rng(404)
    zones = []
    for zid in range(27):
        cx = float(rng.uniform(40, 472))
        cy = float(rng.uniform(40, 472))
        hx = float(rng.uniform(8, 22))
        hy = float(rng.uniform(8, 22))
        zones.append(
            (
                zid,
                _snap(cx - hx, 0.0003),
                _snap(cy - hy, 0.0007),
                _snap(cx + hx, 0.0003),
                _snap(cy + hy, 0.0007),
            )
        )
    for zid, (cx, cy) in zip((27, 28, 29), ((170.0, 200.0), (330.0, 310.0), (256.0, 256.0))):
        zones.append(
            (
                zid,
                _snap(cx - 150.0, 0.0003),
                _snap(cy - 150.0, 0.0007),
                _snap(cx + 150.0, 0.0003),
                _snap(cy + 150.0, 0.0007),
            )
        )
    out["auto"] = zones
    return out


def rect_zone_table(zset: str) -> pa.Table:
    """Engine-side input: (zone_id, geom_wkb) WKB rectangles for a set."""
    zones = rect_zone_sets()[zset]
    return pa.table(
        {
            "zone_id": pa.array([z[0] for z in zones], pa.int64()),
            "geom_wkb": pa.array(
                [to_wkb(make_box(z[1], z[2], z[3], z[4])) for z in zones], pa.binary()
            ),
        }
    )


def query_points() -> tuple[np.ndarray, np.ndarray]:
    """600 deterministic points over (-10..522)^2; grid-coordinate
    fractional parts are never 0 or 0.5."""
    k = np.arange(600, dtype=np.int64)
    x = ((k * 7919) % 5320) / 10.0 - 10.0 + 0.0003
    y = ((k * 104729) % 5320) / 10.0 - 10.0 + 0.0007
    return x, y


def irregular_zone_table(zset: str) -> pa.Table:
    """Irregular jittered-quad zones (incl. mega-polygons and, for
    'tiled', beyond-extent overhang) for the 512^2 'holes' oracle raster —
    the complex-geometry companions to the rect sets."""
    from .synthetic import generate_zones

    if zset == "tiled":
        t = generate_zones(64, extent=(-20.0, -30.0, 530.0, 520.0), seed=11, mega_every=17)
    elif zset == "broadcast":
        t = generate_zones(64, extent=(10.0, 10.0, 502.0, 502.0), seed=9)
    else:
        raise ValueError(zset)
    return t.select(["zone_id", "geom_wkb"])


def _write_irregular_vertices(tmp_dir: str) -> None:
    """Write the irregular zones' CLOSED ring vertex streams so the SQL
    oracle can derive pixel membership itself via even-odd edge-crossing
    parity at pixel centers (the ``docs_pip_zones`` trick) — NO engine
    rasterization anywhere in the oracle loop. The vertices are exactly
    the generator's (``generate_zones``) ring coordinates, round-tripped
    through the property-tested WKB codec.

    Rows: (zset, zone_id, ring_idx, vertex_idx, x, y); consecutive
    vertex_idx within a (zone, ring) form an edge, last == first."""
    from ..functions.geometry import from_wkb

    zs, zid_col, ring_col, vidx_col, x_col, y_col = [], [], [], [], [], []
    for zset in ("tiled", "broadcast"):
        tbl = irregular_zone_table(zset)
        for zid, wkb in zip(tbl["zone_id"].to_pylist(), tbl["geom_wkb"].to_pylist()):
            g = from_wkb(wkb)
            for poly in g.polys:
                for ri, ring in enumerate(poly):
                    ring = np.asarray(ring, dtype=np.float64)
                    if not np.array_equal(ring[0], ring[-1]):
                        ring = np.vstack([ring, ring[:1]])
                    n = len(ring)
                    zs.extend([zset] * n)
                    zid_col.extend([zid] * n)
                    ring_col.extend([ri] * n)
                    vidx_col.extend(range(n))
                    x_col.append(ring[:, 0])
                    y_col.append(ring[:, 1])
    pq.write_table(
        pa.table(
            {
                "zset": pa.array(zs, pa.string()),
                "zone_id": pa.array(zid_col, pa.int64()),
                "ring_idx": pa.array(ring_col, pa.int64()),
                "vertex_idx": pa.array(vidx_col, pa.int64()),
                "x": pa.array(np.concatenate(x_col), pa.float64()),
                "y": pa.array(np.concatenate(y_col), pa.float64()),
            }
        ),
        os.path.join(tmp_dir, "irregular_vertices.parquet"),
    )
    zrows = [
        (zset, zid)
        for zset in ("tiled", "broadcast")
        for zid in irregular_zone_table(zset)["zone_id"].to_pylist()
    ]
    pq.write_table(
        pa.table(
            {
                "zset": pa.array([r[0] for r in zrows], pa.string()),
                "zone_id": pa.array([r[1] for r in zrows], pa.int64()),
            }
        ),
        os.path.join(tmp_dir, "irregular_zones.parquet"),
    )


def _write_pixels(path: str, arr: np.ndarray, nodata: float) -> None:
    h, w = arr.shape
    rows = np.repeat(np.arange(h, dtype=np.int64), w)
    cols = np.tile(np.arange(w, dtype=np.int64), h)
    flat = arr.reshape(-1)
    pq.write_table(
        pa.table(
            {
                "row": pa.array(rows, pa.int64()),
                "col": pa.array(cols, pa.int64()),
                "val": pa.array(flat.astype(np.float64), pa.float64()),
                "is_nodata": pa.array(flat == nodata),
            }
        ),
        path,
    )


def ensure_fixtures() -> str:
    """Write all oracle parquet fixtures (idempotent; atomic via rename)."""
    done = os.path.join(ORACLE_DIR, "_DONE")
    if os.path.exists(done):
        return ORACLE_DIR
    tmp = ORACLE_DIR + ".tmp"
    os.makedirs(tmp, exist_ok=True)

    for name in ("holes", "classes", "terrain"):
        arr, _aff, nodata = oracle_raster(name)
        _write_pixels(os.path.join(tmp, f"pixels_{name}.parquet"), arr, nodata)

    zsets = rect_zone_sets()
    zrows = [(zset, *z) for zset, zones in zsets.items() for z in zones]
    pq.write_table(
        pa.table(
            {
                "zset": pa.array([r[0] for r in zrows], pa.string()),
                "zone_id": pa.array([r[1] for r in zrows], pa.int64()),
                "xmin": pa.array([r[2] for r in zrows], pa.float64()),
                "ymin": pa.array([r[3] for r in zrows], pa.float64()),
                "xmax": pa.array([r[4] for r in zrows], pa.float64()),
                "ymax": pa.array([r[5] for r in zrows], pa.float64()),
            }
        ),
        os.path.join(tmp, "rect_zones.parquet"),
    )

    # vertex stream of the 'main' WKB rings, in make_box emission order:
    # (e,s) (e,n) (w,n) (w,s) (e,s)
    vz, vi, vx, vy = [], [], [], []
    for zid, w, s, e, n in zsets["main"]:
        ring = [(e, s), (e, n), (w, n), (w, s), (e, s)]
        for i, (px, py) in enumerate(ring):
            vz.append(zid)
            vi.append(i)
            vx.append(px)
            vy.append(py)
    pq.write_table(
        pa.table(
            {
                "zone_id": pa.array(vz, pa.int64()),
                "vertex_idx": pa.array(vi, pa.int64()),
                "x": pa.array(vx, pa.float64()),
                "y": pa.array(vy, pa.float64()),
            }
        ),
        os.path.join(tmp, "rect_vertices.parquet"),
    )

    x, y = query_points()
    pq.write_table(
        pa.table(
            {
                "pt_id": pa.array(np.arange(len(x), dtype=np.int64), pa.int64()),
                "x": pa.array(x, pa.float64()),
                "y": pa.array(y, pa.float64()),
            }
        ),
        os.path.join(tmp, "query_points.parquet"),
    )

    _write_irregular_vertices(tmp)

    # media fixture: the engine consumes the binary payload, the SQL
    # oracle the parallel hex encoding (this DuckDB has no BLOB substring)
    from ..stages.multimodal import synth_media_table

    media = synth_media_table(200)
    media = media.append_column(
        "payload_hex",
        pa.array([p_.hex() for p_ in media["payload"].to_pylist()], pa.string()),
    )
    pq.write_table(media, os.path.join(tmp, "media.parquet"))

    # pages corpus fixture: the INPUT table of the north-rule pages
    # pipeline (url, warc_ts, html, text, lang), identical to what
    # pages_dataset(10_000, seed=42) streams — the SQL oracle re-derives
    # geotag (sha256-based page_geotag), PIP assignment, token counts and
    # the sha-xor digest from this corpus with no engine code in the loop
    from .synthetic import generate_pages

    pq.write_table(
        generate_pages(10_000, seed=42), os.path.join(tmp, "pages10k.parquet")
    )

    open(os.path.join(tmp, "_DONE"), "w").close()
    try:
        os.rename(tmp, ORACLE_DIR)
    except OSError:
        # lost the race to a concurrent writer; theirs is identical
        if not os.path.exists(done):
            raise
    return ORACLE_DIR
