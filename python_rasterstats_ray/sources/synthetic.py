"""Deterministic synthetic inputs (fixed seed, no external data).

Three generators, per FIXTURES.md sections 1-3:
- rasters: smooth/categorical/nodata-holed grids of any shape+affine
- zones: polygon grid with jittered vertices -> Arrow table (zone_id, geom_wkb)
- web pages: Common-Crawl-style table (url, warc_ts, html, text, lang) with
  a deterministic geotag derived from the url hash; ``text`` is a pure
  function of ``url`` so byte-identity is checkable by re-derivation.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.affine import Affine
from ..functions.geometry import Geom, to_wkb

DEFAULT_AFFINE = Affine(1.0, 0.0, 0.0, 0.0, -1.0, 0.0)  # y flips below origin


def generate_raster(
    shape: tuple[int, int] = (512, 512),
    affine: Affine | None = None,
    kind: str = "continuous",
    nodata: float = -9999.0,
    seed: int = 42,
):
    """Deterministic raster: (array float32, affine, nodata).

    kinds: continuous (smooth trig surface), classes (small int codes),
    holes (continuous with nodata blobs), all_nodata.
    """
    h, w = shape
    if affine is None:
        affine = Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    rows = np.arange(h, dtype=np.float32).reshape(h, 1)
    cols = np.arange(w, dtype=np.float32).reshape(1, w)
    base = (
        np.float32(50.0)
        + np.float32(40.0) * np.sin(cols / 17.0 + seed, dtype=np.float32)
        * np.cos(rows / 23.0, dtype=np.float32)
        + np.float32(10.0) * np.sin((rows + cols) / 41.0, dtype=np.float32)
    )
    if kind == "continuous":
        arr = base.astype(np.float32)
    elif kind == "classes":
        arr = (np.floor(base / 25.0).clip(0, 4) + 1.0).astype(np.float32)
    elif kind == "holes":
        arr = base.astype(np.float32)
        hole = (np.sin(rows / 11.0 + 1.0) * np.sin(cols / 13.0 + 2.0)) > 0.55
        arr[hole] = nodata
    elif kind == "all_nodata":
        arr = np.full(shape, nodata, dtype=np.float32)
    else:
        raise ValueError(kind)
    return arr, affine, nodata


def generate_zones(
    n_zones: int,
    extent: tuple[float, float, float, float],
    seed: int = 42,
    with_holes: bool = False,
    mega_every: int | None = None,
    n_vertices: int = 4,
    layout_positions: int | None = None,
) -> pa.Table:
    """Deterministic polygon zones covering ``extent`` -> Arrow table
    (zone_id:int64, geom_wkb:binary, zcat:int64).

    Zones are jittered quadrilaterals (or ``n_vertices``-gon radial
    polygons) laid out on a grid; every ``mega_every``-th zone is inflated
    to span a large fraction of the extent (skew / mega-polygon test case).
    """
    rng = np.random.default_rng(seed)
    w0, s0, e0, n0 = extent
    # layout_positions < n_zones makes zones overlap while keeping their
    # size constant (grid density decoupled from zone count)
    n_pos = layout_positions or n_zones
    side = int(np.ceil(np.sqrt(n_pos)))
    dx = (e0 - w0) / side
    dy = (n0 - s0) / side
    rows = []
    for zid in range(n_zones):
        gy, gx = divmod(zid % n_pos, side)
        cx = w0 + (gx + 0.5) * dx
        cy = s0 + (gy + 0.5) * dy
        hx, hy = 0.45 * dx, 0.45 * dy
        if mega_every and zid % mega_every == mega_every - 1:
            hx, hy = 0.35 * (e0 - w0), 0.35 * (n0 - s0)
            cx = (w0 + e0) / 2 + float(rng.uniform(-0.1, 0.1)) * (e0 - w0)
            cy = (s0 + n0) / 2 + float(rng.uniform(-0.1, 0.1)) * (n0 - s0)
        if n_vertices > 4:
            # star-jittered radial polygon (complex boundary, CPU-heavy
            # rasterization relative to its pixel count)
            theta = np.linspace(0.0, 2 * np.pi, n_vertices, endpoint=False)
            rad = 1.0 + rng.uniform(-0.35, 0.35, size=n_vertices)
            ring = np.column_stack(
                [cx + hx * rad * np.cos(theta), cy + hy * rad * np.sin(theta)]
            )
        else:
            jit = rng.uniform(-0.25, 0.25, size=8)
            ring = np.array(
                [
                    [cx - hx * (1 + jit[0]), cy - hy * (1 + jit[1])],
                    [cx + hx * (1 + jit[2]), cy - hy * (1 + jit[3])],
                    [cx + hx * (1 + jit[4]), cy + hy * (1 + jit[5])],
                    [cx - hx * (1 + jit[6]), cy + hy * (1 + jit[7])],
                ]
            )
        ring = np.vstack([ring, ring[:1]])
        rings = [ring]
        if with_holes and zid % 7 == 3:
            hole = np.array(
                [
                    [cx - 0.3 * hx, cy - 0.3 * hy],
                    [cx - 0.3 * hx, cy + 0.3 * hy],
                    [cx + 0.3 * hx, cy + 0.3 * hy],
                    [cx + 0.3 * hx, cy - 0.3 * hy],
                    [cx - 0.3 * hx, cy - 0.3 * hy],
                ]
            )
            rings.append(hole)
        geom = Geom("Polygon", polys=[rings])
        rows.append((zid, to_wkb(geom), zid % 5))
    return pa.table(
        {
            "zone_id": pa.array([r[0] for r in rows], pa.int64()),
            "geom_wkb": pa.array([r[1] for r in rows], pa.binary()),
            "zcat": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# ----------------------------------------------------------------- pages
_LANGS = np.array(["en", "de", "fr", "es", "zh", "pt", "ru", "ja"])
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog data engine stream shard "
    "tile zone raster vector page crawl web text index query batch arrow".split()
)


def _hash64(strings: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash per string (stable across processes)."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "little"
        )
    return out


def page_text_for_url(url: str) -> str:
    """The canonical extracted text for a url — a pure function of the url.

    Byte-identity per url through every pipeline stage is validated by
    re-deriving this (FIXTURES.md section 3 invariant).
    """
    h = int.from_bytes(hashlib.blake2b(url.encode(), digest_size=8).digest(), "little")
    rng = np.random.default_rng(h)
    n_words = 20 + int(h % 180)
    words = _WORDS[rng.integers(0, len(_WORDS), n_words)]
    return f"[{url}] " + " ".join(words.tolist())


def _sha_hash64(strings: np.ndarray) -> np.ndarray:
    """First 8 bytes of sha256, little-endian — chosen (over blake2b) so a
    DuckDB oracle can recompute it exactly: sha256 is the one cryptographic
    hash both sides share."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "little")
    return out


def page_geotag(urls) -> tuple[np.ndarray, np.ndarray]:
    """url -> deterministic (lon, lat) in (-180..180, -60..60)."""
    h = _sha_hash64(np.asarray(urls))
    lon = (h % np.uint64(3600000)).astype(np.float64) / 10000.0 - 180.0
    lat = ((h >> np.uint64(21)) % np.uint64(1200000)).astype(np.float64) / 10000.0 - 60.0
    return lon, lat


def generate_pages(
    n: int,
    seed: int = 42,
    n_sites: int = 97,
    start_id: int = 0,
    html_bytes: int = 2048,
) -> pa.Table:
    """Deterministic Common-Crawl-style pages table slice [start_id, start_id+n)."""
    ids = np.arange(start_id, start_id + n, dtype=np.int64)
    urls = np.array([f"https://site-{i % n_sites}.example/p/{i}" for i in ids])
    texts = [page_text_for_url(u) for u in urls]
    h = _hash64(urls)
    base_ts = np.int64(1700000000_000000)  # us
    warc_ts = base_ts + ids * np.int64(1000003) + (h % np.uint64(997)).astype(np.int64)
    langs = _LANGS[(h % np.uint64(len(_LANGS))).astype(np.int64)]
    htmls = [
        (f"<html><head><title>p{i}</title></head><body><p>".encode() + t.encode())
        + b"x" * max(0, html_bytes - 60 - len(t))
        + b"</p></body></html>"
        for i, t in zip(ids, texts)
    ]
    return pa.table(
        {
            "url": pa.array(urls.tolist(), pa.string()),
            "warc_ts": pa.array(warc_ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
        }
    )


def pages_dataset(n: int, seed: int = 42, block_rows: int = 10_000, **kw):
    """Lazy Ray Dataset of ``n`` synthetic pages generated in parallel
    blocks (no driver-side materialization of the payload)."""
    import ray
    import ray.data

    starts = list(range(0, n, block_rows))

    def gen_block(batch: pa.Table) -> pa.Table:
        s = int(batch["start"][0].as_py())
        cnt = int(min(block_rows, n - s))
        return generate_pages(cnt, seed=seed, start_id=s, **kw)

    return (
        ray.data.from_items([{"start": s} for s in starts])
        .repartition(len(starts))
        .map_batches(gen_block, batch_size=1, batch_format="pyarrow")
    )
