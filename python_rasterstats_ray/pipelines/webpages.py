"""Flagship pipeline: Common-Crawl-style pages -> geotag -> polygon-zone
spatial join -> per-zone aggregation, preserving byte-identical text per
url/doc through every stage (BASELINE.json north_star invariant).

Shape (all streaming, no driver materialization of payload):

  read_parquet(columns pruned)
    -> map_batches: sha256(text), quality metrics, deterministic geotag,
       grid cell id                         [stateless, Arrow-vectorized]
    -> map_batches(PIPZoneKernel):          [actor pool; zones grid index
       zone_id per point                     built once per actor from a
                                             ray.put broadcast]
    -> partial per-batch aggregates -> groupby(zone).map_groups merge

The only shuffle is over tiny (zone, partial) rows. Payload text never
crosses a wire except at the optional checkpointed parquet sink; identity
is evidenced by an order-insensitive xor-of-sha256 digest computed at
source and at sink (pipelines/checkpoint.py writes it into per-partition
lineage records).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.geometry import from_wkb
from ..functions.pip import points_in_geom
from ..sources.synthetic import generate_zones
from ..stages._cluster import pool


def sha256_hex(texts: list[str]) -> list[str]:
    return [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in texts]


def xor_digest(hex_hashes) -> str:
    """Order-insensitive 256-bit xor aggregate of hex digests."""
    acc = 0
    for h in hex_hashes:
        acc ^= int(h, 16)
    return f"{acc:064x}"


def shard_digest_merge(group: pa.Table) -> pa.Table:
    """map_groups combiner for per-shard (shard_id, n, digest) partials ->
    one (shard_id, n_docs, digest) manifest row; shared by the training
    shard manifest query and the CLI prep sink."""
    import pyarrow.compute as pc

    return pa.table(
        {
            "shard_id": group["shard_id"][:1],
            "n_docs": pa.array([int(pc.sum(group["n"]).as_py())], pa.int64()),
            "digest": pa.array(
                [xor_digest(group["digest"].to_pylist())], pa.string()
            ),
        }
    )


def doc_geotag(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(ids, dtype=np.int64)
    lon = ((ids * 2654435761) % 360000) / 1000.0 - 180.0
    lat = ((ids * 40503) % 120000) / 1000.0 - 60.0
    return lon, lat


def default_world_zones(n_zones: int = 24, seed: int = 42) -> pa.Table:
    return generate_zones(n_zones, extent=(-180.0, -60.0, 180.0, 60.0), seed=seed)


class PIPZoneKernel:
    """Actor-pool kernel: assign zone_id to each geotagged row.

    A coarse lon/lat grid index over the zone polygons is built once per
    actor (__init__): each grid cell lists the zones whose bbox overlaps
    it, so the per-point candidate set is tiny. Points matching no zone
    get zone_id -1."""

    def __init__(self, zones_ref, grid: float = 10.0):
        import ray

        zones_tbl = ray.get(zones_ref)
        self.zone_ids = zones_tbl["zone_id"].to_numpy(zero_copy_only=False)
        self.geoms = [from_wkb(w) for w in zones_tbl["geom_wkb"].to_pylist()]
        self.grid = grid
        self.index: dict[tuple[int, int], list[int]] = {}
        for i, g in enumerate(self.geoms):
            w, s, e, n = g.bounds
            for gx in range(int(np.floor(w / grid)), int(np.floor(e / grid)) + 1):
                for gy in range(int(np.floor(s / grid)), int(np.floor(n / grid)) + 1):
                    self.index.setdefault((gx, gy), []).append(i)

    def assign(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        out = np.full(len(lon), -1, dtype=np.int64)
        gx = np.floor(lon / self.grid).astype(np.int64)
        gy = np.floor(lat / self.grid).astype(np.int64)
        keys = gx * 100000 + gy
        order = np.argsort(keys, kind="stable")
        sorted_keys = keys[order]
        starts = np.searchsorted(sorted_keys, np.unique(sorted_keys))
        bounds = np.append(starts, len(sorted_keys))
        for b in range(len(starts)):
            idxs = order[bounds[b] : bounds[b + 1]]
            cell = (int(gx[idxs[0]]), int(gy[idxs[0]]))
            cands = self.index.get(cell, ())
            for zi in cands:
                remaining = idxs[out[idxs] < 0]
                if not len(remaining):
                    break
                inside = points_in_geom(lon[remaining], lat[remaining], self.geoms[zi])
                out[remaining[inside]] = self.zone_ids[zi]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        return batch.append_column("zone_id", pa.array(self.assign(lon, lat), pa.int64()))


def enrich_batch(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """Stateless stage A: hash + geotag + token count."""
    import pyarrow.compute as pc

    texts = batch[text_col].to_pylist()
    shas = sha256_hex(texts)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    lon, lat = doc_geotag(ids)
    n_tokens = pc.cast(pc.count_substring_regex(batch[text_col], r"\S+"), pa.int64())
    out = batch
    out = out.append_column("text_sha", pa.array(shas, pa.string()))
    out = out.append_column("lon", pa.array(lon, pa.float64()))
    out = out.append_column("lat", pa.array(lat, pa.float64()))
    out = out.append_column("n_tokens", n_tokens)
    return out


def pages_pipeline(
    n_pages: int = 20_000,
    n_zones: int = 24,
    seed: int = 42,
    concurrency=None,
):
    """The north-rule pipeline over the exact input-hint schema
    (url:string, warc_ts:timestamp, html:binary, text:string, lang:string):

    synthetic pages (lazy, generated in parallel blocks — never
    materialized on the driver) -> geotag from url hash -> PIP zone join
    -> per-zone aggregates. ``text`` is a pure function of ``url``
    (sources/synthetic.page_text_for_url), so byte identity is checkable
    by RE-DERIVATION at any stage, not just by digest comparison; the
    final stage verifies it per batch and counts violations (must be 0).

    Returns (enriched_ds, zone_stats_ds); zone_stats carries
    n_identity_violations per zone.
    """
    import ray
    import ray.data
    import pyarrow.compute as pc_

    from ..sources.synthetic import page_geotag, page_text_for_url, pages_dataset

    zones_ref = ray.put(default_world_zones(n_zones, seed=seed))
    ds = pages_dataset(n_pages, seed=seed)

    def enrich(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        lon, lat = page_geotag(urls)
        shas = sha256_hex(batch["text"].to_pylist())
        n_tokens = pc_.cast(pc_.count_substring_regex(batch["text"], r"\S+"), pa.int64())
        html_bytes = pc_.cast(pc_.binary_length(batch["html"]), pa.int64())
        out = batch
        out = out.append_column("lon", pa.array(lon, pa.float64()))
        out = out.append_column("lat", pa.array(lat, pa.float64()))
        out = out.append_column("text_sha", pa.array(shas, pa.string()))
        out = out.append_column("n_tokens", n_tokens)
        out = out.append_column("html_bytes", html_bytes)
        return out

    enriched = ds.map_batches(
        enrich, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        PIPZoneKernel,
        fn_constructor_kwargs=dict(zones_ref=zones_ref),
        batch_format="pyarrow",
        concurrency=concurrency or pool(),
        zero_copy_batch=True,
    )

    def partial(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        violations = sum(1 for u, t in zip(urls, texts) if page_text_for_url(u) != t)
        df = pd.DataFrame(
            {
                "zone_id": batch["zone_id"].to_numpy(zero_copy_only=False),
                "n_tokens": batch["n_tokens"].to_numpy(zero_copy_only=False),
                "html_bytes": batch["html_bytes"].to_numpy(zero_copy_only=False),
                "text_sha": batch["text_sha"].to_pylist(),
            }
        )
        g = (
            df.groupby("zone_id")
            .agg(
                n_pages=("n_tokens", "size"),
                total_tokens=("n_tokens", "sum"),
                total_html_bytes=("html_bytes", "sum"),
                sha_xor=("text_sha", xor_digest),
            )
            .reset_index()
        )
        g["n_identity_violations"] = violations
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = enriched.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "zone_id": g["zone_id"][:1],
                "n_pages": pa.array([int(pc.sum(g["n_pages"]).as_py())], pa.int64()),
                "total_tokens": pa.array(
                    [int(pc.sum(g["total_tokens"]).as_py())], pa.int64()
                ),
                "total_html_bytes": pa.array(
                    [int(pc.sum(g["total_html_bytes"]).as_py())], pa.int64()
                ),
                "sha_xor": pa.array(
                    [xor_digest(g["sha_xor"].to_pylist())], pa.string()
                ),
                "n_identity_violations": pa.array(
                    [int(pc.sum(g["n_identity_violations"]).as_py())], pa.int64()
                ),
            }
        )

    zone_stats = partials.groupby("zone_id").map_groups(merge, batch_format="pyarrow")
    return enriched, zone_stats


def flagship_pipeline(
    sf_dir: str,
    n_zones: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency=None,
):
    """documents table as the page corpus -> enriched + zone-joined rows.

    Returns (enriched_ds, zone_stats_ds):
    - enriched_ds: pages + text_sha + geotag + zone_id (payload intact)
    - zone_stats_ds: per-zone aggregate (n_pages, total_tokens,
      total_chars, sha_xor) — sha_xor is the per-zone byte-identity digest.
    """
    import ray
    import ray.data

    zones_ref = ray.put(default_world_zones(n_zones))

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=[id_col, text_col, "lang", "n_chars"]
    )
    enriched = ds.map_batches(
        enrich_batch,
        fn_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(
        PIPZoneKernel,
        fn_constructor_kwargs=dict(zones_ref=zones_ref),
        batch_format="pyarrow",
        concurrency=concurrency or pool(),
        zero_copy_batch=True,
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "zone_id": batch["zone_id"].to_numpy(zero_copy_only=False),
                "n_tokens": batch["n_tokens"].to_numpy(zero_copy_only=False),
                "n_chars": batch["n_chars"].to_numpy(zero_copy_only=False),
                "text_sha": batch["text_sha"].to_pylist(),
            }
        )
        g = (
            df.groupby("zone_id")
            .agg(
                n_pages=("n_tokens", "size"),
                total_tokens=("n_tokens", "sum"),
                total_chars=("n_chars", "sum"),
                sha_xor=("text_sha", xor_digest),
            )
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = enriched.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "zone_id": g["zone_id"][:1],
                "n_pages": pa.array([int(pc.sum(g["n_pages"]).as_py())], pa.int64()),
                "total_tokens": pa.array(
                    [int(pc.sum(g["total_tokens"]).as_py())], pa.int64()
                ),
                "total_chars": pa.array(
                    [int(pc.sum(g["total_chars"]).as_py())], pa.int64()
                ),
                "sha_xor": pa.array(
                    [xor_digest(g["sha_xor"].to_pylist())], pa.string()
                ),
            }
        )

    zone_stats = partials.groupby("zone_id").map_groups(merge, batch_format="pyarrow")
    return enriched, zone_stats
