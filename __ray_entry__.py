"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ray.init()/ray.shutdown().

- ``entry()``: flagship web-pages pipeline on /root/testdata/sf0.001 —
  geotagged documents point-in-polygon joined to synthetic world zones,
  per-zone aggregates with a byte-identity sha digest per zone.
- ``queries()``: one callable per implemented pipeline (SURVEY.md §2
  inventory + training-data ops). SQL-expressible ones have a DuckDB
  oracle in ``oracle_sql()``; the rest are rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    from python_rasterstats_ray.pipelines.webpages import flagship_pipeline

    _, zone_stats = flagship_pipeline(SF_SMOKE)
    return zone_stats


# --------------------------------------------------- rows-only pipelines


def _q_minhash_pairs(sf_dir: str):
    import ray.data

    from python_rasterstats_ray.stages.dedup import minhash_lsh_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_lsh_pairs(ds)


def _q_simhash(sf_dir: str):
    import ray.data

    from python_rasterstats_ray.stages.dedup import SimHashKernel

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        SimHashKernel, batch_format="pyarrow", concurrency=(1, 4), zero_copy_batch=True
    )


def _q_knn_ivf(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from python_rasterstats_ray.stages.similarity import knn_ivf, train_centroids

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = qt.slice(0, 3)
    qids = np.asarray(qt["vec_id"].to_pylist(), dtype=np.int64)
    qmat = np.stack(qt["embedding"].to_pylist()).astype(np.float64)
    cents = train_centroids(ds, n_centroids=8)
    return knn_ivf(ds, (qids, qmat), cents, k=10, nprobe=3)


def _q_fingerprint(sf_dir: str):
    import ray.data

    from python_rasterstats_ray.stages.text import fingerprint_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)


def _q_flagship_zone_stats(sf_dir: str):
    from python_rasterstats_ray.pipelines.webpages import flagship_pipeline

    _, zone_stats = flagship_pipeline(sf_dir)
    return zone_stats


def _q_pages_pipeline(sf_dir: str):
    """North-rule pipeline over the exact input-hint schema (url, warc_ts,
    html, text, lang) with per-zone byte-identity verification."""
    from python_rasterstats_ray.pipelines.webpages import pages_pipeline

    _, zone_stats = pages_pipeline(n_pages=10_000, n_zones=24)
    return zone_stats


def _q_media_features(sf_dir: str):
    import ray.data

    from python_rasterstats_ray.stages.multimodal import (
        media_feature_pipeline,
        synth_png_media_table,
    )

    # REAL decode path: payloads are actual PNGs (from-scratch codec)
    return media_feature_pipeline(ray.data.from_arrow(synth_png_media_table(200)))


def _q_audio_features(sf_dir: str):
    import ray.data

    from python_rasterstats_ray.stages.multimodal import (
        audio_feature_pipeline,
        synth_wav_media_table,
    )

    # REAL decode path: payloads are actual RIFF/PCM16 WAV clips
    return audio_feature_pipeline(ray.data.from_arrow(synth_wav_media_table(200)))


def _q_flagship_checkpointed(sf_dir: str):
    import tempfile

    import ray.data

    from python_rasterstats_ray.pipelines.checkpoint import checkpointed_flagship

    out_dir = tempfile.mkdtemp(prefix="prsr_ckpt_", dir="/tmp")
    checkpointed_flagship(sf_dir, out_dir, n_parts=2)
    return ray.data.read_parquet(out_dir).select_columns(
        ["doc_id", "zone_id", "text_sha", "n_tokens"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from python_rasterstats_ray.pipelines.join_queries import JOIN_QUERIES
    from python_rasterstats_ray.pipelines.queries import QUERIES

    from python_rasterstats_ray.pipelines.zonal_queries import ZONAL_QUERIES

    out = dict(QUERIES)
    out.update(JOIN_QUERIES)
    out.update(
        {
            "minhash_pairs": _q_minhash_pairs,
            "simhash_signatures": _q_simhash,
            "knn_ivf": _q_knn_ivf,
            "doc_fingerprint": _q_fingerprint,
            "flagship_zone_stats": _q_flagship_zone_stats,
            "media_features": _q_media_features,
            "audio_features": _q_audio_features,
            "flagship_checkpointed": _q_flagship_checkpointed,
            "pages_pipeline": _q_pages_pipeline,
        }
    )
    # SQL-exact zonal / point-query family (rect zones + exploded pixel
    # oracle; replaces the old rows-only synthetic variants by name)
    out.update(ZONAL_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from python_rasterstats_ray.pipelines.join_queries import JOIN_ORACLE_SQL
    from python_rasterstats_ray.pipelines.queries import ORACLE_SQL
    from python_rasterstats_ray.pipelines.zonal_queries import ZONAL_ORACLE_SQL
    from python_rasterstats_ray.sources.oracle_fixtures import ensure_fixtures

    ensure_fixtures()  # the zonal oracles read exploded-pixel parquet
    out = dict(ORACLE_SQL)
    out.update(JOIN_ORACLE_SQL)
    out.update(ZONAL_ORACLE_SQL)
    return out
