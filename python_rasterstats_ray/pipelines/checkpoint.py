"""Checkpointed, resumable partitioned execution with per-partition lineage.

North-rule requirement (BASELINE.json): a killed run restarts from the last
completed partition. Output layout::

    out_dir/
      part=<name>/ *.parquet     (the partition's rows)
      _lineage/<name>.json       (inputs, row count, byte-identity digest,
                                  kernel version, wall time)
      _SUCCESS.<name>            (commit marker, written last)

A partition is the unit of both scheduling and recovery: ``run_partitioned``
skips every partition whose commit marker exists, so re-running after a kill
only executes the remainder. Each partition executes as its own bounded
streaming Dataset job (read -> transforms -> write_parquet), which also
bounds worst-case recompute at one partition.

Byte identity: the lineage record stores an order-insensitive xor of
sha256(text) over the partition at the source; after the parquet write the
sink is re-read and re-hashed — the two digests must match or the partition
fails (never commits).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable

from .. import __version__
from .webpages import xor_digest
from ..stages._cluster import pool


def _lineage_path(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, "_lineage", f"{name}.json")


def _marker_path(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, f"_SUCCESS.{name}")


def partition_done(out_dir: str, name: str) -> bool:
    return os.path.exists(_marker_path(out_dir, name))


def completed_partitions(out_dir: str) -> list[str]:
    if not os.path.isdir(out_dir):
        return []
    return sorted(
        f[len("_SUCCESS.") :] for f in os.listdir(out_dir) if f.startswith("_SUCCESS.")
    )


def text_digest_of(ds, text_col: str) -> tuple[str, int]:
    """Order-insensitive xor-of-sha256 digest + row count of a Dataset's
    text column, computed distributed (per-batch partial xor)."""
    import hashlib

    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        acc = 0
        for t in batch[text_col].to_pylist():
            acc ^= int.from_bytes(hashlib.sha256(t.encode("utf-8")).digest(), "big")
        return pa.table(
            {"xor": pa.array([f"{acc:064x}"]), "n": pa.array([len(batch)])}
        )

    parts = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    return xor_digest(p["xor"] for p in parts), sum(p["n"] for p in parts)


def check_or_pin_plan(out_dir: str, partitions: list[tuple[str, dict]]) -> None:
    """Pin (first run) or validate (resume) the ``_plan.json`` manifest.

    Idempotent — callers that need to refuse BEFORE paying an expensive
    setup step (e.g. the zonal tile broadcast) call it first;
    ``run_partitioned`` calls it again at entry for free. Refuses three
    unsafe resumes: a changed partitioning (names or per-partition spec
    hashes differ), changed partition-invariant params (they live inside
    each spec, so the sha pins them too), and a legacy checkpoint that
    has commit markers but no manifest (its names cannot be validated)."""
    import hashlib

    plan = {
        "partitions": [name for name, _ in partitions],
        "spec_sha": {
            name: hashlib.sha256(
                json.dumps(spec, sort_keys=True, default=str).encode()
            ).hexdigest()
            for name, spec in partitions
        },
    }
    plan_path = os.path.join(out_dir, "_plan.json")
    if os.path.exists(plan_path):
        with open(plan_path) as f:
            prev = json.load(f)
        if prev != plan:
            changed = sorted(
                set(prev.get("partitions", [])) ^ set(plan["partitions"])
            ) or sorted(
                n
                for n in plan["spec_sha"]
                if prev.get("spec_sha", {}).get(n) != plan["spec_sha"][n]
            )
            raise ValueError(
                f"checkpoint at {out_dir} was created with a different plan "
                f"(partitions changed: {changed[:8]}); resume with the "
                "original partitioning or start a fresh out_dir"
            )
        return
    if completed_partitions(out_dir):
        raise ValueError(
            f"checkpoint at {out_dir} has commit markers but no _plan.json "
            "(created before the plan manifest existed) — its partition "
            "names cannot be validated against the current plan; start a "
            "fresh out_dir"
        )
    os.makedirs(out_dir, exist_ok=True)
    with open(plan_path + ".tmp", "w") as f:
        json.dump(plan, f, indent=2)
    os.replace(plan_path + ".tmp", plan_path)


def run_partitioned(
    partitions: list[tuple[str, dict]],
    build: Callable[[dict], "object"],
    out_dir: str,
    *,
    text_col: str | None = "text",
    max_partitions: int | None = None,
) -> dict:
    """Execute ``build(spec) -> Dataset`` per partition with skip-completed
    resume semantics. Returns a summary dict.

    ``max_partitions`` bounds how many incomplete partitions run this call
    (used by the kill/resume tests to simulate a mid-run crash).

    A ``_plan.json`` manifest pins the partitioning on first run:
    partition NAMES alone don't identify their input ranges, so resuming
    with a different n_parts (or against a changed input) would skip
    committed names whose meaning moved and produce silently-wrong
    output. A mismatched resume refuses instead.
    """
    check_or_pin_plan(out_dir, partitions)
    os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)
    ran, skipped = [], []
    for name, spec in partitions:
        if partition_done(out_dir, name):
            skipped.append(name)
            continue
        if max_partitions is not None and len(ran) >= max_partitions:
            break
        t0 = time.time()
        ds = build(spec)

        part_dir = os.path.join(out_dir, f"part={name}")
        # a kill between write_parquet and the commit marker leaves stale
        # files; re-running would APPEND duplicates and the xor digest
        # (which cancels on duplicated rows) would then mismatch forever.
        # An uncommitted partition always restarts from a clean sink.
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)
        src_digest = None
        if text_col is not None:
            src_digest, _ = text_digest_of(ds, text_col)
        ds.write_parquet(part_dir)

        import ray.data

        written = ray.data.read_parquet(part_dir)
        n_rows = written.count()
        sink_digest = None
        if text_col is not None:
            sink_digest, sink_rows = text_digest_of(written, text_col)
            if sink_digest != src_digest or sink_rows != n_rows:
                raise RuntimeError(
                    f"byte-identity violated in partition {name}: "
                    f"{src_digest} != {sink_digest}"
                )

        lineage = {
            "partition": name,
            "input": spec,
            "rows": n_rows,
            "text_sha_xor": sink_digest,
            "byte_identity_verified": text_col is not None,
            "engine_version": __version__,
            "wall_sec": round(time.time() - t0, 3),
            "completed_unix": int(time.time()),
        }
        with open(_lineage_path(out_dir, name), "w") as f:
            json.dump(lineage, f, indent=2)
        # commit marker LAST: a kill before this line leaves the partition
        # uncommitted and it will re-run wholesale on resume
        with open(_marker_path(out_dir, name), "w") as f:
            f.write("ok")
        ran.append(name)
    return {
        "ran": ran,
        "skipped": skipped,
        "remaining": [n for n, _ in partitions if not partition_done(out_dir, n)],
    }


# ------------------------------------------------- flagship, checkpointed


def checkpointed_flagship(
    sf_dir: str,
    out_dir: str,
    n_parts: int = 4,
    max_partitions: int | None = None,
) -> dict:
    """The flagship pages pipeline (enrich + geotag + PIP zone join) written
    as ``n_parts`` doc_id-range partitions with lineage + resume."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from .webpages import PIPZoneKernel, default_world_zones, enrich_batch

    meta = pq.read_metadata(f"{sf_dir}/documents.parquet")
    n = meta.num_rows
    step = (n + n_parts - 1) // n_parts
    # sf_dir rides in every spec so the _plan.json sha refuses a resume
    # against a different input table
    partitions = [
        (
            f"{i:04d}",
            {"lo": i * step, "hi": min((i + 1) * step, n), "params": {"sf_dir": sf_dir}},
        )
        for i in range(n_parts)
    ]

    zones_ref = ray.put(default_world_zones())

    def build(spec: dict):
        flt = (pads.field("doc_id") >= spec["lo"]) & (pads.field("doc_id") < spec["hi"])
        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text", "lang", "n_chars"],
            filter=flt,
        )
        return ds.map_batches(
            enrich_batch,
            fn_kwargs=dict(id_col="doc_id", text_col="text"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(
            PIPZoneKernel,
            fn_constructor_kwargs=dict(zones_ref=zones_ref),
            batch_format="pyarrow",
            concurrency=pool(),
            zero_copy_batch=True,
        )

    return run_partitioned(
        partitions, build, out_dir, text_col="text", max_partitions=max_partitions
    )


# --------------------------------------------- zonal store plan, checkpointed


def checkpointed_zonal_store(
    zones_path: str,
    tiles_ds,
    affine,
    nodata,
    out_dir: str,
    *,
    raster_dtype: str = "float32",
    stats=None,
    all_touched: bool = False,
    categorical: bool = False,
    tile_size: int | None = None,
    n_parts: int = 8,
    max_partitions: int | None = None,
) -> dict:
    """The storage-bucketed zonal plan (``zonal_stats_tiled_from_store``)
    run as ``n_parts`` CELL-PARTITION ranges with lineage + skip-completed
    resume: each partition computes and persists the per-(zone, cell)
    partial rows for its contiguous slice of the store's cell buckets, so
    a killed run restarts from the last completed cell partition — the
    north rule's recovery unit for the headline zonal plan. Finish with
    ``finalize_zonal_store_checkpoint`` once ``remaining`` is empty.

    Partials (not final stats) are the checkpoint payload on purpose: a
    zone spanning cells in two partitions must merge globally, and the
    partial rows are the exact algebraic unit that merge consumes — the
    finalize step is the same one exchange the un-checkpointed plan pays.
    """
    from ..stages.zonal_dist import (
        DEFAULT_TILE_SIZE,
        build_tile_refmap,
        check_stats,
        store_cells,
        store_partials_ds,
    )

    tile_size = DEFAULT_TILE_SIZE if tile_size is None else tile_size
    stats_list, run_count = check_stats(stats, categorical)
    need_vals = run_count or any(
        s.startswith("percentile_") or s == "median" for s in stats_list
    )
    cells = store_cells(zones_path)
    # kernel params ride in every spec so the _plan.json sha pins THEM
    # too: resuming with a different all_touched / nodata / affine would
    # otherwise merge partials computed under different semantics
    params = {
        "zones_path": zones_path,
        "affine": str(affine),
        "nodata": None if nodata is None else float(nodata),
        "tile_size": tile_size,
        "raster_dtype": raster_dtype,
        "all_touched": all_touched,
        "need_vals": need_vals,
    }
    step = (len(cells) + n_parts - 1) // n_parts
    partitions = [
        (f"{i:04d}", {"cells": cells[i * step : (i + 1) * step], "params": params})
        for i in range(n_parts)
        if cells[i * step : (i + 1) * step]
    ]
    # validate/pin the plan BEFORE the tile broadcast: a refused resume
    # must not pay the plan's most expensive fixed cost first
    check_or_pin_plan(out_dir, partitions)

    # broadcast the tiles ONCE for every partition this call runs; the
    # refs stay alive for the duration of the call. Skipped entirely on
    # a pure-resume call with nothing left to run.
    todo = [p for p in partitions if not partition_done(out_dir, p[0])]
    refmap_ref = None
    if todo:
        refmap_ref, _block_refs = build_tile_refmap(tiles_ds)

    def build(spec: dict):
        return store_partials_ds(
            zones_path,
            spec["cells"],
            refmap_ref,
            affine=affine,
            nodata=nodata,
            tile_size=tile_size,
            raster_dtype=raster_dtype,
            all_touched=all_touched,
            need_vals=need_vals,
        )

    return run_partitioned(
        partitions, build, out_dir, text_col=None, max_partitions=max_partitions
    )


def finalize_zonal_store_checkpoint(
    out_dir: str,
    *,
    stats=None,
    categorical: bool = False,
    category_map=None,
    raster_dtype: str = "float32",
):
    """Merge the persisted per-(zone, cell) partials of a completed
    ``checkpointed_zonal_store`` run into the final per-zone stats Dataset
    (bit-identical to an uninterrupted ``zonal_stats_tiled_from_store``)."""
    import ray.data

    from ..stages.zonal_dist import finish_store_partials

    names = completed_partitions(out_dir)
    if not names:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    # completeness gate BOTH ways: missing partitions would merge
    # silently-short sums; EXTRA committed partitions (a reused dir from
    # a different plan) would double-count every zone they cover
    plan_path = os.path.join(out_dir, "_plan.json")
    if os.path.exists(plan_path):
        with open(plan_path) as f:
            expected = json.load(f).get("partitions", [])
        missing = [n for n in expected if n not in set(names)]
        if missing:
            raise RuntimeError(
                f"checkpoint at {out_dir} is incomplete: partitions "
                f"{missing} not committed — re-run checkpointed_zonal_store "
                "to finish before finalizing"
            )
        extras = [n for n in names if n not in set(expected)]
        if extras:
            raise RuntimeError(
                f"checkpoint at {out_dir} has committed partitions outside "
                f"its plan ({extras[:8]}) — the out_dir was reused across "
                "plans; start fresh"
            )
        names = expected
    paths = []  # explicit files: read_parquet treats list entries as files
    for n in names:
        d = os.path.join(out_dir, f"part={n}")
        paths.extend(
            sorted(
                os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
            )
        )
    partials = ray.data.read_parquet(paths)
    return finish_store_partials(
        partials,
        stats=stats,
        categorical=categorical,
        category_map=category_map,
        raster_dtype=raster_dtype,
    )
