"""Kill/resume + lineage + byte-identity tests (FIXTURES.md section 4.3-4.4)."""

import json
import os

import pytest

SF = "/root/testdata/sf0.001"


def test_checkpointed_flagship_resume(ray_session, tmp_path):
    from python_rasterstats_ray.pipelines.checkpoint import (
        checkpointed_flagship,
        completed_partitions,
    )

    out = str(tmp_path / "ckpt")
    # simulate a crash after 2 of 4 partitions
    summary = checkpointed_flagship(SF, out, n_parts=4, max_partitions=2)
    assert summary["ran"] == ["0000", "0001"]
    assert completed_partitions(out) == ["0000", "0001"]
    assert len(summary["remaining"]) == 2

    # resume: completed partitions are skipped, the rest run
    summary2 = checkpointed_flagship(SF, out, n_parts=4)
    assert summary2["skipped"] == ["0000", "0001"]
    assert summary2["ran"] == ["0002", "0003"]
    assert summary2["remaining"] == []

    # third run is a no-op
    summary3 = checkpointed_flagship(SF, out, n_parts=4)
    assert summary3["ran"] == []
    assert len(summary3["skipped"]) == 4

    # lineage records: every partition verified byte-identical, rows add up
    import ray.data

    total = 0
    for name in completed_partitions(out):
        with open(os.path.join(out, "_lineage", f"{name}.json")) as f:
            rec = json.load(f)
        assert rec["byte_identity_verified"] is True
        assert rec["text_sha_xor"] is not None
        total += rec["rows"]
    assert total == 500  # sf0.001 documents rows

    # the union of partition outputs is the full enriched table
    ds = ray.data.read_parquet(out)
    assert ds.count() == 500
    cols = set(ds.schema().names)
    assert {"doc_id", "text", "text_sha", "lon", "lat", "zone_id"} <= cols


def test_byte_identity_detects_corruption(ray_session, tmp_path):
    """Corrupting a committed partition's parquet is caught by re-derivation
    of the digest (lineage digest no longer matches)."""
    import hashlib

    import pyarrow.parquet as pq
    import ray.data

    from python_rasterstats_ray.pipelines.checkpoint import (
        checkpointed_flagship,
        text_digest_of,
    )

    out = str(tmp_path / "ckpt2")
    checkpointed_flagship(SF, out, n_parts=2)
    part_dir = os.path.join(out, "part=0000")
    with open(os.path.join(out, "_lineage", "0000.json")) as f:
        recorded = json.load(f)["text_sha_xor"]

    # tamper: rewrite one file with a mutated text value
    files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    t = pq.read_table(os.path.join(part_dir, files[0]))
    texts = t["text"].to_pylist()
    texts[0] = texts[0] + "!TAMPERED"
    import pyarrow as pa

    t = t.set_column(t.schema.get_field_index("text"), "text", pa.array(texts))
    pq.write_table(t, os.path.join(part_dir, files[0]))

    digest, _ = text_digest_of(ray.data.read_parquet(part_dir), "text")
    assert digest != recorded


def test_stale_uncommitted_partition_is_cleaned(ray_session, tmp_path):
    """A crash after write_parquet but before the commit marker must not
    poison the resume: the re-run clears the stale files instead of
    appending duplicates (which would break the xor digest forever)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from python_rasterstats_ray.pipelines.checkpoint import run_partitioned

    out = str(tmp_path / "out")
    parts = [("p0", {"n": 5})]

    def build(spec):
        return ray.data.from_arrow(
            pa.table({"text": [f"doc-{i}" for i in range(spec["n"])]})
        )

    # simulate the crashed attempt: partition dir full of rows, no marker
    os.makedirs(os.path.join(out, "part=p0"), exist_ok=True)
    pq.write_table(
        pa.table({"text": ["stale-a", "stale-b"]}),
        os.path.join(out, "part=p0", "stale.parquet"),
    )

    summary = run_partitioned(parts, build, out, text_col="text")
    assert summary["ran"] == ["p0"] and summary["remaining"] == []
    got = ray.data.read_parquet(os.path.join(out, "part=p0")).to_pandas()
    assert sorted(got["text"]) == [f"doc-{i}" for i in range(5)]


def test_checkpointed_zonal_store_resume(ray_session, tmp_path):
    """North rule on the headline zonal plan: a killed run restarts from
    the last completed CELL partition, and the finalized result is
    bit-identical to an uninterrupted zonal_stats_tiled_from_store."""
    import ray.data

    from python_rasterstats_ray.pipelines.checkpoint import (
        checkpointed_zonal_store,
        completed_partitions,
        finalize_zonal_store_checkpoint,
    )
    from python_rasterstats_ray.sources.synthetic import (
        generate_raster,
        generate_zones,
    )
    from python_rasterstats_ray.sources.tiles import raster_to_tiles_table
    from python_rasterstats_ray.stages.zonal_dist import (
        write_zones_bucketed,
        zonal_stats_tiled_from_store,
    )

    stats = "count min max mean sum std median nodata"
    arr, affine, nodata = generate_raster((300, 400), kind="holes", seed=7)
    zones = generate_zones(
        40, extent=(-20.0, -30.0, 420.0, 310.0), seed=11, with_holes=True, mega_every=13
    )
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=128)
    store = write_zones_bucketed(
        ray.data.from_arrow(zones), str(tmp_path / "zstore"), affine, tile_size=128
    )
    out = str(tmp_path / "zckpt")
    kw = dict(
        affine=affine,
        nodata=nodata,
        raster_dtype=str(arr.dtype),
        stats=stats,
        tile_size=128,
    )

    # simulate a crash after 2 of 4 cell partitions
    s1 = checkpointed_zonal_store(
        store, ray.data.from_arrow(tiles), out_dir=out, n_parts=4,
        max_partitions=2, **kw
    )
    assert s1["ran"] == ["0000", "0001"]
    assert completed_partitions(out) == ["0000", "0001"]
    assert len(s1["remaining"]) == 2

    # resume: completed cell partitions skip, the rest run
    s2 = checkpointed_zonal_store(
        store, ray.data.from_arrow(tiles), out_dir=out, n_parts=4, **kw
    )
    assert s2["skipped"] == ["0000", "0001"]
    assert s2["ran"] == ["0002", "0003"]
    assert s2["remaining"] == []

    got = (
        finalize_zonal_store_checkpoint(out, stats=stats, raster_dtype=str(arr.dtype))
        .to_pandas()
        .reset_index(drop=True)
    )
    want = (
        zonal_stats_tiled_from_store(
            store, ray.data.from_arrow(tiles), concurrency=(1, 2), **kw
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    order_dep = {"mean", "sum", "std"}  # float accumulation order may differ
    import numpy as np

    for c in got.columns:
        if c in order_dep:
            assert np.allclose(got[c], want[c], rtol=1e-9, atol=0.0, equal_nan=True), c
        else:
            assert got[c].equals(want[c]), c


def test_checkpointed_zonal_store_guards(ray_session, tmp_path):
    """Resume with a different n_parts must refuse (partition NAMES no
    longer mean the same cell ranges), and finalize on an incomplete
    checkpoint must refuse (silently-short per-zone sums otherwise)."""
    import pytest
    import ray.data

    from python_rasterstats_ray.pipelines.checkpoint import (
        checkpointed_zonal_store,
        finalize_zonal_store_checkpoint,
    )
    from python_rasterstats_ray.sources.synthetic import (
        generate_raster,
        generate_zones,
    )
    from python_rasterstats_ray.sources.tiles import raster_to_tiles_table
    from python_rasterstats_ray.stages.zonal_dist import write_zones_bucketed

    arr, affine, nodata = generate_raster((300, 400), kind="holes", seed=7)
    zones = generate_zones(20, extent=(-20.0, -30.0, 420.0, 310.0), seed=11)
    tiles = raster_to_tiles_table(arr, affine, nodata, tile_size=128)
    store = write_zones_bucketed(
        ray.data.from_arrow(zones), str(tmp_path / "zstore"), affine, tile_size=128
    )
    out = str(tmp_path / "zckpt")
    kw = dict(
        affine=affine, nodata=nodata, raster_dtype=str(arr.dtype),
        stats="count sum", tile_size=128,
    )
    s1 = checkpointed_zonal_store(
        store, ray.data.from_arrow(tiles), out_dir=out, n_parts=4,
        max_partitions=1, **kw
    )
    assert len(s1["ran"]) == 1 and len(s1["remaining"]) == 3

    # incomplete finalize refuses with the missing partition names
    with pytest.raises(RuntimeError, match="incomplete"):
        finalize_zonal_store_checkpoint(out, stats="count sum",
                                        raster_dtype=str(arr.dtype))

    # mismatched-plan resume refuses
    with pytest.raises(ValueError, match="different plan"):
        checkpointed_zonal_store(
            store, ray.data.from_arrow(tiles), out_dir=out, n_parts=2, **kw
        )

    # changed kernel params refuse too (same cells, different semantics)
    kw_at = dict(kw, all_touched=True)
    with pytest.raises(ValueError, match="different plan"):
        checkpointed_zonal_store(
            store, ray.data.from_arrow(tiles), out_dir=out, n_parts=4, **kw_at
        )

    # matching resume completes; finalize then succeeds
    s2 = checkpointed_zonal_store(
        store, ray.data.from_arrow(tiles), out_dir=out, n_parts=4, **kw
    )
    assert s2["remaining"] == []
    got = finalize_zonal_store_checkpoint(
        out, stats="count sum", raster_dtype=str(arr.dtype)
    )
    assert got.count() == 20

    # pure-resume call on a finished checkpoint runs nothing (and skips
    # the refmap broadcast internally)
    s3 = checkpointed_zonal_store(
        store, ray.data.from_arrow(tiles), out_dir=out, n_parts=4, **kw
    )
    assert s3["ran"] == [] and s3["remaining"] == []

    # a stray committed partition outside the plan refuses finalize
    # (reused dir across plans would double-count zones)
    open(os.path.join(out, "_SUCCESS.9999"), "w").write("ok")
    os.makedirs(os.path.join(out, "part=9999"), exist_ok=True)
    with pytest.raises(RuntimeError, match="outside its plan"):
        finalize_zonal_store_checkpoint(
            out, stats="count sum", raster_dtype=str(arr.dtype)
        )
    os.remove(os.path.join(out, "_SUCCESS.9999"))

    # legacy checkpoint (markers, no manifest) refuses rather than
    # trusting names whose ranges it cannot validate
    legacy = str(tmp_path / "legacy")
    os.makedirs(legacy, exist_ok=True)
    open(os.path.join(legacy, "_SUCCESS.0000"), "w").write("ok")
    with pytest.raises(ValueError, match="no _plan.json"):
        checkpointed_zonal_store(
            store, ray.data.from_arrow(tiles), out_dir=legacy, n_parts=4, **kw
        )


def test_session_windows_boundaries(ray_session):
    """Exact-gap events stay in the same session (strict > rule); the
    next microsecond starts a new one."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from python_rasterstats_ray.stages.temporal import session_windows

    gap = 1000
    ts = np.array([0, 1000, 2001, 2500], dtype="datetime64[us]")
    tbl = pa.table(
        {
            "user_id": pa.array([7, 7, 7, 7], pa.int64()),
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(ts),
        }
    )
    out = (
        session_windows(ray.data.from_arrow(tbl), gap)
        .to_pandas()
        .sort_values("session_idx")
        .reset_index(drop=True)
    )
    # 0 -> 1000 is exactly the gap (same session); 1000 -> 2001 exceeds it
    assert out["n_events"].tolist() == [2, 2]
    assert out["t_start"].tolist() == [0, 2001]
    assert out["t_end"].tolist() == [1000, 2500]
