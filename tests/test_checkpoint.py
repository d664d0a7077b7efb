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
