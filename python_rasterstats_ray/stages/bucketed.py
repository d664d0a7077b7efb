"""Storage-bucketed (co-located) joins: shuffle once at WRITE time, then
join any number of times with NO exchange at all.

At 100 TB, tables that join repeatedly on the same key (orders x
lineitem on orderkey; doc shards x dedup verdicts on doc_id) should be
laid out hash-bucketed by that key: ``write_bucketed`` partitions rows by
``splitmix64(key) % n_buckets`` into one parquet directory per bucket.
``bucketed_join`` then schedules one task per bucket id; each task reads
ONLY its own bucket from both sides (a targeted parquet read, exactly
what partition-pruned storage does on a cluster) and joins locally with
a vectorized Arrow hash join. No all-to-all, no aggregator actors — the
join parallelism is the bucket count, and re-joining costs zero extra
shuffles forever after.

Contract: both sides bucketed with the SAME n_buckets and the same
(deterministic) hash; one bucket from both sides must fit in a worker's
heap — size ``n_buckets`` to the data, e.g. total_bytes / 256 MB.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def bucket_of(key: np.ndarray, n_buckets: int) -> np.ndarray:
    return (_splitmix64(key.astype(np.int64)) % np.uint64(n_buckets)).astype(np.int64)


def write_bucketed(ds, key: str, n_buckets: int, path: str) -> str:
    """Write ``ds`` hash-bucketed by ``key`` into ``path/bucket=<i>/``.

    One streaming pass: map_batches tags each row's bucket, and Ray's
    partitioned parquet write routes rows to per-bucket directories.
    """

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        return batch.append_column("bucket", pa.array(bucket_of(k, n_buckets)))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    tagged.write_parquet(path, partition_cols=["bucket"])
    return path


class _BucketJoin:
    """Actor-pool kernel: each call joins bucket i of both sides locally."""

    def __init__(self, path_a, path_b, key_a, key_b, join_type, columns_a, columns_b):
        self.path_a, self.path_b = path_a, path_b
        self.key_a, self.key_b = key_a, key_b
        self.join_type = join_type
        self.columns_a, self.columns_b = columns_a, columns_b
        # empty per-side schemas: a bucket missing on ONE side must still
        # join (left/full outer, anti joins keep the present side's rows);
        # joining against the empty table gives the right semantics for
        # every Arrow join_type instead of silently dropping rows.
        self.empty_a = self._empty(path_a, columns_a)
        self.empty_b = self._empty(path_b, columns_b)
        self.empty = self.empty_a.join(
            self.empty_b, keys=[key_a], right_keys=[key_b], join_type=join_type
        )

    @staticmethod
    def _empty(path: str, columns) -> pa.Table:
        for root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    schema = pq.read_schema(os.path.join(root, f))
                    t = schema.empty_table()
                    return t.select(columns) if columns else t
        raise FileNotFoundError(f"no parquet under {path}")

    def _read(self, path, columns, bucket: int):
        d = os.path.join(path, f"bucket={bucket}")
        if not os.path.isdir(d):
            return None
        return pq.read_table(d, columns=columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for bucket in batch["bucket"].to_pylist():
            a = self._read(self.path_a, self.columns_a, bucket)
            b = self._read(self.path_b, self.columns_b, bucket)
            if (a is None or len(a) == 0) and (b is None or len(b) == 0):
                continue
            if a is None or len(a) == 0:
                a = self.empty_a
            if b is None or len(b) == 0:
                b = self.empty_b
            joined = a.join(
                b,
                keys=[self.key_a],
                right_keys=[self.key_b],
                join_type=self.join_type,
            )
            if len(joined):
                out.append(joined)
        if not out:
            return self.empty
        return pa.concat_tables(out, promote_options="default")


def bucketed_join(
    path_a: str,
    path_b: str,
    key_a: str,
    key_b: str,
    n_buckets: int,
    join_type: str = "inner",
    columns_a=None,
    columns_b=None,
    concurrency=None,
):
    """Join two bucketed layouts with zero shuffle: one task per bucket,
    each a pruned read of bucket i from both sides + a local Arrow join."""
    import ray.data
    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()

    from ._cluster import id_blocks_ds

    buckets = id_blocks_ds(range(n_buckets), n_buckets, "bucket")
    return buckets.map_batches(
        _BucketJoin,
        fn_constructor_args=(path_a, path_b, key_a, key_b, join_type, columns_a, columns_b),
        batch_size=1,
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ----------------------------------------------- range-partitioned store

def write_range_partitioned(ds, key: str, n_parts: int, path: str) -> list[int]:
    """Range-cluster ``ds`` on an int64-comparable ``key`` into
    ``path/part=<i>/`` + a ``_range_bounds.json`` manifest: the
    storage layout that makes range predicates (time windows, id
    ranges) a TARGETED read of only the overlapping partitions —
    the ordered complement of the hash-bucketed store.

    Interior cut points come from the mergeable KLL sketch (one
    partial-sketch pass, no sort exchange); bound quality affects only
    partition balance, never correctness — reads re-filter exactly.
    Timestamps are keyed by their int64 epoch-us representation.
    """
    import json
    import os

    import pyarrow.compute as pc

    from .sketch import kll_quantiles

    def to_i64(col):
        t = col.type
        if pa.types.is_timestamp(t):
            return pc.cast(col, pa.int64())
        return pc.cast(col, pa.int64())

    key_i = ds.map_batches(
        lambda t: pa.table({key: to_i64(t[key])}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    qs = [i / n_parts for i in range(1, n_parts)]
    qt = kll_quantiles(key_i, key, qs)
    vals = qt["value"].to_pylist()
    bounds = sorted({int(v) for v in vals if v == v})  # dedup, drop NaN (empty ds)

    # exact global key extent (one cheap pruned-column pass): lets reads
    # prune windows entirely outside the store, incl. past the unbounded
    # first/last partitions
    from ray.data.aggregate import Max, Min

    mm = key_i.aggregate(Min(key), Max(key))
    kmin, kmax = mm.get(f"min({key})"), mm.get(f"max({key})")

    def tag(batch: pa.Table) -> pa.Table:
        k = to_i64(batch[key]).to_numpy(zero_copy_only=False)
        part = np.searchsorted(np.asarray(bounds, np.int64), k, side="right")
        return batch.append_column("part", pa.array(part, pa.int64()))

    ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        path, partition_cols=["part"]
    )
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/_range_bounds.json", "w") as f:
        json.dump(
            {
                "key": key,
                "bounds": bounds,
                "kmin": None if kmin is None else int(kmin),
                "kmax": None if kmax is None else int(kmax),
            },
            f,
        )
    return bounds


def read_range(path: str, lo: int, hi: int, columns=None):
    """Read only the partitions of a range-partitioned store that can
    contain key values in [lo, hi); rows are then exactly re-filtered
    by the caller (bounds are a pruning layout, not a guarantee).
    Returns a Dataset over the overlapping partition directories."""
    import json
    import os

    import ray.data

    with open(f"{path}/_range_bounds.json") as f:
        man = json.load(f)
    bounds = np.asarray(man["bounds"], np.int64)
    kmin, kmax = man.get("kmin"), man.get("kmax")
    if kmin is None or hi <= kmin or lo > kmax:  # disjoint from the store
        return ray.data.from_items([])
    # partition i holds keys in (bounds[i-1], bounds[i]] by searchsorted
    # 'right'; overlap check via the same rule on both window edges
    p_lo = int(np.searchsorted(bounds, lo, side="right"))
    p_hi = int(np.searchsorted(bounds, hi - 1, side="right"))
    files = []
    for i in range(p_lo, p_hi + 1):
        d = f"{path}/part={i}"
        if os.path.isdir(d):
            files.extend(
                f"{d}/{f}" for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
    if not files:  # window beyond every written partition
        return ray.data.from_items([])
    return ray.data.read_parquet(files, columns=columns)
