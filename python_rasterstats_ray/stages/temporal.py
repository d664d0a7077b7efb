"""Temporal operators Ray Data lacks natively: tumbling / hopping /
session windows, as-of joins and range (interval) joins (SURVEY.md
section 2 'custom operators' note).

Both are expressed as compositions the streaming executor can pipeline:
- tumbling window: bucket key derived per batch (vectorized) + the usual
  partial-then-final groupby — no watermark state needed for bounded
  (batch) inputs.
- as-of join: the build side (small) is broadcast as per-key sorted arrays;
  each probe batch does one np.searchsorted per key group. Partitioning
  assumption (documented): the build side fits in worker memory; beyond
  that, co-partition both sides by key hash and run the same searchsorted
  inside groupby groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def tumbling_window_agg(
    events_ds,
    window_us: int,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    value_scale: int | None = None,
):
    """Per (window_start, key) count + sum over tumbling windows of
    ``window_us`` microseconds (epoch-aligned).

    ``value_scale``: when the value column is an exact fixed-point decimal
    (e.g. 2-decimal money -> scale 100), accumulate scaled int64 so the
    distributed sum is order-independent (bit-exact across any partial
    merge order); the emitted ``total_value`` is scaled back to double."""

    def partial(batch: pa.Table) -> pa.Table:
        # pin to microseconds regardless of the source timestamp unit
        ts = (
            batch[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        win = (ts // window_us) * window_us
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if value_scale is not None:
            v = np.round(v * value_scale).astype(np.int64)
        t = pa.table(
            {
                "window_start": pa.array(win, pa.int64()),
                key_col: batch[key_col],
                "v": pa.array(v),
            }
        )
        return (
            t.group_by(["window_start", key_col])
            .aggregate([("v", "count"), ("v", "sum")])
            .rename_columns(["window_start", key_col, "n_events", "total_value"])
        )

    partials = events_ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    return partials.groupby(["window_start", key_col]).map_groups(
        _window_final(key_col, value_scale), batch_format="pyarrow"
    )


def _window_final(key_col: str, value_scale: int | None):
    """All-Arrow merge of tumbling/hopping window partials."""
    import pyarrow.compute as pc

    def final(g: pa.Table) -> pa.Table:
        total = pc.sum(g["total_value"]).as_py()
        if value_scale is not None:
            total = total / float(value_scale)
        return pa.table(
            {
                "window_start": g["window_start"][:1],
                key_col: g[key_col][:1],
                "n_events": pa.array([int(pc.sum(g["n_events"]).as_py())], pa.int64()),
                "total_value": pa.array([total]),
            }
        )

    return final


def hopping_window_agg(
    events_ds,
    window_us: int,
    hop_us: int,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    value_scale: int | None = None,
):
    """Overlapping (hopping) window aggregate: each event lands in
    ``window_us / hop_us`` windows; windows are hop-aligned. Expressed as a
    vectorized per-batch fan-out (np.repeat, no Python row loop) followed
    by the usual partial-then-final groupby — the fan-out multiplies only
    the tiny (window, key, partial) rows, never the payload."""
    assert window_us % hop_us == 0, "window must be a multiple of hop"
    fanout = window_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        ts = (
            batch[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if value_scale is not None:
            v = np.round(v * value_scale).astype(np.int64)
        keys = np.asarray(batch[key_col].to_pylist())
        # window starts for an event at t: the hop-aligned starts in
        # (t - window, t]
        last = (ts // hop_us) * hop_us
        starts = np.repeat(last, fanout) - np.tile(
            np.arange(fanout, dtype=np.int64) * hop_us, len(ts)
        )
        t = pa.table(
            {
                "window_start": pa.array(starts, pa.int64()),
                key_col: pa.array(np.repeat(keys, fanout)),
                "v": pa.array(np.repeat(v, fanout)),
            }
        )
        return (
            t.group_by(["window_start", key_col])
            .aggregate([("v", "count"), ("v", "sum")])
            .rename_columns(["window_start", key_col, "n_events", "total_value"])
        )

    partials = events_ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    return partials.groupby(["window_start", key_col]).map_groups(
        _window_final(key_col, value_scale), batch_format="pyarrow"
    )


def session_windows(
    events_ds,
    gap_us: int,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
):
    """Gap-based session windows per key: a new session starts when the
    gap to the previous event (by ts, id order) exceeds ``gap_us``.
    Returns one row per (key, session_idx) with the session's event count
    and [t_start, t_end] in epoch-us.

    Batched like the zonal holistic merge: keys are co-located by a
    groupby on a 64-key BUCKET (key >> 6), and one vectorized kernel
    sessionizes every key in the bucket via sort + segment boundaries —
    no per-key Python call, no 1-row blocks."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("_kb", pc.shift_right(batch[key_col], 6))

    def sessions_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"), (id_col, "ascending")]
        ).combine_chunks()
        ts = (
            g[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        if len(ts) == 0:
            return pa.table(
                {
                    key_col: pa.array([], g[key_col].type),
                    "session_idx": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "t_start": pa.array([], pa.int64()),
                    "t_end": pa.array([], pa.int64()),
                }
            )
        keys = g[key_col].to_numpy(zero_copy_only=False)
        new_key = np.concatenate([[True], keys[1:] != keys[:-1]])
        new_session = new_key | np.concatenate([[True], np.diff(ts) > gap_us])
        starts = np.nonzero(new_session)[0]
        ends = np.concatenate([starts[1:] - 1, [len(ts) - 1]])
        skey = keys[starts]
        key_first = np.nonzero(np.concatenate([[True], skey[1:] != skey[:-1]]))[0]
        kstart = np.repeat(key_first, np.diff(np.append(key_first, len(skey))))
        return pa.table(
            {
                key_col: pa.array(skey),
                "session_idx": pa.array(
                    np.arange(len(skey), dtype=np.int64) - kstart, pa.int64()
                ),
                "n_events": pa.array((ends - starts + 1).astype(np.int64), pa.int64()),
                "t_start": pa.array(ts[starts], pa.int64()),
                "t_end": pa.array(ts[ends], pa.int64()),
            }
        )

    return (
        events_ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_kb")
        .map_groups(sessions_bucket, batch_format="pyarrow")
    )


class AsofJoinKernel:
    """Probe-side kernel: for each probe row (key, ts), attach the build
    row with the greatest build_ts <= ts (ties broken by greatest build id,
    matching ORDER BY ts DESC, id DESC LIMIT 1). Probe rows with no match
    get nulls."""

    def __init__(self, build_ref, key_col: str, ts_col: str):
        import ray

        # build: dict key -> (sorted build_ts int64 array, build ids array)
        self.build = ray.get(build_ref)
        self.key_col = key_col
        self.ts_col = ts_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        # pin the epoch unit: cast through timestamp('us') so the int64 view
        # is microseconds no matter what resolution the source column carries
        ts = (
            batch[self.ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        out_id = np.full(len(batch), -1, dtype=np.int64)
        for key in np.unique(keys):
            ent = self.build.get(int(key))
            if ent is None:
                continue
            bts, bids = ent
            mask = keys == key
            pos = np.searchsorted(bts, ts[mask], side="right") - 1
            ok = pos >= 0
            vals = np.full(int(mask.sum()), -1, dtype=np.int64)
            vals[ok] = bids[pos[ok]]
            out_id[mask] = vals
        matched = out_id >= 0
        col = pa.array(
            np.where(matched, out_id, 0), pa.int64(), mask=~matched
        )
        return batch.append_column("asof_id", col)


def asof_join(
    probe_ds,
    build_df: pd.DataFrame,
    *,
    key_col: str,
    probe_ts_col: str,
    build_ts_col: str,
    build_id_col: str,
    build_key_col: str | None = None,
    concurrency=None,
):
    """Probe Dataset x small build table -> probe rows + ``asof_id``.

    ``build_key_col`` defaults to ``key_col`` (use it when the two sides
    name the key differently). For ties on build_ts, the larger build id
    wins (deterministic and SQL-reproducible via ORDER BY ts DESC, id
    DESC)."""
    import ray
    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()

    bkey = build_key_col or key_col
    build: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    df = build_df.sort_values([bkey, build_ts_col, build_id_col])
    for key, g in df.groupby(bkey):
        # microseconds explicitly (pandas may hold ns or us depending on
        # version/reader; the probe side is pinned to us the same way)
        bts = g[build_ts_col].to_numpy(dtype="datetime64[us]").view("int64")
        bids = g[build_id_col].astype("int64").to_numpy()
        # for duplicate ts keep the max id at each position: since sorted by
        # (ts, id), searchsorted 'right' - 1 lands on the last (max id) row
        build[int(key)] = (bts, bids)
    ref = ray.put(build)
    return probe_ds.map_batches(
        AsofJoinKernel,
        fn_constructor_kwargs=dict(build_ref=ref, key_col=key_col, ts_col=probe_ts_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def interval_join(
    probe_ds,
    intervals_ds,
    *,
    key_col: str = "user_id",
    probe_ts_col: str = "ts",
    probe_id_col: str = "event_id",
    lo_col: str = "t_start",
    hi_col: str = "t_end",
    interval_id_col: str = "session_idx",
    bucket_bits: int = 6,
):
    """Range (interval) join, shuffle-native: attach to each probe row the
    interval [lo, hi] of the same key that contains its timestamp.

    Unlike the broadcast as-of join, NEITHER side is materialized: probe
    rows and interval rows are tagged and unioned, co-partitioned by a
    key BUCKET (key >> bucket_bits — the batched-kernel pattern), and one
    vectorized searchsorted per bucket assigns every probe row. Scales to
    an interval side proportional to the probe side (e.g. event -> session
    attribution, where intervals = session_windows output).

    Assumes intervals of one key do not overlap (true for session/tumbling
    windows). Probe rows in no interval get interval id -1. Timestamps are
    pinned to epoch-us on both sides. Returns (key, probe_id, ts_us,
    interval_id) rows.
    """
    import pyarrow.compute as pc

    def tag_probe(batch: pa.Table) -> pa.Table:
        ts = batch[probe_ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        key = batch[key_col].cast(pa.int64())
        return pa.table(
            {
                "key": key,
                "_kb": pc.shift_right(key, bucket_bits),
                "kind": pa.array(np.zeros(len(batch), dtype=np.int8), pa.int8()),
                "t": ts,
                "a": batch[probe_id_col].cast(pa.int64()),
                "b": pa.array(np.zeros(len(batch), dtype=np.int64), pa.int64()),
            }
        )

    def tag_interval(batch: pa.Table) -> pa.Table:
        key = batch[key_col].cast(pa.int64())
        return pa.table(
            {
                "key": key,
                "_kb": pc.shift_right(key, bucket_bits),
                "kind": pa.array(np.ones(len(batch), dtype=np.int8), pa.int8()),
                "t": batch[lo_col].cast(pa.int64()),
                "a": batch[interval_id_col].cast(pa.int64()),
                "b": batch[hi_col].cast(pa.int64()),
            }
        )

    probe_tagged = probe_ds.map_batches(
        tag_probe, batch_format="pyarrow", zero_copy_batch=True
    )
    iv_tagged = intervals_ds.map_batches(
        tag_interval, batch_format="pyarrow", zero_copy_batch=True
    )

    def join_bucket(g: pa.Table) -> pa.Table:
        # intervals sorted by (key, lo); each of the <= 2^bucket_bits keys
        # in the bucket gets one vectorized searchsorted over its slice
        kind = g["kind"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        ivm = kind == 1
        order = np.lexsort((t[ivm], key[ivm]))  # stable (key, lo) sort
        keys_iv = key[ivm][order]
        lo = t[ivm][order]
        hi = b[ivm][order]
        ivid = a[ivm][order]
        prm = ~ivm
        pk = key[prm]
        pt = t[prm]
        out_id = np.full(len(pk), -1, dtype=np.int64)
        for k in np.unique(pk):
            s = np.searchsorted(keys_iv, k, side="left")
            e = np.searchsorted(keys_iv, k, side="right")
            if s == e:
                continue
            m = np.nonzero(pk == k)[0]
            pos = np.searchsorted(lo[s:e], pt[m], side="right") - 1
            sel = np.nonzero(pos >= 0)[0]
            inwin = pt[m][sel] <= hi[s:e][pos[sel]]
            out_id[m[sel[inwin]]] = ivid[s:e][pos[sel[inwin]]]
        return pa.table(
            {
                "key": pa.array(pk, pa.int64()),
                "probe_id": pa.array(a[prm], pa.int64()),
                "ts_us": pa.array(pt, pa.int64()),
                "interval_id": pa.array(out_id, pa.int64()),
            }
        )

    return (
        probe_tagged.union(iv_tagged)
        .groupby("_kb")
        .map_groups(join_bucket, batch_format="pyarrow")
    )
