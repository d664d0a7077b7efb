"""Distributed k-nearest-neighbour point lookup against a reference point
set (the 'kNN point query' requirement in BASELINE.json north_star).

Reference points are broadcast once (ray.put); each actor builds a
GridIndex in ``__init__`` (stateful stage) and answers per-batch queries.
Scales in the query dimension (the streaming axis); a reference set too
large for one index would be hash-bucketed by cell with a groupby join —
documented partitioning assumption: reference side fits a node's memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.grid_index import GridIndex


class KnnPointKernel:
    def __init__(self, ref_points, k: int, cell: float,
                 x_col: str = "x", y_col: str = "y", id_col: str = "pt_id"):
        import ray

        xs, ys, ids = ray.get(ref_points)
        self.index = GridIndex(xs, ys, ids, cell=cell)
        self.k = k
        self.x_col = x_col
        self.y_col = y_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        xs = batch[self.x_col].to_numpy(zero_copy_only=False)
        ys = batch[self.y_col].to_numpy(zero_copy_only=False)
        qids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out_q, out_n, out_d, out_rank = [], [], [], []
        for qid, x, y in zip(qids, xs, ys):
            nids, dists = self.index.knn(float(x), float(y), self.k)
            out_q.extend([int(qid)] * len(nids))
            out_n.extend(nids.tolist())
            out_d.extend(dists.tolist())
            out_rank.extend(range(1, len(nids) + 1))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "distance_sq": pa.array(out_d, pa.float64()),
                "knn_rank": pa.array(out_rank, pa.int64()),
            }
        )


def knn_points(
    queries_ds,
    ref_xs: np.ndarray,
    ref_ys: np.ndarray,
    ref_ids: np.ndarray,
    k: int = 5,
    cell: float | None = None,
    concurrency=None,
    **cols,
):
    """Queries Dataset (pt_id, x, y) x reference points -> top-k rows
    (query_id, neighbor_id, distance_sq, knn_rank)."""
    import ray
    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()

    if cell is None:
        # ~1 point per grid bucket on average
        span = max(ref_xs.max() - ref_xs.min(), ref_ys.max() - ref_ys.min())
        cell = float(span / max(1.0, np.sqrt(len(ref_xs))))
    ref = ray.put((np.asarray(ref_xs), np.asarray(ref_ys), np.asarray(ref_ids)))
    return queries_ds.map_batches(
        KnnPointKernel,
        fn_constructor_kwargs=dict(ref_points=ref, k=k, cell=cell, **cols),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )

class PartitionedKnnKernel:
    """Stateful stage over a disk-partitioned point store
    (state/partitioned_points.py): holds an LRU of spatial blocks, not
    the reference corpus — the bigger-than-memory kNN path."""

    def __init__(self, store_path: str, block: float, k: int,
                 x_col: str = "x", y_col: str = "y", id_col: str = "pt_id",
                 cache_blocks: int = 256):
        from ..state.partitioned_points import PartitionedPointStore

        self.store = PartitionedPointStore(
            store_path, block, cache_blocks=cache_blocks
        )
        self.k = k
        self.x_col, self.y_col, self.id_col = x_col, y_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        xs = batch[self.x_col].to_numpy(zero_copy_only=False)
        ys = batch[self.y_col].to_numpy(zero_copy_only=False)
        qids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out_q, out_n, out_d, out_rank = [], [], [], []
        for qid, x, y in zip(qids, xs, ys):
            nids, dists = self.store.knn(float(x), float(y), self.k)
            out_q.extend([int(qid)] * len(nids))
            out_n.extend(nids.tolist())
            out_d.extend(dists.tolist())
            out_rank.extend(range(1, len(nids) + 1))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "distance_sq": pa.array(out_d, pa.float64()),
                "knn_rank": pa.array(out_rank, pa.int64()),
            }
        )


def knn_points_from_store(queries_ds, store_path: str, block: float, k: int = 5,
                          concurrency=None, **cols):
    """Queries Dataset (pt_id, x, y) against a partitioned point store ->
    same (query_id, neighbor_id, distance_sq, knn_rank) rows as
    ``knn_points`` — exact, without ever holding the reference set."""
    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()
    return queries_ds.map_batches(
        PartitionedKnnKernel,
        fn_constructor_kwargs=dict(store_path=store_path, block=block, k=k, **cols),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )


class IDWKernel:
    """k-NN inverse-distance-squared interpolation: per query, the value
    is sum(w_i * v_i) / sum(w_i) over the (d^2, id)-ordered k nearest
    reference points with w = 1 / d^2, accumulated in RANK ORDER
    (left-associated adds, so a rank-pivoted SQL expression reproduces
    the float64 result bit-exactly). A zero-distance hit short-circuits
    to that reference's value (standard IDW exact-match rule)."""

    def __init__(self, ref_points, k: int, cell: float,
                 x_col: str = "x", y_col: str = "y", id_col: str = "pt_id"):
        import ray

        xs, ys, ids, vals = ray.get(ref_points)
        self.index = GridIndex(xs, ys, ids, cell=cell)
        order = np.argsort(np.asarray(ids))
        self._ids_sorted = np.asarray(ids)[order]
        self._vals_sorted = np.asarray(vals, dtype=np.float64)[order]
        self.k = k
        self.x_col = x_col
        self.y_col = y_col
        self.id_col = id_col

    def _val(self, nid: int) -> float:
        pos = int(np.searchsorted(self._ids_sorted, nid))
        return float(self._vals_sorted[pos])

    def __call__(self, batch: pa.Table) -> pa.Table:
        xs = batch[self.x_col].to_numpy(zero_copy_only=False)
        ys = batch[self.y_col].to_numpy(zero_copy_only=False)
        qids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out_q, out_v = [], []
        for qid, x, y in zip(qids, xs, ys):
            nids, d2 = self.index.knn(float(x), float(y), self.k)
            out_q.append(int(qid))
            if len(nids) == 0:
                out_v.append(None)
            elif d2[0] == 0.0:
                out_v.append(self._val(int(nids[0])))
            else:
                num = 0.0
                den = 0.0
                for nid, d in zip(nids.tolist(), d2.tolist()):
                    w = 1.0 / d
                    num = num + w * self._val(int(nid))
                    den = den + w
                out_v.append(num / den)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "value": pa.array(out_v, pa.float64()),
            }
        )


def idw_points(
    queries_ds,
    ref_xs: np.ndarray,
    ref_ys: np.ndarray,
    ref_ids: np.ndarray,
    ref_vals: np.ndarray,
    k: int = 4,
    cell: float | None = None,
    concurrency=None,
    **cols,
):
    """Queries Dataset (pt_id, x, y) x valued reference points ->
    (query_id, value) by inverse-distance-squared interpolation.
    Broadcast reference side + per-actor grid index (the kNN ST3 shape);
    same partitioned-store escape hatch as knn_points_from_store applies
    when the reference set outgrows a node."""
    import ray

    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()
    if cell is None:
        span = max(ref_xs.max() - ref_xs.min(), ref_ys.max() - ref_ys.min())
        cell = float(span / max(1.0, np.sqrt(len(ref_xs))))
    ref = ray.put(
        (np.asarray(ref_xs), np.asarray(ref_ys), np.asarray(ref_ids), np.asarray(ref_vals))
    )
    return queries_ds.map_batches(
        IDWKernel,
        fn_constructor_kwargs=dict(ref_points=ref, k=k, cell=cell, **cols),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )
