"""Disk-partitioned reference point store: bigger-than-memory kNN.

``stages/knn_points.py`` broadcasts the whole reference set into each
actor's GridIndex — correct until the reference side outgrows a node.
This module is the scale path (SURVEY.md round-3 candidate): reference
points are written ONCE as parquet partitioned by spatial block
(``bx=⌊x/block⌋ / by=⌊y/block⌋``), and the kNN kernel loads only the
blocks in a query's neighbourhood — an expanding square of blocks with
the same strict boundary-distance termination rule as GridIndex.knn, so
results are EXACT and identical to the in-memory index (same (d², id)
ordering). Worker memory holds an LRU of blocks, not the corpus; at
cluster scale you'd additionally repartition queries by block so each
actor's LRU stays hot (documented assumption, mirrored by the IVF
parquet store in stages/similarity.py).
"""

from __future__ import annotations

import os
import re
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def points_write_partitioned(
    points_ds,
    block: float,
    path: str,
    x_col: str = "x",
    y_col: str = "y",
) -> str:
    """One streaming pass: tag each point's (bx, by) block, write
    hive-partitioned parquet. Returns the store path."""

    def tag(batch: pa.Table) -> pa.Table:
        xs = batch[x_col].to_numpy(zero_copy_only=False)
        ys = batch[y_col].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bx", pa.array(np.floor(xs / block).astype(np.int64))
        ).append_column("by", pa.array(np.floor(ys / block).astype(np.int64)))

    tagged = points_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    tagged.write_parquet(path, partition_cols=["bx", "by"])
    return path


class PartitionedPointStore:
    """Reader half: targeted block loads + exact expanding-square kNN."""

    def __init__(
        self,
        path: str,
        block: float,
        x_col: str = "x",
        y_col: str = "y",
        id_col: str = "pt_id",
        cache_blocks: int = 256,
    ):
        self.path = path
        self.block = float(block)
        self.x_col, self.y_col, self.id_col = x_col, y_col, id_col
        self.cache: OrderedDict[tuple[int, int], tuple] = OrderedDict()
        self.cache_blocks = cache_blocks
        # occupied-block directory map (O(#blocks), NOT O(#points))
        self.blocks: set[tuple[int, int]] = set()
        for dx in os.listdir(path):
            m = re.match(r"bx=(-?\d+)$", dx)
            if not m:
                continue
            bx = int(m.group(1))
            for dy in os.listdir(os.path.join(path, dx)):
                my = re.match(r"by=(-?\d+)$", dy)
                if my:
                    self.blocks.add((bx, int(my.group(1))))
        if self.blocks:
            xs = [b[0] for b in self.blocks]
            ys = [b[1] for b in self.blocks]
            self.bbox = (min(xs), max(xs), min(ys), max(ys))
        else:
            self.bbox = None

    def _load(self, bx: int, by: int):
        key = (bx, by)
        if key in self.cache:
            self.cache.move_to_end(key)
            return self.cache[key]
        if key not in self.blocks:
            return None
        t = pq.read_table(
            os.path.join(self.path, f"bx={bx}", f"by={by}"),
            columns=[self.id_col, self.x_col, self.y_col],
        )
        val = (
            t[self.x_col].to_numpy(zero_copy_only=False).astype(np.float64),
            t[self.y_col].to_numpy(zero_copy_only=False).astype(np.float64),
            t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        self.cache[key] = val
        if len(self.cache) > self.cache_blocks:
            self.cache.popitem(last=False)
        return val

    def knn(self, x: float, y: float, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Exact kNN, ordered by (d², id) — identical to GridIndex.knn."""
        qbx = int(np.floor(x / self.block))
        qby = int(np.floor(y / self.block))
        if self.bbox is None:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        x0, x1, y0, y1 = self.bbox
        max_ring = max(abs(qbx - x0), abs(qbx - x1), abs(qby - y0), abs(qby - y1))
        ring = max(0, x0 - qbx, qbx - x1, y0 - qby, qby - y1)
        cand_x: list[np.ndarray] = []
        cand_y: list[np.ndarray] = []
        cand_i: list[np.ndarray] = []
        n_cand = 0
        while ring <= max_ring:
            if ring == 0:
                cells = [(qbx, qby)]
            else:
                cells = [
                    (cx, cy)
                    for cx in range(qbx - ring, qbx + ring + 1)
                    for cy in (qby - ring, qby + ring)
                ] + [
                    (cx, cy)
                    for cy in range(qby - ring + 1, qby + ring)
                    for cx in (qbx - ring, qbx + ring)
                ]
            for c in cells:
                v = self._load(*c)
                if v is not None:
                    cand_x.append(v[0])
                    cand_y.append(v[1])
                    cand_i.append(v[2])
                    n_cand += len(v[2])
            if n_cand >= k:
                xs = np.concatenate(cand_x)
                ys = np.concatenate(cand_y)
                ids = np.concatenate(cand_i)
                d2 = (xs - x) ** 2 + (ys - y) ** 2
                order = np.lexsort((ids, d2))[:k]
                kth_d2 = float(np.partition(d2, k - 1)[k - 1])
                # exact distance from the query point to the edge of the
                # fully-scanned square of blocks: any unscanned point is
                # at least this far; strict > so boundary ties (which a
                # smaller unscanned id must win) force one more ring
                bound = min(
                    x - (qbx - ring) * self.block,
                    (qbx + ring + 1) * self.block - x,
                    y - (qby - ring) * self.block,
                    (qby + ring + 1) * self.block - y,
                )
                if bound * bound > kth_d2:
                    return ids[order], d2[order]
            ring += 1
        if not cand_i:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        xs = np.concatenate(cand_x)
        ys = np.concatenate(cand_y)
        ids = np.concatenate(cand_i)
        d2 = (xs - x) ** 2 + (ys - y) ** 2
        order = np.lexsort((ids, d2))[:k]
        return ids[order], d2[order]
