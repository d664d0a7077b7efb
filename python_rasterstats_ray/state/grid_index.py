"""Per-cell grid index for spatial point lookups (the engine's STRtree
stand-in, SURVEY.md ST3). Pure numpy; built once per actor."""

from __future__ import annotations

import numpy as np


class GridIndex:
    """Uniform-grid spatial index over 2-D points.

    Query: k nearest neighbours by expanding rings of grid cells; the ring
    radius guarantees correctness (a candidate further than the completed
    ring boundary cannot beat the current k-th best).
    """

    def __init__(self, xs: np.ndarray, ys: np.ndarray, ids: np.ndarray, cell: float):
        self.xs = np.asarray(xs, dtype=np.float64)
        self.ys = np.asarray(ys, dtype=np.float64)
        self.ids = np.asarray(ids, dtype=np.int64)
        self.cell = float(cell)
        gx = np.floor(self.xs / cell).astype(np.int64)
        gy = np.floor(self.ys / cell).astype(np.int64)
        self.buckets: dict[tuple[int, int], np.ndarray] = {}
        order = np.lexsort((gy, gx))
        key = np.column_stack([gx[order], gy[order]])
        if len(order):
            change = np.nonzero(np.any(np.diff(key, axis=0) != 0, axis=1))[0] + 1
            starts = np.concatenate([[0], change, [len(order)]])
            for s, e in zip(starts[:-1], starts[1:]):
                self.buckets[(int(key[s, 0]), int(key[s, 1]))] = order[s:e]

    def knn(self, x: float, y: float, k: int) -> tuple[np.ndarray, np.ndarray]:
        """(neighbor ids, squared distances), ordered by (d^2, id).

        Squared distances (dx*dx + dy*dy) keep the ordering bitwise
        reproducible by a SQL oracle computing the same expression.
        """
        gx = int(np.floor(x / self.cell))
        gy = int(np.floor(y / self.cell))
        best_ids: list[int] = []
        best_d: list[float] = []
        ring = 0
        max_ring = 1 + int(np.ceil(max(
            abs(self.xs.max() - self.xs.min()), abs(self.ys.max() - self.ys.min())
        ) / self.cell)) if len(self.xs) else 0
        while ring <= max_ring:
            idxs = []
            for cx in range(gx - ring, gx + ring + 1):
                for cy in range(gy - ring, gy + ring + 1):
                    if max(abs(cx - gx), abs(cy - gy)) != ring:
                        continue
                    b = self.buckets.get((cx, cy))
                    if b is not None:
                        idxs.append(b)
            if idxs:
                cand = np.concatenate(idxs)
                dx = self.xs[cand] - x
                dy = self.ys[cand] - y
                d2 = dx * dx + dy * dy
                best_ids.extend(self.ids[cand].tolist())
                best_d.extend(d2.tolist())
            if len(best_d) >= k:
                order = np.lexsort((best_ids, best_d))[:k]
                kth_d2 = sorted(best_d)[min(k, len(best_d)) - 1]
                # done when the completed ring's guaranteed boundary exceeds kth
                if (ring * self.cell) ** 2 >= kth_d2:
                    ids_arr = np.asarray(best_ids)[order]
                    d_arr = np.asarray(best_d)[order]
                    return ids_arr, d_arr
            ring += 1
        order = np.lexsort((best_ids, best_d))[:k]
        return np.asarray(best_ids, dtype=np.int64)[order], np.asarray(best_d)[order]
