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
            # occupied-bucket bounding box: bounds the ring expansion for
            # queries arbitrarily far outside the point cloud
            self.gbox = (int(gx.min()), int(gx.max()), int(gy.min()), int(gy.max()))
        else:
            self.gbox = None

    def knn(self, x: float, y: float, k: int) -> tuple[np.ndarray, np.ndarray]:
        """(neighbor ids, squared distances), ordered by (d^2, id).

        Squared distances (dx*dx + dy*dy) keep the ordering bitwise
        reproducible by a SQL oracle computing the same expression.
        """
        gx = int(np.floor(x / self.cell))
        gy = int(np.floor(y / self.cell))
        best_ids: list[int] = []
        best_d: list[float] = []
        if self.gbox is None:
            max_ring = -1  # no points at all
            ring = 0
        else:
            # Chebyshev span to the occupied-bucket bounding box: the
            # farthest bucket bounds the expansion (so far-outside queries
            # terminate), the nearest bucket lets us skip the guaranteed-
            # empty inner rings entirely
            x0, x1, y0, y1 = self.gbox
            max_ring = max(abs(gx - x0), abs(gx - x1), abs(gy - y0), abs(gy - y1))
            ring = max(0, x0 - gx, gx - x1, y0 - gy, gy - y1)
        while ring <= max_ring:
            # perimeter-only enumeration: O(ring) cells, not O(ring^2)
            if ring == 0:
                cells = [(gx, gy)]
            else:
                cells = [
                    (cx, cy)
                    for cx in range(gx - ring, gx + ring + 1)
                    for cy in (gy - ring, gy + ring)
                ] + [
                    (cx, cy)
                    for cy in range(gy - ring + 1, gy + ring)
                    for cx in (gx - ring, gx + ring)
                ]
            idxs = []
            for cell_key in cells:
                b = self.buckets.get(cell_key)
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
                # done only when the completed ring's guaranteed boundary
                # STRICTLY exceeds kth: an unscanned point can sit exactly
                # at ring*cell (query on a cell edge) and tie with a
                # smaller id, which must win under (d2, id) ordering
                if (ring * self.cell) ** 2 > kth_d2:
                    ids_arr = np.asarray(best_ids)[order]
                    d_arr = np.asarray(best_d)[order]
                    return ids_arr, d_arr
            ring += 1
        order = np.lexsort((best_ids, best_d))[:k]
        return np.asarray(best_ids, dtype=np.int64)[order], np.asarray(best_d)[order]
