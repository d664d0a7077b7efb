"""Large-large equi-joins on Ray Data's native hash-shuffle join.

The rest of the engine broadcasts small join sides (``ray.put`` once,
searchsorted probe per batch — see ``pipelines/queries.py``); this module
covers the case the broadcast pattern cannot: BOTH sides are large
(orders x lineitem at TPC-H scale, pr x edges in an iterative graph
step).  ``Dataset.join`` hash-partitions both inputs by the key across an
actor-pool of aggregators, so each partition joins locally — the classic
shuffle hash join, expressed with the Ray-Data-native operator rather
than a hand-rolled ``groupby().map_groups`` emulation.

Scale notes (100 TB discipline):

- Column-prune BOTH sides before the join — every surviving column of
  every row crosses the exchange.
- Push row filters below the join (filter batches before ``join``), and
  pre-aggregate below it when the aggregation key contains the join key
  (e.g. TPC-H Q3 groups by ``l_orderkey``: lineitem can be collapsed to
  one row per orderkey BEFORE joining orders, shrinking the probe side
  ~4x).
- ``num_partitions`` sizes the aggregator pool; default = the cluster
  CPU count, never exceeding it on small clusters (aggregators beyond
  the CPU count livelock multi-join plans — see default_join_partitions).
  At multi-node scale raise it so each partition's build side fits in a
  worker's heap.
- Skew: hash partitioning by key spreads TPC-H-style keys fine; for a
  degenerate hot key pre-aggregate below the join (above) so at most one
  row per (key, upstream block) reaches the exchange.
"""

from __future__ import annotations

from typing import Optional, Sequence

_DEF_PARTITIONS_MIN = 8


def join_partitions_for_rows(n_rows: int, rows_per_partition: int = 20_000) -> int:
    """Partition count sized to the DATA, capped by the cluster.

    Each hash-shuffle partition costs an aggregator ACTOR (~150 ms spawn
    + a CPU reservation), so partitions beyond what the row volume needs
    are pure ramp: TPC-H Q3 at sf0.1 measured 12.96 s with 32
    partitions vs 7.56 s with 8 on the same 32-CPU session. At real
    scale rows/rows_per_partition >> cpus and this returns the CPU
    count, i.e. the cap is only ever binding on small inputs."""
    from ._cluster import cluster_cpus

    want = max(2, int(n_rows) // rows_per_partition)
    return max(2, min(cluster_cpus(_DEF_PARTITIONS_MIN), want))


def default_join_partitions() -> int:
    """Partition count for the hash-shuffle join, sized to the cluster.

    On small clusters partitions must NOT exceed the CPU count: each
    partition reserves a slice of aggregator-actor CPU, and a plan with
    two joins at 8 partitions each was observed to stall indefinitely at
    num_cpus=4 (aggregators + the downstream actor pool + reads oversubscribe
    the 4 slots; with partitions = cpus the same plan finishes in 20 s).
    At >=8 CPUs this returns the CPU count, as before."""
    from ._cluster import cluster_cpus

    cpus = cluster_cpus(_DEF_PARTITIONS_MIN)
    if cpus < _DEF_PARTITIONS_MIN:
        return max(2, cpus)
    return cpus


def hash_equi_join(
    left,
    right,
    on: Sequence[str],
    right_on: Optional[Sequence[str]] = None,
    join_type: str = "inner",
    num_partitions: Optional[int] = None,
):
    """Hash-shuffle equi-join of two (large) Datasets.

    Thin, documented wrapper over ``ray.data.Dataset.join`` (Ray 2.49's
    hash-shuffle join). Key columns named identically on both sides are
    merged into one output column (Ray keeps the left name).

    Known Ray 2.49 edge (observed, minimal repro in tests): a join
    partition that receives NO shard from one side builds a zero-column
    table and Arrow raises ``No match for FieldRef`` — this happens only
    for degenerate tiny/streamed sides. When a side may be near-empty,
    route through :func:`join_auto` with that side materialized (its
    size estimate then picks the broadcast path). Also size
    ``num_partitions`` to the data, not the CPU count: aggregator actors
    for vastly more partitions than CPUs can livelock a small cluster.
    """
    if num_partitions is None:
        num_partitions = default_join_partitions()
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=tuple(on),
        right_on=tuple(right_on) if right_on is not None else None,
    )


DEFAULT_BROADCAST_BYTES = 64 << 20  # one worker-heap-friendly Arrow table

# broadcast-hash is equivalent to shuffle-hash only when the RIGHT side
# needs no per-row output for its unmatched rows
_BROADCASTABLE = {"inner", "left_outer", "left_semi", "left_anti"}


class _BroadcastJoinKernel:
    """Actor-pool kernel: right side fetched from the object store once
    per actor (zero-copy plasma reads), each batch joined locally."""

    def __init__(self, refs, key_l, key_r, join_type, right_schema=None):
        import ray

        import pyarrow as pa

        # zero-row blocks can carry a degenerate (column-less) schema in
        # Ray 2.49 — treat them as absent and rebuild from right_schema
        tables = [t for t in ray.get(list(refs)) if t is not None and len(t)]
        if tables:
            self.right = pa.concat_tables(tables, promote_options="default")
        elif isinstance(right_schema, pa.Schema):
            # zero right blocks: join against the empty table so the
            # output schema (null-filled right columns for left outer)
            # matches the non-empty and hash-shuffle plans
            self.right = right_schema.empty_table()
        else:
            self.right = None
        self.key_l, self.key_r = list(key_l), list(key_r)
        self.join_type = join_type.replace("_", " ")  # Arrow spells "left outer"

    def __call__(self, batch):
        if self.right is None:
            # no right blocks AND no schema: left rows survive only for
            # left-preserving types (left outer loses the right columns
            # here — callers pass right_schema to avoid this)
            return batch if self.join_type in ("left outer", "left anti") else batch.slice(0, 0)
        return batch.join(
            self.right,
            keys=self.key_l,
            right_keys=self.key_r,
            join_type=self.join_type,
        )


def join_auto(
    left,
    right,
    on: Sequence[str],
    right_on: Optional[Sequence[str]] = None,
    join_type: str = "inner",
    broadcast_threshold_bytes: int = DEFAULT_BROADCAST_BYTES,
    num_partitions: Optional[int] = None,
    concurrency=None,
    right_schema=None,
):
    """Plan a join: broadcast the right side if its (metadata-estimated)
    size fits under ``broadcast_threshold_bytes`` and the join type
    allows it, else fall back to the hash-shuffle join.

    Mirrors ``zonal_stats_auto``'s planner shape: the cheap estimate
    (``Dataset.size_bytes`` from parquet metadata — no execution) picks
    the physical plan; the broadcast path ships the right side ONCE into
    the object store and every actor joins its batches locally with a
    vectorized Arrow hash join — no exchange of the (large) left side.

    ``right_schema`` (a ``pyarrow.Schema``) keeps a left-outer join's
    output schema stable when the right side can be EMPTY: normally it
    is auto-captured from ``right``, but a fully row-lambda-filtered
    Dataset loses its schema in Ray 2.49 — pass it explicitly there.
    """
    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()
    est = None
    try:
        est = right.size_bytes()
    except Exception:
        est = None
    if (
        join_type in _BROADCASTABLE
        and est is not None
        and est <= broadcast_threshold_bytes
    ):
        r_on = list(right_on) if right_on is not None else list(on)
        refs = right.to_arrow_refs()
        rschema = right_schema
        if rschema is None:
            try:  # cheap post-materialize; keeps the empty-right schema stable
                rschema = getattr(
                    right.schema(fetch_if_missing=False), "base_schema", None
                )
            except Exception:
                rschema = None
        return left.map_batches(
            _BroadcastJoinKernel,
            fn_constructor_args=(refs, list(on), r_on, join_type, rschema),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )
    return hash_equi_join(
        left, right, on=on, right_on=right_on, join_type=join_type,
        num_partitions=num_partitions,
    )


# ----------------------------------------------- bbox spatial self-join
#
# Polygon-polygon (bbox) spatial join — the missing arm of the north
# rule's spatial-join triangle (zonal = polygon x raster, PIP = point x
# polygon, this = polygon x polygon). Partition-Based Spatial-Merge
# (PBSM, Patel & DeWitt 1996) shape:
#
# 1. flat_map: each rectangle -> every grid cell its bbox covers (one
#    (cell, id, bbox) row per cell; bboxes are small so the fanout is
#    bounded by bbox_area / cell_area);
# 2. groupby(cell): vectorized pairwise overlap inside the cell;
# 3. duplicate-pair avoidance WITHOUT a distinct pass: a pair is
#    REPORTED only by the canonical cell — the one containing the
#    intersection's (max(xmin), max(ymin)) corner. Every overlapping
#    pair shares that cell (both bboxes cover the intersection), and
#    exactly one cell contains the corner.
#
# Integer coordinates end to end, so the result is bit-exact vs a SQL
# range-predicate join; overlap is STRICT interior intersection
# (a.xmin < b.xmax AND b.xmin < a.xmax, same for y).


def _bbox_to_cells(batch, cell_size: int, id_col: str = "id"):
    """Vectorized PBSM cell fanout: rect i emits one thin row per grid
    cell its bbox covers (nx[i]*ny[i] rows; local index j enumerates the
    cell grid row-major). xmax/ymax are EXCLUSIVE edges: a rect touching
    a cell boundary does not enter the next cell (strict-interior
    semantics)."""
    import numpy as np
    import pyarrow as pa

    ids = batch[id_col].to_numpy(zero_copy_only=False)
    x0 = batch["xmin"].to_numpy(zero_copy_only=False)
    y0 = batch["ymin"].to_numpy(zero_copy_only=False)
    x1 = batch["xmax"].to_numpy(zero_copy_only=False)
    y1 = batch["ymax"].to_numpy(zero_copy_only=False)
    cols = (id_col, "xmin", "ymin", "xmax", "ymax", "cell")
    if len(ids) == 0:
        return pa.table({k: pa.array([], pa.int64()) for k in cols})
    cx0, cy0 = x0 // cell_size, y0 // cell_size
    cx1, cy1 = (x1 - 1) // cell_size, (y1 - 1) // cell_size
    nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
    k = nx * ny
    row = np.repeat(np.arange(len(ids), dtype=np.int64), k)
    starts = np.concatenate(([0], np.cumsum(k)[:-1]))
    j = np.arange(int(k.sum()), dtype=np.int64) - starts[row]
    gx = cx0[row] + j // ny[row]
    gy = cy0[row] + j % ny[row]
    return pa.table(
        {
            id_col: pa.array(ids[row], pa.int64()),
            "xmin": pa.array(x0[row], pa.int64()),
            "ymin": pa.array(y0[row], pa.int64()),
            "xmax": pa.array(x1[row], pa.int64()),
            "ymax": pa.array(y1[row], pa.int64()),
            "cell": pa.array(gx << 32 | gy, pa.int64()),
        }
    )


def bbox_self_join(rects_ds, cell_size: int, id_col: str = "id"):
    """Dataset[(id, xmin, ymin, xmax, ymax) int64] -> (id_a, id_b) pairs
    whose rectangles strictly overlap, each pair exactly once.

    Coordinates must be non-negative (the cell key packs (gx, gy) into
    one int64 as gx<<32|gy); shift inputs before joining otherwise.
    Partitioning assumption: one cell's rectangles fit a worker — size
    ``cell_size`` to the data density, and note a rect spanning many
    cells fans out one thin row per cell (the PBSM trade)."""
    import numpy as np
    import pyarrow as pa

    tagged = rects_ds.map_batches(
        lambda b: _bbox_to_cells(b, cell_size, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def overlap_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
        n = len(group)
        if n < 2:
            return empty
        cell = int(group["cell"][0].as_py())
        cgx, cgy = cell >> 32, cell & 0xFFFFFFFF
        ids = group[id_col].to_numpy(zero_copy_only=False)
        x0 = group["xmin"].to_numpy(zero_copy_only=False)
        y0 = group["ymin"].to_numpy(zero_copy_only=False)
        x1 = group["xmax"].to_numpy(zero_copy_only=False)
        y1 = group["ymax"].to_numpy(zero_copy_only=False)
        ia, ib = np.triu_indices(n, k=1)
        hit = (
            (x0[ia] < x1[ib]) & (x0[ib] < x1[ia])
            & (y0[ia] < y1[ib]) & (y0[ib] < y1[ia])
            & (ids[ia] != ids[ib])
        )
        ia, ib = ia[hit], ib[hit]
        if len(ia) == 0:
            return empty
        # canonical-cell report: intersection's lower-left corner here?
        corner_x = np.maximum(x0[ia], x0[ib]) // cell_size
        corner_y = np.maximum(y0[ia], y0[ib]) // cell_size
        mine = (corner_x == cgx) & (corner_y == cgy)
        ia, ib = ia[mine], ib[mine]
        if len(ia) == 0:
            return empty
        a, b = ids[ia], ids[ib]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        order = np.lexsort((hi, lo))
        return pa.table(
            {
                "id_a": pa.array(lo[order], pa.int64()),
                "id_b": pa.array(hi[order], pa.int64()),
            }
        )

    return (
        tagged.groupby("cell")
        .map_groups(overlap_pairs, batch_format="pyarrow")
        .sort(["id_a", "id_b"])
    )


def bbox_join(left_ds, right_ds, cell_size: int, id_col: str = "id"):
    """Two-table bbox spatial join: (left_id, right_id) for every
    strictly-overlapping rectangle pair — the canonical A x B form of
    ``bbox_self_join`` (same PBSM cells, same canonical-cell reporting;
    pairs are (left, right), NOT id-ordered). Both inputs carry
    (id, xmin, ymin, xmax, ymax) int64 with non-negative coords.

    Plan: tag each side, union the thin tagged cell rows (a union of
    streams, no exchange), one groupby(cell), in-cell left-vs-right
    vectorized overlap. Same partitioning assumption as the self join.
    """
    import numpy as np
    import pyarrow as pa

    def tagger(side: int):
        def tag(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "side", pa.array(np.full(len(batch), side, np.int64), pa.int64())
            )

        return tag

    # reuse the cell fanout by composing: fan out first, then tag
    def fan_and_tag(side: int):
        tag = tagger(side)

        def fn(batch: pa.Table) -> pa.Table:
            return tag(_bbox_to_cells(batch, cell_size, id_col))

        return fn

    lt = left_ds.map_batches(fan_and_tag(0), batch_format="pyarrow", zero_copy_batch=True)
    rt = right_ds.map_batches(fan_and_tag(1), batch_format="pyarrow", zero_copy_batch=True)
    tagged = lt.union(rt)

    def overlap_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"left_id": pa.array([], pa.int64()), "right_id": pa.array([], pa.int64())}
        )
        side = group["side"].to_numpy(zero_copy_only=False)
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        if len(li) == 0 or len(ri) == 0:
            return empty
        cell = int(group["cell"][0].as_py())
        cgx, cgy = cell >> 32, cell & 0xFFFFFFFF
        ids = group[id_col].to_numpy(zero_copy_only=False)
        x0 = group["xmin"].to_numpy(zero_copy_only=False)
        y0 = group["ymin"].to_numpy(zero_copy_only=False)
        x1 = group["xmax"].to_numpy(zero_copy_only=False)
        y1 = group["ymax"].to_numpy(zero_copy_only=False)
        ia, ib = np.repeat(li, len(ri)), np.tile(ri, len(li))
        hit = (
            (x0[ia] < x1[ib]) & (x0[ib] < x1[ia])
            & (y0[ia] < y1[ib]) & (y0[ib] < y1[ia])
        )
        ia, ib = ia[hit], ib[hit]
        if len(ia) == 0:
            return empty
        corner_x = np.maximum(x0[ia], x0[ib]) // cell_size
        corner_y = np.maximum(y0[ia], y0[ib]) // cell_size
        mine = (corner_x == cgx) & (corner_y == cgy)
        ia, ib = ia[mine], ib[mine]
        if len(ia) == 0:
            return empty
        order = np.lexsort((ids[ib], ids[ia]))
        return pa.table(
            {
                "left_id": pa.array(ids[ia][order], pa.int64()),
                "right_id": pa.array(ids[ib][order], pa.int64()),
            }
        )

    return (
        tagged.groupby("cell")
        .map_groups(overlap_pairs, batch_format="pyarrow")
        .sort(["left_id", "right_id"])
    )


def bbox_join_area(left_ds, right_ds, cell_size: int, id_col: str = "id"):
    """Per-left-rect TOTAL intersection area with the right set — the
    spatial-aggregate composition of :func:`bbox_join`.

    Instead of canonical-cell pair dedup, each cell contributes the area
    of (intersection CLIPPED to the cell): clipped areas are DISJOINT
    across cells and sum to the full intersection area, so the aggregate
    is distributive and needs no duplicate elimination at all — per-cell
    integer partials -> one groupby(left_id) sum. Left rects with no
    overlap are absent from the result (join semantics; left-outer by
    unioning zero rows is a caller concern).
    """
    import numpy as np
    import pyarrow as pa

    def fan(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = _bbox_to_cells(batch, cell_size, id_col)
            return t.append_column(
                "side", pa.array(np.full(len(t), side, np.int64), pa.int64())
            )

        return fn

    lt = left_ds.map_batches(fan(0), batch_format="pyarrow", zero_copy_batch=True)
    rt = right_ds.map_batches(fan(1), batch_format="pyarrow", zero_copy_batch=True)
    tagged = lt.union(rt)

    def cell_partials(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"left_id": pa.array([], pa.int64()), "area": pa.array([], pa.int64())}
        )
        side = group["side"].to_numpy(zero_copy_only=False)
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        if len(li) == 0 or len(ri) == 0:
            return empty
        cell = int(group["cell"][0].as_py())
        cgx, cgy = cell >> 32, cell & 0xFFFFFFFF
        cx0, cy0 = cgx * cell_size, cgy * cell_size
        cx1, cy1 = cx0 + cell_size, cy0 + cell_size
        ids = group[id_col].to_numpy(zero_copy_only=False)
        x0 = group["xmin"].to_numpy(zero_copy_only=False)
        y0 = group["ymin"].to_numpy(zero_copy_only=False)
        x1 = group["xmax"].to_numpy(zero_copy_only=False)
        y1 = group["ymax"].to_numpy(zero_copy_only=False)
        ia, ib = np.repeat(li, len(ri)), np.tile(ri, len(li))
        # intersection clipped to this cell (disjoint across cells)
        ix0 = np.maximum(np.maximum(x0[ia], x0[ib]), cx0)
        iy0 = np.maximum(np.maximum(y0[ia], y0[ib]), cy0)
        ix1 = np.minimum(np.minimum(x1[ia], x1[ib]), cx1)
        iy1 = np.minimum(np.minimum(y1[ia], y1[ib]), cy1)
        w = ix1 - ix0
        h = iy1 - iy0
        hit = (w > 0) & (h > 0)
        if not hit.any():
            return empty
        lids = ids[ia[hit]]
        areas = (w[hit] * h[hit]).astype(np.int64)
        ul, inv = np.unique(lids, return_inverse=True)
        sums = np.zeros(len(ul), np.int64)
        np.add.at(sums, inv, areas)
        return pa.table(
            {"left_id": pa.array(ul, pa.int64()), "area": pa.array(sums, pa.int64())}
        )

    partials = tagged.groupby("cell").map_groups(cell_partials, batch_format="pyarrow")
    return (
        partials.groupby("left_id")
        .sum("area")
        .rename_columns({"sum(area)": "area"})
        .sort("left_id")
    )
