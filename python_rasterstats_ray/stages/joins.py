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
