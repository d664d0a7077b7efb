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
- ``num_partitions`` sizes the aggregator pool; default = max(cpus, 8).
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
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", _DEF_PARTITIONS_MIN))
    except Exception:  # pragma: no cover - uninitialised ray
        cpus = _DEF_PARTITIONS_MIN
    return max(cpus, _DEF_PARTITIONS_MIN)


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
