"""Shared cluster-topology probes for pool/partition sizing."""

from __future__ import annotations


def cluster_cpus(default: int = 4) -> int:
    """Total CPUs Ray sees, or ``default`` when Ray is not initialised.

    The single source of truth for sizing actor pools and shuffle
    partition counts — keep every "how big is the cluster" probe here so
    a future refinement (placement groups, fractional CPUs) lands once.
    """
    import ray

    try:
        return int(ray.cluster_resources().get("CPU", default))
    except Exception:  # pragma: no cover - uninitialised ray
        return default


def pool_cap(divisor: int = 1, floor: int = 1, default: int = 4) -> int:
    """Upper bound for an autoscaling actor pool: ``cpus // divisor``.

    ``divisor=1`` for the single stateful stage of a plan (the pool may
    use the whole cluster; autoscaling from min=1 means it only grows
    under backlog), ``divisor=2`` when two pools chain in one plan,
    ``divisor=4`` for plans chaining two pools ahead of a sort (the
    observed num_cpus=4 starvation case — each pool must leave room for
    the upstream read AND the downstream exchange). Never returns less
    than ``floor`` so tiny clusters still make progress.
    """
    return max(floor, cluster_cpus(default) // divisor)


def pool(divisor: int = 1, floor: int = 1, default: int = 4) -> tuple[int, int]:
    """``(1, pool_cap(...))`` — the concurrency tuple for map_batches.

    min stays 1: raising it engine-wide was tried (round 5) and STARVES
    plans that chain several pools on small clusters — with eager min
    actors from two or three stages holding every CPU slot, the read and
    exchange tasks never schedule (observed: the PQ encode+scan chain
    crawling at load 0.4 on num_cpus=4). Single-pool plans that are
    measurably hurt by Ray's slow backlog-driven upscaling (the pool runs
    ~1-3 actors on short stages regardless of width) should pass an
    explicit ``(cap // 2, cap)`` instead — see ``half_pool``."""
    return (1, pool_cap(divisor, floor, default))


def half_pool(default: int = 4) -> tuple[int, int]:
    """``(cap // 2, cap)`` — for SINGLE-pool plans only: pre-starts half
    the cluster's actors (Ray's autoscaler otherwise reacts to backlog
    over seconds and short stages finish on 1-3 actors; profiled on the
    minhash stage: 10.6 s of kernel work in 10.65 s wall at min=1) while
    the reserved half can never starve the plan's own read/sort tasks.
    Do NOT use on plans that chain pools — their min reservations add up
    to the whole cluster and deadlock scheduling (see ``pool``)."""
    cap = pool_cap(1, 1, default)
    return (max(1, cap // 2), cap)


def id_blocks_ds(ids, n_blocks: int, col: str):
    """A Dataset of int64 ids pre-split driver-side into ``n_blocks``
    contiguous blocks — the barrier-free replacement for
    ``from_arrow(one_table).repartition(n)`` on bucket/cell id lists.

    Repartition is an AllToAllOperator: even on a few-KB id table it
    holds the WHOLE plan at a barrier before the first downstream task
    can start (measured: a parallelism-invariant second or two at the
    head of every bucketed-store query — pure ramp, worst at small
    cluster sizes). The id list is O(#buckets) and already lives on the
    driver, so splitting it here costs nothing and the per-bucket tasks
    start streaming immediately. Contiguous slices keep sorted cell ids
    spatially clustered per block (tile-superblock reuse downstream).
    """
    import numpy as np
    import pyarrow as pa
    import ray.data

    arr = np.asarray(list(ids), dtype=np.int64)
    n_blocks = max(1, min(int(n_blocks), max(len(arr), 1)))
    return ray.data.from_arrow(
        [
            pa.table({col: pa.array(chunk, pa.int64())})
            for chunk in np.array_split(arr, n_blocks)
            if len(chunk)
        ]
    )
