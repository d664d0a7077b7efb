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
    """``(1, pool_cap(...))`` — the concurrency tuple for map_batches."""
    return (1, pool_cap(divisor, floor, default))
