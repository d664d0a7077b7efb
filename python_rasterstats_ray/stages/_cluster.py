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
