"""Small shared helpers."""

from __future__ import annotations


def autoscale_pool(lo: int = 1, cap: int = 64) -> tuple[int, int]:
    """Default actor-pool ``concurrency`` bounds: scale with the cluster.

    A fixed cap (the old ``(1, 8)``) silently serializes stateful stages on
    bigger clusters — the 8→32-cpu scaling efficiency measured 0.43 before
    this change.  The max is the cluster CPU count (bounded by ``cap``);
    Ray's autoscaling actor pool only spawns what the queue warrants, so a
    generous max costs nothing on small clusters."""
    import ray

    n = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (lo, max(4, min(cap, n)))
