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


def scratch_dir(name: str, sf_dir: str, *, wipe: bool = True) -> str:
    """Per-run scratch path for a derived on-disk store (fingerprint /
    signature / chunk stores the driver queries rebuild).  Keyed by the
    FULL input path (md5, not basename — two corpora sharing a basename
    must not collide) and the owning pid (two concurrent driver sessions
    on the same corpus must not race each other's rmtree+rebuild).
    ``wipe`` clears stale content from a previous run of THIS pid."""
    import hashlib
    import os
    import shutil

    key = hashlib.md5(
        os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    path = f"/tmp/dedup_{name}_{key}_{os.getpid()}"
    if wipe:
        shutil.rmtree(path, ignore_errors=True)
    return path


#: per-worker-process stage instance cache (see ``stage_task``)
_WORKER_STAGE_CACHE: dict = {}


def stage_task(cls, /, **kwargs):
    """A task-pool UDF that builds ``cls(**kwargs)`` ONCE per worker process.

    For stateful stages whose state is deterministic and cheap to build
    (hash permutation tables, compiled regexes — microseconds), an actor
    pool pays seconds of actor-spawn latency per stage for no benefit:
    Ray reuses task worker processes across stages and sessions, so a
    module-level cache gives the same build-once-per-worker behavior with
    zero spawn cost and better streaming-executor pipelining.  Stages with
    genuinely expensive state (model weights, codecs — see
    stages/multimodal.py) should stay actor pools via
    ``map_batches(Cls, concurrency=autoscale_pool())``.
    """
    # repr-based key: process-local cache, so repr stability within one
    # worker process is all that's needed (covers unhashable kwargs like
    # stage lists / ObjectRefs)
    key = (cls.__module__, cls.__qualname__,
           repr(sorted(kwargs.items(), key=lambda kv: kv[0])))

    def fn(batch):
        inst = _WORKER_STAGE_CACHE.get(key)
        if inst is None:
            if len(_WORKER_STAGE_CACHE) >= 64:
                # long-lived workers see many runs (each with fresh
                # broadcast refs in the key) — drop stale instances
                _WORKER_STAGE_CACHE.clear()
            inst = _WORKER_STAGE_CACHE.setdefault(key, cls(**kwargs))
        return inst(batch)

    fn.__name__ = fn.__qualname__ = f"stage:{cls.__name__}"
    return fn
