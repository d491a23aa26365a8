from data_dedup_ray.engine.stage import DigestStage, REGISTRY, resolve_chain, DEFAULT_CHAIN
from data_dedup_ray.engine.cascade import dedup_cascade, count_keys_computed, count_collisions

__all__ = [
    "DigestStage",
    "REGISTRY",
    "resolve_chain",
    "DEFAULT_CHAIN",
    "dedup_cascade",
    "count_keys_computed",
    "count_collisions",
]
