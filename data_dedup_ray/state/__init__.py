from data_dedup_ray.state.checkpoint import Checkpointer, config_hash

__all__ = ["Checkpointer", "config_hash"]
