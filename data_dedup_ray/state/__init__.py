from data_dedup_ray.state.checkpoint import Checkpointer, config_hash
from data_dedup_ray.state.sink import (finished_partitions,
                                       resumable_write_parquet)

__all__ = ["Checkpointer", "config_hash", "finished_partitions",
           "resumable_write_parquet"]
