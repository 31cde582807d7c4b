"""Multi-chip parallelism utilities (mesh data parallelism, collectives)."""

from .data_parallel import (
    all_reduce_metrics,
    make_data_parallel_step,
    make_mesh,
    make_per_device_geometry_step,
    replicate,
    shard_batch,
)
