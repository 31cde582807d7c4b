"""Multi-chip parallelism utilities (mesh data/tensor parallelism)."""

from .data_parallel import (
    all_reduce_metrics,
    make_data_parallel_step,
    make_mesh,
    make_per_device_geometry_step,
    replicate,
    shard_batch,
)
from .tensor_parallel import apply_tensor_parallelism, make_tp_mesh
