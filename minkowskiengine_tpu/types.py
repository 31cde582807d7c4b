"""Core enums and type aliases for the TPU-native Minkowski engine.

Re-expresses the reference's type system (reference: src/types.hpp:116-192) in
Python.  Several reference enums exist purely to steer CUDA memory behaviour
(allocator backends, hash-table occupancy); on TPU XLA owns memory, so those
enums are kept for API compatibility but act as no-op strategy hints.
"""

from __future__ import annotations

import enum
from typing import Sequence, Tuple, Union


class RegionType(enum.IntEnum):
    """Kernel region shapes (reference: src/types.hpp:152-156)."""

    HYPER_CUBE = 0
    HYPER_CROSS = 1
    CUSTOM = 2
    HYBRID = 3  # Python-level only; expanded to CUSTOM at region build time


class PoolingMode(enum.IntEnum):
    """Pooling reduction modes (reference: src/types.hpp:134-150)."""

    LOCAL_SUM_POOLING = 0
    LOCAL_AVG_POOLING = 1
    LOCAL_MAX_POOLING = 2
    GLOBAL_SUM_POOLING_DEFAULT = 3
    GLOBAL_AVG_POOLING_DEFAULT = 4
    GLOBAL_MAX_POOLING_DEFAULT = 5
    GLOBAL_SUM_POOLING_KERNEL = 6
    GLOBAL_AVG_POOLING_KERNEL = 7
    GLOBAL_MAX_POOLING_KERNEL = 8
    GLOBAL_SUM_POOLING_PYTORCH_INDEX = 9
    GLOBAL_AVG_POOLING_PYTORCH_INDEX = 10
    GLOBAL_MAX_POOLING_PYTORCH_INDEX = 11


class BroadcastMode(enum.IntEnum):
    """Broadcast binary ops (reference: src/types.hpp:157-162)."""

    ELEMENTWISE_ADDITON = 0  # (sic) — reference spells it this way
    ELEMENTWISE_MULTIPLICATION = 1


class MinkowskiAlgorithm(enum.IntEnum):
    """Strategy hint (reference: src/types.hpp:124-130).

    On TPU this is a no-op compatibility hint: XLA manages memory and the
    kernel-map builder always produces exact-size (padded-bucket) maps.
    """

    DEFAULT = 0
    MEMORY_EFFICIENT = 1
    SPEED_OPTIMIZED = 2


class ConvolutionMode(enum.IntEnum):
    """Conv algorithm hint (reference: src/types.hpp:164-170).

    DEFAULT lets the library choose between the XLA gather-matmul path and
    the fused Pallas kernel; the other values force a path.
    """

    DEFAULT = 0
    DIRECT_GEMM = 1  # → fused Pallas gather-GEMM kernel
    COPY_GEMM = 2  # → XLA gather → dot → accumulate path


class GPUMemoryAllocatorType(enum.IntEnum):
    """No-op on TPU (reference: src/types.hpp:116-119)."""

    PYTORCH = 0
    CUDA = 1


class CUDAKernelMapMode(enum.IntEnum):
    """No-op on TPU (reference: src/types.hpp:121-123)."""

    MEMORY_EFFICIENT = 0
    SPEED_OPTIMIZED = 1


class CoordinateMapType(enum.IntEnum):
    """Backend selector (reference: CPU/CUDA).  One XLA implementation
    serves every device here; kept for API compatibility."""

    CPU = 0
    CUDA = 1


class SparseTensorOperationMode(enum.IntEnum):
    """Coordinate-manager sharing modes (reference: MinkowskiTensor.py:33-70)."""

    SEPARATE_COORDINATE_MANAGER = 0
    SHARE_COORDINATE_MANAGER = 1


class SparseTensorQuantizationMode(enum.IntEnum):
    """Duplicate-coordinate feature reduction (reference: MinkowskiTensor.py:47-61)."""

    RANDOM_SUBSAMPLE = 0
    UNWEIGHTED_AVERAGE = 1
    UNWEIGHTED_SUM = 2
    NO_QUANTIZATION = 3
    MAX_POOL = 4
    SPLAT_LINEAR_INTERPOLATION = 5


# A coordinate map is keyed by (tensor_stride tuple, string id)
# (reference: src/types.hpp:77-78).
CoordinateMapKeyType = Tuple[Tuple[int, ...], str]

StrideLike = Union[int, Sequence[int]]


def convert_to_int_list(value: StrideLike, dimension: int):
    """Reference-API helper (MinkowskiCommon.py:39-55): int-or-sequence →
    length-D list of ints."""
    return list(as_tuple(value, dimension))


def convert_to_int_tensor(value: StrideLike, dimension: int):
    """Reference-API helper (MinkowskiCommon.py:57-74): int-or-sequence →
    length-D int32 array (torch.IntTensor → numpy here)."""
    import numpy as np

    return np.asarray(as_tuple(value, dimension), dtype=np.int32)


def as_tuple(value: StrideLike, dimension: int) -> Tuple[int, ...]:
    """Normalize an int-or-sequence stride-like argument to a D-tuple."""
    if isinstance(value, (int,)):
        return (int(value),) * dimension
    value = tuple(int(v) for v in value)
    if len(value) != dimension:
        raise ValueError(
            f"Expected a sequence of length {dimension}, got {value!r}"
        )
    return value
