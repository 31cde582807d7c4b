"""minkowskiengine_tpu — a TPU-native spatially-sparse tensor framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
NVIDIA/MinkowskiEngine (generalized sparse convolution networks over
COO-format sparse tensors) for TPU hardware.
"""

__version__ = "0.1.0"

from .kernel_generator import KernelGenerator, KernelRegion
from .types import (
    BroadcastMode,
    ConvolutionMode,
    CUDAKernelMapMode,
    GPUMemoryAllocatorType,
    MinkowskiAlgorithm,
    PoolingMode,
    RegionType,
    SparseTensorOperationMode,
    SparseTensorQuantizationMode,
)
from .coords import CoordinateManager, CoordinateMap, CoordinateMapKey, KernelMap
