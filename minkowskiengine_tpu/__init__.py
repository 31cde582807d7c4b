"""minkowskiengine_tpu — a TPU-native spatially-sparse tensor framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
NVIDIA/MinkowskiEngine (generalized sparse convolution networks over
COO-format sparse tensors) for TPU hardware.
"""

__version__ = "0.1.0"

from .kernel_generator import (
    KernelGenerator,
    KernelRegion,
    convert_region_type,
    get_kernel_volume,
)
from .types import (
    convert_to_int_list,
    convert_to_int_tensor,
    BroadcastMode,
    ConvolutionMode,
    CUDAKernelMapMode,
    GPUMemoryAllocatorType,
    MinkowskiAlgorithm,
    PoolingMode,
    RegionType,
    CoordinateMapType,
    SparseTensorOperationMode,
    SparseTensorQuantizationMode,
)
from .coords import (
    CoordinateManager,
    CoordinateMap,
    CoordinateMapKey,
    Geometry,
    CompiledReplayer,
    GeometryReplayer,
    KernelMap,
    stack_geometries,
)

CoordsManager = CoordinateManager  # legacy v0.4 alias (reference keeps it)
from .coords.manager import (
    set_coordinate_map_type,
    set_gpu_allocator,
    set_memory_manager_backend,
)
from .tensor import (
    clear_global_coordinate_manager,
    global_coordinate_manager,
    set_global_coordinate_manager,
    set_sparse_tensor_operation_mode,
    sparse_tensor_operation_mode,
)
from .sparse_tensor import SparseTensor
from .tensor_field import TensorField
from .nn import *  # noqa: F401,F403 — the reference exports all modules flat
from .nn import functional as MinkowskiFunctional
from .nn.ops import _sum  # reference exports this name
from .nn.ops import _sum as sum  # noqa: A001 — reference: `_sum as sum`
from .nn.norm import MinkowskiInstanceNormFunction
from .nn.pruning import MinkowskiPruningFunction
from .nn.union import MinkowskiUnionFunction
from . import utils

# `from .nn import *` above shadowed the `ops` SUBPACKAGE attribute with the
# `nn.ops` module (and `from . import ops` would keep the stale attribute
# since the submodule is already in sys.modules) — re-bind it explicitly so
# `ME.ops` / `import minkowskiengine_tpu.ops.x as y` resolve to the package.
import sys as _sys

ops = _sys.modules[__name__ + ".ops"]
from .sparse_matrix_functions import (
    MinkowskiSPMMAverageFunction,
    MinkowskiSPMMFunction,
    spmm,
    spmm_average,
)
from .diagnostics import (
    cuda_version,
    cudart_version,
    get_gpu_memory_info,
    is_cuda_available,
    print_diagnostics,
)
from .config import (
    compute_dtype,
    set_compute_dtype,
    set_spatial_execution,
    spatial_execution,
)
from . import models
from . import parallel

