"""TPU-native coordinate engine: packed keys, sorted maps, dense kernel maps."""

from .kernel_map import KernelMap, build_kernel_map, build_stride_map
from .manager import CoordinateFieldMap, CoordinateManager, CoordinateMapKey
from .map import CoordinateMap, bucket_capacity
from .geometry import (
    Geometry,
    CompiledReplayer,
    GeometryReplayer,
    index_geometry,
    squeeze_geometry,
    stack_geometries,
)

__all__ = [
    "CoordinateFieldMap",
    "CoordinateManager",
    "CoordinateMap",
    "CoordinateMapKey",
    "KernelMap",
    "build_kernel_map",
    "build_stride_map",
    "bucket_capacity",
    "Geometry",
    "CompiledReplayer",
    "GeometryReplayer",
    "index_geometry",
    "squeeze_geometry",
    "stack_geometries",
]
