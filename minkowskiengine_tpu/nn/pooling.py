"""Pooling modules: local, transpose (unpooling), global, direct-map.

Re-designs reference MinkowskiEngine/MinkowskiPooling.py:113-780.  All
reductions are masked gathers / segment ops (ops/functional.py); there are
no autograd.Function shims — JAX differentiates the index-based reductions
directly, replacing the reference's hand-written backward kernels
(src/pooling_avg_kernel.cu, src/pooling_max_kernel.cu).
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp

from ..coords.manager import CoordinateMapKey
from ..kernel_generator import KernelGenerator
from ..ops import functional as F
from ..sparse_tensor import SparseTensor
from ..types import PoolingMode, RegionType
from .conv import _conv_out_key, _resolve_out_key
from .module import MinkowskiModuleBase


class MinkowskiPoolingBase(MinkowskiModuleBase):
    def __init__(
        self,
        kernel_size,
        stride=1,
        dilation=1,
        kernel_generator: Optional[KernelGenerator] = None,
        is_transpose: bool = False,
        pooling_mode: PoolingMode = PoolingMode.LOCAL_AVG_POOLING,
        dimension: int = -1,
        expand_coordinates: bool = False,
    ):
        if dimension <= 0:
            raise ValueError(f"Invalid dimension {dimension}")
        if kernel_generator is None:
            kernel_generator = KernelGenerator(
                kernel_size=kernel_size,
                stride=stride,
                dilation=dilation,
                is_transpose=is_transpose,
                expand_coordinates=expand_coordinates,
                dimension=dimension,
            )
        self.is_transpose = bool(is_transpose)
        self.kernel_generator = kernel_generator
        self.pooling_mode = pooling_mode
        self.dimension = int(dimension)
        self.expand_coordinates = bool(expand_coordinates)

    def _out_key_and_kmap(self, input: SparseTensor, coordinates):
        from .conv import _expected_out_ts

        out_key = _resolve_out_key(
            input,
            coordinates,
            _expected_out_ts(
                input.coordinate_map_key,
                self.kernel_generator,
                self.is_transpose,
            ),
        )
        if out_key is None:
            out_key = _conv_out_key(
                input.coordinate_manager,
                input.coordinate_map_key,
                self.kernel_generator,
                self.is_transpose,
                self.expand_coordinates,
            )
        kg = self.kernel_generator
        region = kg.get_kernel(
            input.coordinate_map_key.get_tensor_stride(), self.is_transpose
        )
        custom = (
            region.offsets if region.region_type == RegionType.CUSTOM else None
        )
        kmap = input.coordinate_manager.kernel_map(
            input.coordinate_map_key,
            out_key,
            stride=kg.kernel_stride,
            kernel_size=kg.kernel_size,
            dilation=kg.kernel_dilation,
            region_type=region.region_type,
            region_offsets=custom,
            is_transpose=self.is_transpose,
            is_pool=True,
        )
        return out_key, kmap

    def __call__(self, input: SparseTensor, coordinates=None) -> SparseTensor:
        out_key, kmap = self._out_key_and_kmap(input, coordinates)
        mode = self.pooling_mode
        if mode == PoolingMode.LOCAL_AVG_POOLING:
            outfeat, _ = F.local_pool_avg(input.padded_features, kmap.in_idx)
        elif mode == PoolingMode.LOCAL_SUM_POOLING:
            outfeat, _ = F.local_pool_sum(input.padded_features, kmap.in_idx)
        elif mode == PoolingMode.LOCAL_MAX_POOLING:
            outfeat = F.local_pool_max(input.padded_features, kmap.in_idx)
        else:
            raise ValueError(f"Invalid pooling mode {mode} for local pooling")
        return SparseTensor(
            outfeat,
            coordinate_map_key=out_key,
            coordinate_manager=input.coordinate_manager,
        )

    def __repr__(self):
        kg = self.kernel_generator
        return (
            f"{self.__class__.__name__}(kernel_size={kg.kernel_size}, "
            f"stride={kg.kernel_stride}, dilation={kg.kernel_dilation})"
        )


class MinkowskiAvgPooling(MinkowskiPoolingBase):
    """Average pooling over kernel neighborhoods (reference:
    MinkowskiPooling.py:195-283)."""

    def __init__(
        self,
        kernel_size=-1,
        stride=1,
        dilation=1,
        kernel_generator=None,
        dimension=None,
    ):
        super().__init__(
            kernel_size,
            stride,
            dilation,
            kernel_generator,
            is_transpose=False,
            pooling_mode=PoolingMode.LOCAL_AVG_POOLING,
            dimension=dimension,
        )


class MinkowskiSumPooling(MinkowskiPoolingBase):
    """Sum pooling (reference: MinkowskiPooling.py:284-368)."""

    def __init__(
        self,
        kernel_size,
        stride=1,
        dilation=1,
        kernel_generator=None,
        dimension=None,
    ):
        super().__init__(
            kernel_size,
            stride,
            dilation,
            kernel_generator,
            is_transpose=False,
            pooling_mode=PoolingMode.LOCAL_SUM_POOLING,
            dimension=dimension,
        )


class MinkowskiMaxPooling(MinkowskiPoolingBase):
    """Max pooling (reference: MinkowskiPooling.py:369-440)."""

    def __init__(
        self,
        kernel_size,
        stride=1,
        dilation=1,
        kernel_generator=None,
        dimension=None,
    ):
        super().__init__(
            kernel_size,
            stride,
            dilation,
            kernel_generator,
            is_transpose=False,
            pooling_mode=PoolingMode.LOCAL_MAX_POOLING,
            dimension=dimension,
        )


class MinkowskiPoolingTranspose(MinkowskiPoolingBase):
    """Unpooling: distribute features to upsampled coordinates, divided by
    the contributing count (reference: MinkowskiPooling.py:441-581)."""

    def __init__(
        self,
        kernel_size,
        stride,
        dilation=1,
        kernel_generator=None,
        expand_coordinates=False,
        dimension=None,
    ):
        super().__init__(
            kernel_size,
            stride,
            dilation,
            kernel_generator,
            is_transpose=True,
            pooling_mode=PoolingMode.LOCAL_AVG_POOLING,
            dimension=dimension,
            expand_coordinates=expand_coordinates,
        )


class MinkowskiGlobalPooling(MinkowskiModuleBase):
    """Pool every point of each batch item to the origin (reference:
    MinkowskiPooling.py:632-681)."""

    _mode_to_reduction = {
        PoolingMode.GLOBAL_SUM_POOLING_DEFAULT: "sum",
        PoolingMode.GLOBAL_AVG_POOLING_DEFAULT: "avg",
        PoolingMode.GLOBAL_MAX_POOLING_DEFAULT: "max",
        PoolingMode.GLOBAL_SUM_POOLING_KERNEL: "sum",
        PoolingMode.GLOBAL_AVG_POOLING_KERNEL: "avg",
        PoolingMode.GLOBAL_MAX_POOLING_KERNEL: "max",
        PoolingMode.GLOBAL_SUM_POOLING_PYTORCH_INDEX: "sum",
        PoolingMode.GLOBAL_AVG_POOLING_PYTORCH_INDEX: "avg",
        PoolingMode.GLOBAL_MAX_POOLING_PYTORCH_INDEX: "max",
    }

    def __init__(
        self, mode: PoolingMode = PoolingMode.GLOBAL_AVG_POOLING_PYTORCH_INDEX
    ):
        if not isinstance(mode, PoolingMode):
            raise ValueError(f"Mode must be an instance of PoolingMode, got {mode}")
        self.pooling_mode = mode

    def __call__(self, input, coordinates=None) -> SparseTensor:
        """Pool a SparseTensor — or a TensorField directly, as the
        reference allows (MinkowskiPooling.py:729-737,
        src/global_pooling_cpu.cpp:72-85) — to one row per batch item."""
        from ..tensor_field import TensorField

        if isinstance(input, TensorField):
            origin_key, origin_rows = (
                input.coordinate_manager.origin_field_map(
                    input.coordinate_field_map_key
                )
            )
        else:
            origin_key, origin_rows = input.coordinate_manager.origin_map(
                input.coordinate_map_key
            )
        num = input.coordinate_manager.capacity(origin_key)
        reduction = self._mode_to_reduction[self.pooling_mode]
        pooled, _ = F.global_pool(
            input.padded_features, origin_rows, num, reduction
        )
        return SparseTensor(
            pooled,
            coordinate_map_key=origin_key,
            coordinate_manager=input.coordinate_manager,
        )

    def __repr__(self):
        return f"{self.__class__.__name__}(mode={self.pooling_mode!s})"


class MinkowskiGlobalSumPooling(MinkowskiGlobalPooling):
    def __init__(self, mode=PoolingMode.GLOBAL_SUM_POOLING_PYTORCH_INDEX):
        super().__init__(mode=mode)


class MinkowskiGlobalAvgPooling(MinkowskiGlobalPooling):
    def __init__(self, mode=PoolingMode.GLOBAL_AVG_POOLING_PYTORCH_INDEX):
        super().__init__(mode=mode)


class MinkowskiGlobalMaxPooling(MinkowskiGlobalPooling):
    def __init__(self, mode=PoolingMode.GLOBAL_MAX_POOLING_PYTORCH_INDEX):
        super().__init__(mode=mode)


def direct_max_pool(in_map, out_map, in_feat, out_nrows: int, is_sorted=False):
    """Map-supplied max pooling (reference: src/direct_max_pool.cpp:77-196,
    MinkowskiPooling.py:752-780).

    Args:
      in_map/out_map: (M,) index pairs — in_feat[in_map[i]] contributes to
        output row out_map[i].
      out_nrows: number of output rows.
    """
    in_map = jnp.asarray(in_map, jnp.int32)
    out_map = jnp.asarray(out_map, jnp.int32)
    gathered = F.take_rows(in_feat, in_map)
    ids = jnp.where(in_map >= 0, out_map, -1)
    return F.segment_max(gathered, ids, out_nrows)


class MinkowskiDirectMaxPoolingFunction:
    """Functional shim for API parity with the reference's autograd Function."""

    @staticmethod
    def apply(in_map, out_map, in_feat, out_nrows, is_sorted=False):
        return direct_max_pool(in_map, out_map, in_feat, out_nrows, is_sorted)


class MinkowskiLocalPoolingFunction:
    """Functional shim (reference: MinkowskiPooling.py:42-110)."""

    @staticmethod
    def apply(input_features, pooling_mode, kernel_generator,
              in_coordinate_map_key, out_coordinate_map_key,
              coordinate_manager):
        kg = kernel_generator
        kmap = coordinate_manager.kernel_map(
            in_coordinate_map_key, out_coordinate_map_key,
            stride=kg.kernel_stride, kernel_size=kg.kernel_size,
            dilation=kg.kernel_dilation, is_pool=True,
        )
        if pooling_mode == PoolingMode.LOCAL_MAX_POOLING:
            return F.local_pool_max(input_features, kmap.in_idx)
        if pooling_mode == PoolingMode.LOCAL_SUM_POOLING:
            return F.local_pool_sum(input_features, kmap.in_idx)[0]
        return F.local_pool_avg(input_features, kmap.in_idx)[0]


class MinkowskiLocalPoolingTransposeFunction:
    """Functional shim (reference: MinkowskiPooling.py:441-512)."""

    @staticmethod
    def apply(input_features, pooling_mode, kernel_generator,
              in_coordinate_map_key, out_coordinate_map_key,
              coordinate_manager):
        kg = kernel_generator
        kmap = coordinate_manager.kernel_map(
            in_coordinate_map_key, out_coordinate_map_key,
            stride=kg.kernel_stride, kernel_size=kg.kernel_size,
            dilation=kg.kernel_dilation, is_transpose=True, is_pool=True,
        )
        return F.local_pool_avg(input_features, kmap.in_idx)[0]


class MinkowskiGlobalPoolingFunction:
    """Functional shim (reference: MinkowskiPooling.py:583-631)."""

    @staticmethod
    def apply(input_features, pooling_mode, in_coordinate_map_key,
              out_coordinate_map_key, coordinate_manager):
        origin_key, origin_rows = coordinate_manager.origin_map(
            in_coordinate_map_key
        )
        num = coordinate_manager.capacity(origin_key)
        red = MinkowskiGlobalPooling._mode_to_reduction.get(pooling_mode, "avg")
        return F.global_pool(input_features, origin_rows, num, red)[0]
