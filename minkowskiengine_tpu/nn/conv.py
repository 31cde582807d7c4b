"""Convolution modules.

Re-designs reference MinkowskiEngine/MinkowskiConvolution.py:204-634 and
MinkowskiChannelwiseConvolution.py on top of the dense-matching kernel maps
and the pure `sparse_conv` primitive (ops/functional.py).  There is no
autograd.Function layer: `sparse_conv` carries its own custom VJP, and the
coordinate work (out-map resolution, kernel-map build) happens in the cached
host-driven manager exactly like the reference's C++ entry points
(src/convolution_cpu.cpp:70-117, src/convolution_transpose_cpu.cpp:70-110).
"""

from __future__ import annotations

import math
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..coords.manager import CoordinateManager, CoordinateMapKey
from ..kernel_generator import KernelGenerator
from ..ops import functional as F
from ..sparse_tensor import SparseTensor
from ..types import ConvolutionMode, RegionType
from .module import MinkowskiModuleBase, resolve_rngs


def _resolve_out_key(
    input: SparseTensor,
    coordinates,
    out_tensor_stride=None,
) -> Optional[CoordinateMapKey]:
    """Mirror of _get_coordinate_map_key (MinkowskiSparseTensor.py:754-783).

    Raw coordinates are inserted at the layer's OUTPUT tensor stride (the
    reference documents conv-transpose target coordinates as
    ``tensor_stride / stride`` apart, MinkowskiConvolution.py:485-490) so
    the kernel map's offset arithmetic lines up."""
    if coordinates is None:
        return None
    if isinstance(coordinates, CoordinateMapKey):
        return coordinates
    if isinstance(coordinates, SparseTensor):
        return coordinates.coordinate_map_key
    coordinates = jnp.asarray(coordinates)
    ts = out_tensor_stride if out_tensor_stride is not None else (1,) * input.D
    key, _ = input.coordinate_manager.insert_and_map(coordinates, ts)
    return key


def _expected_out_ts(in_key, kernel_generator, is_transpose):
    """Output tensor stride of a (transposed) conv/pool layer."""
    in_ts = in_key.get_tensor_stride()
    stride = kernel_generator.kernel_stride
    if is_transpose:
        return tuple(t // s for t, s in zip(in_ts, stride))
    return tuple(t * s for t, s in zip(in_ts, stride))


def _conv_out_key(
    manager: CoordinateManager,
    in_key: CoordinateMapKey,
    kernel_generator: KernelGenerator,
    is_transpose: bool,
    expand_coordinates: bool,
) -> CoordinateMapKey:
    """Create/reuse the output coordinate map.

    Non-transpose: stride (src/convolution_cpu.cpp:70-108); expand uses
    stride_region with the aligned-only filter.  Transpose: up-stride +
    stride_region with existing-map reuse
    (src/convolution_transpose_cpu.cpp:70-99).
    """
    in_ts = in_key.get_tensor_stride()
    stride = kernel_generator.kernel_stride
    if not is_transpose:
        out_ts = tuple(t * s for t, s in zip(in_ts, stride))
        if expand_coordinates:
            region = kernel_generator.get_kernel(in_ts, False)
            return manager.stride_region(
                in_key, region, out_ts, expand_coordinates=True, is_transpose=False
            )
        return manager.stride(in_key, stride)
    # transpose
    for t, s in zip(in_ts, stride):
        if t % s != 0:
            raise ValueError(
                f"Invalid up stride {stride} for tensor stride {in_ts}"
            )
    out_ts = tuple(t // s for t, s in zip(in_ts, stride))
    region = kernel_generator.get_kernel(in_ts, True)
    return manager.stride_region(
        in_key,
        region,
        out_ts,
        expand_coordinates=expand_coordinates,
        is_transpose=True,
    )


class MinkowskiConvolutionBase(MinkowskiModuleBase):
    """Shared logic of conv / transposed conv / generative transposed conv."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size=-1,
        stride=1,
        dilation=1,
        bias: bool = False,
        kernel_generator: Optional[KernelGenerator] = None,
        is_transpose: bool = False,
        expand_coordinates: bool = False,
        convolution_mode: ConvolutionMode = ConvolutionMode.DEFAULT,
        dimension: int = -1,
        rngs: Optional[nnx.Rngs] = None,
    ):
        if dimension <= 0:
            raise ValueError(f"Invalid dimension {dimension}")
        if kernel_generator is None:
            kernel_generator = KernelGenerator(
                kernel_size=kernel_size,
                stride=stride,
                dilation=dilation,
                expand_coordinates=expand_coordinates,
                dimension=dimension,
            )
        else:
            kernel_generator.expand_coordinates = expand_coordinates

        self.in_channels = int(in_channels)
        self.out_channels = int(out_channels)
        self.is_transpose = bool(is_transpose)
        self.expand_coordinates = bool(expand_coordinates)
        self.kernel_generator = kernel_generator
        self.dimension = int(dimension)
        self.convolution_mode = convolution_mode

        # volume-1 stride-1 kernels collapse to a plain matmul
        # (reference: MinkowskiConvolution.py:262-285).
        self.use_mm = (
            kernel_generator.kernel_volume == 1
            and kernel_generator.requires_strided_coordinates
        )
        if self.use_mm:
            kernel_shape = (self.in_channels, self.out_channels)
        else:
            kernel_shape = (
                kernel_generator.kernel_volume,
                self.in_channels,
                self.out_channels,
            )

        rngs = resolve_rngs(rngs)
        # reference init (MinkowskiConvolution.py:330-339): U(-stdv, stdv),
        # stdv = 1/sqrt(fan * kernel_volume)
        fan = self.out_channels if is_transpose else self.in_channels
        stdv = 1.0 / math.sqrt(fan * kernel_generator.kernel_volume)
        self.kernel = nnx.Param(
            jax.random.uniform(
                rngs.params(), kernel_shape, jnp.float32, -stdv, stdv
            )
        )
        self.bias = (
            nnx.Param(
                jax.random.uniform(
                    rngs.params(), (1, self.out_channels), jnp.float32, -stdv, stdv
                )
            )
            if bias
            else None
        )

    def _dense_dispatch(self, input, coordinates, feats) -> bool:
        """Use the dense-grid path when it's the cheaper stride-1 strategy
        (ops/dense_conv.py).  ConvolutionMode.COPY_GEMM forces sparse."""
        from ..config import compute_dtype, spatial_execution_ctx  # noqa: F401
        from ..ops.dense_conv import dense_conv_beneficial
        from ..types import ConvolutionMode

        kg = self.kernel_generator
        if (
            spatial_execution_ctx() is not None  # halo path needs the kmap
            or coordinates is not None
            or self.is_transpose
            or self.expand_coordinates
            or not kg.requires_strided_coordinates  # stride != 1
            or kg.region_type != RegionType.HYPER_CUBE
            or jax.default_backend() != "tpu"
            or self.convolution_mode == ConvolutionMode.COPY_GEMM
        ):
            return False
        plan = input.coordinate_manager.dense_plan(input.coordinate_map_key)
        region = kg.get_kernel(
            input.coordinate_map_key.get_tensor_stride(), False
        )
        cached_km = input.coordinate_manager.peek_kernel_map(
            input.coordinate_map_key,
            input.coordinate_map_key,  # stride 1: out map == in map
            stride=kg.kernel_stride,
            kernel_size=kg.kernel_size,
            dilation=kg.kernel_dilation,
            region_type=region.region_type,
            region_offsets=(
                region.offsets
                if region.region_type == RegionType.CUSTOM
                else None
            ),
        )
        from ..ops.pallas.conv_kernel import SUB_TILE

        fs = cached_km.fwd_slab if cached_km is not None else None
        return dense_conv_beneficial(
            plan,
            input.capacity,
            kg.kernel_volume,
            self.in_channels,
            self.out_channels,
            map_cached=cached_km is not None,
            # effective one-hot contraction width: the sub-window rung
            # when two-tier windows are enabled, else the slab rung
            cached_slab_size=(
                (fs.sub_size or fs.slab_size) if fs is not None else None
            ),
            cached_sub_tiles=(
                (fs.tile // SUB_TILE if fs.sub_size else 1)
                if fs is not None else 1
            ),
            cached_ov_cap=(
                int(fs.ov_cap or 0) if fs is not None else 0
            ),
        )

    def _kernel_map(self, input: SparseTensor, out_key: CoordinateMapKey):
        kg = self.kernel_generator
        region = kg.get_kernel(
            input.coordinate_map_key.get_tensor_stride(), self.is_transpose
        )
        custom = (
            region.offsets if region.region_type == RegionType.CUSTOM else None
        )
        return input.coordinate_manager.kernel_map(
            input.coordinate_map_key,
            out_key,
            stride=kg.kernel_stride,
            kernel_size=kg.kernel_size,
            dilation=kg.kernel_dilation,
            region_type=region.region_type,
            region_offsets=custom,
            is_transpose=self.is_transpose,
            is_pool=False,
        )

    def __call__(
        self,
        input: SparseTensor,
        coordinates: Union[None, jnp.ndarray, CoordinateMapKey, SparseTensor] = None,
    ) -> SparseTensor:
        if not isinstance(input, SparseTensor):
            raise TypeError("input must be a SparseTensor")
        if input.D != self.dimension:
            raise ValueError(
                f"input dimension {input.D} != layer dimension {self.dimension}"
            )
        if input._F.shape[1] != self.in_channels:
            raise ValueError(
                f"input channels {input._F.shape[1]} != {self.in_channels}"
            )

        from ..config import compute_dtype

        feats = input.padded_features
        cdt = compute_dtype()
        if cdt is not None and feats.dtype != cdt:
            feats = feats.astype(cdt)

        if self.use_mm and coordinates is None:
            outfeat = feats @ self.kernel[...].astype(feats.dtype)
            out_key = input.coordinate_map_key
        elif self._dense_dispatch(input, coordinates, feats):
            kg = self.kernel_generator
            plan = input.coordinate_manager.dense_plan(input.coordinate_map_key)
            from ..ops.dense_conv import dense_conv

            outfeat = dense_conv(
                feats,
                self.kernel[...].astype(feats.dtype),
                plan,
                kg.kernel_size,
                kg.kernel_dilation,
            )
            out_key = input.coordinate_map_key
        else:
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
            kmap = self._kernel_map(input, out_key)
            kernel = self.kernel[...]
            if kernel.ndim == 2:  # use_mm weights but explicit out coords
                kernel = kernel[None]
            outfeat = F.sparse_conv_kmap(feats, kernel.astype(feats.dtype), kmap)
        if self.bias is not None:
            outfeat = outfeat + self.bias[...].astype(outfeat.dtype)
        return SparseTensor(
            outfeat,
            coordinate_map_key=out_key,
            coordinate_manager=input.coordinate_manager,
        )

    def __repr__(self):
        kg = self.kernel_generator
        return (
            f"{self.__class__.__name__}(in={self.in_channels}, "
            f"out={self.out_channels}, kernel_size={kg.kernel_size}, "
            f"stride={kg.kernel_stride}, dilation={kg.kernel_dilation})"
        )


class MinkowskiConvolutionFunction:
    """Functional shim mirroring the reference autograd Function
    (MinkowskiConvolution.py:42-121) for code that calls ``.apply`` directly."""

    @staticmethod
    def apply(
        input_features,
        kernel_weights,
        kernel_generator: KernelGenerator,
        convolution_mode,
        in_coordinate_map_key: CoordinateMapKey,
        out_coordinate_map_key: CoordinateMapKey,
        coordinate_manager: CoordinateManager,
    ):
        region = kernel_generator.get_kernel(
            in_coordinate_map_key.get_tensor_stride(), False
        )
        custom = (
            region.offsets if region.region_type == RegionType.CUSTOM else None
        )
        kmap = coordinate_manager.kernel_map(
            in_coordinate_map_key,
            out_coordinate_map_key,
            stride=kernel_generator.kernel_stride,
            kernel_size=kernel_generator.kernel_size,
            dilation=kernel_generator.kernel_dilation,
            region_type=region.region_type,
            region_offsets=custom,
        )
        return F.sparse_conv_kmap(input_features, kernel_weights, kmap)


class MinkowskiConvolutionTransposeFunction:
    """Transpose counterpart (MinkowskiConvolution.py:124-201)."""

    @staticmethod
    def apply(
        input_features,
        kernel_weights,
        kernel_generator: KernelGenerator,
        convolution_mode,
        in_coordinate_map_key: CoordinateMapKey,
        out_coordinate_map_key: CoordinateMapKey,
        coordinate_manager: CoordinateManager,
    ):
        region = kernel_generator.get_kernel(
            in_coordinate_map_key.get_tensor_stride(), True
        )
        custom = (
            region.offsets if region.region_type == RegionType.CUSTOM else None
        )
        kmap = coordinate_manager.kernel_map(
            in_coordinate_map_key,
            out_coordinate_map_key,
            stride=kernel_generator.kernel_stride,
            kernel_size=kernel_generator.kernel_size,
            dilation=kernel_generator.kernel_dilation,
            region_type=region.region_type,
            region_offsets=custom,
            is_transpose=True,
        )
        return F.sparse_conv_kmap(input_features, kernel_weights, kmap)


class MinkowskiConvolution(MinkowskiConvolutionBase):
    """Generalized sparse convolution (reference:
    MinkowskiConvolution.py:360-451)."""

    def __init__(
        self,
        in_channels,
        out_channels,
        kernel_size=-1,
        stride=1,
        dilation=1,
        bias=False,
        kernel_generator=None,
        expand_coordinates=False,
        convolution_mode=ConvolutionMode.DEFAULT,
        dimension=-1,
        rngs: Optional[nnx.Rngs] = None,
    ):
        super().__init__(
            in_channels,
            out_channels,
            kernel_size,
            stride,
            dilation,
            bias,
            kernel_generator,
            is_transpose=False,
            expand_coordinates=expand_coordinates,
            convolution_mode=convolution_mode,
            dimension=dimension,
            rngs=rngs,
        )


class MinkowskiConvolutionTranspose(MinkowskiConvolutionBase):
    """Transposed (upsampling) sparse convolution (reference:
    MinkowskiConvolution.py:454-536)."""

    def __init__(
        self,
        in_channels,
        out_channels,
        kernel_size=-1,
        stride=1,
        dilation=1,
        bias=False,
        kernel_generator=None,
        expand_coordinates=False,
        convolution_mode=ConvolutionMode.DEFAULT,
        dimension=-1,
        rngs: Optional[nnx.Rngs] = None,
    ):
        if kernel_generator is None:
            kernel_generator = KernelGenerator(
                kernel_size=kernel_size,
                stride=stride,
                dilation=dilation,
                is_transpose=True,
                expand_coordinates=expand_coordinates,
                dimension=dimension,
            )
        super().__init__(
            in_channels,
            out_channels,
            kernel_size,
            stride,
            dilation,
            bias,
            kernel_generator,
            is_transpose=True,
            expand_coordinates=expand_coordinates,
            convolution_mode=convolution_mode,
            dimension=dimension,
            rngs=rngs,
        )


class MinkowskiGenerativeConvolutionTranspose(MinkowskiConvolutionBase):
    """Transposed conv that always generates new coordinates (reference:
    MinkowskiConvolution.py:539-634)."""

    def __init__(
        self,
        in_channels,
        out_channels,
        kernel_size=-1,
        stride=1,
        dilation=1,
        bias=False,
        kernel_generator=None,
        convolution_mode=ConvolutionMode.DEFAULT,
        dimension=-1,
        rngs: Optional[nnx.Rngs] = None,
    ):
        if kernel_generator is None:
            kernel_generator = KernelGenerator(
                kernel_size=kernel_size,
                stride=stride,
                dilation=dilation,
                is_transpose=True,
                expand_coordinates=True,
                dimension=dimension,
            )
        super().__init__(
            in_channels,
            out_channels,
            kernel_size,
            stride,
            dilation,
            bias,
            kernel_generator,
            is_transpose=True,
            expand_coordinates=True,
            convolution_mode=convolution_mode,
            dimension=dimension,
            rngs=rngs,
        )


class MinkowskiChannelwiseConvolution(MinkowskiModuleBase):
    """Depthwise convolution (reference:
    MinkowskiChannelwiseConvolution.py:47-215).  kernel: (volume, ch)."""

    def __init__(
        self,
        in_channels: int,
        kernel_size=-1,
        stride=1,
        dilation=1,
        bias: bool = False,
        kernel_generator: Optional[KernelGenerator] = None,
        dimension: int = -1,
        rngs: Optional[nnx.Rngs] = None,
    ):
        if dimension <= 0:
            raise ValueError(f"Invalid dimension {dimension}")
        if kernel_generator is None:
            kernel_generator = KernelGenerator(
                kernel_size=kernel_size,
                stride=stride,
                dilation=dilation,
                dimension=dimension,
            )
        self.in_channels = int(in_channels)
        self.out_channels = int(in_channels)
        self.kernel_generator = kernel_generator
        self.dimension = int(dimension)
        rngs = resolve_rngs(rngs)
        stdv = 1.0 / math.sqrt(in_channels * kernel_generator.kernel_volume)
        self.kernel = nnx.Param(
            jax.random.uniform(
                rngs.params(),
                (kernel_generator.kernel_volume, in_channels),
                jnp.float32,
                -stdv,
                stdv,
            )
        )
        self.bias = (
            nnx.Param(
                jax.random.uniform(
                    rngs.params(), (1, in_channels), jnp.float32, -stdv, stdv
                )
            )
            if bias
            else None
        )

    def __call__(self, input: SparseTensor, coordinates=None) -> SparseTensor:
        out_key = _resolve_out_key(
            input,
            coordinates,
            _expected_out_ts(
                input.coordinate_map_key, self.kernel_generator, False
            ),
        )
        if out_key is None:
            out_key = input.coordinate_manager.stride(
                input.coordinate_map_key, self.kernel_generator.kernel_stride
            )
        kg = self.kernel_generator
        region = kg.get_kernel(
            input.coordinate_map_key.get_tensor_stride(), False
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
        )
        outfeat = F.channelwise_conv(
            input.padded_features, self.kernel[...], kmap.in_idx
        )
        if self.bias is not None:
            outfeat = outfeat + self.bias[...]
        return SparseTensor(
            outfeat,
            coordinate_map_key=out_key,
            coordinate_manager=input.coordinate_manager,
        )

    def __repr__(self):
        kg = self.kernel_generator
        return (
            f"{self.__class__.__name__}(in={self.in_channels}, "
            f"kernel_size={kg.kernel_size}, stride={kg.kernel_stride}, "
            f"dilation={kg.kernel_dilation})"
        )
