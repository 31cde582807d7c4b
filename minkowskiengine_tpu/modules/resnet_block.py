"""ResNet blocks for sparse tensors (reference:
MinkowskiEngine/modules/resnet_block.py:1-121)."""

from __future__ import annotations

from typing import Optional

from flax import nnx

from ..nn.conv import MinkowskiConvolution
from ..nn.module import MinkowskiModuleBase, resolve_rngs
from ..nn.nonlinearity import MinkowskiReLU
from ..nn.norm import MinkowskiBatchNorm


class BasicBlock(MinkowskiModuleBase):
    expansion = 1

    def __init__(
        self,
        inplanes: int,
        planes: int,
        stride: int = 1,
        dilation: int = 1,
        downsample=None,
        bn_momentum: float = 0.1,
        dimension: int = -1,
        rngs: Optional[nnx.Rngs] = None,
    ):
        if dimension <= 0:
            raise ValueError("dimension must be positive")
        rngs = resolve_rngs(rngs)
        self.conv1 = MinkowskiConvolution(
            inplanes,
            planes,
            kernel_size=3,
            stride=stride,
            dilation=dilation,
            dimension=dimension,
            rngs=rngs,
        )
        self.norm1 = MinkowskiBatchNorm(planes, momentum=bn_momentum)
        self.conv2 = MinkowskiConvolution(
            planes,
            planes,
            kernel_size=3,
            stride=1,
            dilation=dilation,
            dimension=dimension,
            rngs=rngs,
        )
        self.norm2 = MinkowskiBatchNorm(planes, momentum=bn_momentum)
        self.relu = MinkowskiReLU()
        self.downsample = downsample

    def __call__(self, x):
        residual = x
        out = self.relu(self.norm1(self.conv1(x)))
        out = self.norm2(self.conv2(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        out = out + residual
        return self.relu(out)


class Bottleneck(MinkowskiModuleBase):
    expansion = 4

    def __init__(
        self,
        inplanes: int,
        planes: int,
        stride: int = 1,
        dilation: int = 1,
        downsample=None,
        bn_momentum: float = 0.1,
        dimension: int = -1,
        rngs: Optional[nnx.Rngs] = None,
    ):
        if dimension <= 0:
            raise ValueError("dimension must be positive")
        rngs = resolve_rngs(rngs)
        self.conv1 = MinkowskiConvolution(
            inplanes, planes, kernel_size=1, dimension=dimension, rngs=rngs
        )
        self.norm1 = MinkowskiBatchNorm(planes, momentum=bn_momentum)
        self.conv2 = MinkowskiConvolution(
            planes,
            planes,
            kernel_size=3,
            stride=stride,
            dilation=dilation,
            dimension=dimension,
            rngs=rngs,
        )
        self.norm2 = MinkowskiBatchNorm(planes, momentum=bn_momentum)
        self.conv3 = MinkowskiConvolution(
            planes,
            planes * self.expansion,
            kernel_size=1,
            dimension=dimension,
            rngs=rngs,
        )
        self.norm3 = MinkowskiBatchNorm(
            planes * self.expansion, momentum=bn_momentum
        )
        self.relu = MinkowskiReLU()
        self.downsample = downsample

    def __call__(self, x):
        residual = x
        out = self.relu(self.norm1(self.conv1(x)))
        out = self.relu(self.norm2(self.conv2(out)))
        out = self.norm3(self.conv3(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        out = out + residual
        return self.relu(out)
