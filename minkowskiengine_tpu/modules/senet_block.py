"""Squeeze-and-excitation blocks (reference:
MinkowskiEngine/modules/senet_block.py:31-129)."""

from __future__ import annotations

from typing import Optional

from flax import nnx

from ..nn.broadcast import MinkowskiBroadcastMultiplication
from ..nn.module import MinkowskiModuleBase, resolve_rngs
from ..nn.nonlinearity import MinkowskiReLU, MinkowskiSigmoid
from ..nn.ops import MinkowskiLinear
from ..nn.pooling import MinkowskiGlobalPooling
from .resnet_block import BasicBlock, Bottleneck


class SELayer(MinkowskiModuleBase):
    def __init__(self, channel: int, reduction: int = 16, D: int = -1, rngs=None):
        rngs = resolve_rngs(rngs)
        self.fc1 = MinkowskiLinear(channel, channel // reduction, rngs=rngs)
        self.relu = MinkowskiReLU()
        self.fc2 = MinkowskiLinear(channel // reduction, channel, rngs=rngs)
        self.sigmoid = MinkowskiSigmoid()
        self.pooling = MinkowskiGlobalPooling()
        self.broadcast_mul = MinkowskiBroadcastMultiplication()

    def __call__(self, x):
        y = self.pooling(x)
        y = self.sigmoid(self.fc2(self.relu(self.fc1(y))))
        return self.broadcast_mul(x, y)


class SEBasicBlock(BasicBlock):
    def __init__(
        self,
        inplanes,
        planes,
        stride=1,
        dilation=1,
        downsample=None,
        reduction=16,
        dimension=-1,
        rngs: Optional[nnx.Rngs] = None,
        **kwargs,
    ):
        super().__init__(
            inplanes,
            planes,
            stride=stride,
            dilation=dilation,
            downsample=downsample,
            dimension=dimension,
            rngs=rngs,
        )
        self.se = SELayer(planes, reduction=reduction, D=dimension, rngs=rngs)

    def __call__(self, x):
        residual = x
        out = self.relu(self.norm1(self.conv1(x)))
        out = self.se(self.norm2(self.conv2(out)))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.relu(out + residual)


class SEBottleneck(Bottleneck):
    def __init__(
        self,
        inplanes,
        planes,
        stride=1,
        dilation=1,
        downsample=None,
        dimension=3,
        reduction=16,
        rngs: Optional[nnx.Rngs] = None,
        **kwargs,
    ):
        super().__init__(
            inplanes,
            planes,
            stride=stride,
            dilation=dilation,
            downsample=downsample,
            dimension=dimension,
            rngs=rngs,
        )
        self.se = SELayer(
            planes * self.expansion, reduction=reduction, D=dimension, rngs=rngs
        )

    def __call__(self, x):
        residual = x
        out = self.relu(self.norm1(self.conv1(x)))
        out = self.relu(self.norm2(self.conv2(out)))
        out = self.se(self.norm3(self.conv3(out)))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.relu(out + residual)
