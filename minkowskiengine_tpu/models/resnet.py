"""Sparse ResNet classification models (reference: examples/resnet.py:53-200).

Architecture hyperparameters (INIT_DIM, PLANES, LAYERS, block structure)
match the reference exactly; the module system is flax.nnx.
"""

from __future__ import annotations

from typing import Optional, Type

from flax import nnx

from ..modules.resnet_block import BasicBlock, Bottleneck
from ..nn.conv import MinkowskiConvolution
from ..nn.module import MinkowskiModuleBase, resolve_rngs
from ..nn.nonlinearity import MinkowskiDropout, MinkowskiGELU, MinkowskiReLU
from ..nn.norm import MinkowskiBatchNorm, MinkowskiInstanceNorm
from ..nn.ops import MinkowskiLinear
from ..nn.pooling import MinkowskiGlobalMaxPooling, MinkowskiMaxPooling


class _Seq(MinkowskiModuleBase):
    """Tiny sequential container for sparse-tensor modules."""

    def __init__(self, *layers):
        self.layers = nnx.List(list(layers))

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x

    def __iter__(self):
        return iter(self.layers)


class ResNetBase(MinkowskiModuleBase):
    BLOCK: Optional[Type] = None
    LAYERS = ()
    INIT_DIM = 64
    PLANES = (64, 128, 256, 512)

    def __init__(self, in_channels: int, out_channels: int, D: int = 3, rngs=None):
        if self.BLOCK is None:
            raise ValueError("BLOCK is not defined")
        self.D = int(D)
        rngs = resolve_rngs(rngs)
        self.network_initialization(in_channels, out_channels, D, rngs)

    def network_initialization(self, in_channels, out_channels, D, rngs):
        self.inplanes = self.INIT_DIM
        self.conv1 = _Seq(
            MinkowskiConvolution(
                in_channels, self.inplanes, kernel_size=3, stride=2,
                dimension=D, rngs=rngs,
            ),
            MinkowskiInstanceNorm(self.inplanes),
            MinkowskiReLU(),
            MinkowskiMaxPooling(kernel_size=2, stride=2, dimension=D),
        )
        self.layer1 = self._make_layer(
            self.BLOCK, self.PLANES[0], self.LAYERS[0], stride=2, rngs=rngs
        )
        self.layer2 = self._make_layer(
            self.BLOCK, self.PLANES[1], self.LAYERS[1], stride=2, rngs=rngs
        )
        self.layer3 = self._make_layer(
            self.BLOCK, self.PLANES[2], self.LAYERS[2], stride=2, rngs=rngs
        )
        self.layer4 = self._make_layer(
            self.BLOCK, self.PLANES[3], self.LAYERS[3], stride=2, rngs=rngs
        )
        self.conv5 = _Seq(
            MinkowskiDropout(),
            MinkowskiConvolution(
                self.inplanes, self.inplanes, kernel_size=3, stride=3,
                dimension=D, rngs=rngs,
            ),
            MinkowskiInstanceNorm(self.inplanes),
            MinkowskiGELU(),
        )
        self.glob_pool = MinkowskiGlobalMaxPooling()
        self.final = MinkowskiLinear(self.inplanes, out_channels, bias=True, rngs=rngs)

    def _make_layer(self, block, planes, blocks, stride=1, dilation=1,
                    bn_momentum=0.1, rngs=None):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = _Seq(
                MinkowskiConvolution(
                    self.inplanes,
                    planes * block.expansion,
                    kernel_size=1,
                    stride=stride,
                    dimension=self.D,
                    rngs=rngs,
                ),
                MinkowskiBatchNorm(planes * block.expansion),
            )
        layers = [
            block(
                self.inplanes,
                planes,
                stride=stride,
                dilation=dilation,
                downsample=downsample,
                dimension=self.D,
                rngs=rngs,
            )
        ]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(
                block(
                    self.inplanes,
                    planes,
                    stride=1,
                    dilation=dilation,
                    dimension=self.D,
                    rngs=rngs,
                )
            )
        return _Seq(*layers)

    def __call__(self, x):
        x = self.conv1(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        x = self.conv5(x)
        x = self.glob_pool(x)
        return self.final(x)


class ResNet14(ResNetBase):
    BLOCK = BasicBlock
    LAYERS = (1, 1, 1, 1)


class ResNet18(ResNetBase):
    BLOCK = BasicBlock
    LAYERS = (2, 2, 2, 2)


class ResNet34(ResNetBase):
    BLOCK = BasicBlock
    LAYERS = (3, 4, 6, 3)


class ResNet50(ResNetBase):
    BLOCK = Bottleneck
    LAYERS = (3, 4, 6, 3)


class ResNet101(ResNetBase):
    BLOCK = Bottleneck
    LAYERS = (3, 4, 23, 3)
