"""Point-cloud classification models (ModelNet40 family).

Re-designs the models of reference examples/classification_modelnet40.py:
MinkowskiFCNN (:68-230), MinkowskiSplatFCNN (:231-258), and a minimal
MinkowskiPointNet.  Architectures (channel schedules, pooling layout,
field↔sparse hopping) match the reference.
"""

from __future__ import annotations

from flax import nnx

from ..nn.conv import MinkowskiConvolution
from ..nn.module import MinkowskiModuleBase, resolve_rngs
from ..nn.network import MinkowskiNetwork
from ..nn.nonlinearity import MinkowskiDropout, MinkowskiLeakyReLU
from ..nn.norm import MinkowskiBatchNorm
from ..nn.ops import MinkowskiLinear, MinkowskiToFeature, cat
from ..nn.pooling import (
    MinkowskiGlobalAvgPooling,
    MinkowskiGlobalMaxPooling,
    MinkowskiMaxPooling,
)
from ..tensor_field import TensorField
from .resnet import _Seq


class MinkowskiFCNN(MinkowskiNetwork):
    """Fully-convolutional classification network over a TensorField."""

    def __init__(
        self,
        in_channel: int,
        out_channel: int,
        embedding_channel: int = 1024,
        channels=(32, 48, 64, 96, 128),
        D: int = 3,
        rngs=None,
    ):
        super().__init__(D)
        rngs = resolve_rngs(rngs)
        self.channels = channels
        self.embedding_channel = embedding_channel

        def mlp_block(cin, cout):
            return _Seq(
                MinkowskiLinear(cin, cout, bias=False, rngs=rngs),
                MinkowskiBatchNorm(cout),
                MinkowskiLeakyReLU(),
            )

        def conv_block(cin, cout, kernel_size, stride):
            return _Seq(
                MinkowskiConvolution(
                    cin,
                    cout,
                    kernel_size=kernel_size,
                    stride=stride,
                    dimension=D,
                    rngs=rngs,
                ),
                MinkowskiBatchNorm(cout),
                MinkowskiLeakyReLU(),
            )

        self.mlp1 = mlp_block(in_channel, channels[0])
        self.conv1 = conv_block(channels[0], channels[1], 3, 1)
        self.conv2 = conv_block(channels[1], channels[2], 3, 2)
        self.conv3 = conv_block(channels[2], channels[3], 3, 2)
        self.conv4 = conv_block(channels[3], channels[4], 3, 2)
        self.conv5 = _Seq(
            conv_block(
                channels[1] + channels[2] + channels[3] + channels[4],
                embedding_channel // 4,
                3,
                2,
            ),
            conv_block(embedding_channel // 4, embedding_channel // 2, 3, 2),
            conv_block(embedding_channel // 2, embedding_channel, 3, 2),
        )
        self.pool = MinkowskiMaxPooling(kernel_size=3, stride=2, dimension=D)
        self.global_max_pool = MinkowskiGlobalMaxPooling()
        self.global_avg_pool = MinkowskiGlobalAvgPooling()
        self.final = _Seq(
            mlp_block(embedding_channel * 2, 512),
            MinkowskiDropout(rngs=rngs),
            mlp_block(512, 512),
            MinkowskiLinear(512, out_channel, bias=True, rngs=rngs),
        )

    def _voxelize(self, x: TensorField):
        return x.sparse()

    def __call__(self, x: TensorField):
        x = self.mlp1(x)
        y = self._voxelize(x)

        y = self.conv1(y)
        y1 = self.pool(y)
        y = self.conv2(y1)
        y2 = self.pool(y)
        y = self.conv3(y2)
        y3 = self.pool(y)
        y = self.conv4(y3)
        y4 = self.pool(y)

        x1 = y1.slice(x)
        x2 = y2.slice(x)
        x3 = y3.slice(x)
        x4 = y4.slice(x)
        x = cat(x1, x2, x3, x4)

        y = self.conv5(x.sparse())
        z1 = self.global_max_pool(y)
        z2 = self.global_avg_pool(y)
        return self.final(cat(z1, z2)).F


class MinkowskiSplatFCNN(MinkowskiFCNN):
    """FCNN whose voxelization uses multilinear splatting
    (reference: classification_modelnet40.py:231-258)."""

    def _voxelize(self, x: TensorField):
        return x.splat()

    def __call__(self, x: TensorField):
        return super().__call__(x)


class GlobalMaxAvgPool(MinkowskiModuleBase):
    def __init__(self):
        self.global_max_pool = MinkowskiGlobalMaxPooling()
        self.global_avg_pool = MinkowskiGlobalAvgPooling()

    def __call__(self, tensor):
        x = self.global_max_pool(tensor)
        y = self.global_avg_pool(tensor)
        return cat(x, y)


class MinkowskiPointNet(MinkowskiNetwork):
    """PointNet-style per-point MLP + global pooling over a TensorField
    (reference: examples/common.py / classification_modelnet40.py
    "minkpointnet")."""

    def __init__(
        self,
        in_channel: int,
        out_channel: int,
        embedding_channel: int = 1024,
        dimension: int = 3,
        rngs=None,
    ):
        super().__init__(dimension)
        rngs = resolve_rngs(rngs)

        def block(cin, cout):
            return _Seq(
                MinkowskiLinear(cin, cout, bias=False, rngs=rngs),
                MinkowskiBatchNorm(cout),
                MinkowskiLeakyReLU(),
            )

        self.conv1 = block(in_channel, 64)
        self.conv2 = block(64, 64)
        self.conv3 = block(64, 64)
        self.conv4 = block(64, 128)
        self.conv5 = block(128, embedding_channel)
        self.max_pool = MinkowskiGlobalMaxPooling()
        self.linear1 = block(embedding_channel, 512)
        self.dp1 = MinkowskiDropout(rngs=rngs)
        self.linear2 = MinkowskiLinear(512, out_channel, bias=True, rngs=rngs)

    def __call__(self, x: TensorField):
        x = self.conv1(x)
        x = self.conv2(x)
        x = self.conv3(x)
        x = self.conv4(x)
        x = self.conv5(x)
        x = self.max_pool(x.sparse())
        x = self.linear1(x)
        x = self.dp1(x)
        return self.linear2(x).F
