"""Basic training example (reference: examples/example.py).

A two-layer sparse ConvNet trained on random 2D data — the minimum
end-to-end slice: SparseTensor construction, convolution, BN, ReLU,
global pooling, linear head, cross-entropy, optax updates.

Run: python examples/example.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

if "--cpu" in _sys.argv:  # the axon TPU plugin ignores JAX_PLATFORMS
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import nnx

import minkowskiengine_tpu as ME
from common import data_loader


class ExampleNetwork(ME.MinkowskiNetwork):
    def __init__(self, in_feat, out_feat, D, rngs=None):
        super().__init__(D)
        rngs = rngs or nnx.Rngs(0)
        self.conv1 = ME.MinkowskiConvolution(
            in_feat, 64, kernel_size=3, stride=2, dilation=1, bias=False,
            dimension=D, rngs=rngs,
        )
        self.bn1 = ME.MinkowskiBatchNorm(64)
        self.relu1 = ME.MinkowskiReLU()
        self.conv2 = ME.MinkowskiConvolution(
            64, 128, kernel_size=3, stride=2, dimension=D, rngs=rngs
        )
        self.bn2 = ME.MinkowskiBatchNorm(128)
        self.relu2 = ME.MinkowskiReLU()
        self.pooling = ME.MinkowskiGlobalPooling()
        self.linear = ME.MinkowskiLinear(128, out_feat, rngs=rngs)

    def __call__(self, x):
        out = self.relu1(self.bn1(self.conv1(x)))
        out = self.relu2(self.bn2(self.conv2(out)))
        out = self.pooling(out)
        return self.linear(out)


def main():
    coords, feats, label = data_loader(nchannel=3, max_label=5, batch_size=4)
    net = ExampleNetwork(in_feat=3, out_feat=5, D=2)
    optimizer = nnx.Optimizer(net, optax.sgd(1e-1), wrt=nnx.Param)
    x = ME.SparseTensor(feats, coords)
    y = jnp.asarray(label)

    def loss_fn(model):
        logits = model(x).F
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    for step in range(10):
        loss, grads = nnx.value_and_grad(loss_fn)(net)
        optimizer.update(net, grads)
        print(f"step {step}: loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
