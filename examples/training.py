"""Streaming training loop with a jitted train step + checkpointing
(reference: examples/training.py).

Demonstrates the production pattern: warm the coordinate phase once per
geometry, jit the whole train step (the feature phase is pure), stream
feature batches through it, checkpoint with orbax.

Run: python examples/training.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

if "--cpu" in _sys.argv:  # the axon TPU plugin ignores JAX_PLATFORMS
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import jax.numpy as jnp
import optax
from flax import nnx

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from common import random_scene


class SegNet(ME.MinkowskiNetwork):
    def __init__(self, rngs):
        super().__init__(3)
        self.conv1 = ME.MinkowskiConvolution(3, 32, kernel_size=3, dimension=3, rngs=rngs)
        self.bn1 = ME.MinkowskiBatchNorm(32)
        self.conv2 = ME.MinkowskiConvolution(32, 64, kernel_size=3, stride=2, dimension=3, rngs=rngs)
        self.bn2 = ME.MinkowskiBatchNorm(64)
        self.up = ME.MinkowskiConvolutionTranspose(64, 32, kernel_size=2, stride=2, dimension=3, rngs=rngs)
        self.head = ME.MinkowskiConvolution(32, 20, kernel_size=1, bias=True, dimension=3, rngs=rngs)
        self.relu = ME.MinkowskiReLU()

    def __call__(self, x):
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.up(y)
        return self.head(y)


def main():
    coords, feats, labels = random_scene(n_points=4000, batch_size=2)
    x = ME.SparseTensor(feats, coords)
    net = SegNet(nnx.Rngs(0))
    _ = net(x)  # warm the coordinate phase (cached per geometry)
    optimizer = nnx.Optimizer(net, optax.adam(1e-3), wrt=nnx.Param)

    cap, n = x.capacity, x.size
    mgr, key = x.coordinate_manager, x.coordinate_map_key
    y = jnp.pad(jnp.asarray(labels[:n]), (0, cap - n))

    @nnx.jit  # the whole step compiles once; no host sync inside
    def train_step(model, optimizer, feats_padded, labels_padded):
        def loss_fn(m):
            xt = ME.SparseTensor(
                feats_padded, coordinate_map_key=key, coordinate_manager=mgr
            )
            logits = m(xt).padded_features
            mask = (jnp.arange(cap) < n).astype(jnp.float32)
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels_padded
            )
            return jnp.sum(losses * mask) / jnp.sum(mask)

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    rng = np.random.RandomState(0)
    for step in range(8):
        # stream new features over the same geometry (e.g. augmentations)
        fb = x.padded_features * (1.0 + 0.05 * rng.randn())
        loss = train_step(net, optimizer, fb, y)
        print(f"step {step}: loss {float(loss):.4f}")

    path = save_checkpoint("/tmp/me_tpu_training_ckpt", net)
    print(f"checkpointed to {path}")
    net2 = SegNet(nnx.Rngs(99))
    load_checkpoint(path, net2)
    print("restored — logits equal:",
          bool(jnp.allclose(net2(x).F, net(x).F, atol=1e-6)))


if __name__ == "__main__":
    main()
