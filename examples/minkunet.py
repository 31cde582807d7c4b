"""MinkUNet semantic segmentation on a synthetic scene
(reference: examples/minkunet.py / examples/indoor.py).

Run: python examples/minkunet.py
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
from minkowskiengine_tpu.models import MinkUNet34C
from common import random_scene


def main():
    coords, feats, labels = random_scene(n_points=8000, batch_size=2)
    net = MinkUNet34C(3, 20, D=3, rngs=nnx.Rngs(0))
    optimizer = nnx.Optimizer(net, optax.adam(1e-3), wrt=nnx.Param)

    x = ME.SparseTensor(feats, coords)
    y = jnp.asarray(labels[: x.size])
    cap, n = x.capacity, x.size

    def loss_fn(model):
        logits = model(x).padded_features
        mask = (jnp.arange(cap) < n).astype(jnp.float32)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.pad(y, (0, cap - n))
        )
        return jnp.sum(losses * mask) / jnp.sum(mask)

    for step in range(5):
        loss, grads = nnx.value_and_grad(loss_fn)(net)
        optimizer.update(net, grads)
        print(f"step {step}: loss {float(loss):.4f}")

    out = net(x)
    pred = np.asarray(jnp.argmax(out.F, axis=1))
    acc = float((pred == labels[: x.size]).mean())
    print(f"final voxel accuracy vs random labels: {acc:.3f}")


if __name__ == "__main__":
    main()
