"""Sparse generative VAE (reference: examples/vae.py).

Run: python examples/vae.py
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
from minkowskiengine_tpu.models import VAE


def make_shape(res=64, seed=0):
    rng = np.random.RandomState(seed)
    g = np.stack(np.meshgrid(*[np.arange(res)] * 3, indexing="ij"), -1)
    center = res / 2
    r = np.linalg.norm(g - center, axis=-1)
    shell = np.argwhere((r > res * 0.28) & (r < res * 0.36))
    keep = rng.rand(len(shell)) < 0.5
    coords = np.concatenate(
        [np.zeros((keep.sum(), 1), np.int64), shell[keep]], axis=1
    ).astype(np.int32)
    return coords


def main():
    coords = make_shape()
    print(f"input shape: {len(coords)} voxels")
    mgr = ME.CoordinateManager(D=3)
    sin = ME.SparseTensor(
        np.ones((len(coords), 1), np.float32), coords, coordinate_manager=mgr
    )
    target_key, _ = mgr.insert_and_map(coords, 1)

    net = VAE(channels=(8, 16, 16, 32, 32, 64), in_nchannel=1, resolution=64,
              rngs=nnx.Rngs(0))
    optimizer = nnx.Optimizer(net, optax.adam(1e-3), wrt=nnx.Param)

    def loss_fn(model, rng_key):
        out_cls, targets, _, mean, log_var = model(sin, target_key, rng_key)
        bce = 0.0
        for cls, tgt in zip(out_cls, targets):
            bce = bce + optax.sigmoid_binary_cross_entropy(
                cls.F[:, 0], tgt.astype(jnp.float32)
            ).mean()
        kl = -0.5 * jnp.mean(
            1 + log_var.F - mean.F**2 - jnp.exp(log_var.F)
        )
        return bce / len(out_cls) + 0.1 * kl

    rng_key = jax.random.PRNGKey(0)
    for step in range(5):
        rng_key, sub = jax.random.split(rng_key)
        loss, grads = nnx.value_and_grad(loss_fn)(net, sub)
        optimizer.update(net, grads)
        print(f"step {step}: loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
