"""Generative shape reconstruction from a latent code
(reference: examples/reconstruction.py).

A decoder-only generative net: a one-hot latent selects a shape class, and
the generative decoder grows the voxel shape from a single seed voxel with
per-level pruning — trained against the target occupancy.

Run: python examples/reconstruction.py
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
from minkowskiengine_tpu.models.vae import Decoder


def make_shape(res=64, kind=0, seed=0):
    g = np.stack(np.meshgrid(*[np.arange(res)] * 3, indexing="ij"), -1)
    center = res / 2
    if kind == 0:  # sphere shell
        r = np.linalg.norm(g - center, axis=-1)
        sel = (r > res * 0.28) & (r < res * 0.36)
    else:  # box shell
        d = np.abs(g - center).max(-1)
        sel = (d > res * 0.25) & (d < res * 0.32)
    coords = np.argwhere(sel)
    return np.concatenate(
        [np.zeros((len(coords), 1), np.int64), coords], axis=1
    ).astype(np.int32)


def main():
    res = 64
    target = make_shape(res, kind=0)
    print(f"target shape: {len(target)} voxels")

    mgr = ME.CoordinateManager(D=3)
    target_key, _ = mgr.insert_and_map(target, 1)

    channels = (64, 32, 32, 16, 16, 8)
    decoder = Decoder(channels, resolution=res, rngs=nnx.Rngs(0))
    optimizer = nnx.Optimizer(decoder, optax.adam(1e-3), wrt=nnx.Param)

    # seed voxel at the coarsest stride carrying the latent code
    stride0 = 2 ** (len(channels) - 1)
    seed_coords = np.array([[0, 0, 0, 0]], np.int32)
    seed_key, _ = mgr.insert_and_map(seed_coords, stride0)
    latent = np.random.RandomState(0).randn(1, channels[0]).astype(np.float32)

    def loss_fn(model):
        z = ME.SparseTensor(
            jnp.asarray(latent),
            coordinate_map_key=seed_key,
            coordinate_manager=mgr,
        )
        out_cls, targets, _ = model(z, target_key)
        loss = 0.0
        for cls, tgt in zip(out_cls, targets):
            loss = loss + optax.sigmoid_binary_cross_entropy(
                cls.F[:, 0], tgt.astype(jnp.float32)
            ).mean()
        return loss / len(out_cls)

    for step in range(5):
        loss, grads = nnx.value_and_grad(loss_fn)(decoder)
        optimizer.update(decoder, grads)
        print(f"step {step}: bce {float(loss):.4f}")

    decoder.eval()
    z = ME.SparseTensor(
        jnp.asarray(latent), coordinate_map_key=seed_key, coordinate_manager=mgr
    )
    _, _, recon = decoder(z, target_key)
    print(f"reconstructed: {recon.size} voxels at stride {recon.tensor_stride}")


if __name__ == "__main__":
    main()
