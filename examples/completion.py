"""Generative shape completion (reference: examples/completion.py).

Trains the CompletionNet to reconstruct a full synthetic shape from a
partial crop — exercising generative transposed convolutions, per-level
pruning classifiers, and target-key supervision.

Run: python examples/completion.py
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
from minkowskiengine_tpu.models import CompletionNet


def make_shape(res=32, seed=0):
    """A synthetic dense-ish shape (sphere shell) and a partial crop of it."""
    rng = np.random.RandomState(seed)
    g = np.stack(np.meshgrid(*[np.arange(res)] * 3, indexing="ij"), -1)
    center = res / 2
    r = np.linalg.norm(g - center, axis=-1)
    shell = np.argwhere((r > res * 0.3) & (r < res * 0.38))
    full = np.concatenate(
        [np.zeros((len(shell), 1), np.int64), shell], axis=1
    ).astype(np.int32)
    partial = full[full[:, 1] < center]  # crop half the shape
    return full, partial


def main():
    full, partial = make_shape()
    print(f"full shape: {len(full)} voxels, partial input: {len(partial)}")

    mgr = ME.CoordinateManager(D=3)
    sin = ME.SparseTensor(
        np.ones((len(partial), 1), np.float32), partial, coordinate_manager=mgr
    )
    target_key, _ = mgr.insert_and_map(full, 1)

    net = CompletionNet(
        resolution=32,
        enc_channels=(8, 16, 16, 32, 32, 64, 64),
        dec_channels=(8, 16, 16, 32, 32, 64, 64),
        rngs=nnx.Rngs(0),
    )
    optimizer = nnx.Optimizer(net, optax.adam(1e-3), wrt=nnx.Param)

    def loss_fn(model):
        out_cls, targets, _ = model(sin, target_key)
        loss = 0.0
        for cls, tgt in zip(out_cls, targets):
            logits = cls.F[:, 0]
            labels = tgt.astype(jnp.float32)
            loss = loss + optax.sigmoid_binary_cross_entropy(
                logits, labels
            ).mean()
        return loss / len(out_cls)

    for step in range(5):
        loss, grads = nnx.value_and_grad(loss_fn)(net)
        optimizer.update(net, grads)
        print(f"step {step}: bce {float(loss):.4f}")

    net.eval()
    _, _, completed = net(sin, target_key)
    print(f"completed shape: {completed.size} voxels at stride "
          f"{completed.tensor_stride}")


if __name__ == "__main__":
    main()
