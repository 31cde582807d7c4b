"""PointNet via Minkowski ops, plus the dense-torch-style baseline contrast
(reference: examples/pointnet.py — PointNet as a special case of a sparse
FCNN: 1x1 "convolutions" on a TensorField + global max pool).

The reference trains on ModelNet40 HDF5 (network download); offline we use
the synthetic 8-class shape dataset with the reference's augmentation
pipeline (common.py).

Run: python examples/pointnet.py [--steps 20] [--cpu]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--n_points", type=int, default=256)
    parser.add_argument("--lr", type=float, default=3e-3)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    from common import enable_compilation_cache

    enable_compilation_cache()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax
    from flax import nnx

    import minkowskiengine_tpu as ME
    from minkowskiengine_tpu.models import MinkowskiPointNet
    from common import SHAPE_CLASSES, CoordinateTransformation, modelnet_batch

    n_classes = len(SHAPE_CLASSES)
    net = MinkowskiPointNet(
        3, n_classes, embedding_channel=256, dimension=3, rngs=nnx.Rngs(0)
    )
    print("MinkowskiPointNet: 1x1 sparse convs on a TensorField + "
          "global max pool (reference examples/pointnet.py:108-156)")

    transform = CoordinateTransformation(trans=0.1)
    optimizer = nnx.Optimizer(net, optax.adam(args.lr), wrt=nnx.Param)

    def batch(seed, train):
        coords, feats, labels = modelnet_batch(
            args.batch_size, n_points=args.n_points, seed=seed,
            transform=transform if train else None, voxel_size=0.02,
        )
        return ME.TensorField(feats, coords), jnp.asarray(labels)

    t0 = time.perf_counter()
    for step in range(args.steps):
        tf, y = batch(step, train=True)

        def loss_fn(model):
            logits = model(tf)
            return (
                optax.softmax_cross_entropy_with_integer_labels(
                    logits, y
                ).mean(),
                logits,
            )

        (loss, logits), grads = nnx.value_and_grad(loss_fn, has_aux=True)(net)
        optimizer.update(net, grads)
        acc = float((jnp.argmax(logits, 1) == y).mean())
        if (step + 1) % 5 == 0:
            print(f"step {step+1:3d}: loss {float(loss):.4f} acc {acc:.2%}")

    correct = total = 0
    for i in range(4):
        tf, y = batch(20_000 + i, train=False)
        logits = net(tf)
        correct += int((jnp.argmax(logits, 1) == y).sum())
        total += int(y.shape[0])
    print(
        f"{args.steps} steps in {time.perf_counter()-t0:.1f}s | "
        f"held-out accuracy {correct/total:.2%} "
        f"(chance {1.0/n_classes:.2%})"
    )


if __name__ == "__main__":
    main()
