"""Point-cloud classification, ModelNet40-style: a genuine training loop
with data loading, augmentation, and held-out evaluation
(reference: examples/classification_modelnet40.py:241-441 — ModelNet40H5
dataset, CoordinateTransformation, train/eval phases with accuracy).

The real ModelNet40 HDF5 download needs network access; offline we train on
a deterministic synthetic shape dataset (8 parametric surface classes:
sphere/cube/cylinder/cone/torus/pyramid/table/cross — examples/common.py)
through the same pipeline: float coordinates -> TensorField ->
quantized SparseTensor inside the network -> global pooling -> logits.

Run: python examples/classification_modelnet40.py \
        [--network minkfcnn|minksplatfcnn|minkpointnet] [--steps 30] [--cpu]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--network",
        choices=["minkfcnn", "minksplatfcnn", "minkpointnet"],
        default="minkfcnn",
    )
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--n_points", type=int, default=512)
    parser.add_argument("--voxel_size", type=float, default=0.05)
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
    from minkowskiengine_tpu.models import (
        MinkowskiFCNN,
        MinkowskiPointNet,
        MinkowskiSplatFCNN,
    )
    from common import SHAPE_CLASSES, CoordinateTransformation, modelnet_batch

    n_classes = len(SHAPE_CLASSES)
    net_cls = {
        "minkfcnn": MinkowskiFCNN,
        "minksplatfcnn": MinkowskiSplatFCNN,
        "minkpointnet": MinkowskiPointNet,
    }[args.network]
    kwargs = {"D": 3} if args.network != "minkpointnet" else {"dimension": 3}
    net = net_cls(3, n_classes, rngs=nnx.Rngs(0), **kwargs)
    print(f"network: {args.network} | classes: {SHAPE_CLASSES}")

    # the reference's training transform (examples/classification_modelnet40.py
    # make_data_loader: CoordinateTransformation + scale/translate)
    train_transform = CoordinateTransformation()
    optimizer = nnx.Optimizer(
        net,
        optax.chain(
            optax.clip_by_global_norm(1.0), optax.adam(args.lr)
        ),
        wrt=nnx.Param,
    )

    def forward_batch(seed, transform):
        coords, feats, labels = modelnet_batch(
            args.batch_size,
            n_points=args.n_points,
            seed=seed,
            transform=transform,
            voxel_size=args.voxel_size,
        )
        tf = ME.TensorField(feats, coords)
        return tf, jnp.asarray(labels)

    def train_step(seed):
        tf, y = forward_batch(seed, train_transform)

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
        return float(loss), acc

    def evaluate(n_batches=4, seed0=10_000):
        """Held-out shapes (seeds disjoint from training).  Eager: each
        batch is fresh geometry, so the coordinate phase runs on host."""
        correct = total = 0
        for i in range(n_batches):
            tf, y = forward_batch(seed0 + i, transform=None)
            logits = net(tf)
            correct += int((jnp.argmax(logits, 1) == y).sum())
            total += int(y.shape[0])
        return correct / total

    print(f"initial held-out accuracy: {evaluate():.2%} "
          f"(chance = {1.0/n_classes:.2%})")
    t0 = time.perf_counter()
    running = []
    for step in range(args.steps):
        loss, acc = train_step(seed=step)
        running.append(acc)
        if (step + 1) % 5 == 0:
            print(
                f"step {step+1:3d}: loss {loss:.4f} | "
                f"train acc (last 5) {np.mean(running[-5:]):.2%}"
            )
    dt = time.perf_counter() - t0
    final = evaluate()
    print(
        f"trained {args.steps} steps in {dt:.1f}s "
        f"({dt/args.steps:.2f}s/step) | final held-out accuracy: {final:.2%}"
    )


if __name__ == "__main__":
    main()
