"""Point-cloud classification, ModelNet40-style
(reference: examples/classification_modelnet40.py).

MinkowskiFCNN over TensorFields on synthetic point clouds (the real
ModelNet40 download needs network access).

Run: python examples/classification_modelnet40.py [--network minkfcnn|minksplatfcnn|minkpointnet]
"""

import argparse

import numpy as np

import jax.numpy as jnp
import optax
from flax import nnx

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.models import (
    MinkowskiFCNN,
    MinkowskiPointNet,
    MinkowskiSplatFCNN,
)
from common import random_point_cloud


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--network",
        choices=["minkfcnn", "minksplatfcnn", "minkpointnet"],
        default="minkfcnn",
    )
    parser.add_argument("--steps", type=int, default=3)
    args = parser.parse_args()

    net_cls = {
        "minkfcnn": MinkowskiFCNN,
        "minksplatfcnn": MinkowskiSplatFCNN,
        "minkpointnet": MinkowskiPointNet,
    }[args.network]
    kwargs = {"D": 3} if args.network != "minkpointnet" else {"dimension": 3}
    net = net_cls(3, 40, rngs=nnx.Rngs(0), **kwargs)
    optimizer = nnx.Optimizer(net, optax.sgd(1e-2), wrt=nnx.Param)

    for step in range(args.steps):
        coords, feats, labels = random_point_cloud(
            n_points=1024, batch_size=4, seed=step
        )
        tf = ME.TensorField(feats, coords)
        y = jnp.asarray(labels)

        def loss_fn(model):
            logits = model(tf)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(net)
        optimizer.update(net, grads)
        print(f"step {step}: loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
