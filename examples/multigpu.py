"""Multi-chip data-parallel training (reference: examples/multigpu.py and
examples/multigpu_ddp.py).

The reference bootstraps NCCL process groups and wraps the model in DDP;
here parallelism is compiled into one program: an `nnx.shard_map` over a
`jax.sharding.Mesh` with `pmean` gradient reduction and SyncBatchNorm
statistics psum'd across the mesh — no process groups, no NCCL.

Run (8 simulated devices on CPU):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/multigpu.py --cpu
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true", help="force CPU devices")
    parser.add_argument("--ngpus", type=int, default=None, help="device count")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax
    from flax import nnx

    import minkowskiengine_tpu as ME
    from minkowskiengine_tpu.models import MinkUNet14A
    from minkowskiengine_tpu.parallel import (
        make_data_parallel_step,
        make_mesh,
        shard_batch,
    )

    n_dev = args.ngpus or len(jax.devices())
    mesh = make_mesh(n_dev)
    print(f"devices: {jax.devices()[:n_dev]}")

    # shared geometry template; per-device feature/label shards
    rng = np.random.RandomState(0)
    coords = np.unique(
        np.concatenate(
            [rng.randint(0, 2, (600, 1)), rng.randint(0, 32, (600, 3))], axis=1
        ).astype(np.int32),
        axis=0,
    )
    x = ME.SparseTensor(rng.randn(len(coords), 3).astype(np.float32), coords)
    net = MinkUNet14A(3, 10, D=3, rngs=nnx.Rngs(0))
    _ = net(x)  # warm the coordinate/kernel-map caches
    net = ME.MinkowskiSyncBatchNorm.convert_sync_batchnorm(net)
    optimizer = nnx.Optimizer(net, optax.sgd(1e-2), wrt=nnx.Param)

    cap, n = x.capacity, x.size
    manager, key = x.coordinate_manager, x.coordinate_map_key

    def loss_fn(model, feats_shard, labels_shard):
        xt = ME.SparseTensor(
            feats_shard[0], coordinate_map_key=key, coordinate_manager=manager
        )
        logits = model(xt).padded_features
        mask = (jnp.arange(cap) < n).astype(jnp.float32)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels_shard[0]
        )
        return jnp.sum(losses * mask) / jnp.sum(mask)

    step = make_data_parallel_step(net, optimizer, loss_fn, mesh)

    for it in range(5):
        feats = shard_batch(
            jnp.asarray(rng.randn(n_dev, cap, 3).astype(np.float32)), mesh
        )
        labels = shard_batch(
            jnp.asarray(rng.randint(0, 10, (n_dev, cap)).astype(np.int32)), mesh
        )
        loss = step(net, optimizer, feats, labels)
        print(f"iter {it}: loss {float(loss):.4f} "
              f"(pmean over {n_dev} devices)")


if __name__ == "__main__":
    main()
