"""Distributed data parallelism with PER-DEVICE GEOMETRY — every device
trains on its own point cloud (reference: examples/multigpu_ddp.py — one
torch process per GPU, DistributedSampler feeding different samples,
gradient allreduce via NCCL).

TPU-native translation: there are no processes or NCCL.  Each replica's
coordinate/kernel maps are a ``Geometry`` pytree stacked along a device
axis and passed through ``shard_map`` as a sharded argument; gradients
pmean over ICI inside the same compiled program; SyncBatchNorm statistics
psum likewise.  The per-batch coordinate phase runs on host via oplog
replay with one sync per cloud.

Run (simulated 8-device CPU mesh):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multigpu_ddp.py --cpu
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import argparse
import time

import numpy as np


def make_cloud(seed, n=2000, hi=48):
    rng = np.random.RandomState(seed)
    coords = np.unique(
        np.concatenate(
            [rng.randint(0, 2, (n, 1)), rng.randint(0, hi, (n, 3))], axis=1
        ).astype(np.int32),
        axis=0,
    )
    return coords, rng.randn(len(coords), 3).astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--n_devices", type=int, default=None)
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    import minkowskiengine_tpu as ME
    from minkowskiengine_tpu.models import MinkUNet14A
    from minkowskiengine_tpu.parallel import (
        make_mesh,
        make_per_device_geometry_step,
        shard_batch,
    )

    ndev = args.n_devices or len(jax.devices())
    print(f"devices: {ndev} ({jax.devices()[0].platform})")

    # ---- model + coordinate-op recipe (one warm pass) --------------------
    c0, f0 = make_cloud(0)
    x0 = ME.SparseTensor(f0, c0)
    net = MinkUNet14A(3, 4, D=3, rngs=nnx.Rngs(0))
    _ = net(x0)
    net = ME.MinkowskiSyncBatchNorm.convert_sync_batchnorm(net)
    replayer = ME.GeometryReplayer(x0.coordinate_manager)

    mesh = make_mesh(ndev)
    optimizer = nnx.Optimizer(net, optax.sgd(1e-2), wrt=nnx.Param)

    def loss_fn(model, geo, feats, labels):
        mgr = ME.CoordinateManager.from_geometry(geo)
        xt = ME.SparseTensor(
            feats[0], coordinate_map_key=geo.entry_key,
            coordinate_manager=mgr,
        )
        logits = model(xt).padded_features
        mask = xt.valid_row_mask.astype(jnp.float32)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels[0]
        )
        return jnp.sum(losses * mask) / jnp.sum(mask)

    step = make_per_device_geometry_step(net, optimizer, loss_fn, mesh)

    # settle the capacity/slab ratchets so stacked leaf shapes agree
    for d in range(ndev):
        replayer(make_cloud(1000 + d)[0])

    # ---- training: every device gets a DIFFERENT fresh cloud per step ----
    rng = np.random.RandomState(1)
    for it in range(args.steps):
        t0 = time.perf_counter()
        geos, feats = [], []
        for d in range(ndev):  # the DistributedSampler analogue
            c, f = make_cloud(1 + it * ndev + d)
            mgr = replayer(c)
            geo = mgr.export_geometry()
            geos.append(geo)
            feats.append(np.asarray(mgr.reduce_features(geo.entry_key, f)))
        cap = feats[0].shape[0]
        stacked_geo = shard_batch(ME.stack_geometries(geos), mesh)
        feats_sh = shard_batch(jnp.asarray(np.stack(feats)), mesh)
        labels_sh = shard_batch(
            jnp.asarray(rng.randint(0, 4, (ndev, cap)).astype(np.int32)), mesh
        )
        loss = float(step(net, optimizer, stacked_geo, feats_sh, labels_sh))
        print(
            f"iter {it}: {ndev} devices x fresh geometry, "
            f"loss {loss:.4f} ({time.perf_counter()-t0:.2f}s)"
        )


if __name__ == "__main__":
    main()
