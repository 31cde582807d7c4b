"""Spatially sharded convolution: ONE cloud split across the device mesh.

Data parallelism replicates the model and splits the BATCH; this splits
the rows of a single large point cloud, so clouds beyond one chip's HBM
become trainable.  Canonical key order makes each device's row range a
contiguous spatial slab, and a narrow halo band exchanged with mesh
neighbors (one `ppermute` hop riding the ICI ring) covers every kernel
offset's reach.  The reference has no analogue (its multi-GPU utilities
replicate whole samples).

Run on CPU with 8 simulated devices:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/spatial_sharding.py --cpu
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax

if "--cpu" in _sys.argv:
    # the axon TPU plugin ignores JAX_PLATFORMS; force CPU explicitly so
    # the simulated 8-device mesh (XLA_FLAGS above) is actually used
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.parallel import (
    make_spatial_mesh,
    required_halo,
    shard_rows,
    spatial_conv_apply,
    spatial_global_avg,
)
from minkowskiengine_tpu.utils.datasets import room_scan_voxels


def main():
    n_dev = len(jax.devices())
    mesh = make_spatial_mesh(n_dev)
    print(f"mesh: {n_dev} devices along 'space'")

    coords, feats = room_scan_voxels(voxel_size=0.05, n_points=150_000, seed=0)
    x = ME.SparseTensor(
        jnp.asarray(feats.astype(np.float32)), jnp.asarray(coords)
    )
    mgr = x.coordinate_manager
    key = x.coordinate_map_key
    km = mgr.kernel_map(key, mgr.stride(key, 1), kernel_size=3, stride=1)
    print(f"cloud: {x.size} voxels, capacity {x.capacity}")
    hf, hb = required_halo(km, n_dev)
    print(f"measured halo: fwd {hf} rows, bwd {hb} rows "
          f"(block {x.capacity // n_dev})")

    # features live sharded: each device holds 1/n of the rows
    f = shard_rows(x.padded_features, mesh)
    W = jax.random.normal(jax.random.PRNGKey(0), (27, 3, 32), jnp.float32)

    def loss_fn(f, w):
        out, dropped = spatial_conv_apply(f, w, km, mesh=mesh)
        return jnp.sum(out * out), dropped

    (loss, dropped), (df, dw) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(f, W)
    print(f"loss {float(loss):.3f}, dropped pairs {int(dropped)} "
          "(0 = halo covered every kernel offset)")
    print("d_feats sharding:", df.sharding)
    print("dW shape:", dw.shape)

    # sharded global pooling: per-batch means without gathering rows
    coords_pad = np.asarray(x.coordinate_map.coordinates)
    valid = np.arange(x.capacity) < x.size
    bids = jnp.asarray(
        np.where(valid, coords_pad[:, 0], -1).astype(np.int32)
    )
    pooled = spatial_global_avg(f, bids, 1, mesh=mesh)
    print("global avg:", np.asarray(pooled)[0][:3])


if __name__ == "__main__":
    main()
