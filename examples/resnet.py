"""Sparse ResNet classification on a point cloud.

Mirrors the reference's examples/resnet.py (which downloads a PLY and
runs ResNet on its voxels) using the procedural room-scan generator —
this environment has no network egress.  Shows the ResNet14..50 family,
voxelization from continuous points, and a classification forward with
global pooling.

Run:  python examples/resnet.py [--cpu]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax

if "--cpu" in _sys.argv:  # the axon TPU plugin ignores JAX_PLATFORMS
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from flax import nnx

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.models import ResNet14, ResNet18, ResNet34
from minkowskiengine_tpu.utils.datasets import make_room_scan


def main():
    # continuous points -> voxel coordinates (the reference quantizes a
    # downloaded PLY the same way)
    points = make_room_scan(n_points=60_000, seed=0)
    voxel_size = 0.05
    coords, inverse = ME.utils.sparse_quantize(
        np.floor(points / voxel_size).astype(np.int32),
        return_index=True,
    )
    feats = points[inverse].astype(np.float32)  # xyz as features
    bcoords = np.concatenate(
        [np.zeros((len(coords), 1), np.int32), coords], axis=1
    )
    print(f"{len(points)} points -> {len(coords)} voxels @ {voxel_size} m")

    x = ME.SparseTensor(jnp.asarray(feats), jnp.asarray(bcoords))
    for cls in (ResNet14, ResNet18, ResNet34):
        net = cls(3, 10, D=3, rngs=nnx.Rngs(0))
        net.eval_mode = True
        logits = net(x)
        print(f"{cls.__name__}: logits {np.asarray(logits.F).shape}, "
              f"argmax {int(np.asarray(logits.F).argmax())}")


if __name__ == "__main__":
    main()
