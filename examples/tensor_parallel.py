"""Tensor-parallel MinkUNet inference over a device mesh.

Beyond-reference capability: the reference's multi-GPU story is data
parallelism only (examples/multigpu_ddp.py); there is no way to split one
model's layers across GPUs.  Here the conv GEMM weights are column-sharded
across a ``"model"`` mesh axis (Megatron-style) and XLA's GSPMD partitioner
compiles the collectives — see minkowskiengine_tpu/parallel/tensor_parallel.py.

Run (any machine — uses an 8-virtual-device CPU mesh off-TPU):

    python examples/tensor_parallel.py --cpu
"""

import argparse
import os
import time

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force 8-device CPU mesh")
    ap.add_argument("--tp", type=int, default=0, help="model-axis size (0 = all devices)")
    args = ap.parse_args()

    if args.cpu or os.environ.get("JAX_PLATFORMS") == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import numpy as np
    import jax.numpy as jnp
    from flax import nnx

    import minkowskiengine_tpu as ME
    from minkowskiengine_tpu.models import MinkUNet14A
    from minkowskiengine_tpu.parallel import apply_tensor_parallelism, make_tp_mesh

    tp = args.tp or len(jax.devices())
    mesh = make_tp_mesh(tp=tp)
    print(f"mesh: {mesh.shape} over {len(jax.devices())} {jax.devices()[0].platform} devices")

    rng = np.random.RandomState(0)
    coords = np.unique(
        np.concatenate(
            [rng.randint(0, 2, (2000, 1)), rng.randint(0, 32, (2000, 3))], axis=1
        ).astype(np.int32),
        axis=0,
    )
    feats = rng.randn(len(coords), 3).astype(np.float32)

    x = ME.SparseTensor(feats, coords)
    net = MinkUNet14A(3, 8, D=3, rngs=nnx.Rngs(0))
    net.eval_mode = True
    ref = np.asarray(net(x).padded_features)  # single-device reference

    apply_tensor_parallelism(net, mesh)  # shard conv GEMMs column-parallel
    mgr, key = x.coordinate_manager, x.coordinate_map_key

    @nnx.jit
    def fwd(net, f):
        xt = ME.SparseTensor(f, coordinate_map_key=key, coordinate_manager=mgr)
        return net(xt).padded_features

    t0 = time.time()
    out = np.asarray(fwd(net, x.padded_features))
    print(f"tensor-parallel forward: {out.shape} in {time.time() - t0:.2f}s (compile+run)")
    err = np.max(np.abs(out - ref))
    print(f"max |tp - single| = {err:.2e}")
    assert err < 1e-3, "tensor-parallel forward diverged"
    print("sharded conv kernel example:", net.conv0p1s1.kernel[...].sharding)
    print("OK")


if __name__ == "__main__":
    main()
