"""Demonstrate (or refute) the bf16 capacity claim (README:55-58,
VERDICT r3 item 7): find the largest batch of ~104k-voxel clouds whose
MinkUNet34 train step fits the 16 GB v5e at bf16 vs f32.

Strategy: binary-search-free ladder — try batch sizes in increasing
order per dtype, catch the XLA OOM (RESOURCE_EXHAUSTED), report the max
that fits.  One step per size (compile + run) — capacity, not speed."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import optax
    from flax import nnx

    import minkowskiengine_tpu as ME
    from minkowskiengine_tpu.models import MinkUNet34

    sys.path.insert(0, ".")
    from bench import surface_cloud

    from minkowskiengine_tpu.utils.datasets import room_scan_voxels

    # ~104k-voxel cloud (the verdict's target size): a large room at 2cm
    coords1, feats1 = room_scan_voxels(
        voxel_size=0.02, n_points=400_000, extent=(3.2, 3.2, 2.5), seed=0
    )
    del surface_cloud
    n1 = len(coords1)
    log(f"per-cloud voxels: {n1}")

    def make_batch(b):
        cs, fs = [], []
        for i in range(b):
            c = coords1.copy()
            c[:, 0] = i
            cs.append(c)
            fs.append(feats1)
        return np.concatenate(cs), np.concatenate(fs)

    out = {}
    for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        ME.set_compute_dtype(dt)
        fit = 0
        for b in (2, 4, 6, 8, 10, 12, 16, 20):
            try:
                c, f = make_batch(b)
                x = ME.SparseTensor(f, c)
                net = MinkUNet34(3, 20, D=3, rngs=nnx.Rngs(0))
                opt = nnx.Optimizer(net, optax.sgd(1e-3), wrt=nnx.Param)
                labels = jnp.asarray(
                    np.random.RandomState(0).randint(0, 20, x.capacity)
                )

                def step(model, optimizer, xt):
                    def loss_fn(m):
                        lo = m(xt).padded_features.astype(jnp.float32)
                        return optax.softmax_cross_entropy_with_integer_labels(
                            lo, labels
                        ).mean()

                    l, grads = nnx.value_and_grad(loss_fn)(model)
                    optimizer.update(model, grads)
                    return l

                l = nnx.jit(step)(net, opt, x)
                jax.block_until_ready(l)
                log(f"{dtype_name}: batch {b} ({b*n1} voxels) fits, "
                    f"loss {float(l):.3f}")
                fit = b
                del net, opt, x
            except Exception as e:
                msg = repr(e)
                oom = "RESOURCE_EXHAUSTED" in msg or "Ran out of memory" in msg
                log(f"{dtype_name}: batch {b} {'OOM' if oom else 'FAILED'}: "
                    f"{msg[:200]}")
                break
        out[f"minkunet34_max_batch_104k_{dtype_name}"] = fit
    ME.set_compute_dtype(jnp.float32)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
