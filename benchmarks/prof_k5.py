"""A/B the k=5 (and k=7) 3->32 conv paths on the surface-26k cloud:
current dispatch, pallas slab kernel, XLA gather-scan, dense grid.
Diagnoses the round-4 k=5 regression (6.34 ms at HEAD vs 1.37 in r3)."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, warmup=2, iters=5):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from flax import nnx

    import minkowskiengine_tpu as ME
    from minkowskiengine_tpu.ops import functional as F

    sys.path.insert(0, ".")
    from bench import surface_cloud

    coords, feats = surface_cloud("26k")
    log(f"cloud: {len(coords)} voxels")
    xh = ME.SparseTensor(feats, coords)
    fpad = xh.padded_features
    REPS, CHAINS = 50, 4
    scales = jnp.linspace(0.5, 1.5, REPS)
    out = {}

    def chain(fn, *args):
        @jax.jit
        def many(f, *rest):
            acc = 0.0
            for i in range(REPS):
                acc = acc + fn(f * scales[i], *rest)[0, 0]
            return acc

        t = timeit(
            lambda: jax.block_until_ready(
                [many(fpad, *args) for _ in range(CHAINS)]
            )
        )
        return t / (CHAINS * REPS)

    ks = int(os.environ.get("PROF_KS", "5"))
    K = ks ** 3
    km = xh.coordinate_manager.kernel_map(
        xh.coordinate_map_key, xh.coordinate_map_key, kernel_size=ks, stride=1
    )
    fs = km.fwd_slab
    log(
        f"k={ks}: S={fs.slab_size} U={fs.union_size} sub={fs.sub_size} "
        f"ov={int(fs.ov_count)}/{fs.ov_cap} tile={fs.tile}"
    )
    W = jnp.asarray(
        np.random.RandomState(0).randn(K, 3, 32).astype(np.float32) * 0.1
    )

    # (a) current full pallas path w/ outliers
    t = chain(
        lambda f: F.sparse_conv_pallas(f, W, fs, km.bwd_slab, km.n_out, km.n_in)
    )
    out["pallas_full_ms"] = t * 1e3
    log(f"pallas full (kernel+outlier): {t*1e3:.3f} ms")

    # (b) XLA gather-scan path
    t = chain(lambda f: F.sparse_conv(f, W, km.in_idx, km.out_idx_t))
    out["xla_scan_ms"] = t * 1e3
    log(f"XLA gather-scan: {t*1e3:.3f} ms")

    # (b2) pallas single-tier at the same slab rung (sub disabled)
    from minkowskiengine_tpu.ops.pallas.conv_kernel import (
        build_slab_map_floored,
    )

    fs1 = build_slab_map_floored(
        km.in_idx, fs.capacity_in,
        (fs.slab_size, fs.extra_rung, max(int(fs.ov_cap), 256), 0),
        tile=fs.tile,
    )
    log(
        f"single-tier: S={fs1.slab_size} U={fs1.union_size} "
        f"sub={fs1.sub_size} ov={int(fs1.ov_count)}/{fs1.ov_cap}"
    )
    t = chain(
        lambda f: F.sparse_conv_pallas(f, W, fs1, fs1, km.n_out, km.n_out)
    )
    out["pallas_single_tier_ms"] = t * 1e3
    log(f"pallas single-tier full: {t*1e3:.3f} ms")

    # (c) dense path
    from minkowskiengine_tpu.ops import dense_conv as DC

    plan = xh.coordinate_manager.dense_plan(xh.coordinate_map_key)
    if plan is not None:
        t = chain(
            lambda f: DC.dense_conv(f, W, plan, (ks,) * 3, (1,) * 3)
        )
        out["dense_ms"] = t * 1e3
        log(f"dense grid conv (cells={plan.cells}): {t*1e3:.3f} ms")
    else:
        log("no dense plan available")

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
