"""Re-measure the ref-suite conv rows (docs/benchmark.md methodology) on
the production module path at HEAD: fwd and bwd(=dW-only) for k=3/5/7 on
the headline surface-26k cloud, warm maps.  Fast (~2 min) — used to A/B
backward work without a full bench run."""

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


REF = {
    ("conv_fwd", 3): 0.093, ("conv_fwd", 5): 0.121, ("conv_fwd", 7): 0.165,
    ("conv_bwd", 3): 0.0056, ("conv_bwd", 5): 0.0149,
    ("conv_bwd", 7): 0.0312,
}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from flax import nnx

    import minkowskiengine_tpu as ME

    sys.path.insert(0, ".")
    from bench import surface_cloud

    coords, feats = surface_cloud("26k")
    log(f"cloud: {len(coords)} voxels")
    xh = ME.SparseTensor(feats, coords)
    mgr_ref = xh.coordinate_manager
    key_ref = xh.coordinate_map_key
    fpad_h = xh.padded_features
    REPS, CHAINS = 50, 4
    scales = jnp.linspace(0.5, 1.5, REPS)
    out = {}

    for ks in (3, 5, 7):
        conv_k = ME.MinkowskiConvolution(
            3, 32, kernel_size=ks, stride=1, dimension=3, rngs=nnx.Rngs(ks)
        )
        _ = conv_k(xh)  # warm maps + compile
        km = xh.coordinate_manager.kernel_map(
            key_ref, key_ref, kernel_size=ks, stride=1
        )
        fs = km.fwd_slab
        if fs is not None:
            log(
                f"k={ks}: S={fs.slab_size} U={fs.union_size} "
                f"sub={fs.sub_size} "
                f"ov={int(fs.ov_count) if fs.ov_count is not None else 0}"
                f"/{fs.ov_cap}"
            )
        gd, st = nnx.split(conv_k)

        def apply_once(f, scale, stv):
            xt = ME.SparseTensor(
                f * scale, coordinate_map_key=key_ref,
                coordinate_manager=mgr_ref,
            )
            return nnx.merge(gd, stv)(xt).padded_features[0, 0]

        @jax.jit
        def fwd_many(f, stv):
            acc = 0.0
            for i in range(REPS):
                acc = acc + apply_once(f, scales[i], stv)
            return acc

        @jax.jit
        def bwd_many(f, stv):
            return jax.grad(fwd_many, argnums=1)(f, stv)

        t_f = timeit(
            lambda: jax.block_until_ready(
                [fwd_many(fpad_h, st) for _ in range(CHAINS)]
            )
        ) / (CHAINS * REPS)
        t_fb = timeit(
            lambda: jax.block_until_ready(
                [bwd_many(fpad_h, st) for _ in range(CHAINS)]
            )
        ) / (CHAINS * REPS)
        tb = max(t_fb - t_f, 0.0)
        out[f"ref_conv_fwd_k{ks}_s"] = t_f
        out[f"ref_conv_bwd_k{ks}_s"] = tb
        log(
            f"k={ks}: fwd {t_f*1e3:.3f} ms "
            f"({REF[('conv_fwd', ks)]/t_f:.0f}x), "
            f"bwd {tb*1e3:.3f} ms "
            f"({REF[('conv_bwd', ks)]/max(tb,1e-9):.0f}x)"
        )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
