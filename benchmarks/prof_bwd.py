"""Split the conv backward into components on real TPU: fwd kernel,
fwd outlier pass, d_feats kernel (+outlier), dW kernel (+outlier dW) for
k=3 and k=5 on the headline surface-26k cloud.  Drives VERDICT item 2
(bwd k=5 is 3.0x baseline vs 89x fwd)."""

import json
import os
import sys
import time

import numpy as np

# NOTE: do NOT use PYTHONPATH for this — setting it breaks the axon TPU
# plugin's backend discovery on this box; sys.path.insert does not.
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
    from minkowskiengine_tpu.ops.functional import (
        _outlier_apply,
        _outlier_dw,
    )
    from minkowskiengine_tpu.ops.pallas.conv_kernel import (
        sparse_conv_dw_pallas,
        sparse_conv_fwd_pallas,
    )

    sys.path.insert(0, ".")
    from bench import surface_cloud

    coords, feats = surface_cloud("26k")
    log(f"cloud: {len(coords)} voxels")
    x = ME.SparseTensor(feats, coords)
    REPS = 50
    CHAINS = 4
    out = {}

    for ks in (3, 5):
        conv = ME.MinkowskiConvolution(
            3, 32, kernel_size=ks, stride=1, dimension=3, rngs=nnx.Rngs(ks)
        )
        y = conv(x)
        km = x.coordinate_manager.kernel_map(
            x.coordinate_map_key, y.coordinate_map_key,
            kernel_size=ks, stride=1,
        )
        K = ks**3
        W = jnp.asarray(
            np.random.RandomState(ks).randn(K, 3, 32).astype(np.float32)
        ) * 0.1
        Wt = jnp.swapaxes(W, 1, 2)
        fpad = x.padded_features
        g = jnp.asarray(
            np.random.RandomState(9).randn(fpad.shape[0], 32).astype(
                np.float32
            )
        )
        fs, bs = km.fwd_slab, km.bwd_slab
        log(
            f"k={ks}: S={fs.slab_size} U={fs.union_size} sub={fs.sub_size} "
            f"ov={int(fs.ov_count) if fs.ov_count is not None else 0}"
            f"/{fs.ov_cap}  bwd: S={bs.slab_size} U={bs.union_size} "
            f"sub={bs.sub_size} "
            f"ov={int(bs.ov_count) if bs.ov_count is not None else 0}"
            f"/{bs.ov_cap}"
        )
        scales = jnp.linspace(0.5, 1.5, REPS)

        def chain(fn, a0=None, b0=None):
            a0 = fpad if a0 is None else a0
            b0 = W if b0 is None else b0

            @jax.jit
            def many(a, b):
                acc = 0.0
                for i in range(REPS):
                    acc = acc + fn(a * scales[i], b)[0, 0]
                return acc

            t = timeit(
                lambda: jax.block_until_ready(
                    [many(a0, b0) for _ in range(CHAINS)]
                )
            )
            return t / (CHAINS * REPS)

        # forward kernel alone (no outlier)
        t = chain(lambda f, w: sparse_conv_fwd_pallas(f, w, fs, km.n_out))
        out[f"k{ks}_fwd_kernel_ms"] = t * 1e3
        log(f"k={ks} fwd kernel alone: {t*1e3:.3f} ms")

        # fwd + outlier apply
        t2 = chain(
            lambda f, w: _outlier_apply(
                sparse_conv_fwd_pallas(f, w, fs, km.n_out), f, w, fs
            )
        )
        out[f"k{ks}_fwd_outlier_ms"] = (t2 - t) * 1e3
        log(f"k={ks} fwd outlier pass: {(t2-t)*1e3:.3f} ms")

        # d_feats kernel (fwd kernel on bwd slab, transposed weights)
        t3 = chain(
            lambda gg, w: sparse_conv_fwd_pallas(gg, w, bs, km.n_in),
            a0=g, b0=Wt,
        )
        out[f"k{ks}_dfeats_kernel_ms"] = t3 * 1e3
        log(f"k={ks} d_feats kernel alone: {t3*1e3:.3f} ms")

        t4 = chain(
            lambda gg, w: _outlier_apply(
                sparse_conv_fwd_pallas(gg, w, bs, km.n_in), gg, w, bs
            ),
            a0=g, b0=Wt,
        )
        out[f"k{ks}_dfeats_outlier_ms"] = (t4 - t3) * 1e3
        log(f"k={ks} d_feats outlier pass: {(t4-t3)*1e3:.3f} ms")

        # dW kernel alone
        def dw_fn(f, _w):
            return sparse_conv_dw_pallas(
                f, g, fs, (K, 3, 32), n_valid_out=km.n_out
            )[0]

        t5 = chain(dw_fn)
        out[f"k{ks}_dw_kernel_ms"] = t5 * 1e3
        log(f"k={ks} dW kernel alone: {t5*1e3:.3f} ms")

        def dw_full(f, _w):
            dw = sparse_conv_dw_pallas(
                f, g, fs, (K, 3, 32), n_valid_out=km.n_out
            )
            return _outlier_dw(dw, f, g, fs)[0]

        t6 = chain(dw_full)
        out[f"k{ks}_dw_outlier_ms"] = (t6 - t5) * 1e3
        log(f"k={ks} dW outlier pass: {(t6-t5)*1e3:.3f} ms")

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
