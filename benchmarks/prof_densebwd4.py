"""Which pairing makes the fused dense fwd+dW program 2-5x slower than
its components?  Manual compositions in ONE jit program, explicit
cotangent, k=5/7: fwd-only, fwd+filtergrad, fwd+shifted-dW,
filtergrad-only-in-loop, and the custom-VJP module path for reference."""

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

    import minkowskiengine_tpu as ME
    from minkowskiengine_tpu.ops import dense_conv as DC

    sys.path.insert(0, ".")
    from bench import surface_cloud

    coords, feats = surface_cloud("26k")
    x = ME.SparseTensor(feats, coords)
    plan = x.coordinate_manager.dense_plan(x.coordinate_map_key)
    B = plan.grid_shape[0]
    sp = plan.grid_shape[1:]
    rng = np.random.RandomState(0)
    dense = jnp.asarray(rng.randn(B, *sp, 3).astype(np.float32))
    g = jnp.asarray(rng.randn(B, *sp, 32).astype(np.float32))
    REPS, CHAINS = 20, 4
    scales = jnp.linspace(0.5, 1.5, REPS)
    out = {}

    def run(name, many):
        manyj = jax.jit(many)
        t = timeit(
            lambda: jax.block_until_ready(
                [manyj() for _ in range(CHAINS)]
            )
        ) / (CHAINS * REPS)
        out[name + "_ms"] = t * 1e3
        log(f"{name}: {t*1e3:.3f} ms")

    for ks in (5, 7):
        kt = (ks,) * 3
        dil = (1, 1, 1)
        pad = tuple((ks // 2, ks // 2) for _ in range(3))
        w = jnp.asarray(
            rng.randn(ks, ks, ks, 3, 32).astype(np.float32)
        ) * 0.05

        def filtergrad(d, gg):
            _, vjp_w = jax.vjp(
                lambda w2: DC._raw_dense_conv(d, w2, kt, dil, pad), w
            )
            return vjp_w(gg)[0]

        def loop(body):
            def many():
                acc = 0.0
                for i in range(REPS):
                    acc = acc + body(dense * scales[i])
                return acc
            return many

        run(
            f"fwd_only_k{ks}",
            loop(lambda d: DC._raw_dense_conv(d, w, kt, dil, pad)[0, 0, 0, 0]),
        )
        run(
            f"fwd_plus_filtergrad_k{ks}",
            loop(
                lambda d: DC._raw_dense_conv(d, w, kt, dil, pad)[0, 0, 0, 0]
                + filtergrad(d, g)[0, 0, 0, 0, 0]
            ),
        )
        run(
            f"fwd_plus_shifted_k{ks}",
            loop(
                lambda d: DC._raw_dense_conv(d, w, kt, dil, pad)[0, 0, 0, 0]
                + DC._dw_shifted(d, g, kt, dil, pad)[0, 0, 0, 0, 0]
            ),
        )
        run(
            f"filtergrad_only_k{ks}",
            loop(lambda d: filtergrad(d, g)[0, 0, 0, 0, 0]),
        )

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
