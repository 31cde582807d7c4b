"""Time the dense-path dW variants on the surface-26k room grid:
shifted-slice GEMMs vs patches GEMM vs XLA filter-grad, k=5 and k=7
(3->32).  Drives VERDICT item 2 (conv bwd rows)."""

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
    log(f"cells={plan.cells} grid={plan.grid_shape}")
    B = plan.grid_shape[0]
    sp = plan.grid_shape[1:]
    rng = np.random.RandomState(0)
    dense = jnp.asarray(rng.randn(B, *sp, 3).astype(np.float32))
    REPS, CHAINS = 20, 4
    scales = jnp.linspace(0.5, 1.5, REPS)
    out = {}

    for ks in (5, 7):
        kt = (ks,) * 3
        dil = (1, 1, 1)
        pad = tuple((ks // 2, ks // 2) for _ in range(3))
        g = jnp.asarray(rng.randn(B, *sp, 32).astype(np.float32))

        for name, fn in (
            ("shifted", DC._dw_shifted),
            ("patches", DC._dw_patches),
        ):
            @jax.jit
            def many(d, gg, fn=fn):
                acc = 0.0
                for i in range(REPS):
                    acc = acc + fn(d * scales[i], gg, kt, dil, pad)[0, 0, 0, 0]
                return acc

            t = timeit(
                lambda: jax.block_until_ready(
                    [many(dense, g) for _ in range(CHAINS)]
                )
            ) / (CHAINS * REPS)
            out[f"k{ks}_dw_{name}_ms"] = t * 1e3
            log(f"k={ks} dW {name}: {t*1e3:.3f} ms")

        w = jnp.asarray(rng.randn(*kt, 3, 32).astype(np.float32))

        @jax.jit
        def many_xla(d, gg):
            acc = 0.0
            for i in range(REPS):
                _, vjp_w = jax.vjp(
                    lambda ww: DC._raw_dense_conv(
                        d * scales[i], ww, kt, dil, pad
                    ),
                    w,
                )
                acc = acc + vjp_w(gg)[0][0, 0, 0, 0, 0]
            return acc

        t = timeit(
            lambda: jax.block_until_ready(
                [many_xla(dense, g) for _ in range(CHAINS)]
            )
        ) / (CHAINS * REPS)
        out[f"k{ks}_dw_xla_ms"] = t * 1e3
        log(f"k={ks} dW xla filter-grad: {t*1e3:.3f} ms")

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
