"""Pin down the missing ~3-5 ms in the dense k=5/7 backward: re-measure
each dW variant with the DENSE INPUT varying per rep (the earlier 0.82 ms
filter-grad number kept `dense` loop-invariant, letting XLA hoist any
layout transform), plus the fused fwd+params-grad as the trainer runs it."""

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
    fpad = x.padded_features
    REPS, CHAINS = 20, 4
    scales = jnp.linspace(0.5, 1.5, REPS)
    out = {}

    def bench(name, fn):
        @jax.jit
        def many(d, gg, ww):
            acc = 0.0
            for i in range(REPS):
                acc = acc + fn(d * scales[i], gg, ww).reshape(-1)[0]
            return acc

        t = timeit(
            lambda: jax.block_until_ready(
                [many(dense, g, w) for _ in range(CHAINS)]
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

        def dw_xla(d, gg, ww):
            _, vjp_w = jax.vjp(
                lambda w2: DC._raw_dense_conv(d, w2, kt, dil, pad), ww
            )
            return vjp_w(gg)[0]

        bench(f"dw_xla_dvaries_k{ks}", dw_xla)

        bench(
            f"dw_shifted_dvaries_k{ks}",
            lambda d, gg, ww: DC._dw_shifted(d, gg, kt, dil, pad),
        )

        # fused: fwd value + params-only grad through the module's
        # dense_conv (custom edges + routed dW), like a train step
        wflat = jnp.asarray(
            rng.randn(ks**3, 3, 32).astype(np.float32)
        ) * 0.05

        @jax.jit
        def step_many(f, ww):
            acc = 0.0
            for i in range(REPS):
                val, grad = jax.value_and_grad(
                    lambda w2: DC.dense_conv(
                        f * scales[i], w2, plan, kt, dil
                    ).sum()
                )(ww)
                acc = acc + val + grad[0, 0, 0]
            return acc

        t = timeit(
            lambda: jax.block_until_ready(
                [step_many(fpad, wflat) for _ in range(CHAINS)]
            )
        ) / (CHAINS * REPS)
        out[f"fused_fwd_paramsgrad_k{ks}_ms"] = t * 1e3
        log(f"fused fwd+params-grad k={ks}: {t*1e3:.3f} ms")

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
