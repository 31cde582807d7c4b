"""dW-variant matrix: {surface26k, uniform26k} x {k3,k5,k7} x {3->32, 32->32}
for XLA filter-grad vs shifted-slice vs patches GEMMs.  Drives the round-5
re-gating of _dense_conv_core_bwd (r4 gates were calibrated to opposite
results; r5 re-measurement shows XLA filter-grad winning at 110k cells)."""

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
    from bench import make_cloud, surface_cloud

    REPS, CHAINS = 20, 4
    scales = jnp.linspace(0.5, 1.5, REPS)
    rng = np.random.RandomState(0)
    out = {}

    geoms = [("surface", surface_cloud("26k")), ("uniform", make_cloud())]
    for gtag, (coords, feats) in geoms:
        x = ME.SparseTensor(feats, coords)
        plan = x.coordinate_manager.dense_plan(x.coordinate_map_key)
        log(f"{gtag}: cells={plan.cells} grid={plan.grid_shape}")
        B = plan.grid_shape[0]
        sp = plan.grid_shape[1:]

        for ks in (3, 5, 7):
            kt = (ks,) * 3
            dil = (1, 1, 1)
            pad = tuple((ks // 2, ks // 2) for _ in range(3))
            for cin, cout in ((3, 32), (32, 32)):
                if cin == 32 and ks == 7:
                    continue  # not a bench row; patch buffers explode
                dense = jnp.asarray(
                    rng.randn(B, *sp, cin).astype(np.float32)
                )
                g = jnp.asarray(rng.randn(B, *sp, cout).astype(np.float32))
                w = jnp.asarray(
                    rng.randn(*kt, cin, cout).astype(np.float32)
                )

                def xla_dw(d, gg):
                    _, vjp_w = jax.vjp(
                        lambda ww: DC._raw_dense_conv(d, ww, kt, dil, pad), w
                    )
                    return vjp_w(gg)[0]

                variants = [("xla", xla_dw)]
                if DC._use_shifted_dw(kt, cin, cout, plan.cells):
                    variants.append(
                        ("shifted",
                         lambda d, gg: DC._dw_shifted(d, gg, kt, dil, pad))
                    )
                if DC._use_patches_dw(kt, cin, cout, plan.cells):
                    variants.append(
                        ("patches",
                         lambda d, gg: DC._dw_patches(d, gg, kt, dil, pad))
                    )

                for name, fn in variants:
                    @jax.jit
                    def many(d, gg, fn=fn):
                        acc = 0.0
                        for i in range(REPS):
                            acc = acc + fn(d * scales[i], gg).reshape(-1)[0]
                        return acc

                    try:
                        t = timeit(
                            lambda: jax.block_until_ready(
                                [many(dense, g) for _ in range(CHAINS)]
                            )
                        ) / (CHAINS * REPS)
                    except Exception as e:
                        log(f"{gtag} k={ks} {cin}->{cout} {name}: FAIL {e!r}")
                        continue
                    key = f"{gtag}_k{ks}_c{cin}_{cout}_dw_{name}_ms"
                    out[key] = t * 1e3
                    log(f"{gtag} k={ks} {cin}->{cout} dW {name}: "
                        f"{t*1e3:.3f} ms")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
