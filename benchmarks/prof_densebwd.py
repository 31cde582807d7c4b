"""Decompose the dense-route conv backward on the surface-26k grid:
(a) g rows -> dense grid construction variants (scatter-add vs scatter-set
vs row-grid gather), (b) dW variants on resident grids, (c) the full
params-only dense_conv backward as the module runs it today.

The r5 ref-suite probe measured bwd k=5 at 8.9 ms where prof_dw says the
dW alone is 0.84-1.4 ms; this harness finds where the rest goes."""

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
    from minkowskiengine_tpu.ops.dense_conv import build_row_grid

    sys.path.insert(0, ".")
    from bench import surface_cloud

    coords, feats = surface_cloud("26k")
    x = ME.SparseTensor(feats, coords)
    plan = x.coordinate_manager.dense_plan(x.coordinate_map_key)
    cells = plan.cells
    log(f"cells={cells} grid={plan.grid_shape} capacity={x.capacity}")
    rng = np.random.RandomState(0)
    cap = x.capacity
    cout = 32
    g_rows = jnp.asarray(rng.randn(cap, cout).astype(np.float32))
    safe = jnp.where(plan.flat_idx >= 0, plan.flat_idx, cells)
    grid_rows = build_row_grid(plan.flat_idx, cells)[:cells]
    REPS, CHAINS = 20, 4
    scales = jnp.linspace(0.5, 1.5, REPS)
    out = {}

    def bench(name, fn, *args):
        @jax.jit
        def many(*a):
            acc = 0.0
            for i in range(REPS):
                acc = acc + fn(*(a[0] * scales[i],) + a[1:]).reshape(-1)[0]
            return acc

        t = timeit(
            lambda: jax.block_until_ready(
                [many(*args) for _ in range(CHAINS)]
            )
        ) / (CHAINS * REPS)
        out[name + "_ms"] = t * 1e3
        log(f"{name}: {t*1e3:.3f} ms")
        return t

    # (a) g rows -> grid
    bench(
        "g2grid_scatter_add",
        lambda g: jnp.zeros((cells + 1, cout), g.dtype)
        .at[safe].add(g, mode="drop")[:cells],
        g_rows,
    )
    bench(
        "g2grid_scatter_set",
        lambda g: jnp.zeros((cells + 1, cout), g.dtype)
        .at[safe].set(g, mode="drop")[:cells],
        g_rows,
    )
    from minkowskiengine_tpu.ops.functional import take_rows

    bench("g2grid_rowgrid_gather", lambda g: take_rows(g, grid_rows), g_rows)

    # (c) full params-only backward through the module path, k=5 and k=7
    fpad = x.padded_features
    for ks in (5, 7):
        kt = (ks,) * 3
        w = jnp.asarray(
            rng.randn(ks**3, 3, cout).astype(np.float32)
        ) * 0.05

        def fwd(f, ww):
            return DC.dense_conv(f, ww, plan, kt, (1, 1, 1))[0, 0]

        bench(f"dense_conv_fwd_k{ks}", lambda f: fwd(f, w), fpad)

        @jax.jit
        def dw_only(f, ww):
            return jax.grad(lambda w2: fwd(f, w2))(ww)

        @jax.jit
        def many_bwd(f, ww):
            acc = 0.0
            for i in range(REPS):
                acc = acc + dw_only(f * scales[i], ww)[0, 0, 0]
            return acc

        t = timeit(
            lambda: jax.block_until_ready(
                [many_bwd(fpad, w) for _ in range(CHAINS)]
            )
        ) / (CHAINS * REPS)
        out[f"dense_conv_dwgrad_k{ks}_ms"] = t * 1e3
        log(f"dense_conv dW-grad k={ks} (module path today): {t*1e3:.3f} ms")

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
