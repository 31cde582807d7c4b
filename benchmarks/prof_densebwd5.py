"""Trustworthy component timings for the dense k=5/7 conv path.

Previous probes consumed outputs via [0,0,..] element picks — XLA's
algebraic simplifier slices dots (and DCEs unused chains) straight
through them, so several 'component' numbers were fictions.  Here every
output is consumed by .sum(), and a sum-only control row is measured so
the reduction's own cost can be subtracted.

Rows (k=5 and k=7, surface-26k grid, 3->32):
  sum_ctrl_gridF/gridG  — sum of a (cells,3)/(cells,32) const (control)
  edge_scatter          — rows->grid injective set, summed
  edge_gather           — grid->rows take, summed
  conv_fwd              — raw conv, summed
  filtergrad            — XLA conv filter-grad, summed
  dw_shifted            — shifted-slice dW, summed
  dx_inputgrad          — XLA conv input-grad, summed
  full_fwd              — dense_conv (edges + conv), summed
  full_paramsgrad       — grad wrt w of sum(dense_conv), grad summed
"""

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
    cells = plan.cells
    B = plan.grid_shape[0]
    sp = plan.grid_shape[1:]
    rng = np.random.RandomState(0)
    dense = jnp.asarray(rng.randn(B, *sp, 3).astype(np.float32))
    g = jnp.asarray(rng.randn(B, *sp, 32).astype(np.float32))
    fpad = x.padded_features
    grows = jnp.asarray(rng.randn(x.capacity, 32).astype(np.float32))
    REPS, CHAINS = 20, 4
    scales = jnp.linspace(0.5, 1.5, REPS)
    out = {}

    def run(name, body, *args):
        """body(scaled_first_arg, *rest) -> scalar; chained REPS times."""
        @jax.jit
        def many(*a):
            acc = 0.0
            for i in range(REPS):
                acc = acc + body(a[0] * scales[i], *a[1:])
            return acc

        t = timeit(
            lambda: jax.block_until_ready(
                [many(*args) for _ in range(CHAINS)]
            )
        ) / (CHAINS * REPS)
        out[name + "_ms"] = t * 1e3
        log(f"{name}: {t*1e3:.3f} ms")

    # controls: cost of the consuming reduction itself
    run("sum_ctrl_gridF", lambda d: d.sum(), dense)
    run("sum_ctrl_gridG", lambda gg: gg.sum(), g)

    run(
        "edge_scatter_rows_to_grid",
        lambda f: DC._rows_to_grid(f, plan.flat_idx, cells).sum(),
        fpad,
    )
    run(
        "edge_gather_grid_to_rows",
        lambda gg: DC._grid_to_rows(
            gg.reshape(cells, 32), plan.flat_idx, cells
        ).sum(),
        g,
    )
    run(
        "edge_scatter_g_rows",
        lambda gr: DC._rows_to_grid(gr, plan.flat_idx, cells).sum(),
        grows,
    )

    for ks in (5, 7):
        kt = (ks,) * 3
        dil = (1, 1, 1)
        pad = tuple((ks // 2, ks // 2) for _ in range(3))
        w = jnp.asarray(
            rng.randn(ks, ks, ks, 3, 32).astype(np.float32)
        ) * 0.05
        wflat = jnp.asarray(
            rng.randn(ks**3, 3, 32).astype(np.float32)
        ) * 0.05

        run(
            f"conv_fwd_k{ks}",
            lambda d: DC._raw_dense_conv(d, w, kt, dil, pad).sum(),
            dense,
        )

        def filtergrad(d, gg):
            _, vjp_w = jax.vjp(
                lambda w2: DC._raw_dense_conv(d, w2, kt, dil, pad), w
            )
            return vjp_w(gg)[0]

        run(f"filtergrad_k{ks}", lambda d: filtergrad(d, g).sum(), dense)
        run(
            f"dw_shifted_k{ks}",
            lambda d: DC._dw_shifted(d, g, kt, dil, pad).sum(),
            dense,
        )

        def inputgrad(d, gg):
            _, vjp_x = jax.vjp(
                lambda d2: DC._raw_dense_conv(d2, w, kt, dil, pad), d
            )
            return vjp_x(gg)[0]

        run(f"dx_inputgrad_k{ks}", lambda d: inputgrad(d, g).sum(), dense)

        run(
            f"full_fwd_k{ks}",
            lambda f: DC.dense_conv(f, wflat, plan, kt, dil).sum(),
            fpad,
        )

        def paramsgrad(f, ww):
            gr = jax.grad(
                lambda w2: DC.dense_conv(f, w2, plan, kt, dil).sum()
            )(ww)
            return gr.sum()

        run(f"full_paramsgrad_k{ks}", paramsgrad, fpad, wflat)

        def fullgrad(f, ww):
            gf, gw = jax.grad(
                lambda f2, w2: DC.dense_conv(f2, w2, plan, kt, dil).sum(),
                argnums=(0, 1),
            )(f, ww)
            return gf.sum() + gw.sum()

        run(f"full_bothgrads_k{ks}", fullgrad, fpad, wflat)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
