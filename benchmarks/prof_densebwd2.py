"""Decompose the dense-route conv backward (surface-26k grid, 3->32):

(a) dx-only through the custom-VJP path vs a manual flipped-kernel conv,
(b) dW variants (shifted / patches / XLA filter-grad),
(c) params-only grad through dense_conv with the custom VJP DISABLED
    (native XLA AD prunes the unused dx), at k=5 and k=7.

The r5 ref-suite probe measured bwd k=5 at 8.9 ms where prof_dw says the
dW alone is 0.84-1.4 ms; prof_densebwd measured the module dW-grad at
10.5 ms — this harness separates dx from dW from scatter."""

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
    log(f"cells={cells} grid={plan.grid_shape} capacity={x.capacity}")
    rng = np.random.RandomState(0)
    B = plan.grid_shape[0]
    sp = plan.grid_shape[1:]
    dense = jnp.asarray(rng.randn(B, *sp, 3).astype(np.float32))
    g = jnp.asarray(rng.randn(B, *sp, 32).astype(np.float32))
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

    for ks in (5, 7):
        kt = (ks,) * 3
        dil = (1, 1, 1)
        pad = tuple((ks // 2, ks // 2) for _ in range(3))
        w = jnp.asarray(rng.randn(*kt, 3, 32).astype(np.float32)) * 0.05

        # (a) dx via XLA's conv-input-grad (what the custom VJP calls)
        def dx_xla(gg, ww):
            _, vjp_x = jax.vjp(
                lambda d: DC._raw_dense_conv(d, ww, kt, dil, pad), dense
            )
            return vjp_x(gg)[0]

        bench(f"dx_xla_vjp_k{ks}", dx_xla, g, w)

        # (a') dx as a manual conv of g with the flipped/transposed kernel
        def dx_flip(gg, ww):
            wf = jnp.flip(ww, axis=tuple(range(3)))
            wf = jnp.swapaxes(wf, -1, -2)  # (k,k,k,cout,cin)
            return DC._raw_dense_conv(gg, wf, kt, dil, pad)

        bench(f"dx_flipconv_k{ks}", dx_flip, g, w)

        # (b) dW variants
        bench(
            f"dw_shifted_k{ks}",
            lambda gg, ww=w: DC._dw_shifted(dense, gg, kt, dil, pad),
            g,
        )

        def dw_xla(gg, ww):
            _, vjp_w = jax.vjp(
                lambda w2: DC._raw_dense_conv(dense, w2, kt, dil, pad), ww
            )
            return vjp_w(gg)[0]

        bench(f"dw_xla_filtergrad_k{ks}", dw_xla, g, w)

        # (c) params-only grad through the FULL dense_conv (scatter + conv
        # + gather) with native AD — no custom VJP, so the unused dx chain
        # is pruned by XLA
        fpad = x.padded_features
        wflat = jnp.asarray(
            rng.randn(ks**3, 3, 32).astype(np.float32)
        ) * 0.05
        safe = jnp.where(plan.flat_idx >= 0, plan.flat_idx, cells)

        def raw_full(f, ww):
            dns = (
                jnp.zeros((cells + 1, 3), f.dtype)
                .at[safe].set(f, mode="drop")[:cells]
                .reshape((B,) + sp + (3,))
            )
            w5 = ww.reshape(tuple(reversed(kt)) + (3, 32))
            w5 = jnp.transpose(w5, (2, 1, 0, 3, 4))
            o = DC._raw_dense_conv(dns, w5, kt, dil, pad)
            flat = o.reshape(cells, 32)
            return jnp.take(flat, safe, axis=0, mode="fill", fill_value=0)

        @jax.jit
        def many_native(f, ww):
            acc = 0.0
            for i in range(REPS):
                acc = acc + jax.grad(
                    lambda w2: raw_full(f * scales[i], w2).sum()
                )(ww)[0, 0, 0]
            return acc

        t = timeit(
            lambda: jax.block_until_ready(
                [many_native(fpad, wflat) for _ in range(CHAINS)]
            )
        ) / (CHAINS * REPS)
        out[f"native_paramsgrad_full_k{ks}_ms"] = t * 1e3
        log(f"native params-only grad full dense_conv k={ks}: {t*1e3:.3f} ms")

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
