"""Microbenchmark the outlier-correction pass on the headline surface map.

prof_sub64.py measured the FULL production conv128 path at 0.73 ms vs
0.50 ms kernel-only: the COO correction (gather -> grouped GEMM ->
scatter-add) costs ~0.22 ms — 30% of the conv.  This harness times each
piece (src gather, ragged_dot vs k-blocked GEMM, the final scatter-add)
in 50-rep jitted chains to find the dominant term.

Run: python benchmarks/prof_ovapply.py   (writes /tmp/ovapply.json)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import minkowskiengine_tpu as ME
    from minkowskiengine_tpu.ops import functional as F

    sys.path.insert(0, ".")
    from bench import surface_cloud

    REPS, CHAINS = 50, 5
    out = {}

    coords, feats = surface_cloud("26k")
    x = ME.SparseTensor(feats, coords)
    mgr = x.coordinate_manager
    okey = mgr.stride(x.coordinate_map_key, 1)
    km = mgr.kernel_map(x.coordinate_map_key, okey, kernel_size=3, stride=1)
    sm = km.fwd_slab
    P = sm.ov_src.shape[0]
    print(f"ov_cap={P} ov_count={int(sm.ov_count)}", file=sys.stderr)

    f128 = jnp.concatenate([x.padded_features] * 43, axis=1)[:, :128]
    w = jnp.asarray(
        np.random.RandomState(2).randn(27, 128, 128).astype(np.float32)
    ) * 0.05
    base = jnp.zeros((km.capacity_out, 128), jnp.float32)

    def bench(name, fn, *args):
        @jax.jit
        def chain(*a):
            o = a[0]
            for i in range(REPS):
                o = fn(o, *a[1:])
            return o

        try:
            chain(*args).block_until_ready()
        except Exception as e:
            print(f"{name}: FAILED {e!r}", file=sys.stderr, flush=True)
            return
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready([chain(*args) for _ in range(CHAINS)])
            times.append((time.perf_counter() - t0) / (CHAINS * REPS))
        t = min(times)
        out[name] = t
        print(f"{name}: {t*1e3:.3f} ms", file=sys.stderr, flush=True)

    # full correction as shipped (gather default), plus the forced scatter
    bench("full_apply", lambda o: F._outlier_apply(o, f128, w, sm), base)
    F._OV_APPLY_ENV = "scatter"
    bench("full_apply_scatter", lambda o: F._outlier_apply(o, f128, w, sm),
          base)
    F._OV_APPLY_ENV = None

    # pieces: chain through `o` to keep data dependence
    bench(
        "src_gather",
        lambda o: o + F.take_rows(f128, sm.ov_src).sum() ,
        jnp.zeros((), jnp.float32),
    )

    X = F.take_rows(f128, sm.ov_src)
    gs = F._ov_group_sizes(sm.ov_k, 27)

    bench(
        "ragged_dot",
        lambda o, X_: o
        + jax.lax.ragged_dot(
            X_ + o[0, 0], w, gs, preferred_element_type=jnp.float32
        ),
        jnp.zeros((P, 128), jnp.float32),
        X,
    )

    def kblocked(o, X_):
        w2d = w.reshape(-1, 128)
        parts = []
        for lo, hi in F._p_chunks(P, 27 * 128):
            Xe = F._k_blocked(X_[lo:hi] + o[0, 0], sm.ov_k[lo:hi], 27)
            parts.append(jnp.dot(Xe, w2d, preferred_element_type=jnp.float32))
        return o + (jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0])

    bench("k_blocked", kblocked, jnp.zeros((P, 128), jnp.float32), X)

    contrib = jax.lax.ragged_dot(X, w, gs, preferred_element_type=jnp.float32)
    tgt = jnp.where(sm.ov_dst >= 0, sm.ov_dst, base.shape[0])

    bench(
        "scatter_add",
        lambda o, c: o.at[tgt].add(c, mode="drop"),
        base,
        contrib,
    )

    # group_sizes recompute (runs inside every apply)
    bench(
        "group_sizes",
        lambda o: o + F._ov_group_sizes(sm.ov_k + o[0].astype(jnp.int32), 27).sum(),
        jnp.zeros((1,), jnp.float32),
    )

    with open("/tmp/ovapply.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
