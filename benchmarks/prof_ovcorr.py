"""A/B the outlier-correction grouped GEMM: k-blocked one-hot rows vs
``lax.ragged_dot`` over the k-sorted COO list, on the bench geometries'
real slab maps at tiny (3→32) and wide (128→128) channels, plus the
end-to-end 128-ch conv (kernel + correction) both ways.

Run: python benchmarks/prof_ovcorr.py   (writes /tmp/ovcorr.json)
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
    import minkowskiengine_tpu.ops.functional as F

    sys.path.insert(0, ".")
    from bench import surface_cloud

    REPS, CHAINS = 50, 5
    print("imports done", file=sys.stderr, flush=True)
    out = {}
    coords, feats = surface_cloud("26k")
    x = ME.SparseTensor(feats, coords)
    mgr = x.coordinate_manager
    km = mgr.kernel_map(
        x.coordinate_map_key, x.coordinate_map_key, kernel_size=3, stride=1
    )
    sm = km.fwd_slab
    assert sm.ov_src is not None
    print(
        f"ov_count={int(sm.ov_count)} cap={sm.ov_cap}",
        file=sys.stderr, flush=True,
    )
    rs = np.random.RandomState(0)

    for cin, cout, tag in ((3, 32, "tiny"), (128, 128, "wide")):
        W = jnp.asarray(rs.randn(27, cin, cout).astype(np.float32)) * 0.1
        fb = jnp.asarray(
            rs.randn(km.capacity_in, cin).astype(np.float32)
        )
        o0 = jnp.zeros((km.capacity_out, cout), jnp.float32)
        for mode in ("0", "1"):
            F._RAGGED_OV_ENV = mode
            name = {"0": "blocked", "1": "ragged"}[mode]

            def chain(o, f, w):
                for _ in range(REPS):
                    o = F._outlier_apply(o, f, w, sm)
                return o

            cj = jax.jit(chain)
            r = cj(o0, fb, W)
            r.block_until_ready()
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(
                    [cj(o0, fb, W) for _ in range(CHAINS)]
                )
                times.append((time.perf_counter() - t0) / (CHAINS * REPS))
            t = min(times)
            out[f"ovcorr_{tag}_{name}_s"] = t
            print(
                f"apply {tag} {name}: {t*1e6:.1f} us", file=sys.stderr,
                flush=True,
            )

            cot = jnp.asarray(
                rs.randn(km.capacity_out, cout).astype(np.float32)
            )
            dw0 = jnp.zeros((27, cin, cout), jnp.float32)

            def chain_dw(dw, f, g):
                for _ in range(REPS):
                    dw = F._outlier_dw(dw, f, g, sm)
                return dw

            cjd = jax.jit(chain_dw)
            r = cjd(dw0, fb, cot)
            jax.block_until_ready(r)
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(
                    [cjd(dw0, fb, cot) for _ in range(CHAINS)]
                )
                times.append((time.perf_counter() - t0) / (CHAINS * REPS))
            t = min(times)
            out[f"ovdw_{tag}_{name}_s"] = t
            print(
                f"dw    {tag} {name}: {t*1e6:.1f} us", file=sys.stderr,
                flush=True,
            )
    F._RAGGED_OV_ENV = None

    # end-to-end 128ch conv fwd: slab kernel + correction, default gate
    n_out = x.size
    W = jnp.asarray(rs.randn(27, 128, 128).astype(np.float32)) * 0.05
    f128 = jnp.asarray(rs.randn(km.capacity_in, 128).astype(np.float32))
    for mode, name in (("0", "blocked"), (None, "default"), ("1", "ragged")):
        F._RAGGED_OV_ENV = mode

        def chain_full(f, w):
            o = f
            for _ in range(REPS):
                o = F.sparse_conv_pallas(
                    o, w, sm, km.bwd_slab, n_out=n_out, n_in=x.size
                )
            return o

        cj = jax.jit(chain_full)
        r = cj(f128, W)
        r.block_until_ready()
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready([cj(f128, W) for _ in range(CHAINS)])
            times.append((time.perf_counter() - t0) / (CHAINS * REPS))
        t = min(times)
        pairs = int(np.sum(np.asarray(km.in_idx) >= 0))
        useful = 2 * pairs * 128 * 128 / t / 1e12
        out[f"conv128_full_{name}_s"] = t
        print(
            f"conv128 full {name}: {t*1e3:.3f} ms — useful {useful:.1f} "
            f"TFLOP/s ({100*useful/197:.1f}% MFU)",
            file=sys.stderr, flush=True,
        )
    F._RAGGED_OV_ENV = None

    with open("/tmp/ovcorr.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
