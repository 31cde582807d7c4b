"""Prototype: z-fold dense conv — reshape (B,X,Y,Z,cin) -> (B,X,Y,Z*cin)
and expand W into a block-banded 2-D kernel (kx,ky,Z*cin,Z*cout), so the
implicit-GEMM contraction dim grows from cin=3 to Z*cin=144 and the MXU
runs at real utilization.  ~Z/kz x more FLOPs, but the 3-ch 3-D conv runs
at 0.8% MFU (1.57 ms for 2.65 GFLOP) so there is ~50x of headroom.

Checks equivalence vs _raw_dense_conv, then times fwd / filter-grad / full
params-only grad at k=5 and k=7 on the surface-26k grid."""

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


def band_indices(kz, Z, cin, cout):
    """Static (rows, cols, w_idx) index arrays for scattering
    W (kz, cin, cout) into the banded B2 (Z*cin, Z*cout)."""
    pz = kz // 2
    rows, cols, widx = [], [], []
    for dz in range(kz):
        for z_out in range(Z):
            z_in = z_out + dz - pz
            if not (0 <= z_in < Z):
                continue
            for ci in range(cin):
                for co in range(cout):
                    rows.append(z_in * cin + ci)
                    cols.append(z_out * cout + co)
                    widx.append((dz * cin + ci) * cout + co)
    return (
        np.asarray(rows, np.int32),
        np.asarray(cols, np.int32),
        np.asarray(widx, np.int32),
    )


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
    X, Y, Z = plan.grid_shape[1:]
    log(f"grid={plan.grid_shape}")
    rng = np.random.RandomState(0)
    cin, cout = 3, 32
    dense = jnp.asarray(rng.randn(B, X, Y, Z, cin).astype(np.float32))
    REPS, CHAINS = 20, 4
    scales = jnp.linspace(0.5, 1.5, REPS)
    out = {}

    for ks in (5, 7):
        kt = (ks,) * 3
        pad3 = tuple((ks // 2, ks // 2) for _ in range(3))
        w = jnp.asarray(
            rng.randn(ks, ks, ks, cin, cout).astype(np.float32)
        ) * 0.05
        rows, cols, widx = band_indices(ks, Z, cin, cout)
        rows, cols, widx = map(jnp.asarray, (rows, cols, widx))

        def zfold_conv(d, ww, ks=ks):
            d2 = d.reshape(B, X, Y, Z * cin)
            wflat = ww.reshape(ks * ks, ks * cin * cout)
            b2 = (
                jnp.zeros((ks * ks, Z * cin * Z * cout), ww.dtype)
                .at[:, rows * (Z * cout) + cols]
                .set(wflat[:, widx])
                .reshape(ks, ks, Z * cin, Z * cout)
            )
            o2 = jax.lax.conv_general_dilated(
                d2, b2,
                window_strides=(1, 1),
                padding=[(ks // 2, ks // 2)] * 2,
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    d2.shape, b2.shape, ("NHWC", "HWIO", "NHWC")
                ),
            )
            return o2.reshape(B, X, Y, Z, cout)

        # correctness vs the 3-D conv
        o_ref = DC._raw_dense_conv(dense, w, kt, (1, 1, 1), pad3)
        o_z = zfold_conv(dense, w)
        err = float(
            jnp.max(jnp.abs(o_ref - o_z))
            / (float(jnp.max(jnp.abs(o_ref))) + 1e-9)
        )
        log(f"k={ks} zfold max rel err: {err:.2e}")
        out[f"zfold_relerr_k{ks}"] = err

        @jax.jit
        def fwd_many(d, ww):
            acc = 0.0
            for i in range(REPS):
                acc = acc + zfold_conv(d * scales[i], ww).sum()
            return acc

        t = timeit(
            lambda: jax.block_until_ready(
                [fwd_many(dense, w) for _ in range(CHAINS)]
            )
        ) / (CHAINS * REPS)
        out[f"zfold_fwd_k{ks}_ms"] = t * 1e3
        log(f"zfold fwd k={ks}: {t*1e3:.3f} ms")

        g = jnp.asarray(rng.randn(B, X, Y, Z, cout).astype(np.float32))

        @jax.jit
        def dw_many(d, ww, gg):
            acc = 0.0
            for i in range(REPS):
                _, vjp = jax.vjp(
                    lambda w2: zfold_conv(d * scales[i], w2), ww
                )
                acc = acc + vjp(gg)[0].sum()
            return acc

        t = timeit(
            lambda: jax.block_until_ready(
                [dw_many(dense, w, g) for _ in range(CHAINS)]
            )
        ) / (CHAINS * REPS)
        out[f"zfold_dw_k{ks}_ms"] = t * 1e3
        log(f"zfold dW k={ks}: {t*1e3:.3f} ms")

        @jax.jit
        def dx_many(d, ww, gg):
            acc = 0.0
            for i in range(REPS):
                _, vjp = jax.vjp(
                    lambda d2: zfold_conv(d2, ww), d * scales[i]
                )
                acc = acc + vjp(gg)[0].sum()
            return acc

        t = timeit(
            lambda: jax.block_until_ready(
                [dx_many(dense, w, g) for _ in range(CHAINS)]
            )
        ) / (CHAINS * REPS)
        out[f"zfold_dx_k{ks}_ms"] = t * 1e3
        log(f"zfold dx k={ks}: {t*1e3:.3f} ms")

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
