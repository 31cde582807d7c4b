"""z-fold round 2: (a) k=3 (can it beat the sparse-slab headline?),
(b) dW computed IN the folded layout — kx*ky shifted-slice GEMMs at
(cells2, Z*cin) @ (cells2, Z*cout) MXU-perfect shapes, band-gathered back
to (k,k,k,cin,cout) — and (c) the 459k-cell uniform grid for routing
calibration.  All outputs consumed by .sum(); control rows included."""

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
    from bench import make_cloud, surface_cloud

    REPS, CHAINS = 20, 4
    scales = jnp.linspace(0.5, 1.5, REPS)
    out = {}

    def run(name, body, *args):
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

    def section(tag, coords, feats, kss):
        x = ME.SparseTensor(feats, coords)
        plan = x.coordinate_manager.dense_plan(x.coordinate_map_key)
        B = plan.grid_shape[0]
        X, Y, Z = plan.grid_shape[1:]
        log(f"[{tag}] grid={plan.grid_shape}")
        rng = np.random.RandomState(0)
        cin, cout = 3, 32
        dense = jnp.asarray(rng.randn(B, X, Y, Z, cin).astype(np.float32))
        g = jnp.asarray(rng.randn(B, X, Y, Z, cout).astype(np.float32))
        run(f"{tag}_sum_ctrl", lambda d: d.sum(), dense)

        for ks in kss:
            kt = (ks,) * 3
            pad3 = tuple((ks // 2, ks // 2) for _ in range(3))
            w = jnp.asarray(
                rng.randn(ks, ks, ks, cin, cout).astype(np.float32)
            ) * 0.05
            rows, cols, widx = band_indices(ks, Z, cin, cout)
            rows_j, widx_j = jnp.asarray(rows), jnp.asarray(widx)
            flat_band = jnp.asarray(rows * (Z * cout) + cols)

            def zfold_conv(d, ww, ks=ks, flat_band=flat_band, widx_j=widx_j):
                d2 = d.reshape(B, X, Y, Z * cin)
                wflat = ww.reshape(ks * ks, ks * cin * cout)
                b2 = (
                    jnp.zeros((ks * ks, Z * cin * Z * cout), ww.dtype)
                    .at[:, flat_band]
                    .set(wflat[:, widx_j])
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

            # correctness of fwd (cheap; do once per section)
            o_ref = DC._raw_dense_conv(dense, w, kt, (1, 1, 1), pad3)
            err = float(
                jnp.max(jnp.abs(o_ref - zfold_conv(dense, w)))
                / (float(jnp.max(jnp.abs(o_ref))) + 1e-9)
            )
            out[f"{tag}_zfold_relerr_k{ks}"] = err
            log(f"[{tag}] k={ks} zfold fwd rel err {err:.1e}")

            run(
                f"{tag}_zfold_fwd_k{ks}",
                lambda d, ww=w: zfold_conv(d, ww).sum(),
                dense,
            )

            # dW in the folded layout: kx*ky shifted-slice GEMMs then a
            # static band gather back to (ks,ks,ks,cin,cout)
            def dw_zfold(d, gg, ks=ks, rows=rows, cols=cols):
                d2 = d.reshape(B, X, Y, Z * cin)
                g2 = gg.reshape(B, X, Y, Z * cout)
                p = ks // 2
                xp = jnp.pad(
                    d2, [(0, 0), (p, p), (p, p), (0, 0)]
                )
                g2d = g2.reshape(-1, Z * cout)
                dws = []
                for dxy in range(ks * ks):
                    dx, dy = dxy // ks, dxy % ks
                    v = jax.lax.slice(
                        xp, (0, dx, dy, 0), (B, dx + X, dy + Y, Z * cin)
                    )
                    dws.append(
                        jax.lax.dot_general(
                            v.reshape(-1, Z * cin), g2d,
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )
                db2 = jnp.stack(dws, 0).reshape(ks * ks, -1)
                # band gather: dW[(dxy, dz, ci, co)] = db2[dxy, band flat]
                # with the Z-sum folded in via segment reshape
                gathered = db2[:, np.asarray(rows) * (Z * 32) + np.asarray(cols)]
                # rows/cols enumerate (dz, z_out, ci, co) row-major with
                # variable z_out count per dz; sum over z via segment ids
                pz = ks // 2
                segs = []
                for dz in range(ks):
                    zs = [
                        z for z in range(Z) if 0 <= z + dz - pz < Z
                    ]
                    segs.extend(
                        [
                            (dz * cin + ci) * cout + co
                            for _ in zs
                            for ci in range(cin)
                            for co in range(cout)
                        ]
                    )
                seg = jnp.asarray(np.asarray(segs, np.int32))
                dwflat = jax.ops.segment_sum(
                    gathered.T, seg, num_segments=ks * cin * cout
                )  # (ks*cin*cout, ks*ks)
                return dwflat.T.reshape(ks, ks, ks, cin, cout)

            # correctness vs autodiff dW of the reference conv
            _, vjp_w = jax.vjp(
                lambda w2: DC._raw_dense_conv(dense, w2, kt, (1, 1, 1), pad3),
                w,
            )
            dw_ref = vjp_w(g)[0]
            dw_got = dw_zfold(dense, g)
            errw = float(
                jnp.max(jnp.abs(dw_ref - dw_got))
                / (float(jnp.max(jnp.abs(dw_ref))) + 1e-9)
            )
            out[f"{tag}_dwzfold_relerr_k{ks}"] = errw
            log(f"[{tag}] k={ks} dW-zfold rel err {errw:.1e}")

            run(
                f"{tag}_dw_zfold_k{ks}",
                lambda d: dw_zfold(d, g).sum(),
                dense,
            )

    c1, f1 = surface_cloud("26k")
    section("surf", c1, f1, (3, 5, 7))
    c2, f2 = make_cloud()
    section("unif", c2, f2, (3, 5))

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
