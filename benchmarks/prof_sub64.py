"""A/B: smaller two-tier sub-window rungs vs the production pick.

At Cin=Cout=128 the wide union kernel's remaining waste is the one-hot
gather dots, whose FLOPs scale with the sub-window width S'.  The
production pick on the headline surface cloud is S'=128 (smallest rung
whose two-tier outlier count fits the 3% budget); this harness forces
S'=96/64 with a full-capacity outlier list and times the COMPLETE
production path (Pallas kernel + grouped-GEMM outlier correction),
checking exactness against the XLA gather conv.

Run: python benchmarks/prof_sub64.py   (writes /tmp/sub64.json)
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
    from minkowskiengine_tpu.ops.functional import (
        sparse_conv,
        sparse_conv_pallas,
    )
    from minkowskiengine_tpu.ops.pallas.conv_kernel import (
        build_slab_map_floored,
    )

    sys.path.insert(0, ".")
    from bench import make_cloud, surface_cloud

    REPS, CHAINS = 50, 5
    out = {}

    for tag, (coords, feats) in (
        ("surface26k", surface_cloud("26k")),
        ("uniform", make_cloud()),
    ):
        x = ME.SparseTensor(feats, coords)
        mgr = x.coordinate_manager
        okey = mgr.stride(x.coordinate_map_key, 1)
        km = mgr.kernel_map(x.coordinate_map_key, okey, kernel_size=3, stride=1)
        sm = km.fwd_slab
        n_out = km.n_out
        n_in = km.n_in
        pairs = int(np.sum(np.asarray(km.in_idx) >= 0))
        print(
            f"[{tag}] prod S={sm.slab_size} sub={sm.sub_size} "
            f"U={sm.union_size} tile={sm.tile} "
            f"ov={int(sm.ov_count)} pairs={pairs}",
            file=sys.stderr, flush=True,
        )
        f128 = jnp.concatenate([x.padded_features] * 43, axis=1)[:, :128]
        w = jnp.asarray(
            np.random.RandomState(2).randn(27, 128, 128).astype(np.float32)
        ) * 0.05

        ref = jax.jit(sparse_conv)(f128, w, km.in_idx, km.out_idx_t)
        ref.block_until_ready()

        variants = {"prod": (sm, km.bwd_slab)}
        for s2 in (96, 64):
            if s2 >= sm.slab_size or sm.tile % 64:
                continue
            fl = (sm.slab_size, sm.extra_rung, 32768, s2)
            smv = build_slab_map_floored(km.in_idx, sm.capacity_in, fl,
                                         tile=sm.tile)
            variants[f"sub{s2}"] = (smv, km.bwd_slab)

        for name, (smv, bs) in variants.items():
            if smv is None:
                continue
            ovc = int(jax.device_get(smv.ov_count)) if smv.ov_count is not None else 0
            cap = smv.ov_cap or 0
            if cap and ovc > cap:
                print(f"[{tag}] {name}: ov {ovc} > cap {cap} — SKIP",
                      file=sys.stderr, flush=True)
                continue

            def chain(f, w_, sm_=smv, bs_=bs):
                o = f
                for _ in range(REPS):
                    o = sparse_conv_pallas(o, w_, sm_, bs_, n_out, n_in)
                return o

            cj = jax.jit(chain)
            try:
                one = jax.jit(
                    lambda f, w_, sm_=smv, bs_=bs: sparse_conv_pallas(
                        f, w_, sm_, bs_, n_out, n_in)
                )(f128, w)
                err = float(jnp.max(jnp.abs(one - ref)))
                scale = float(jnp.max(jnp.abs(ref)))
                cj(f128, w).block_until_ready()
            except Exception as e:
                print(f"[{tag}] {name}: FAILED {e!r}", file=sys.stderr)
                continue
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready([cj(f128, w) for _ in range(CHAINS)])
                times.append((time.perf_counter() - t0) / (CHAINS * REPS))
            t = min(times)
            useful = 2 * pairs * 128 * 128 / t / 1e12
            out[f"{tag}_{name}_s"] = t
            out[f"{tag}_{name}_ov"] = ovc
            out[f"{tag}_{name}_relerr"] = err / max(scale, 1e-30)
            print(
                f"[{tag}] {name}: {t*1e3:.3f} ms — useful {useful:.1f} "
                f"TFLOP/s ({100*useful/197:.1f}% MFU) ov={ovc} "
                f"relerr={err/max(scale,1e-30):.2e}",
                file=sys.stderr, flush=True,
            )

    with open("/tmp/sub64.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
