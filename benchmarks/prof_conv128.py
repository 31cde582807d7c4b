"""Profile the 128-channel slab-kernel regimes (the useful-MFU metric).

Hypothesis from FLOP accounting: at Cin=Cout=128 the kernel executes its
padded-shape FLOPs at ~19% MXU because per-tile work is split into
~135 small dots (108 two-tier (64,S') gathers + 27 (256,128,128) weight
dots) each paying MXU fill latency and a (1,T)->(T,1) index relayout.
Discriminators timed here on the bench geometries:

  prod   — production dispatch (two-tier when the builder picked it)
  tier1  — same kernel, sub-windows disabled (27 medium (256,S) gathers)
  subNNN — forced sub-window rung NNN (e.g. 64/128) when available

Run: python benchmarks/prof_conv128.py  (writes /tmp/conv128.json)
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
    from minkowskiengine_tpu.ops.pallas.conv_kernel import (
        build_slab_map_floored,
        sparse_conv_fwd_pallas,
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
        n_out = x.size
        print(
            f"[{tag}] S={sm.slab_size} sub={sm.sub_size} U={sm.union_size} "
            f"tile={sm.tile} ov={int(sm.ov_count) if sm.ov_count is not None else 0}",
            file=sys.stderr, flush=True,
        )
        f128 = jnp.concatenate([x.padded_features] * 43, axis=1)[:, :128]
        w = jnp.asarray(
            np.random.RandomState(2).randn(27, 128, 128).astype(np.float32)
        ) * 0.05
        pairs = int(np.sum(np.asarray(km.in_idx) >= 0))

        variants = {"prod": sm}
        floor = (sm.slab_size, sm.extra_rung, sm.ov_cap, 0)
        variants["tier1"] = build_slab_map_floored(
            km.in_idx, sm.capacity_in, floor, tile=sm.tile
        )
        if sm.sub_size:
            for s2 in {64, 128} - {sm.sub_size}:
                if s2 < sm.slab_size:
                    variants[f"sub{s2}"] = build_slab_map_floored(
                        km.in_idx, sm.capacity_in,
                        (sm.slab_size, sm.extra_rung, max(sm.ov_cap, 4096), s2),
                        tile=sm.tile,
                    )

        from minkowskiengine_tpu.ops.pallas import conv_kernel as ck

        if variants.get("tier1") is not None:
            variants["wide"] = variants["tier1"]  # wide kernel, same map
        variants["wide2"] = sm  # wide kernel on the production 2-tier map

        ref = None
        for name, smv in variants.items():
            if smv is None:
                continue
            ck._WIDE_KERNEL_ENV = "1" if name.startswith("wide") else "0"
            if name.startswith("wide") and not ck._wide_eligible(smv, 128, 128, 27):
                print(f"[{tag}] wide: not eligible", file=sys.stderr)
                continue

            def chain(f, w_, sm_=smv):
                o = f
                for _ in range(REPS):
                    o = sparse_conv_fwd_pallas(o, w_, sm_, n_valid_out=n_out)
                return o

            cj = jax.jit(chain)
            try:
                r = cj(f128, w)
                r.block_until_ready()
            except Exception as e:
                print(f"[{tag}] {name}: FAILED {e!r}", file=sys.stderr)
                continue
            # NOTE: variants drop different outlier sets; production applies
            # the COO correction outside the kernel, so in-kernel outputs
            # differ slightly across variants — compare magnitudes only.
            if ref is None:
                ref = float(jnp.abs(r).mean())
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready([cj(f128, w) for _ in range(CHAINS)])
                times.append((time.perf_counter() - t0) / (CHAINS * REPS))
            t = min(times)
            useful = 2 * pairs * 128 * 128 / t / 1e12
            out[f"{tag}_{name}_s"] = t
            out[f"{tag}_{name}_useful_tflops"] = useful
            print(
                f"[{tag}] {name}: {t*1e3:.3f} ms — useful {useful:.1f} "
                f"TFLOP/s ({100*useful/197:.1f}% MFU)  |out| "
                f"{float(jnp.abs(r).mean())/ref:.4f} of prod",
                file=sys.stderr, flush=True,
            )

    with open("/tmp/conv128.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
