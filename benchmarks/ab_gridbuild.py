"""A/B the kernel-map grid-build strategy inside the traced coordinate
phase (ME_GRID_BUILD=stack vs slices).  Measures CompiledReplayer.run
(MinkUNet34 oplog) on fresh surface clouds — the phase the sliced-window
builder targets.  Run via _tmp_ab_gridbuild.sh (env must be set before
import: the knob is read at module import time)."""

import os
import sys
import time

import numpy as np

MODE = os.environ.get("ME_GRID_BUILD", "stack")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from flax import nnx

    import minkowskiengine_tpu as ME
    from minkowskiengine_tpu.models import MinkUNet34
    from minkowskiengine_tpu.utils.datasets import room_scan_voxels

    def cloud(seed):
        return room_scan_voxels(
            voxel_size=0.05, n_points=120_000, extent=(2.0, 2.0, 2.2),
            n_objects=4, seed=seed,
        )

    def log(*a):
        print(f"[{MODE}]", *a, file=sys.stderr, flush=True)

    t_start = time.perf_counter()
    c0, f0 = cloud(0)
    log(f"cloud: {len(c0)} voxels")
    x = ME.SparseTensor(f0, c0)
    net = MinkUNet34(3, 20, D=3, rngs=nnx.Rngs(0))
    _ = net(x)  # warm + record the full coordinate phase
    log(f"warm forward done @ {time.perf_counter()-t_start:.0f}s")
    replayer = ME.GeometryReplayer(x.coordinate_manager)
    clouds = [cloud(s) for s in range(1, 9)]
    for i, (c, _f) in enumerate(clouds):  # settle ratchets
        replayer(c)
        log(f"ratchet settle {i} @ {time.perf_counter()-t_start:.0f}s")
    crep = ME.CompiledReplayer(x.coordinate_manager).adopt(replayer)

    # warm the compiled replay on every capacity bucket the clouds hit
    for i, (c, f) in enumerate(clouds):
        geo, fp, ok = crep.run(c, f)
        assert bool(ok), "floor violated during warmup"
        log(f"compiled warm {i} @ {time.perf_counter()-t_start:.0f}s")
    jax.block_until_ready(jax.tree.leaves(geo))

    REPS = 6  # chain per timing rep: amortize the ~30 ms tunnel sync
    times = []
    for it in range(8):
        t0 = time.perf_counter()
        outs = []
        for r in range(REPS):
            c, f = clouds[(it * REPS + r) % len(clouds)]
            outs.append(crep.run(c, f))
        jax.block_until_ready(jax.tree.leaves(outs))
        times.append((time.perf_counter() - t0) / REPS)
    tmin, tmean = float(np.min(times)), float(np.mean(times))
    print(
        f'{{"mode": "{MODE}", "phase_min_ms": {tmin*1e3:.2f}, '
        f'"phase_mean_ms": {tmean*1e3:.2f}}}',
        flush=True,
    )


if __name__ == "__main__":
    main()
