"""Decompose the traced fresh-geometry coordinate phase (MinkUNet34).

The fused fresh-geometry train step (bench.py) costs ~2x the warm step;
the gap is the in-program coordinate phase.  This harness times jitted
PREFIXES of the recorded oplog (pipelined chains — one sync per chain)
to attribute the phase cost per recorded op, plus the phase-only full
replay and the warm train step for the fused-vs-parts accounting.

Run: python benchmarks/prof_phase.py [uniform|surface]
Writes /tmp/phase.json.
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

    from flax import nnx

    import minkowskiengine_tpu as ME
    from minkowskiengine_tpu.coords.map import bucket_capacity
    from minkowskiengine_tpu.models import MinkUNet34

    sys.path.insert(0, ".")
    from bench import make_cloud, surface_cloud

    which = sys.argv[1] if len(sys.argv) > 1 else "surface"
    if which == "surface":
        clouds = [surface_cloud("26k", seed=s) for s in range(0, 6)]
    else:
        clouds = [make_cloud(seed=s) for s in range(0, 7)]

    coords, feats = clouds[0]
    x = ME.SparseTensor(feats, coords)
    net = MinkUNet34(3, 20, D=3, rngs=nnx.Rngs(0))
    _ = net(x)

    replayer = ME.GeometryReplayer(x.coordinate_manager)
    for c, _ in clouds[1:]:
        replayer(c)  # settle ratchets
    crep = ME.CompiledReplayer(x.coordinate_manager)
    crep.adopt(replayer)

    def pad(c):
        n = len(c)
        cap = bucket_capacity(n)
        cp = np.zeros((cap, c.shape[1]), np.int32)
        cp[:n] = c
        return jnp.asarray(cp), jnp.asarray(n, jnp.int32)

    padded = [pad(c) for c, _ in clouds[1:]]

    full_log = list(crep.oplog)
    out = {}
    breakpoints = []
    for i, e in enumerate(full_log):
        breakpoints.append((i + 1, f"{i:02d}_{e[0]}"))

    REPS = 8
    prev = 0.0
    for n_ops, name in breakpoints:
        crep.oplog = full_log[:n_ops]
        trace = crep.trace

        @jax.jit
        def phase_prefix(cp, n):
            geo, _, ok = trace(cp, n)
            # reduce to tiny outputs: sum one leaf per map so nothing is DCE'd
            acc = 0.0
            for leaf in jax.tree.leaves(geo):
                acc = acc + jnp.sum(leaf[..., :1].astype(jnp.float32))
            return acc, ok

        try:
            r = [phase_prefix(cp, n) for cp, n in padded]
            jax.block_until_ready(r)
        except Exception as e:
            print(f"{name}: FAILED {e!r}", file=sys.stderr, flush=True)
            continue
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(REPS):
                r = [phase_prefix(cp, n) for cp, n in padded]
            jax.block_until_ready(r)
            times.append((time.perf_counter() - t0) / (REPS * len(padded)))
        t = min(times)
        out[name] = t
        print(
            f"{name}: cumulative {t*1e3:7.3f} ms   (+{(t-prev)*1e3:6.3f} ms)",
            file=sys.stderr, flush=True,
        )
        prev = t
    crep.oplog = full_log

    with open("/tmp/phase.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
