"""A/B the STANDALONE (non-deferred) kernel-map grid-build strategy:
the r5 bytes-gate routes large num_offsets x cells products to the
slices builder (the stack path's lane-padding bloat is ~512 B/cell/offset
transient); this measures what that costs/saves in wall time on the two
shapes the gate flips: k=3 on the 459k-cell uniform grid and k=5 on the
room grid.  Mode comes from ME_GRID_BUILD (set before import)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
MODE = os.environ.get("ME_GRID_BUILD", "auto")


def log(*a):
    print(f"[{MODE}]", *a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import minkowskiengine_tpu as ME

    sys.path.insert(0, ".")
    from bench import make_cloud, surface_cloud

    for tag, (coords, feats), ks in (
        ("uniform_k3", make_cloud(), 3),
        ("surface_k5", surface_cloud("26k"), 5),
        ("uniform_k5", make_cloud(), 5),
    ):
        times = []
        for it in range(5):
            mgr = ME.CoordinateManager(D=3)
            key, _ = mgr.insert_and_map(coords)
            okey = mgr.stride(key, 1)
            t0 = time.perf_counter()
            km = mgr.kernel_map(key, okey, kernel_size=ks, stride=1)
            km.in_idx.block_until_ready()
            times.append(time.perf_counter() - t0)
        stats = jax.devices()[0].memory_stats() or {}
        log(
            f"{tag}: min {min(times)*1e3:.1f} ms  "
            f"(all {[f'{t*1e3:.0f}' for t in times]})  "
            f"peak_hbm {stats.get('peak_bytes_in_use', 0)/2**30:.2f} GiB"
        )


if __name__ == "__main__":
    main()
