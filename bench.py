"""Benchmark harness — reproduces the reference's headline workload.

Reference baseline (BASELINE.md / docs/benchmark.md, Titan X, v0.4.3):
single MinkowskiConvolution 3→32ch, kernel 3, stride 1, 3D, on ScanNet test
rooms at 5cm voxels (≈26,098 points/sample): **0.093 s forward**.

This harness synthesizes a ScanNet-room-sized cloud (26,098 unique voxels in
a 100×100×50 grid ≈ 5m×5m×2.5m at 5cm), runs the same single-conv forward,
and prints ONE JSON line with vs_baseline = speedup over 0.093 s.

Extended metrics (conv e2e with cold coordinate maps, conv bwd, MinkUNet34
fwd+bwd points/sec) are written to BENCH_DETAILS.json and stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_cloud(n_target=26098, grid=(100, 100, 50), batch=1, seed=0):
    rng = np.random.RandomState(seed)
    # sample until we have exactly n_target unique voxels
    coords = np.unique(
        np.concatenate(
            [
                rng.randint(0, batch, (n_target * 2, 1)),
                rng.randint(0, grid[0], (n_target * 2, 1)),
                rng.randint(0, grid[1], (n_target * 2, 1)),
                rng.randint(0, grid[2], (n_target * 2, 1)),
            ],
            axis=1,
        ).astype(np.int32),
        axis=0,
    )
    coords = coords[:n_target]
    feats = rng.randn(len(coords), 3).astype(np.float32)
    return coords, feats


def timeit(fn, warmup=3, iters=10):
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.min(times)), float(np.mean(times))


def main():
    import jax

    # persistent compilation cache: pallas kernels are AOT-compiled through
    # the TPU tunnel (~seconds each); caching makes reruns near-instant
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    from flax import nnx

    import minkowskiengine_tpu as ME

    log(f"devices: {jax.devices()}")
    coords, feats = make_cloud()
    log(f"cloud: {len(coords)} voxels")

    results = {}

    # ---- headline: single conv 3->32 k=3 fwd, warm geometry -------------
    # Timing note: EVERY dispatch+sync through this box's TPU tunnel pays
    # ~30 ms of completion latency regardless of work (measured: total time
    # of an N-conv chain fits 30 ms + N*t_conv).  Amortize it over a long
    # chain of independent conv applications inside one jit — equivalent to
    # the reference's CUDA-async streaming — or the headline reports the
    # tunnel, not the kernel.
    REPS = 50
    CHAINS = 5  # async chain launches per sync: the ~30 ms tunnel
    # completion latency must amortize over CHAINS×REPS convs, not REPS
    x = ME.SparseTensor(feats, coords)
    conv = ME.MinkowskiConvolution(3, 32, kernel_size=3, stride=1, dimension=3,
                                   rngs=nnx.Rngs(0))
    y = conv(x)  # warm: builds + caches coordinate/kernel maps, compiles
    kmap = x.coordinate_manager.kernel_map(
        x.coordinate_map_key, y.coordinate_map_key, kernel_size=3, stride=1
    )
    kernel = conv.kernel[...]
    fpad = x.padded_features

    from minkowskiengine_tpu.ops.functional import sparse_conv_kmap

    scales = jnp.linspace(0.5, 1.5, REPS)

    @jax.jit
    def conv_many(f, w):
        acc = 0.0
        for i in range(REPS):
            acc = acc + sparse_conv_kmap(f * scales[i], w, kmap)[0, 0]
        return acc

    def run_fwd():
        jax.block_until_ready([conv_many(fpad, kernel) for _ in range(CHAINS)])

    t_min, t_mean = timeit(run_fwd)
    t_min, t_mean = t_min / (CHAINS * REPS), t_mean / (CHAINS * REPS)
    results["single_conv_fwd_k3_sparse_kernel_s"] = t_min
    log(f"single conv fwd (sparse slab kernel): min {t_min*1e3:.3f} ms")

    # the framework's actual layer dispatch picks the dense-grid path for
    # this stride-1 small-channel config (ops/dense_conv.py)
    from minkowskiengine_tpu.ops.dense_conv import (
        dense_conv,
        dense_conv_beneficial,
    )

    plan = x.coordinate_manager.dense_plan(x.coordinate_map_key)
    if dense_conv_beneficial(plan, x.capacity, 27, 3, 32):
        @jax.jit
        def conv_many_dense(f, w):
            acc = 0.0
            for i in range(REPS):
                acc = acc + dense_conv(
                    f * scales[i], w, plan, (3, 3, 3), (1, 1, 1)
                )[0, 0]
            return acc

        def run_fwd_dense():
            jax.block_until_ready(
                [conv_many_dense(fpad, kernel) for _ in range(CHAINS)]
            )

        td_min, _ = timeit(run_fwd_dense)
        td_min = td_min / (CHAINS * REPS)
        results["single_conv_fwd_k3_dense_dispatch_s"] = td_min
        log(f"single conv fwd (dense dispatch): min {td_min*1e3:.3f} ms")
        t_min = min(t_min, td_min)
    results["single_conv_fwd_k3_warm_s"] = t_min
    log(f"single conv fwd (best dispatch): min {t_min*1e3:.3f} ms")

    # ---- conv fwd+bwd ----------------------------------------------------
    grad_fn = jax.jit(jax.grad(conv_many, argnums=(0, 1)))

    def run_bwd():
        jax.block_until_ready([grad_fn(fpad, kernel) for _ in range(CHAINS)])

    tb_min, _ = timeit(run_bwd)
    tb_min = tb_min / (CHAINS * REPS)
    results["single_conv_fwd_bwd_k3_warm_s"] = tb_min
    log(f"single conv fwd+bwd (warm maps): min {tb_min*1e3:.3f} ms")

    # headline is ready — print the machine-readable line NOW so slower
    # auxiliary sections (model-scale compile) cannot starve it
    baseline = 0.093  # Titan X single conv fwd k=3 (docs/benchmark.md:35)
    print(
        json.dumps(
            {
                "metric": "single_conv3d_3to32_k3_fwd_26k_pts",
                "value": t_min,
                "unit": "s",
                "vs_baseline": baseline / t_min,
            }
        ),
        flush=True,
    )

    # ---- surface-like (room scan) cloud: realistic slab-span statistics --
    # Real scans are 2-D surfaces in 3-D; per-tile index spans differ wildly
    # from uniform-random clouds.  This validates the slab ladder holds and
    # gives a ScanNet-room-shaped headline (VERDICT r1 item 9).
    from minkowskiengine_tpu.utils.datasets import room_scan_voxels

    s_coords, s_feats = room_scan_voxels(
        voxel_size=0.05, n_points=200_000, extent=(3.2, 3.2, 2.5), seed=0
    )
    log(f"surface cloud: {len(s_coords)} voxels (room scan @ 5cm)")
    xs = ME.SparseTensor(s_feats, s_coords)
    ys = conv(xs)  # warm maps for the surface geometry
    kmap_s = xs.coordinate_manager.kernel_map(
        xs.coordinate_map_key, ys.coordinate_map_key, kernel_size=3, stride=1
    )
    fpad_s = xs.padded_features

    @jax.jit
    def conv_many_surface(f, w):
        acc = 0.0
        for i in range(REPS):
            acc = acc + sparse_conv_kmap(f * scales[i], w, kmap_s)[0, 0]
        return acc

    ts_min, _ = timeit(
        lambda: jax.block_until_ready(
            [conv_many_surface(fpad_s, kernel) for _ in range(CHAINS)]
        )
    )
    ts_min = ts_min / (CHAINS * REPS)
    results["single_conv_fwd_k3_surface_s"] = ts_min
    results["surface_cloud_voxels"] = len(s_coords)
    log(f"single conv fwd (surface cloud, {len(s_coords)} vox): min {ts_min*1e3:.3f} ms")

    # surface scans have no row-locality under lexicographic order (slabs
    # explode to ~3.3k rows), so the LAYER dispatch routes them to the
    # dense grid — measure what the framework actually runs
    plan_s = xs.coordinate_manager.dense_plan(xs.coordinate_map_key)
    if dense_conv_beneficial(
        plan_s, xs.capacity, 27, 3, 32,
        cached_slab_size=(
            kmap_s.fwd_slab.slab_size if kmap_s.fwd_slab else None
        ),
    ):
        @jax.jit
        def conv_many_surface_dense(f, w):
            acc = 0.0
            for i in range(REPS):
                acc = acc + dense_conv(
                    f * scales[i], w, plan_s, (3, 3, 3), (1, 1, 1)
                )[0, 0]
            return acc

        tsd_min, _ = timeit(
            lambda: jax.block_until_ready(
                [conv_many_surface_dense(fpad_s, kernel) for _ in range(CHAINS)]
            )
        )
        tsd_min = tsd_min / (CHAINS * REPS)
        results["single_conv_fwd_k3_surface_dense_s"] = tsd_min
        log(
            f"single conv fwd (surface cloud, dense dispatch): "
            f"min {tsd_min*1e3:.3f} ms"
        )
        results["single_conv_fwd_k3_surface_best_s"] = min(ts_min, tsd_min)

    # ---- e2e including coordinate-map + kernel-map build (cold) ---------
    def run_cold():
        mgr = ME.CoordinateManager(D=3)
        xt = ME.SparseTensor(feats, coords, coordinate_manager=mgr)
        yt = conv(xt)
        yt.padded_features.block_until_ready()

    tc_min, _ = timeit(run_cold, warmup=2, iters=5)
    results["single_conv_fwd_k3_cold_e2e_s"] = tc_min
    log(f"single conv fwd (cold maps, e2e): min {tc_min*1e3:.3f} ms")

    # ---- kernel map build alone -----------------------------------------
    def run_kmap():
        mgr = ME.CoordinateManager(D=3)
        key, _ = mgr.insert_and_map(coords)
        okey = mgr.stride(key, 1)
        km = mgr.kernel_map(key, okey, kernel_size=3, stride=1)
        km.in_idx.block_until_ready()

    tk_min, _ = timeit(run_kmap, warmup=2, iters=5)
    results["kernel_map_build_k3_s"] = tk_min
    log(f"coordinate init + kernel map build: min {tk_min*1e3:.3f} ms")

    # ---- MinkUNet34 fwd+bwd points/sec -----------------------------------
    try:
        import optax
        from minkowskiengine_tpu.models import MinkUNet34

        net = MinkUNet34(3, 20, D=3, rngs=nnx.Rngs(0))
        _ = net(x)  # warm geometry + compile ops
        n_valid = x.size
        cap = x.capacity
        mgr = x.coordinate_manager
        key = x.coordinate_map_key
        # snapshot the fresh-geometry recipe now (everything the warm
        # forward recorded — the k=5 stem runs sparse in every regime since
        # the shifted-grid builder made its map ~0.6 ms to construct)
        replayer = ME.GeometryReplayer(mgr)
        labels = jnp.asarray(
            np.random.RandomState(0).randint(0, 20, x.capacity)
        )

        @nnx.jit
        def step(model, f):
            def loss_fn(m):
                xt = ME.SparseTensor(
                    f, coordinate_map_key=key, coordinate_manager=mgr
                )
                logits = m(xt).padded_features
                mask = (jnp.arange(cap) < n_valid).astype(jnp.float32)
                losses = optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels
                )
                return jnp.sum(losses * mask) / jnp.sum(mask)

            return nnx.value_and_grad(loss_fn)(model)

        UREPS = 12  # long chain: amortize the ~30 ms tunnel sync artifact

        cstep = nnx.cached_partial(step, net)  # avoid per-call graph
        # traversal (~60 ms/step host cost measured on MinkUNet34)

        def run_unet():  # async dispatch train, one sync — amortizes the
            # ~30 ms tunnel completion latency like a real training loop
            outs = [cstep(fpad) for _ in range(UREPS)]
            jax.block_until_ready(jax.tree.leaves(outs))

        tu_min, tu_mean = timeit(run_unet, warmup=2, iters=5)
        tu_min = tu_min / UREPS
        pps = len(coords) / tu_min
        results["minkunet34_fwd_bwd_s"] = tu_min
        results["minkunet34_points_per_sec"] = pps
        log(f"MinkUNet34 fwd+bwd: min {tu_min*1e3:.1f} ms → {pps:,.0f} points/s")

        # mixed precision (bf16 activations, f32 master weights + BN stats)
        ME.set_compute_dtype(jnp.bfloat16)
        try:
            # a fresh nnx.jit closure traces with the new compute dtype
            @nnx.jit
            def step_bf16(model, f):
                def loss_fn(m):
                    xt = ME.SparseTensor(
                        f, coordinate_map_key=key, coordinate_manager=mgr
                    )
                    logits = m(xt).padded_features.astype(jnp.float32)
                    mask = (jnp.arange(cap) < n_valid).astype(jnp.float32)
                    losses = optax.softmax_cross_entropy_with_integer_labels(
                        logits, labels
                    )
                    return jnp.sum(losses * mask) / jnp.sum(mask)

                return nnx.value_and_grad(loss_fn)(model)

            cstep16 = nnx.cached_partial(step_bf16, net)

            def run_unet_bf16():
                outs = [cstep16(fpad) for _ in range(UREPS)]
                jax.block_until_ready(jax.tree.leaves(outs))

            tb16, _ = timeit(run_unet_bf16, warmup=2, iters=5)
            tb16 = tb16 / UREPS
            results["minkunet34_fwd_bwd_bf16_s"] = tb16
            results["minkunet34_points_per_sec_bf16"] = len(coords) / tb16
            log(
                f"MinkUNet34 fwd+bwd bf16: min {tb16*1e3:.1f} ms → "
                f"{len(coords)/tb16:,.0f} points/s"
            )
        finally:
            ME.set_compute_dtype(None)

        # ---- fresh-geometry train step: the REAL training regime ---------
        # Every batch is a brand-new point cloud.  The ENTIRE batch —
        # coordinate phase (CompiledReplayer.trace: slab/grid shapes pinned
        # to ratcheted floors) + feature reduction + fwd + bwd — is ONE
        # compiled program; the floor-validity bool syncs with the loss.
        # (``replayer`` was snapshotted before the fixed-geometry warm-up.)
        graphdef, gstate = nnx.split(net)
        labels_big = jnp.asarray(
            np.random.RandomState(1).randint(0, 20, 4 * cap)
        )

        fresh_clouds = [make_cloud(seed=s) for s in range(1, 7)]
        for c, _ in fresh_clouds:  # settle capacity/slab ratchets
            replayer(c)
        crep = ME.CompiledReplayer(mgr)
        crep.oplog = list(replayer.oplog)
        crep.cap_floors = dict(replayer.cap_floors)
        crep.slab_floors = dict(replayer.slab_floors)
        crep.grid_floors = dict(replayer.grid_floors)
        crep.join_floors = dict(replayer.join_floors)

        @jax.jit
        def fused_fresh_step(state, coords_p, n, feats_p):
            geo, fp, ok = crep.trace(coords_p, n, feats_p)
            model = nnx.merge(graphdef, state)

            def loss_fn(m):
                vmgr = ME.CoordinateManager.from_geometry(geo)
                xt = ME.SparseTensor(
                    fp, coordinate_map_key=geo.entry_key,
                    coordinate_manager=vmgr,
                )
                logits = m(xt).padded_features
                mask = xt.valid_row_mask.astype(jnp.float32)
                losses = optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels_big[: logits.shape[0]]
                )
                return jnp.sum(losses * mask) / jnp.sum(mask)

            loss, grads = nnx.value_and_grad(loss_fn)(model)
            return loss, grads, ok

        from minkowskiengine_tpu.coords.map import bucket_capacity

        def one_fresh_batch(c, f):
            n = len(c)
            bcap = bucket_capacity(n)
            cp = np.zeros((bcap, c.shape[1]), np.int32)
            cp[:n] = c
            fp = np.zeros((bcap, f.shape[1]), f.dtype)
            fp[:n] = f
            loss, grads, ok = fused_fresh_step(
                gstate, jnp.asarray(cp), jnp.asarray(n, jnp.int32),
                jnp.asarray(fp),
            )
            jax.block_until_ready((loss, ok))
            assert bool(ok)

        for c, f in fresh_clouds:  # compile + warm every bucket
            one_fresh_batch(c, f)
        batch_times = []
        for _ in range(3):
            for c, f in fresh_clouds:
                t0 = time.perf_counter()
                one_fresh_batch(c, f)
                batch_times.append(time.perf_counter() - t0)
        tf_min = float(np.min(batch_times))
        tf_mean = float(np.mean(batch_times))
        results["minkunet34_fresh_geometry_step_s"] = tf_min
        results["minkunet34_fresh_geometry_step_mean_s"] = tf_mean
        results["minkunet34_fresh_geometry_points_per_sec"] = (
            len(fresh_clouds[0][0]) / tf_mean
        )
        log(
            f"MinkUNet34 fresh-geometry train step (e2e, new cloud every "
            f"batch): min {tf_min*1e3:.1f} ms / mean {tf_mean*1e3:.1f} ms → "
            f"{len(fresh_clouds[0][0])/tf_mean:,.0f} points/s"
        )

        # pipelined: a real training loop launches batches asynchronously
        # and syncs (loss + floor-ok) every few steps — per-batch syncing
        # pays the ~30 ms tunnel completion latency on every step
        def pad_batch(c, f):
            n = len(c)
            bcap = bucket_capacity(n)
            cp = np.zeros((bcap, c.shape[1]), np.int32)
            cp[:n] = c
            fp = np.zeros((bcap, f.shape[1]), f.dtype)
            fp[:n] = f
            return jnp.asarray(cp), jnp.asarray(n, jnp.int32), jnp.asarray(fp)

        padded_fresh = [pad_batch(c, f) for c, f in fresh_clouds]

        def run_fresh_pipelined():
            outs = [
                fused_fresh_step(gstate, cp, n, fp)
                for cp, n, fp in padded_fresh
            ]
            jax.block_until_ready([o[0] for o in outs])
            assert all(bool(o[2]) for o in outs)

        run_fresh_pipelined()
        pipe_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_fresh_pipelined()
            pipe_times.append(
                (time.perf_counter() - t0) / len(padded_fresh)
            )
        tp_min = float(np.min(pipe_times))
        results["minkunet34_fresh_geometry_pipelined_s"] = tp_min
        results["minkunet34_fresh_geometry_pipelined_points_per_sec"] = (
            len(fresh_clouds[0][0]) / tp_min
        )
        log(
            f"MinkUNet34 fresh-geometry pipelined (async launch, periodic "
            f"sync): {tp_min*1e3:.1f} ms/batch → "
            f"{len(fresh_clouds[0][0])/tp_min:,.0f} points/s"
        )
    except Exception as e:  # keep the headline metric alive regardless
        log(f"MinkUNet34 bench failed: {e!r}")

    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
