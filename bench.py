"""Benchmark harness — reproduces the reference's headline workload.

Reference baseline (BASELINE.md / docs/benchmark.md, Titan X, v0.4.3):
single MinkowskiConvolution 3→32ch, kernel 3, stride 1, 3D, on ScanNet test
rooms at 5cm voxels (≈26,098 points/sample): **0.093 s forward**.

The HEADLINE cloud is room-SHAPED: ~26k voxels on the surfaces of a
synthetic room scan (walls/floor/furniture faces + sensor noise) — the
same 2-D-surface-in-3-D geometry as the ScanNet rooms the baseline was
measured on.  Uniform-random volumetric clouds (easy mode for slab
locality) are kept as secondary metrics.  The headline JSON line reports
the best-dispatch surface conv with vs_baseline = speedup over 0.093 s.

Extended metrics (conv e2e with cold coordinate maps, conv bwd, useful
MFU at 128 ch, MinkUNet34 fwd+bwd points/sec on both geometries, fresh-
geometry training) are written to BENCH_DETAILS.json and stderr.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_T0 = time.time()
# Soft deadline: the driver kills the bench at an unknown budget (r3 AND r4
# both ended rc=124); sections past the deadline are SKIPPED so the run
# exits 0 with everything measured so far flushed.  Opt into the long tail
# (cold-e2e, kmap-build, 104k capacity probe) with ME_BENCH_FULL=1.
_DEADLINE_S = float(os.environ.get("ME_BENCH_DEADLINE_S", "1260"))
_FULL = os.environ.get("ME_BENCH_FULL", "") == "1"


def elapsed():
    return time.time() - _T0


class SkipSection(Exception):
    """Raised inside a section body when the soft deadline has passed."""


def past_deadline(section_name):
    if elapsed() > _DEADLINE_S and not _FULL:
        print(
            f"SKIP section {section_name}: {elapsed():.0f}s past the "
            f"{_DEADLINE_S:.0f}s deadline",
            file=sys.stderr, flush=True,
        )
        return True
    return False


def deadline_gate(section_name):
    """Call at the top of a section body: raises SkipSection (caught and
    logged by the ``section`` context manager) once the deadline passed."""
    if past_deadline(section_name):
        raise SkipSection(section_name)


def _git_head():
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.abspath(__file__)),
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


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


def surface_cloud(n="26k", seed=0):
    """Room-scan surface voxels at 5cm — the headline geometry.  "26k"
    matches the baseline's ≈26,098 voxels/sample; "50k" is the larger
    stress variant."""
    from minkowskiengine_tpu.utils.datasets import room_scan_voxels

    if n == "26k":
        return room_scan_voxels(
            voxel_size=0.05, n_points=120_000, extent=(2.0, 2.0, 2.2),
            n_objects=4, seed=seed,
        )
    return room_scan_voxels(
        voxel_size=0.05, n_points=200_000, extent=(3.2, 3.2, 2.5), seed=seed
    )


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

    # Seed from the committed artifact so a partial run MERGES into it:
    # round 3's timeout rewrote BENCH_DETAILS.json from an empty dict and
    # erased the MinkUNet34 north-star rows.  Never clobber prior evidence.
    results = {}
    try:
        with open("BENCH_DETAILS.json") as f:
            results = json.load(f)
    except Exception:
        pass

    # Provenance: every row (re)measured by THIS run is stamped with the
    # code commit and timestamp, so merged artifacts can never again mix
    # regression-era rows with healthy ones untraceably (round-4 verdict).
    head = _git_head()
    prov = results.setdefault("_provenance", {})

    def put(key, value):
        results[key] = value
        prov[key] = {"commit": head, "t": int(time.time())}

    def flush():
        """Persist partial results NOW — the TPU tunnel can die mid-run
        (observed: its compile server vanished after the headline), and a
        crashed section must not cost the metrics already measured."""
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump(results, f, indent=2)

    from contextlib import contextmanager

    @contextmanager
    def section(name):
        try:
            yield
        except SkipSection:
            pass  # deadline skip, already logged
        except Exception as e:
            log(f"section {name} FAILED: {e!r}")
        finally:
            flush()

    # ---- tunnel sync latency (context for the eager/cold metrics) -------
    # Every isolated dispatch+sync through this box's TPU tunnel pays
    # ~34 ms of completion latency regardless of work (measured pristine
    # AND post-pallas).  Eager API paths take 3 host syncs (insert, span
    # fetch, final block), so their wall times here carry a ~3× this
    # latency floor that does not exist on directly-attached hardware.
    tiny = jax.jit(lambda a: a + 1)
    z = jnp.zeros((8,))
    tiny(z).block_until_ready()
    t_sync, _ = timeit(lambda: tiny(z).block_until_ready(), warmup=2, iters=5)
    put("tunnel_sync_latency_s", t_sync)
    log(f"tunnel dispatch+sync latency: {t_sync*1e3:.1f} ms")

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
    put("single_conv_fwd_k3_sparse_kernel_s", t_min)
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
        put("single_conv_fwd_k3_dense_dispatch_s", td_min)
        log(f"single conv fwd (dense dispatch): min {td_min*1e3:.3f} ms")
        t_min = min(t_min, td_min)
    put("single_conv_fwd_k3_warm_s", t_min)
    log(f"single conv fwd (best dispatch): min {t_min*1e3:.3f} ms")

    # ---- conv fwd+bwd ----------------------------------------------------
    grad_fn = jax.jit(jax.grad(conv_many, argnums=(0, 1)))

    def run_bwd():
        jax.block_until_ready([grad_fn(fpad, kernel) for _ in range(CHAINS)])

    tb_min, _ = timeit(run_bwd)
    tb_min = tb_min / (CHAINS * REPS)
    put("single_conv_fwd_bwd_k3_warm_s", tb_min)
    log(f"single conv fwd+bwd (warm maps): min {tb_min*1e3:.3f} ms")

    put("single_conv_fwd_k3_uniform_s", t_min)

    # ---- HEADLINE: room-shaped surface cloud at the baseline's size ------
    # The Titan X 0.093 s baseline was measured on real ScanNet rooms —
    # 2-D surfaces — so the headline must be too.  ~26k voxels on the
    # walls/floor/furniture of a synthetic room scan at 5cm.
    h_coords, h_feats = surface_cloud("26k")
    log(f"headline cloud: {len(h_coords)} voxels (room-scan surface @ 5cm)")
    xh = ME.SparseTensor(h_feats, h_coords)
    yh = conv(xh)  # warm maps (sparse slab + outlier list) + compile
    kmap_h = xh.coordinate_manager.kernel_map(
        xh.coordinate_map_key, yh.coordinate_map_key, kernel_size=3, stride=1
    )
    fpad_h = xh.padded_features

    @jax.jit
    def conv_many_headline(f, w):
        acc = 0.0
        for i in range(REPS):
            acc = acc + sparse_conv_kmap(f * scales[i], w, kmap_h)[0, 0]
        return acc

    th_min, _ = timeit(
        lambda: jax.block_until_ready(
            [conv_many_headline(fpad_h, kernel) for _ in range(CHAINS)]
        )
    )
    th_min = th_min / (CHAINS * REPS)
    put("single_conv_fwd_k3_surface26k_sparse_s", th_min)
    if kmap_h.fwd_slab is not None:
        put("surface26k_slab_S", kmap_h.fwd_slab.slab_size)
        put(
            "surface26k_outlier_pairs",
            int(kmap_h.fwd_slab.ov_count)
            if kmap_h.fwd_slab.ov_count is not None
            else 0,
        )
    log(
        f"single conv fwd (surface 26k, sparse slab kernel): "
        f"min {th_min*1e3:.3f} ms"
    )

    plan_h = xh.coordinate_manager.dense_plan(xh.coordinate_map_key)
    if dense_conv_beneficial(
        plan_h, xh.capacity, 27, 3, 32,
        cached_slab_size=(
            kmap_h.fwd_slab.slab_size if kmap_h.fwd_slab else None
        ),
    ):
        @jax.jit
        def conv_many_headline_dense(f, w):
            acc = 0.0
            for i in range(REPS):
                acc = acc + dense_conv(
                    f * scales[i], w, plan_h, (3, 3, 3), (1, 1, 1)
                )[0, 0]
            return acc

        thd_min, _ = timeit(
            lambda: jax.block_until_ready(
                [conv_many_headline_dense(fpad_h, kernel) for _ in range(CHAINS)]
            )
        )
        thd_min = thd_min / (CHAINS * REPS)
        put("single_conv_fwd_k3_surface26k_dense_s", thd_min)
        log(f"single conv fwd (surface 26k, dense dispatch): min {thd_min*1e3:.3f} ms")
        th_min = min(th_min, thd_min)
    put("single_conv_fwd_k3_surface26k_s", th_min)
    put("surface26k_voxels", len(h_coords))

    # headline is ready — print the machine-readable line NOW so slower
    # auxiliary sections (model-scale compile) cannot starve it
    baseline = 0.093  # Titan X single conv fwd k=3 (docs/benchmark.md:35)
    put("headline_vs_baseline", baseline / th_min)
    print(
        json.dumps(
            {
                "metric": "single_conv3d_3to32_k3_fwd_surface_26k_pts",
                "value": th_min,
                "unit": "s",
                "vs_baseline": baseline / th_min,
            }
        ),
        flush=True,
    )
    flush()  # headline metrics are on disk even if the tunnel dies now

    # ---- full published-baseline suite (docs/benchmark.md, Titan X) ------
    # Every row the reference publishes, measured on the SAME room-shaped
    # geometry its numbers came from (ScanNet rooms @5cm, ~26k voxels):
    # single conv fwd/bwd at k=3/5/7 and the 3-layer "simple UNet"
    # (conv k→32, conv k=2 s=2, convT k=2 s=2) fwd/bwd at k=3/5.
    # Reference "backward" rows time the backward pass alone (maps reused),
    # so bwd here = t(fwd+bwd) − t(fwd) on warm maps.
    with section("ref-suite"):
        deadline_gate("ref-suite")
        REF = {  # docs/benchmark.md:35-43,81-87 (Titan X, v0.4.3)
            ("conv_fwd", 3): 0.093, ("conv_fwd", 5): 0.121,
            ("conv_fwd", 7): 0.165,
            ("conv_bwd", 3): 0.0056, ("conv_bwd", 5): 0.0149,
            ("conv_bwd", 7): 0.0312,
            ("unet_fwd", 3): 0.1238, ("unet_fwd", 5): 0.1440,
            ("unet_bwd", 3): 0.0074, ("unet_bwd", 5): 0.0170,
        }
        mgr_ref = xh.coordinate_manager
        key_ref = xh.coordinate_map_key

        def chain_times(modules, reps=REPS, chains=CHAINS):
            """(t_fwd, t_bwd) per application of the module stack on the
            headline cloud, amortized over an in-graph chain.  The backward
            differentiates wrt every module's parameters but NOT the input
            features — matching the reference benchmark's methodology: its
            input features come straight from the loader with
            ``requires_grad=False``, so ``logits.F.sum().backward()``
            (reference tests/python/network_speed.py:110) computes dW only
            for a single conv (plus inter-layer dX inside the UNet)."""
            splits = [nnx.split(m) for m in modules]
            graphdefs = [gd for gd, _ in splits]
            states = [st for _, st in splits]

            def apply_once(f, scale, sts):
                xt = ME.SparseTensor(
                    f * scale, coordinate_map_key=key_ref,
                    coordinate_manager=mgr_ref,
                )
                for gd, st in zip(graphdefs, sts):
                    xt = nnx.merge(gd, st)(xt)
                return xt.padded_features[0, 0]

            @jax.jit
            def fwd_many(f, sts):
                acc = 0.0
                for i in range(reps):
                    acc = acc + apply_once(f, scales[i], sts)
                return acc

            @jax.jit
            def bwd_many(f, sts):
                return jax.grad(fwd_many, argnums=1)(f, sts)

            t_f, _ = timeit(
                lambda: jax.block_until_ready(
                    [fwd_many(fpad_h, states) for _ in range(chains)]
                ),
                warmup=2, iters=5,
            )
            t_fb, _ = timeit(
                lambda: jax.block_until_ready(
                    [bwd_many(fpad_h, states) for _ in range(chains)]
                ),
                warmup=2, iters=5,
            )
            return t_f / (chains * reps), t_fb / (chains * reps)

        for ks in (3, 5, 7):
            conv_k = ME.MinkowskiConvolution(
                3, 32, kernel_size=ks, stride=1, dimension=3,
                rngs=nnx.Rngs(ks),
            )
            _ = conv_k(xh)  # warm maps + compile
            tf, tfb = chain_times([conv_k])
            tb = max(tfb - tf, 0.0)
            put(f"ref_conv_fwd_k{ks}_s", tf)
            put(f"ref_conv_bwd_k{ks}_s", tb)
            put(f"ref_conv_fwd_k{ks}_vs_baseline",
                REF[("conv_fwd", ks)] / tf
            )
            if tb > 0:
                put(f"ref_conv_bwd_k{ks}_vs_baseline",
                    REF[("conv_bwd", ks)] / tb
                )
            log(
                f"ref-suite conv k={ks}: fwd {tf*1e3:.3f} ms "
                f"({REF[('conv_fwd', ks)]/tf:.0f}x baseline), "
                f"bwd {tb*1e3:.3f} ms"
            )
            flush()

        for ks in (3, 5):
            unet_mods = [
                ME.MinkowskiConvolution(
                    3, 32, kernel_size=ks, stride=1, dimension=3,
                    rngs=nnx.Rngs(10 + ks),
                ),
                ME.MinkowskiConvolution(
                    32, 32, kernel_size=2, stride=2, dimension=3,
                    rngs=nnx.Rngs(20 + ks),
                ),
                ME.MinkowskiConvolutionTranspose(
                    32, 32, kernel_size=2, stride=2, dimension=3,
                    rngs=nnx.Rngs(30 + ks),
                ),
            ]
            xt = xh
            for m in unet_mods:  # warm all three layers' maps
                xt = m(xt)
            tf, tfb = chain_times(unet_mods, reps=REPS // 2)
            tb = max(tfb - tf, 0.0)
            put(f"ref_unet_fwd_k{ks}_s", tf)
            put(f"ref_unet_bwd_k{ks}_s", tb)
            put(f"ref_unet_fwd_k{ks}_vs_baseline",
                REF[("unet_fwd", ks)] / tf
            )
            if tb > 0:
                put(f"ref_unet_bwd_k{ks}_vs_baseline",
                    REF[("unet_bwd", ks)] / tb
                )
            log(
                f"ref-suite simple-UNet k={ks}: fwd {tf*1e3:.3f} ms "
                f"({REF[('unet_fwd', ks)]/tf:.0f}x baseline), "
                f"bwd {tb*1e3:.3f} ms"
            )
            flush()

    # ---- 128-channel conv + useful MFU ----------------------------------
    # "useful" = the GEMM FLOPs a perfect sparse conv needs
    # (2·pairs·Cin·Cout); the one-hot gather FLOPs the kernel spends on
    # top are implementation tax.  BASELINE.json names this metric.
    with section("conv128-mfu"):
        deadline_gate("conv128-mfu")
        k128 = jnp.asarray(
            np.random.RandomState(2).randn(27, 128, 128).astype(np.float32)
        ) * 0.05
        for tag, xt, km_t in (("uniform", x, kmap), ("surface26k", xh, kmap_h)):
            f128 = jnp.concatenate([xt.padded_features] * 43, axis=1)[:, :128]

            @jax.jit
            def conv128_chain(f, w, km_=km_t):
                o = f
                for _ in range(REPS):
                    o = sparse_conv_kmap(o, w, km_)
                return o

            t128, _ = timeit(
                lambda: jax.block_until_ready(
                    [conv128_chain(f128, k128) for _ in range(CHAINS)]
                ),
                warmup=2, iters=5,
            )
            t128 = t128 / (CHAINS * REPS)
            pairs = int(np.sum(np.asarray(km_t.in_idx) >= 0))
            useful_tflops = 2 * pairs * 128 * 128 / t128 / 1e12
            put(f"single_conv_fwd_k3_128ch_{tag}_s", t128)
            put(f"conv128_useful_tflops_{tag}", useful_tflops)
            put(f"conv128_useful_mfu_{tag}", useful_tflops / 197.0)
            log(
                f"conv 128ch k=3 ({tag}): {t128*1e3:.3f} ms — useful "
                f"{useful_tflops:.1f} TFLOP/s "
                f"({100*useful_tflops/197.0:.1f}% MFU)"
            )

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
        put("minkunet34_fwd_bwd_s", tu_min)
        put("minkunet34_points_per_sec", pps)
        flush()
        log(f"MinkUNet34 fwd+bwd: min {tu_min*1e3:.1f} ms → {pps:,.0f} points/s")

        # ---- MinkUNet34 on the HEADLINE (room-scan surface) geometry ----
        deadline_gate("unet-surface")
        mgr_h = xh.coordinate_manager
        key_h = xh.coordinate_map_key
        _ = net(xh)  # warm the surface geometry through the whole model
        replayer_h = ME.GeometryReplayer(mgr_h)  # snapshot for fresh bench
        cap_h, n_valid_h = xh.capacity, xh.size
        labels_h = jnp.asarray(
            np.random.RandomState(0).randint(0, 20, cap_h)
        )

        @nnx.jit
        def step_h(model, f):
            def loss_fn(m):
                xt = ME.SparseTensor(
                    f, coordinate_map_key=key_h, coordinate_manager=mgr_h
                )
                logits = m(xt).padded_features
                mask = (jnp.arange(cap_h) < n_valid_h).astype(jnp.float32)
                losses = optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels_h
                )
                return jnp.sum(losses * mask) / jnp.sum(mask)

            return nnx.value_and_grad(loss_fn)(model)

        cstep_h = nnx.cached_partial(step_h, net)

        def run_unet_h():
            outs = [cstep_h(fpad_h) for _ in range(UREPS)]
            jax.block_until_ready(jax.tree.leaves(outs))

        tu_h, _ = timeit(run_unet_h, warmup=2, iters=5)
        tu_h = tu_h / UREPS
        pps_h = len(h_coords) / tu_h
        put("minkunet34_surface_fwd_bwd_s", tu_h)
        put("minkunet34_surface_points_per_sec", pps_h)
        flush()
        log(
            f"MinkUNet34 fwd+bwd (surface 26k): min {tu_h*1e3:.1f} ms → "
            f"{pps_h:,.0f} points/s"
        )

        # mixed precision (bf16 activations, f32 master weights + BN stats)
        deadline_gate("unet-bf16")
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
            put("minkunet34_fwd_bwd_bf16_s", tb16)
            put("minkunet34_points_per_sec_bf16", len(coords) / tb16)
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
        graphdef, gstate = nnx.split(net)
        from minkowskiengine_tpu.coords.map import bucket_capacity

        def pad_batch(c, f):
            n = len(c)
            bcap = bucket_capacity(n)
            cp = np.zeros((bcap, c.shape[1]), np.int32)
            cp[:n] = c
            fp = np.zeros((bcap, f.shape[1]), f.dtype)
            fp[:n] = f
            return jnp.asarray(cp), jnp.asarray(n, jnp.int32), jnp.asarray(fp)

        def bench_fresh(tag, replayer_t, base_mgr, clouds):
            """Per-batch-sync and pipelined fresh-geometry training over a
            list of (coords, feats) clouds; writes tag-prefixed metrics."""
            for c, _ in clouds:  # settle capacity/slab/grid ratchets
                replayer_t(c)
            crep = ME.CompiledReplayer(base_mgr)
            crep.oplog = list(replayer_t.oplog)
            crep.cap_floors = dict(replayer_t.cap_floors)
            crep.slab_floors = dict(replayer_t.slab_floors)
            crep.grid_floors = dict(replayer_t.grid_floors)
            crep.join_floors = dict(replayer_t.join_floors)
            max_cap = max(bucket_capacity(len(c)) for c, _ in clouds)
            labels_big = jnp.asarray(
                np.random.RandomState(1).randint(0, 20, 4 * max_cap)
            )

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

            padded = [pad_batch(c, f) for c, f in clouds]

            def one_batch(cp, n, fp):
                loss, grads, ok = fused_fresh_step(gstate, cp, n, fp)
                jax.block_until_ready((loss, ok))
                assert bool(ok)

            for cp, n, fp in padded:  # compile + warm every bucket
                one_batch(cp, n, fp)
            batch_times = []
            for _ in range(3):
                for cp, n, fp in padded:
                    t0 = time.perf_counter()
                    one_batch(cp, n, fp)
                    batch_times.append(time.perf_counter() - t0)
            tf_min = float(np.min(batch_times))
            tf_mean = float(np.mean(batch_times))
            npts = len(clouds[0][0])
            put(f"minkunet34_fresh{tag}_step_s", tf_min)
            put(f"minkunet34_fresh{tag}_step_mean_s", tf_mean)
            put(f"minkunet34_fresh{tag}_points_per_sec", npts / tf_mean)
            log(
                f"MinkUNet34 fresh{tag} train step (e2e, new cloud every "
                f"batch): min {tf_min*1e3:.1f} ms / mean {tf_mean*1e3:.1f} "
                f"ms → {npts/tf_mean:,.0f} points/s"
            )

            # pipelined: a real loop launches batches asynchronously and
            # syncs (loss + floor-ok) every few steps — per-batch syncing
            # pays the ~30 ms tunnel completion latency on every step
            def run_pipelined():
                outs = [fused_fresh_step(gstate, *b) for b in padded]
                jax.block_until_ready([o[0] for o in outs])
                assert all(bool(o[2]) for o in outs)

            run_pipelined()
            pipe_times = []
            for _ in range(3):
                t0 = time.perf_counter()
                run_pipelined()
                pipe_times.append((time.perf_counter() - t0) / len(padded))
            tp_min = float(np.min(pipe_times))
            put(f"minkunet34_fresh{tag}_pipelined_s", tp_min)
            flush()
            put(f"minkunet34_fresh{tag}_pipelined_points_per_sec",
                npts / tp_min
            )
            log(
                f"MinkUNet34 fresh{tag} pipelined (async launch, periodic "
                f"sync): {tp_min*1e3:.1f} ms/batch → "
                f"{npts/tp_min:,.0f} points/s"
            )

        # ``replayer`` was snapshotted before the fixed-geometry warm-up.
        deadline_gate("fresh-geometry")
        bench_fresh(
            "_geometry", replayer, mgr,
            [make_cloud(seed=s) for s in range(1, 7)],
        )
        deadline_gate("fresh-surface")
        bench_fresh(
            "_surface", replayer_h, mgr_h,
            [surface_cloud("26k", seed=s) for s in range(1, 6)],
        )

    except SkipSection:
        pass
    except Exception as e:  # keep the headline metric alive regardless
        log(f"MinkUNet34 bench failed: {e!r}")

    # ---- larger surface cloud (50k): slab-span stress -------------------
    # Real scans are 2-D surfaces in 3-D; per-tile index spans differ wildly
    # from uniform-random clouds.  This validates the outlier-tolerant slab
    # ladder at ~2× the headline size.
    with section("surface-50k"):
        deadline_gate("surface-50k")
        s_coords, s_feats = surface_cloud("50k")
        log(f"surface cloud: {len(s_coords)} voxels (room scan @ 5cm)")
        xs = ME.SparseTensor(s_feats, s_coords)
        ys = conv(xs)  # warm maps for the surface geometry
        kmap_s = xs.coordinate_manager.kernel_map(
            xs.coordinate_map_key, ys.coordinate_map_key,
            kernel_size=3, stride=1,
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
        put("single_conv_fwd_k3_surface_s", ts_min)
        put("surface_cloud_voxels", len(s_coords))
        log(f"single conv fwd (surface cloud, {len(s_coords)} vox): min {ts_min*1e3:.3f} ms")

        # measure the dense-grid path too when the dispatch would consider
        # it (with outlier-tolerant slabs the sparse kernel should win)
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
                    [conv_many_surface_dense(fpad_s, kernel)
                     for _ in range(CHAINS)]
                )
            )
            tsd_min = tsd_min / (CHAINS * REPS)
            put("single_conv_fwd_k3_surface_dense_s", tsd_min)
            log(
                f"single conv fwd (surface cloud, dense dispatch): "
                f"min {tsd_min*1e3:.3f} ms"
            )
            put("single_conv_fwd_k3_surface_best_s", min(ts_min, tsd_min))

    # ---- e2e including coordinate-map + kernel-map build (cold) ---------
    sync_floor = 3 * results.get("tunnel_sync_latency_s", 0.0)
    with section("cold-e2e"):
        deadline_gate("cold-e2e")

        def run_cold():
            mgr = ME.CoordinateManager(D=3)
            xt = ME.SparseTensor(feats, coords, coordinate_manager=mgr)
            yt = conv(xt)
            yt.padded_features.block_until_ready()

        tc_min, _ = timeit(run_cold, warmup=2, iters=5)
        put("single_conv_fwd_k3_cold_e2e_s", tc_min)
        put(
            "single_conv_fwd_k3_cold_e2e_net_s",
            max(tc_min - sync_floor, 0.0),
        )
        log(
            f"single conv fwd (cold maps, e2e): min {tc_min*1e3:.3f} ms "
            f"(~{sync_floor*1e3:.0f} ms of that is 3x tunnel sync latency; "
            f"net {max(tc_min - sync_floor, 0.0)*1e3:.1f} ms)"
        )

    # ---- kernel map build alone -----------------------------------------
    with section("kmap-build"):
        deadline_gate("kmap-build")

        def run_kmap():
            mgr = ME.CoordinateManager(D=3)
            key, _ = mgr.insert_and_map(coords)
            okey = mgr.stride(key, 1)
            km = mgr.kernel_map(key, okey, kernel_size=3, stride=1)
            km.in_idx.block_until_ready()

        tk_min, _ = timeit(run_kmap, warmup=2, iters=5)
        put("kernel_map_build_k3_s", tk_min)
        put("kernel_map_build_k3_net_s", max(tk_min - sync_floor, 0.0))
        log(
            f"coordinate init + kernel map build: min {tk_min*1e3:.3f} ms "
            f"(net of 3x tunnel sync: "
            f"{max(tk_min - sync_floor, 0.0)*1e3:.1f} ms)"
        )

    # ---- bf16 capacity: peak HBM of a big warm train step ------------
    # bf16 gives no speed on v5e (f32 runs at bf16 MXU rate), but it
    # halves activation memory; quantify the claim with measured peak
    # HBM instead of asserting it.
    try:
        deadline_gate("bf16-capacity")
        big_coords, big_feats = make_cloud(
            n_target=104_000, grid=(160, 160, 80), batch=4, seed=41
        )
        xb = ME.SparseTensor(big_feats, big_coords)
        _ = net(xb)  # build + cache the 104k-geometry maps eagerly
        # bf16 FIRST: peak_bytes_in_use never resets within a process,
        # so measure the smaller footprint before the larger one
        for dt, tag in ((jnp.bfloat16, "bf16"), (None, "f32")):
            ME.set_compute_dtype(dt)
            try:
                @nnx.jit
                def step_big(model, f):
                    def loss_fn(m):
                        xt = ME.SparseTensor(
                            f,
                            coordinate_map_key=xb.coordinate_map_key,
                            coordinate_manager=xb.coordinate_manager,
                        )
                        return jnp.sum(
                            m(xt).padded_features.astype(jnp.float32) ** 2
                        )

                    return nnx.value_and_grad(loss_fn)(model)

                out = step_big(net, xb.padded_features)
                jax.block_until_ready(jax.tree.leaves(out))
                stats = jax.devices()[0].memory_stats() or {}
                peak = stats.get("peak_bytes_in_use", 0)
                put(f"minkunet34_104k_peak_hbm_{tag}_gb",
                    peak / 2**30
                )
                log(f"104k-voxel batch=4 step peak HBM ({tag}): "
                    f"{peak/2**30:.2f} GiB")
            finally:
                ME.set_compute_dtype(None)
    except SkipSection:
        pass
    except Exception as e:
        log(f"bf16 capacity bench failed: {e!r}")

    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
