"""Endurance / lifecycle: many training steps over many DISTINCT geometries
in one process, with bounded host memory and no recompile storm.

Reference anchor: the leak loops in /root/reference/tests/python/convolution.py
(fwd/bwd in a loop watching memory).  Here the risk profile is different —
manager caches are per-geometry by design, so the lifecycle contract is
"one replayed manager per batch, dropped after the step" — and the recompile
risk is shape jitter defeating the capacity/slab ladders.  Both are asserted.
"""

import gc
import resource

import numpy as np
import pytest

import jax
from flax import nnx

import minkowskiengine_tpu as ME


def cloud(seed, n=400, hi=24):
    rng = np.random.RandomState(seed)
    # jitter the point count too — real batches never repeat a size
    n = n + int(rng.randint(0, 60))
    c = np.unique(
        np.concatenate(
            [rng.randint(0, 2, (n, 1)), rng.randint(0, hi, (n, 3))], axis=1
        ).astype(np.int32),
        axis=0,
    )
    return c, rng.randn(len(c), 3).astype(np.float32)


class TestEndurance:
    @pytest.mark.slow
    def test_100_fresh_geometries_bounded(self):
        import jax.numpy as jnp
        import optax

        class Net(ME.MinkowskiNetwork):
            def __init__(self, rngs):
                super().__init__(3)
                self.conv1 = ME.MinkowskiConvolution(
                    3, 16, kernel_size=3, stride=2, dimension=3, rngs=rngs
                )
                self.bn1 = ME.MinkowskiBatchNorm(16)
                self.relu = ME.MinkowskiReLU()
                self.convtr = ME.MinkowskiConvolutionTranspose(
                    16, 8, kernel_size=3, stride=2, dimension=3, rngs=rngs
                )
                self.head = ME.MinkowskiConvolution(
                    8, 4, kernel_size=1, dimension=3, rngs=rngs
                )

            def __call__(self, x):
                y = self.relu(self.bn1(self.conv1(x)))
                return self.head(self.convtr(y))

        c0, f0 = cloud(0)
        x0 = ME.SparseTensor(f0, c0)
        net = Net(nnx.Rngs(0))
        _ = net(x0)  # warm + record
        replayer = ME.GeometryReplayer(x0.coordinate_manager)
        optimizer = nnx.Optimizer(net, optax.sgd(1e-3), wrt=nnx.Param)
        graphdef, state = nnx.split((net, optimizer))

        traces = [0]

        @jax.jit
        def step(state, feats, geo):
            traces[0] += 1
            model, opt = nnx.merge(graphdef, state)
            mgr = ME.CoordinateManager.from_geometry(geo)
            # learnable target: the sign pattern of the input features
            labels = (feats[:, 0] > 0).astype(jnp.int32) + 2 * (
                feats[:, 1] > 0
            ).astype(jnp.int32)

            def loss_fn(m):
                xt = ME.SparseTensor(
                    feats,
                    coordinate_map_key=geo.entry_key,
                    coordinate_manager=mgr,
                )
                logits = m(xt).padded_features
                mask = xt.valid_row_mask.astype(jnp.float32)
                losses = optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels
                )
                return jnp.sum(losses * mask) / jnp.sum(mask)

            loss, grads = nnx.value_and_grad(loss_fn)(model)
            opt.update(model, grads)
            return loss, nnx.state((model, opt))

        def run_batch(seed, state):
            c, f = cloud(seed)
            mgr = replayer(c)
            geo = mgr.export_geometry()
            fp = mgr.reduce_features(geo.entry_key, f)
            loss, state = step(state, fp, geo)
            return float(loss), state

        losses = []
        N = 100
        # settle ratchets + compile on the first handful
        for seed in range(1, 11):
            loss, state = run_batch(seed, state)
            losses.append(loss)
        gc.collect()
        traces_settled = traces[0]
        rss_settled = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

        for seed in range(11, 56):
            loss, state = run_batch(seed, state)
            losses.append(loss)
        gc.collect()
        rss_mid = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        for seed in range(56, N + 1):
            loss, state = run_batch(seed, state)
            losses.append(loss)
        gc.collect()
        rss_end = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

        assert all(np.isfinite(l) for l in losses)
        # it trains: average loss over the last 20 below the first 20
        assert np.mean(losses[-20:]) < np.mean(losses[:20])

        # no recompile storm: after the first 10 batches settle the
        # capacity/slab ratchets, the remaining 90 must not retrace at all
        extra = traces[0] - traces_settled
        assert extra == 0, (
            f"{extra} retraces over 90 settled fresh-geometry batches "
            f"(total {traces[0]})"
        )

        # bounded host memory: peak RSS must PLATEAU, not climb per
        # geometry.  ru_maxrss is a monotone high-water mark, so a single
        # transient spike inflates it permanently — re-measured (r3): the
        # curve flattens after cache fill with ~0.4 MB/batch tail noise.
        # Two checks: total headroom, and DECELERATION (a real
        # per-geometry leak of L MB/batch grows both halves by ~45·L;
        # the second half must grow strictly less than the first).
        grow1_mb = (rss_mid - rss_settled) / 1024.0
        grow2_mb = (rss_end - rss_mid) / 1024.0
        total_mb = grow1_mb + grow2_mb
        assert total_mb < 450, (
            f"peak RSS grew {total_mb:.0f} MB over 90 batches "
            f"({grow1_mb:.0f} + {grow2_mb:.0f})"
        )
        assert grow2_mb <= max(grow1_mb, 32.0), (
            f"RSS still climbing: first-half +{grow1_mb:.0f} MB, "
            f"second-half +{grow2_mb:.0f} MB — per-geometry leak?"
        )

    def test_manager_lifecycle_is_per_batch(self):
        """Replayed managers are independent: dropping one frees its maps
        (nothing global retains them)."""
        import weakref

        c0, f0 = cloud(0)
        x0 = ME.SparseTensor(f0, c0)
        conv = ME.MinkowskiConvolution(
            3, 8, kernel_size=3, dimension=3, rngs=nnx.Rngs(0)
        )
        _ = conv(x0)
        replayer = ME.GeometryReplayer(x0.coordinate_manager)

        mgr = replayer(cloud(5)[0])
        ref = weakref.ref(mgr)
        del mgr
        gc.collect()
        assert ref() is None, "replayed CoordinateManager leaked"
