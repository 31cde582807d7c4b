"""Fresh-geometry pipeline: oplog replay, Geometry-as-argument steps,
shape ratchets (VERDICT r1 item 3 — the real training regime is a new
point cloud every batch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.models import MinkUNet14A


def cloud(seed, n=300, hi=20):
    rng = np.random.RandomState(seed)
    c = np.unique(
        np.concatenate(
            [rng.randint(0, 2, (n, 1)), rng.randint(0, hi, (n, 3))], axis=1
        ).astype(np.int32),
        axis=0,
    )
    return c, rng.randn(len(c), 3).astype(np.float32)


@pytest.fixture(scope="module")
def warm():
    c0, f0 = cloud(0)
    x = ME.SparseTensor(f0, c0)
    net = MinkUNet14A(3, 4, D=3, rngs=nnx.Rngs(0))
    net.eval_mode = True
    _ = net(x)
    return x, net


class TestGeometryPipeline:
    def test_replay_matches_eager_single_trace(self, warm):
        x, net = warm
        replayer = ME.GeometryReplayer(x.coordinate_manager)
        graphdef, state = nnx.split(net)
        traces = [0]

        @jax.jit
        def step(state, feats, geo):
            traces[0] += 1
            model = nnx.merge(graphdef, state)
            mgr = ME.CoordinateManager.from_geometry(geo)
            xt = ME.SparseTensor(
                feats,
                coordinate_map_key=geo.entry_key,
                coordinate_manager=mgr,
            )
            return model(xt).padded_features

        for seed in range(1, 5):
            c, f = cloud(seed)
            mgr = replayer(c)
            geo = mgr.export_geometry()
            fp = mgr.reduce_features(geo.entry_key, f)
            out = step(state, fp, geo)
            oe = net(ME.SparseTensor(f, c))
            n = oe.size
            np.testing.assert_allclose(
                np.asarray(out)[:n],
                np.asarray(oe.padded_features)[:n],
                rtol=2e-5,
                atol=2e-5,
            )
        assert traces[0] == 1, f"step retraced {traces[0]} times"

    def test_deferred_replay_single_sync(self, warm):
        x, _ = warm
        replayer = ME.GeometryReplayer(x.coordinate_manager)
        from minkowskiengine_tpu.coords import manager as M

        c, _ = cloud(7)
        orig = jax.device_get
        count = [0]

        def counting(v):
            count[0] += 1
            return orig(v)

        M.jax.device_get = counting
        try:
            replayer(c)
        finally:
            M.jax.device_get = orig
        assert count[0] == 1, f"deferred replay used {count[0]} syncs"

    @pytest.mark.slow
    def test_capacity_floor_ratchet(self, warm):
        """A much larger batch must not be silently truncated: the deferred
        replay detects the floor violation and re-runs in sync mode."""
        x, net = warm
        replayer = ME.GeometryReplayer(x.coordinate_manager)
        c, f = cloud(9, n=3000, hi=28)  # crosses the capacity bucket
        mgr = replayer(c)
        geo = mgr.export_geometry()
        assert mgr.size(geo.entry_key) == len(c)
        # next replay at the old size uses the ratcheted (bigger) floor
        c2, _ = cloud(10)
        mgr2 = replayer(c2)
        assert mgr2.capacity(mgr2._entry_key) >= len(c)

    def test_frozen_view_rejects_builds(self, warm):
        x, _ = warm
        geo = x.coordinate_manager.export_geometry()
        view = ME.CoordinateManager.from_geometry(geo)
        with pytest.raises(RuntimeError, match="frozen"):
            view.insert_and_map(np.array([[0, 1, 1, 1]], np.int32))

    @pytest.mark.slow
    def test_compiled_replayer_matches_eager(self, warm):
        """The fully-traced coordinate phase (ONE jitted program per batch)
        must produce bit-identical results to the eager path, never fall
        back once ratchets are settled, and recover transparently when a
        floor is violated."""
        x, net = warm
        sync = ME.GeometryReplayer(x.coordinate_manager)
        for s in range(1, 4):  # settle ratchets
            sync(cloud(s)[0])
        crep = ME.CompiledReplayer(x.coordinate_manager)
        crep.cap_floors = dict(sync.cap_floors)
        crep.slab_floors = dict(sync.slab_floors)
        crep.grid_floors = dict(sync.grid_floors)
        crep.join_floors = dict(sync.join_floors)

        graphdef, state = nnx.split(net)

        @jax.jit
        def step(state, feats, geo):
            model = nnx.merge(graphdef, state)
            mgr = ME.CoordinateManager.from_geometry(geo)
            xt = ME.SparseTensor(
                feats,
                coordinate_map_key=geo.entry_key,
                coordinate_manager=mgr,
            )
            return model(xt).padded_features

        for s in range(4, 8):
            c, f = cloud(s)
            geo, fp = crep(c, f)
            out = step(state, fp, geo)
            oe = net(ME.SparseTensor(f, c))
            n = oe.size
            np.testing.assert_allclose(
                np.asarray(out)[:n],
                np.asarray(oe.padded_features)[:n],
                rtol=2e-5,
                atol=2e-5,
            )
        assert crep._version == 0, "traced path fell back on settled floors"

        # floor violation: transparently recovers (ratchet + sync replay)
        c, f = cloud(9, n=3000, hi=28)
        geo, fp = crep(c, f)
        assert crep._version >= 1
        out = step(state, fp, geo)
        oe = net(ME.SparseTensor(f, c))
        n = oe.size
        np.testing.assert_allclose(
            np.asarray(out)[:n],
            np.asarray(oe.padded_features)[:n],
            rtol=2e-5,
            atol=2e-5,
        )
        # once the big bucket settles, big clouds trace again
        for s in (10, 11):
            crep(*cloud(s, n=3000, hi=28))
        v = crep._version
        geo, fp = crep(*cloud(12, n=3000, hi=28))
        assert crep._version == v, "big bucket still falling back"

    def test_stacked_geometries(self, warm):
        """stack_geometries produces a leading device axis on every leaf."""
        x, _ = warm
        replayer = ME.GeometryReplayer(x.coordinate_manager)
        geos = []
        for seed in (11, 12):
            mgr = replayer(cloud(seed)[0])
            geos.append(mgr.export_geometry())
        stacked = ME.stack_geometries(geos)
        l0 = jax.tree.leaves(geos[0])
        ls = jax.tree.leaves(stacked)
        assert all(
            s.shape == (2,) + a.shape for a, s in zip(l0, ls)
        )
        from minkowskiengine_tpu.coords import squeeze_geometry

        g0 = jax.tree.map(lambda v: v[0], stacked)
        for a, b in zip(jax.tree.leaves(g0), l0):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFloorViolationRecovery:
    @pytest.mark.slow
    def test_ratchet_and_retry_reproduces_eager(self, warm):
        """The documented recovery protocol — traced replay, ok=False ⇒
        sync-replay (ratchet) + adopt + RE-JIT — must end bit-comparable
        to the eager forward, even when the new geometry blows the warm
        floors (adversarial plane cloud after uniform warm-up: long slab
        spans / many sub-window outliers at the same capacity bucket)."""
        from minkowskiengine_tpu.coords.map import bucket_capacity

        x, net = warm
        graphdef, state = nnx.split(net)
        replayer = ME.GeometryReplayer(x.coordinate_manager)
        replayer(cloud(1)[0])  # settle on benign geometry
        crep = ME.CompiledReplayer(x.coordinate_manager).adopt(replayer)

        # adversarial geometry: two dense planes -> scanline wraps, long
        # span tails (the regime that overflows warm outlier caps)
        rng = np.random.RandomState(7)
        xy = rng.randint(0, 28, (600, 2))
        z = np.where(rng.rand(600) < 0.5, 0, 13)
        cB = np.unique(
            np.concatenate(
                [np.zeros((600, 1), np.int64), xy, z[:, None]], axis=1
            ).astype(np.int32),
            axis=0,
        )[:290]
        fB = rng.randn(len(cB), 3).astype(np.float32)

        def pad(c, f):
            cap = bucket_capacity(len(c))
            cp = np.zeros((cap, 4), np.int32)
            cp[: len(c)] = c
            fp = np.zeros((cap, 3), np.float32)
            fp[: len(c)] = f
            return (jnp.asarray(cp), jnp.asarray(len(c), jnp.int32),
                    jnp.asarray(fp))

        def make_step():
            @jax.jit
            def step(state, cp, n, fp):
                geo, fr, ok = crep.trace(cp, n, fp)
                model = nnx.merge(graphdef, state)
                mgr = ME.CoordinateManager.from_geometry(geo)
                xt = ME.SparseTensor(
                    fr, coordinate_map_key=geo.entry_key,
                    coordinate_manager=mgr,
                )
                return model(xt).padded_features, ok

            return step

        step = make_step()
        cp, n, fp = pad(cB, fB)
        out, ok = step(state, cp, n, fp)
        if not bool(ok):
            replayer(cB)  # sync replay: ratchets the violated floors
            crep.adopt(replayer)
            step = make_step()  # stale-jit trap: MUST re-jit
            out, ok = step(state, cp, n, fp)
        assert bool(ok)
        ref = net(ME.SparseTensor(jnp.asarray(fB), jnp.asarray(cB)))
        nv = ref.size
        np.testing.assert_allclose(
            np.asarray(out)[:nv], np.asarray(ref.padded_features)[:nv],
            rtol=2e-5, atol=2e-5,
        )
