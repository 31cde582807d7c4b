"""Multi-device data parallelism over the simulated 8-CPU mesh —
coverage the reference never had (its multi-GPU paths were untested
examples, SURVEY.md §4)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import nnx

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.parallel import (
    make_data_parallel_step,
    make_mesh,
    shard_batch,
)


def small_net_and_geometry(seed=0):
    rng = np.random.RandomState(seed)
    coords = np.unique(
        np.concatenate(
            [rng.randint(0, 2, (150, 1)), rng.randint(0, 12, (150, 3))], axis=1
        ).astype(np.int32),
        axis=0,
    )
    x = ME.SparseTensor(rng.randn(len(coords), 3).astype(np.float32), coords)

    class Net(ME.MinkowskiNetwork):
        def __init__(self, rngs):
            super().__init__(3)
            self.conv = ME.MinkowskiConvolution(
                3, 8, kernel_size=3, dimension=3, rngs=rngs
            )
            self.bn = ME.MinkowskiSyncBatchNorm(8)
            self.relu = ME.MinkowskiReLU()
            self.head = ME.MinkowskiConvolution(
                8, 4, kernel_size=1, dimension=3, rngs=rngs
            )

        def __call__(self, x):
            return self.head(self.relu(self.bn(self.conv(x))))

    net = Net(nnx.Rngs(0))
    # warm the coordinate phase outside the mesh (plain BN semantics not
    # needed — SyncBN.axis_name only fires inside shard_map... warm with a
    # stop-gradient eager pass using a non-sync clone of stats)
    return net, x


class TestDataParallel:
    def test_eight_device_step(self):
        assert len(jax.devices()) == 8
        net, x = small_net_and_geometry()
        # warm coordinate caches with a plain (non-sync) pass
        plain = ME.MinkowskiBatchNorm(8)
        _ = plain(net.conv(x))

        mesh = make_mesh(8)
        optimizer = nnx.Optimizer(net, optax.sgd(1e-2), wrt=nnx.Param)
        cap, n = x.capacity, x.size
        mgr, key = x.coordinate_manager, x.coordinate_map_key

        def loss_fn(model, feats_shard, labels_shard):
            xt = ME.SparseTensor(
                feats_shard[0], coordinate_map_key=key, coordinate_manager=mgr
            )
            logits = model(xt).padded_features
            mask = (jnp.arange(cap) < n).astype(jnp.float32)
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels_shard[0]
            )
            return jnp.sum(losses * mask) / jnp.sum(mask)

        step = make_data_parallel_step(net, optimizer, loss_fn, mesh)
        rng = np.random.RandomState(1)
        feats = shard_batch(
            jnp.asarray(rng.randn(8, cap, 3).astype(np.float32)), mesh
        )
        labels = shard_batch(
            jnp.asarray(rng.randint(0, 4, (8, cap)).astype(np.int32)), mesh
        )
        w_before = np.asarray(net.conv.kernel[...]).copy()
        losses = [float(step(net, optimizer, feats, labels)) for _ in range(3)]
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]  # it actually learns
        assert not np.allclose(np.asarray(net.conv.kernel[...]), w_before)

    def test_sync_bn_matches_global_bn(self):
        """SyncBN over the mesh must equal plain BN over the concatenated
        global batch (the defining property of SyncBatchNorm)."""
        from jax.sharding import PartitionSpec as P

        rng = np.random.RandomState(2)
        mesh = make_mesh(4)
        feats = rng.randn(4, 64, 8).astype(np.float32)

        # track_running_stats=False: the module is closed over (not passed
        # through the transform), so stats must not mutate inside the trace
        sync = ME.MinkowskiSyncBatchNorm(
            8, axis_name="data", track_running_stats=False
        )
        plain = ME.MinkowskiBatchNorm(8, track_running_stats=False)

        def per_device(f):
            return sync._apply(f[0], 64)

        sharded = nnx.shard_map(
            per_device,
            mesh=mesh,
            in_specs=P("data"),
            out_specs=P("data"),
            check_vma=False,
        )
        out_sync = np.asarray(
            sharded(shard_batch(jnp.asarray(feats), mesh))
        ).reshape(-1, 8)
        out_plain = np.asarray(plain._apply(jnp.asarray(feats).reshape(-1, 8), 256))
        np.testing.assert_allclose(out_sync, out_plain, rtol=1e-4, atol=1e-5)
