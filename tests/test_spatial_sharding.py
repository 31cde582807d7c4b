"""Spatial sharding: one cloud split across the 8-device mesh.

Checks the halo-exchange conv (and its all-gather fallback) against the
single-device reference conv — forward values, d_feats, and dW — plus
the dropped-pair counter and the sharded global pooling helpers.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.ops.functional import sparse_conv
from minkowskiengine_tpu.parallel.spatial import (
    make_spatial_mesh,
    required_halo,
    shard_rows,
    spatial_conv_apply,
    spatial_global_avg,
    spatial_global_sum,
)


def _cloud(seed=0, n=1500, lo=-25, hi=25, batches=2):
    rng = np.random.RandomState(seed)
    coords = np.unique(
        np.concatenate(
            [
                rng.randint(0, batches, (n * 2, 1)),
                rng.randint(lo, hi, (n * 2, 3)),
            ],
            axis=1,
        ).astype(np.int32),
        axis=0,
    )[:n]
    feats = rng.randn(len(coords), 3).astype(np.float32)
    return coords, feats


@pytest.fixture(scope="module")
def setup():
    coords, feats = _cloud()
    x = ME.SparseTensor(jnp.asarray(feats), jnp.asarray(coords))
    mgr = x.coordinate_manager
    key = x.coordinate_map_key
    okey = mgr.stride(key, 1)
    km = mgr.kernel_map(key, okey, kernel_size=3, stride=1)
    W = jax.random.normal(jax.random.PRNGKey(0), (27, 3, 16), jnp.float32)
    return x, km, W


def test_forward_matches_single_device(setup):
    x, km, W = setup
    mesh = make_spatial_mesh(8)
    f = shard_rows(x.padded_features, mesh)
    out, dropped = spatial_conv_apply(f, W, km, mesh=mesh)
    assert int(dropped) == 0
    ref = sparse_conv(x.padded_features, W, km.in_idx, km.out_idx_t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_forward_all_gather_fallback(setup):
    x, km, W = setup
    mesh = make_spatial_mesh(8)
    f = shard_rows(x.padded_features, mesh)
    out, dropped = spatial_conv_apply(
        f, W, km, mesh=mesh, force_all_gather=True
    )
    assert int(dropped) == 0
    ref = sparse_conv(x.padded_features, W, km.in_idx, km.out_idx_t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_narrow_halo_counts_dropped(setup):
    x, km, W = setup
    mesh = make_spatial_mesh(8)
    hf, hb = required_halo(km, 8)
    assert hf > 0
    f = shard_rows(x.padded_features, mesh)
    _, dropped = spatial_conv_apply(f, W, km, mesh=mesh, halo=0)
    assert int(dropped) > 0  # narrow halo is DETECTED, not silent


def test_gradients_match_single_device(setup):
    x, km, W = setup
    mesh = make_spatial_mesh(8)
    f0 = x.padded_features

    def loss_sharded(f, w):
        out, _ = spatial_conv_apply(f, w, km, mesh=mesh)
        return jnp.sum(out * out)

    def loss_ref(f, w):
        out = sparse_conv(f, w, km.in_idx, km.out_idx_t)
        return jnp.sum(out * out)

    fs = shard_rows(f0, mesh)
    (df_s, dw_s) = jax.grad(loss_sharded, argnums=(0, 1))(fs, W)
    (df_r, dw_r) = jax.grad(loss_ref, argnums=(0, 1))(f0, W)
    np.testing.assert_allclose(np.asarray(df_s), np.asarray(df_r), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(dw_s), np.asarray(dw_r), rtol=2e-4, atol=2e-4
    )


def test_strided_map_spatial(setup):
    """Stride-2 conv map: out capacity differs from in capacity."""
    x, _, _ = setup
    mgr = x.coordinate_manager
    key = x.coordinate_map_key
    okey = mgr.stride(key, 2)
    km2 = mgr.kernel_map(key, okey, kernel_size=2, stride=2)
    W = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 4), jnp.float32)
    mesh = make_spatial_mesh(8)
    f = shard_rows(x.padded_features, mesh)
    out, dropped = spatial_conv_apply(f, W, km2, mesh=mesh)
    assert int(dropped) == 0
    ref = sparse_conv(x.padded_features, W, km2.in_idx, km2.out_idx_t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_multilayer_network_sharded(setup):
    """conv → SyncBN(space) → relu → strided conv → global avg: a whole
    small network forward over sharded rows matches single-device."""
    x, km, W = setup
    mgr = x.coordinate_manager
    key = x.coordinate_map_key
    okey2 = mgr.stride(key, 2)
    km2 = mgr.kernel_map(key, okey2, kernel_size=2, stride=2)
    W2 = jax.random.normal(jax.random.PRNGKey(2), (8, 16, 8), jnp.float32)
    mesh = make_spatial_mesh(8)
    cap = x.capacity
    valid = jnp.asarray(np.arange(cap) < x.size)
    n2 = mgr.size(okey2)
    cap2 = mgr.capacity(okey2)
    valid2_np = np.arange(cap2) < n2
    coords2 = np.asarray(mgr.get_coordinate_map(okey2).coordinates)
    bids2 = jnp.asarray(
        np.where(valid2_np, coords2[:, 0], -1).astype(np.int32)
    )

    from minkowskiengine_tpu.parallel.spatial import spatial_masked_moments

    def net_sharded(f):
        h, d1 = spatial_conv_apply(f, W, km, mesh=mesh)
        mean, var = spatial_masked_moments(h, valid, mesh=mesh)
        h = (h - mean[None, :]) * jax.lax.rsqrt(var[None, :] + 1e-5)
        h = jnp.where(valid[:, None], jax.nn.relu(h), 0.0)
        h2, d2 = spatial_conv_apply(h, W2, km2, mesh=mesh)
        return spatial_global_avg(h2, bids2, 2, mesh=mesh), d1 + d2

    def net_ref(f):
        h = sparse_conv(f, W, km.in_idx, km.out_idx_t)
        m = valid.astype(jnp.float32)[:, None]
        n = jnp.sum(m)
        mean = jnp.sum(h * m, 0) / n
        var = jnp.sum(h * h * m, 0) / n - mean * mean
        h = (h - mean[None, :]) * jax.lax.rsqrt(var[None, :] + 1e-5)
        h = jnp.where(valid[:, None], jax.nn.relu(h), 0.0)
        h2 = sparse_conv(h, W2, km2.in_idx, km2.out_idx_t)
        out = []
        for b in range(2):
            sel = (bids2 == b).astype(jnp.float32)[:, None]
            out.append(jnp.sum(h2 * sel, 0) / jnp.maximum(jnp.sum(sel), 1.0))
        return jnp.stack(out)

    f = shard_rows(x.padded_features, mesh)
    out_s, dropped = net_sharded(f)
    assert int(dropped) == 0
    out_r = net_ref(x.padded_features)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_r), rtol=1e-4, atol=1e-5
    )


def test_global_pool_sharded(setup):
    x, _, _ = setup
    mesh = make_spatial_mesh(8)
    f = shard_rows(x.padded_features, mesh)
    cap = x.capacity
    coords = np.asarray(x.coordinate_map.coordinates)
    valid = np.arange(cap) < x.size
    bids = jnp.asarray(np.where(valid, coords[:, 0], -1).astype(np.int32))
    s = spatial_global_sum(f, bids, 2, mesh=mesh)
    a = spatial_global_avg(f, bids, 2, mesh=mesh)
    fnp = np.asarray(x.padded_features)
    for b in range(2):
        rows = fnp[valid & (coords[:, 0] == b)]
        np.testing.assert_allclose(np.asarray(s[b]), rows.sum(0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(a[b]), rows.mean(0), atol=1e-5)


class TestModelLevel:
    """Whole-model spatial sharding via ``ME.spatial_execution`` — every
    conv (incl. the k=5 stem and the transpose-conv decoder: the halo
    path on ``swap()``ped strided maps) runs halo-sharded; BN/ReLU/cat
    auto-partition under GSPMD."""

    @pytest.fixture(scope="class")
    def unet_fixture(self):
        from minkowskiengine_tpu.models import MinkUNet14A
        from minkowskiengine_tpu.utils.datasets import room_scan_voxels

        coords, feats = room_scan_voxels(
            voxel_size=0.12, n_points=8_000, extent=(1.2, 1.2, 1.4),
            n_objects=2, seed=5,
        )
        x = ME.SparseTensor(feats, coords)
        net = MinkUNet14A(3, 4, D=3)
        net.eval()  # frozen BN stats: no state mutation between runs
        y_ref = net(x)  # single device, warms every coordinate/kernel map
        return x, net, y_ref

    @pytest.mark.slow
    def test_minkunet_forward_equal(self, unet_fixture):
        from minkowskiengine_tpu.parallel import shard_sparse_tensor

        x, net, y_ref = unet_fixture
        mesh = make_spatial_mesh(8)
        xs = shard_sparse_tensor(x, mesh)
        with ME.spatial_execution(mesh):
            y_sp = net(xs)
        np.testing.assert_allclose(
            np.asarray(y_sp.padded_features),
            np.asarray(y_ref.padded_features),
            rtol=1e-4, atol=1e-4,
        )

    @pytest.mark.slow
    def test_minkunet_backward_equal(self, unet_fixture):
        from flax import nnx

        from minkowskiengine_tpu.parallel import shard_sparse_tensor

        x, net, _ = unet_fixture
        mesh = make_spatial_mesh(8)
        xs = shard_sparse_tensor(x, mesh)

        def loss(model, xt):
            return jnp.sum(model(xt).padded_features ** 2)

        g_ref = nnx.grad(loss)(net, x)
        with ME.spatial_execution(mesh):
            g_sp = nnx.grad(loss)(net, xs)
        scale = max(
            float(jnp.max(jnp.abs(l))) for l in jax.tree.leaves(g_ref)
        )
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sp)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b),
                rtol=2e-3, atol=2e-4 * max(scale, 1.0),
            )
