"""Dense-grid conv path: oracle exactness and plan machinery.

(The TPU-only dispatch decision is covered by the cost-model unit below;
CPU tests exercise the dense computation itself against the dictionary
oracle — the same oracle the sparse path is tested against, so the two
implementations are proven interchangeable.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.ops.dense_conv import (
    DensePlan,
    build_dense_plan,
    dense_conv,
    dense_conv_beneficial,
)

from oracles import conv_oracle, cube_offsets


def rand_tensor(n, d, ch, seed=0, lo=-6, hi=6):
    rng = np.random.RandomState(seed)
    coords = np.unique(
        np.concatenate(
            [rng.randint(0, 2, (n, 1)), rng.randint(lo, hi, (n, d))], axis=1
        ).astype(np.int32),
        axis=0,
    )
    return coords, rng.randn(len(coords), ch).astype(np.float32)


class TestDenseConv:
    @pytest.mark.parametrize("ks,dil,d", [(3, 1, 3), (5, 1, 3), (2, 1, 3),
                                          (3, 2, 3), (3, 1, 2)])
    def test_vs_oracle(self, ks, dil, d):
        coords, feats = rand_tensor(80, d, 3, seed=ks * 10 + dil)
        x = ME.SparseTensor(feats, coords)
        plan = build_dense_plan(x.coordinate_map)
        K = ks**d
        W = (np.random.RandomState(0).randn(K, 3, 4) * 0.3).astype(np.float32)
        out = dense_conv(
            x.padded_features, jnp.asarray(W), plan, (ks,) * d, (dil,) * d
        )
        expected = conv_oracle(
            x.C, np.asarray(x.F), np.asarray(x.C), W,
            cube_offsets(ks, dil, 1, d),
        )
        np.testing.assert_allclose(
            np.asarray(out)[: x.size], expected, rtol=1e-4, atol=1e-4
        )

    def test_strided_map(self):
        rng = np.random.RandomState(9)
        coords = np.unique(
            np.concatenate(
                [np.zeros((40, 1), np.int64), rng.randint(-4, 4, (40, 3)) * 2],
                axis=1,
            ).astype(np.int32),
            axis=0,
        )
        x = ME.SparseTensor(
            rng.randn(len(coords), 3).astype(np.float32), coords, tensor_stride=2
        )
        plan = build_dense_plan(x.coordinate_map)
        W = (rng.randn(27, 3, 4) * 0.3).astype(np.float32)
        out = dense_conv(
            x.padded_features, jnp.asarray(W), plan, (3, 3, 3), (1, 1, 1)
        )
        expected = conv_oracle(
            x.C, np.asarray(x.F), np.asarray(x.C), W, cube_offsets(3, 1, 2, 3)
        )
        np.testing.assert_allclose(
            np.asarray(out)[: x.size], expected, rtol=1e-4, atol=1e-4
        )

    def test_gradients_flow(self):
        coords, feats = rand_tensor(40, 3, 2, seed=4)
        x = ME.SparseTensor(feats, coords)
        plan = build_dense_plan(x.coordinate_map)
        W = jnp.asarray(
            (np.random.RandomState(1).randn(27, 2, 3) * 0.3).astype(np.float32)
        )

        g = jax.grad(
            lambda f: jnp.sum(
                dense_conv(f, W, plan, (3,) * 3, (1,) * 3) ** 2
            )
        )(x.padded_features)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)[: x.size]).max() > 0

    @pytest.mark.parametrize("ks", [3, 5])
    def test_grads_match_native_ad(self, ks):
        """The scatter-add-free custom VJPs (row<->grid edges + dW routing)
        must equal native autodiff through a plain scatter/conv/gather
        implementation, for BOTH d_feats and dW."""
        from minkowskiengine_tpu.ops.dense_conv import _raw_dense_conv

        coords, feats = rand_tensor(60, 3, 2, seed=ks)
        x = ME.SparseTensor(feats, coords)
        plan = build_dense_plan(x.coordinate_map)
        K = ks**3
        W = jnp.asarray(
            (np.random.RandomState(2).randn(K, 2, 3) * 0.3).astype(np.float32)
        )
        cells = plan.cells
        B = plan.grid_shape[0]
        sp = plan.grid_shape[1:]
        safe = jnp.where(plan.flat_idx >= 0, plan.flat_idx, cells)
        g_out = jnp.asarray(
            np.random.RandomState(3).randn(x.capacity, 3).astype(np.float32)
        )

        def plain(f, w):
            dns = (
                jnp.zeros((cells + 1, 2), f.dtype)
                .at[safe].set(f, mode="drop")[:cells]
                .reshape((B,) + sp + (2,))
            )
            w5 = w.reshape(tuple(reversed((ks,) * 3)) + (2, 3))
            w5 = jnp.transpose(w5, (2, 1, 0, 3, 4))
            pad = tuple((ks // 2, ks // 2) for _ in range(3))
            o = _raw_dense_conv(dns, w5, (ks,) * 3, (1, 1, 1), pad)
            flat = o.reshape(cells, 3)
            return jnp.sum(
                jnp.take(flat, safe, axis=0, mode="fill", fill_value=0)
                * g_out
            )

        def routed(f, w):
            return jnp.sum(
                dense_conv(f, w, plan, (ks,) * 3, (1, 1, 1)) * g_out
            )

        for argnum in (0, 1):
            g_plain = jax.grad(plain, argnums=argnum)(x.padded_features, W)
            g_routed = jax.grad(routed, argnums=argnum)(x.padded_features, W)
            np.testing.assert_allclose(
                np.asarray(g_routed), np.asarray(g_plain),
                rtol=1e-4, atol=1e-4,
            )

    def test_cost_model(self):
        # r5 re-calibration (prof_densebwd5, sum-consumed outputs): the
        # shifted-slice dW costs ~1.4x the dense forward, so the dense
        # route wins the k=5 stem even on a 64^3 grid — sparse k=5 costs
        # 6.4 ms fwd alone vs dense ~2.8 ms fwd+dW at 110k cells
        plan = DensePlan(jnp.zeros((32768,), jnp.int32), (1, 64, 64, 64))
        assert dense_conv_beneficial(plan, 32768, 125, 3, 32, map_cached=False)
        assert not dense_conv_beneficial(plan, 32768, 27, 128, 128)
        # compact deeper-level grids DO win for k=3 mid channels (measured
        # in-situ: dense overlaps with neighbors, slab kernels serialize)
        small = DensePlan(jnp.zeros((32768,), jnp.int32), (1, 32, 64, 32))
        assert dense_conv_beneficial(small, 32768, 27, 32, 96, map_cached=False)
        # surface scans: exploded cached slabs route to dense at any width
        assert dense_conv_beneficial(
            plan, 65536, 27, 3, 32, cached_slab_size=3328
        )
        # giant grid → memory cap refuses
        huge = DensePlan(jnp.zeros((8,), jnp.int32), (1, 4096, 4096, 64))
        assert not dense_conv_beneficial(huge, 32768, 125, 3, 32)

    def test_manager_plan_cached(self):
        coords, feats = rand_tensor(30, 3, 2, seed=5)
        x = ME.SparseTensor(feats, coords)
        p1 = x.coordinate_manager.dense_plan(x.coordinate_map_key)
        p2 = x.coordinate_manager.dense_plan(x.coordinate_map_key)
        assert p1 is p2
