"""Convolution correctness: dense-dictionary oracle + gradients.

Mirrors the reference test strategy (tests/python/convolution.py): small
deterministic fixtures, numerical oracles, gradcheck.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.kernel_generator import (
    hyper_cross_offsets,
    hyper_cube_offsets,
)
from minkowskiengine_tpu.ops import functional as F

from oracles import conv_oracle, conv_transpose_oracle, cube_offsets


def rand_tensor(n, d, ch, batch=2, lo=-8, hi=8, seed=0):
    rng = np.random.RandomState(seed)
    coords = np.unique(
        np.concatenate(
            [
                rng.randint(0, batch, (n, 1)),
                rng.randint(lo, hi, (n, d)),
            ],
            axis=1,
        ).astype(np.int32),
        axis=0,
    )
    feats = rng.randn(len(coords), ch).astype(np.float32)
    return coords, feats


class TestConvForward:
    @pytest.mark.parametrize("kernel_size,stride,dilation", [
        (3, 1, 1),
        (2, 1, 1),
        (3, 2, 1),
        (3, 1, 2),
        (2, 2, 1),
    ])
    def test_vs_oracle_2d(self, kernel_size, stride, dilation):
        coords, feats = rand_tensor(60, 2, 3, seed=kernel_size * 10 + stride)
        x = ME.SparseTensor(feats, coords)
        conv = ME.MinkowskiConvolution(
            3, 5, kernel_size=kernel_size, stride=stride, dilation=dilation,
            dimension=2,
        )
        y = conv(x)
        W = np.asarray(conv.kernel[...])
        offsets = cube_offsets(kernel_size, dilation, 1, 2)
        expected = conv_oracle(x.C, np.asarray(x.F), np.asarray(y.C), W, offsets)
        np.testing.assert_allclose(np.asarray(y.F), expected, rtol=1e-4, atol=1e-4)
        # output coords are the strided input coords
        exp_coords = np.unique(
            np.concatenate(
                [coords[:, :1], (coords[:, 1:] // stride) * stride], axis=1
            ),
            axis=0,
        )
        np.testing.assert_array_equal(np.asarray(y.C), exp_coords)

    def test_vs_oracle_3d(self):
        coords, feats = rand_tensor(80, 3, 4, seed=3)
        x = ME.SparseTensor(feats, coords)
        conv = ME.MinkowskiConvolution(4, 6, kernel_size=3, dimension=3)
        y = conv(x)
        W = np.asarray(conv.kernel[...])
        offsets = cube_offsets(3, 1, 1, 3)
        expected = conv_oracle(x.C, np.asarray(x.F), np.asarray(y.C), W, offsets)
        np.testing.assert_allclose(np.asarray(y.F), expected, rtol=1e-4, atol=1e-4)

    def test_hyper_cross(self):
        coords, feats = rand_tensor(50, 2, 3, seed=7)
        x = ME.SparseTensor(feats, coords)
        kg = ME.KernelGenerator(
            kernel_size=3, stride=1, dilation=1,
            region_type=ME.RegionType.HYPER_CROSS, dimension=2,
        )
        conv = ME.MinkowskiConvolution(
            3, 5, kernel_size=3, kernel_generator=kg, dimension=2
        )
        y = conv(x)
        W = np.asarray(conv.kernel[...])
        offsets = hyper_cross_offsets((3, 3), (1, 1), (1, 1))
        expected = conv_oracle(x.C, np.asarray(x.F), np.asarray(y.C), W, offsets)
        np.testing.assert_allclose(np.asarray(y.F), expected, rtol=1e-4, atol=1e-4)

    def test_kernel_size_1(self):
        coords, feats = rand_tensor(30, 2, 3, seed=9)
        x = ME.SparseTensor(feats, coords)
        conv = ME.MinkowskiConvolution(3, 7, kernel_size=1, dimension=2)
        y = conv(x)
        assert conv.use_mm
        np.testing.assert_allclose(
            np.asarray(y.F),
            np.asarray(x.F) @ np.asarray(conv.kernel[...]),
            rtol=1e-5,
            atol=1e-5,
        )

    def test_bias_padding_not_leaked(self):
        """Bias on padding rows must never leak into later gathers."""
        coords, feats = rand_tensor(40, 2, 3, seed=11)
        x = ME.SparseTensor(feats, coords)
        c1 = ME.MinkowskiConvolution(3, 4, kernel_size=3, dimension=2, bias=True)
        c2 = ME.MinkowskiConvolution(4, 2, kernel_size=3, dimension=2)
        y = c2(c1(x))
        W1, b1 = np.asarray(c1.kernel[...]), np.asarray(c1.bias[...])
        W2 = np.asarray(c2.kernel[...])
        offsets = cube_offsets(3, 1, 1, 2)
        mid = conv_oracle(x.C, np.asarray(x.F), np.asarray(x.C), W1, offsets) + b1
        expected = conv_oracle(x.C, mid, np.asarray(y.C), W2, offsets)
        np.testing.assert_allclose(np.asarray(y.F), expected, rtol=1e-4, atol=1e-4)


class TestConvTranspose:
    def test_roundtrip_coordinates(self):
        """Strided conv then transpose conv lands on the original coords."""
        coords, feats = rand_tensor(60, 2, 3, seed=21)
        x = ME.SparseTensor(feats, coords)
        down = ME.MinkowskiConvolution(3, 4, kernel_size=2, stride=2, dimension=2)
        up = ME.MinkowskiConvolutionTranspose(4, 3, kernel_size=2, stride=2, dimension=2)
        z = up(down(x))
        assert z.tensor_stride == (1, 1)
        np.testing.assert_array_equal(np.asarray(z.C), np.asarray(x.C))

    def test_vs_oracle(self):
        coords, feats = rand_tensor(60, 2, 3, seed=22)
        x = ME.SparseTensor(feats, coords)
        down = ME.MinkowskiConvolution(3, 4, kernel_size=2, stride=2, dimension=2)
        up = ME.MinkowskiConvolutionTranspose(4, 3, kernel_size=2, stride=2, dimension=2)
        y = down(x)
        z = up(y)
        W = np.asarray(up.kernel[...])
        offsets = cube_offsets(2, 1, 1, 2)  # out tensor stride = 1
        expected = conv_transpose_oracle(
            np.asarray(y.C), np.asarray(y.F), np.asarray(z.C), W, offsets
        )
        np.testing.assert_allclose(np.asarray(z.F), expected, rtol=1e-4, atol=1e-4)

    def test_generative_expands(self):
        coords = np.array([[0, 0, 0], [0, 4, 4]], np.int32)
        feats = np.ones((2, 2), np.float32)
        x = ME.SparseTensor(feats, coords, tensor_stride=2)
        gen = ME.MinkowskiGenerativeConvolutionTranspose(
            2, 2, kernel_size=3, stride=2, dimension=2
        )
        z = gen(x)
        assert z.tensor_stride == (1, 1)
        # each input produces a 3x3 neighborhood at stride 1
        exp = set()
        for c in coords:
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    exp.add((c[0], c[1] + dx, c[2] + dy))
        got = {tuple(r) for r in np.asarray(z.C)}
        assert got == exp


class TestChannelwise:
    def test_vs_oracle(self):
        coords, feats = rand_tensor(40, 2, 5, seed=31)
        x = ME.SparseTensor(feats, coords)
        conv = ME.MinkowskiChannelwiseConvolution(5, kernel_size=3, dimension=2)
        y = conv(x)
        W = np.asarray(conv.kernel[...])  # (K, ch)
        offsets = cube_offsets(3, 1, 1, 2)
        table = {tuple(c): i for i, c in enumerate(np.asarray(x.C))}
        expected = np.zeros((y.size, 5))
        for j, u in enumerate(np.asarray(y.C)):
            for k, off in enumerate(offsets):
                i = table.get((u[0],) + tuple(u[1:] + off))
                if i is not None:
                    expected[j] += np.asarray(x.F)[i] * W[k]
        np.testing.assert_allclose(np.asarray(y.F), expected, rtol=1e-4, atol=1e-4)


class TestConvGradients:
    def test_gradcheck(self):
        from jax.test_util import check_grads

        coords, feats = rand_tensor(25, 2, 3, seed=41)
        mgr = ME.CoordinateManager(D=2)
        key, _ = mgr.insert_and_map(coords)
        out_key = mgr.stride(key, 1)
        kmap = mgr.kernel_map(key, out_key, kernel_size=3, stride=1)
        cap = mgr.capacity(key)
        fpad = np.zeros((cap, 3), np.float32)
        fpad[: len(coords)] = feats
        W = np.random.RandomState(0).randn(9, 3, 4).astype(np.float32) * 0.3

        def f(fp, w):
            return F.sparse_conv(fp, w, kmap.in_idx, kmap.out_idx_t)

        check_grads(
            f,
            (jnp.asarray(fpad), jnp.asarray(W)),
            order=1,
            modes=("rev",),
            atol=2e-2,
            rtol=2e-2,
        )

    def test_custom_vjp_matches_autodiff_of_fwd(self):
        """The gather-based VJP must equal autodiff of the forward graph."""
        coords, feats = rand_tensor(30, 2, 3, seed=43)
        mgr = ME.CoordinateManager(D=2)
        key, _ = mgr.insert_and_map(coords)
        out_key = mgr.stride(key, 2)
        kmap = mgr.kernel_map(key, out_key, kernel_size=3, stride=2)
        cap = mgr.capacity(key)
        fpad = np.zeros((cap, 3), np.float32)
        fpad[: len(np.unique(coords, axis=0))] = feats[: len(np.unique(coords, axis=0))]
        W = np.random.RandomState(1).randn(9, 3, 4).astype(np.float32)

        from minkowskiengine_tpu.ops.functional import _conv_fwd

        def loss_custom(fp, w):
            return jnp.sum(F.sparse_conv(fp, w, kmap.in_idx, kmap.out_idx_t) ** 2)

        def loss_plain(fp, w):
            return jnp.sum(_conv_fwd(fp, w, kmap.in_idx) ** 2)

        g1 = jax.grad(loss_custom, argnums=(0, 1))(jnp.asarray(fpad), jnp.asarray(W))
        g2 = jax.grad(loss_plain, argnums=(0, 1))(jnp.asarray(fpad), jnp.asarray(W))
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), rtol=1e-4, atol=1e-5)
