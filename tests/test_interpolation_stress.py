"""Interpolation / splat GPU-parity stress tests.

The reference CHANGELOG (v0.5.5) records real bugs fixed in exactly this
code — interpolation on GPU with negative/boundary coordinates and splat
corner handling (reference: CHANGELOG.md, src/coordinate_map_cpu.hpp:138-273).
These tests hammer the same classes of input against float64 brute-force
oracles: negative coordinates, non-unit tensor strides, samples exactly on
lattice corners, samples outside the map, duplicated samples, and gradient
flow through both ops.
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minkowskiengine_tpu as ME


def interp_oracle(coords, feats, samples, stride):
    """Brute-force multilinear interpolation with missing-corner-is-zero
    semantics (matches reference interpolation_map_weight)."""
    table = {tuple(int(v) for v in c): f for c, f in zip(coords, feats)}
    D = coords.shape[1] - 1
    out = np.zeros((len(samples), feats.shape[1]), np.float64)
    for i, (b, *p) in enumerate(samples):
        p = np.asarray(p, np.float64) / stride
        floor = np.floor(p)
        frac = p - floor
        for bits in itertools.product((0, 1), repeat=D):
            w = 1.0
            for d, bit in enumerate(bits):
                w *= frac[d] if bit else (1.0 - frac[d])
            key = (int(b),) + tuple(
                int(v) * stride for v in (floor + np.asarray(bits))
            )
            if key in table:
                out[i] += w * np.asarray(table[key], np.float64)
    return out


def dense_lattice(lo, hi, D, ch, batch=2, seed=0):
    """A FULL lattice (every corner present) so interpolation is exact."""
    rng = np.random.RandomState(seed)
    axes = [range(batch)] + [range(lo, hi)] * D
    coords = np.array(list(itertools.product(*axes)), np.int32)
    feats = rng.randn(len(coords), ch).astype(np.float32)
    return coords, feats


class TestInterpolationStress:
    @pytest.mark.parametrize("D", [2, 3])
    def test_random_samples_vs_oracle(self, D):
        coords, feats = dense_lattice(-3, 4, D, 3, seed=D)
        x = ME.SparseTensor(feats, coords)
        rng = np.random.RandomState(7)
        samples = np.concatenate(
            [
                rng.randint(0, 2, (200, 1)).astype(np.float32),
                rng.uniform(-3.0, 3.0 - 1e-3, (200, D)).astype(np.float32),
            ],
            axis=1,
        )
        out = ME.MinkowskiInterpolation()(x, samples)
        oracle = interp_oracle(coords, feats, samples, 1)
        np.testing.assert_allclose(np.asarray(out), oracle, rtol=2e-4, atol=2e-5)

    def test_negative_coordinates_floor_semantics(self):
        """floor(-0.5) = -1, NOT trunc = 0 — the classic sign bug."""
        coords = np.array(
            [[0, -1, -1], [0, -1, 0], [0, 0, -1], [0, 0, 0]], np.int32
        )
        feats = np.array([[1.0], [2.0], [3.0], [4.0]], np.float32)
        x = ME.SparseTensor(feats, coords)
        out = ME.MinkowskiInterpolation()(
            x, np.array([[0, -0.5, -0.5]], np.float32)
        )
        np.testing.assert_allclose(np.asarray(out)[0, 0], 2.5, rtol=1e-5)

    def test_exact_corner_hits(self):
        """Samples exactly on lattice corners return exactly that row
        (degenerate weights 1/0 — no bleed from neighbors)."""
        coords, feats = dense_lattice(-2, 3, 3, 2, seed=1)
        x = ME.SparseTensor(feats, coords)
        idx = np.random.RandomState(2).choice(len(coords), 50)
        samples = coords[idx].astype(np.float32)
        out = np.asarray(ME.MinkowskiInterpolation()(x, samples))
        np.testing.assert_allclose(out, feats[idx], rtol=1e-5, atol=1e-6)

    def test_outside_samples_are_zero(self):
        coords, feats = dense_lattice(0, 3, 2, 2, seed=3)
        x = ME.SparseTensor(feats, coords)
        samples = np.array(
            [[0, 100.0, 100.0], [0, -50.0, 2.0], [1, 0.5, -7.0]], np.float32
        )
        out = np.asarray(ME.MinkowskiInterpolation()(x, samples))
        np.testing.assert_array_equal(out, np.zeros_like(out))

    def test_tensor_stride_2_lattice(self):
        """Interpolation on a strided map divides by the tensor stride
        (reference: interpolation at coarser pyramid levels)."""
        base = np.array(
            list(itertools.product(range(1), range(0, 8, 2), range(0, 8, 2))),
            np.int32,
        )
        feats = np.arange(len(base), dtype=np.float32)[:, None]
        mgr = ME.CoordinateManager(D=2)
        key, _ = mgr.insert_and_map(base, tensor_stride=2)
        x = ME.SparseTensor(
            feats, coordinate_map_key=key, coordinate_manager=mgr
        )
        samples = np.array([[0, 1.0, 1.0], [0, 3.0, 5.0]], np.float32)
        out = np.asarray(ME.MinkowskiInterpolation()(x, samples))
        oracle = interp_oracle(base, feats, samples, 2)
        np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-6)

    def test_duplicate_samples(self):
        coords, feats = dense_lattice(0, 4, 2, 2, seed=5)
        x = ME.SparseTensor(feats, coords)
        s = np.array([[0, 1.25, 2.75]], np.float32)
        samples = np.repeat(s, 64, axis=0)
        out = np.asarray(ME.MinkowskiInterpolation()(x, samples))
        np.testing.assert_allclose(out, np.broadcast_to(out[0], out.shape))

    def test_gradient_flows_to_all_corners(self):
        coords, feats = dense_lattice(0, 2, 2, 1, batch=1, seed=6)
        samples = np.array([[0, 0.25, 0.75]], np.float32)

        def f(feats_):
            x = ME.SparseTensor(feats_, coords)
            return jnp.sum(ME.MinkowskiInterpolation()(x, samples))

        g = np.asarray(jax.grad(f)(jnp.asarray(feats)))[:, 0]
        got = {tuple(c[1:]): v for c, v in zip(coords, g)}
        # weights: (1-.25)(1-.75), (1-.25)(.75), (.25)(1-.75), (.25)(.75)
        np.testing.assert_allclose(got[(0, 0)], 0.1875, rtol=1e-5)
        np.testing.assert_allclose(got[(0, 1)], 0.5625, rtol=1e-5)
        np.testing.assert_allclose(got[(1, 0)], 0.0625, rtol=1e-5)
        np.testing.assert_allclose(got[(1, 1)], 0.1875, rtol=1e-5)


class TestSplatStress:
    def _oracle(self, coords, feats, D):
        acc = {}
        for (b, *p), f in zip(coords, feats):
            floor = np.floor(np.asarray(p, np.float64)).astype(np.int64)
            frac = np.asarray(p, np.float64) - floor
            for bits in itertools.product((0, 1), repeat=D):
                w = 1.0
                for d, bit in enumerate(bits):
                    w *= frac[d] if bit else (1.0 - frac[d])
                key = (int(b),) + tuple(int(c) for c in floor + np.array(bits))
                acc[key] = acc.get(key, 0.0) + w * np.asarray(f, np.float64)
        return acc

    def test_negative_and_mixed_coordinates(self):
        rng = np.random.RandomState(8)
        D = 3
        coords = np.concatenate(
            [
                rng.randint(0, 2, (100, 1)).astype(np.float32),
                rng.uniform(-4.0, 4.0, (100, D)).astype(np.float32),
            ],
            axis=1,
        )
        feats = rng.randn(100, 3).astype(np.float32)
        st = ME.TensorField(feats, coords).splat()
        oracle = self._oracle(coords, feats, D)
        got = {
            tuple(int(v) for v in c): f
            for c, f in zip(np.asarray(st.C), np.asarray(st.F))
        }
        assert set(got) == set(oracle)
        for k, v in oracle.items():
            np.testing.assert_allclose(got[k], v, rtol=2e-4, atol=1e-5)

    def test_on_corner_points_splat_to_single_voxel(self):
        """Integer field points have degenerate weights — ALL mass lands on
        one voxel (the reference 0.5.5 splat fix territory)."""
        coords = np.array([[0, 1.0, 2.0], [0, -3.0, 0.0]], np.float32)
        feats = np.array([[1.0], [2.0]], np.float32)
        st = ME.TensorField(feats, coords).splat()
        got = {
            tuple(int(v) for v in c): float(f[0])
            for c, f in zip(np.asarray(st.C), np.asarray(st.F))
        }
        assert got[(0, 1, 2)] == pytest.approx(1.0)
        assert got[(0, -3, 0)] == pytest.approx(2.0)
        # every other generated corner holds exactly zero
        for k, v in got.items():
            if k not in ((0, 1, 2), (0, -3, 0)):
                assert v == pytest.approx(0.0, abs=1e-6)

    def test_mass_conservation(self):
        rng = np.random.RandomState(9)
        coords = np.concatenate(
            [
                np.zeros((50, 1), np.float32),
                rng.uniform(-2.0, 2.0, (50, 2)).astype(np.float32),
            ],
            axis=1,
        )
        feats = rng.rand(50, 2).astype(np.float32)
        st = ME.TensorField(feats, coords).splat()
        np.testing.assert_allclose(
            np.asarray(st.F).sum(axis=0), feats.sum(axis=0), rtol=1e-4
        )

    def test_splat_then_interpolate_roundtrip(self):
        """Interpolating the splatted lattice back at the original sample
        positions (features_at_coordinates) matches the float64 oracle;
        slice() (nearest-voxel inverse) stays finite and shape-correct."""
        rng = np.random.RandomState(10)
        coords = np.concatenate(
            [
                np.zeros((20, 1), np.float32),
                rng.uniform(0.0, 3.0, (20, 2)).astype(np.float32),
            ],
            axis=1,
        )
        feats = rng.randn(20, 2).astype(np.float32)
        tf = ME.TensorField(feats, coords)
        st = tf.splat()
        back = st.features_at_coordinates(jnp.asarray(coords))
        oracle = interp_oracle(np.asarray(st.C), np.asarray(st.F), coords, 1)
        np.testing.assert_allclose(
            np.asarray(back)[: len(coords)], oracle, rtol=2e-4, atol=2e-5
        )
        sliced = st.slice(tf)
        sf = np.asarray(sliced.features)
        assert sf.shape == feats.shape and np.isfinite(sf).all()
