"""Convolution evaluated on explicitly-provided output coordinates
(reference: tests/python/conv_on_coords.py), plus float64 gradcheck."""

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

import minkowskiengine_tpu as ME
from oracles import conv_oracle, cube_offsets


def rand_tensor(n, d, ch, seed=0):
    rng = np.random.RandomState(seed)
    coords = np.unique(
        np.concatenate(
            [rng.randint(0, 2, (n, 1)), rng.randint(-6, 6, (n, d))], axis=1
        ).astype(np.int32),
        axis=0,
    )
    return coords, rng.randn(len(coords), ch).astype(np.float32)


class TestConvOnCoords:
    def test_explicit_tensor_coordinates(self):
        coords, feats = rand_tensor(50, 2, 3, seed=1)
        x = ME.SparseTensor(feats, coords)
        conv = ME.MinkowskiConvolution(3, 4, kernel_size=3, dimension=2,
                                       rngs=nnx.Rngs(0))
        # ask for outputs at arbitrary coordinates, not the strided input set
        rng = np.random.RandomState(2)
        out_coords = np.unique(
            np.concatenate(
                [rng.randint(0, 2, (20, 1)), rng.randint(-6, 6, (20, 2))], axis=1
            ).astype(np.int32),
            axis=0,
        )
        y = conv(x, coordinates=out_coords)
        np.testing.assert_array_equal(np.asarray(y.C), out_coords)
        W = np.asarray(conv.kernel[...])
        expected = conv_oracle(
            x.C, np.asarray(x.F), out_coords, W, cube_offsets(3, 1, 1, 2)
        )
        np.testing.assert_allclose(np.asarray(y.F), expected, rtol=1e-4, atol=1e-4)

    def test_output_on_other_tensor(self):
        coords, feats = rand_tensor(40, 2, 3, seed=3)
        mgr = ME.CoordinateManager(D=2)
        x = ME.SparseTensor(feats, coords, coordinate_manager=mgr)
        coords2, feats2 = rand_tensor(30, 2, 3, seed=4)
        other = ME.SparseTensor(feats2, coords2, coordinate_manager=mgr)
        conv = ME.MinkowskiConvolution(3, 4, kernel_size=3, dimension=2,
                                       rngs=nnx.Rngs(1))
        y = conv(x, coordinates=other)
        assert y.coordinate_map_key == other.coordinate_map_key
        np.testing.assert_array_equal(np.asarray(y.C), np.asarray(other.C))


class TestFloat64Gradcheck:
    def test_conv_gradcheck_f64(self):
        """Reference-style float64 numerical gradient check
        (tests/python/convolution.py:155-168 via utils/gradcheck.py)."""
        from jax import enable_x64

        from minkowskiengine_tpu.ops import functional as F

        coords, feats = rand_tensor(25, 2, 2, seed=5)
        mgr = ME.CoordinateManager(D=2)
        key, _ = mgr.insert_and_map(coords)
        okey = mgr.stride(key, 1)
        kmap = mgr.kernel_map(key, okey, kernel_size=3, stride=1)
        cap = mgr.capacity(key)
        fpad = np.zeros((cap, 2))
        fpad[: len(coords)] = feats[: len(coords)]
        W = np.random.RandomState(0).randn(9, 2, 3) * 0.5

        with enable_x64():
            from jax.test_util import check_grads

            in_idx = jnp.asarray(np.asarray(kmap.in_idx))
            out_idx_t = jnp.asarray(np.asarray(kmap.out_idx_t))

            def f(fp, w):
                return F.sparse_conv(fp, w, in_idx, out_idx_t)

            check_grads(
                f,
                (jnp.asarray(fpad, jnp.float64), jnp.asarray(W, jnp.float64)),
                order=1,
                modes=("rev",),
                atol=1e-6,
                rtol=1e-6,
            )
