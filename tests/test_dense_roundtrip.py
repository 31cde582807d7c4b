"""Dense↔sparse conversion parity (reference: tests/python/dense.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.nn.ops import dense_coordinates, to_sparse_all


def test_to_sparse_default_format():
    rng = np.random.RandomState(0)
    dense = rng.rand(3, 4, 5, 6).astype(np.float32)
    s = ME.to_sparse(dense)
    assert s.F.shape == (3 * 5 * 6, 4)


def test_to_sparse_bxxc():
    rng = np.random.RandomState(1)
    dense = rng.rand(3, 4, 5, 6).astype(np.float32)
    s = ME.to_sparse(dense, format="BXXC")
    assert s.F.shape == (3 * 4 * 5, 6)
    # feature rows carry the channel-last values at their coordinates
    c0 = np.asarray(s.C[0])
    np.testing.assert_allclose(
        np.asarray(s.F[0]), dense[c0[0], c0[1], c0[2], :], rtol=1e-6
    )


def test_to_sparse_bad_formats():
    dense = np.zeros((2, 3, 4, 4), np.float32)
    with pytest.raises(ValueError):
        ME.to_sparse(dense, format="XBXC")
    with pytest.raises(ValueError):
        ME.to_sparse(dense, format="BXX")
    with pytest.raises(ValueError):
        ME.to_sparse(np.zeros((2, 3), np.float32))


def test_empty_roundtrip():
    x = np.zeros((4, 1, 34, 34), np.float32)
    s = ME.to_sparse(x)
    assert s.F.shape[0] == 0
    d = ME.MinkowskiToDenseTensor(x.shape)(s)
    assert d.shape == x.shape
    assert not np.asarray(jnp.any(d != 0))


def test_to_sparse_all_network_grad():
    """Differentiable dense → sparse network → dense chain with cached
    coordinates (reference: dense.py test_network)."""
    rng = np.random.RandomState(2)
    dense = jnp.asarray(rng.rand(2, 3, 7, 7).astype(np.float32))
    coords = dense_coordinates(dense.shape)
    conv = ME.MinkowskiConvolution(3, 4, kernel_size=3, dimension=2,
                                   rngs=nnx.Rngs(0))

    def f(d):
        s = to_sparse_all(d, coordinates=coords)
        out = conv(s)
        return jnp.sum(out.F * out.F)

    g = jax.grad(f)(dense)
    assert g.shape == dense.shape
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).sum()) > 0
