"""MinkowskiStackSum / MinkowskiStackCat on nested multi-branch networks.

Mirrors /root/reference/tests/python/stack.py (TestStack.test_sum /
test_baseline): parallel branches at different strides rejoined on the
input's coordinates via transposed convolution / pooling-transpose, then
summed / concatenated — exercises that stride-down + transpose-up lands
back on the SAME coordinate map key, which the stack ops require.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from flax import nnx

import minkowskiengine_tpu as ME


class _Identity(nnx.Module):
    def __call__(self, x):
        return x


def _cloud(seed=0, n=400, batches=2):
    rng = np.random.RandomState(seed)
    coords = np.unique(
        np.concatenate(
            [
                rng.randint(0, batches, (n * 2, 1)),
                rng.randint(-20, 20, (n * 2, 3)),
            ],
            axis=1,
        ).astype(np.int32),
        axis=0,
    )[:n]
    feats = rng.rand(len(coords), 3).astype(np.float32)
    return coords, feats


def test_stack_sum_nested():
    coords, feats = _cloud()
    rngs = nnx.Rngs(0)
    ch = [3, 8, 16]
    layer = ME.MinkowskiStackSum(
        ME.MinkowskiConvolution(ch[0], ch[1], kernel_size=3, stride=1,
                                dimension=3, rngs=rngs),
        nnx.Sequential(
            ME.MinkowskiConvolution(ch[0], ch[1], kernel_size=3, stride=2,
                                    dimension=3, rngs=rngs),
            ME.MinkowskiStackSum(
                _Identity(),
                nnx.Sequential(
                    ME.MinkowskiConvolution(ch[1], ch[2], kernel_size=3,
                                            stride=2, dimension=3, rngs=rngs),
                    ME.MinkowskiConvolutionTranspose(
                        ch[2], ch[1], kernel_size=2, stride=2, dimension=3,
                        rngs=rngs,
                    ),
                ),
            ),
            ME.MinkowskiPoolingTranspose(kernel_size=2, stride=2, dimension=3),
        ),
    )
    for i in range(2):  # repeated fresh tensors on the same manager pattern
        x = ME.SparseTensor(jnp.asarray(feats), jnp.asarray(coords))
        out = layer(x)
        assert out.coordinate_map_key == x.coordinate_map_key
        assert out.F.shape == (x.F.shape[0], ch[1])
        assert bool(jnp.isfinite(out.F).all())


def test_stack_cat_baseline():
    coords, feats = _cloud(seed=1)
    rngs = nnx.Rngs(1)
    layer = ME.MinkowskiStackCat(
        ME.MinkowskiConvolution(3, 4, kernel_size=3, stride=1, dimension=3,
                                rngs=rngs),
        nnx.Sequential(
            ME.MinkowskiConvolution(3, 5, kernel_size=3, stride=2, dimension=3,
                                    rngs=rngs),
            ME.MinkowskiPoolingTranspose(kernel_size=2, stride=2, dimension=3),
        ),
    )
    x = ME.SparseTensor(jnp.asarray(feats), jnp.asarray(coords))
    out = layer(x)
    assert out.F.shape == (x.F.shape[0], 9)
    # branch 1 occupies the first 4 channels: check against direct apply
    direct = layer.layers[0](
        ME.SparseTensor(jnp.asarray(feats), jnp.asarray(coords))
    )
    np.testing.assert_allclose(
        np.asarray(out.F[:, :4]), np.asarray(direct.F), rtol=1e-5
    )


def test_stack_mixed_keys_raise():
    coords, feats = _cloud(seed=2)
    rngs = nnx.Rngs(2)
    layer = ME.MinkowskiStackSum(
        _Identity(),
        ME.MinkowskiConvolution(3, 3, kernel_size=3, stride=2, dimension=3,
                                rngs=rngs),
    )
    x = ME.SparseTensor(jnp.asarray(feats), jnp.asarray(coords))
    with pytest.raises(ValueError, match="same coordinate_map_key"):
        layer(x)
