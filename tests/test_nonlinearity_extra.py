"""The two formerly-stubbed nonlinearities, pinned against torch oracles
(reference MinkowskiNonlinearity.py wraps torch.nn.AdaptiveLogSoftmaxWithLoss
and torch.nn.AlphaDropout directly)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp
from flax import nnx

import minkowskiengine_tpu as ME


def small_tensor(seed=0, ch=16):
    rng = np.random.RandomState(seed)
    coords = np.unique(
        np.concatenate(
            [np.zeros((60, 1), np.int32), rng.randint(0, 10, (60, 3)).astype(np.int32)],
            axis=1,
        ),
        axis=0,
    )
    return ME.SparseTensor(rng.randn(len(coords), ch).astype(np.float32), coords)


class TestAdaptiveLogSoftmaxWithLoss:
    def test_matches_torch(self):
        x = small_tensor()
        n = x.size
        m = ME.MinkowskiAdaptiveLogSoftmaxWithLoss(
            16, 50, cutoffs=[5, 20], div_value=4.0, rngs=nnx.Rngs(0)
        )
        tm = torch.nn.AdaptiveLogSoftmaxWithLoss(16, 50, cutoffs=[5, 20], div_value=4.0)
        with torch.no_grad():
            tm.head.weight.copy_(
                torch.from_numpy(np.asarray(m.head.kernel[...]).T.copy())
            )
            for i, pair in enumerate(m.tail):
                tm.tail[i][0].weight.copy_(
                    torch.from_numpy(np.asarray(pair[0].kernel[...]).T.copy())
                )
                tm.tail[i][1].weight.copy_(
                    torch.from_numpy(np.asarray(pair[1].kernel[...]).T.copy())
                )
        rng = np.random.RandomState(1)
        targets = rng.randint(0, 50, x.capacity).astype(np.int32)
        out, loss = m(x, jnp.asarray(targets))
        with torch.no_grad():
            t_out, t_loss = tm(
                torch.from_numpy(np.asarray(x.F).copy()),
                torch.from_numpy(targets[:n].astype(np.int64)),
            )
            t_lp = tm.log_prob(torch.from_numpy(np.asarray(x.F).copy()))
        np.testing.assert_allclose(
            np.asarray(out)[:n], t_out.numpy(), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(float(loss), float(t_loss), rtol=2e-4)
        np.testing.assert_allclose(
            np.asarray(m.log_prob(x))[:n], t_lp.numpy(), rtol=2e-4, atol=2e-5
        )
        # predict == argmax of the full table
        assert np.asarray(m.predict(x)).shape == (x.capacity,)

    def test_rejects_bad_cutoffs(self):
        with pytest.raises(ValueError):
            ME.MinkowskiAdaptiveLogSoftmaxWithLoss(8, 10, cutoffs=[5, 3])


class TestAlphaDropout:
    def test_preserves_self_normalizing_stats(self):
        rng = np.random.RandomState(0)
        coords = np.unique(
            np.concatenate(
                [np.zeros((8000, 1), np.int32),
                 rng.randint(0, 40, (8000, 3)).astype(np.int32)],
                axis=1,
            ),
            axis=0,
        )[:4000]
        x = ME.SparseTensor(rng.randn(len(coords), 8).astype(np.float32), coords)
        ad = ME.MinkowskiAlphaDropout(0.3, rngs=nnx.Rngs(1))
        y = ad(x)
        v = np.asarray(y.F)
        assert abs(v.mean()) < 0.05
        assert abs(v.std() - 1.0) < 0.1
        # padding rows stay zero even though alpha-dropout doesn't map 0->0
        assert np.all(np.asarray(y.padded_features)[x.size :] == 0)
        # eval mode is the identity
        ad.eval()
        np.testing.assert_array_equal(np.asarray(ad(x).F), np.asarray(x.F))
