"""Model-level tests: MinkUNet / ResNet forward + a training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from flax import nnx

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.models import MinkUNet14A, ResNet14


def rand_cloud(n=200, d=3, ch=3, batch=2, hi=32, seed=0):
    rng = np.random.RandomState(seed)
    coords = np.unique(
        np.concatenate(
            [rng.randint(0, batch, (n, 1)), rng.randint(0, hi, (n, d))], axis=1
        ).astype(np.int32),
        axis=0,
    )
    feats = rng.randn(len(coords), ch).astype(np.float32)
    return coords, feats


class TestMinkUNet:
    def test_forward_shapes(self):
        coords, feats = rand_cloud(seed=1)
        x = ME.SparseTensor(feats, coords)
        net = MinkUNet14A(3, 5, D=3, rngs=nnx.Rngs(0))
        out = net(x)
        # UNet output lands back on the input coordinates
        assert out.tensor_stride == (1, 1, 1)
        np.testing.assert_array_equal(np.asarray(out.C), np.asarray(x.C))
        assert out.shape == (x.size, 5)

    @pytest.mark.slow
    def test_train_step_decreases_loss(self):
        coords, feats = rand_cloud(n=120, seed=2)
        labels = np.random.RandomState(0).randint(0, 5, len(coords))
        x = ME.SparseTensor(feats, coords)
        net = MinkUNet14A(3, 5, D=3, rngs=nnx.Rngs(0))
        opt = nnx.Optimizer(net, optax.adam(1e-2), wrt=nnx.Param)
        y = jnp.asarray(labels)

        def loss_fn(model):
            out = model(x)
            logits = out.F
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        losses = []
        for _ in range(3):
            loss, grads = nnx.value_and_grad(loss_fn)(net)
            opt.update(net, grads)
            losses.append(float(loss))
        assert losses[-1] < losses[0]


class TestResNet:
    @pytest.mark.slow
    def test_forward(self):
        coords, feats = rand_cloud(n=300, hi=64, seed=3)
        x = ME.SparseTensor(feats, coords)
        net = ResNet14(3, 10, D=3, rngs=nnx.Rngs(0))
        out = net(x)
        # one prediction row per batch item
        assert out.shape[1] == 10
        assert out.size == len(np.unique(coords[:, 0]))
