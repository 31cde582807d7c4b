"""Functional API: jax.nn analogues applied to sparse tensor features.

Re-designs reference MinkowskiEngine/MinkowskiFunctional.py:30-232 — the same
``_wrap_tensor`` pattern over jax.nn / optax-style losses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _wrap_tensor(input, F):
    return input._wrap(F)


def _make_unary(fn):
    def wrapped(input, *args, **kwargs):
        return _wrap_tensor(input, fn(input.padded_features, *args, **kwargs))

    return wrapped


relu = _make_unary(jax.nn.relu)
relu6 = _make_unary(jax.nn.relu6)
elu = _make_unary(jax.nn.elu)
selu = _make_unary(jax.nn.selu)
celu = _make_unary(jax.nn.celu)
gelu = _make_unary(jax.nn.gelu)
silu = _make_unary(jax.nn.silu)
leaky_relu = _make_unary(jax.nn.leaky_relu)
tanh = _make_unary(jnp.tanh)
sigmoid = _make_unary(jax.nn.sigmoid)
logsigmoid = _make_unary(jax.nn.log_sigmoid)
softplus = _make_unary(jax.nn.softplus)
softsign = _make_unary(jax.nn.soft_sign)
hardsigmoid = _make_unary(jax.nn.hard_sigmoid)
hardswish = _make_unary(jax.nn.hard_swish)
hardtanh = _make_unary(lambda x, min_val=-1.0, max_val=1.0: jnp.clip(x, min_val, max_val))
softmax = _make_unary(lambda x, dim=-1: jax.nn.softmax(x, axis=dim))
softmin = _make_unary(lambda x, dim=-1: jax.nn.softmax(-x, axis=dim))
log_softmax = _make_unary(lambda x, dim=-1: jax.nn.log_softmax(x, axis=dim))
glu = _make_unary(lambda x, dim=-1: jax.nn.glu(x, axis=dim))
tanhshrink = _make_unary(lambda x: x - jnp.tanh(x))
hardshrink = _make_unary(lambda x, lambd=0.5: jnp.where(jnp.abs(x) > lambd, x, 0.0))
softshrink = _make_unary(
    lambda x, lambd=0.5: jnp.sign(x) * jnp.maximum(jnp.abs(x) - lambd, 0.0)
)
threshold = _make_unary(
    lambda x, threshold, value: jnp.where(x > threshold, x, value)
)


def prelu(input, weight):
    x = input.padded_features
    return _wrap_tensor(input, jnp.where(x >= 0, x, x * weight))


def normalize(input, p: float = 2.0, dim: int = 1, eps: float = 1e-12):
    x = input.padded_features
    norm = jnp.linalg.norm(x, ord=p, axis=dim, keepdims=True)
    return _wrap_tensor(input, x / jnp.maximum(norm, eps))


def linear(input, weight, bias=None):
    out = input.padded_features @ weight.T
    if bias is not None:
        out = out + bias
    return _wrap_tensor(input, out)


def dropout(input, p=0.5, training=True, key=None):
    if not training or p == 0.0:
        return input
    if key is None:
        raise ValueError(
            "functional dropout with training=True requires an explicit "
            "PRNG key (key=jax.random.PRNGKey(...)); a fixed default key "
            "would apply the identical mask on every call"
        )
    x = input.padded_features
    keep = jax.random.bernoulli(key, 1.0 - p, x.shape)
    return _wrap_tensor(input, jnp.where(keep, x / (1.0 - p), 0.0))


alpha_dropout = dropout


# --- losses over sparse tensor features (reference: functional:179-232) ---


def _feats(x):
    return x.F if hasattr(x, "F") else x


def mse_loss(input, target, reduction: str = "mean"):
    d = _feats(input) - _feats(target)
    loss = d * d
    return loss.mean() if reduction == "mean" else loss.sum()


def l1_loss(input, target, reduction: str = "mean"):
    loss = jnp.abs(_feats(input) - _feats(target))
    return loss.mean() if reduction == "mean" else loss.sum()


def binary_cross_entropy_with_logits(input, target, reduction: str = "mean"):
    x, t = _feats(input), _feats(target)
    loss = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return loss.mean() if reduction == "mean" else loss.sum()


def binary_cross_entropy(input, target, reduction: str = "mean"):
    x, t = _feats(input), _feats(target)
    eps = 1e-7
    x = jnp.clip(x, eps, 1 - eps)
    loss = -(t * jnp.log(x) + (1 - t) * jnp.log(1 - x))
    return loss.mean() if reduction == "mean" else loss.sum()


def cross_entropy(input, target, reduction: str = "mean"):
    """target: integer class labels per row."""
    logits = _feats(input)
    t = _feats(target)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.take_along_axis(logp, t[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return loss.mean() if reduction == "mean" else loss.sum()
