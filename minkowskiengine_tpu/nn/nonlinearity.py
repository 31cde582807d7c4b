"""Nonlinearity wrappers: apply an elementwise function to tensor features.

Re-designs reference MinkowskiEngine/MinkowskiNonlinearity.py:34-200 — the
same "wrap the dense op, preserve the coordinate key" pattern, over jax.nn
instead of torch.nn.  Padding rows stay zero through every op that maps
0 → 0; ops that don't (sigmoid, softmax, ...) re-mask explicitly so the
zero-padding invariant survives.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..sparse_tensor import SparseTensor
from .module import MinkowskiModuleBase, resolve_rngs


class MinkowskiNonlinearityBase(MinkowskiModuleBase):
    """Apply ``fn`` to features, keep coordinates."""

    preserves_zero = True  # fn(0) == 0: padding needs no re-masking

    def __init__(self, **kwargs):
        self._kwargs = kwargs

    def _fn(self, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def __call__(self, input):
        out = self._fn(input.padded_features)
        if not self.preserves_zero:
            n = input.size_array
            mask = jnp.arange(out.shape[0]) < n
            out = jnp.where(mask[:, None], out, 0.0)
        return input._wrap(out)

    def __repr__(self):
        return self.__class__.__name__ + "()"


def _make(name: str, fn: Callable, preserves_zero: bool = True, **default_kwargs):
    def _fn(self, x):
        kw = {**default_kwargs, **self._kwargs}
        return fn(x, **kw) if kw else fn(x)

    cls = type(
        name,
        (MinkowskiNonlinearityBase,),
        {"_fn": _fn, "preserves_zero": preserves_zero},
    )
    return cls


MinkowskiReLU = _make("MinkowskiReLU", jax.nn.relu)
MinkowskiReLU6 = _make("MinkowskiReLU6", jax.nn.relu6)
MinkowskiELU = _make("MinkowskiELU", jax.nn.elu)
MinkowskiSELU = _make("MinkowskiSELU", jax.nn.selu)
MinkowskiCELU = _make("MinkowskiCELU", jax.nn.celu)
MinkowskiGELU = _make("MinkowskiGELU", jax.nn.gelu)
MinkowskiSiLU = _make("MinkowskiSiLU", jax.nn.silu)
MinkowskiTanh = _make("MinkowskiTanh", jnp.tanh)
MinkowskiSigmoid = _make("MinkowskiSigmoid", jax.nn.sigmoid, preserves_zero=False)
MinkowskiLogSigmoid = _make(
    "MinkowskiLogSigmoid", jax.nn.log_sigmoid, preserves_zero=False
)
MinkowskiSoftplus = _make("MinkowskiSoftplus", jax.nn.softplus, preserves_zero=False)
MinkowskiSoftsign = _make("MinkowskiSoftsign", jax.nn.soft_sign)
MinkowskiHardsigmoid = _make(
    "MinkowskiHardsigmoid", jax.nn.hard_sigmoid, preserves_zero=False
)
MinkowskiHardswish = _make("MinkowskiHardswish", jax.nn.hard_swish)


class MinkowskiLeakyReLU(MinkowskiNonlinearityBase):
    def __init__(self, negative_slope: float = 0.01, inplace: bool = False):
        self.negative_slope = float(negative_slope)

    def _fn(self, x):
        return jax.nn.leaky_relu(x, self.negative_slope)


class MinkowskiHardtanh(MinkowskiNonlinearityBase):
    def __init__(self, min_val=-1.0, max_val=1.0, inplace: bool = False):
        self.min_val, self.max_val = float(min_val), float(max_val)
        self.preserves_zero = min_val <= 0.0 <= max_val

    def _fn(self, x):
        return jnp.clip(x, self.min_val, self.max_val)


class MinkowskiThreshold(MinkowskiNonlinearityBase):
    def __init__(self, threshold: float, value: float, inplace: bool = False):
        self.threshold, self.value = float(threshold), float(value)
        self.preserves_zero = (0.0 > threshold) or (value == 0.0)

    def _fn(self, x):
        return jnp.where(x > self.threshold, x, self.value)


class MinkowskiHardshrink(MinkowskiNonlinearityBase):
    def __init__(self, lambd: float = 0.5):
        self.lambd = float(lambd)

    def _fn(self, x):
        return jnp.where(jnp.abs(x) > self.lambd, x, 0.0)


class MinkowskiSoftshrink(MinkowskiNonlinearityBase):
    def __init__(self, lambd: float = 0.5):
        self.lambd = float(lambd)

    def _fn(self, x):
        return jnp.sign(x) * jnp.maximum(jnp.abs(x) - self.lambd, 0.0)


class MinkowskiTanhshrink(MinkowskiNonlinearityBase):
    def _fn(self, x):
        return x - jnp.tanh(x)


class MinkowskiPReLU(MinkowskiNonlinearityBase):
    def __init__(self, num_parameters: int = 1, init: float = 0.25, rngs=None):
        self.weight = nnx.Param(jnp.full((num_parameters,), init, jnp.float32))

    def _fn(self, x):
        w = self.weight[...]
        return jnp.where(x >= 0, x, x * w[None, :])


class MinkowskiRReLU(MinkowskiNonlinearityBase):
    """Randomized leaky ReLU; uses the mean slope (deterministic) like
    torch's eval mode."""

    def __init__(self, lower: float = 1.0 / 8, upper: float = 1.0 / 3, inplace=False):
        self.slope = (lower + upper) / 2.0

    def _fn(self, x):
        return jnp.where(x >= 0, x, x * self.slope)


class MinkowskiSoftmax(MinkowskiNonlinearityBase):
    preserves_zero = False

    def __init__(self, dim: int = -1):
        self.dim = dim

    def _fn(self, x):
        return jax.nn.softmax(x, axis=self.dim)


class MinkowskiSoftmin(MinkowskiNonlinearityBase):
    preserves_zero = False

    def __init__(self, dim: int = -1):
        self.dim = dim

    def _fn(self, x):
        return jax.nn.softmax(-x, axis=self.dim)


class MinkowskiLogSoftmax(MinkowskiNonlinearityBase):
    preserves_zero = False

    def __init__(self, dim: int = -1):
        self.dim = dim

    def _fn(self, x):
        return jax.nn.log_softmax(x, axis=self.dim)


class MinkowskiAdaptiveLogSoftmaxWithLoss(MinkowskiModuleBase):
    """Hierarchical softmax for very large label spaces.

    Present for API parity (reference wraps
    torch.nn.AdaptiveLogSoftmaxWithLoss, MinkowskiNonlinearity.py:162);
    no sparse-tensor workload in the reference exercises it.
    """

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "MinkowskiAdaptiveLogSoftmaxWithLoss is not implemented on TPU; "
            "use MinkowskiLogSoftmax + a standard cross-entropy loss"
        )


class MinkowskiDropout(MinkowskiNonlinearityBase):
    def __init__(self, p: float = 0.5, inplace: bool = False, rngs=None):
        self.p = float(p)
        self.dropout = nnx.Dropout(rate=self.p, rngs=resolve_rngs(rngs))
        self.training = True

    def train(self, mode: bool = True):
        self.training = mode
        return self

    def eval(self):
        return self.train(False)

    def _fn(self, x):
        return self.dropout(x, deterministic=not self.training)


class MinkowskiAlphaDropout(MinkowskiDropout):
    """Alpha dropout degrades to standard dropout here (SELU-specific noise
    statistics are not preserved; sufficient for API parity)."""


class MinkowskiSinusoidal(MinkowskiModuleBase):
    """Sinusoidal feature encoding (reference:
    MinkowskiNonlinearity.py:175-200)."""

    def __init__(self, in_channel: int, out_channel: int, rngs=None):
        self.in_channel = int(in_channel)
        self.out_channel = int(out_channel)
        rngs = resolve_rngs(rngs)
        self.kernel = nnx.Param(
            jax.random.normal(rngs.params(), (in_channel, out_channel), jnp.float32)
        )

    def __call__(self, input):
        out = jnp.cos(input.padded_features @ self.kernel[...])
        n = input.size_array
        mask = jnp.arange(out.shape[0]) < n
        out = jnp.where(mask[:, None], out, 0.0)
        return input._wrap(out)
