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
    """Hierarchical (adaptive) softmax for very large label spaces.

    Functional port of ``torch.nn.AdaptiveLogSoftmaxWithLoss`` semantics
    (reference wraps it, MinkowskiNonlinearity.py:162): frequent classes
    (``< cutoffs[0]``) live in the head; rarer classes live in per-cluster
    tails whose projections shrink by ``div_value`` per cluster.  Applied
    to a SparseTensor's valid rows with integer targets; returns
    ``(target_log_probs, loss)`` like torch's ``ASMoutput``.
    """

    def __init__(
        self,
        in_features: int,
        n_classes: int,
        cutoffs,
        div_value: float = 4.0,
        head_bias: bool = False,
        rngs=None,
    ):
        cutoffs = list(cutoffs)
        if (
            sorted(cutoffs) != cutoffs
            or min(cutoffs) <= 0
            or max(cutoffs) > n_classes - 1
            or len(set(cutoffs)) != len(cutoffs)
        ):
            raise ValueError(
                "cutoffs must be a sorted list of unique positive ints "
                "< n_classes - 1"
            )
        rngs = resolve_rngs(rngs)
        self.in_features = int(in_features)
        self.n_classes = int(n_classes)
        self.cutoffs = cutoffs + [int(n_classes)]
        self.div_value = float(div_value)
        self.shortlist_size = cutoffs[0]
        self.n_clusters = len(cutoffs)
        self.head_size = self.shortlist_size + self.n_clusters
        self.head = nnx.Linear(
            in_features, self.head_size, use_bias=head_bias, rngs=rngs
        )
        tail = []
        for i in range(self.n_clusters):
            hsz = max(1, int(in_features // (self.div_value ** (i + 1))))
            osz = self.cutoffs[i + 1] - self.cutoffs[i]
            tail.append(
                nnx.List(
                    [
                        nnx.Linear(in_features, hsz, use_bias=False, rngs=rngs),
                        nnx.Linear(hsz, osz, use_bias=False, rngs=rngs),
                    ]
                )
            )
        self.tail = nnx.List(tail)

    def __call__(self, input, target):
        feats = input.padded_features
        target = jnp.asarray(target)
        valid = input.valid_row_mask
        safe_target = jnp.where(valid, target, 0)

        head_logprob = jax.nn.log_softmax(self.head(feats), axis=-1)
        # shortlist: gather the target's head log-prob
        out = jnp.take_along_axis(
            head_logprob,
            jnp.clip(safe_target, 0, self.head_size - 1)[:, None],
            axis=-1,
        )[:, 0]
        for i in range(self.n_clusters):
            lo, hi = self.cutoffs[i], self.cutoffs[i + 1]
            in_cluster = (safe_target >= lo) & (safe_target < hi)
            proj, out_lin = self.tail[i]
            tail_logprob = jax.nn.log_softmax(
                out_lin(proj(feats)), axis=-1
            )
            rel = jnp.clip(safe_target - lo, 0, hi - lo - 1)
            cluster_lp = (
                head_logprob[:, self.shortlist_size + i]
                + jnp.take_along_axis(tail_logprob, rel[:, None], -1)[:, 0]
            )
            out = jnp.where(in_cluster, cluster_lp, out)
        out = jnp.where(valid, out, 0.0)
        loss = -jnp.sum(out) / jnp.maximum(
            jnp.sum(valid.astype(out.dtype)), 1.0
        )
        return out, loss

    def log_prob(self, input):
        """(capacity, n_classes) full log-probability table."""
        feats = input.padded_features
        head_logprob = jax.nn.log_softmax(self.head(feats), axis=-1)
        parts = [head_logprob[:, : self.shortlist_size]]
        for i in range(self.n_clusters):
            proj, out_lin = self.tail[i]
            tail_logprob = jax.nn.log_softmax(out_lin(proj(feats)), -1)
            parts.append(
                head_logprob[:, self.shortlist_size + i : self.shortlist_size + i + 1]
                + tail_logprob
            )
        return jnp.concatenate(parts, axis=-1)

    def predict(self, input):
        return jnp.argmax(self.log_prob(input), axis=-1)


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
    """Alpha dropout (SELU-preserving): dropped entries are set to the
    negative SELU saturation value and the result is affinely rescaled so
    the self-normalizing mean/variance are preserved
    (torch.nn.AlphaDropout semantics; reference MinkowskiNonlinearity.py)."""

    preserves_zero = False  # dropped zeros become a*alpha' + b != 0
    _ALPHA_PRIME = -1.7580993408473766  # -scale * alpha of SELU

    def __init__(self, p: float = 0.5, inplace: bool = False, rngs=None):
        super().__init__(p, inplace, rngs=rngs)
        self._rngs = resolve_rngs(rngs)

    def _fn(self, x):
        if not self.training or self.p == 0.0:
            return x
        p, ap = self.p, self._ALPHA_PRIME
        a = (1.0 - p) * (1.0 + p * ap * ap)
        a = a ** -0.5
        b = -a * ap * p
        keep = jax.random.bernoulli(
            self._rngs.dropout(), 1.0 - p, x.shape
        )
        return a * jnp.where(keep, x, ap) + b


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
