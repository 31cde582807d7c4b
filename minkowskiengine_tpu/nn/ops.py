"""Linear layer, tensor combinators, dense↔sparse converters.

Re-designs reference MinkowskiEngine/MinkowskiOps.py:40-497.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..sparse_tensor import SparseTensor
from .module import MinkowskiModuleBase, resolve_rngs


class MinkowskiLinear(MinkowskiModuleBase):
    """Dense linear layer over features (reference: MinkowskiOps.py:40-67)."""

    def __init__(
        self, in_features: int, out_features: int, bias: bool = True, rngs=None
    ):
        self.in_features = int(in_features)
        self.out_features = int(out_features)
        rngs = resolve_rngs(rngs)
        stdv = 1.0 / math.sqrt(in_features)
        self.weight = nnx.Param(
            jax.random.uniform(
                rngs.params(), (in_features, out_features), jnp.float32, -stdv, stdv
            )
        )
        self.bias = (
            nnx.Param(
                jax.random.uniform(
                    rngs.params(), (1, out_features), jnp.float32, -stdv, stdv
                )
            )
            if bias
            else None
        )

    def __call__(self, input):
        feats = input.padded_features
        out = feats @ self.weight[...].astype(feats.dtype)
        if self.bias is not None:
            out = out + self.bias[...].astype(out.dtype)
            n = input.size_array
            mask = jnp.arange(out.shape[0]) < n
            out = jnp.where(mask[:, None], out, 0.0)
        return input._wrap(out)

    def __repr__(self):
        return (
            f"{self.__class__.__name__}(in_features={self.in_features}, "
            f"out_features={self.out_features})"
        )


def _tensor_key(t):
    return getattr(t, "coordinate_map_key", None) or t.coordinate_field_map_key


def _check_same_key(*tensors):
    key = _tensor_key(tensors[0])
    for t in tensors[1:]:
        if _tensor_key(t) != key:
            raise ValueError(
                "All inputs must share the same coordinate_map_key; use "
                "MinkowskiUnion for mixed-coordinate combination"
            )


def cat(*sparse_tensors):
    """Concatenate features of same-coordinate tensors
    (reference: MinkowskiOps.py:70-128)."""
    if len(sparse_tensors) == 1 and isinstance(sparse_tensors[0], (list, tuple)):
        sparse_tensors = tuple(sparse_tensors[0])
    _check_same_key(*sparse_tensors)
    out = jnp.concatenate([t.padded_features for t in sparse_tensors], axis=1)
    return sparse_tensors[0]._wrap(out)


def _sum(*sparse_tensors):
    """Elementwise sum over same-coordinate tensors
    (reference: MinkowskiOps.py:130-170)."""
    if len(sparse_tensors) == 1 and isinstance(sparse_tensors[0], (list, tuple)):
        sparse_tensors = tuple(sparse_tensors[0])
    _check_same_key(*sparse_tensors)
    out = sparse_tensors[0].padded_features
    for t in sparse_tensors[1:]:
        out = out + t.padded_features
    return sparse_tensors[0]._wrap(out)


def mean(*sparse_tensors):
    """Elementwise mean (reference: MinkowskiOps.py:172-208)."""
    if len(sparse_tensors) == 1 and isinstance(sparse_tensors[0], (list, tuple)):
        sparse_tensors = tuple(sparse_tensors[0])
    s = _sum(*sparse_tensors)
    return s._wrap(s.padded_features / len(sparse_tensors))


def var(*sparse_tensors):
    """Elementwise variance (reference: MinkowskiOps.py:210-245)."""
    if len(sparse_tensors) == 1 and isinstance(sparse_tensors[0], (list, tuple)):
        sparse_tensors = tuple(sparse_tensors[0])
    _check_same_key(*sparse_tensors)
    mu = mean(*sparse_tensors).padded_features
    acc = None
    for t in sparse_tensors:
        d = t.padded_features - mu
        acc = d * d if acc is None else acc + d * d
    return sparse_tensors[0]._wrap(acc / len(sparse_tensors))


def dense_coordinates(shape) -> jnp.ndarray:
    """All coordinates of a dense (B, ch, *spatial) tensor
    (reference: MinkowskiOps.py:246-278)."""
    B = int(shape[0])
    spatial = [int(s) for s in shape[2:]]
    grids = np.meshgrid(
        np.arange(B), *[np.arange(s) for s in spatial], indexing="ij"
    )
    coords = np.stack([g.reshape(-1) for g in grids], axis=1).astype(np.int32)
    return jnp.asarray(coords)


def to_sparse(x, format: str = None, coordinates=None, device=None):
    """Dense batched tensor → SparseTensor of rows where any channel is
    nonzero (reference: MinkowskiOps.py:279-321).

    ``format``: axis layout string — 'B' (batch, must be first), one 'C'
    (channel, any position), 'X' elsewhere; default "BCX...X".  E.g.
    channels-last image data is "BXXC"."""
    x = jnp.asarray(x)
    if x.ndim <= 2:
        raise ValueError("Input has 0 spatial dimension.")
    if format is None:
        format = "BC" + "X" * (x.ndim - 2)
    if len(format) != x.ndim:
        raise ValueError(f"Invalid format: {format}. len(format) != x.ndim")
    if format.count("B") != 1 or format[0] != "B":
        raise ValueError("format must start with the batch axis 'B'")
    if format.count("C") != 1:
        raise ValueError("format must indicate one channel axis 'C'")
    ch_dim = format.index("C")
    ch = x.shape[ch_dim]
    moved = jnp.moveaxis(x, ch_dim, -1).reshape(-1, ch)
    nz = np.nonzero(np.asarray(jnp.any(moved != 0, axis=1)))[0]
    shape_wo_c = [s for i, s in enumerate(x.shape) if i != ch_dim]
    grids = np.meshgrid(
        *[np.arange(s) for s in shape_wo_c], indexing="ij"
    )
    all_coords = np.stack(
        [g.reshape(-1) for g in grids], axis=1
    ).astype(np.int32)
    coords = all_coords[nz]
    feats = moved[jnp.asarray(nz)]
    return SparseTensor(feats, coords)


def to_sparse_all(dense_tensor, coordinates=None):
    """Dense → SparseTensor keeping every location
    (reference: MinkowskiOps.py:322-350)."""
    x = jnp.asarray(dense_tensor)
    ch = x.shape[1]
    moved = jnp.moveaxis(x, 1, -1).reshape(-1, ch)
    coords = dense_coordinates(x.shape) if coordinates is None else coordinates
    return SparseTensor(moved, coords)


class MinkowskiToSparseTensor(MinkowskiModuleBase):
    """Module form of to_sparse (reference: MinkowskiOps.py:351-413)."""

    def __init__(self, remove_zeros: bool = True, coordinates=None):
        self.remove_zeros = bool(remove_zeros)
        self.coordinates = coordinates

    def __call__(self, input):
        if self.remove_zeros:
            return to_sparse(input, coordinates=self.coordinates)
        return to_sparse_all(input, coordinates=self.coordinates)

    def __repr__(self):
        return self.__class__.__name__ + f"(remove_zeros={self.remove_zeros})"


class MinkowskiToDenseTensor(MinkowskiModuleBase):
    """SparseTensor → dense (B, ch, *spatial)
    (reference: MinkowskiOps.py:414-459)."""

    def __init__(self, shape=None):
        self.shape = shape

    def __call__(self, input: SparseTensor):
        dense, _, _ = input.dense(shape=self.shape)
        return dense


class MinkowskiToFeature(MinkowskiModuleBase):
    """Extract the exact-size feature matrix
    (reference: MinkowskiOps.py:460-479)."""

    def __call__(self, input):
        return input.F


class MinkowskiStackCat(nnx.Sequential):
    """Run submodules in parallel on the input and cat the results
    (reference: MinkowskiOps.py:480-484)."""

    def __call__(self, x):
        return cat([layer(x) for layer in self.layers])


class MinkowskiStackSum(nnx.Sequential):
    def __call__(self, x):
        return _sum([layer(x) for layer in self.layers])


class MinkowskiStackMean(nnx.Sequential):
    def __call__(self, x):
        return mean([layer(x) for layer in self.layers])


class MinkowskiStackVar(nnx.Sequential):
    def __call__(self, x):
        return var([layer(x) for layer in self.layers])
