"""Interpolation module (reference: MinkowskiEngine/MinkowskiInterpolation.py)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import functional as F
from ..sparse_tensor import SparseTensor
from .module import MinkowskiModuleBase


class MinkowskiInterpolationFunction:
    """Functional shim mirroring the reference autograd Function
    (MinkowskiInterpolation.py:39-85)."""

    @staticmethod
    def apply(input_features, tfield, in_coordinate_map_key, coordinate_manager):
        rows, weights = coordinate_manager.interpolation_map_weight(
            in_coordinate_map_key, tfield
        )
        out = F.interpolate_features(input_features, rows, weights)
        # flatten (N, 2^D) neighbor structure into the reference's
        # (in_map, out_map, weights) triplet format
        n, c = rows.shape
        out_map = jnp.repeat(jnp.arange(n, dtype=jnp.int32), c)
        return out, rows.reshape(-1), out_map, weights.reshape(-1)


class MinkowskiInterpolation(MinkowskiModuleBase):
    """Sample a sparse tensor at continuous coordinates via multilinear
    interpolation (reference: MinkowskiInterpolation.py:88-131)."""

    def __init__(self, return_kernel_map: bool = False, return_weights: bool = False):
        self.return_kernel_map = bool(return_kernel_map)
        self.return_weights = bool(return_weights)

    def __call__(self, input: SparseTensor, tfield: jnp.ndarray):
        tfield = jnp.asarray(tfield, jnp.float32)
        out, in_map, out_map, weights = MinkowskiInterpolationFunction.apply(
            input.padded_features,
            tfield,
            input.coordinate_map_key,
            input.coordinate_manager,
        )
        returns = [out]
        if self.return_kernel_map:
            returns.append((in_map, out_map))
        if self.return_weights:
            returns.append(weights)
        return returns[0] if len(returns) == 1 else tuple(returns)

    def __repr__(self):
        return self.__class__.__name__ + "()"
