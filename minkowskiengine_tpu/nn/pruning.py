"""Pruning module (reference: MinkowskiEngine/MinkowskiPruning.py:38-121)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import functional as F
from ..sparse_tensor import SparseTensor
from .module import MinkowskiModuleBase


class MinkowskiPruning(MinkowskiModuleBase):
    """Remove rows where ``mask`` is False, producing a new coordinate map.

    The feature copy is a pure gather (differentiable); the reference
    hand-writes the scatter backward (src/pruning_cpu.cpp:43-140).
    """

    def __call__(self, input: SparseTensor, mask) -> SparseTensor:
        mask = jnp.asarray(mask)
        if mask.dtype != jnp.bool_:
            mask = mask.astype(bool)
        new_key, _, out_from_in = input.coordinate_manager.prune(
            input.coordinate_map_key, mask
        )
        out = F.prune_features(input.padded_features, out_from_in)
        return SparseTensor(
            out,
            coordinate_map_key=new_key,
            coordinate_manager=input.coordinate_manager,
        )

    def __repr__(self):
        return self.__class__.__name__ + "()"


class MinkowskiPruningFunction:
    """Functional shim mirroring the reference autograd Function
    (MinkowskiPruning.py:38-74).  The out key is created by the manager's
    prune (value-based keys: pass the result to SparseTensor)."""

    @staticmethod
    def apply(
        in_feat,
        mask,
        in_coords_key,
        out_coords_key=None,
        coords_manager=None,
    ):
        mask = jnp.asarray(mask)
        if mask.dtype != jnp.bool_:
            mask = mask.astype(bool)
        new_key, _, out_from_in = coords_manager.prune(in_coords_key, mask)
        if out_coords_key is not None:
            if not out_coords_key.is_key_set():
                out_coords_key.set_key(*new_key.get_key())  # fill, like the
                # reference's in-place out-key population
            elif new_key != out_coords_key:
                raise ValueError(
                    "out_coords_key does not match the pruned map "
                    "for this mask"
                )
        return F.prune_features(in_feat, out_from_in)
