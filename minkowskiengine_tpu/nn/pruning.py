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
