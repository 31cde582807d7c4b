"""Union module (reference: MinkowskiEngine/MinkowskiUnion.py:33-156)."""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from ..ops import functional as F
from ..sparse_tensor import SparseTensor, _invert_union_map
from .module import MinkowskiModuleBase


class MinkowskiUnion(MinkowskiModuleBase):
    """Sum features of sparse tensors over the union of their coordinates.

    The reference scatter-adds per input (MinkowskiUnion.py:48-60); here the
    union row per input tensor is unique, so the op is a gather-sum.
    """

    def __call__(self, *inputs: SparseTensor) -> SparseTensor:
        if len(inputs) == 0:
            raise ValueError("MinkowskiUnion requires at least one input")
        for x in inputs:
            if not isinstance(x, SparseTensor):
                raise TypeError("All inputs must be SparseTensors")
            if x.coordinate_manager is not inputs[0].coordinate_manager:
                raise ValueError("All inputs must share a coordinate manager")
            if x.tensor_stride != inputs[0].tensor_stride:
                raise ValueError("All inputs must share a tensor stride")
            if x._F.shape[1] != inputs[0]._F.shape[1]:
                raise ValueError("All inputs must share the channel size")
        manager = inputs[0].coordinate_manager
        keys = [x.coordinate_map_key for x in inputs]
        union_key = manager.merge(keys)
        maps = manager.union_map(keys, union_key)
        cap = manager.capacity(union_key)
        inv = [_invert_union_map(m, cap) for m in maps]
        out = F.union_features([x.padded_features for x in inputs], inv)
        return SparseTensor(
            out, coordinate_map_key=union_key, coordinate_manager=manager
        )

    def __repr__(self):
        return self.__class__.__name__ + "()"


class MinkowskiUnionFunction:
    """Functional shim mirroring the reference autograd Function
    (MinkowskiUnion.py:33-83): gather-sum into the union map rows."""

    @staticmethod
    def apply(in_coords_keys, out_coords_key, coordinate_manager, *in_feats):
        if len(in_feats) != len(in_coords_keys):
            raise ValueError(
                "The input features and keys must have the same length"
            )
        maps = coordinate_manager.union_map(
            list(in_coords_keys), out_coords_key
        )
        cap = coordinate_manager.capacity(out_coords_key)
        inv = [_invert_union_map(m, cap) for m in maps]
        return F.union_features(list(in_feats), inv)
