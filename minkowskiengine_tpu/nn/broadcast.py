"""Broadcast modules: combine per-batch global features with dense rows.

Re-designs reference MinkowskiEngine/MinkowskiBroadcast.py:40-253.  The
backward passes are free (autodiff through gathers); the reference
hand-writes them in src/broadcast_kernel.cu.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import functional as F
from ..sparse_tensor import SparseTensor
from ..types import BroadcastMode
from .module import MinkowskiModuleBase


class MinkowskiBroadcastBase(MinkowskiModuleBase):
    def __init__(self, operation_type: BroadcastMode):
        self.operation_type = operation_type

    def __call__(
        self, input: SparseTensor, input_glob: SparseTensor
    ) -> SparseTensor:
        if input._F.shape[1] != input_glob._F.shape[1]:
            raise ValueError("channel mismatch between input and global tensor")
        origin_key, origin_rows = input.coordinate_manager.origin_map(
            input.coordinate_map_key
        )
        if input_glob.coordinate_map_key != origin_key:
            # global tensor must live on the origin map of the input
            if input_glob.size != input.coordinate_manager.size(origin_key):
                raise ValueError(
                    "input_glob must have one row per batch index of input"
                )
        op = (
            "add"
            if self.operation_type == BroadcastMode.ELEMENTWISE_ADDITON
            else "mul"
        )
        out = F.broadcast(
            input.padded_features, input_glob.padded_features, origin_rows, op
        )
        return SparseTensor(
            out,
            coordinate_map_key=input.coordinate_map_key,
            coordinate_manager=input.coordinate_manager,
        )

    def __repr__(self):
        return self.__class__.__name__


class MinkowskiBroadcastAddition(MinkowskiBroadcastBase):
    """out[p] = in[p] + glob[batch(p)] (reference: MinkowskiBroadcast.py:129)."""

    def __init__(self):
        super().__init__(BroadcastMode.ELEMENTWISE_ADDITON)


class MinkowskiBroadcastMultiplication(MinkowskiBroadcastBase):
    """out[p] = in[p] * glob[batch(p)] (reference: MinkowskiBroadcast.py:153)."""

    def __init__(self):
        super().__init__(BroadcastMode.ELEMENTWISE_MULTIPLICATION)


class MinkowskiBroadcast(MinkowskiModuleBase):
    """Replace every row with its batch's global row (reference:
    MinkowskiBroadcast.py:177-217)."""

    def __call__(self, input: SparseTensor, input_glob: SparseTensor):
        origin_key, origin_rows = input.coordinate_manager.origin_map(
            input.coordinate_map_key
        )
        out = F.take_rows(input_glob.padded_features, origin_rows)
        return SparseTensor(
            out,
            coordinate_map_key=input.coordinate_map_key,
            coordinate_manager=input.coordinate_manager,
        )


class MinkowskiBroadcastConcatenation(MinkowskiBroadcast):
    """Concatenate the batch-global row onto every row (reference:
    MinkowskiBroadcast.py:218-253)."""

    def __call__(self, input: SparseTensor, input_glob: SparseTensor):
        origin_key, origin_rows = input.coordinate_manager.origin_map(
            input.coordinate_map_key
        )
        glob = F.take_rows(input_glob.padded_features, origin_rows)
        out = jnp.concatenate([input.padded_features, glob], axis=1)
        return SparseTensor(
            out,
            coordinate_map_key=input.coordinate_map_key,
            coordinate_manager=input.coordinate_manager,
        )


class MinkowskiBroadcastFunction:
    """Functional shim (reference: MinkowskiBroadcast.py:40-96)."""

    @staticmethod
    def apply(input_features, input_features_global, operation_type,
              in_coordinate_map_key, glob_coordinate_map_key,
              coordinate_manager):
        origin_key, origin_rows = coordinate_manager.origin_map(
            in_coordinate_map_key
        )
        op = (
            "add"
            if operation_type == BroadcastMode.ELEMENTWISE_ADDITON
            else "mul"
        )
        return F.broadcast(
            input_features, input_features_global, origin_rows, op
        )
