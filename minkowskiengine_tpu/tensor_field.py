"""TensorField: features on continuous (float) coordinates.

Re-designs reference MinkowskiEngine/MinkowskiTensorField.py.  A TensorField
holds raw, unquantized points; `.sparse()` voxelizes it onto a SparseTensor
(caching the field→sparse row map in the manager so `SparseTensor.slice`
can invert it), `.splat()` scatters with multilinear weights.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .coords.manager import CoordinateManager, CoordinateMapKey
from .ops import functional as F
from .sparse_tensor import SparseTensor, _pad_features
from .tensor import (
    SparseTensorOperationMode,
    global_coordinate_manager,
    set_global_coordinate_manager,
    sparse_tensor_operation_mode,
)
from .types import SparseTensorQuantizationMode


@jax.tree_util.register_pytree_node_class
class TensorField:
    def __init__(
        self,
        features,
        coordinates=None,
        *,
        tensor_stride=1,
        coordinate_field_map_key: Optional[CoordinateMapKey] = None,
        coordinate_manager: Optional[CoordinateManager] = None,
        quantization_mode: SparseTensorQuantizationMode = (
            SparseTensorQuantizationMode.UNWEIGHTED_AVERAGE
        ),
        allocator_type=None,
        minkowski_algorithm=None,
        requires_grad=None,
        device=None,
    ):
        if coordinates is None and (
            coordinate_field_map_key is None or coordinate_manager is None
        ):
            raise ValueError(
                "Either coordinates or (coordinate_field_map_key, "
                "coordinate_manager) must be provided"
            )
        features = jnp.asarray(features)
        if features.ndim != 2:
            raise ValueError(f"features must be rank-2, got {features.shape}")
        self.quantization_mode = quantization_mode

        if coordinates is not None:
            coordinates = jnp.asarray(coordinates, jnp.float32)
            if features.shape[0] != coordinates.shape[0]:
                raise ValueError("features/coordinates row mismatch")
            D = coordinates.shape[1] - 1
            if coordinate_manager is None:
                if (
                    sparse_tensor_operation_mode()
                    == SparseTensorOperationMode.SHARE_COORDINATE_MANAGER
                ):
                    coordinate_manager = global_coordinate_manager()
                    if coordinate_manager is None:
                        coordinate_manager = CoordinateManager(D=D)
                        set_global_coordinate_manager(coordinate_manager)
                else:
                    coordinate_manager = CoordinateManager(D=D)
            coordinate_field_map_key = coordinate_manager.insert_field(
                coordinates, tensor_stride
            )
        fmap = coordinate_manager._get_field_map(coordinate_field_map_key)
        self._F = _pad_features(features, fmap.capacity)
        self.coordinate_field_map_key = coordinate_field_map_key
        self._manager = coordinate_manager
        self._splat_cache = None

    # -- pytree ---------------------------------------------------------
    def tree_flatten(self):
        return (self._F,), (
            self.coordinate_field_map_key,
            self._manager,
            self.quantization_mode,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj._F,) = children
        (
            obj.coordinate_field_map_key,
            obj._manager,
            obj.quantization_mode,
        ) = aux
        obj._splat_cache = None
        return obj

    # -- properties -----------------------------------------------------
    @property
    def coordinate_manager(self):
        return self._manager

    @property
    def D(self):
        return self._manager.D

    @property
    def size(self) -> int:
        return self._manager._get_field_map(self.coordinate_field_map_key).size

    @property
    def size_array(self):
        """Valid-row count as an int32 scalar (field sizes are host-known
        at insert time, so this is a constant, not a traced leaf)."""
        return jnp.int32(self.size)

    @property
    def valid_row_mask(self):
        return jnp.arange(self._F.shape[0], dtype=jnp.int32) < self.size

    @property
    def F(self):
        return self._F[: self.size]

    @property
    def features(self):
        return self.F

    @property
    def padded_features(self):
        return self._F

    @property
    def C(self):
        return self._manager.get_coordinate_field(self.coordinate_field_map_key)

    @property
    def coordinates(self):
        return self.C

    @property
    def shape(self):
        return (self.size, int(self._F.shape[1]))

    @property
    def dtype(self):
        return self._F.dtype

    def __len__(self):
        return self.size

    def _wrap(self, padded_features):
        return TensorField(
            padded_features,
            coordinate_field_map_key=self.coordinate_field_map_key,
            coordinate_manager=self._manager,
            quantization_mode=self.quantization_mode,
        )

    # -- conversion -----------------------------------------------------
    def sparse(
        self,
        tensor_stride=1,
        coordinate_map_key: Optional[CoordinateMapKey] = None,
        quantization_mode: Optional[SparseTensorQuantizationMode] = None,
    ) -> SparseTensor:
        """Voxelize to a SparseTensor (reference:
        MinkowskiTensorField.py:286-379)."""
        if quantization_mode is None:
            quantization_mode = self.quantization_mode
        Q = SparseTensorQuantizationMode
        if quantization_mode == Q.SPLAT_LINEAR_INTERPOLATION:
            # The reference asserts "use .splat()" here
            # (MinkowskiTensorField.py:294-297); we wire it through instead.
            ts = tensor_stride
            if coordinate_map_key is not None:
                ts = coordinate_map_key.get_tensor_stride()
            from .types import as_tuple

            if as_tuple(ts, self.D) != (1,) * self.D:
                raise ValueError(
                    "SPLAT_LINEAR_INTERPOLATION voxelizes onto the unit "
                    "lattice (tensor_stride 1)"
                )
            return self.splat()
        if coordinate_map_key is None:
            coordinate_map_key, (
                _,
                _,
            ) = self._manager.field_to_sparse_insert_and_map(
                self.coordinate_field_map_key, tensor_stride
            )
        inverse = self._manager.field_to_sparse_map(
            self.coordinate_field_map_key, coordinate_map_key
        )
        cap_out = self._manager.capacity(coordinate_map_key)
        if quantization_mode == Q.UNWEIGHTED_AVERAGE:
            feats = F.segment_mean(self._F, inverse, cap_out)
        elif quantization_mode == Q.UNWEIGHTED_SUM:
            feats = F.segment_sum(self._F, inverse, cap_out)
        elif quantization_mode == Q.MAX_POOL:
            feats = F.segment_max(self._F, inverse, cap_out)
        elif quantization_mode == Q.RANDOM_SUBSAMPLE:
            # first field row per voxel
            cap_in = inverse.shape[0]
            first = (
                jnp.full((cap_out + 1,), cap_in, jnp.int32)
                .at[jnp.where(inverse >= 0, inverse, cap_out)]
                .min(jnp.arange(cap_in, dtype=jnp.int32), mode="drop")[:cap_out]
            )
            feats = F.take_rows(self._F, first)
        else:
            raise ValueError(f"Unsupported quantization mode {quantization_mode}")
        out = SparseTensor(
            feats,
            coordinate_map_key=coordinate_map_key,
            coordinate_manager=self._manager,
        )
        return out

    def splat(self) -> SparseTensor:
        """Scatter field features onto lattice corners with multilinear
        weights (reference: MinkowskiTensorField.py:381-406)."""
        fmap = self._manager._get_field_map(self.coordinate_field_map_key)
        # build the corner (splat) coordinate set: all 2^D neighbors
        coords = np.asarray(fmap.coordinates[: fmap.size])
        floor = np.floor(coords[:, 1:]).astype(np.int32)
        D = self.D
        corner_list = []
        import itertools as it

        for bits in it.product((0, 1), repeat=D):
            corner_list.append(
                np.concatenate(
                    [coords[:, :1].astype(np.int32), floor + np.array(bits, np.int32)],
                    axis=1,
                )
            )
        all_corners = np.concatenate(corner_list, axis=0)
        sparse_key, _ = self._manager.insert_and_map(all_corners, (1,) * D)
        rows, weights = self._manager.interpolation_map_weight(
            sparse_key, fmap.coordinates[: fmap.size]
        )
        cap_out = self._manager.capacity(sparse_key)
        feats = F.splat_features(self.F, rows, weights, cap_out)
        self._splat_cache = (sparse_key, rows, weights)
        return SparseTensor(
            feats,
            coordinate_map_key=sparse_key,
            coordinate_manager=self._manager,
        )

    def inverse_mapping(self, sparse_tensor_map_key: CoordinateMapKey):
        """Field-row → sparse-row map for a sparse key derived from this
        field (reference: MinkowskiTensorField.py:408-450)."""
        return self._manager.field_to_sparse_map(
            self.coordinate_field_map_key, sparse_tensor_map_key
        )

    def __add__(self, other):
        o = other._F if isinstance(other, TensorField) else other
        return self._wrap(self._F + o)

    def __mul__(self, other):
        o = other._F if isinstance(other, TensorField) else other
        return self._wrap(self._F * o)

    def __repr__(self):
        return (
            f"{self.__class__.__name__}(\n  coordinates={self.C!r}\n"
            f"  features={self.F!r}\n  shape={self.shape})"
        )
