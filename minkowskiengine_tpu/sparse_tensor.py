"""SparseTensor: features on a discrete coordinate map.

TPU-native re-design of reference MinkowskiEngine/MinkowskiSparseTensor.py.
A SparseTensor is a **registered pytree**: its padded feature matrix (and
dynamic row count) are leaves, while the coordinate-map key and manager ride
as static aux data.  That means SparseTensors flow through `jax.jit`,
`jax.grad`, `shard_map` etc. — with the rule that all coordinate structure
must already be cached in the manager (the coordinate phase is host-driven;
see coords/manager.py).

Internal feature rows are padded to the coordinate map's capacity and
ordered like the map (canonical batch-major key order).  `.F`/`.C` return
exact-size views for API parity with the reference.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .coords.manager import CoordinateManager, CoordinateMapKey
from .ops import functional as F
from .tensor import (
    SparseTensorOperationMode,
    global_coordinate_manager,
    set_global_coordinate_manager,
    sparse_tensor_operation_mode,
)
from .types import SparseTensorQuantizationMode


def _pad_features(features: jnp.ndarray, capacity: int) -> jnp.ndarray:
    n = features.shape[0]
    if n == capacity:
        return features
    if n > capacity:
        raise ValueError(
            f"features rows ({n}) exceed coordinate map capacity ({capacity})"
        )
    pad = jnp.zeros((capacity - n,) + tuple(features.shape[1:]), features.dtype)
    return jnp.concatenate([features, pad])


@jax.tree_util.register_pytree_node_class
class SparseTensor:
    """A sparse tensor: N×ch features attached to a coordinate map.

    Construction paths (mirroring MinkowskiSparseTensor.py:122-345):

    * ``SparseTensor(features, coordinates)`` — quantizes coordinates
      (unique + inverse) and reduces duplicate-coordinate features according
      to ``quantization_mode``.
    * ``SparseTensor(features, coordinate_map_key=key,
      coordinate_manager=mgr)`` — attach features to an existing map; rows
      must follow the map's canonical order (exact-size or padded).
    """

    def __init__(
        self,
        features,
        coordinates=None,
        *,
        tensor_stride: Union[int, Sequence[int]] = 1,
        coordinate_map_key: Optional[CoordinateMapKey] = None,
        coordinate_manager: Optional[CoordinateManager] = None,
        quantization_mode: SparseTensorQuantizationMode = (
            SparseTensorQuantizationMode.RANDOM_SUBSAMPLE
        ),
        allocator_type=None,
        minkowski_algorithm=None,
        requires_grad=None,
        device=None,
    ):
        if coordinates is None and (
            coordinate_map_key is None or coordinate_manager is None
        ):
            raise ValueError(
                "Either coordinates or (coordinate_map_key, coordinate_manager) "
                "must be provided"
            )
        features = jnp.asarray(features)
        if features.ndim != 2:
            raise ValueError(f"features must be rank-2, got {features.shape}")
        self.quantization_mode = quantization_mode
        self.unique_index = None
        self.inverse_mapping = None

        if (
            coordinates is not None
            and quantization_mode
            == SparseTensorQuantizationMode.SPLAT_LINEAR_INTERPOLATION
        ):
            # Continuous coordinates splatted onto the unit lattice with
            # multilinear weights (reference quantization-mode dispatch:
            # MinkowskiSparseTensor.py:318-343 + MinkowskiTensorField
            # splat machinery).
            from .tensor_field import TensorField

            tf = TensorField(
                features,
                jnp.asarray(coordinates, jnp.float32),
                coordinate_manager=coordinate_manager,
                quantization_mode=quantization_mode,
            )
            st = tf.splat()
            self._F = st._F
            self.coordinate_map_key = st.coordinate_map_key
            self._manager = st._manager
            self._batch_boundaries = None
            return

        if coordinates is not None:
            coordinates = jnp.asarray(coordinates, jnp.int32)
            if coordinates.ndim != 2:
                raise ValueError(
                    f"coordinates must be rank-2, got {coordinates.shape}"
                )
            if features.shape[0] != coordinates.shape[0]:
                raise ValueError(
                    "features and coordinates must have matching rows: "
                    f"{features.shape[0]} vs {coordinates.shape[0]}"
                )
            D = coordinates.shape[1] - 1
            if coordinate_manager is None:
                if (
                    sparse_tensor_operation_mode()
                    == SparseTensorOperationMode.SHARE_COORDINATE_MANAGER
                ):
                    coordinate_manager = global_coordinate_manager()
                    if coordinate_manager is None:
                        coordinate_manager = CoordinateManager(
                            D=D,
                            allocator_type=allocator_type,
                            minkowski_algorithm=minkowski_algorithm,
                        )
                        set_global_coordinate_manager(coordinate_manager)
                else:
                    coordinate_manager = CoordinateManager(
                        D=D,
                        allocator_type=allocator_type,
                        minkowski_algorithm=minkowski_algorithm,
                    )
            (
                coordinate_map_key,
                unique_map,
                inverse_map,
                n_in,
                n_unique,
            ) = coordinate_manager.insert_and_map_padded(
                coordinates, tensor_stride
            )
            self.unique_index = unique_map[:n_unique]
            self.inverse_mapping = inverse_map[:n_in]
            cap_out = coordinate_manager.capacity(coordinate_map_key)
            feats_padded = _pad_features(features, unique_map.shape[0])
            qm = quantization_mode
            Q = SparseTensorQuantizationMode
            if qm in (Q.RANDOM_SUBSAMPLE, Q.NO_QUANTIZATION):
                reduced = F.take_rows(feats_padded, unique_map)[:cap_out]
            elif qm == Q.UNWEIGHTED_AVERAGE:
                reduced = F.segment_mean(feats_padded, inverse_map, cap_out)
            elif qm == Q.UNWEIGHTED_SUM:
                reduced = F.segment_sum(feats_padded, inverse_map, cap_out)
            elif qm == Q.MAX_POOL:
                reduced = F.segment_max(feats_padded, inverse_map, cap_out)
            else:
                raise ValueError(f"Unsupported quantization mode {qm}")
            self._F = reduced
        else:
            cap = coordinate_manager.capacity(coordinate_map_key)
            self._F = _pad_features(features, cap)

        self.coordinate_map_key = coordinate_map_key
        self._manager = coordinate_manager
        self._batch_boundaries = None

    # ------------------------------------------------------------------
    # pytree protocol — features are leaves; coordinate structure is aux.
    # ------------------------------------------------------------------
    def tree_flatten(self):
        return (self._F,), (
            self.coordinate_map_key,
            self._manager,
            self.quantization_mode,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj._F,) = children
        obj.coordinate_map_key, obj._manager, obj.quantization_mode = aux
        obj.unique_index = None
        obj.inverse_mapping = None
        obj._batch_boundaries = None
        return obj

    # ------------------------------------------------------------------
    # basic properties
    # ------------------------------------------------------------------
    @property
    def coordinate_manager(self) -> CoordinateManager:
        return self._manager

    @property
    def D(self) -> int:
        return self._manager.D

    @property
    def dimension(self) -> int:
        return self.D

    @property
    def tensor_stride(self) -> Tuple[int, ...]:
        return self.coordinate_map_key.get_tensor_stride()

    @property
    def size(self) -> int:
        """Number of valid rows (host int)."""
        return self._manager.size(self.coordinate_map_key)

    @property
    def capacity(self) -> int:
        return int(self._F.shape[0])

    @property
    def size_array(self):
        """Valid-row count as a traceable int32 scalar."""
        return self._manager.size_array(self.coordinate_map_key)

    @property
    def valid_row_mask(self):
        """(capacity,) bool — True on valid rows.  Traceable."""
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.size_array

    @property
    def F(self) -> jnp.ndarray:
        """Exact-size (N, ch) features — API parity accessor (eager only)."""
        return self._F[: self.size]

    @property
    def features(self) -> jnp.ndarray:
        return self.F

    @property
    def padded_features(self) -> jnp.ndarray:
        """The (capacity, ch) padded feature buffer (traceable accessor)."""
        return self._F

    @property
    def C(self) -> jnp.ndarray:
        """Exact-size (N, D+1) coordinates."""
        return self._manager.get_coordinates(self.coordinate_map_key)

    @property
    def coordinates(self) -> jnp.ndarray:
        return self.C

    @property
    def coordinate_map(self):
        return self._manager.get_coordinate_map(self.coordinate_map_key)

    @property
    def shape(self):
        return (self.size, int(self._F.shape[1]))

    @property
    def dtype(self):
        return self._F.dtype

    def __len__(self):
        return self.size

    @property
    def requires_grad(self):  # torch-API shim
        return True

    def detach(self) -> "SparseTensor":
        return self._wrap(jax.lax.stop_gradient(self._F))

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------
    def _wrap(self, padded_features: jnp.ndarray, key=None) -> "SparseTensor":
        """New SparseTensor with this coordinate structure (or ``key``)."""
        return SparseTensor(
            padded_features,
            coordinate_map_key=key or self.coordinate_map_key,
            coordinate_manager=self._manager,
        )

    def _same_key(self, other: "SparseTensor") -> bool:
        return (
            isinstance(other, SparseTensor)
            and self._manager is other._manager
            and self.coordinate_map_key == other.coordinate_map_key
        )

    # ------------------------------------------------------------------
    # batch decomposition (reference: MinkowskiTensor.py:277-423)
    # ------------------------------------------------------------------
    def _boundaries(self) -> np.ndarray:
        """Per-batch row ranges; rows are batch-major sorted by construction."""
        if self._batch_boundaries is None:
            batches = np.asarray(self.C[:, 0])
            uniq = np.unique(batches)
            starts = np.searchsorted(batches, uniq, side="left")
            ends = np.searchsorted(batches, uniq, side="right")
            self._batch_boundaries = (uniq, starts, ends)
        return self._batch_boundaries

    @property
    def _batchwise_row_indices(self) -> List[jnp.ndarray]:
        uniq, starts, ends = self._boundaries()
        return [jnp.arange(s, e) for s, e in zip(starts, ends)]

    @property
    def decomposed_coordinates(self) -> List[jnp.ndarray]:
        uniq, starts, ends = self._boundaries()
        C = self.C
        return [C[s:e, 1:] for s, e in zip(starts, ends)]

    @property
    def decomposed_features(self) -> List[jnp.ndarray]:
        uniq, starts, ends = self._boundaries()
        Ft = self.F
        return [Ft[s:e] for s, e in zip(starts, ends)]

    @property
    def decomposed_coordinates_and_features(self):
        return self.decomposed_coordinates, self.decomposed_features

    def coordinates_at(self, batch_index: int) -> jnp.ndarray:
        uniq, starts, ends = self._boundaries()
        i = int(np.searchsorted(uniq, batch_index))
        return self.C[starts[i] : ends[i], 1:]

    def features_at(self, batch_index: int) -> jnp.ndarray:
        uniq, starts, ends = self._boundaries()
        i = int(np.searchsorted(uniq, batch_index))
        return self.F[starts[i] : ends[i]]

    # ------------------------------------------------------------------
    # conversion (reference: MinkowskiSparseTensor.py:348-557)
    # ------------------------------------------------------------------
    def dense(
        self,
        shape: Optional[Sequence[int]] = None,
        min_coordinate: Optional[np.ndarray] = None,
        contract_stride: bool = True,
    ):
        """Densify to a (B, ch, *spatial) array (channels-first, matching the
        reference).  Returns (dense, min_coordinate, tensor_stride)."""
        coords = np.asarray(self.C)
        feats = self.F
        ts = np.asarray(self.tensor_stride)
        if min_coordinate is None:
            if coords.shape[0] == 0:
                min_coordinate = np.zeros(self.D, np.int32)
            else:
                min_coordinate = coords[:, 1:].min(axis=0)
        else:
            min_coordinate = np.asarray(min_coordinate, np.int32)
            if (coords[:, 1:] < min_coordinate).any():
                raise ValueError("min_coordinate is larger than some coordinates")
        spatial = coords[:, 1:] - min_coordinate
        if contract_stride:
            spatial = spatial // ts
        batch = coords[:, 0]
        B = int(batch.max()) + 1 if coords.shape[0] else 1
        if shape is not None:
            if len(shape) != self.D + 2:
                raise ValueError(
                    f"shape must have {self.D + 2} entries (B, ch, *spatial)"
                )
            B = max(B, int(shape[0]))
            sp_shape = tuple(int(s) for s in shape[2:])
        else:
            sp_shape = tuple(int(s) + 1 for s in spatial.max(axis=0)) if len(
                spatial
            ) else (1,) * self.D
        ch = int(self._F.shape[1])
        dense = jnp.zeros((B, ch) + sp_shape, feats.dtype)
        idx = (jnp.asarray(batch), slice(None)) + tuple(
            jnp.asarray(spatial[:, d]) for d in range(self.D)
        )
        dense = dense.at[idx].set(feats)
        return dense, jnp.asarray(min_coordinate), self.tensor_stride

    def sparse(self, min_coords=None, max_coords=None, contract_coords=True):
        """Export as ``(BCOO, min_coords, tensor_stride)`` of shape
        (B, *spatial, ch) — the JAX-native analogue of the reference's
        torch.sparse_coo export (MinkowskiSparseTensor.py:348-457):
        ``min_coords``/``max_coords`` fix the output window (both must be
        divisible by the tensor stride; max is inclusive), and
        ``contract_coords`` divides coordinates by the stride."""
        from jax.experimental import sparse as jsparse

        coords = np.asarray(self.C)
        ts = np.asarray(self.tensor_stride, dtype=np.int64)
        spatial = coords[:, 1:].astype(np.int64)

        if min_coords is not None:
            min_c = np.asarray(min_coords, dtype=np.int64).reshape(-1)
            if min_c.size != self.D:
                raise ValueError(
                    f"min_coords must have {self.D} elements, got {min_c.size}"
                )
            if (min_c % ts).any():
                raise ValueError(
                    "The minimum coordinates must be divisible by the "
                    "tensor stride."
                )
        elif coords.shape[0]:
            min_c = spatial.min(axis=0)
        else:
            min_c = np.zeros(self.D, dtype=np.int64)

        max_c = None
        if max_coords is not None:
            max_c = np.asarray(max_coords, dtype=np.int64).reshape(-1)
            if max_c.size != self.D:
                raise ValueError(
                    f"max_coords must have {self.D} elements, got {max_c.size}"
                )
            if (max_c % ts).any():
                raise ValueError(
                    "The maximum coordinates must be divisible by the "
                    "tensor stride."
                )

        spatial = spatial - min_c
        if contract_coords:
            spatial = spatial // ts
            if max_c is not None:
                max_c = max_c // ts
            min_c = min_c // ts

        B = int(coords[:, 0].max()) + 1 if coords.shape[0] else 1
        if max_c is not None:
            # Fixed window, inclusive max (reference :444-451).
            sp_shape = tuple(int(s) for s in (max_c - min_c + 1))
        elif coords.shape[0]:
            sp_shape = tuple(int(s) + 1 for s in spatial.max(axis=0))
        else:
            sp_shape = (1,) * self.D
        indices = jnp.concatenate(
            [jnp.asarray(coords[:, :1]), jnp.asarray(spatial, jnp.int32)],
            axis=1,
        )
        shape = (B,) + sp_shape + (int(self._F.shape[1]),)
        bcoo = jsparse.BCOO(
            (self.F, indices), shape=shape, unique_indices=True
        )
        return bcoo, jnp.asarray(min_c, jnp.int32), tuple(int(t) for t in ts)

    # ------------------------------------------------------------------
    # field bridges (reference: MinkowskiSparseTensor.py:559-718)
    # ------------------------------------------------------------------
    def slice(self, X):
        """Map features back onto the TensorField this tensor came from
        (reference: MinkowskiSparseTensor.py:559-632)."""
        from .tensor_field import TensorField

        if not isinstance(X, TensorField):
            raise TypeError("slice requires a TensorField input")
        inverse = X.inverse_mapping(self.coordinate_map_key)
        feats = F.take_rows(self._F, inverse)
        return TensorField(
            feats,
            coordinate_field_map_key=X.coordinate_field_map_key,
            coordinate_manager=self._manager,
            quantization_mode=X.quantization_mode,
        )

    def cat_slice(self, X):
        """slice + concatenate the field's own features
        (reference: MinkowskiSparseTensor.py:634-688)."""
        from .tensor_field import TensorField

        inverse = X.inverse_mapping(self.coordinate_map_key)
        feats = jnp.concatenate(
            [X.padded_features, F.take_rows(self._F, inverse)], axis=1
        )
        return TensorField(
            feats,
            coordinate_field_map_key=X.coordinate_field_map_key,
            coordinate_manager=self._manager,
            quantization_mode=X.quantization_mode,
        )

    def features_at_coordinates(self, query_coordinates: jnp.ndarray):
        """Interpolate features at arbitrary continuous coordinates
        (reference: MinkowskiSparseTensor.py:690-718)."""
        rows, weights = self._manager.interpolation_map_weight(
            self.coordinate_map_key, query_coordinates
        )
        return F.interpolate_features(self._F, rows, weights)

    def interpolate(self, X):
        """Features of this tensor sampled at a TensorField's points."""
        from .tensor_field import TensorField

        if not isinstance(X, TensorField):
            raise TypeError("interpolate requires a TensorField input")
        return self.features_at_coordinates(X.C)

    # ------------------------------------------------------------------
    # arithmetic (reference: MinkowskiTensor.py:511-585)
    # ------------------------------------------------------------------
    def _mask_pad(self, padded: jnp.ndarray, n_valid) -> jnp.ndarray:
        """Re-zero padding rows after an op that doesn't map (0,0)→0.

        Without this, ``a / b`` computes 0/0=NaN on padding rows and the NaN
        poisons every downstream masked reduction (NaN·0 = NaN)."""
        valid = jnp.arange(padded.shape[0]) < n_valid
        return jnp.where(valid[:, None], padded, 0)

    def _binary(self, other, op):
        if isinstance(other, SparseTensor):
            if self._same_key(other):
                return self._wrap(
                    self._mask_pad(op(self._F, other._F), self.size_array)
                )
            if self._manager is not other._manager:
                raise ValueError(
                    "Both SparseTensors must share a coordinate manager for "
                    "mixed-coordinate arithmetic"
                )
            union_key = self._manager.merge(
                [self.coordinate_map_key, other.coordinate_map_key]
            )
            maps = self._manager.union_map(
                [self.coordinate_map_key, other.coordinate_map_key], union_key
            )
            inv = [_invert_union_map(m, self._manager.capacity(union_key)) for m in maps]
            fa = F.take_rows(self._F, inv[0])
            fb = F.take_rows(other._F, inv[1])
            return SparseTensor(
                self._mask_pad(op(fa, fb), self._manager.size_array(union_key)),
                coordinate_map_key=union_key,
                coordinate_manager=self._manager,
            )
        return self._wrap(self._mask_pad(op(self._F, other), self.size_array))

    def __add__(self, other):
        return self._binary(other, lambda a, b: a + b)

    def __radd__(self, other):
        return self._binary(other, lambda a, b: b + a)

    def __sub__(self, other):
        return self._binary(other, lambda a, b: a - b)

    def __mul__(self, other):
        return self._binary(other, lambda a, b: a * b)

    def __rmul__(self, other):
        return self._binary(other, lambda a, b: b * a)

    def __truediv__(self, other):
        return self._binary(other, lambda a, b: a / b)

    def __neg__(self):
        return self._wrap(-self._F)

    def __pow__(self, p):
        return self._wrap(self._mask_pad(self._F**p, self.size_array))

    def __repr__(self):
        return (
            f"{self.__class__.__name__}(\n"
            f"  coordinates={self.C!r}\n"
            f"  features={self.F!r}\n"
            f"  coordinate_map_key={self.coordinate_map_key}\n"
            f"  tensor_stride={self.tensor_stride}\n"
            f"  shape={self.shape})"
        )


def _invert_union_map(in_to_union: jnp.ndarray, union_capacity: int) -> jnp.ndarray:
    """Invert an injective row map: union row -> source row (or -1)."""
    C = in_to_union.shape[0]
    src = jnp.arange(C, dtype=jnp.int32)
    tgt = jnp.where(in_to_union >= 0, in_to_union, union_capacity)
    return (
        jnp.full((union_capacity,), -1, jnp.int32).at[tgt].set(src, mode="drop")
    )
