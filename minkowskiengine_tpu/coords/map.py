"""CoordinateMap: an immutable, sorted, padded coordinate set on device.

TPU-native replacement for the reference's hash-table maps
(reference: src/coordinate_map_cpu.hpp:287-341, src/coordinate_map_gpu.cuh:45-225).
Instead of a mutable hash table, a map is an immutable value: coordinates
stored **in ascending packed-key order** inside a fixed-capacity buffer, plus
a valid-row count.  Lookup is binary search (coords/lookup.py); "insertion"
is out-of-place construction (coords/unique.py).  Immutability is what makes
maps safe to bake into jitted feature programs and to shard across a device
mesh.

Capacities are power-of-two bucketed so the number of distinct compiled
shapes stays logarithmic in problem size.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import keys as K

MIN_CAPACITY = 128


def bucket_capacity(n: int, minimum: int = MIN_CAPACITY) -> int:
    """Smallest power-of-two >= max(n, minimum)."""
    n = max(int(n), minimum)
    return 1 << (n - 1).bit_length()


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CoordinateMap:
    """Sorted, padded coordinate map.

    Attributes:
      coordinates: (C, D+1) int32, batch-first rows in ascending key order;
        rows >= size are zero.
      key_lanes: tuple of (C,) uint32 packed key lanes (most significant
        first; 2 lanes for D <= 6, 3 for high-D); padding rows hold the
        max key.
      size_arr: int32 scalar — valid-row count as a pytree LEAF, so a
        compiled step is reusable across geometries of the same capacity
        bucket and stacked per-device maps can flow as sharded arguments
        (the count differs per device).  ``size`` lazily mirrors it to a
        host int for eager coordinate-phase code (one cached sync).
      tensor_stride: D-tuple of ints (static aux).
    """

    coordinates: jnp.ndarray
    key_lanes: Tuple[jnp.ndarray, ...]
    size_arr: jnp.ndarray
    tensor_stride: Tuple[int, ...]
    _size_host: Optional[int] = dataclasses.field(
        default=None, compare=False, repr=False
    )

    def __post_init__(self):
        object.__setattr__(self, "key_lanes", tuple(self.key_lanes))
        if isinstance(self.size_arr, (int, np.integer)):
            object.__setattr__(self, "_size_host", int(self.size_arr))
            object.__setattr__(
                self, "size_arr", jnp.asarray(self.size_arr, jnp.int32)
            )

    @property
    def size(self) -> int:
        """Host valid-row count (syncs once; unavailable under trace)."""
        if self._size_host is None:
            object.__setattr__(self, "_size_host", int(self.size_arr))
        return self._size_host

    @property
    def capacity(self) -> int:
        return int(self.coordinates.shape[0])

    @property
    def dimension(self) -> int:
        return int(self.coordinates.shape[1]) - 1

    @property
    def key_hi(self) -> jnp.ndarray:
        """Most-significant key lane (two-lane / D≤6 maps only — a
        three-lane map's key does not fit (hi, lo); use key_lanes)."""
        if len(self.key_lanes) != 2:
            raise NotImplementedError(
                f"{len(self.key_lanes)}-lane keys: use key_lanes"
            )
        return self.key_lanes[0]

    @property
    def key_lo(self) -> jnp.ndarray:
        """Least-significant key lane (two-lane maps only; see key_hi)."""
        if len(self.key_lanes) != 2:
            raise NotImplementedError(
                f"{len(self.key_lanes)}-lane keys: use key_lanes"
            )
        return self.key_lanes[1]

    @property
    def batch_indices(self) -> jnp.ndarray:
        return self.coordinates[:, 0]

    def valid_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.size_arr

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        # _size_host deliberately NOT in aux: aux is part of the jit cache
        # key and must be identical across same-bucket geometries.
        return (
            (self.coordinates, self.key_lanes, self.size_arr),
            (self.tensor_stride,),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        coordinates, key_lanes, size_arr = children
        (tensor_stride,) = aux
        return cls(coordinates, key_lanes, size_arr, tensor_stride)

    # -- construction --------------------------------------------------------
    @classmethod
    def from_sorted(
        cls,
        coordinates: jnp.ndarray,
        key_lanes,
        size: int,
        tensor_stride: Tuple[int, ...],
        capacity: Optional[int] = None,
    ) -> "CoordinateMap":
        """Build from already-sorted padded arrays, re-bucketing capacity."""
        key_lanes = tuple(key_lanes)
        cap = bucket_capacity(size) if capacity is None else capacity
        cur = coordinates.shape[0]
        if cap < cur:
            coordinates = coordinates[:cap]
            key_lanes = tuple(l[:cap] for l in key_lanes)
        elif cap > cur:
            pad = K.key_max(len(key_lanes))
            coordinates = jnp.concatenate(
                [coordinates, jnp.zeros((cap - cur, coordinates.shape[1]), coordinates.dtype)]
            )
            key_lanes = tuple(
                jnp.concatenate([l, jnp.full((cap - cur,), p, jnp.uint32)])
                for l, p in zip(key_lanes, pad)
            )
        return cls(coordinates, key_lanes, int(size), tuple(tensor_stride))

    def with_size_arr(self, size_arr: jnp.ndarray) -> "CoordinateMap":
        """Same buffers with a device-scalar size (deferred-sync paths)."""
        return CoordinateMap(
            self.coordinates, self.key_lanes,
            jnp.asarray(size_arr, jnp.int32), self.tensor_stride,
        )

    def to_numpy(self) -> np.ndarray:
        """Valid coordinate rows as a host (size, D+1) array."""
        return np.asarray(self.coordinates[: self.size])

    def __repr__(self):
        return (
            f"CoordinateMap(size={self.size}, capacity={self.capacity}, "
            f"D={self.dimension}, tensor_stride={self.tensor_stride})"
        )
