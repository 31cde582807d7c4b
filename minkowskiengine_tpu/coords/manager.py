"""CoordinateManager: the cached coordinate/kernel-map session object.

TPU-native re-expression of the reference's ``CoordinateMapManager``
(reference: src/coordinate_map_manager.hpp:87-565, .cpp:349-1414) and its
Python wrapper (MinkowskiEngine/MinkowskiCoordinateManager.py:107-498).

Design split (the central TPU-first decision):

* the **coordinate phase** — building coordinate maps and kernel maps — is
  host-driven and eager, exactly like the reference's C++ manager: each op
  launches small jitted device programs over padded buffers, syncs one scalar
  count back to the host, and caches the result by the same cache keys the
  reference uses (``kernel_map_key_type``, src/types.hpp:183-192).  This work
  is amortized: it happens once per unique geometry per manager lifetime.
* the **feature phase** (convolutions, poolings, ...) consumes the cached
  index arrays as ordinary static-shape pytree leaves, so whole train steps
  jit/pjit cleanly with no host sync inside the step.

Capacities are power-of-two bucketed; all padded rows are tagged with the
max packed key so every downstream op is branch-free.
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
import math as _math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kernel_generator import KernelRegion, region_offsets
from ..types import (
    CUDAKernelMapMode,
    GPUMemoryAllocatorType,
    MinkowskiAlgorithm,
    RegionType,
    as_tuple,
)
from . import keys as K
from .kernel_map import KernelMap, build_kernel_map, build_stride_map
from .lookup import find_coordinates, find_rows
from .map import CoordinateMap, bucket_capacity
from .unique import prefix_mask, unique_coordinates, unique_from_keys

# dense row grids above this cell count fall back to sorted-key lookups
# (64 MB of int32 cells) — bbox'd real scans sit far below this
_MAX_GRID_CELLS = 1 << 24


def set_gpu_allocator(backend) -> None:
    """API-compat no-op (reference: MinkowskiCoordinateManager.py:46-72) —
    XLA owns device memory on TPU."""


def set_memory_manager_backend(backend) -> None:
    """API-compat no-op (alias of set_gpu_allocator)."""


def set_coordinate_map_type(map_type) -> None:
    """API-compat no-op (reference: MinkowskiCoordinateManager.py:75-97) —
    there is a single TPU coordinate-map implementation."""


class UntraceableReplay(RuntimeError):
    """Raised when a traced replay hits an op with no ratcheted floor (so
    its static shape is unknown) — the caller falls back to sync replay."""


class CapacityFloorExceeded(RuntimeError):
    """A deferred-sync replay found more unique rows than the ratcheted
    capacity floor — the caller must replay in sync mode (floors updated)."""


class CoordinateMapKey:
    """Handle identifying a coordinate map inside a manager.

    Mirrors the reference pybind class (reference: pybind/extern.hpp:744-765;
    src/coordinate_map_key.hpp): a key is ``(tensor_stride tuple, string id)``.
    """

    def __init__(self, tensor_stride_or_dim, string_id: str = ""):
        if isinstance(tensor_stride_or_dim, int):
            self._dimension = tensor_stride_or_dim
            self._key: Optional[Tuple[Tuple[int, ...], str]] = None
        else:
            ts = tuple(int(t) for t in tensor_stride_or_dim)
            self._dimension = len(ts)
            self._key = (ts, string_id)

    def is_key_set(self) -> bool:
        return self._key is not None

    def get_key(self) -> Tuple[Tuple[int, ...], str]:
        if self._key is None:
            raise RuntimeError("CoordinateMapKey is not set")
        return self._key

    def set_key(self, tensor_stride, string_id: str = ""):
        self._key = (tuple(int(t) for t in tensor_stride), string_id)

    def get_coordinate_size(self) -> int:
        return self._dimension + 1

    def get_tensor_stride(self) -> Tuple[int, ...]:
        return self.get_key()[0]

    def __eq__(self, other):
        return (
            isinstance(other, CoordinateMapKey)
            and self.is_key_set()
            and other.is_key_set()
            and self.get_key() == other.get_key()
        )

    def __hash__(self):
        return hash(self._key)

    def __repr__(self):
        return f"CoordinateMapKey({self._key})"


@dataclasses.dataclass(frozen=True)
class CoordinateFieldMap:
    """Continuous (float) coordinate store backing ``TensorField``.

    Reference: ``CoordinateFieldMapCPU`` (src/coordinate_map_cpu.hpp:945-1146)
    — a plain row store, no hashing.
    """

    coordinates: jnp.ndarray  # (C, D+1) float32; column 0 = batch index
    size: int
    tensor_stride: Tuple[int, ...]

    @property
    def capacity(self) -> int:
        return int(self.coordinates.shape[0])

    @property
    def dimension(self) -> int:
        return int(self.coordinates.shape[1]) - 1


# --------------------------------------------------------------------------
# Jitted coordinate-phase helpers (module level so compile caches are global).
# --------------------------------------------------------------------------


@jax.jit
def _strided_coords(coords, stride, valid):
    batch = coords[:, :1]
    spatial = jnp.floor_divide(coords[:, 1:], stride) * stride
    out = jnp.concatenate([batch, spatial], axis=1)
    return jnp.where(valid[:, None], out, 0)


@jax.jit
def _origin_coords(coords, valid):
    out = jnp.concatenate([coords[:, :1], jnp.zeros_like(coords[:, 1:])], axis=1)
    return jnp.where(valid[:, None], out, 0)


@functools.partial(jax.jit, static_argnums=(3,))
def _region_candidates(coords, offsets, valid, aligned_only, out_tensor_stride):
    """(K*C, D+1) candidate coords = coords ⊕ offsets, with validity mask.

    Reference: ``stride_region`` (src/coordinate_map_cpu.hpp:446-487) —
    transpose keeps all candidates, non-transpose keeps only rows aligned to
    the output tensor stride.
    """
    Kv = offsets.shape[0]
    C = coords.shape[0]
    cand = coords[None, :, :] + offsets[:, None, :]  # (K, C, D+1)
    v = jnp.broadcast_to(valid[None, :], (Kv, C))
    if aligned_only:
        aligned = jnp.all(
            jnp.remainder(cand[:, :, 1:], out_tensor_stride[None, None, :]) == 0,
            axis=-1,
        )
        v = v & aligned
    return cand.reshape(Kv * C, -1), v.reshape(Kv * C)


@jax.jit
def _compact_rows(coords, lanes, keep, valid):
    """Compact kept rows to the front, preserving (sorted) order.

    Returns compacted (coords, lanes, n_kept, in_to_out map).
    Reference: ``prune`` (src/coordinate_map_cpu.hpp:519-536).
    """
    C = coords.shape[0]
    keep = keep & valid
    new_idx = jnp.cumsum(keep.astype(jnp.int32)) - 1
    n_kept = jnp.sum(keep.astype(jnp.int32))
    tgt = jnp.where(keep, new_idx, C)
    pad = K.key_max(len(lanes))
    out_coords = jnp.zeros_like(coords).at[tgt].set(coords, mode="drop")
    out_lanes = tuple(
        jnp.full((C,), p, jnp.uint32).at[tgt].set(l, mode="drop")
        for l, p in zip(lanes, pad)
    )
    in_to_out = jnp.where(keep, new_idx, -1)
    row = jnp.arange(C, dtype=jnp.int32)
    out_from_in = jnp.full((C,), -1, jnp.int32).at[tgt].set(row, mode="drop")
    return out_coords, out_lanes, n_kept, in_to_out, out_from_in


@jax.jit
def _quantize_field(field_coords, tensor_stride, valid):
    """Float field coords → int voxel coords at ``tensor_stride``.

    Reference: ``quantize_coordinates`` (src/coordinate_map_cpu.hpp:994-1039)
    — floor(coord / stride) * stride.
    """
    batch = field_coords[:, :1].astype(jnp.int32)
    spatial = (
        jnp.floor(field_coords[:, 1:] / tensor_stride.astype(field_coords.dtype))
        .astype(jnp.int32)
        * tensor_stride
    )
    out = jnp.concatenate([batch, spatial], axis=1)
    return jnp.where(valid[:, None], out, 0)


def _pad_rows(array: jnp.ndarray, capacity: int, fill=0) -> jnp.ndarray:
    n = array.shape[0]
    if n == capacity:
        return array
    if n > capacity:
        return array[:capacity]
    pad_shape = (capacity - n,) + tuple(array.shape[1:])
    return jnp.concatenate([array, jnp.full(pad_shape, fill, array.dtype)])


class CoordinateManager:
    """Session object caching coordinate maps and kernel maps.

    Constructor signature mirrors the reference wrapper
    (MinkowskiEngine/MinkowskiCoordinateManager.py:107-160); the CUDA-specific
    arguments are accepted and ignored (XLA owns memory on TPU).
    """

    def __init__(
        self,
        D: int = 0,
        num_threads: int = -1,
        coordinate_map_type=None,
        allocator_type: Optional[GPUMemoryAllocatorType] = None,
        minkowski_algorithm: Optional[MinkowskiAlgorithm] = None,
    ):
        if D < 1:
            raise ValueError(f"Invalid dimension {D}")
        self.D = int(D)
        self.coordinate_map_type = coordinate_map_type
        self.allocator_type = allocator_type
        self.minkowski_algorithm = (
            minkowski_algorithm
            if minkowski_algorithm is not None
            else MinkowskiAlgorithm.DEFAULT
        )
        self._maps: Dict[Tuple[Tuple[int, ...], str], CoordinateMap] = {}
        self._field_maps: Dict[Tuple[Tuple[int, ...], str], CoordinateFieldMap] = {}
        # kernel_map_key_type mirror (src/types.hpp:183-192)
        self._kernel_maps: Dict[tuple, KernelMap] = {}
        self._stride_maps: Dict[tuple, jnp.ndarray] = {}
        self._origin_keys: Dict[Tuple[Tuple[int, ...], str], CoordinateMapKey] = {}
        self._field_to_sparse: Dict[tuple, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        self._interp_cache: Dict[tuple, tuple] = {}
        self._id_counter = itertools.count()
        # coordinate-op recording (geometry replay for fresh-geometry
        # training); frozen view managers (from_geometry) can't build.
        self._oplog: List[tuple] = []
        self._frozen = False
        self._entry_key: Optional[CoordinateMapKey] = None
        # shape-stability ratchets (largest capacity / slab rung seen for a
        # logical map across geometry replays — see GeometryReplayer).
        # _slab_floors values: ((fwd_S, fwd_E, fwd_P), (bwd_S, bwd_E, bwd_P))
        # rungs (slab size, union extra, outlier-list capacity)
        # (slab size, union-extra; U derives from S+E — conv_kernel.py).
        self._cap_floors: Dict[tuple, int] = {}
        self._slab_floors: Dict[tuple, tuple] = {}
        self._grid_floors: Dict[tuple, tuple] = {}
        self._join_floors: Dict[tuple, int] = {}  # sorted-join slab rungs
        # (unique_map, inverse_map, n_in, n_unique) per inserted map key
        self._insert_results: Dict[tuple, tuple] = {}
        # deferred-sync replay state (see _finalize_deferred)
        self._deferred: Optional[dict] = None
        # span over-provision margin: >1 during floor-violation recovery so
        # ratchets overshoot the measured need and converge in one step
        # instead of creeping up one ladder rung per violating cloud
        self._span_margin: float = 1.0

    def _record(self, *entry) -> None:
        if not self._frozen:
            self._oplog.append(entry)

    def _check_not_frozen(self, what: str) -> None:
        if self._frozen:
            raise RuntimeError(
                f"cannot build {what}: this manager is a frozen Geometry "
                "view — the op was not in the recorded coordinate phase "
                "(re-run the eager warm forward to record it)"
            )

    def oplog(self) -> List[tuple]:
        """The recorded coordinate-op recipe (see coords/geometry.py)."""
        return list(self._oplog)

    # ------------------------------------------------------------------
    # map bookkeeping
    # ------------------------------------------------------------------
    def _unique_string_id(
        self, tensor_stride: Tuple[int, ...], string_id: str, field: bool = False
    ) -> str:
        """First free string id.  Field maps and coordinate maps have
        SEPARATE key spaces (the reference holds them in distinct
        containers, src/coordinate_map_manager.hpp — a field map and the
        sparse map it quantizes to share (stride, ''))."""
        taken = self._field_maps if field else self._maps
        sid = string_id
        while (tensor_stride, sid) in taken:
            sid = f"{string_id or 'map'}-{next(self._id_counter)}"
        return sid

    def _get_map(self, key: CoordinateMapKey) -> CoordinateMap:
        k = key.get_key()
        if k not in self._maps:
            raise KeyError(f"Coordinate map {k} not found in manager")
        return self._maps[k]

    def _get_field_map(self, key: CoordinateMapKey) -> CoordinateFieldMap:
        k = key.get_key()
        if k not in self._field_maps:
            raise KeyError(f"Coordinate field map {k} not found in manager")
        return self._field_maps[k]

    def exists(self, key: CoordinateMapKey) -> bool:
        return key.is_key_set() and key.get_key() in self._maps

    def size(self, key: CoordinateMapKey) -> int:
        return self._get_map(key).size

    def size_array(self, key: CoordinateMapKey):
        """Valid-row count as a traceable int32 scalar (pytree leaf)."""
        return self._get_map(key).size_arr

    def capacity(self, key: CoordinateMapKey) -> int:
        return self._get_map(key).capacity

    def get_coordinate_map(self, key: CoordinateMapKey) -> CoordinateMap:
        return self._get_map(key)

    def get_coordinates(self, key: CoordinateMapKey) -> jnp.ndarray:
        """Valid coordinate rows (device array, exact size)."""
        m = self._get_map(key)
        return m.coordinates[: m.size]

    def get_coordinate_field(self, key: CoordinateMapKey) -> jnp.ndarray:
        m = self._get_field_map(key)
        return m.coordinates[: m.size]

    def get_keys(self) -> List[Tuple[Tuple[int, ...], str]]:
        return list(self._maps.keys())

    def __repr__(self):
        lines = [f"CoordinateManager(D={self.D})"]
        for k, m in self._maps.items():
            lines.append(f"  map {k}: size={m.size} cap={m.capacity}")
        lines.append(f"  kernel maps: {len(self._kernel_maps)}")
        return "\n".join(lines)

    # ------------------------------------------------------------------
    # insertion
    # ------------------------------------------------------------------
    def _register_unique(
        self,
        coords: jnp.ndarray,
        valid: jnp.ndarray,
        tensor_stride: Tuple[int, ...],
        string_id: str,
    ) -> Tuple[CoordinateMapKey, "jnp.ndarray", "jnp.ndarray", int]:
        """Unique `coords[valid]` into a new registered map.

        Returns (key, padded unique_map, padded inverse_map, n_unique).
        """
        self._check_not_frozen("a coordinate map")
        res, u_coords, overflow, bbox = unique_coordinates(coords, valid)
        sid = self._unique_string_id(tensor_stride, string_id)
        floor_key = (tensor_stride, sid)

        if self._deferred is not None and floor_key in self._cap_floors:
            # Deferred-sync path: trust the ratcheted capacity floor, keep
            # the count on device, and let _finalize_deferred do ONE host
            # round trip for the whole coordinate phase.  If the floor
            # turns out too small (valid rows would be truncated), finalize
            # raises CapacityFloorExceeded and the caller replays in sync
            # mode (ratcheting the floor).
            cap = self._cap_floors[floor_key]
            cmap = CoordinateMap.from_sorted(
                u_coords, res.sorted_lanes, 0,
                tensor_stride, capacity=cap,
            ).with_size_arr(res.n_unique)
            key = CoordinateMapKey(tensor_stride, sid)
            self._maps[key.get_key()] = cmap
            self._deferred["sizes"].append(
                (key.get_key(), floor_key, res.n_unique, overflow)
            )
            self._deferred["bboxes"].append((key.get_key(), bbox))
            return key, res.unique_map, res.inverse_map, None

        if self._deferred is not None and self._deferred.get("traced"):
            raise UntraceableReplay(
                f"no capacity floor for map {floor_key}; warm the replayer "
                "with a sync pass first"
            )

        # one host sync for everything (each isolated sync costs ~30 ms
        # through the TPU tunnel once pallas kernels have run); the bbox
        # is stashed for dense_plan so it never needs its own sync
        n_unique, overflow, bbox_h = jax.device_get(
            (res.n_unique, overflow, bbox)
        )
        n_unique = int(n_unique)
        if bool(overflow):
            raise ValueError(
                "Coordinate out of packed-key range for dimension "
                f"{self.D}; see coords/keys.py field_ranges"
            )
        cap = max(
            bucket_capacity(n_unique), self._cap_floors.get(floor_key, 0)
        )
        self._cap_floors[floor_key] = cap
        cmap = CoordinateMap.from_sorted(
            u_coords,
            res.sorted_lanes,
            n_unique,
            tensor_stride,
            capacity=cap,
        )
        key = CoordinateMapKey(tensor_stride, sid)
        self._maps[key.get_key()] = cmap
        self._interp_cache[("bbox", key.get_key())] = bbox_h
        return key, res.unique_map, res.inverse_map, n_unique

    def insert_and_map_padded(
        self,
        coordinates,
        tensor_stride=1,
        string_id: str = "",
        n_valid=None,
    ):
        """Like insert_and_map but returns padded maps + counts.

        Returns (key, unique_map (C_in,), inverse_map (C_in,), n_in, n_unique)
        where invalid unique_map slots hold C_in (gathers a zero row) and
        invalid inverse slots hold -1.  Used by SparseTensor construction so
        feature reduction stays fully padded/traceable.

        ``n_valid``: optional (possibly traced) scalar count of valid
        leading rows when ``coordinates`` is already padded to a static
        bucket — the traced-replay calling convention.
        """
        ts = as_tuple(tensor_stride, self.D)
        coords = jnp.asarray(coordinates, dtype=jnp.int32)
        if coords.ndim != 2 or coords.shape[1] != self.D + 1:
            raise ValueError(
                f"coordinates must be (N, {self.D + 1}), got {coords.shape}"
            )
        n = int(coords.shape[0])
        cap = bucket_capacity(n)
        coords = _pad_rows(coords, cap)
        if n_valid is not None:
            valid = jnp.arange(cap, dtype=jnp.int32) < jnp.asarray(
                n_valid, jnp.int32
            )
        else:
            valid = prefix_mask(cap, n)
        key, unique_map, inverse_map, n_unique = self._register_unique(
            coords, valid, ts, string_id
        )
        self._record("insert", ts, string_id, key.get_key())
        if self._entry_key is None:
            self._entry_key = key
        self._insert_results[key.get_key()] = (
            unique_map, inverse_map, n, n_unique,
        )
        return key, unique_map, inverse_map, n, n_unique

    def insert_and_map(
        self,
        coordinates,
        tensor_stride=1,
        string_id: str = "",
    ) -> Tuple[CoordinateMapKey, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Insert coordinates, returning (key, (unique_map, inverse_map)).

        Reference: CoordinateMapManager::insert_and_map
        (src/coordinate_map_manager.cpp:349-399).  ``unique_map`` and
        ``inverse_map`` are exact-size device arrays satisfying
        ``coords[unique_map][inverse_map] == coords``.
        """
        key, unique_map, inverse_map, n, n_unique = self.insert_and_map_padded(
            coordinates, tensor_stride, string_id
        )
        return key, (unique_map[:n_unique], inverse_map[:n])

    def insert_field(
        self, coordinates, tensor_stride=1, string_id: str = ""
    ) -> CoordinateMapKey:
        """Insert continuous coordinates (TensorField backing store).

        Reference: insert_field (src/coordinate_map_manager.cpp:139-186).
        """
        ts = as_tuple(tensor_stride, self.D)
        coords = jnp.asarray(coordinates, dtype=jnp.float32)
        if coords.ndim != 2 or coords.shape[1] != self.D + 1:
            raise ValueError(
                f"coordinates must be (N, {self.D + 1}), got {coords.shape}"
            )
        n = int(coords.shape[0])
        cap = bucket_capacity(n)
        coords = _pad_rows(coords, cap)
        sid = self._unique_string_id(ts, string_id, field=True)
        key = CoordinateMapKey(ts, sid)
        self._field_maps[key.get_key()] = CoordinateFieldMap(coords, n, ts)
        return key

    # ------------------------------------------------------------------
    # derived maps
    # ------------------------------------------------------------------
    def stride(
        self, key: CoordinateMapKey, stride, string_id: str = ""
    ) -> CoordinateMapKey:
        """Strided (downsampled) coordinate map.

        Reference: manager stride (src/coordinate_map_manager.cpp:402-429);
        coordinates are floor-divided then re-multiplied
        (src/coordinate_map.hpp:58-76).
        """
        in_map = self._get_map(key)
        s = as_tuple(stride, self.D)
        if all(x == 1 for x in s):
            return key  # striding by 1 is the identity map
        out_ts = tuple(t * st for t, st in zip(in_map.tensor_stride, s))
        # derived maps inherit the input's lineage id, so parallel coordinate
        # sets in one manager (e.g. a TensorField's quantized map named
        # 'map-0') keep consistent keys down and back up the network
        sid = string_id or key.get_key()[1]
        existing = (out_ts, sid)
        if existing in self._maps:
            return CoordinateMapKey(out_ts, sid)
        strided = _strided_coords(
            in_map.coordinates,
            jnp.asarray(np.asarray(out_ts, np.int32)),
            in_map.valid_mask(),
        )
        new_key, _, _, _ = self._register_unique(
            strided, in_map.valid_mask(), out_ts, sid
        )
        self._record("stride", key.get_key(), s, string_id)
        return new_key

    def stride_region(
        self,
        key: CoordinateMapKey,
        region: KernelRegion,
        out_tensor_stride,
        expand_coordinates: bool,
        is_transpose: bool,
        string_id: str = "",
    ) -> CoordinateMapKey:
        """Region-expanded coordinate map (generative/expand paths).

        Reference: stride_region (src/coordinate_map_cpu.hpp:446-487,
        src/coordinate_map_manager.cpp:431-466).  Candidates are
        ``coords ⊕ offsets``; non-transpose keeps only candidates aligned to
        the output tensor stride.  When a map already exists at the output
        tensor stride and ``expand_coordinates`` is False, that map is reused
        — this is how transposed convolutions in a UNet land back on the
        encoder's coordinates.
        """
        out_ts = as_tuple(out_tensor_stride, self.D)
        sid = string_id or key.get_key()[1]  # inherit lineage (see stride())
        existing = (out_ts, sid)
        if existing in self._maps and not expand_coordinates:
            return CoordinateMapKey(out_ts, sid)
        in_map = self._get_map(key)
        offsets = np.concatenate(
            [np.zeros((region.volume, 1), np.int32), region.offsets], axis=1
        )
        cand, valid = _region_candidates(
            in_map.coordinates,
            jnp.asarray(offsets),
            in_map.valid_mask(),
            not is_transpose,
            jnp.asarray(np.asarray(out_ts, np.int32)),
        )
        new_key, _, _, _ = self._register_unique(cand, valid, out_ts, sid)
        self._record(
            "stride_region",
            key.get_key(),
            int(region.region_type),
            region.offsets.tobytes(),
            region.offsets.shape,
            out_ts,
            bool(expand_coordinates),
            bool(is_transpose),
            string_id,
        )
        return new_key

    def origin(self, key: CoordinateMapKey) -> CoordinateMapKey:
        """Map of per-batch origin coordinates (b, 0, ..., 0).

        Reference: origin (src/coordinate_map_cpu.hpp:492-513,
        src/coordinate_map_manager.cpp:468-508).
        """
        k = key.get_key()
        if k in self._origin_keys:
            return self._origin_keys[k]
        in_map = self._get_map(key)
        ocoords = _origin_coords(in_map.coordinates, in_map.valid_mask())
        origin_ts = (1,) * self.D
        new_key, _, _, _ = self._register_unique(
            ocoords, in_map.valid_mask(), origin_ts, f"origin-{k[1]}"
        )
        self._origin_keys[k] = new_key
        self._record("origin", k)
        return new_key

    def origin_field(self, key: CoordinateMapKey) -> CoordinateMapKey:
        """Origin map for a field map (batch indices from float coords)."""
        k = key.get_key()
        cache_k = (k, "field-origin")
        if cache_k in self._origin_keys:
            return self._origin_keys[cache_k]
        fmap = self._get_field_map(key)
        coords = jnp.concatenate(
            [
                fmap.coordinates[:, :1].astype(jnp.int32),
                jnp.zeros((fmap.capacity, self.D), jnp.int32),
            ],
            axis=1,
        )
        valid = prefix_mask(fmap.capacity, fmap.size)
        new_key, _, _, _ = self._register_unique(
            coords, valid, (1,) * self.D, f"origin-field-{k[1]}"
        )
        self._origin_keys[cache_k] = new_key
        return new_key

    def prune(
        self, key: CoordinateMapKey, keep: jnp.ndarray
    ) -> Tuple[CoordinateMapKey, jnp.ndarray]:
        """Pruned map from a boolean keep mask over valid rows.

        Returns (new_key, in_to_out, out_from_in):
          in_to_out: (C_in,) int32 — new row per old row, -1 if dropped;
          out_from_in: (C_in-capacity,) int32 — old row per new row (gather
            map for the feature copy; only the first n_kept entries valid).
        Reference: prune (src/coordinate_map_manager.cpp:552-576).
        """
        in_map = self._get_map(key)
        keep = jnp.asarray(keep, bool)
        keep = _pad_rows(keep, in_map.capacity, fill=False)
        coords, lanes, n_kept, in_to_out, out_from_in = _compact_rows(
            in_map.coordinates, in_map.key_lanes, keep, in_map.valid_mask()
        )
        cmap = CoordinateMap.from_sorted(
            coords, lanes, int(n_kept), in_map.tensor_stride
        )
        out_from_in = out_from_in[: cmap.capacity]
        sid = self._unique_string_id(in_map.tensor_stride, "pruned")
        new_key = CoordinateMapKey(in_map.tensor_stride, sid)
        self._maps[new_key.get_key()] = cmap
        return new_key, in_to_out, out_from_in

    def merge(self, keys: Sequence[CoordinateMapKey]) -> CoordinateMapKey:
        """Union of several maps' coordinates (same tensor stride).

        Reference: merge (src/coordinate_map_cpu.hpp:538-564,
        src/coordinate_map_manager.cpp:1244-1269).
        """
        maps = [self._get_map(k) for k in keys]
        ts = maps[0].tensor_stride
        for m in maps:
            if m.tensor_stride != ts:
                raise ValueError("merge requires identical tensor strides")
        coords = jnp.concatenate([m.coordinates for m in maps], axis=0)
        valid = jnp.concatenate([m.valid_mask() for m in maps], axis=0)
        new_key, _, _, _ = self._register_unique(coords, valid, ts, "merged")
        self._record("merge", tuple(k.get_key() for k in keys))
        return new_key

    def union_map(
        self, in_keys: Sequence[CoordinateMapKey], out_key: CoordinateMapKey
    ) -> List[jnp.ndarray]:
        """Per-input row maps into the union map.

        Each returned array is (C_i,) int32: the union row for every input
        row (-1 padding).  Reference: union_map
        (src/coordinate_map_cpu.hpp:842-873, manager.cpp:1271-1317).
        """
        result = []
        for k in in_keys:
            im = self._get_map(k)
            result.append(
                self._find_rows_in(out_key, im.coordinates, im.size_arr)
            )
        return result

    # ------------------------------------------------------------------
    # kernel maps
    # ------------------------------------------------------------------
    def _kernel_map_cache_key(
        self, in_key, out_key, stride, kernel_size, dilation,
        region_type, region_offsets, is_transpose, is_pool,
    ):
        s = as_tuple(stride, self.D)
        ks = as_tuple(kernel_size, self.D)
        dil = as_tuple(dilation, self.D)
        off_key = (
            None
            if region_offsets is None or np.size(region_offsets) == 0
            else np.asarray(region_offsets, np.int32).tobytes()
        )
        return (
            in_key.get_key(),
            out_key.get_key(),
            ks,
            s,
            dil,
            int(region_type),
            bool(is_transpose),
            bool(is_pool),
            off_key,
        )

    def has_kernel_map(
        self,
        in_key: CoordinateMapKey,
        out_key: CoordinateMapKey,
        stride=1,
        kernel_size=3,
        dilation=1,
        region_type: RegionType = RegionType.HYPER_CUBE,
        region_offsets: Optional[np.ndarray] = None,
        is_transpose: bool = False,
        is_pool: bool = False,
    ) -> bool:
        """Whether the kernel map is already cached (no build needed).

        Used by the conv dispatcher's cost model: on fresh geometry an
        uncached map costs far more to build than either conv strategy
        costs to run.
        """
        ck = self._kernel_map_cache_key(
            in_key, out_key, stride, kernel_size, dilation,
            region_type, region_offsets, is_transpose, is_pool,
        )
        return ck in self._kernel_maps

    def peek_kernel_map(
        self,
        in_key: CoordinateMapKey,
        out_key: CoordinateMapKey,
        stride=1,
        kernel_size=3,
        dilation=1,
        region_type: RegionType = RegionType.HYPER_CUBE,
        region_offsets: Optional[np.ndarray] = None,
        is_transpose: bool = False,
        is_pool: bool = False,
    ) -> Optional[KernelMap]:
        """The cached kernel map if present, else None (never builds)."""
        ck = self._kernel_map_cache_key(
            in_key, out_key, stride, kernel_size, dilation,
            region_type, region_offsets, is_transpose, is_pool,
        )
        return self._kernel_maps.get(ck)

    def kernel_map(
        self,
        in_key: CoordinateMapKey,
        out_key: CoordinateMapKey,
        stride=1,
        kernel_size=3,
        dilation=1,
        region_type: RegionType = RegionType.HYPER_CUBE,
        region_offsets: Optional[np.ndarray] = None,
        is_transpose: bool = False,
        is_pool: bool = False,
    ) -> KernelMap:
        """Fetch-or-build the dense kernel map between two maps.

        Cache key and dispatch mirror the reference manager
        (src/coordinate_map_manager.cpp:664-823): transpose requests reuse the
        swapped forward map when cached; pooling with stride == kernel_size
        uses the stride-map fast path.
        """
        s = as_tuple(stride, self.D)
        ks = as_tuple(kernel_size, self.D)
        dil = as_tuple(dilation, self.D)
        off_key = (
            None
            if region_offsets is None or np.size(region_offsets) == 0
            else np.asarray(region_offsets, np.int32).tobytes()
        )
        cache_key = self._kernel_map_cache_key(
            in_key, out_key, stride, kernel_size, dilation,
            region_type, region_offsets, is_transpose, is_pool,
        )
        if cache_key in self._kernel_maps:
            return self._kernel_maps[cache_key]
        self._check_not_frozen("a kernel map")

        in_map = self._get_map(in_key)
        out_map = self._get_map(out_key)

        if not is_transpose:
            if is_pool and s == ks and off_key is None:
                in_to_out = self._stride_map_array(in_key, out_key)
                kmap = _stride_map_to_kernel_map(
                    in_to_out, in_map, out_map
                )
            else:
                offs = region_offsets_for(
                    region_type, ks, dil, in_map.tensor_stride, region_offsets
                )
                pg = self._probe_grid_for(in_key)
                pg_out = self._probe_grid_for(out_key)
                if self._deferred is not None:
                    if pg is not None:
                        kmap, fs, bs = build_kernel_map(
                            in_map, out_map, offs, defer_slabs=True,
                            probe=pg, probe_out=pg_out,
                        )
                    else:
                        js = self._join_args(cache_key)
                        kmap, fs, bs = build_kernel_map(
                            in_map, out_map, offs, defer_slabs=True,
                            probe_out=pg_out, **js,
                        )
                        self._join_done(cache_key, js)
                    if self._deferred.get("traced"):
                        kmap = self._attach_floored_slabs(kmap, cache_key)
                    self._deferred["slabs"].append((cache_key, fs, bs))
                else:
                    js = {} if pg is not None else self._join_args(cache_key)
                    kmap = build_kernel_map(
                        in_map, out_map, offs,
                        slab_floor=self._slab_floors.get(cache_key),
                        span_margin=self._span_margin,
                        probe=pg,
                        probe_out=pg_out,
                        **js,
                    )
                    if pg is None:
                        self._join_done(cache_key, js)
        else:
            swapped_key = (
                out_key.get_key(),
                in_key.get_key(),
                ks,
                s,
                dil,
                int(region_type),
                False,
                bool(is_pool),
                off_key,
            )
            if swapped_key in self._kernel_maps:
                kmap = self._kernel_maps[swapped_key].swap()
            elif is_pool and s == ks and off_key is None:
                out_to_in = self._stride_map_array(out_key, in_key)
                kmap = _stride_map_to_kernel_map(
                    out_to_in, out_map, in_map
                ).swap()
            else:
                # Build out→in with offsets in the *output* (finer) stride
                # units, then swap (src/coordinate_map_manager.cpp:759-813).
                offs = region_offsets_for(
                    region_type, ks, dil, out_map.tensor_stride, region_offsets
                )
                pg = self._probe_grid_for(out_key)  # the probed (first) map
                pg_out = self._probe_grid_for(in_key)
                if self._deferred is not None:
                    if pg is not None:
                        built, fs, bs = build_kernel_map(
                            out_map, in_map, offs, defer_slabs=True,
                            probe=pg, probe_out=pg_out,
                        )
                    else:
                        js = self._join_args(cache_key)
                        built, fs, bs = build_kernel_map(
                            out_map, in_map, offs, defer_slabs=True,
                            probe_out=pg_out, **js,
                        )
                        self._join_done(cache_key, js)
                    kmap = built.swap()
                    if self._deferred.get("traced"):
                        kmap = self._attach_floored_slabs(kmap, cache_key)
                    # cached orientation: fwd spans = built bwd, and v.v.
                    self._deferred["slabs"].append((cache_key, bs, fs))
                else:
                    floor = self._slab_floors.get(cache_key)
                    js = {} if pg is not None else self._join_args(cache_key)
                    kmap = build_kernel_map(
                        out_map, in_map, offs,
                        slab_floor=(
                            None if floor is None else (floor[1], floor[0])
                        ),
                        span_margin=self._span_margin,
                        probe=pg, probe_out=pg_out, **js,
                    ).swap()
                    if pg is None:
                        self._join_done(cache_key, js)

        self._kernel_maps[cache_key] = kmap
        if self._deferred is not None and self._deferred.get("traced"):
            pass  # slabs already at the floored rung; don't re-ratchet
        elif kmap.fwd_slab is not None and kmap.bwd_slab is not None:
            from ..ops.pallas.conv_kernel import merge_slab_floor

            prev = self._slab_floors.get(cache_key)
            self._slab_floors[cache_key] = (
                merge_slab_floor(
                    None if prev is None else prev[0],
                    (
                        kmap.fwd_slab.slab_size,
                        kmap.fwd_slab.extra_rung,
                        kmap.fwd_slab.ov_cap,
                        kmap.fwd_slab.sub_size or kmap.fwd_slab.slab_size,
                    ),
                ),
                merge_slab_floor(
                    None if prev is None else prev[1],
                    (
                        kmap.bwd_slab.slab_size,
                        kmap.bwd_slab.extra_rung,
                        kmap.bwd_slab.ov_cap,
                        kmap.bwd_slab.sub_size or kmap.bwd_slab.slab_size,
                    ),
                ),
            )
        self._record(
            "kernel_map",
            in_key.get_key(),
            out_key.get_key(),
            s,
            ks,
            dil,
            int(region_type),
            None if off_key is None else (off_key, np.asarray(region_offsets, np.int32).shape),
            bool(is_transpose),
            bool(is_pool),
        )
        return kmap

    def _stride_map_array(
        self, in_key: CoordinateMapKey, out_key: CoordinateMapKey
    ) -> jnp.ndarray:
        """(C_in,) int32 out-row per in-row, cached."""
        ck = (in_key.get_key(), out_key.get_key())
        if ck not in self._stride_maps:
            self._check_not_frozen("a stride map")
            in_map = self._get_map(in_key)
            out_map = self._get_map(out_key)
            self._stride_maps[ck] = build_stride_map(
                in_map, out_map, out_map.tensor_stride,
                probe=self._probe_grid_for(out_key),
            )
            self._record("stride_map", in_key.get_key(), out_key.get_key())
        return self._stride_maps[ck]

    def stride_map(
        self, in_key: CoordinateMapKey, out_key: CoordinateMapKey
    ) -> jnp.ndarray:
        """Public stride map: (C_in,) int32 output row per input row."""
        return self._stride_map_array(in_key, out_key)

    def kernel_map_dict(
        self,
        in_key: CoordinateMapKey,
        out_key: CoordinateMapKey,
        stride=1,
        kernel_size=3,
        dilation=1,
        region_type: RegionType = RegionType.HYPER_CUBE,
        region_offsets: Optional[np.ndarray] = None,
        is_transpose: bool = False,
        is_pool: bool = False,
    ):
        """Reference-format kernel map: {offset: (in_rows, out_rows)} host
        dict (reference ``kernel_map_th``, coordinate_map_manager.cpp:1358).

        Always keyed by kernel offsets: pooling requests are resolved as
        genuine per-offset maps rather than through the internal stride-map
        fast path, whose rows are collision slots, not offsets (the
        per-offset map shares the conv cache entry for the same geometry).
        """
        return self.kernel_map(
            in_key,
            out_key,
            stride,
            kernel_size,
            dilation,
            region_type,
            region_offsets,
            is_transpose,
            is_pool=False,
        ).to_pair_lists()

    def origin_map(
        self, key: CoordinateMapKey
    ) -> Tuple[CoordinateMapKey, jnp.ndarray]:
        """(origin_key, (C_in,) int32 origin-row per input row).

        The origin row of a coordinate is the rank of its batch index — the
        segment id used by global pooling / broadcast.  Reference: origin_map
        (src/coordinate_map_cpu.hpp:724-783, manager.cpp:827-913).
        """
        origin_key = self.origin(key)
        ck = (key.get_key(), origin_key.get_key())
        if ck not in self._stride_maps:
            self._check_not_frozen("an origin map")
            in_map = self._get_map(key)
            origin = self._get_map(origin_key)
            ocoords = _origin_coords(in_map.coordinates, in_map.valid_mask())
            rows = self._find_rows_in(origin_key, ocoords, in_map.size_arr)
            self._stride_maps[ck] = rows
            self._record("origin_map", key.get_key())
        return origin_key, self._stride_maps[ck]

    def origin_field_map(
        self, key: CoordinateMapKey
    ) -> Tuple[CoordinateMapKey, jnp.ndarray]:
        """``origin_map`` for a FIELD map: (origin_key, (capacity,) int32
        origin-row per field row, -1 padding).

        Lets global pooling / broadcast consume ``TensorField`` inputs
        directly, as the reference does (reference:
        MinkowskiPooling.py:729-737, src/global_pooling_cpu.cpp:72-85,
        origin_field: src/coordinate_map_manager.cpp:510-550).
        """
        origin_key = self.origin_field(key)
        ck = (key.get_key(), "field", origin_key.get_key())
        if ck not in self._stride_maps:
            self._check_not_frozen("an origin field map")
            fmap = self._get_field_map(key)
            valid = prefix_mask(fmap.capacity, fmap.size)
            ocoords = _origin_coords(
                fmap.coordinates.astype(jnp.int32), valid
            )
            # field ops are not replayable (the oplog is sparse-only), so
            # nothing is recorded here — matching insert_field/origin_field
            rows = self._find_rows_in(
                origin_key, ocoords, jnp.int32(fmap.size)
            )
            self._stride_maps[ck] = rows
        return origin_key, self._stride_maps[ck]

    def number_of_unique_batch_indices(self, key: CoordinateMapKey) -> int:
        return self._get_map(self.origin(key)).size

    # ------------------------------------------------------------------
    # field → sparse
    # ------------------------------------------------------------------
    def field_to_sparse_insert_and_map(
        self,
        field_key: CoordinateMapKey,
        sparse_tensor_stride,
        sparse_string_id: str = "",
    ) -> Tuple[CoordinateMapKey, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Quantize a field map into a sparse map.

        Returns (sparse_key, (unique_map, inverse_map)) — exact-size arrays.
        Reference: field_to_sparse_insert_and_map
        (src/coordinate_map_manager.cpp:193-266).
        """
        fmap = self._get_field_map(field_key)
        ts = as_tuple(sparse_tensor_stride, self.D)
        valid = prefix_mask(fmap.capacity, fmap.size)
        qcoords = _quantize_field(
            fmap.coordinates, jnp.asarray(np.asarray(ts, np.int32)), valid
        )
        sparse_key, unique_map, inverse_map, n_unique = self._register_unique(
            qcoords, valid, ts, sparse_string_id
        )
        self._field_to_sparse[(field_key.get_key(), sparse_key.get_key())] = (
            unique_map,
            inverse_map,
        )
        return sparse_key, (unique_map[:n_unique], inverse_map[: fmap.size])

    def exists_field_to_sparse(
        self, field_key: CoordinateMapKey, sparse_key: CoordinateMapKey
    ) -> bool:
        return (
            field_key.get_key(),
            sparse_key.get_key(),
        ) in self._field_to_sparse

    def field_to_sparse_map(
        self, field_key: CoordinateMapKey, sparse_key: CoordinateMapKey
    ) -> jnp.ndarray:
        """(C_field,) int32 sparse row per field row (padded, -1 invalid)."""
        ck = (field_key.get_key(), sparse_key.get_key())
        if ck in self._field_to_sparse:
            return self._field_to_sparse[ck][1]
        fmap = self._get_field_map(field_key)
        smap = self._get_map(sparse_key)
        valid = prefix_mask(fmap.capacity, fmap.size)
        qcoords = _quantize_field(
            fmap.coordinates,
            jnp.asarray(np.asarray(smap.tensor_stride, np.int32)),
            valid,
        )
        rows = self._find_rows_in(
            sparse_key, qcoords, jnp.int32(fmap.size)
        )
        self._field_to_sparse[ck] = (None, rows)
        return rows

    # ------------------------------------------------------------------
    # interpolation
    # ------------------------------------------------------------------
    def interpolation_map_weight(
        self, key: CoordinateMapKey, samples: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Multilinear neighbor rows + weights for float sample coordinates.

        Args:
          samples: (N, D+1) float32 — batch index + continuous coordinates.
        Returns:
          (rows (N, 2^D) int32 with -1 for missing neighbors,
           weights (N, 2^D) float32, zero where missing).

        Reference: interpolation_map_weight
        (src/coordinate_map_cpu.hpp:138-273, manager.cpp:1072-1085).
        """
        cmap = self._get_map(key)
        samples = jnp.asarray(samples, jnp.float32)
        n = int(samples.shape[0])
        cap = bucket_capacity(n)
        samples = _pad_rows(samples, cap)
        corners = np.stack(
            [
                np.array(bits, np.int32)
                for bits in itertools.product((0, 1), repeat=self.D)
            ]
        )  # (2^D, D)
        pg = self._probe_grid_for(key)
        if pg is not None:
            rows, weights = _interpolation_map_grid(
                pg[0], pg[1], pg[2], pg[3],
                samples,
                jnp.int32(n),
                jnp.asarray(corners),
            )
        else:
            rows, weights = _interpolation_map(
                cmap.key_lanes,
                jnp.int32(cmap.size),
                samples,
                jnp.int32(n),
                jnp.asarray(np.asarray(cmap.tensor_stride, np.int32)),
                jnp.asarray(corners),
            )
        return rows[:n], weights[:n]

    def dense_plan(self, key: CoordinateMapKey):
        """Cached dense-bbox scatter/gather plan for a map (stride-1 dense
        conv dispatch, ops/dense_conv.py).  None if the map is empty."""
        ck = ("dense_plan", key.get_key())
        if ck not in self._interp_cache:
            self._check_not_frozen("a dense plan")
            if self._deferred is not None:
                floor = self._grid_floors.get(key.get_key())
                if floor is None and self._deferred.get("traced"):
                    raise UntraceableReplay(
                        f"no dense-grid floor for map {key.get_key()}"
                    )
                bbox_dev = next(
                    (b for kt, b in self._deferred["bboxes"]
                     if kt == key.get_key()),
                    None,
                )
                if bbox_dev is None and self._deferred.get("traced"):
                    raise UntraceableReplay(
                        f"no deferred bbox for map {key.get_key()}"
                    )
                if floor is not None and bbox_dev is not None:
                    # floored shape is static: build the plan in-line (both
                    # traced and deferred modes), queueing a validity check
                    from ..ops.dense_conv import build_dense_plan_traced

                    plan, ok = build_dense_plan_traced(
                        self._get_map(key), bbox_dev, floor
                    )
                    if self._deferred.get("traced"):
                        self._deferred["checks"].append(ok)
                    else:
                        self._deferred["grid_checks"].append(
                            (key.get_key(), ok)
                        )
                    self._interp_cache[ck] = plan
                    self._record("dense_plan", key.get_key())
                    return plan
                if key.get_key() not in self._deferred["plans"]:
                    self._deferred["plans"].append(key.get_key())
                self._record("dense_plan", key.get_key())
                return None  # materialized in _finalize_deferred
            from ..ops.dense_conv import build_dense_plan

            bbox = self._interp_cache.get(("bbox", key.get_key()))
            self._interp_cache[ck] = build_dense_plan(
                self._get_map(key),
                bbox=bbox,
                extent_floor=self._grid_floors.get(key.get_key()),
                margin=self._span_margin,
            )
            plan = self._interp_cache[ck]
            if plan is not None:
                self._grid_floors[key.get_key()] = plan.grid_shape
            self._record("dense_plan", key.get_key())
        return self._interp_cache[ck]

    def _find_rows_in(self, key: CoordinateMapKey, coords, n_valid):
        """Rows of integer query ``coords`` in a map: grid gather when the
        map has a row grid, else binary search over sorted keys."""
        pg = self._probe_grid_for(key)
        if pg is not None:
            from .kernel_map import grid_lookup

            row_grid, mins, grid_shape, ts = pg
            rows = grid_lookup(row_grid, mins, grid_shape, ts, coords)
            valid = jnp.arange(coords.shape[0], dtype=jnp.int32) < jnp.asarray(
                n_valid, jnp.int32
            )
            return jnp.where(valid, rows, -1)
        m = self._get_map(key)
        return find_coordinates(m.key_lanes, m.size_arr, coords, n_valid)

    def _probe_grid_for(self, key: CoordinateMapKey):
        """Grid-probe tuple (row_grid, mins, grid_shape, ts) for a map.

        The dense bbox row grid turns every coordinate lookup against this
        map into one gather (see coords/kernel_map.py ``grid_lookup``) —
        ~6× faster than the sorted join and ~100× faster than binary search
        at 32k rows.  Returns None when the grid is unavailable (no bbox
        yet, empty map) or over budget (huge sparse extents) — callers fall
        back to the sorted-key paths.
        """
        key_t = key.get_key()
        traced = self._deferred is not None and self._deferred.get("traced")
        floor = self._grid_floors.get(key_t)
        if traced and (
            floor is None or _math.prod(floor) > _MAX_GRID_CELLS
        ):
            # the warm sync pass chose (or will choose) the join path for
            # this map; don't demand a grid floor the recipe never ratchets
            return None
        plan = self.dense_plan(key)
        if plan is None or plan.cells > _MAX_GRID_CELLS or plan.mins is None:
            return None
        ck = ("row_grid", key_t)
        grid = self._interp_cache.get(ck)
        if grid is None:
            from ..ops.dense_conv import build_row_grid

            grid = build_row_grid(plan.flat_idx, plan.cells)
            self._interp_cache[ck] = grid
        return grid, plan.mins, plan.grid_shape, self._get_map(key).tensor_stride

    def _join_args(self, cache_key):
        """build_kernel_map join kwargs for this mode.

        Traced: a fixed (ratcheted) join slab + a stats dict whose ``ok``
        lands in the deferred checks.  Sync/deferred: a stats dict that
        reports the ladder rung chosen, ratcheting ``_join_floors`` (also
        removing the per-build host span sync from future traced replays).
        """
        traced = self._deferred is not None and self._deferred.get("traced")
        if traced:
            slab = self._join_floors.get(cache_key)
            if slab is None:
                raise UntraceableReplay(
                    f"no join-slab floor for kernel map {cache_key}"
                )
            return {"join_slab": slab, "join_stats": {}}
        return {"join_stats": {}}

    def _join_done(self, cache_key, js):
        stats = js["join_stats"]
        if "ok" in stats:  # traced: queue the span-fits check
            self._deferred["checks"].append(stats["ok"])
        if "join_slab" in stats:  # sync: ratchet the rung
            slab = stats["join_slab"]
            if self._span_margin > 1.0 and slab and "join_span" in stats:
                from .lookup import join_slab_for_span

                slab = max(slab, join_slab_for_span(
                    int(stats["join_span"] * self._span_margin),
                    stats["join_capacity"],
                ))
            self._join_floors[cache_key] = max(
                self._join_floors.get(cache_key, 0), slab
            )

    def _attach_floored_slabs(self, kmap, cache_key):
        """Traced replay: build both slab decompositions at the ratcheted
        floor rungs (fully traceable — no host span fetch).  The span
        checks live in traced_ok()."""
        from ..ops.pallas.conv_kernel import build_slab_map_floored

        floor = self._slab_floors.get(cache_key)
        if floor is None or not floor[0][0] or not floor[1][0]:
            raise UntraceableReplay(
                f"no slab floor for kernel map {cache_key}; warm the "
                "replayer with a sync pass first"
            )
        return KernelMap(
            kmap.in_idx,
            kmap.out_idx_t,
            kmap.n_in,
            kmap.n_out,
            build_slab_map_floored(kmap.in_idx, kmap.capacity_in, floor[0]),
            build_slab_map_floored(kmap.out_idx_t, kmap.capacity_out, floor[1]),
        )

    def _begin_deferred(self, traced: bool = False):
        self._deferred = {
            "sizes": [],
            "bboxes": [],
            "slabs": [],
            "plans": [],
            "checks": [],
            "grid_checks": [],  # (key_t, ok) — deferred-mode grid validity
            "traced": traced,
        }

    def traced_ok(self):
        """Device bool: every ratcheted floor held for this traced replay
        (capacities, overflow, slab spans, dense-grid extents).  Sync it
        once per batch; on False, re-run the batch through the sync replay
        (which ratchets the violated floors)."""
        d = self._deferred
        if d is None or not d.get("traced"):
            return jnp.asarray(True)
        oks = []
        for key_t, _fk, n_dev, ovf in d["sizes"]:
            cap = self._maps[key_t].capacity
            oks.append((n_dev <= cap) & jnp.logical_not(ovf))
        for cache_key, fs, bs in d["slabs"]:
            km = self._kernel_maps.get(cache_key)
            for slab, span2 in ((km.fwd_slab, fs), (km.bwd_slab, bs)):
                # whenever an outlier list exists, its count must fit the
                # correction capacity — INCLUDING capacity-sized slabs:
                # sub-windows can drop pairs even when the slab covers
                # everything (a capacity-sized single-tier slab covers by
                # construction, but two-tier windows do not).  Without an
                # outlier list, a sub-capacity slab needs the from_span
                # alignment margin.
                if slab is None:
                    continue
                if slab.ov_count is not None:
                    oks.append(slab.ov_count <= jnp.int32(slab.ov_cap))
                elif slab.slab_size < slab.capacity_in:
                    oks.append(span2[0] + 15 <= jnp.int32(slab.slab_size))
                if 0 < slab.union_size < slab.capacity_in:
                    oks.append(
                        span2[1] + slab.slab_size + 16
                        <= jnp.int32(slab.union_size)
                    )
        oks.extend(d["checks"])
        out = jnp.asarray(True)
        for o in oks:
            out = out & o
        return out

    def _finalize_deferred(self):
        """ONE host round trip resolving every deferred scalar, then attach
        host sizes, bboxes, slab metadata, and dense plans."""
        d, self._deferred = self._deferred, None
        if d is None:
            return
        payload = jax.device_get((
            [(t[2], t[3]) for t in d["sizes"]],
            [(t[1], t[2]) for t in d["slabs"]],
            [t[1] for t in d["bboxes"]],
            [t[1] for t in d["grid_checks"]],
        ))
        sizes_h, spans_h, bbox_h, grid_ok_h = payload
        bad_grids = [
            kt for (kt, _), ok in zip(d["grid_checks"], grid_ok_h) if not ok
        ]
        if bad_grids:
            # a grid floor was too small for this geometry: its plan (and
            # any kernel/stride maps probed through it) is invalid.  The
            # sync replay recomputes and ratchets the floors (with the
            # recovery overshoot margin applied in build_dense_plan).
            raise CapacityFloorExceeded(
                f"dense-grid floors violated for maps {bad_grids}"
            )
        for (key_t, floor_key, _, _), (n, ovf) in zip(d["sizes"], sizes_h):
            if bool(ovf):
                raise ValueError(
                    "Coordinate out of packed-key range for dimension "
                    f"{self.D}; see coords/keys.py field_ranges"
                )
            n = int(n)
            cmap = self._maps[key_t]
            if n > cmap.capacity:
                # floor too small: valid rows were truncated — ratchet and
                # have the caller replay in sync mode
                self._cap_floors[floor_key] = bucket_capacity(n)
                raise CapacityFloorExceeded(
                    f"map {key_t}: {n} rows > floored capacity "
                    f"{cmap.capacity}"
                )
            object.__setattr__(cmap, "_size_host", n)
            self._cap_floors[floor_key] = max(
                self._cap_floors.get(floor_key, 0), bucket_capacity(n)
            )
        for (key_t, _), b in zip(d["bboxes"], bbox_h):
            self._interp_cache[("bbox", key_t)] = np.asarray(b)
        from ..ops.pallas.conv_kernel import (
            build_slab_map_from_span,
            merge_slab_floor,
        )

        m = self._span_margin
        for (cache_key, _, _), (fs, bs) in zip(d["slabs"], spans_h):
            kmap = self._kernel_maps[cache_key]
            floor = self._slab_floors.get(cache_key)
            fwd = build_slab_map_from_span(
                kmap.in_idx, kmap.capacity_in, int(int(fs[0]) * m),
                min_slab=None if floor is None else floor[0],
                union_extra=int(int(fs[1]) * m),
                outlier_counts=fs[3:], total_pairs=int(fs[2]),
            )
            bwd = build_slab_map_from_span(
                kmap.out_idx_t, kmap.capacity_out, int(int(bs[0]) * m),
                min_slab=None if floor is None else floor[1],
                union_extra=int(int(bs[1]) * m),
                outlier_counts=bs[3:], total_pairs=int(bs[2]),
            )
            self._kernel_maps[cache_key] = KernelMap(
                kmap.in_idx, kmap.out_idx_t, kmap.n_in, kmap.n_out, fwd, bwd
            )
            if fwd is not None and bwd is not None:
                self._slab_floors[cache_key] = (
                    merge_slab_floor(
                        None if floor is None else floor[0],
                        (fwd.slab_size, fwd.extra_rung, fwd.ov_cap,
                         fwd.sub_size or fwd.slab_size),
                    ),
                    merge_slab_floor(
                        None if floor is None else floor[1],
                        (bwd.slab_size, bwd.extra_rung, bwd.ov_cap,
                         bwd.sub_size or bwd.slab_size),
                    ),
                )
        from ..ops.dense_conv import build_dense_plan

        for key_t in d["plans"]:
            bbox = self._interp_cache.get(("bbox", key_t))
            plan = build_dense_plan(
                self._maps[key_t],
                bbox=bbox,
                extent_floor=self._grid_floors.get(key_t),
                margin=self._span_margin,
            )
            self._interp_cache[("dense_plan", key_t)] = plan
            if plan is not None:
                self._grid_floors[key_t] = plan.grid_shape

    def reduce_features(self, key: CoordinateMapKey, features, quantization_mode=None):
        """Features (N_in, ch) → padded map-ordered (capacity, ch) buffer,
        reduced by the quantization mode (the SparseTensor-ctor reduction,
        reusable after ``replay`` where the insert already happened)."""
        from ..ops import functional as F
        from ..types import SparseTensorQuantizationMode as Q

        if quantization_mode is None:
            quantization_mode = Q.RANDOM_SUBSAMPLE
        res = self._insert_results.get(key.get_key())
        if res is None:
            raise KeyError(f"no insert recorded for {key.get_key()}")
        unique_map, inverse_map, n_in, n_unique = res
        cap_out = self.capacity(key)
        feats = jnp.asarray(features)
        pad = jnp.zeros(
            (unique_map.shape[0] - feats.shape[0],) + feats.shape[1:],
            feats.dtype,
        )
        feats_padded = jnp.concatenate([feats, pad])
        if quantization_mode in (Q.RANDOM_SUBSAMPLE, Q.NO_QUANTIZATION):
            return F.take_rows(feats_padded, unique_map)[:cap_out]
        if quantization_mode == Q.UNWEIGHTED_AVERAGE:
            return F.segment_mean(feats_padded, inverse_map, cap_out)
        if quantization_mode == Q.UNWEIGHTED_SUM:
            return F.segment_sum(feats_padded, inverse_map, cap_out)
        if quantization_mode == Q.MAX_POOL:
            return F.segment_max(feats_padded, inverse_map, cap_out)
        raise ValueError(f"Unsupported quantization mode {quantization_mode}")

    # ------------------------------------------------------------------
    # geometry export / replay (coords/geometry.py)
    # ------------------------------------------------------------------
    def export_geometry(self):
        """Snapshot the cached coordinate state as a traceable pytree."""
        from .geometry import Geometry

        plans = {
            ck[1]: v
            for ck, v in self._interp_cache.items()
            if isinstance(ck, tuple) and ck and ck[0] == "dense_plan"
        }
        return Geometry(
            D=self.D,
            maps=dict(self._maps),
            kernel_maps=dict(self._kernel_maps),
            stride_maps=dict(self._stride_maps),
            dense_plans=plans,
            origin_keys={
                k: v.get_key() for k, v in self._origin_keys.items()
            },
            entry_key_tuple=(
                self._entry_key.get_key() if self._entry_key else None
            ),
        )

    @classmethod
    def from_geometry(cls, geometry) -> "CoordinateManager":
        """Frozen view manager over a Geometry pytree.

        Trace-safe: construction touches no device data; all lookups hit
        the geometry's caches; any build attempt raises.
        """
        mgr = cls(D=geometry.D)
        mgr._maps = dict(geometry.maps)
        mgr._kernel_maps = dict(geometry.kernel_maps)
        mgr._stride_maps = dict(geometry.stride_maps)
        mgr._origin_keys = {
            k: CoordinateMapKey(*v) for k, v in geometry.origin_keys.items()
        }
        for k, plan in geometry.dense_plans.items():
            mgr._interp_cache[("dense_plan", k)] = plan
        if geometry.entry_key_tuple is not None:
            mgr._entry_key = CoordinateMapKey(*geometry.entry_key_tuple)
        mgr._frozen = True
        return mgr

    @classmethod
    def replay(
        cls,
        oplog: Sequence[tuple],
        coordinates,
        tensor_stride=1,
        cap_floors: Optional[Dict[tuple, int]] = None,
        slab_floors: Optional[Dict[tuple, Tuple[int, int]]] = None,
        grid_floors: Optional[Dict[tuple, tuple]] = None,
        deferred: Optional[bool] = None,
        traced: bool = False,
        n_valids=None,
        join_floors: Optional[Dict[tuple, int]] = None,
        overprovision: float = 1.0,
    ) -> "CoordinateManager":
        """Re-run a recorded coordinate-op recipe against new coordinates.

        This is the fresh-geometry training path: record the coordinate ops
        once (first eager forward), then per batch replay them — no model
        forward, no per-layer eager overhead — and export the result as a
        Geometry argument for the jitted step.

        When capacity floors are available (``deferred`` defaults on then),
        the whole phase runs with ONE host round trip: every map is built at
        its floored capacity with device-scalar counts, spans/bboxes queue
        up, and a single finalize sync resolves them.  If a floor proves too
        small the replay transparently re-runs in sync mode (ratcheting).

        ``traced=True`` goes further: the ENTIRE phase is traceable (callable
        under jax.jit), with slab/dense shapes taken from the ratcheted
        floors and zero host syncs; floor violations surface as a device
        bool from ``traced_ok()`` (the caller syncs it once and falls back
        to sync replay).  Requires every floor to be settled; raises
        UntraceableReplay otherwise.  See coords/geometry.py
        ``CompiledReplayer`` for the per-batch driver.

        ``coordinates``: one (N, D+1) array, or a list with one entry per
        recorded ``insert`` (models that insert several coordinate sets).
        ``n_valids``: optional per-insert device scalars — the count of
        valid leading rows when the coordinate arrays are padded to a
        static bucket (the traced-replay calling convention).
        """
        if traced:
            return cls._replay_once(
                oplog, coordinates, tensor_stride,
                cap_floors, slab_floors, grid_floors, "traced", n_valids,
                join_floors,
            )
        if deferred is None:
            deferred = bool(cap_floors)
        if deferred:
            try:
                return cls._replay_once(
                    oplog, coordinates, tensor_stride,
                    cap_floors, slab_floors, grid_floors, True, n_valids,
                    join_floors, overprovision,
                )
            except CapacityFloorExceeded:
                pass  # sync replay below recomputes and ratchets floors
        return cls._replay_once(
            oplog, coordinates, tensor_stride,
            cap_floors, slab_floors, grid_floors, False, n_valids,
            join_floors, overprovision,
        )

    @classmethod
    def _replay_once(
        cls, oplog, coordinates, tensor_stride,
        cap_floors, slab_floors, grid_floors, use_deferred, n_valids=None,
        join_floors=None, overprovision: float = 1.0,
    ) -> "CoordinateManager":
        if not isinstance(coordinates, (list, tuple)):
            coordinates = [coordinates]
        if n_valids is not None and not isinstance(n_valids, (list, tuple)):
            n_valids = [n_valids]
        coords_iter = iter(coordinates)
        nvalid_iter = iter(n_valids) if n_valids is not None else None
        mgr = None
        for entry in oplog:
            op = entry[0]
            if op == "insert":
                _, ts, sid, produced = entry
                c = next(coords_iter)
                if mgr is None:
                    mgr = cls(D=int(c.shape[1]) - 1)
                    mgr._span_margin = float(overprovision)
                    if cap_floors:
                        mgr._cap_floors.update(cap_floors)
                    if slab_floors:
                        mgr._slab_floors.update(slab_floors)
                    if grid_floors:
                        mgr._grid_floors.update(grid_floors)
                    if join_floors:
                        mgr._join_floors.update(join_floors)
                    if use_deferred:
                        mgr._begin_deferred(traced=use_deferred == "traced")
                key, _, _, _, _ = mgr.insert_and_map_padded(
                    c, ts, sid,
                    n_valid=(
                        next(nvalid_iter) if nvalid_iter is not None else None
                    ),
                )
                if key.get_key() != produced:
                    raise RuntimeError(
                        f"replay produced key {key.get_key()}, recorded "
                        f"{produced} — op order diverged"
                    )
                continue
            if mgr is None:
                raise RuntimeError("oplog does not start with an insert")
            if op == "stride":
                _, in_k, stride, sid = entry
                mgr.stride(CoordinateMapKey(*in_k), stride, sid)
            elif op == "stride_region":
                (_, in_k, rtype, off_bytes, off_shape, out_ts, expand,
                 is_t, sid) = entry
                offsets = np.frombuffer(off_bytes, np.int32).reshape(off_shape)
                region = KernelRegion(RegionType(rtype), offsets)
                mgr.stride_region(
                    CoordinateMapKey(*in_k), region, out_ts, expand, is_t, sid
                )
            elif op == "origin":
                _, in_k = entry
                mgr.origin(CoordinateMapKey(*in_k))
            elif op == "origin_map":
                _, in_k = entry
                mgr.origin_map(CoordinateMapKey(*in_k))
            elif op == "kernel_map":
                (_, in_k, out_k, stride, ks, dil, rtype, off, is_t,
                 is_pool) = entry
                region_offs = (
                    None
                    if off is None
                    else np.frombuffer(off[0], np.int32).reshape(off[1])
                )
                mgr.kernel_map(
                    CoordinateMapKey(*in_k),
                    CoordinateMapKey(*out_k),
                    stride,
                    ks,
                    dil,
                    RegionType(rtype),
                    region_offs,
                    is_t,
                    is_pool,
                )
            elif op == "stride_map":
                _, in_k, out_k = entry
                mgr._stride_map_array(
                    CoordinateMapKey(*in_k), CoordinateMapKey(*out_k)
                )
            elif op == "merge":
                _, key_tuples = entry
                mgr.merge([CoordinateMapKey(*k) for k in key_tuples])
            elif op == "dense_plan":
                _, in_k = entry
                mgr.dense_plan(CoordinateMapKey(*in_k))
            else:
                raise RuntimeError(f"unknown oplog entry {op!r}")
        if mgr is None:
            raise RuntimeError("empty oplog")
        if use_deferred == "traced":
            return mgr  # checks stay on device: see traced_ok()
        if use_deferred:
            mgr._finalize_deferred()
        return mgr

    def clear(self):
        self._maps.clear()
        self._field_maps.clear()
        self._kernel_maps.clear()
        self._stride_maps.clear()
        self._origin_keys.clear()
        self._field_to_sparse.clear()
        self._interp_cache.clear()


def region_offsets_for(
    region_type: RegionType,
    kernel_size: Tuple[int, ...],
    dilation: Tuple[int, ...],
    tensor_stride: Tuple[int, ...],
    custom_offsets: Optional[np.ndarray],
) -> np.ndarray:
    """Absolute offsets for a region at a tensor stride (manager-side)."""
    return region_offsets(
        RegionType(region_type), kernel_size, dilation, tensor_stride, custom_offsets
    )


def _stride_map_to_kernel_map(
    in_to_out: jnp.ndarray, in_map: CoordinateMap, out_map: CoordinateMap
) -> KernelMap:
    """Wrap a many-to-one stride map as a volume-``Kmax`` dense kernel map.

    A stride map sends every input row to one output voxel; as a kernel map
    it has a single "offset" but multiple inputs per output, so it cannot be
    a (1, C_out) matching.  We slot colliding inputs into successive rows:
    slot r holds the r-th input of each output voxel.  ``Kmax`` (max inputs
    per voxel) is data-dependent but bounded by the kernel volume in all
    reference uses (pooling with stride == kernel_size); we compute it on the
    host once at build time (this is the cached coordinate phase).
    """
    counts_sorted = _collision_rank(in_to_out, out_map.capacity)
    rank, max_rank = counts_sorted
    kmax = max(int(max_rank), 1)
    in_idx, out_idx_t = _scatter_slots(
        in_to_out, rank, kmax, in_map.capacity, out_map.capacity
    )
    return KernelMap(in_idx, out_idx_t, in_map.size_arr, out_map.size_arr)


@jax.jit
def _collision_rank(in_to_out, n_out_capacity):
    """rank[i] = position of input i among inputs sharing its output row."""
    C = in_to_out.shape[0]
    valid = in_to_out >= 0
    tgt = jnp.where(valid, in_to_out, n_out_capacity)
    order = jnp.argsort(tgt, stable=True)
    sorted_tgt = tgt[order]
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_tgt[1:] != sorted_tgt[:-1]]
    )
    pos = jnp.arange(C, dtype=jnp.int32)
    seg_start = jnp.where(is_new, pos, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank_sorted = pos - seg_start
    rank = jnp.zeros((C,), jnp.int32).at[order].set(rank_sorted)
    max_rank = jnp.max(jnp.where(valid, rank, -1)) + 1
    return rank, max_rank


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _scatter_slots(in_to_out, rank, kmax, cap_in, cap_out):
    valid = in_to_out >= 0
    i = jnp.arange(cap_in, dtype=jnp.int32)
    flat_tgt = jnp.where(valid, rank * cap_out + in_to_out, kmax * cap_out)
    in_idx = (
        jnp.full((kmax * cap_out,), -1, jnp.int32)
        .at[flat_tgt]
        .set(i, mode="drop")
        .reshape(kmax, cap_out)
    )
    # slot k of input i is in_to_out[i] iff rank[i] == k, else -1
    out_idx_t = jnp.where(
        (jnp.arange(kmax, dtype=jnp.int32)[:, None] == rank[None, :])
        & valid[None, :],
        in_to_out[None, :],
        -1,
    )
    return in_idx, out_idx_t


@jax.jit
def _interp_corner_coords(samples, tensor_stride, corners):
    """(2^D, N, D+1) int32 corner voxel coords + (2^D, N) weights."""
    ts = tensor_stride.astype(jnp.float32)  # (D,)
    batch = samples[:, :1]
    p = samples[:, 1:] / ts  # continuous voxel-space position
    base = jnp.floor(p)
    frac = p - base  # in [0, 1)
    corner_pos = base[None, :, :] + corners[:, None, :].astype(jnp.float32)
    coords = jnp.concatenate(
        [
            jnp.broadcast_to(
                batch[None, :, :], (corners.shape[0],) + batch.shape
            ).astype(jnp.int32),
            (corner_pos * ts[None, None, :]).astype(jnp.int32),
        ],
        axis=-1,
    )  # (2^D, N, D+1)
    w = jnp.prod(
        jnp.where(corners[:, None, :] == 1, frac[None, :, :], 1.0 - frac[None, :, :]),
        axis=-1,
    )  # (2^D, N)
    return coords, w


@functools.partial(jax.jit, static_argnums=(2, 3))
def _interpolation_map_grid(
    row_grid, mins, grid_shape, ts_tuple, samples, n_samples, corners
):
    """Grid-probe variant of ``_interpolation_map`` (one gather per corner
    instead of a binary search — interpolation/splat are per-batch ops in
    TensorField training, so this is on the fresh-geometry path)."""
    from .kernel_map import grid_lookup

    ts = jnp.asarray(ts_tuple, jnp.int32)
    coords, w = _interp_corner_coords(samples, ts, corners)
    rows = grid_lookup(row_grid, mins, grid_shape, ts_tuple, coords)
    valid = (jnp.arange(samples.shape[0], dtype=jnp.int32) < n_samples)[None, :]
    rows = jnp.where(valid, rows, -1)
    w = jnp.where(rows >= 0, w, 0.0)
    return rows.T, w.T  # (N, 2^D)


def _interpolation_map(map_lanes, n_map, samples, n_samples, tensor_stride, corners):
    """Neighbor rows + multilinear weights for interpolation/splat."""
    coords, w = _interp_corner_coords(samples, tensor_stride, corners)
    rows = find_rows(map_lanes, n_map, K.pack(coords))  # (2^D, N)
    valid = (jnp.arange(samples.shape[0], dtype=jnp.int32) < n_samples)[None, :]
    rows = jnp.where(valid, rows, -1)
    w = jnp.where(rows >= 0, w, 0.0)
    return rows.T, w.T  # (N, 2^D)
