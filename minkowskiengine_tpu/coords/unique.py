"""Sort-based unique / inverse-map construction (the TPU ``insert_and_map``).

Replaces the reference's hash-table inserts (reference:
src/coordinate_map_cpu.hpp:353-380 CPU serial robin-hood loop;
src/coordinate_map_gpu.cu:196-291 atomicCAS insert + thrust compaction) with a
single `lax.sort` over packed keys plus segment arithmetic — branch-free and
fully vectorized for the VPU.

Semantics match the reference contract (src/coordinate_map_cpu.hpp:340-352):

    unique_coordinates  = input_coordinates[unique_map]
    reconstructed       = unique_coordinates[inverse_map]
    reconstructed == input_coordinates

with one deliberate difference: unique rows come out in **canonical
key-sorted order** (batch-major; see coords/keys.py) rather than
first-occurrence order.  The reference's own ordering is backend-dependent
(CPU: insertion order, GPU: hash-table order), so no caller may rely on it;
sorted order is deterministic, permutation-invariant, and lets every later
lookup use binary search.  ``unique_map`` still points at the *first* valid
occurrence in the input (stable sort guarantees min original row index per
key), which RANDOM_SUBSAMPLE quantization relies on.

Keys are tuples of uint32 lanes (2 for D <= 6, 3 for high-D — the
multi-word path); all functions take padded arrays + a validity mask and
return padded arrays + dynamic counts; shapes depend only on static
capacities.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import keys as K


class UniqueResult(NamedTuple):
    """Padded unique/inverse maps.

    Attributes:
      unique_map: (C,) int32 — input row index of each unique coord's first
        valid occurrence; rows >= n_unique hold C (out of range, safe for
        ``take(..., fill)``).
      inverse_map: (C,) int32 — unique row index for each input row; invalid
        rows map to -1.
      sorted_lanes: tuple of (C,) uint32 — packed key lanes of the unique
        rows in ascending order; padding rows hold the max key.
      n_unique: () int32 — dynamic count of unique rows.
    """

    unique_map: jnp.ndarray
    inverse_map: jnp.ndarray
    sorted_lanes: Tuple[jnp.ndarray, ...]
    n_unique: jnp.ndarray


@jax.jit
def unique_from_keys(lanes, valid: jnp.ndarray) -> UniqueResult:
    """Unique + inverse over packed key lanes.

    Args:
      lanes: tuple of (C,) uint32 packed key lanes, most significant first
        (invalid rows may hold garbage).
      valid: (C,) bool mask of rows participating in the unique.
    """
    lanes = tuple(lanes)
    L = len(lanes)
    C = lanes[0].shape[0]
    row = jnp.arange(C, dtype=jnp.int32)
    pad = K.key_max(L)
    lanes = tuple(jnp.where(valid, l, p) for l, p in zip(lanes, pad))
    invalid_key = (~valid).astype(jnp.uint32)

    # Stable (L+1)-key sort: (*lanes, invalid).  The extra key guarantees
    # valid rows precede invalid rows even if a real key equals the padding
    # key, so valid rows always form a prefix; stability makes the first
    # row of each equal-key run the minimum original index.
    sorted_all = jax.lax.sort(
        (*lanes, invalid_key, row), num_keys=L + 1, is_stable=True
    )
    s_lanes, s_row = sorted_all[:L], sorted_all[-1]

    n_valid = jnp.sum(valid.astype(jnp.int32))
    s_valid = jnp.arange(C, dtype=jnp.int32) < n_valid
    prev = tuple(
        jnp.concatenate(
            [(l[:1] ^ jnp.uint32(1)) if i == 0 else l[:1], l[:-1]]
        )
        for i, l in enumerate(s_lanes)
    )
    is_new = (~K.key_equal(s_lanes, prev)) & s_valid

    seg_id = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # unique slot per sorted row
    n_unique = jnp.sum(is_new.astype(jnp.int32))

    # inverse: original row -> unique slot (invalid -> -1).
    inverse = jnp.full((C,), -1, dtype=jnp.int32).at[s_row].set(
        jnp.where(s_valid, seg_id, -1), mode="drop"
    )

    # unique_map: unique slot -> first-occurrence original row (padding -> C).
    slot_tgt = jnp.where(is_new, seg_id, C)
    unique_map = jnp.full((C,), C, dtype=jnp.int32).at[slot_tgt].set(s_row, mode="drop")

    # Sorted unique keys, compacted to the front (padding -> max key).
    u_lanes = tuple(
        jnp.full((C,), p, dtype=jnp.uint32).at[slot_tgt].set(l, mode="drop")
        for l, p in zip(s_lanes, pad)
    )

    return UniqueResult(unique_map, inverse, u_lanes, n_unique)


@jax.jit
def unique_coordinates(coords: jnp.ndarray, valid: jnp.ndarray):
    """Unique over raw (C, D+1) int32 coords with a validity mask.

    Returns (UniqueResult, unique_coords (C, D+1) with padding rows zeroed,
    overflow flag over valid rows, bbox (2, D+1) mins/maxs over valid rows).
    The bbox rides along so callers can fetch it in the same host sync as
    the unique count (each isolated sync costs ~30 ms through the tunnel);
    it feeds the dense-conv plan.
    """
    lanes = K.pack(coords)
    res = unique_from_keys(lanes, valid)
    overflow = jnp.any(K.overflow_mask(coords) & valid)
    u_coords = jnp.take(coords, res.unique_map, axis=0, mode="fill", fill_value=0)
    big = jnp.where(valid[:, None], coords, jnp.int32(2**30))
    small = jnp.where(valid[:, None], coords, jnp.int32(-(2**30)))
    bbox = jnp.stack([jnp.min(big, axis=0), jnp.max(small, axis=0)])
    return res, u_coords, overflow, bbox


def prefix_mask(capacity: int, n) -> jnp.ndarray:
    """(capacity,) bool mask with the first ``n`` rows set."""
    return jnp.arange(capacity, dtype=jnp.int32) < n
