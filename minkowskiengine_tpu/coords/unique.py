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

with one deliberate difference: unique rows come out in **canonical key-sorted
order** (batch-major, Morton/Z-order spatial) rather than first-occurrence
order.  The
reference's own ordering is backend-dependent (CPU: insertion order, GPU:
hash-table order), so no caller may rely on it; sorted order is deterministic,
permutation-invariant, and lets every later lookup use binary search.
``unique_map`` still points at the *first* valid occurrence in the input
(stable sort guarantees min original row index per key), which
RANDOM_SUBSAMPLE quantization relies on.

All functions take padded arrays + a validity mask and return padded arrays +
dynamic counts; shapes depend only on static capacities.
"""

from __future__ import annotations

from typing import NamedTuple

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
      sorted_hi/sorted_lo: (C,) uint32 — packed keys of the unique rows in
        ascending order; padding rows hold the max key.
      n_unique: () int32 — dynamic count of unique rows.
    """

    unique_map: jnp.ndarray
    inverse_map: jnp.ndarray
    sorted_hi: jnp.ndarray
    sorted_lo: jnp.ndarray
    n_unique: jnp.ndarray


@jax.jit
def unique_from_keys(
    hi: jnp.ndarray, lo: jnp.ndarray, valid: jnp.ndarray
) -> UniqueResult:
    """Unique + inverse over packed keys.

    Args:
      hi, lo: (C,) uint32 packed keys (invalid rows may hold garbage).
      valid: (C,) bool mask of rows participating in the unique.
    """
    C = hi.shape[0]
    row = jnp.arange(C, dtype=jnp.int32)
    pad_hi, pad_lo = K.key_max()
    hi = jnp.where(valid, hi, pad_hi)
    lo = jnp.where(valid, lo, pad_lo)
    invalid_key = (~valid).astype(jnp.uint32)

    # Stable 3-key sort: (hi, lo, invalid).  The third key guarantees valid
    # rows precede invalid rows even if a real key equals the padding key, so
    # valid rows always form a prefix; stability makes the first row of each
    # equal-key run the minimum original index.
    s_hi, s_lo, s_invalid, s_row = jax.lax.sort(
        (hi, lo, invalid_key, row), num_keys=3, is_stable=True
    )

    n_valid = jnp.sum(valid.astype(jnp.int32))
    s_valid = jnp.arange(C, dtype=jnp.int32) < n_valid
    prev_hi = jnp.concatenate([s_hi[:1] ^ jnp.uint32(1), s_hi[:-1]])
    prev_lo = jnp.concatenate([s_lo[:1], s_lo[:-1]])
    is_new = (~K.key_equal(s_hi, s_lo, prev_hi, prev_lo)) & s_valid

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
    u_hi = jnp.full((C,), pad_hi, dtype=jnp.uint32).at[slot_tgt].set(s_hi, mode="drop")
    u_lo = jnp.full((C,), pad_lo, dtype=jnp.uint32).at[slot_tgt].set(s_lo, mode="drop")

    return UniqueResult(unique_map, inverse, u_hi, u_lo, n_unique)


@jax.jit
def unique_coordinates(coords: jnp.ndarray, valid: jnp.ndarray):
    """Unique over raw (C, D+1) int32 coords with a validity mask.

    Returns (UniqueResult, unique_coords (C, D+1) with padding rows zeroed,
    overflow flag over valid rows, bbox (2, D+1) mins/maxs over valid rows).
    The bbox rides along so callers can fetch it in the same host sync as
    the unique count (each isolated sync costs ~30 ms through the tunnel);
    it feeds the dense-conv plan.
    """
    hi, lo = K.pack(coords)
    res = unique_from_keys(hi, lo, valid)
    overflow = jnp.any(K.overflow_mask(coords) & valid)
    u_coords = jnp.take(coords, res.unique_map, axis=0, mode="fill", fill_value=0)
    big = jnp.where(valid[:, None], coords, jnp.int32(2**30))
    small = jnp.where(valid[:, None], coords, jnp.int32(-(2**30)))
    bbox = jnp.stack([jnp.min(big, axis=0), jnp.max(small, axis=0)])
    return res, u_coords, overflow, bbox


def prefix_mask(capacity: int, n) -> jnp.ndarray:
    """(capacity,) bool mask with the first ``n`` rows set."""
    return jnp.arange(capacity, dtype=jnp.int32) < n
