"""Batched coordinate lookup via vectorized binary search.

Replaces the reference's hash probes (reference:
src/coordinate_map_cpu.hpp:388-411 ``find``; src/coordinate_map_gpu.cu:320-359)
with a branch-free lower-bound binary search over the map's sorted packed
keys.  Each of the Q queries runs ceil(log2(C)) rounds of gathers — no
data-dependent control flow, so the whole thing jits into a handful of fused
gather/select kernels.

This is the workhorse behind kernel-map construction, stride maps, union
maps, interpolation neighbor lookup, and field→sparse maps.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import keys as K


@jax.jit
def find_rows(map_hi, map_lo, n_map, q_hi, q_lo):
    """For each query key return its row in the sorted map, or -1.

    Args:
      map_hi, map_lo: (C,) uint32 — ascending unique keys, padding = max key.
      n_map: () int32 — number of valid map rows.
      q_hi, q_lo: (...,) uint32 query keys.

    Returns:
      (...,) int32 row indices into the map, -1 where absent.
    """
    C = map_hi.shape[0]
    steps = max(1, math.ceil(math.log2(C + 1)))

    lo_idx = jnp.zeros(q_hi.shape, dtype=jnp.int32)
    hi_idx = jnp.full(q_hi.shape, C, dtype=jnp.int32)

    def body(_, state):
        lo_i, hi_i = state
        mid = (lo_i + hi_i) >> 1
        m_hi = jnp.take(map_hi, mid, mode="clip")
        m_lo = jnp.take(map_lo, mid, mode="clip")
        less = K.key_less(m_hi, m_lo, q_hi, q_lo)
        return jnp.where(less, mid + 1, lo_i), jnp.where(less, hi_i, mid)

    lo_idx, _ = jax.lax.fori_loop(0, steps, body, (lo_idx, hi_idx))

    f_hi = jnp.take(map_hi, lo_idx, mode="clip")
    f_lo = jnp.take(map_lo, lo_idx, mode="clip")
    found = (lo_idx < n_map) & K.key_equal(f_hi, f_lo, q_hi, q_lo)
    return jnp.where(found, lo_idx, -1)


@jax.jit
def find_coordinates(map_hi, map_lo, n_map, query_coords, n_query):
    """Find raw (Q, D+1) int32 query coordinates in the map.

    Queries at rows >= n_query, or with out-of-budget fields, return -1.
    """
    q_hi, q_lo = K.pack(query_coords)
    rows = find_rows(map_hi, map_lo, n_map, q_hi, q_lo)
    q_idx = jnp.arange(query_coords.shape[0], dtype=jnp.int32)
    bad = K.overflow_mask(query_coords)
    return jnp.where((q_idx < n_query) & ~bad, rows, -1)
