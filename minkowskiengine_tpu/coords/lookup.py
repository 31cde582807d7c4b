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

import functools
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


_JOIN_TILE = 256
_MAX_JOIN_SLAB = 8192


@functools.partial(jax.jit, static_argnums=(5,))
def _find_rows_tile_join_impl(map_hi, map_lo, n_map, q_hi, q_lo, slab):
    """Join query tiles against the sorted map via per-tile slabs.

    q_hi/q_lo: (B, Q) in ANY order (invalid queries hold the max key).  All
    matches for a tile of TILE queries lie in the contiguous map window
    [lb(tile_min_key), lb(tile_max_key)] — keys need not be sorted within
    the tile, only CLOSE (canonical Morton order makes consecutive rows
    spatially local, so probe keys of a tile cluster).  Two boundary binary
    searches per tile plus a (TILE, slab) equality compare perform TILE
    lookups at VPU speed instead of TILE·log(N) dependent gathers.
    """
    TILE = _JOIN_TILE
    B, Q = q_hi.shape
    nt = Q // TILE
    qh = q_hi.reshape(B, nt, TILE)
    ql = q_lo.reshape(B, nt, TILE)
    min_hi, min_lo, _, _ = _tile_key_bounds(qh, ql)
    starts = find_lower_bound(map_hi, map_lo, min_hi, min_lo)
    C = map_hi.shape[0]
    starts = jnp.clip(starts, 0, max(C - slab, 0))

    def one_batch(args):
        qh_b, ql_b, st_b = args

        def one_tile(qh_t, ql_t, st):
            sl_hi = jax.lax.dynamic_slice(map_hi, (st,), (slab,))
            sl_lo = jax.lax.dynamic_slice(map_lo, (st,), (slab,))
            eq = (qh_t[:, None] == sl_hi[None, :]) & (
                ql_t[:, None] == sl_lo[None, :]
            )
            found = jnp.any(eq, axis=1)
            pos = jnp.argmax(eq, axis=1).astype(jnp.int32) + st
            return jnp.where(found & (pos < n_map), pos, -1)

        return jax.vmap(one_tile)(qh_b, ql_b, st_b)

    rows = jax.lax.map(one_batch, (qh, ql, starts))
    return rows.reshape(B, Q)


@jax.jit
def _tile_key_bounds(qh, ql):
    """Per-tile lexicographic (hi, lo) key min and max over the last axis.

    Padding (all-ones) keys are excluded from the MAX so a tile mixing
    valid probes with padding doesn't claim a span to the end of the map;
    they do participate in the min (they sort last, so the min is
    unaffected unless the whole tile is padding — whose probes all miss
    anyway)."""
    pad = (qh == K.UMAX) & (ql == K.UMAX)
    min_hi = jnp.min(qh, axis=-1)
    min_lo = jnp.min(
        jnp.where(qh == min_hi[..., None], ql, K.UMAX), axis=-1
    )
    nh = jnp.where(pad, jnp.uint32(0), qh)
    nl = jnp.where(pad, jnp.uint32(0), ql)
    max_hi = jnp.max(nh, axis=-1)
    max_lo = jnp.max(
        jnp.where(nh == max_hi[..., None], nl, jnp.uint32(0)), axis=-1
    )
    return min_hi, min_lo, max_hi, max_lo


@jax.jit
def _tile_join_spans(map_hi, map_lo, n_map, qh, ql):
    """(B, nt) int32 span (window size) each query tile needs: lb(max) -
    lb(min) + 1, clamped at 0 for all-padding tiles."""
    min_hi, min_lo, max_hi, max_lo = _tile_key_bounds(qh, ql)
    lo_b = find_lower_bound(map_hi, map_lo, min_hi, min_lo)
    hi_b = find_lower_bound(map_hi, map_lo, max_hi, max_lo)
    return jnp.maximum(hi_b - lo_b + 1, 0)


@jax.jit
def find_lower_bound(map_hi, map_lo, q_hi, q_lo):
    """First index whose key is >= the query key (binary search)."""
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
    return lo_idx


def join_slab_for_span(span: int, C: int) -> int:
    """Quantize a join span to the slab ladder (shape stability: one
    recompile costs seconds through the TPU tunnel, so prefer a fixed
    2×TILE slab and quantize larger spans coarsely)."""
    needed = max(int(span), 1)
    if needed <= 2 * _JOIN_TILE:
        slab = 2 * _JOIN_TILE
    else:
        slab = ((needed + 1023) // 1024) * 1024
    return min(slab, C)


def find_rows_sorted(map_hi, map_lo, n_map, q_hi, q_lo, stats=None):
    """Tile-join ``find_rows`` for (B, Q) query batches.

    Used by the kernel-map builder: per-offset probe keys of a tile of
    consecutive output rows cluster (canonical order is spatially local and
    an offset is a bounded spatial shift), so each tile's matches fit a
    small contiguous map window [lb(tile min key), lb(tile max key)].
    Queries need NOT be sorted — the bounds are computed explicitly.  The
    slab size is the max per-tile span (one host sync, amortized by the
    manager's kernel-map cache).  Falls back to plain binary search when
    tiling does not apply or the required slab is too large.

    ``stats``: optional dict; receives ``join_slab`` (the ladder rung used)
    so callers can ratchet a floor for traced replays.
    """
    TILE = _JOIN_TILE
    B, Q = q_hi.shape
    C = map_hi.shape[0]
    if Q % TILE != 0 or C < TILE:
        if stats is not None:
            stats["join_slab"] = 0  # 0 = binary-search fallback (no slab)
        return find_rows(map_hi, map_lo, n_map, q_hi, q_lo)
    nt = Q // TILE
    qh = q_hi.reshape(B, nt, TILE)
    ql = q_lo.reshape(B, nt, TILE)
    spans = _tile_join_spans(map_hi, map_lo, n_map, qh, ql)
    span = int(jnp.max(spans))  # host sync (sync/deferred path only)
    slab = join_slab_for_span(span, C)
    if stats is not None:
        stats["join_slab"] = slab
        stats["join_span"] = span
        stats["join_capacity"] = C
    if slab > _MAX_JOIN_SLAB:
        return find_rows(map_hi, map_lo, n_map, q_hi, q_lo)
    return _find_rows_tile_join_impl(map_hi, map_lo, n_map, q_hi, q_lo, slab)


def find_rows_sorted_fixed(map_hi, map_lo, n_map, q_hi, q_lo, slab: int):
    """Traceable ``find_rows_sorted`` at a KNOWN (ratcheted-floor) join
    slab — zero host syncs.  Returns (rows, ok) where ``ok`` is a device
    bool asserting the true span fit the slab (results are exact iff ok)."""
    TILE = _JOIN_TILE
    B, Q = q_hi.shape
    C = map_hi.shape[0]
    if slab == 0 or Q % TILE != 0 or C < TILE or slab > _MAX_JOIN_SLAB:
        rows = find_rows(map_hi, map_lo, n_map, q_hi, q_lo)
        return rows, jnp.asarray(True)
    nt = Q // TILE
    qh = q_hi.reshape(B, nt, TILE)
    ql = q_lo.reshape(B, nt, TILE)
    slab = min(int(slab), C)
    ok = jnp.max(_tile_join_spans(map_hi, map_lo, n_map, qh, ql)) <= jnp.int32(
        slab
    )
    rows = _find_rows_tile_join_impl(map_hi, map_lo, n_map, q_hi, q_lo, slab)
    return rows, ok


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
