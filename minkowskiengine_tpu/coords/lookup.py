"""Batched coordinate lookup via vectorized binary search.

Replaces the reference's hash probes (reference:
src/coordinate_map_cpu.hpp:388-411 ``find``; src/coordinate_map_gpu.cu:320-359)
with a branch-free lower-bound binary search over the map's sorted packed
keys.  Each of the Q queries runs ceil(log2(C)) rounds of gathers — no
data-dependent control flow, so the whole thing jits into a handful of fused
gather/select kernels.

Keys are tuples of uint32 lanes (coords/keys.py) compared lexicographically;
every function here takes the map's lane tuple and a query lane tuple.

This is the workhorse behind kernel-map construction, stride maps, union
maps, interpolation neighbor lookup, and field→sparse maps.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from . import keys as K


def _gather_lanes(map_lanes, idx):
    return tuple(jnp.take(l, idx, mode="clip") for l in map_lanes)


@jax.jit
def find_rows(map_lanes, n_map, q_lanes):
    """For each query key return its row in the sorted map, or -1.

    Args:
      map_lanes: tuple of (C,) uint32 — ascending unique key lanes,
        padding = max key.
      n_map: () int32 — number of valid map rows.
      q_lanes: tuple of (...,) uint32 query key lanes.

    Returns:
      (...,) int32 row indices into the map, -1 where absent.
    """
    lo_idx = find_lower_bound(map_lanes, q_lanes)
    found = (lo_idx < n_map) & K.key_equal(
        _gather_lanes(map_lanes, lo_idx), q_lanes
    )
    return jnp.where(found, lo_idx, -1)


_JOIN_TILE = 256
_MAX_JOIN_SLAB = 8192


@functools.partial(jax.jit, static_argnums=(3,))
def _find_rows_tile_join_impl(map_lanes, n_map, q_lanes, slab):
    """Join query tiles against the sorted map via per-tile slabs.

    q_lanes: tuple of (B, Q) lanes in ANY order (invalid queries hold the
    max key).  All matches for a tile of TILE queries lie in the contiguous
    map window [lb(tile_min_key), lb(tile_max_key)] — keys need not be
    sorted within the tile, only CLOSE (canonical order makes consecutive
    rows spatially local, so probe keys of a tile cluster).  Two boundary
    binary searches per tile plus a (TILE, slab) equality compare perform
    TILE lookups at VPU speed instead of TILE·log(N) dependent gathers.
    """
    TILE = _JOIN_TILE
    B, Q = q_lanes[0].shape
    nt = Q // TILE
    qt = tuple(l.reshape(B, nt, TILE) for l in q_lanes)
    mins, _ = _tile_key_bounds(qt)
    starts = find_lower_bound(map_lanes, mins)
    C = map_lanes[0].shape[0]
    starts = jnp.clip(starts, 0, max(C - slab, 0))

    def one_batch(args):
        st_b = args[-1]
        q_b = args[:-1]

        def one_tile(st, *q_t):
            eq = None
            for ml, ql in zip(map_lanes, q_t):
                sl = jax.lax.dynamic_slice(ml, (st,), (slab,))
                e = ql[:, None] == sl[None, :]
                eq = e if eq is None else (eq & e)
            found = jnp.any(eq, axis=1)
            pos = jnp.argmax(eq, axis=1).astype(jnp.int32) + st
            return jnp.where(found & (pos < n_map), pos, -1)

        return jax.vmap(one_tile)(st_b, *q_b)

    rows = jax.lax.map(one_batch, (*qt, starts))
    return rows.reshape(B, Q)


@jax.jit
def _tile_key_bounds(q_tiles):
    """Per-tile lexicographic key min and max over the last axis.

    Padding (all-ones) keys are excluded from the MAX so a tile mixing
    valid probes with padding doesn't claim a span to the end of the map;
    they do participate in the min (they sort last, so the min is
    unaffected unless the whole tile is padding — whose probes all miss
    anyway).  Returns (min_lanes, max_lanes)."""
    pad = None
    for l in q_tiles:
        e = l == K.UMAX
        pad = e if pad is None else (pad & e)
    mins, maxs = [], []
    eq_min, eq_max = None, None
    for l in q_tiles:
        cand_min = l if eq_min is None else jnp.where(eq_min, l, K.UMAX)
        m = jnp.min(cand_min, axis=-1)
        e = cand_min == m[..., None]
        eq_min = e if eq_min is None else (eq_min & e)
        mins.append(m)

        nl = jnp.where(pad, jnp.uint32(0), l)
        cand_max = nl if eq_max is None else jnp.where(eq_max, nl, jnp.uint32(0))
        mx = jnp.max(cand_max, axis=-1)
        e2 = cand_max == mx[..., None]
        eq_max = e2 if eq_max is None else (eq_max & e2)
        maxs.append(mx)
    return tuple(mins), tuple(maxs)


@jax.jit
def find_lower_bound(map_lanes, q_lanes):
    """First index whose key is >= the query key (binary search)."""
    C = map_lanes[0].shape[0]
    steps = max(1, math.ceil(math.log2(C + 1)))
    lo_idx = jnp.zeros(q_lanes[0].shape, dtype=jnp.int32)
    hi_idx = jnp.full(q_lanes[0].shape, C, dtype=jnp.int32)

    def body(_, state):
        lo_i, hi_i = state
        mid = (lo_i + hi_i) >> 1
        less = K.key_less(_gather_lanes(map_lanes, mid), q_lanes)
        return jnp.where(less, mid + 1, lo_i), jnp.where(less, hi_i, mid)

    lo_idx, _ = jax.lax.fori_loop(0, steps, body, (lo_idx, hi_idx))
    return lo_idx


@jax.jit
def _tile_join_spans(map_lanes, n_map, q_tiles):
    """(B, nt) int32 span (window size) each query tile needs: lb(max) -
    lb(min) + 1, clamped at 0 for all-padding tiles."""
    mins, maxs = _tile_key_bounds(q_tiles)
    lo_b = find_lower_bound(map_lanes, mins)
    hi_b = find_lower_bound(map_lanes, maxs)
    return jnp.maximum(hi_b - lo_b + 1, 0)


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


def find_rows_sorted(map_lanes, n_map, q_lanes, stats=None):
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
    B, Q = q_lanes[0].shape
    C = map_lanes[0].shape[0]
    if Q % TILE != 0 or C < TILE:
        if stats is not None:
            stats["join_slab"] = 0  # 0 = binary-search fallback (no slab)
        return find_rows(map_lanes, n_map, q_lanes)
    nt = Q // TILE
    qt = tuple(l.reshape(B, nt, TILE) for l in q_lanes)
    spans = _tile_join_spans(map_lanes, n_map, qt)
    span = int(jnp.max(spans))  # host sync (sync/deferred path only)
    slab = join_slab_for_span(span, C)
    if stats is not None:
        stats["join_slab"] = slab
        stats["join_span"] = span
        stats["join_capacity"] = C
    if slab > _MAX_JOIN_SLAB:
        return find_rows(map_lanes, n_map, q_lanes)
    return _find_rows_tile_join_impl(map_lanes, n_map, q_lanes, slab)


def find_rows_sorted_fixed(map_lanes, n_map, q_lanes, slab: int):
    """Traceable ``find_rows_sorted`` at a KNOWN (ratcheted-floor) join
    slab — zero host syncs.  Returns (rows, ok) where ``ok`` is a device
    bool asserting the true span fit the slab (results are exact iff ok)."""
    TILE = _JOIN_TILE
    B, Q = q_lanes[0].shape
    C = map_lanes[0].shape[0]
    if slab == 0 or Q % TILE != 0 or C < TILE or slab > _MAX_JOIN_SLAB:
        rows = find_rows(map_lanes, n_map, q_lanes)
        return rows, jnp.asarray(True)
    nt = Q // TILE
    qt = tuple(l.reshape(B, nt, TILE) for l in q_lanes)
    slab = min(int(slab), C)
    ok = jnp.max(_tile_join_spans(map_lanes, n_map, qt)) <= jnp.int32(slab)
    rows = _find_rows_tile_join_impl(map_lanes, n_map, q_lanes, slab)
    return rows, ok


@jax.jit
def find_coordinates(map_lanes, n_map, query_coords, n_query):
    """Find raw (Q, D+1) int32 query coordinates in the map.

    Queries at rows >= n_query, or with out-of-budget fields, return -1.
    """
    q_lanes = K.pack(query_coords)
    rows = find_rows(map_lanes, n_map, q_lanes)
    q_idx = jnp.arange(query_coords.shape[0], dtype=jnp.int32)
    bad = K.overflow_mask(query_coords)
    return jnp.where((q_idx < n_query) & ~bad, rows, -1)
