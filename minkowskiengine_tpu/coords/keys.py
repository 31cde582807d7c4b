"""Coordinate → packed-key encoding for the TPU coordinate engine.

The reference engine hashes raw ``(batch, x_1..x_D)`` int32 rows with
MurmurHash3 into CPU/GPU hash tables (reference: src/coordinate.hpp:276-349,
src/coordinate_map_cpu.hpp:295-300, src/3rdparty/concurrent_unordered_map.cuh).
Hash tables are a poor fit for XLA's static-shape, vector-parallel model, so
the TPU-native design instead packs each coordinate row **losslessly** into a
W-bit key held as a tuple of uint32 lanes (most-significant lane first):

* packing is injective and defines the engine's **canonical row order**:
  batch index in the most-significant bits (so maps stay batch-major, which
  batch decomposition and origin maps exploit), then the spatial coordinate
  bits (lexicographic by default; see ``_ORDER``);
* uniqueness/lookup become `lax.sort` + vectorized binary search, both of
  which XLA maps efficiently onto the VPU (no serialization, no atomics);
* uint32 lanes avoid depending on global ``jax_enable_x64``; two lanes
  (64 bits) cover D <= 6, three lanes (96 bits) cover 7 <= D <= 13, and
  beyond that the lane count grows with D (>= 12 bits per spatial dim) —
  the multi-word path the reference handles with arbitrary-width row
  hashing, without a dimension cap.

Bit budget: the batch index gets ``batch_bits`` and each of the D spatial
dims gets ``dim_bits`` with ``batch_bits + D*dim_bits <= 32*n_lanes``.
Spatial coordinates are signed and biased by ``2**(dim_bits-1)``.  Defaults
give 16-bit coords for D<=3 (range ±32768, far beyond any practical voxel
grid) and degrade gracefully for higher D (4D spatio-temporal: ±4096;
D=7: ±1024; D=13: ±32; D>13 keeps >= ±2048 by adding lanes).
Out-of-range coordinates are detected at insert
time (see ``overflow_mask``) and raise on the host rather than corrupting
keys.

Nothing outside this module may assume WHICH total order the key encodes —
only that it is a fixed total order with the batch index major, exposed as
a lane tuple compared lexicographically.  (The slab machinery measures
spans; lookups are binary searches or grid probes; the tile-join computes
per-tile key bounds explicitly.)
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

UMAX = np.uint32(0xFFFFFFFF)

# Canonical spatial order: "lex" (default) or "morton".  Read once at
# import (jit caches trace ``pack`` — flipping mid-process would resurrect
# stale executables); the env knob exists for span-measurement diagnostics.
# Everything is correct under either order.  Morton was MEASURED (r3) and
# rejected as the default: under the slab kernel's per-tile max-window
# semantics it is strictly worse — uniform-26k per-(offset,tile) span
# p50 1448 / p99 12543 vs lex 240 / 293, surface-room-scan p50 6047 vs 255
# — because ~1/3 of a Morton block's cells sit on block boundaries whose
# spatial neighbors live across large rank jumps.  Lex order's surface
# problem is only its span TAIL (p99 527, max 3108), which the slab
# builder handles with outlier-tolerant windows + a sparse correction
# pass (ops/pallas/conv_kernel.py) instead of an order change.
import os as _os

_ORDER = _os.environ.get("ME_KEY_ORDER", "lex")


@functools.lru_cache(maxsize=None)
def n_lanes(dimension: int) -> int:
    """uint32 lanes per key: 2 (64-bit) for D <= 6, 3 (96-bit) for
    D <= 13, then however many keep >= 12 bits per spatial dim — the
    reference hashes arbitrary-D rows (src/coordinate.hpp:276-349), so
    the lane budget must not cap D either."""
    if dimension <= 6:
        return 2
    if dimension <= 13:
        return 3
    return -(-(16 + 12 * dimension) // 32)


@functools.lru_cache(maxsize=None)
def bit_allocation(dimension: int) -> Tuple[int, ...]:
    """Per-field bit widths ``(batch_bits, dim_bits * D)`` for D dims.

    Total is always <= 32*n_lanes(D).  D <= 6 keeps the historical 64-bit
    allocations; 7 <= D <= 13 uses the 96-bit three-lane budget.  Raises
    beyond D=13 (fewer than 6 bits per dim).
    """
    if dimension < 1:
        raise ValueError(f"dimension must be >= 1, got {dimension}")
    if dimension <= 3:
        batch_bits = 16
        dim_bits = 16
    elif dimension <= 6:
        batch_bits = 12
        dim_bits = (64 - batch_bits) // dimension
    elif dimension <= 13:
        batch_bits = 16
        dim_bits = (96 - batch_bits) // dimension
    else:
        # arbitrary D: n_lanes() grew the budget, so dim_bits >= 12
        batch_bits = 16
        dim_bits = (32 * n_lanes(dimension) - batch_bits) // dimension
    assert dim_bits >= 6, (dimension, dim_bits)
    return (batch_bits,) + (dim_bits,) * dimension


def field_ranges(dimension: int) -> Tuple[Tuple[int, int], ...]:
    """Valid [lo, hi] inclusive range per field (batch, then spatial dims)."""
    bits = bit_allocation(dimension)
    out = [(0, 2 ** bits[0] - 1)]
    for b in bits[1:]:
        bias = 2 ** (b - 1)
        out.append((-bias, bias - 1))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _spread_steps(n_bits: int, stride: int) -> Tuple[Tuple[int, int], ...]:
    """(shift, mask32) doubling steps that spread the ``n_bits`` LSBs of a
    uint32 to positions ``i*stride`` (the classic part1byN magic numbers,
    generated for any stride/width with ``(n_bits-1)*stride < 32``)."""
    if stride == 1 or n_bits <= 1:
        return ()
    assert (n_bits - 1) * stride < 32
    steps = []
    s = 1
    while s < n_bits:
        s <<= 1
    while s > 1:
        s >>= 1
        mask = 0
        g = 0
        while g * s < n_bits:
            mask |= ((1 << s) - 1) << (g * s * stride)
            g += 1
        steps.append((s * (stride - 1), mask & 0xFFFFFFFF))
    return tuple(steps)


def _spread(v: jnp.ndarray, n_bits: int, stride: int) -> jnp.ndarray:
    """Bit-spread a uint32 array (overflowed shift bits drop — equivalent to
    masking, since every kept position is < 32 by construction)."""
    for shift, mask in _spread_steps(n_bits, stride):
        v = (v | (v << jnp.uint32(shift))) & jnp.uint32(mask)
    return v


def _or_at(lanes: list, v, pos: int, width: int) -> None:
    """OR a ``width``-bit uint32 field into the lane list at bit ``pos``
    (positions count from the LSB of the whole W-bit key; lanes[0] is the
    most significant lane)."""
    L = len(lanes)
    for li in range(L):
        lane_lsb = 32 * (L - 1 - li)
        if pos + width <= lane_lsb or pos >= lane_lsb + 32:
            continue
        if pos >= lane_lsb:
            lanes[li] = lanes[li] | (v << jnp.uint32(pos - lane_lsb))
        else:
            lanes[li] = lanes[li] | (v >> jnp.uint32(lane_lsb - pos))


def pack(coords: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Pack int32 ``(N, D+1)`` batch-first coordinates into a tuple of
    uint32 lane arrays (most significant first; 2 lanes for D <= 6).

    Canonical layouts (see ``_ORDER``), both with the batch field above
    all spatial bits.  Valid keys never reach the all-ones padding
    sentinel (total bits < W, or the maximal tuple is rejected by
    ``overflow_mask`` at exactly W).  Injective over valid ranges.
    Traceable / jit-friendly.
    """
    n_fields = coords.shape[-1]
    D = n_fields - 1
    bits = bit_allocation(D)
    L = n_lanes(D)
    W = 32 * L

    lanes = [
        jnp.zeros(coords.shape[:-1], dtype=jnp.uint32) for _ in range(L)
    ]

    if _ORDER == "lex":
        # top-aligned: batch at the very top, unused LOW bits stay 0
        total = sum(bits)
        pos = total
        for f in range(n_fields):
            b = bits[f]
            pos -= b
            bias = 0 if f == 0 else 2 ** (b - 1)
            v = (coords[..., f] + bias).astype(jnp.uint32) & jnp.uint32(
                2**b - 1
            )
            _or_at(lanes, v, pos + (W - total), b)
        return tuple(lanes)

    # Morton: spatial bit i of dim d at position i*D + (D-1-d) (bottom-
    # aligned), batch field at D*b and up.
    b = bits[1]  # per-dim spatial bits (uniform by construction)
    for d in range(D):
        p = D - 1 - d  # earlier dims more significant within each group
        bias = 2 ** (b - 1)
        v = (coords[..., d + 1] + bias).astype(jnp.uint32) & jnp.uint32(
            2**b - 1
        )
        # split the value into per-lane segments of interleaved bits
        i0 = 0
        while i0 < b:
            lane_lsb = ((i0 * D + p) // 32) * 32
            # bits i with lane_lsb <= i*D + p < lane_lsb + 32
            i1 = min(b, (lane_lsb + 32 - p + D - 1) // D)
            seg = (v >> jnp.uint32(i0)) & jnp.uint32(2 ** (i1 - i0) - 1)
            _or_at(
                lanes,
                _spread(seg, i1 - i0, D),
                i0 * D + p,
                (i1 - i0 - 1) * D + 1,
            )
            i0 = i1
    vb = coords[..., 0].astype(jnp.uint32) & jnp.uint32(2 ** bits[0] - 1)
    _or_at(lanes, vb, D * b, bits[0])
    return tuple(lanes)


def overflow_mask(coords: jnp.ndarray) -> jnp.ndarray:
    """Boolean ``(N,)`` mask of rows whose fields exceed the bit budget."""
    n_fields = coords.shape[-1]
    D = n_fields - 1
    ranges = field_ranges(D)
    bad = jnp.zeros(coords.shape[:-1], dtype=bool)
    for f, (lo_v, hi_v) in enumerate(ranges):
        c = coords[..., f]
        bad = bad | (c < lo_v) | (c > hi_v)
    if sum(bit_allocation(D)) == 32 * n_lanes(D):
        # With a full lane budget the single maximal tuple packs to
        # all-ones == the key_max() padding sentinel; reject it so a real
        # row can never be mistaken for padding.
        is_max = jnp.ones(coords.shape[:-1], dtype=bool)
        for f, (_, hi_v) in enumerate(ranges):
            is_max = is_max & (coords[..., f] == hi_v)
        bad = bad | is_max
    return bad


def key_max(lanes: int = 2) -> Tuple[np.uint32, ...]:
    """The padding key — sorts after every valid key (valid keys leave
    headroom below all-ones: unused bits, or the maximal tuple rejected by
    ``overflow_mask`` at a full budget)."""
    return (UMAX,) * lanes


def key_less(a, b):
    """Lexicographic compare of two equal-length lane tuples (a < b)."""
    if len(a) == 4:  # legacy (a_hi, a_lo, b_hi, b_lo) positional call
        raise TypeError("key_less now takes two lane tuples")
    out = a[-1] < b[-1]
    for al, bl in zip(reversed(a[:-1]), reversed(b[:-1])):
        out = (al < bl) | ((al == bl) & out)
    return out


def key_equal(a, b):
    out = None
    for al, bl in zip(a, b):
        eq = al == bl
        out = eq if out is None else (out & eq)
    return out
