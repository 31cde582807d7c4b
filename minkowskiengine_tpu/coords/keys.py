"""Coordinate → 64-bit key packing for the TPU coordinate engine.

The reference engine hashes raw ``(batch, x_1..x_D)`` int32 rows with
MurmurHash3 into CPU/GPU hash tables (reference: src/coordinate.hpp:276-349,
src/coordinate_map_cpu.hpp:295-300, src/3rdparty/concurrent_unordered_map.cuh).
Hash tables are a poor fit for XLA's static-shape, vector-parallel model, so
the TPU-native design instead packs each coordinate row **losslessly** into a
64-bit key held as two uint32 lanes ``(hi, lo)``:

* packing is injective and defines the engine's **canonical row order**:
  batch index in the most-significant bits (so maps stay batch-major, which
  batch decomposition and origin maps exploit), then the spatial coordinate
  bits **Morton/Z-order interleaved** — spatially close voxels get close
  keys, so a run of consecutive map rows is a compact spatial block.  That
  locality is what keeps the Pallas conv kernel's tile slabs small on
  *surface* geometry (real room scans), where plain lexicographic order has
  spans of thousands of rows;
* uniqueness/lookup become `lax.sort` + vectorized binary search, both of
  which XLA maps efficiently onto the VPU (no serialization, no atomics);
* two uint32 lanes avoid depending on global ``jax_enable_x64``.

Bit budget: the batch index gets ``batch_bits`` and each of the D spatial
dims gets ``dim_bits`` with ``batch_bits + D*dim_bits <= 64``.  Spatial
coordinates are signed and biased by ``2**(dim_bits-1)``.  Defaults give
16-bit coords for D<=3 (range ±32768, far beyond any practical voxel grid)
and degrade gracefully for higher D (4D spatio-temporal: ±4096).
Out-of-range coordinates are detected at insert time (see
``overflow_mask``) and raise on the host rather than corrupting keys.

Nothing outside this module may assume WHICH total order the key encodes —
only that it is a fixed total order with the batch index major.  (The slab
machinery measures spans; lookups are binary searches or grid probes; the
tile-join computes per-tile key bounds explicitly.)
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
def bit_allocation(dimension: int) -> Tuple[int, ...]:
    """Per-field bit widths ``(batch_bits, dim_bits * D)`` for D dims.

    Total is always <= 64.  Raises for dimensions that would leave fewer
    than 8 bits per spatial dim (D > 6); such high-D workloads need the
    (future) multi-word key path.
    """
    if dimension < 1:
        raise ValueError(f"dimension must be >= 1, got {dimension}")
    if dimension <= 3:
        batch_bits = 16
        dim_bits = 16
    else:
        batch_bits = 12
        dim_bits = (64 - batch_bits) // dimension
    if dim_bits < 8:
        raise NotImplementedError(
            f"dimension={dimension} leaves only {dim_bits} bits per "
            "coordinate; >6-D coordinate spaces are not supported yet"
        )
    return (batch_bits,) + (dim_bits,) * dimension


def field_ranges(dimension: int) -> Tuple[Tuple[int, int], ...]:
    """Valid [lo, hi] inclusive range per field (batch, then spatial dims)."""
    bits = bit_allocation(dimension)
    out = [(0, 2 ** bits[0] - 1)]
    for b in bits[1:]:
        bias = 2 ** (b - 1)
        out.append((-bias, bias - 1))
    return tuple(out)


def _field_positions(bits: Sequence[int]) -> Tuple[int, ...]:
    """LSB bit position of each field inside the 64-bit key (batch is MSB).
    Lex layout only (top-aligned so unused LOW bits are 0)."""
    total = sum(bits)
    pos = []
    acc = total
    for b in bits:
        acc -= b
        pos.append(acc + (64 - total))
    return tuple(pos)


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


def _or_field(hi, lo, v, pos: int, width: int):
    """OR a ``width``-bit uint32 field into the (hi, lo) key at bit ``pos``."""
    if pos >= 32:
        hi = hi | (v << jnp.uint32(pos - 32))
    else:
        lo = lo | (v << jnp.uint32(pos))
        if width + pos > 32:  # straddles the lane boundary
            hi = hi | (v >> jnp.uint32(32 - pos))
    return hi, lo


def pack(coords: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack int32 ``(N, D+1)`` batch-first coordinates into uint32 (hi, lo).

    Canonical (Morton) layout, bottom-aligned: spatial bit ``i`` of dim
    ``d`` at position ``i*D + (D-1-d)``; the batch field at ``D*b`` and up.
    Valid keys never reach the all-ones padding sentinel (total bits < 64,
    or the maximal tuple is rejected by ``overflow_mask`` at exactly 64).
    Injective over valid ranges.  Traceable / jit-friendly.
    """
    n_fields = coords.shape[-1]
    D = n_fields - 1
    bits = bit_allocation(D)

    hi = jnp.zeros(coords.shape[:-1], dtype=jnp.uint32)
    lo = jnp.zeros(coords.shape[:-1], dtype=jnp.uint32)

    if _ORDER == "lex":
        positions = _field_positions(bits)
        for f in range(n_fields):
            b, p = bits[f], positions[f]
            bias = 0 if f == 0 else 2 ** (b - 1)
            v = (coords[..., f] + bias).astype(jnp.uint32) & jnp.uint32(
                2**b - 1
            )
            hi, lo = _or_field(hi, lo, v, p, b)
        return hi, lo

    b = bits[1]  # per-dim spatial bits (uniform by construction)
    for d in range(D):
        p = D - 1 - d  # earlier dims more significant within each group
        bias = 2 ** (b - 1)
        v = (coords[..., d + 1] + bias).astype(jnp.uint32) & jnp.uint32(
            2**b - 1
        )
        # bits landing below the lane boundary: i*D + p < 32
        n_lo = min(b, (32 - p + D - 1) // D)
        lo = lo | (_spread(v & jnp.uint32(2**n_lo - 1), n_lo, D) << jnp.uint32(p))
        if n_lo < b:
            hi = hi | (
                _spread(v >> jnp.uint32(n_lo), b - n_lo, D)
                << jnp.uint32(n_lo * D + p - 32)
            )
    vb = coords[..., 0].astype(jnp.uint32) & jnp.uint32(2 ** bits[0] - 1)
    return _or_field(hi, lo, vb, D * b, bits[0])


def overflow_mask(coords: jnp.ndarray) -> jnp.ndarray:
    """Boolean ``(N,)`` mask of rows whose fields exceed the bit budget."""
    n_fields = coords.shape[-1]
    ranges = field_ranges(n_fields - 1)
    bad = jnp.zeros(coords.shape[:-1], dtype=bool)
    for f, (lo_v, hi_v) in enumerate(ranges):
        c = coords[..., f]
        bad = bad | (c < lo_v) | (c > hi_v)
    if sum(bit_allocation(n_fields - 1)) == 64:
        # With a full 64-bit budget the single maximal tuple packs to
        # all-ones == the key_max() padding sentinel; reject it so a real
        # row can never be mistaken for padding.
        is_max = jnp.ones(coords.shape[:-1], dtype=bool)
        for f, (_, hi_v) in enumerate(ranges):
            is_max = is_max & (coords[..., f] == hi_v)
        bad = bad | is_max
    return bad


def key_max() -> Tuple[np.uint32, np.uint32]:
    """The padding key — sorts after every valid key (valid keys leave the
    unused HIGH bits zero when the budget is under 64; at exactly 64 bits
    the single all-ones tuple is rejected by ``overflow_mask``)."""
    return UMAX, UMAX


def key_less(a_hi, a_lo, b_hi, b_lo):
    """Lexicographic uint64 compare on (hi, lo) lanes."""
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))


def key_equal(a_hi, a_lo, b_hi, b_lo):
    return (a_hi == b_hi) & (a_lo == b_lo)
