"""Coordinate → 64-bit key packing for the TPU coordinate engine.

The reference engine hashes raw ``(batch, x_1..x_D)`` int32 rows with
MurmurHash3 into CPU/GPU hash tables (reference: src/coordinate.hpp:276-349,
src/coordinate_map_cpu.hpp:295-300, src/3rdparty/concurrent_unordered_map.cuh).
Hash tables are a poor fit for XLA's static-shape, vector-parallel model, so
the TPU-native design instead packs each coordinate row **losslessly** into a
64-bit key held as two uint32 lanes ``(hi, lo)``:

* packing is order-preserving: ``key(a) < key(b)`` iff ``(b, x_1..x_D)``
  compares lexicographically — so a key-sorted coordinate map is also sorted
  by (batch, coords), which batch-decomposition and origin maps exploit;
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
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

UMAX = np.uint32(0xFFFFFFFF)


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
    """LSB bit position of each field inside the 64-bit key (batch is MSB)."""
    total = sum(bits)
    pos = []
    acc = total
    for b in bits:
        acc -= b
        pos.append(acc + (64 - total))  # top-align so unused LOW bits are 0
    return tuple(pos)


def pack(coords: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack int32 ``(N, D+1)`` batch-first coordinates into uint32 (hi, lo).

    Order-preserving over valid ranges.  Traceable / jit-friendly.
    """
    n_fields = coords.shape[-1]
    bits = bit_allocation(n_fields - 1)
    positions = _field_positions(bits)

    hi = jnp.zeros(coords.shape[:-1], dtype=jnp.uint32)
    lo = jnp.zeros(coords.shape[:-1], dtype=jnp.uint32)
    for f in range(n_fields):
        b, p = bits[f], positions[f]
        bias = 0 if f == 0 else 2 ** (b - 1)
        v = (coords[..., f] + bias).astype(jnp.uint32) & jnp.uint32(2**b - 1)
        if p >= 32:
            hi = hi | (v << jnp.uint32(p - 32))
        else:
            lo = lo | (v << jnp.uint32(p))
            if b + p > 32:  # field straddles the 32-bit lane boundary
                hi = hi | (v >> jnp.uint32(32 - p))
    return hi, lo


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
    """The padding key — sorts after every valid key (valid keys keep the
    unused low bits zero unless the budget is exactly 64; correctness does
    not rely on it, only ordering of padding rows does)."""
    return UMAX, UMAX


def key_less(a_hi, a_lo, b_hi, b_lo):
    """Lexicographic uint64 compare on (hi, lo) lanes."""
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))


def key_equal(a_hi, a_lo, b_hi, b_lo):
    return (a_hi == b_hi) & (a_lo == b_lo)
