"""Fused Pallas sparse-convolution kernel: slab-DMA + one-hot MXU gather.

Why this shape: XLA lowers row gathers (`jnp.take`) to fine-grained DMAs —
~30 ms for the 884k-row gather of a 27-offset kernel map regardless of
channel width (measured on v5e), 50–1000× off roofline.  The TPU-native fix
exploits a structural invariant of this engine's kernel maps:

  * coordinate maps are stored in canonical Morton (Z-order) key order
    (coords/keys.py): consecutive rows are spatially local, and a kernel
    offset only reaches bounded spatial neighbors, so **the gather indices
    of a T-row output tile cluster in a small window of input rows**;
  * hence the inputs needed by a T-row output tile live in a contiguous
    slab of a few×T input rows — on surfaces as well as volumes (under the
    old lexicographic order, surface-scan slabs exploded to thousands of
    rows because a row-major walk has no 2-D locality).

The kernel therefore runs, per (output-tile, offset) grid step:

  1. one large async DMA of the slab ``feats[start : start+S]`` HBM→VMEM
     (instead of T row-gathers),
  2. an on-the-fly transposed one-hot matrix
     ``Pᵀ[j, i] = (local_idx[i] == j)`` and ``Pᵀ ⊙ slab`` contraction on the
     MXU — the gather *is* a matmul,
  3. ``(P @ slab) @ W[k]`` accumulated into a VMEM tile, written once per
     output tile.

Replaces the reference's im2col/cuBLAS and fused atomic-scatter CUDA kernels
(reference: src/convolution_kernel.cu:114-494) with a scatter-free design.

Slab metadata (starts / local indices / slab size S) is computed once per
kernel map at coordinate-phase time and cached (see ``build_slab_map``).
Two layouts of the local indices are kept so that each kernel's index block
is revisited (stays resident in VMEM) across its inner grid dimension.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 256
MAX_W_VMEM_BYTES = 8 * 1024 * 1024


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SlabMap:
    """Tile-slab decomposition of a dense kernel map direction.

    Attributes:
      starts: (K, nt) int32 — first input row of each (offset, tile) slab,
        clamped to [0, C_in - S]; empty (offset, tile) pairs point at the
        tile's union start (their local indices are all S, so the slab
        contents are never read).
      local_tk: (nt, K, T) int32 — slab-relative input row per output row,
        or S (⇒ gathers a zero row); tile-major so each grid step loads one
        (K, T) block that stays resident across the inner offset loop.
      u_starts: (nt,) int32 — per-tile UNION slab start: the union slab
        ``feats[u : u + U]`` covers every offset's window
        ``[starts[k,t], starts[k,t] + S)`` for the tile, so one DMA per
        tile replaces K per-offset DMAs (the kernel was ~70% HBM-bound on
        slab traffic; offsets' slabs overlap almost entirely).
      slab_size: static int S (multiple of 16, ≥ the chosen span rung; NOT
        necessarily ≥ the max span — valid pairs outside their window are
        carried in the outlier list and applied by an XLA correction pass).
      union_size: static int U (multiple of 16, ≥ union span), or 0 when
        the union mode is disabled (union spans over budget — e.g. surface
        scans whose per-plane row runs are huge).  Derived deterministically
        from (S, extra_rung) so ratcheted floors stay self-consistent.
      extra_rung: static quantized union-extra rung (the floor the geometry
        replayer ratchets; U = union rung of extra_rung + S + 16).
      tile: static int T.
      capacity_in: input-buffer capacity the starts were clamped against.
      ov_src / ov_dst / ov_k: optional (P,) int32 outlier pair lists —
        valid (offset, src_row, dst_row) matches whose slab-local index
        falls outside [0, S); the Pallas kernel gathers zero for them and
        an XLA correction pass (ops/functional.py) adds their
        contributions.  Padding entries hold -1.  This decouples the
        static slab size from the span MAX: surface scans have span
        p99 ≈ 2×tile but max ≈ 3k+ (rare scanline wraps), so sizing S at
        the tail percentile and correcting a few thousand pairs runs the
        slab kernel ~6× faster than max-sized slabs.
      ov_count: optional () int32 device count of true outliers (validity:
        exact iff ov_count <= P; checked by traced_ok / the sync builder).
    """

    starts: jnp.ndarray
    local_tk: jnp.ndarray
    u_starts: jnp.ndarray
    slab_size: int
    union_size: int
    extra_rung: int
    tile: int
    capacity_in: int
    ov_src: Optional[jnp.ndarray] = None
    ov_dst: Optional[jnp.ndarray] = None
    ov_k: Optional[jnp.ndarray] = None
    ov_count: Optional[jnp.ndarray] = None

    @property
    def ov_cap(self) -> int:
        return 0 if self.ov_src is None else int(self.ov_src.shape[0])

    def tree_flatten(self):
        # extra_rung deliberately NOT in aux: it is builder bookkeeping (the
        # floor the replayer ratchets) and can grow without changing any
        # compiled shape — including it would retrace jits for nothing.
        return (
            self.starts,
            self.local_tk,
            self.u_starts,
            self.ov_src,
            self.ov_dst,
            self.ov_k,
            self.ov_count,
        ), (
            self.slab_size,
            self.union_size,
            self.tile,
            self.capacity_in,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        starts, local_tk, u_starts, ov_src, ov_dst, ov_k, ov_count = children
        slab_size, union_size, tile, capacity_in = aux
        return cls(
            starts, local_tk, u_starts, slab_size, union_size, 0, tile,
            capacity_in, ov_src, ov_dst, ov_k, ov_count,
        )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_RING_VMEM_BUDGET = 6 * 1024 * 1024


def _ring_depth(slab: int, cin: int, num_k: int) -> int:
    """In-flight slab DMA count: deep enough to hide issue latency, bounded
    by a VMEM budget and the offset count."""
    per = slab * cin * 4
    return max(2, min(8, num_k, _RING_VMEM_BUDGET // max(per, 1)))


def _slab_starts(idx, valid, cap_in, slab_size):
    """(K, nt) 16-aligned per-(offset, tile) slab starts — the ONE place
    the start rule lives (metadata, outlier extraction and span/outlier
    measurement must agree bit-for-bit)."""
    big = jnp.where(valid, idx, jnp.int32(2**30))
    start = jnp.min(big, axis=-1)  # (K, nt); 2**30 if (offset, tile) empty
    # empty (offset, tile) pairs park at the tile's min valid start (their
    # local indices are all S): keeps the per-tile union span tight instead
    # of dragging it to row 0
    tile_min = jnp.min(start, axis=0)  # (nt,)
    tile_min = jnp.where(tile_min == 2**30, 0, tile_min)
    start = jnp.where(start == 2**30, tile_min[None, :], start)
    start = (start // 16) * 16  # sublane-aligned DMA slices (16 covers bf16)
    return jnp.clip(start, 0, max(cap_in - slab_size, 0))


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _slab_metadata(in_idx, cap_in, tile, slab_size, union_size=0):
    """Compute (starts, local_tk, u_starts) for static slab/union sizes."""
    K, Co = in_idx.shape
    nt = Co // tile
    idx = in_idx.reshape(K, nt, tile)
    valid = idx >= 0
    start = _slab_starts(idx, valid, cap_in, slab_size)
    u = jnp.min(start, axis=0)
    u = jnp.clip(u, 0, max(cap_in - union_size, 0))
    local = jnp.where(valid, idx - start[:, :, None], slab_size)
    # anything that still falls outside [0, S) gathers zero (the dropped
    # pairs are exactly the outlier list — see _extract_outliers)
    local = jnp.where((local < 0) | (local > slab_size), slab_size, local)
    local = local.astype(jnp.int32)
    return (
        start.astype(jnp.int32),
        jnp.transpose(local, (1, 0, 2)),
        u.astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _extract_outliers(in_idx, cap_in, tile, slab_size, cap):
    """Compact the valid pairs whose slab-local index falls outside
    [0, slab_size) into (src, dst, k) lists of static capacity ``cap``.

    Returns (ov_src, ov_dst, ov_k, count); padding entries are -1.  Exact
    iff count <= cap (extras beyond capacity are silently truncated — the
    caller checks the count and re-rungs / falls back when violated).
    """
    K, Co = in_idx.shape
    nt = Co // tile
    idx = in_idx.reshape(K, nt, tile)
    valid = idx >= 0
    start = _slab_starts(idx, valid, cap_in, slab_size)
    local = idx - start[:, :, None]
    out_mask = valid & ((local < 0) | (local >= slab_size))  # (K, nt, tile)
    flat_mask = out_mask.reshape(-1)
    pos = jnp.cumsum(flat_mask.astype(jnp.int32)) - 1
    tgt = jnp.where(flat_mask, pos, cap)  # cap ⇒ dropped
    src = idx.reshape(-1)
    dst = jnp.broadcast_to(
        jnp.arange(Co, dtype=jnp.int32).reshape(1, nt, tile), idx.shape
    ).reshape(-1)
    kk = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[:, None, None], idx.shape
    ).reshape(-1)
    fill = jnp.full((cap,), -1, jnp.int32)
    ov_src = fill.at[tgt].set(src, mode="drop")
    ov_dst = fill.at[tgt].set(dst, mode="drop")
    ov_k = fill.at[tgt].set(kk, mode="drop")
    return ov_src, ov_dst, ov_k, jnp.sum(flat_mask.astype(jnp.int32))


def slab_tile(capacity: int, tile: int = DEFAULT_TILE) -> int:
    return min(tile, capacity)


def slab_ladder(tile: int) -> tuple:
    """The static slab-size quantization rungs (fractions of the tile —
    shape stability: every new slab size is a fresh Mosaic compile)."""
    return tuple(
        _round_up(int(tile * m), 16) for m in (1.25, 1.5, 2.0, 3.0, 4.0)
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def measure_spans(
    in_idx: jnp.ndarray, tile: int, cap_in: int = 0, ladder: tuple = ()
) -> jnp.ndarray:
    """(3 + len(ladder),) int32 device vector
    ``[max span, max union extra, total valid pairs, outliers@rung...]`` —
    no sync here so callers can fuse several measurements into one host
    round trip.  With an empty ladder only the first three land.

    ``union extra`` = spread of the per-offset slab starts within a tile;
    the per-tile union slab needs ``extra + span (+16 alignment)`` rows.
    ``outliers@rung`` = valid pairs whose slab-local index would fall
    outside a window of that ladder size (bit-matched to
    ``_extract_outliers`` — same aligned-start rule).
    """
    K, Co = in_idx.shape
    idx = in_idx.reshape(K, -1, tile)
    valid = idx >= 0
    big = jnp.where(valid, idx, jnp.int32(2**30))
    small = jnp.where(valid, idx, jnp.int32(-1))
    start = jnp.min(big, axis=-1)  # (K, nt)
    span = jnp.max(
        jnp.where(
            jnp.any(valid, -1),
            jnp.max(small, -1) - start + 1,
            0,
        )
    )
    any_valid = start < 2**30
    tmax = jnp.max(jnp.where(any_valid, start, jnp.int32(-1)), axis=0)
    tmin = jnp.min(start, axis=0)
    extra = jnp.where(tmax >= 0, tmax - jnp.minimum(tmin, tmax), 0)
    total = jnp.sum(valid.astype(jnp.int32))
    out = [span, jnp.max(extra), total]
    for S in ladder:
        st = _slab_starts(idx, valid, cap_in, S)
        local = idx - st[:, :, None]
        miss = valid & ((local < 0) | (local >= S))
        out.append(jnp.sum(miss.astype(jnp.int32)))
    return jnp.stack(out)


# Union slabs get a larger VMEM allowance than the ring (one double buffer
# vs a deep ring): surface scans need U ≈ 7k (per-offset start spread spans
# a z-plane of rows), which pays for itself — the union DMA moves ~2× less
# HBM than 27 per-offset ring DMAs.  _union_enabled still gates on the
# actual (padded) channel width at call time.
_UNION_VMEM_BUDGET = 10 * 1024 * 1024
_MAX_UNION = 8192  # beyond this, per-tile union DMAs stop paying for VMEM


def _union_rung(needed: int, capacity_in: int) -> int:
    """Union-slab ladder: 512-multiples, whole-buffer when close to the
    capacity, 0 (disabled) when over budget."""
    u = _round_up(max(int(needed), 1), 512)
    if u >= capacity_in:
        return capacity_in  # whole-buffer DMA per tile: always valid
    if u > _MAX_UNION:
        return 0
    return u


def _floor3(f):
    """Normalize a slab floor to (S, E, P) — legacy (S, E) floors get P=0."""
    if f is None:
        return None
    return (int(f[0]), int(f[1]), int(f[2]) if len(f) > 2 else 0)


def merge_slab_floor(prev, new):
    """Ratchet-merge two (S, E, P) floors (slab rung, union-extra rung,
    outlier capacity).

    All components are max-monotone; the union size U is DERIVED from
    (S, E) at build time (``_union_rung(E + S + 16)``), which keeps U
    consistent when S and E ratchet on different clouds, and makes
    union-disable (U would exceed the budget) sticky automatically —
    E only grows."""
    new = _floor3(new)
    if prev is None:
        return new
    prev = _floor3(prev)
    return tuple(max(a, b) for a, b in zip(prev, new))


_MAX_OUTLIERS = 16384
_OUTLIER_FRAC = 0.01
_MIN_OV_CAP = 256


def _outlier_budget(total_pairs: int) -> int:
    """Largest outlier count worth trading for a smaller slab rung: a
    bounded fraction of all pairs (the correction pass costs
    K·P·Cin·Cout MXU FLOPs) with an absolute cap."""
    return int(min(_MAX_OUTLIERS, max(1024, _OUTLIER_FRAC * total_pairs)))


def _ov_rung(count: int) -> int:
    """Static outlier-list capacity rung (pow2, floor 256)."""
    if count <= 0:
        return 0
    cap = _MIN_OV_CAP
    while cap < count:
        cap <<= 1
    return cap


def build_slab_map_from_span(
    in_idx: jnp.ndarray,
    capacity_in: int,
    max_span: int,
    tile: int = DEFAULT_TILE,
    min_slab=None,
    union_extra: int = 0,
    outlier_counts=None,
    total_pairs: int = 0,
) -> Optional[SlabMap]:
    """Slab decomposition given host-known span measurements.

    ``min_slab`` is an optional (S, E, P) shape-stability floor (slab rung,
    union-extra rung, outlier capacity; ratcheted by the geometry
    replayer): reusing the largest rungs seen so far keeps the kernel
    shape — and therefore the compiled step — stable across geometry
    jitter.  ``union_extra`` is the measured per-tile spread of the slab
    starts (measure_spans[1]); the per-tile union slab needs
    ``extra + S + 16`` rows.  ``outlier_counts`` (host ints, one per
    ``slab_ladder(tile)`` rung, measure_spans[3:]) unlock outlier-tolerant
    sizing: pick the smallest rung whose dropped-pair count fits the
    budget and carry those pairs in the correction list instead of
    inflating S to the span max.
    """
    K, Co = in_idx.shape
    tile = min(tile, Co)
    if Co % tile != 0:
        return None
    min_slab = _floor3(min_slab)
    # Shape stability vs DMA slack: a new slab size is a new kernel shape
    # and a multi-second AOT recompile through the TPU tunnel, but slack is
    # wasted bandwidth.  Quantize to a short ladder of sizes (fractions of
    # the tile) — geometry jitter rarely crosses a rung.
    needed = max_span + 15
    slab = None
    ov_needed = 0
    if outlier_counts is not None:
        budget = _outlier_budget(total_pairs)
        for cand, cnt in zip(slab_ladder(tile), outlier_counts):
            if int(cnt) <= budget:
                slab = cand
                ov_needed = int(cnt)
                break
    if slab is None:
        for cand in slab_ladder(tile):
            if needed <= cand:
                slab = cand
                break
    if slab is None:
        slab = _round_up(needed, tile)
    if min_slab is not None:
        slab = max(slab, int(min_slab[0]))
    if slab > capacity_in:
        slab = capacity_in
    extra_rung = _round_up(max(int(union_extra), 1), 256)
    if min_slab is not None:
        extra_rung = max(extra_rung, int(min_slab[1]))
    union = _union_rung(extra_rung + slab + 16, capacity_in)
    starts, local_tk, u_starts = _slab_metadata(
        in_idx, capacity_in, tile, slab, union
    )
    ov_cap = _ov_rung(ov_needed)
    if min_slab is not None:
        ov_cap = max(ov_cap, int(min_slab[2]))
    ov = (None, None, None, None)
    if ov_cap and slab < capacity_in:
        ov = _extract_outliers(in_idx, capacity_in, tile, slab, ov_cap)
    return SlabMap(
        starts, local_tk, u_starts, slab, union, extra_rung, tile,
        capacity_in, *ov,
    )


def build_slab_map_floored(
    in_idx: jnp.ndarray,
    capacity_in: int,
    floor,
    tile: int = DEFAULT_TILE,
) -> Optional[SlabMap]:
    """Slab decomposition at a KNOWN (ratcheted) (S, E, P) floor — fully
    traceable: no host span fetch.  Used by the traced replay, which checks
    the floors separately (``span + 15 <= S`` when P == 0, else
    ``ov_count <= P``; and ``extra + S + 16 <= U``) and falls back to the
    sync path when a floor is violated."""
    K, Co = in_idx.shape
    tile = min(tile, Co)
    floor = _floor3((floor, 0) if isinstance(floor, int) else floor)
    slab, extra_rung, ov_cap = floor
    if Co % tile != 0 or slab <= 0:
        return None
    slab = min(int(slab), capacity_in)
    union = (
        _union_rung(extra_rung + slab + 16, capacity_in) if extra_rung else 0
    )
    starts, local_tk, u_starts = _slab_metadata(
        in_idx, capacity_in, tile, slab, union
    )
    ov = (None, None, None, None)
    if ov_cap and slab < capacity_in:
        ov = _extract_outliers(in_idx, capacity_in, tile, slab, ov_cap)
    return SlabMap(
        starts, local_tk, u_starts, slab, union, extra_rung, tile,
        capacity_in, *ov,
    )


def _onehot_gather(local_row, slab, slab_size, dtype):
    """(T,)-indexed gather from (S, Cin) slab via an MXU matmul.

    local_row: (1, T) int32 — slab-relative rows (S ⇒ zero row).
    Returns (T, Cin).  Standard (row-major) contraction orientation — a
    dim-0 contraction makes Mosaic transpose the (S, T) one-hot every step,
    which measured slower than relayouting the tiny (1, T) index vector.
    """
    T = local_row.shape[-1]
    li_col = local_row.reshape(T, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, slab_size), 1)
    P = (cols == li_col).astype(dtype)  # (T, S), one-hot per row
    return jnp.dot(P, slab, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _conv_fwd_kernel(
    starts_ref,  # (K, nt) SMEM (scalar prefetch)
    local_ref,  # (1, K, T) VMEM — this tile's local indices
    w_ref,  # (K, Cin, Cout) VMEM — all weights, resident
    feats_hbm,  # (Ci, Cin) ANY/HBM
    out_ref,  # (T, Cout) VMEM
    slab_ref,  # (n_buf, S, Cin) VMEM scratch ring
    sem,  # (n_buf,) DMA semaphores
    *,
    slab_size: int,
    num_k: int,
    num_t: int,
):
    """One grid step = one output tile; kernel offsets run in an inner loop
    (27× fewer grid steps than a (tiles, offsets) grid — grid-step overhead
    was the measured bottleneck) over a ring of in-flight slab DMAs (a
    single double buffer left the loop DMA-latency serialized)."""
    t = pl.program_id(0)
    n_buf = slab_ref.shape[0]

    def slab_copy(kk, sl):
        start = pl.multiple_of(starts_ref[kk, t], 16)
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, slab_size), :],
            slab_ref.at[sl],
            sem.at[sl],
        )

    for j in range(min(n_buf, num_k)):  # prologue: fill the ring
        slab_copy(j, j).start()

    T = local_ref.shape[-1]
    cout = out_ref.shape[-1]

    # NOTE: reordering the contraction as (slab @ W) then gather looks
    # cheaper on paper for Cout < Cin, but measured ~15% SLOWER end-to-end:
    # lane padding to 128 makes the "narrow" dots cost the same, and the
    # extra dependency lengthens the critical path.  Keep gather-then-W.
    def one(k, acc):
        slot = jax.lax.rem(k, n_buf)
        li = local_ref[0, pl.ds(k, 1), :]  # (1, T)
        w_k = w_ref[pl.ds(k, 1), :, :][0]  # (Cin, Cout)

        slab_copy(k, slot).wait()
        gathered = _onehot_gather(li, slab_ref[slot], slab_size, w_ref.dtype)
        acc = acc + jnp.dot(gathered, w_k, preferred_element_type=jnp.float32)

        @pl.when(k + n_buf < num_k)  # refill the slot we just consumed
        def _():
            slab_copy(k + n_buf, slot).start()

        return acc

    # register-carried accumulator + 3-way unroll: keeps the MXU fed across
    # iterations instead of serializing on a VMEM read-modify-write
    unroll = 3 if num_k % 3 == 0 else 1
    acc0 = jnp.zeros((T, cout), jnp.float32)

    def body(i, acc):
        for u in range(unroll):
            acc = one(i * unroll + u, acc)
        return acc

    acc = jax.lax.fori_loop(0, num_k // unroll, body, acc0)
    for k in range(num_k - num_k % unroll, num_k):
        acc = one(k, acc)
    out_ref[...] = acc.astype(out_ref.dtype)


def _conv_fwd_kernel_union(
    starts_ref,  # (K+1, nt) SMEM — row K holds the per-tile union starts
    local_ref,  # (1, K, T) VMEM — this tile's local indices
    w_ref,  # (K, Cin, Cout) VMEM — all weights, resident
    feats_hbm,  # (Ci, Cin) ANY/HBM
    out_ref,  # (T, Cout) VMEM
    slab_ref,  # (2, U, Cin) VMEM — double-buffered per-TILE union slabs
    sem,  # (2,) DMA semaphores
    *,
    slab_size: int,
    union_size: int,
    num_k: int,
    num_t: int,
):
    """Union-slab forward: ONE DMA per output tile (feats[u : u+U]) serves
    all K offsets — their per-offset slabs overlap almost entirely, so the
    per-(offset, tile) DMA scheme moves ~K× more HBM bytes than needed
    (measured ~70% of kernel time at 27 offsets / 128 channels).  Each
    offset gathers from a dynamic (S)-row window of the resident union
    slab; the tile t+1 copy is issued before tile t's compute."""
    t = pl.program_id(0)

    def tile_copy(tt, sl):
        u = pl.multiple_of(starts_ref[num_k, tt], 16)
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(u, union_size), :],
            slab_ref.at[sl],
            sem.at[sl],
        )

    @pl.when(t == 0)
    def _():
        tile_copy(0, 0).start()

    slot = jax.lax.rem(t, 2)

    @pl.when(t + 1 < num_t)
    def _():
        tile_copy(t + 1, jax.lax.rem(t + 1, 2)).start()

    tile_copy(t, slot).wait()

    T = local_ref.shape[-1]
    cout = out_ref.shape[-1]
    u_t = starts_ref[num_k, t]

    def one(k, acc):
        li = local_ref[0, pl.ds(k, 1), :]  # (1, T)
        w_k = w_ref[pl.ds(k, 1), :, :][0]  # (Cin, Cout)
        rel = pl.multiple_of(starts_ref[k, t] - u_t, 16)
        window = slab_ref[slot, pl.ds(rel, slab_size), :]
        gathered = _onehot_gather(li, window, slab_size, w_ref.dtype)
        return acc + jnp.dot(gathered, w_k, preferred_element_type=jnp.float32)

    unroll = 3 if num_k % 3 == 0 else 1
    acc0 = jnp.zeros((T, cout), jnp.float32)

    def body(i, acc):
        for u in range(unroll):
            acc = one(i * unroll + u, acc)
        return acc

    acc = jax.lax.fori_loop(0, num_k // unroll, body, acc0)
    for k in range(num_k - num_k % unroll, num_k):
        acc = one(k, acc)
    out_ref[...] = acc.astype(out_ref.dtype)


def _pad_lanes(x, axis):
    """Pad ``axis`` to a multiple of 128 (HBM rows are lane-padded anyway,
    and Mosaic requires lane-aligned DMA slices)."""
    n = x.shape[axis]
    target = _round_up(n, 128)
    if target == n:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - n)
    return jnp.pad(x, pads)


def _union_enabled(slab_map: SlabMap, cin_padded: int, itemsize: int) -> bool:
    """Whether the per-tile union-DMA kernel fits its VMEM double buffer."""
    return (
        slab_map.union_size > 0
        and 2 * slab_map.union_size * cin_padded * itemsize
        <= _UNION_VMEM_BUDGET
    )


def _starts_with_union(slab_map: SlabMap) -> jnp.ndarray:
    """(K+1, nt) scalar-prefetch block: per-offset starts + union starts."""
    return jnp.concatenate(
        [slab_map.starts, slab_map.u_starts[None, :]], axis=0
    )


def sparse_conv_fwd_pallas(
    feats: jnp.ndarray,  # (Ci, Cin)
    weights: jnp.ndarray,  # (K, Cin, Cout)
    slab_map: SlabMap,
) -> jnp.ndarray:
    """Forward sparse conv via the slab kernel.  Returns (Co, Cout)."""
    feats = _pad_lanes(feats, 1)
    weights = _pad_lanes(weights, 1).astype(feats.dtype)
    nt, K, T = slab_map.local_tk.shape
    S = slab_map.slab_size
    Ci, Cin = feats.shape
    Cout = weights.shape[-1]
    Co = nt * T

    use_union = _union_enabled(slab_map, Cin, feats.dtype.itemsize)
    if use_union:
        U = slab_map.union_size
        scratch = [
            pltpu.VMEM((2, U, Cin), feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        kernel = functools.partial(
            _conv_fwd_kernel_union,
            slab_size=S, union_size=U, num_k=K, num_t=nt,
        )
        prefetch = _starts_with_union(slab_map)
        dma_bytes = nt * U * Cin * feats.dtype.itemsize
    else:
        n_buf = _ring_depth(S, Cin, K)
        scratch = [
            pltpu.VMEM((n_buf, S, Cin), feats.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ]
        kernel = functools.partial(
            _conv_fwd_kernel, slab_size=S, num_k=K, num_t=nt
        )
        prefetch = slab_map.starts
        dma_bytes = K * nt * S * Cin * feats.dtype.itemsize

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (1, K, T), lambda t, s: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (K, Cin, Cout), lambda t, s: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),  # feats stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (T, Cout), lambda t, s: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Co, Cout), feats.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * Co * Cin * (Cout + S),
            bytes_accessed=dma_bytes + Co * Cout * 4,
            transcendentals=0,
        ),
    )(prefetch, slab_map.local_tk, weights, feats)


# ---------------------------------------------------------------------------
# weight-gradient kernel: dW[k] = Σ_t gathered_k_tᵀ @ g_t
# ---------------------------------------------------------------------------


def _conv_dw_kernel(
    starts_ref,  # (K, nt) SMEM
    local_ref,  # (1, K, T) VMEM — this tile's local indices
    g_ref,  # (T, Cout) VMEM — grad tile
    feats_hbm,  # (Ci, Cin) ANY
    dw_ref,  # (K, Cin, Cout) VMEM — revisited across every tile
    slab_ref,  # (2, S, Cin) double-buffered
    sem,  # (2,)
    *,
    slab_size: int,
    num_t: int,
    num_k: int,
):
    """dW[k] = Σ_t gatheredᵀ_{k,t} @ g_t — one grid step per tile, offsets in
    an inner loop, accumulating directly into the W-shaped output block
    (constant block index ⇒ stays resident in VMEM across the grid)."""
    t = pl.program_id(0)
    n_buf = slab_ref.shape[0]

    def slab_copy(kk, sl):
        start = pl.multiple_of(starts_ref[kk, t], 16)
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, slab_size), :],
            slab_ref.at[sl],
            sem.at[sl],
        )

    for j in range(min(n_buf, num_k)):
        slab_copy(j, j).start()

    @pl.when(t == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    def body(k, _):
        slot = jax.lax.rem(k, n_buf)
        li = local_ref[0, pl.ds(k, 1), :]
        slab_copy(k, slot).wait()
        gathered = _onehot_gather(li, slab_ref[slot], slab_size, g_ref.dtype)
        contrib = jax.lax.dot_general(
            gathered,
            g_ref[...],
            (((0,), (0,)), ((), ())),  # gatheredᵀ @ g
            preferred_element_type=jnp.float32,
        )
        dw_ref[pl.ds(k, 1), :, :] += contrib[None]

        @pl.when(k + n_buf < num_k)
        def _():
            slab_copy(k + n_buf, slot).start()

        return 0

    jax.lax.fori_loop(0, num_k, body, 0)


def _conv_dw_kernel_union(
    starts_ref,  # (K+1, nt) SMEM — row K = union starts
    local_ref,  # (1, K, T) VMEM
    g_ref,  # (T, Cout) VMEM — grad tile
    feats_hbm,  # (Ci, Cin) ANY
    dw_ref,  # (K, Cin, Cout) VMEM — revisited across every tile
    slab_ref,  # (2, U, Cin)
    sem,  # (2,)
    *,
    slab_size: int,
    union_size: int,
    num_t: int,
    num_k: int,
):
    """Union-slab dW: one per-tile DMA (see _conv_fwd_kernel_union)."""
    t = pl.program_id(0)

    def tile_copy(tt, sl):
        u = pl.multiple_of(starts_ref[num_k, tt], 16)
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(u, union_size), :],
            slab_ref.at[sl],
            sem.at[sl],
        )

    @pl.when(t == 0)
    def _():
        tile_copy(0, 0).start()

    slot = jax.lax.rem(t, 2)

    @pl.when(t + 1 < num_t)
    def _():
        tile_copy(t + 1, jax.lax.rem(t + 1, 2)).start()

    tile_copy(t, slot).wait()

    @pl.when(t == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    u_t = starts_ref[num_k, t]

    def body(k, _):
        li = local_ref[0, pl.ds(k, 1), :]
        rel = pl.multiple_of(starts_ref[k, t] - u_t, 16)
        window = slab_ref[slot, pl.ds(rel, slab_size), :]
        gathered = _onehot_gather(li, window, slab_size, g_ref.dtype)
        contrib = jax.lax.dot_general(
            gathered,
            g_ref[...],
            (((0,), (0,)), ((), ())),  # gatheredᵀ @ g
            preferred_element_type=jnp.float32,
        )
        dw_ref[pl.ds(k, 1), :, :] += contrib[None]
        return 0

    jax.lax.fori_loop(0, num_k, body, 0)


def sparse_conv_dw_pallas(
    feats: jnp.ndarray,  # (Ci, Cin)
    g: jnp.ndarray,  # (Co, Cout) output cotangent
    slab_map: SlabMap,
    weights_shape,
) -> jnp.ndarray:
    true_cin = feats.shape[1]
    feats = _pad_lanes(feats, 1)
    nt, K, T = slab_map.local_tk.shape
    S = slab_map.slab_size
    Ci, Cin = feats.shape
    Cout = g.shape[-1]

    use_union = _union_enabled(slab_map, Cin, feats.dtype.itemsize)
    if use_union:
        U = slab_map.union_size
        scratch = [
            pltpu.VMEM((2, U, Cin), feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        kernel = functools.partial(
            _conv_dw_kernel_union,
            slab_size=S, union_size=U, num_t=nt, num_k=K,
        )
        prefetch = _starts_with_union(slab_map)
        dma_bytes = nt * U * Cin * feats.dtype.itemsize
    else:
        n_buf = _ring_depth(S, Cin, K)
        scratch = [
            pltpu.VMEM((n_buf, S, Cin), feats.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ]
        kernel = functools.partial(
            _conv_dw_kernel, slab_size=S, num_t=nt, num_k=K
        )
        prefetch = slab_map.starts
        dma_bytes = K * nt * S * Cin * feats.dtype.itemsize

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (1, K, T), lambda t, s: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (T, Cout), lambda t, s: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (K, Cin, Cout), lambda t, s: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )
    dw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, Cin, Cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * nt * T * (S + Cout) * Cin,
            bytes_accessed=dma_bytes + nt * T * Cout * 4,
            transcendentals=0,
        ),
    )(prefetch, slab_map.local_tk, g, feats)
    return dw[:, :true_cin, :]


def pallas_conv_supported(slab_map: Optional[SlabMap], weights_shape) -> bool:
    """Whether the fused kernel fits this configuration in VMEM."""
    if slab_map is None:
        return False
    K, Cin, Cout = weights_shape
    cin_p = _round_up(Cin, 128)
    cout_p = _round_up(Cout, 128)
    S, T = slab_map.slab_size, slab_map.tile
    if _union_enabled(slab_map, cin_p, 4):
        slab_vmem = 2 * slab_map.union_size * cin_p * 4
    else:
        slab_vmem = _ring_depth(S, cin_p, K) * S * cin_p * 4
    vmem = (
        K * cin_p * cout_p * 4  # resident weights (also the dW accumulator)
        + slab_vmem  # slab ring / union double buffer
        + 2 * T * cout_p * 4  # out block + accumulator
        + 2 * K * T * 4  # local indices block (double-buffered)
    )
    return vmem <= 14 * 1024 * 1024
