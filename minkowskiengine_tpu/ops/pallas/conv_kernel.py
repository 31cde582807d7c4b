"""Fused Pallas sparse-convolution kernel: slab-DMA + one-hot MXU gather.

Why this shape: XLA lowers row gathers (`jnp.take`) to fine-grained DMAs —
~30 ms for the 884k-row gather of a 27-offset kernel map regardless of
channel width (measured on v5e), 50–1000× off roofline.  The TPU-native fix
exploits a structural invariant of this engine's kernel maps:

  * coordinate maps are sorted by canonical key (batch-major
    LEXICOGRAPHIC; coords/keys.py — Morton was measured and REJECTED,
    see the keys.py header): consecutive rows are spatially local along
    the scan order, and a kernel offset only reaches bounded spatial
    neighbors, so **the gather indices of a T-row output tile cluster in
    a small window of input rows**;
  * hence the inputs needed by a T-row output tile live in a contiguous
    slab of a few×T input rows.  On 2-D surface scans the span
    DISTRIBUTION has a long tail (scanline wraps); the slab is sized at
    a tail rung and the rare outside pairs ride the outlier-correction
    list rather than inflating S (see SlabMap.ov_*).

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
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 256
MAX_W_VMEM_BYTES = 8 * 1024 * 1024

# Two-tier windows: each T-row output tile is split into T/SUB_TILE
# sub-tiles whose one-hot gathers contract over a NARROW window (the
# sub-window, width S' = SlabMap.sub_size) of the DMA'd slab instead of
# the whole slab.  The one-hot gather-as-matmul burns 2·T·S·Cin FLOPs per
# (offset, tile) vs 2·T·Cin·Cout useful GEMM — at S=320..512 and
# Cout<=128 the gather tax is 2.5-4x the useful work.  Sub-tile index
# spans are ~S·(SUB_TILE/T) + jitter (measured: p99 87 rows at T'=64 on a
# uniform 26k cloud with S=320; p99 228 on a surface scan with S=512), so
# S'=128..192 covers all but ~1% of pairs; the remainder rides the
# existing outlier-correction list.  DMA shape is unchanged — only the
# MXU contraction narrows.
SUB_TILE = 64


def sub_ladder(tile: int = DEFAULT_TILE) -> tuple:
    """Static sub-window quantization rungs (every new S' is a fresh
    Mosaic compile; outlier counts for each (S, S') combo are measured in
    one fused pass by ``measure_spans``)."""
    return (96, 128, 160, 192, 256)


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
      ov_perm: optional (P,) int32 dst-sort permutation of the COO lists
        (stable argsort of ov_dst, -1 tail last) — lets the correction
        pass apply contributions scatter-free: permute to dst-sorted
        order, segmented-scan per-dst run sums (runs are contiguous and
        ≤ K long), then one searchsorted + row gather from the OUTPUT
        side (see ops/functional.py ``_outlier_apply``).  Computed once
        at build time; the GEMM itself stays on the k-sorted order
        ``ragged_dot`` wants.
      sub_size / sub_rel: two-tier windows (0 / None ⇒ single tier).
        ``sub_rel`` is (K·J, nt) int32 (J = T/SUB_TILE, row k·J + j):
        16-aligned per-(offset, tile, sub-tile) window offsets RELATIVE to
        the (offset, tile) slab start, clamped to [0, S - S'].  When enabled,
        ``local_tk`` holds indices relative to the SUB-window (S' ⇒ zero
        row) and the kernels contract (SUB_TILE, S') one-hots instead of
        (T, S) — the dominant gather-FLOP tax shrinks by S/S'.
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
    sub_size: int = 0
    sub_rel: Optional[jnp.ndarray] = None
    ov_perm: Optional[jnp.ndarray] = None
    ov_gs: Optional[jnp.ndarray] = None

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
            self.sub_rel,
            self.ov_perm,
            self.ov_gs,
        ), (
            self.slab_size,
            self.union_size,
            self.tile,
            self.capacity_in,
            self.sub_size,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        (starts, local_tk, u_starts, ov_src, ov_dst, ov_k, ov_count,
         sub_rel, ov_perm, ov_gs) = children
        slab_size, union_size, tile, capacity_in, sub_size = aux
        return cls(
            starts, local_tk, u_starts, slab_size, union_size, 0, tile,
            capacity_in, ov_src, ov_dst, ov_k, ov_count, sub_size, sub_rel,
            ov_perm, ov_gs,
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


def _sub_rel_for(idx, valid, start, slab_size, sub_size, tile):
    """(K, nt, J) 16-aligned sub-window offsets relative to the slab start
    — the ONE place the sub-window rule lives (metadata, outlier
    extraction and span measurement must agree bit-for-bit).  Windows are
    clamped inside the slab: [rel, rel + S') ⊆ [0, S)."""
    K, nt, T = idx.shape
    J = T // SUB_TILE
    sub = idx.reshape(K, nt, J, SUB_TILE)
    subv = valid.reshape(K, nt, J, SUB_TILE)
    smin = jnp.min(jnp.where(subv, sub, jnp.int32(2**30)), axis=-1)
    smin = jnp.where(smin == 2**30, start[:, :, None], smin)
    rel = (smin // 16) * 16 - start[:, :, None]
    return jnp.clip(rel, 0, max(slab_size - sub_size, 0)).astype(jnp.int32)


# The scalar-prefetch block lives in SMEM (1 MiB on v5e).  Two-tier maps
# carry K·J extra sub_rel rows: at K=125/T=256 (J=4) and 512 tiles that is
# 627 rows × 512 × 4 B = 1.28 MB — a Mosaic allocation failure (hit by the
# 104k-voxel batch=4 capacity probe).  Sub-windows are disabled at BUILD
# time when the full block would not fit (a static, per-capacity-bucket
# decision — no re-lowering jitter), and `pallas_conv_supported` routes to
# the XLA path when even the base starts rows cannot fit.
_SMEM_PREFETCH_BUDGET = 768 * 1024


def _prefetch_fits(num_k, tile, nt, with_sub: bool) -> bool:
    rows = num_k + 2  # starts + union row + ntef row
    if with_sub:
        rows += num_k * (tile // SUB_TILE)
    return rows * nt * 4 <= _SMEM_PREFETCH_BUDGET


def _sub_enabled(sub_size, slab_size, tile, num_k=0, nt=0):
    return (
        0 < sub_size < slab_size
        and tile % SUB_TILE == 0
        and _prefetch_fits(num_k, tile, nt, True)
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _slab_metadata(in_idx, cap_in, tile, slab_size, union_size=0,
                   sub_size=0):
    """Compute (starts, local_tk, u_starts, sub_rel) for static sizes.
    With ``sub_size`` enabled, local indices are relative to the
    per-sub-tile window (sentinel S' ⇒ zero row) and sub_rel is
    (K, nt·J); otherwise they are slab-relative and sub_rel is None."""
    K, Co = in_idx.shape
    nt = Co // tile
    idx = in_idx.reshape(K, nt, tile)
    valid = idx >= 0
    start = _slab_starts(idx, valid, cap_in, slab_size)
    u = jnp.min(start, axis=0)
    u = jnp.clip(u, 0, max(cap_in - union_size, 0))
    local = idx - start[:, :, None]
    sub_rel = None
    if _sub_enabled(sub_size, slab_size, tile):
        rel = _sub_rel_for(idx, valid, start, slab_size, sub_size, tile)
        J = tile // SUB_TILE
        l4 = local.reshape(K, nt, J, SUB_TILE) - rel[..., None]
        l4 = jnp.where(
            valid.reshape(K, nt, J, SUB_TILE)
            & (l4 >= 0) & (l4 < sub_size),
            l4, sub_size,
        )
        # (nt, K·J, SUB_TILE): each sub-tile's indices are a full ROW —
        # Mosaic cannot lane-slice a (1, T) vector at offset j·SUB_TILE
        # ("dynamic load with unaligned indices"), so sub-tiles must live
        # on the sublane dim
        local = jnp.transpose(
            l4.reshape(K, nt, J, SUB_TILE), (1, 0, 2, 3)
        ).reshape(nt, K * J, SUB_TILE).astype(jnp.int32)
        # (K·J, nt): row k·J + j — appended below the starts block in the
        # kernels' scalar-prefetch array
        sub_rel = (
            jnp.transpose(rel, (0, 2, 1)).reshape(K * J, nt).astype(jnp.int32)
        )
        return (
            start.astype(jnp.int32),
            local,
            u.astype(jnp.int32),
            sub_rel,
        )
    else:
        # anything that falls outside [0, S) gathers zero (the dropped
        # pairs are exactly the outlier list — see _extract_outliers)
        local = jnp.where(
            valid & (local >= 0) & (local < slab_size), local, slab_size
        )
    local = local.astype(jnp.int32)
    return (
        start.astype(jnp.int32),
        jnp.transpose(local, (1, 0, 2)),
        u.astype(jnp.int32),
        sub_rel,
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _extract_outliers(in_idx, cap_in, tile, slab_size, cap, sub_size=0):
    """Compact the valid pairs whose (sub-)window-local index falls
    outside the window into (src, dst, k) lists of static capacity
    ``cap``.

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
    if _sub_enabled(sub_size, slab_size, tile):
        J = tile // SUB_TILE
        rel = _sub_rel_for(idx, valid, start, slab_size, sub_size, tile)
        l4 = local.reshape(K, nt, J, SUB_TILE) - rel[..., None]
        out_mask = (
            valid.reshape(K, nt, J, SUB_TILE)
            & ((l4 < 0) | (l4 >= sub_size))
        ).reshape(K, nt, tile)
    else:
        out_mask = valid & ((local < 0) | (local >= slab_size))
    flat_mask = out_mask.reshape(-1)
    # Scatter-free compaction: the j-th outlier's flat position is the
    # first index where cumsum(mask) reaches j+1 — a searchsorted (binary
    # search, ~log2(K·Co) vectorized gather steps for all ``cap`` queries).
    # The obvious masked-cumsum scatter (fill.at[tgt].set) hits a serial
    # TPU scatter emitter at some shapes: measured 20 ms for 884k updates
    # (≈23 ns/update) vs 0.04 ms for a 4M-update sibling — six such
    # scatters made the traced coordinate phase 195 ms (was ~10).
    count = jnp.sum(flat_mask.astype(jnp.int32))
    cs = jnp.cumsum(flat_mask.astype(jnp.int32))
    j = jnp.arange(cap, dtype=jnp.int32)
    pos = jnp.searchsorted(cs, j + 1, side="left").astype(jnp.int32)
    found = j < count
    src = idx.reshape(-1)
    dst = jnp.broadcast_to(
        jnp.arange(Co, dtype=jnp.int32).reshape(1, nt, tile), idx.shape
    ).reshape(-1)
    kk = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[:, None, None], idx.shape
    ).reshape(-1)
    ov_src = jnp.where(found, jnp.take(src, pos, mode="clip"), -1)
    ov_dst = jnp.where(found, jnp.take(dst, pos, mode="clip"), -1)
    ov_k = jnp.where(found, jnp.take(kk, pos, mode="clip"), -1)
    # dst-sort permutation (padding tail sorts last): the scatter-free
    # correction pass needs the COO list in dst-contiguous runs while the
    # grouped GEMM needs k-major — one stable argsort here serves both.
    ov_perm = jnp.argsort(
        jnp.where(ov_dst >= 0, ov_dst, jnp.int32(2**30)), stable=True
    ).astype(jnp.int32)
    # per-offset group sizes of the COMPACTED list (ragged_dot metadata —
    # recomputing it from ov_k at apply time cost 0.12 ms per correction,
    # measured): per-k mask counts, cumulative-clipped at the capacity so
    # truncated lists stay consistent, with the -1 padding tail folded
    # into the last group (its rows gather zero and contribute nothing).
    per_k = jnp.sum(out_mask.reshape(K, -1).astype(jnp.int32), axis=1)
    ccl = jnp.clip(jnp.cumsum(per_k), 0, cap)
    trunc = jnp.diff(ccl, prepend=jnp.zeros((1,), ccl.dtype))
    ov_gs = trunc.at[K - 1].add(jnp.int32(cap) - ccl[-1]).astype(jnp.int32)
    return ov_src, ov_dst, ov_k, count, ov_perm, ov_gs


def slab_tile(capacity: int, tile: int = DEFAULT_TILE) -> int:
    return min(tile, capacity)


def slab_ladder(tile: int) -> tuple:
    """The static slab-size quantization rungs (fractions of the tile —
    shape stability: every new slab size is a fresh Mosaic compile)."""
    return tuple(
        _round_up(int(tile * m), 16) for m in (1.25, 1.5, 2.0, 3.0, 4.0)
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def measure_spans(
    in_idx: jnp.ndarray, tile: int, cap_in: int = 0, ladder: tuple = (),
    subs: tuple = (),
) -> jnp.ndarray:
    """(3 + len(ladder)·(1 + len(subs)),) int32 device vector
    ``[max span, max union extra, total valid pairs, outliers@rung...,
    two-tier outliers@(rung, sub)...]`` — no sync here so callers can
    fuse several measurements into one host round trip.  With an empty
    ladder only the first three land.

    ``union extra`` = spread of the per-offset slab starts within a tile;
    the per-tile union slab needs ``extra + span (+16 alignment)`` rows.
    ``outliers@rung`` = valid pairs whose slab-local index would fall
    outside a window of that ladder size (bit-matched to
    ``_extract_outliers`` — same aligned-start rule).  The two-tier block
    is row-major over (ladder, subs): pairs outside their per-sub-tile
    window of width S' within a slab of rung S (combos with S' >= S
    repeat the single-tier count — the sub window would escape the slab).
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
    singles = []
    for S in ladder:
        st = _slab_starts(idx, valid, cap_in, S)
        local = idx - st[:, :, None]
        miss = valid & ((local < 0) | (local >= S))
        singles.append(jnp.sum(miss.astype(jnp.int32)))
    out.extend(singles)
    for S, single in zip(ladder, singles):
        st = _slab_starts(idx, valid, cap_in, S)
        local = idx - st[:, :, None]
        for Sp in subs:
            if not _sub_enabled(Sp, S, tile):
                out.append(single)
                continue
            J = tile // SUB_TILE
            rel = _sub_rel_for(idx, valid, st, S, Sp, tile)
            l4 = local.reshape(K, -1, J, SUB_TILE) - rel[..., None]
            miss = valid.reshape(K, -1, J, SUB_TILE) & (
                (l4 < 0) | (l4 >= Sp)
            )
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


def _floor4(f):
    """Normalize a slab floor to (S, E, P, S2) — legacy (S, E) floors get
    P=0; legacy floors without a sub-window component get S2=S (single
    tier: a sub window as wide as the slab IS the slab window)."""
    if f is None:
        return None
    S = int(f[0])
    return (
        S,
        int(f[1]),
        int(f[2]) if len(f) > 2 else 0,
        int(f[3]) if len(f) > 3 else S,
    )


def merge_slab_floor(prev, new):
    """Ratchet-merge two (S, E, P, S2) floors (slab rung, union-extra
    rung, outlier capacity, sub-window rung).

    All components are max-monotone (a WIDER sub window is always safer —
    a width-W sub window covers at least what a width-W slab window
    covers, since the per-sub-tile start is >= the slab start and <= its
    own minimum valid index); the union size U is DERIVED from (S, E) at
    build time (``_union_rung(E + S + 16)``), which keeps U consistent
    when S and E ratchet on different clouds, and makes union-disable
    (U would exceed the budget) sticky automatically — E only grows.
    Sub-tiling disables itself when the ratcheted S2 reaches S."""
    new = _floor4(new)
    if prev is None:
        return new
    prev = _floor4(prev)
    return tuple(max(a, b) for a, b in zip(prev, new))


_MAX_OUTLIERS = 32768
_OUTLIER_FRAC = 0.03
_MIN_OV_CAP = 256


def _outlier_budget(total_pairs: int) -> int:
    """Largest outlier count worth trading for a smaller slab/sub-window
    rung: a bounded fraction of all pairs (the correction pass costs
    K·P·Cin·Cout MXU FLOPs) with an absolute cap.

    3% (was 1%): the gather-as-matmul tax scales with the window width,
    so absorbing the span tail into the correction list is the main MFU
    lever — on the headline surface cloud the two-tier counts at
    S'=128..160 sit at 1.4-1.7% of pairs, which a 1% budget rejected,
    leaving the kernel contracting full 512-row slabs (measured: the
    128-ch surface conv ran at 85% MXU utilization but spent 4× the
    useful FLOPs on the wide one-hot)."""
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

    ``min_slab`` is an optional (S, E, P, S2) shape-stability floor (slab
    rung, union-extra rung, outlier capacity, sub-window rung; ratcheted
    by the geometry replayer): reusing the largest rungs seen so far
    keeps the kernel shape — and therefore the compiled step — stable
    across geometry jitter.  ``union_extra`` is the measured per-tile
    spread of the slab starts (measure_spans[1]); the per-tile union slab
    needs ``extra + S + 16`` rows.  ``outlier_counts`` (host ints,
    measure_spans[3:]: one per ``slab_ladder(tile)`` rung, then the
    row-major (rung, sub_ladder) two-tier table) unlock outlier-tolerant
    sizing: pick the smallest slab rung whose dropped-pair count fits the
    budget — then the smallest SUB-window rung whose two-tier count also
    fits, carrying the dropped pairs in the correction list instead of
    inflating the one-hot contraction width.
    """
    K, Co = in_idx.shape
    tile = min(tile, Co)
    if Co % tile != 0:
        return None
    min_slab = _floor4(min_slab)
    # Shape stability vs DMA slack: a new slab size is a new kernel shape
    # and a multi-second AOT recompile through the TPU tunnel, but slack is
    # wasted bandwidth.  Quantize to a short ladder of sizes (fractions of
    # the tile) — geometry jitter rarely crosses a rung.
    needed = max_span + 15
    ladder = slab_ladder(tile)
    subs = sub_ladder(tile)
    slab = None
    i_pick = None
    ov_needed = 0
    budget = _outlier_budget(total_pairs)
    if outlier_counts is not None:
        for i, (cand, cnt) in enumerate(zip(ladder, outlier_counts)):
            if int(cnt) <= budget:
                slab = cand
                i_pick = i
                ov_needed = int(cnt)
                break
    if slab is None:
        for cand in ladder:
            if needed <= cand:
                slab = cand
                break
    if slab is None:
        slab = _round_up(needed, tile)
    if min_slab is not None:
        slab = max(slab, int(min_slab[0]))
    if slab > capacity_in:
        slab = capacity_in
    # Two-tier sub-window pick: smallest rung whose two-tier outlier
    # count fits the same budget.  Counts are measured at the LADDER rung
    # (i_pick); a floor-raised slab only relaxes the window clamp, so the
    # measured count stays a valid upper bound.
    sub = 0
    tbl = (
        None
        if (outlier_counts is None
            or len(outlier_counts) < len(ladder) * (1 + len(subs)))
        else outlier_counts[len(ladder):]
    )
    if i_pick is not None and tbl is not None and tile % SUB_TILE == 0:
        for j, sp in enumerate(subs):
            cnt2 = int(tbl[i_pick * len(subs) + j])
            if sp < slab and cnt2 <= budget:
                sub = sp
                ov_needed = cnt2
                break
    sub_choice = sub if sub else slab  # disabled encodes as S
    if min_slab is not None:
        sub_choice = max(sub_choice, int(min_slab[3]))
    sub = (
        sub_choice
        if _sub_enabled(sub_choice, slab, tile, K, Co // tile)
        else 0
    )
    extra_rung = _round_up(max(int(union_extra), 1), 256)
    if min_slab is not None:
        extra_rung = max(extra_rung, int(min_slab[1]))
    union = _union_rung(extra_rung + slab + 16, capacity_in)
    starts, local_tk, u_starts, sub_rel = _slab_metadata(
        in_idx, capacity_in, tile, slab, union, sub
    )
    ov_cap = _ov_rung(ov_needed)
    if sub:
        # sub windows can drop pairs even when the slab covers everything;
        # validity (ov_count <= ov_cap) must always be checkable
        ov_cap = max(ov_cap, _MIN_OV_CAP)
    if min_slab is not None:
        ov_cap = max(ov_cap, int(min_slab[2]))
    ov = (None, None, None, None)
    ov_perm = ov_gs = None
    if ov_cap and (sub or slab < capacity_in):
        *ov, ov_perm, ov_gs = _extract_outliers(
            in_idx, capacity_in, tile, slab, ov_cap, sub
        )
    return SlabMap(
        starts, local_tk, u_starts, slab, union, extra_rung, tile,
        capacity_in, *ov, sub, sub_rel, ov_perm, ov_gs,
    )


def build_slab_map_floored(
    in_idx: jnp.ndarray,
    capacity_in: int,
    floor,
    tile: int = DEFAULT_TILE,
) -> Optional[SlabMap]:
    """Slab decomposition at a KNOWN (ratcheted) (S, E, P, S2) floor —
    fully traceable: no host span fetch.  Used by the traced replay, which
    checks the floors separately (``span + 15 <= S`` when P == 0, else
    ``ov_count <= P``; and ``extra + S + 16 <= U``) and falls back to the
    sync path when a floor is violated."""
    K, Co = in_idx.shape
    tile = min(tile, Co)
    floor = _floor4((floor, 0) if isinstance(floor, int) else floor)
    slab, extra_rung, ov_cap, sub = floor
    if Co % tile != 0 or slab <= 0:
        return None
    slab = min(int(slab), capacity_in)
    sub = sub if _sub_enabled(sub, slab, tile, K, Co // tile) else 0
    union = (
        _union_rung(extra_rung + slab + 16, capacity_in) if extra_rung else 0
    )
    starts, local_tk, u_starts, sub_rel = _slab_metadata(
        in_idx, capacity_in, tile, slab, union, sub
    )
    if sub:
        ov_cap = max(ov_cap, _MIN_OV_CAP)
    ov = (None, None, None, None)
    ov_perm = ov_gs = None
    if ov_cap and (sub or slab < capacity_in):
        *ov, ov_perm, ov_gs = _extract_outliers(
            in_idx, capacity_in, tile, slab, ov_cap, sub
        )
    return SlabMap(
        starts, local_tk, u_starts, slab, union, extra_rung, tile,
        capacity_in, *ov, sub, sub_rel, ov_perm, ov_gs,
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


def _sub_gathered(local_ref, k, t, starts_ref, sub_base, window_of,
                  sub_size, T, dtype):
    """(T, Cin) gathered rows for offset ``k`` via per-sub-tile narrow
    one-hots: sub-tile j contracts a (SUB_TILE, S') one-hot against the
    S'-row window at ``window_of(sub_rel)`` instead of (T, S) against the
    whole slab — the gather-as-matmul FLOP tax shrinks by S/S'.
    ``local_ref`` is the (1, K·J, SUB_TILE) sub-tiled index block (each
    sub-tile a full sublane row — Mosaic cannot lane-slice at offset
    j·SUB_TILE); ``sub_base``: row offset of the sub_rel block in the
    prefetch array (rows ordered (k, j))."""
    J = T // SUB_TILE
    parts = []
    for j in range(J):
        li = local_ref[0, pl.ds(k * J + j, 1), :]  # (1, SUB_TILE)
        rel = pl.multiple_of(starts_ref[sub_base + k * J + j, t], 16)
        parts.append(_onehot_gather(li, window_of(rel), sub_size, dtype))
    return jnp.concatenate(parts, axis=0)


def _conv_fwd_kernel(
    starts_ref,  # (K (+K·J), nt) SMEM (scalar prefetch; sub_rel rows after)
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
    sub_size: int = 0,
    ntef_row: int = -1,
):
    """One grid step = one output tile; kernel offsets run in an inner loop
    (27× fewer grid steps than a (tiles, offsets) grid — grid-step overhead
    was the measured bottleneck) over a ring of in-flight slab DMAs (a
    single double buffer left the loop DMA-latency serialized).

    ``ntef_row`` ≥ 0: prefetch row holding the DYNAMIC count of live
    output tiles (⌈n_valid/T⌉ — pow2 capacity buckets leave up to ~25% of
    tiles all-padding); dead tiles skip their DMAs and gather FLOPs and
    just zero their output block.  A runtime scalar, not a static shape:
    no re-lowering when geometry jitters."""
    t = pl.program_id(0)
    n_buf = slab_ref.shape[0]

    def slab_copy(kk, sl):
        start = pl.multiple_of(starts_ref[kk, t], 16)
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, slab_size), :],
            slab_ref.at[sl],
            sem.at[sl],
        )

    def compute():
        for j in range(min(n_buf, num_k)):  # prologue: fill the ring
            slab_copy(j, j).start()

        T = out_ref.shape[0]
        cout = out_ref.shape[-1]

        # NOTE: reordering the contraction as (slab @ W) then gather looks
        # cheaper on paper for Cout < Cin, but measured ~15% SLOWER
        # end-to-end: lane padding to 128 makes the "narrow" dots cost the
        # same, and the extra dependency lengthens the critical path.
        def one(k, acc):
            slot = jax.lax.rem(k, n_buf)
            w_k = w_ref[pl.ds(k, 1), :, :][0]  # (Cin, Cout)

            slab_copy(k, slot).wait()
            if sub_size:
                gathered = _sub_gathered(
                    local_ref, k, t, starts_ref, num_k,
                    lambda rel: slab_ref[slot, pl.ds(rel, sub_size), :],
                    sub_size, T, w_ref.dtype,
                )
            else:
                li = local_ref[0, pl.ds(k, 1), :]  # (1, T)
                gathered = _onehot_gather(
                    li, slab_ref[slot], slab_size, w_ref.dtype
                )
            acc = acc + jnp.dot(
                gathered, w_k, preferred_element_type=jnp.float32
            )

            @pl.when(k + n_buf < num_k)  # refill the slot we just consumed
            def _():
                slab_copy(k + n_buf, slot).start()

            return acc

        # register-carried accumulator + 3-way unroll: keeps the MXU fed
        # across iterations instead of serializing on a VMEM
        # read-modify-write
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

    if ntef_row < 0:
        compute()
    else:
        live = t < starts_ref[ntef_row, 0]
        pl.when(live)(compute)

        @pl.when(jnp.logical_not(live))
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)


def _conv_fwd_kernel_union(
    starts_ref,  # (K+1 (+K·J), nt) SMEM — row K = per-tile union starts
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
    sub_size: int = 0,
    ntef_row: int = -1,
):
    """Union-slab forward: ONE DMA per output tile (feats[u : u+U]) serves
    all K offsets — their per-offset slabs overlap almost entirely, so the
    per-(offset, tile) DMA scheme moves ~K× more HBM bytes than needed
    (measured ~70% of kernel time at 27 offsets / 128 channels).  Each
    offset gathers from a dynamic (S)-row window of the resident union
    slab; the tile t+1 copy is issued before tile t's compute.

    ``ntef_row``: see _conv_fwd_kernel — dynamic live-tile count; dead
    tiles (beyond ⌈n_valid/T⌉) zero their output without DMA/compute."""
    t = pl.program_id(0)
    nte = starts_ref[ntef_row, 0] if ntef_row >= 0 else num_t

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

    @pl.when(t + 1 < nte)
    def _():
        tile_copy(t + 1, jax.lax.rem(t + 1, 2)).start()

    def compute():
        tile_copy(t, slot).wait()

        T = out_ref.shape[0]
        cout = out_ref.shape[-1]
        u_t = starts_ref[num_k, t]

        def one(k, acc):
            w_k = w_ref[pl.ds(k, 1), :, :][0]  # (Cin, Cout)
            rel = pl.multiple_of(starts_ref[k, t] - u_t, 16)
            if sub_size:
                gathered = _sub_gathered(
                    local_ref, k, t, starts_ref, num_k + 1,
                    lambda sr: slab_ref[
                        slot, pl.ds(pl.multiple_of(rel + sr, 16), sub_size), :
                    ],
                    sub_size, T, w_ref.dtype,
                )
            else:
                li = local_ref[0, pl.ds(k, 1), :]  # (1, T)
                window = slab_ref[slot, pl.ds(rel, slab_size), :]
                gathered = _onehot_gather(li, window, slab_size, w_ref.dtype)
            return acc + jnp.dot(
                gathered, w_k, preferred_element_type=jnp.float32
            )

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

    if ntef_row < 0:
        compute()
    else:
        pl.when(t < nte)(compute)

        @pl.when(jnp.logical_not(t < nte))
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)


def _conv_fwd_kernel_union_wide(
    starts_ref,  # (K+1 (+K·J) (+1), nt) SMEM — row K = union starts
    local_ref,  # (1, K, T) / (1, K·J, SUB_TILE) VMEM — local indices
    w2_ref,  # (K·Cin, Cout) VMEM — weights reshaped for ONE long dot
    feats_hbm,  # (Ci, Cin) ANY/HBM
    out_ref,  # (T, Cout) VMEM
    slab_ref,  # (2, U, Cin) VMEM — double-buffered per-TILE union slabs
    sem,  # (2,)
    *,
    slab_size: int,
    union_size: int,
    num_k: int,
    num_t: int,
    sub_size: int = 0,
    ntef_row: int = -1,
):
    """Wide-channel union forward: the per-offset structure of
    ``_conv_fwd_kernel_union`` splits a tile's work into ~2K dots (K
    gathers + K (T,Cin)@(Cin,Cout) weight dots), each paying MXU fill
    latency and a (1,T)→(T,1) index relayout — measured ~17–19% MXU on
    the executed FLOPs at Cin=Cout=128.  This variant restructures the
    same math as the gather dots feeding ONE (T, K·Cin)@(K·Cin, Cout)
    contraction: the index block is transposed once per tile (one
    relayout instead of K or K·J), each one-hot column is a static lane
    slice of it, and the weight contraction runs K·Cin deep.  With
    two-tier maps (``sub_size``) the gathers stay per-(offset, sub-tile)
    narrow (SUB_TILE, S') windows — the long weight dot is orthogonal to
    the gather tiering."""
    t = pl.program_id(0)
    nte = starts_ref[ntef_row, 0] if ntef_row >= 0 else num_t

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

    @pl.when(t + 1 < nte)
    def _():
        tile_copy(t + 1, jax.lax.rem(t + 1, 2)).start()

    def compute():
        tile_copy(t, slot).wait()
        T = out_ref.shape[0]
        u_t = starts_ref[num_k, t]
        # (T, K) or (SUB_TILE, K·J): ONE relayout for all offsets
        lT = local_ref[0].T
        width = sub_size if sub_size else slab_size
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (lT.shape[0], width), 1
        )
        parts = []
        for k in range(num_k):
            rel = starts_ref[k, t] - u_t
            if sub_size:
                J = T // SUB_TILE
                sub_parts = []
                for j in range(J):
                    sr = pl.multiple_of(
                        rel + starts_ref[num_k + 1 + k * J + j, t], 16
                    )
                    li_col = lT[:, k * J + j : k * J + j + 1]
                    window = slab_ref[slot, pl.ds(sr, sub_size), :]
                    P = (cols == li_col).astype(w2_ref.dtype)
                    sub_parts.append(
                        jnp.dot(
                            P, window, preferred_element_type=jnp.float32
                        )
                    )
                parts.append(jnp.concatenate(sub_parts, axis=0))
            else:
                rel = pl.multiple_of(rel, 16)
                li_col = lT[:, k : k + 1]  # (T, 1) — static lane slice
                window = slab_ref[slot, pl.ds(rel, slab_size), :]
                P = (cols == li_col).astype(w2_ref.dtype)
                parts.append(
                    jnp.dot(P, window, preferred_element_type=jnp.float32)
                )
        G = jnp.concatenate(parts, axis=1).astype(w2_ref.dtype)
        out_ref[...] = jnp.dot(
            G, w2_ref[...], preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)

    if ntef_row < 0:
        compute()
    else:
        pl.when(t < nte)(compute)

        @pl.when(jnp.logical_not(t < nte))
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)


# Wide-variant routing (TPU A/B, k=3 @128ch: two-tier wide on the
# production maps is uniform 0.478 vs 0.722 ms and surface-26k 0.979 vs
# 1.182 ms against the per-offset kernel, exact output match — wide
# defaults ON when eligible).
#   ME_WIDE_KERNEL=1 — force on (when eligible), =0 — force off.
_WIDE_KERNEL_ENV = os.environ.get("ME_WIDE_KERNEL")
_WIDE_MIN_CIN = 64
# v5e VMEM is ~16 MiB/core; the surface-26k two-tier config estimates
# 13.8 MiB by the accounting below and compiles + wins on hardware, so
# the budget sits just above it (Mosaic errors, not falls back, when a
# kernel truly overflows — keep margin under the physical 16 MiB).
_WIDE_VMEM_BUDGET = int(14.5 * 1024 * 1024)


def _wide_eligible(slab_map: SlabMap, cin_p: int, cout_p: int, K: int) -> bool:
    if _WIDE_KERNEL_ENV == "0":
        return False
    if not _union_enabled(slab_map, cin_p, 4):
        return False
    if cin_p < _WIDE_MIN_CIN:
        return False
    T = slab_map.tile
    vmem = (
        2 * slab_map.union_size * cin_p * 4  # union double buffer
        + K * cin_p * cout_p * 4  # reshaped weights
        + T * K * cin_p * 4  # concatenated gather block
        + T * K * cin_p * 4  # f32 gather parts pre-cast
        + 2 * T * cout_p * 4
    )
    return vmem <= _WIDE_VMEM_BUDGET


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


def _prefetch_rows(slab_map: SlabMap, with_union: bool) -> jnp.ndarray:
    """Scalar-prefetch block: per-offset starts (+ union starts row)
    (+ the (K·J, nt) sub_rel block when two-tier windows are enabled)."""
    rows = [slab_map.starts]
    if with_union:
        rows.append(slab_map.u_starts[None, :])
    if slab_map.sub_size and slab_map.sub_rel is not None:
        rows.append(slab_map.sub_rel)
    return rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)


def _append_ntef(prefetch, n_valid, tile, nt):
    """Append a prefetch row carrying ⌈n_valid/T⌉ (the DYNAMIC live-tile
    count) clamped to [1, nt].  Returns (prefetch, row_index)."""
    if n_valid is None:
        return prefetch, -1
    ntef = jnp.clip(
        (jnp.asarray(n_valid, jnp.int32) + (tile - 1)) // tile, 1, nt
    )
    row = jnp.broadcast_to(ntef, (1, prefetch.shape[1])).astype(jnp.int32)
    return jnp.concatenate([prefetch, row], axis=0), prefetch.shape[0]


def sparse_conv_fwd_pallas(
    feats: jnp.ndarray,  # (Ci, Cin)
    weights: jnp.ndarray,  # (K, Cin, Cout)
    slab_map: SlabMap,
    n_valid_out=None,  # optional traced count of valid OUTPUT rows
) -> jnp.ndarray:
    """Forward sparse conv via the slab kernel.  Returns (Co, Cout).

    ``n_valid_out``: rows ≥ it are all-padding (their kernel-map entries
    are -1); their tiles are skipped at runtime (zeros written) — pow2
    capacity buckets leave up to ~25% of tiles dead."""
    feats = _pad_lanes(feats, 1)
    weights = _pad_lanes(weights, 1).astype(feats.dtype)
    # local_tk is (nt, K, T) single-tier, (nt, K·J, SUB_TILE) two-tier
    nt, lrows, llanes = slab_map.local_tk.shape
    K = weights.shape[0]
    T = slab_map.tile
    S = slab_map.slab_size
    Ci, Cin = feats.shape
    Cout = weights.shape[-1]
    Co = nt * T

    sub = slab_map.sub_size if slab_map.sub_rel is not None else 0
    use_union = _union_enabled(slab_map, Cin, feats.dtype.itemsize)
    prefetch = _prefetch_rows(slab_map, use_union)
    prefetch, ntef_row = _append_ntef(prefetch, n_valid_out, T, nt)
    if use_union and _wide_eligible(slab_map, Cin, Cout, K):
        U = slab_map.union_size
        w2 = weights.reshape(K * Cin, Cout)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec(
                    (1, lrows, llanes), lambda t, s: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (K * Cin, Cout), lambda t, s: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(
                (T, Cout), lambda t, s: (t, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, U, Cin), feats.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            functools.partial(
                _conv_fwd_kernel_union_wide,
                slab_size=S, union_size=U, num_k=K, num_t=nt,
                sub_size=sub, ntef_row=ntef_row,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Co, Cout), feats.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * K * Co * Cin * (Cout + (sub if sub else S)),
                bytes_accessed=nt * U * Cin * feats.dtype.itemsize
                + Co * Cout * 4,
                transcendentals=0,
            ),
        )(prefetch, slab_map.local_tk, w2, feats)
    if use_union:
        U = slab_map.union_size
        scratch = [
            pltpu.VMEM((2, U, Cin), feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        kernel = functools.partial(
            _conv_fwd_kernel_union,
            slab_size=S, union_size=U, num_k=K, num_t=nt, sub_size=sub,
            ntef_row=ntef_row,
        )
        dma_bytes = nt * U * Cin * feats.dtype.itemsize
    else:
        n_buf = _ring_depth(S, Cin, K)
        scratch = [
            pltpu.VMEM((n_buf, S, Cin), feats.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ]
        kernel = functools.partial(
            _conv_fwd_kernel, slab_size=S, num_k=K, num_t=nt, sub_size=sub,
            ntef_row=ntef_row,
        )
        dma_bytes = K * nt * S * Cin * feats.dtype.itemsize

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (1, lrows, llanes), lambda t, s: (t, 0, 0),
                memory_space=pltpu.VMEM
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
            flops=2 * K * Co * Cin * (Cout + (sub or S)),
            bytes_accessed=dma_bytes + Co * Cout * 4,
            transcendentals=0,
        ),
    )(prefetch, slab_map.local_tk, weights, feats)


# ---------------------------------------------------------------------------
# weight-gradient kernel: dW[k] = Σ_t gathered_k_tᵀ @ g_t
# ---------------------------------------------------------------------------


def _conv_dw_kernel(
    starts_ref,  # (K (+K·J), nt) SMEM
    local_ref,  # (1, K, T) VMEM — this tile's local indices
    gt_ref,  # (Cout, T) VMEM — PRE-TRANSPOSED grad tile
    feats_hbm,  # (Ci, Cin) ANY
    dwt_ref,  # (K, Cout, Cin) VMEM — dWᵀ, revisited across every tile
    slab_ref,  # (2, S, Cin) double-buffered
    sem,  # (2,)
    *,
    slab_size: int,
    num_t: int,
    num_k: int,
    sub_size: int = 0,
    ntef_row: int = -1,
):
    """dWᵀ[k] = Σ_t gᵀ_t @ gathered_{k,t} — one grid step per tile, offsets
    in an inner loop, accumulating directly into the Wᵀ-shaped output block
    (constant block index ⇒ stays resident in VMEM across the grid).

    The cotangent arrives PRE-TRANSPOSED (one cheap XLA transpose outside
    the kernel) and the output is dWᵀ (swapped back outside): this keeps
    every MXU contraction in standard row-major orientation.  The naive
    ``gatheredᵀ @ g`` (contraction on dim 0 of both) made Mosaic relayout
    the freshly-gathered (T, Cin) block on EVERY (offset, tile) step —
    measured 1.56× the forward at k=3 where the FLOPs say it should match.

    ``ntef_row``: see _conv_fwd_kernel — dead tiles gather all-zeros (every
    local index is the zero-row sentinel), so skipping them entirely is
    exact regardless of the cotangent's padding rows."""
    t = pl.program_id(0)
    n_buf = slab_ref.shape[0]
    T = gt_ref.shape[-1]

    def slab_copy(kk, sl):
        start = pl.multiple_of(starts_ref[kk, t], 16)
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, slab_size), :],
            slab_ref.at[sl],
            sem.at[sl],
        )

    @pl.when(t == 0)
    def _():
        dwt_ref[...] = jnp.zeros_like(dwt_ref)

    def compute():
        for j in range(min(n_buf, num_k)):
            slab_copy(j, j).start()

        def body(k, _):
            slot = jax.lax.rem(k, n_buf)
            slab_copy(k, slot).wait()
            if sub_size:
                gathered = _sub_gathered(
                    local_ref, k, t, starts_ref, num_k,
                    lambda rel: slab_ref[slot, pl.ds(rel, sub_size), :],
                    sub_size, T, gt_ref.dtype,
                )
            else:
                li = local_ref[0, pl.ds(k, 1), :]
                gathered = _onehot_gather(
                    li, slab_ref[slot], slab_size, gt_ref.dtype
                )
            contrib = jnp.dot(  # (Cout, T) @ (T, Cin) — standard orientation
                gt_ref[...], gathered, preferred_element_type=jnp.float32
            )
            dwt_ref[pl.ds(k, 1), :, :] += contrib[None]

            @pl.when(k + n_buf < num_k)
            def _():
                slab_copy(k + n_buf, slot).start()

            return 0

        jax.lax.fori_loop(0, num_k, body, 0)

    if ntef_row < 0:
        compute()
    else:
        pl.when(t < starts_ref[ntef_row, 0])(compute)


def _conv_dw_kernel_union(
    starts_ref,  # (K+1 (+K·J), nt) SMEM — row K = union starts
    local_ref,  # (1, K, T) VMEM
    gt_ref,  # (Cout, T) VMEM — PRE-TRANSPOSED grad tile
    feats_hbm,  # (Ci, Cin) ANY
    dwt_ref,  # (K, Cout, Cin) VMEM — dWᵀ, revisited across every tile
    slab_ref,  # (2, U, Cin)
    sem,  # (2,)
    *,
    slab_size: int,
    union_size: int,
    num_t: int,
    num_k: int,
    sub_size: int = 0,
    ntef_row: int = -1,
):
    """Union-slab dW: one per-tile DMA (see _conv_fwd_kernel_union);
    transposed-cotangent orientation (see _conv_dw_kernel).

    ``ntef_row``: see _conv_dw_kernel."""
    t = pl.program_id(0)
    nte = starts_ref[ntef_row, 0] if ntef_row >= 0 else num_t
    T = gt_ref.shape[-1]

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

    @pl.when(t + 1 < nte)
    def _():
        tile_copy(t + 1, jax.lax.rem(t + 1, 2)).start()

    @pl.when(t == 0)
    def _():
        dwt_ref[...] = jnp.zeros_like(dwt_ref)

    def compute():
        tile_copy(t, slot).wait()
        u_t = starts_ref[num_k, t]

        def body(k, _):
            rel = pl.multiple_of(starts_ref[k, t] - u_t, 16)
            if sub_size:
                gathered = _sub_gathered(
                    local_ref, k, t, starts_ref, num_k + 1,
                    lambda sr: slab_ref[
                        slot, pl.ds(pl.multiple_of(rel + sr, 16), sub_size), :
                    ],
                    sub_size, T, gt_ref.dtype,
                )
            else:
                li = local_ref[0, pl.ds(k, 1), :]
                window = slab_ref[slot, pl.ds(rel, slab_size), :]
                gathered = _onehot_gather(li, window, slab_size, gt_ref.dtype)
            contrib = jnp.dot(  # (Cout, T) @ (T, Cin) — standard orientation
                gt_ref[...], gathered, preferred_element_type=jnp.float32
            )
            dwt_ref[pl.ds(k, 1), :, :] += contrib[None]
            return 0

        jax.lax.fori_loop(0, num_k, body, 0)

    if ntef_row < 0:
        compute()
    else:
        pl.when(t < nte)(compute)


def sparse_conv_dw_pallas(
    feats: jnp.ndarray,  # (Ci, Cin)
    g: jnp.ndarray,  # (Co, Cout) output cotangent
    slab_map: SlabMap,
    weights_shape,
    n_valid_out=None,  # optional traced count of valid OUTPUT rows
) -> jnp.ndarray:
    true_cin = feats.shape[1]
    feats = _pad_lanes(feats, 1)
    # local_tk is (nt, K, T) single-tier, (nt, K·J, SUB_TILE) two-tier
    nt, lrows, llanes = slab_map.local_tk.shape
    K = weights_shape[0]
    T = slab_map.tile
    S = slab_map.slab_size
    Ci, Cin = feats.shape
    Cout = g.shape[-1]
    # one XLA transpose outside the kernel keeps every per-(offset, tile)
    # MXU contraction standard-orientation inside it (see _conv_dw_kernel)
    g_t = jnp.swapaxes(g, 0, 1)

    sub = slab_map.sub_size if slab_map.sub_rel is not None else 0
    use_union = _union_enabled(slab_map, Cin, feats.dtype.itemsize)
    prefetch = _prefetch_rows(slab_map, use_union)
    prefetch, ntef_row = _append_ntef(prefetch, n_valid_out, T, nt)
    if use_union:
        U = slab_map.union_size
        scratch = [
            pltpu.VMEM((2, U, Cin), feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        kernel = functools.partial(
            _conv_dw_kernel_union,
            slab_size=S, union_size=U, num_t=nt, num_k=K, sub_size=sub,
            ntef_row=ntef_row,
        )
        dma_bytes = nt * U * Cin * feats.dtype.itemsize
    else:
        n_buf = _ring_depth(S, Cin, K)
        scratch = [
            pltpu.VMEM((n_buf, S, Cin), feats.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ]
        kernel = functools.partial(
            _conv_dw_kernel, slab_size=S, num_t=nt, num_k=K, sub_size=sub,
            ntef_row=ntef_row,
        )
        dma_bytes = K * nt * S * Cin * feats.dtype.itemsize

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (1, lrows, llanes), lambda t, s: (t, 0, 0),
                memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Cout, T), lambda t, s: (0, t), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (K, Cout, Cin), lambda t, s: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )
    dwt = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, Cout, Cin), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * nt * T * ((sub or S) + Cout) * Cin,
            bytes_accessed=dma_bytes + nt * T * Cout * 4,
            transcendentals=0,
        ),
    )(prefetch, slab_map.local_tk, g_t, feats)
    return jnp.swapaxes(dwt, 1, 2)[:, :true_cin, :]


def pallas_conv_supported(slab_map: Optional[SlabMap], weights_shape) -> bool:
    """Whether the fused kernel fits this configuration in VMEM."""
    if slab_map is None:
        return False
    K, Cin, Cout = weights_shape
    cin_p = _round_up(Cin, 128)
    cout_p = _round_up(Cout, 128)
    S, T = slab_map.slab_size, slab_map.tile
    nt = slab_map.local_tk.shape[0]
    if not _prefetch_fits(K, T, nt, bool(slab_map.sub_size)):
        return False  # scalar-prefetch block would overflow SMEM
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
