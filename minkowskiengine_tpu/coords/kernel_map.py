"""Kernel maps as dense per-offset gather matrices.

The reference stores kernel maps as ragged per-offset (in_rows, out_rows)
pair lists (reference: src/kernel_map.hpp:40-104, src/kernel_map.cuh:48-429)
and executes convolution as gather → GEMM → atomic-scatter.  The TPU-native
design exploits a structural fact the reference leaves implicit: **for a
fixed kernel offset the in↔out relation is a partial matching** — each output
coordinate probes exactly one input coordinate, and distinct outputs probe
distinct inputs.  A kernel map is therefore two dense index matrices:

    in_idx   : (K, C_out) int32 — input row feeding each output row at
               offset k, or -1;
    out_idx_t: (K, C_in)  int32 — the inverse matching (output row consuming
               each input row at offset k), or -1.

Both convolution directions become *pure gathers* (no scatters, no atomics):

    fwd : out[o]  = Σ_k  in[in_idx[k, o]]    @ W[k]
    bwd : d_in[i] = Σ_k  d_out[out_idx_t[k, i]] @ W[k]ᵀ

which keeps the MXU fed with large dense GEMMs and eliminates the
atomic-scatter hazards the reference pays for on GPU.  Shapes are static;
missing pairs are -1 and gather as zero rows.

The transpose-convolution map is the same object with the two matrices
swapped — the TPU form of the reference's ``swap_in_out_map_functor`` cache
trick (reference: src/coordinate_map_manager.cpp:759-813).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import keys as K
from .lookup import find_rows
from .map import CoordinateMap


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class KernelMap:
    """Dense per-offset matching between an input and an output map.

    ``fwd_slab`` / ``bwd_slab`` are the tile-slab decompositions consumed by
    the fused Pallas conv kernel (ops/pallas/conv_kernel.py); they exist for
    maps built by ``build_kernel_map`` (whose per-offset indices for a tile
    of consecutive rows cluster in a small window — the canonical sort
    order is spatially local along its scan order and an offset is a
    bounded spatial shift; span-tail pairs ride the outlier list) and
    are None for stride-map-derived pooling maps (a stride map's rows
    reference a map at a different resolution, where locality is weaker).
    """

    in_idx: jnp.ndarray  # (K, C_out) int32, -1 = no pair
    out_idx_t: jnp.ndarray  # (K, C_in) int32, -1 = no pair
    n_in: jnp.ndarray  # int32 scalar leaf (valid in rows)
    n_out: jnp.ndarray  # int32 scalar leaf (valid out rows)
    fwd_slab: object = None  # SlabMap over in_idx
    bwd_slab: object = None  # SlabMap over out_idx_t

    def __post_init__(self):
        for name in ("n_in", "n_out"):
            v = getattr(self, name)
            if isinstance(v, (int, np.integer)):
                object.__setattr__(self, name, jnp.asarray(v, jnp.int32))

    @property
    def kernel_volume(self) -> int:
        return int(self.in_idx.shape[0])

    @property
    def capacity_out(self) -> int:
        return int(self.in_idx.shape[1])

    @property
    def capacity_in(self) -> int:
        return int(self.out_idx_t.shape[1])

    def swap(self) -> "KernelMap":
        """The transposed map (out↔in roles flipped)."""
        return KernelMap(
            self.out_idx_t,
            self.in_idx,
            self.n_out,
            self.n_in,
            self.bwd_slab,
            self.fwd_slab,
        )

    def pair_counts(self) -> np.ndarray:
        """(K,) host array of valid pair counts per offset (diagnostic)."""
        return np.asarray(jnp.sum(self.in_idx >= 0, axis=1))

    def to_pair_lists(self):
        """Ragged {k: (in_rows, out_rows)} host dict — reference
        ``kernel_map_th`` format (src/coordinate_map_manager.cpp:1358-1414)."""
        in_idx = np.asarray(self.in_idx)
        out = {}
        for k in range(in_idx.shape[0]):
            o = np.nonzero(in_idx[k] >= 0)[0]
            if o.size:
                out[k] = (in_idx[k][o].astype(np.int64), o.astype(np.int64))
        return out

    def tree_flatten(self):
        return (
            (
                self.in_idx,
                self.out_idx_t,
                self.n_in,
                self.n_out,
                self.fwd_slab,
                self.bwd_slab,
            ),
            (),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        in_idx, out_idx_t, n_in, n_out, fwd_slab, bwd_slab = children
        return cls(in_idx, out_idx_t, n_in, n_out, fwd_slab, bwd_slab)


@jax.jit
def _build_queries(out_coords, n_out, offsets):
    """Packed probe key lanes (K, C_out), invalid probes set to the max
    key.

    Probe keys along a row are spatially local per tile (output coordinates
    are in canonical key order and an offset is a bounded shift), which
    the tile-join lookup and the slab conv kernel exploit; they are NOT
    necessarily sorted.
    """
    C_out = out_coords.shape[0]
    queries = out_coords[None, :, :] + offsets[:, None, :]  # (K, C_out, D+1)
    q_lanes = K.pack(queries)
    valid_out = (jnp.arange(C_out, dtype=jnp.int32) < n_out)[None, :]
    invalid = ~valid_out | K.overflow_mask(queries)
    pad = K.key_max(len(q_lanes))
    return tuple(jnp.where(invalid, p, q) for q, p in zip(q_lanes, pad))


@functools.partial(jax.jit, static_argnums=(2, 3))
def grid_lookup(row_grid, mins, grid_shape, tensor_stride, q):
    """Map rows for query coordinates via the dense bbox row grid.

    The TPU-native hash probe: O(1) gather per query instead of a sorted
    join or binary search (reference's hash tables:
    src/coordinate_map_cpu.hpp:388-411, src/coordinate_map_gpu.cu:320-359).

    Args:
      row_grid: (cells + 1,) int32 from ops.dense_conv.build_row_grid;
        the sentinel cell at index ``cells`` holds -1.
      mins: (D+1,) int32 device bbox minima (grid origin, batch first).
      grid_shape: static (B, E_1..E_D).
      tensor_stride: static D-tuple.
      q: (..., D+1) int32 query coordinates.

    Returns:
      (...,) int32 rows, -1 where absent / out of the grid.
    """
    ext = grid_shape[1:]
    cells = math.prod(grid_shape)
    b = q[..., 0] - mins[0]
    rel = q[..., 1:] - mins[1:]
    tsv = jnp.asarray(tensor_stride, jnp.int32)
    div = rel // tsv
    ok = (
        (b >= 0)
        & (b < grid_shape[0])
        & jnp.all(rel % tsv == 0, axis=-1)
        & jnp.all((div >= 0) & (div < jnp.asarray(ext, jnp.int32)), axis=-1)
    )
    flat = b
    for d in range(len(ext)):
        flat = flat * ext[d] + div[..., d]
    flat = jnp.where(ok, flat, cells)  # sentinel cell -> -1
    return jnp.take(row_grid, flat, mode="clip")


def _pads_for_offsets(cell_offsets, ndim):
    """Per-axis |Δ|max over the offsets' cell deltas.

    Padding the probe grid by this margin makes every base cell that could
    possibly match (∃Δ: base+Δ inside the bbox) representable — without it,
    bases below/above the probed map's bbox (strided conv outputs when a
    spatial minimum isn't stride-aligned, coarse transpose bases below the
    fine bbox) land on the sentinel cell and ALL their offsets silently go
    -1 even though base+Δ hits real rows.
    """
    pads = [0] * ndim
    for off in cell_offsets:
        for ax, d in enumerate(off):
            pads[ax] = max(pads[ax], abs(int(d)))
    return tuple(pads)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _shifted_grid_stack(row_grid, grid_shape, pads, cell_offsets):
    """(cells_ext, K) int32: the row grid — virtually extended by
    ``pads`` cells of -1 per axis side — shifted by each offset's cell
    delta, -1 filled at the shifted-out boundaries.  Sentinel cells
    (out-of-grid probes) are handled by the CONSUMER gathering with
    ``mode="fill", fill_value=-1`` — a trailing sentinel row here would
    cost a full (cells_ext, K) concat copy (measured 3.5 ms/phase).

    shifted[c, k] = grid_ext[c ⊕ cell_offsets[k]] with per-dimension
    out-of-bounds → -1 (NOT flat wraparound: shifts run per axis on the
    N-D view).  Cell indices are relative to the EXTENDED grid
    (mins - pads·ts); per-row offset VALIDITY (residue classes) is the
    caller's mask, not encoded here.

    Implementation note: the grid is padded by 2×pads — the margin where
    probe BASES may live (|Δ| outside the bbox) plus those bases' own |Δ|
    reach — so every shifted copy is ONE statically-in-bounds zero-FLOP
    ``lax.slice`` of the shared padded buffer.  The SHAPES AND LAYOUTS of
    this computation are load-bearing (two OOM post-mortems):

      * never materialize a (1, cells)- or (cells, 1)-shaped op.  Inside
        the big traced fresh-geometry program XLA's layout assignment
        makes the size-1 dim MINOR on such shapes (to legalize the
        downstream transpose as a bitcast), tile-padding 1 → 128 lanes —
        a 262 MB temp per offset, ~20 alive under HLO remat = 16 GB HBM
        for 0.5 GB of data.  Both the per-offset pad/concat-chain column
        builder and a flat slice + reshape(1, cells) row builder died
        this way.
      * a fori_loop writing rows of a carried buffer was memory-safe but
        iteration-overhead-bound (~11 ms for a 125-offset stem map).

    The safe form: keep every per-offset slice N-D with the K axis
    LEADING (size-1 dims in the majormost position carry no tile
    padding), concatenate to (K, *ext), and pin that layout with an
    ``optimization_barrier`` so layout assignment cannot propagate the
    transposed (K-minor) layout into the operands.  Only the single
    post-barrier (cells_ext, K) transpose result pays lane padding
    (K → 128, ~260 MB transient at 536k cells) — bounded, once per
    chunk, and cheaply rematerializable.
    """
    cells = math.prod(grid_shape)
    g = row_grid[:cells].reshape(grid_shape)
    g2 = jnp.pad(g, [(2 * p, 2 * p) for p in pads], constant_values=-1)
    ext_shape = tuple(n + 2 * p for n, p in zip(grid_shape, pads))
    cells_ext = math.prod(ext_shape)
    Kc = len(cell_offsets)
    rows = []
    for off in cell_offsets:
        # slice start for offset δ: pads + δ ∈ [0, 2·pads] per axis
        starts = tuple(p + d for p, d in zip(pads, off))
        limits = tuple(s + n for s, n in zip(starts, ext_shape))
        rows.append(jax.lax.slice(g2, starts, limits)[None])
    stack_nd = jnp.concatenate(rows, axis=0)  # (K, *ext) — K majormost
    stack_nd = jax.lax.optimization_barrier(stack_nd)
    return jnp.transpose(stack_nd.reshape(Kc, cells_ext))  # (cells_ext, K)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _cells_of(coords, mins, grid_shape, tensor_stride):
    """(flat floor-div cell or ``cells`` sentinel, residue class id) per
    coordinate row.

    Rows need NOT lie on the probed lattice: the cell is the FLOOR
    division and the residue p = (coord - mins) mod ts is returned as a
    mixed-radix class id (Σ_d p_d over radices ts_d).  An offset Δ can
    only match rows of its one compatible class (p ≡ -Δ mod ts) — the
    caller masks by class after the stack gather."""
    ext = grid_shape[1:]
    cells = math.prod(grid_shape)
    b = coords[:, 0] - mins[0]
    rel = coords[:, 1:] - mins[1:]
    tsv = jnp.asarray(tensor_stride, jnp.int32)
    div = rel // tsv
    p = rel % tsv  # non-negative (JAX mod takes the divisor's sign)
    ok = (
        (b >= 0)
        & (b < grid_shape[0])
        & jnp.all((div >= 0) & (div < jnp.asarray(ext, jnp.int32)), axis=-1)
    )
    flat = b
    for d in range(len(ext)):
        flat = flat * ext[d] + div[:, d]
    cls = jnp.zeros_like(b)
    for d, t in enumerate(tensor_stride):
        cls = cls * int(t) + p[:, d]
    return jnp.where(ok, flat, cells), cls


def _cell_offsets_for(offsets, tensor_stride, grid_shape):
    """Static per-offset (cell delta, required residue class id).

    For a probe base b with residue p = (b - mins) mod ts, offset Δ
    matches only rows of class p ≡ (-Δ) mod ts, and then lands exactly
    δ = ⌈Δ/ts⌉ cells from the base's floor-div cell (p + Δ = ts·⌈Δ/ts⌉).
    This is what lets ONE shifted-grid stack serve aligned bases AND
    off-lattice ones (transpose convs probing a coarser map, strided
    outputs with misaligned minima) — the shift is per-OFFSET constant;
    only the validity mask is per-row."""
    offs = np.asarray(offsets)
    ts = np.asarray(tensor_stride, np.int64)
    deltas, classes = [], []
    for k in range(offs.shape[0]):
        o = offs[k]
        sp = np.asarray(o[1:], np.int64)
        delta = tuple([int(o[0])] + [int(v) for v in -(-sp // ts)])
        req = np.mod(-sp, ts)
        cls = 0
        for d in range(len(ts)):
            cls = cls * int(ts[d]) + int(req[d])
        deltas.append(delta)
        classes.append(cls)
    return tuple(deltas), tuple(classes)


# per-chunk ceiling on shifted-grid elements (cells × chunk offsets,
# ~128 MB): large grids process their offsets in chunks; grids too big for
# even a single-offset chunk fall back to per-element gathers.  Kept
# moderate so the per-chunk stack + its transpose stay well under HBM
# even when the traced replay remats the build.
_MAX_SHIFT_STACK = 32 * 1024 * 1024

# kernel-map grid-build strategy: "slices" (per-group (1, W)-window
# gathers from the flat padded grid — no grid-sized temps) or "stack"
# (K shifted grid copies + transpose).  ME_GRID_BUILD forces one mode
# everywhere (A/B measurement); unset, every build uses the stack.
#
# History: r3's A/B on 26k room scans (70k-cell grids) measured slices
# marginally ahead inside the fused replay (37.1 vs 38.1 ms phase) and it
# became the deferred default.  r4 found that on larger grids (uniform
# 26k cloud, 459k-cell stride-1 grid) XLA's GatherExpander rewrites the
# per-row window gather into a SERIAL 32k-iteration while loop inside the
# fused phase program (25.7 ms per gather, 11 of them — traced xplane
# evidence): the uniform fresh-geometry MinkUNet34 phase was 792 ms under
# slices vs 18.5 ms under stack, while surface phases measure the same.
# The standalone (un-fused) gather vectorizes fine at every size tested —
# the expansion only fires inside the big replay program, so no
# shape-based heuristic is trustworthy.  Stack everywhere — EXCEPT
# standalone (non-deferred) builds at large K: XLA's layout assignment
# legalizes the final (K, cells)→(cells, K) transpose as a bitcast by
# forcing a K-minor layout onto every concat operand, tile-padding each
# (1, *ext) shifted slice 1 → 128 lanes (measured: 615 KB → 76.9 MB per
# slice at a 54³ room grid; 209 live slices = 16 GB → OOM at k=7/343
# offsets, silently ~10 GB at k=5).  The GatherExpander serialization
# that disqualified slices only fires INSIDE the fused replay program,
# and ``deferred`` is True exactly there — so standalone large-K builds
# take the slices path (fine at every size tested standalone) while
# fused builds keep the stack.
_GRID_BUILD_MODE = os.environ.get("ME_GRID_BUILD")  # None → auto
_STACK_MAX_STANDALONE_BYTES = 16 * 1024**3
# Standalone stack builds transiently cost ~num_offsets × cells × 4 B × 128
# (the layout pass tile-pads each (1, *ext) shifted slice 1 → 128 lanes:
# measured 615 KB → 76.9 MB per slice on a 54³ room grid).  Cap that
# estimate, not K, so the gate scales with grid size (ADVICE r4).  The
# threshold is calibrated by benchmarks/ab_standalone_build.py on the
# v5e: the slices path is 4–8× SLOWER standalone (uniform_k3 76 → 300
# ms, surface_k5 291 → 2491 ms) and the stack path runs clean at k=5's
# ~10 GB estimate (XLA frees dead slices; only k=7's ~27 GB actually
# OOMed, e566dda) — so the cap sits between those two points.


def _grid_build_mode(
    deferred: bool, num_offsets: int = 0, cells: int = 0
) -> str:
    if _GRID_BUILD_MODE:
        return _GRID_BUILD_MODE
    if (
        not deferred
        and num_offsets * max(cells, 1) * 4 * 128
        > _STACK_MAX_STANDALONE_BYTES
    ):
        return "slices"
    return "stack"


def _window_groups(cell_offs):
    """Offsets grouped by their cell delta on every axis but the last:
    [(prefix δ, z0, W, [(k, col)])] — each group is ONE (1, W)-slice
    gather; offset k reads column (δ_z - z0) of its group's window."""
    groups = {}
    for k, d in enumerate(cell_offs):
        groups.setdefault(tuple(d[:-1]), []).append((k, int(d[-1])))
    out = []
    for pre, members in sorted(groups.items()):
        zs = [dz for _, dz in members]
        z0 = min(zs)
        out.append(
            (pre, z0, max(zs) - z0 + 1, [(k, dz - z0) for k, dz in members])
        )
    return out


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _cells_of_padded(coords, ext_mins, ext_shape, pads, tensor_stride):
    """(flat base position in the 2×pads-per-side padded grid buffer,
    in-extended-grid bool, residue class id) per coordinate row.

    The padded buffer has extents ``ext_shape + 2·pads`` (the extended
    grid plus one more ``pads`` margin per side), so every in-extended-
    grid base's full δ-window (|δ| ≤ pads) is statically in-bounds — the
    slice gathers below need no per-group bounds checks."""
    ext = ext_shape[1:]
    b = coords[:, 0] - ext_mins[0]
    rel = coords[:, 1:] - ext_mins[1:]
    tsv = jnp.asarray(tensor_stride, jnp.int32)
    div = rel // tsv
    p = rel % tsv
    ok = (
        (b >= 0)
        & (b < ext_shape[0])
        & jnp.all((div >= 0) & (div < jnp.asarray(ext, jnp.int32)), axis=-1)
    )
    flat = b
    for d in range(len(ext)):
        flat = flat * (ext[d] + 2 * pads[1 + d]) + (div[:, d] + pads[1 + d])
    cls = jnp.zeros_like(b)
    for d, t in enumerate(tensor_stride):
        cls = cls * int(t) + p[:, d]
    return flat, ok, cls


@functools.partial(jax.jit, static_argnums=(1, 2))
def _padded_flat_grid(row_grid, grid_shape, pads):
    """The row grid padded by 2×pads cells of -1 per axis side, flat."""
    cells = math.prod(grid_shape)
    g = row_grid[:cells].reshape(grid_shape)
    g3 = jnp.pad(
        g, [(0, 0)] + [(2 * p, 2 * p) for p in pads[1:]], constant_values=-1
    )
    return g3.reshape(-1)


def _padded_grid_shape(grid_shape, pads):
    return (grid_shape[0],) + tuple(
        n + 4 * p for n, p in zip(grid_shape[1:], pads[1:])
    )


def _build_in_idx_slices(probe, out_coords, n_out, offsets):
    """Sliced-window variant of the shifted-grid build — bit-identical.

    Instead of materializing K shifted copies of the grid (the
    (cells, K) stack + its lane-padded transpose dominated the traced
    coordinate phase at ~10 ms), group offsets by their cell delta on
    every axis but the last and fetch each group with ONE (1, W)-slice
    gather from the flat padded grid: a k=3 map is 9 gathers of
    (C_out, 3) windows — no grid-sized temps at all, and the flat start
    index is ``base + constant`` per group (strides are static).
    """
    row_grid, mins, grid_shape, ts = probe
    offsets = np.asarray(offsets)
    K = int(offsets.shape[0])
    C_out = out_coords.shape[0]
    valid_out = (jnp.arange(C_out, dtype=jnp.int32) < jnp.int32(n_out))[None, :]
    cell_offs, req_cls = _cell_offsets_for(offsets, ts, grid_shape)
    pads = _pads_for_offsets(cell_offs, len(grid_shape))
    ext_shape = tuple(n + 2 * p for n, p in zip(grid_shape, pads))
    pad_units = jnp.asarray(
        [pads[0]] + [p * int(t) for p, t in zip(pads[1:], ts)], jnp.int32
    )
    flat_g3 = _padded_flat_grid(row_grid, grid_shape, pads)
    g3_shape = _padded_grid_shape(grid_shape, pads)
    n3 = math.prod(g3_shape)
    base, ok, row_cls = _cells_of_padded(
        out_coords, mins - pad_units, ext_shape, pads, ts
    )
    # static per-dim strides of the padded buffer
    strides = [1] * len(g3_shape)
    for d in range(len(g3_shape) - 2, -1, -1):
        strides[d] = strides[d + 1] * int(g3_shape[d + 1])
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )
    rows_k = [None] * K
    for pre, z0, W, members in _window_groups(cell_offs):
        const = z0
        for d, pd in enumerate(pre):
            const += int(pd) * strides[d]
        starts = jnp.where(ok, base + const, n3)  # OOB start ⇒ fill row
        win = jax.lax.gather(
            flat_g3,
            starts[:, None],
            dnums,
            slice_sizes=(W,),
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
            fill_value=-1,
        )  # (C_out, W)
        for k, col in members:
            rows_k[k] = win[:, col]
    rows = jnp.stack(rows_k, axis=0)  # (K, C_out)
    cls_ok = row_cls[None, :] == jnp.asarray(req_cls, jnp.int32)[:, None]
    return jnp.where(valid_out & cls_ok, rows, -1)


def _build_in_idx_grid(
    probe, out_coords, n_out, offsets, base_stride=None, deferred=False
):
    """Grid-probe variant of ``_build_in_idx`` — bit-identical results.

    ``probe`` = (row_grid, mins, grid_shape, tensor_stride) of the PROBED
    (input-side) map.  A probe coordinate outside the packed-key budget
    cannot be a map row (inserts reject overflow), and it is also outside
    the map's bbox grid, so both paths agree on -1.

    Fast path: rather than K×C_out individual 4-byte gathers (XLA row
    gathers cost ~7 ns/element — 29 ms for a 125-offset map at 32k rows),
    build the K δ-shifted copies of the row grid (pure vectorized
    pad/slice shifts) and fetch all K offsets of each output row with ONE
    (1, K)-slice gather — ~50× fewer gather rows.  Works for ANY base
    coordinates: each offset's cell shift is the constant ⌈Δ/ts⌉ and a
    per-row residue-class mask rejects (row, offset) pairs whose base is
    not on the offset's compatible lattice class (see _cell_offsets_for).
    Off-lattice bases (transpose convs, misaligned strided minima)
    previously fell back to per-element lookups — 4.3 ms of a MinkUNet34
    coordinate phase vs ~0.7 ms on this path.
    """
    row_grid, mins, grid_shape, ts = probe
    del base_stride  # kept for call-site compat; fast path is universal
    offsets = np.asarray(offsets)  # static host constants by construction
    K = int(offsets.shape[0])
    C_out = out_coords.shape[0]
    if _grid_build_mode(deferred, K, math.prod(grid_shape)) == "slices":
        return _build_in_idx_slices(probe, out_coords, n_out, offsets)
    valid_out = (jnp.arange(C_out, dtype=jnp.int32) < jnp.int32(n_out))[None, :]
    cell_offs, req_cls = _cell_offsets_for(offsets, ts, grid_shape)
    # Extend the grid by the offsets' own |δ| so boundary bases (below /
    # above the probed bbox — misaligned strided minima, coarse transpose
    # bases) keep a representable cell; without this their rows silently
    # go all -1 while real matches exist.
    pads = _pads_for_offsets(cell_offs, len(grid_shape))
    ext_shape = tuple(n + 2 * p for n, p in zip(grid_shape, pads))
    cells_ext = math.prod(ext_shape)
    chunk = min(K, max(_MAX_SHIFT_STACK // max(cells_ext, 1), 0))
    if chunk == 0:  # grid too large for even one shifted copy
        q = out_coords[None, :, :] + jnp.asarray(offsets)[:, None, :]
        rows = grid_lookup(row_grid, mins, grid_shape, ts, q)
        return jnp.where(valid_out, rows, -1)
    # (A per-row N-D patch-gather variant — one vmapped dynamic_slice of
    # the offsets' bounding box per output row, no grid-sized temps — was
    # measured at ~180 ms/map on TPU vs 3.7 ms for the slice-stack below:
    # vmapped multi-dim dynamic_slice lowers to a serial per-row gather.
    # Rejected; the 2×pads slice-stack is both memory-safe and fast.)
    pad_units = jnp.asarray(
        [pads[0]] + [p * int(t) for p, t in zip(pads[1:], ts)], jnp.int32
    )
    cell_idx, row_cls = _cells_of(out_coords, mins - pad_units, ext_shape, ts)
    parts = []
    for i in range(0, K, chunk):  # chunked: bounds transient stack memory
        stack = _shifted_grid_stack(
            row_grid, grid_shape, pads, cell_offs[i : i + chunk]
        )
        # sentinel cell (== cells_ext, out-of-grid) is OOB here: fill mode
        # yields the -1 row directly (cell_idx is never negative, so the
        # fill-mode negative-wraparound trap does not apply)
        parts.append(
            jnp.take(stack, cell_idx, axis=0, mode="fill", fill_value=-1)
        )
    rows = jnp.concatenate(parts, axis=-1).T  # (K, C_out)
    cls_ok = row_cls[None, :] == jnp.asarray(req_cls, jnp.int32)[:, None]
    return jnp.where(valid_out & cls_ok, rows, -1)


def _build_in_idx(
    in_lanes, n_in, out_coords, n_out, offsets,
    join_slab=None, join_stats=None,
):
    """in_idx[k, o] = row of (out_coords[o] + offsets[k]) in the in-map, or -1.

    Invalid probes carry the max key; a max-key probe can only match a real
    max-key row (possible only at a full 64-bit budget), and such rows are
    re-masked by the caller's valid_out anyway via the key_max sentinel
    producing found=False in practice.

    ``join_slab``: fixed (ratcheted-floor) sorted-join slab — makes the
    build fully traceable; the validity bool lands in ``join_stats["ok"]``.
    """
    from .lookup import find_rows_sorted, find_rows_sorted_fixed

    q_lanes = _build_queries(out_coords, n_out, offsets)
    if join_slab is not None:
        rows, ok = find_rows_sorted_fixed(in_lanes, n_in, q_lanes, join_slab)
        if join_stats is not None:
            join_stats["ok"] = ok
    else:
        rows = find_rows_sorted(in_lanes, n_in, q_lanes, join_stats)
    C_out = out_coords.shape[0]
    valid_out = (jnp.arange(C_out, dtype=jnp.int32) < jnp.int32(n_out))[None, :]
    return jnp.where(valid_out, rows, -1)


@functools.partial(jax.jit, static_argnums=(1,))
def _invert_matching(in_idx, capacity_in):
    """out_idx_t[k, i] = o where in_idx[k, o] == i (injective per k), else -1."""
    Kv, C_out = in_idx.shape
    o = jnp.broadcast_to(jnp.arange(C_out, dtype=jnp.int32)[None, :], in_idx.shape)

    def invert_one(idx_k, o_k):
        tgt = jnp.where(idx_k >= 0, idx_k, capacity_in)
        return (
            jnp.full((capacity_in,), -1, dtype=jnp.int32)
            .at[tgt]
            .set(o_k, mode="drop")
        )

    return jax.vmap(invert_one)(in_idx, o)


def build_kernel_map(
    in_map: CoordinateMap,
    out_map: CoordinateMap,
    offsets: np.ndarray,
    slab_floor=None,
    defer_slabs: bool = False,
    join_slab=None,
    join_stats=None,
    span_margin: float = 1.0,
    probe=None,
    probe_out=None,
) -> KernelMap:  # slab_floor: None or ((S, E), (S, E)) fwd/bwd floors
    """Build the dense kernel map for absolute coordinate ``offsets``.

    Matches the reference's CPU builder semantics (reference:
    src/coordinate_map_cpu.hpp:569-670): iterate output coordinates, probe
    ``out_coord + offset_k`` in the input map.  Vectorized over all
    (offset, output) pairs in one jitted call.

    ``probe``: optional (row_grid, mins, grid_shape, tensor_stride) of the
    input map — switches the lookup from the sorted join to O(1) grid
    gathers (~6× faster at 32k rows; bit-identical results).
    """
    offsets = np.asarray(offsets, dtype=np.int32)
    d1 = in_map.coordinates.shape[1]
    if offsets.shape[1] == d1 - 1:  # prepend batch-delta 0
        offsets = np.concatenate(
            [np.zeros((offsets.shape[0], 1), np.int32), offsets], axis=1
        )
    if probe is not None:
        in_idx = _build_in_idx_grid(
            probe, out_map.coordinates, out_map.size_arr, offsets,
            base_stride=out_map.tensor_stride, deferred=defer_slabs,
        )
    else:
        in_idx = _build_in_idx(
            in_map.key_lanes,
            in_map.size_arr,
            out_map.coordinates,
            out_map.size_arr,
            jnp.asarray(offsets),
            join_slab=join_slab,
            join_stats=join_stats,
        )
    if probe_out is not None:
        # the inverse matching IS a grid probe of the OUT map with negated
        # offsets: out_idx_t[k, i] = row of (in_coord_i - Δk) — replaces
        # the sort-based scatter (bit-identical: rows are unique, so
        # in_idx[k, o] == i  ⟺  out-row of (in_i - Δk) is o)
        out_idx_t = _build_in_idx_grid(
            probe_out, in_map.coordinates, in_map.size_arr, -offsets,
            base_stride=in_map.tensor_stride, deferred=defer_slabs,
        )
    else:
        out_idx_t = _invert_matching(in_idx, in_map.capacity)
    from ..ops.pallas.conv_kernel import (
        build_slab_map_from_span,
        measure_spans,
        slab_ladder,
        slab_tile,
        sub_ladder,
    )

    # one fused host sync for both slab spans (tile divides each map's OWN
    # row dimension: in_idx is (K, C_out), out_idx_t is (K, C_in)); the
    # vector also carries per-rung outlier counts (single-tier slab rungs
    # + the (rung, sub-window) two-tier table) for outlier-tolerant sizing
    f_tile = slab_tile(in_idx.shape[1])
    b_tile = slab_tile(out_idx_t.shape[1])
    fwd_span_dev = measure_spans(
        in_idx, f_tile, in_map.capacity, slab_ladder(f_tile),
        sub_ladder(f_tile),
    )
    bwd_span_dev = measure_spans(
        out_idx_t, b_tile, out_map.capacity, slab_ladder(b_tile),
        sub_ladder(b_tile),
    )
    if defer_slabs:
        # caller batches the span syncs and attaches slabs in a finalize
        # pass (deferred replay: ONE host round trip for the whole phase)
        kmap = KernelMap(
            in_idx, out_idx_t, in_map.size_arr, out_map.size_arr, None, None
        )
        return kmap, fwd_span_dev, bwd_span_dev
    fwd_span, bwd_span = jax.device_get((fwd_span_dev, bwd_span_dev))
    fwd_slab = build_slab_map_from_span(
        in_idx, in_map.capacity, int(int(fwd_span[0]) * span_margin),
        min_slab=None if slab_floor is None else slab_floor[0],
        union_extra=int(int(fwd_span[1]) * span_margin),
        outlier_counts=fwd_span[3:], total_pairs=int(fwd_span[2]),
    )
    bwd_slab = build_slab_map_from_span(
        out_idx_t, out_map.capacity, int(int(bwd_span[0]) * span_margin),
        min_slab=None if slab_floor is None else slab_floor[1],
        union_extra=int(int(bwd_span[1]) * span_margin),
        outlier_counts=bwd_span[3:], total_pairs=int(bwd_span[2]),
    )
    return KernelMap(
        in_idx, out_idx_t, in_map.size_arr, out_map.size_arr, fwd_slab, bwd_slab
    )


@jax.jit
def _build_stride_in_to_out(out_lanes, n_out, in_coords, n_in, stride):
    """Map each input row to the output row of its strided voxel."""
    batch = in_coords[:, :1]
    spatial = jnp.floor_divide(in_coords[:, 1:], stride) * stride
    queries = jnp.concatenate([batch, spatial], axis=1)
    rows = find_rows(out_lanes, n_out, K.pack(queries))
    valid = jnp.arange(in_coords.shape[0], dtype=jnp.int32) < n_in
    return jnp.where(valid, rows, -1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _stride_in_to_out_grid(row_grid, mins, grid_shape, ts, in_coords, n_in, stride):
    batch = in_coords[:, :1]
    spatial = jnp.floor_divide(in_coords[:, 1:], stride) * stride
    queries = jnp.concatenate([batch, spatial], axis=1)
    rows = grid_lookup(row_grid, mins, grid_shape, ts, queries)
    valid = jnp.arange(in_coords.shape[0], dtype=jnp.int32) < n_in
    return jnp.where(valid, rows, -1)


def build_stride_map(
    in_map: CoordinateMap, out_map: CoordinateMap, out_tensor_stride,
    probe=None,
) -> jnp.ndarray:
    """(C_in,) int32: output row per input row (many-to-one), -1 padding.

    Reference: ``stride_map`` (src/coordinate_map_cpu.hpp:672-722) — the
    pooling fast path when stride == kernel_size, and the quantization map.

    ``probe``: optional grid-probe tuple of the OUTPUT map (see
    ``build_kernel_map``) — replaces the binary search with O(1) gathers.
    """
    stride = jnp.asarray(np.asarray(out_tensor_stride, np.int32))
    if probe is not None:
        row_grid, mins, grid_shape, ts = probe
        return _stride_in_to_out_grid(
            row_grid, mins, grid_shape, ts,
            in_map.coordinates, in_map.size_arr, stride,
        )
    return _build_stride_in_to_out(
        out_map.key_lanes,
        out_map.size_arr,
        in_map.coordinates,
        in_map.size_arr,
        stride,
    )
