"""Dense-grid dispatch for stride-1 sparse convolutions.

A TPU-native strategy with no reference counterpart: when the point cloud's
bounding box is dense enough (and channels small enough), scattering features
into a dense grid and running `lax.conv_general_dilated` — XLA's most
optimized TPU primitive — beats the sparse slab kernel.  The canonical win is
the network stem: MinkUNet's kernel-5 conv0 (125 offsets, 3 channels) costs
~14 ms through any sparse path at 26k points, but ~0.6 ms as a dense conv
over the ~500k-cell room grid.

Scatter→conv→gather is fully differentiable by JAX (XLA's conv gradients are
themselves fast convs), so no custom VJP is needed.

Applicability: stride 1, HYPER_CUBE region, output coordinates == input
coordinates — which covers every `kernel_size=k, stride=1` layer in the
model zoo.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# cost-model constants re-calibrated on v5e (26k-pt ScanNet-scale cloud,
# 459k-cell grid, overlapped 50-conv chains — see CLAUDE.md measurement
# rules).  Measured: dense k3 3→32 = 5.3 ms, 32→32 = 7.2 ms, 128→128 =
# 9.4 ms (dense pays conv FLOPs on EMPTY cells, so it scales with
# channels); sparse k3 = 1.8 ms channel-independent ≤128ch, k5 = 7.8 ms
# (≈0.5 µs per grid step); kernel-map build ≈ 0.013 µs per (offset, row)
# pair (dominated by the 7 ns/elem HBM gather + the invert scatter).
_DENSE_US_FIXED = 800.0  # scatter/conv/gather launch floor (65k-cell grid
# convs measured ~1.7 ms where the linear model said 0.85 — profile r2)
_DENSE_US_PER_CELL_BASE = 0.0105
_DENSE_US_PER_CELL_CH = 0.00004  # per (cin + cout)
_SPARSE_US_PER_STEP = 0.5
# traced shifted-grid map build: k=5 at 32k rows measured ~0.6 ms → ~0.15
# ns/pair; 0.2 leaves margin for slab metadata at larger K
_KMAP_BUILD_US_PER_PAIR = 0.0002
_MAX_DENSE_BYTES = 1 << 30


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DensePlan:
    """Scatter/gather indices between a coordinate map and its dense bbox grid.

    flat_idx: (C,) int32 — flattened cell index per map row (batch-major),
      -1 for padding rows.
    grid_shape: static (B, E_1..E_D) cell counts.
    mins: (D+1,) int32 device bbox minima (batch first) — the grid origin.
      Needed by grid-probe lookups (coords/kernel_map.py); unused by the
      dense conv itself.
    """

    flat_idx: jnp.ndarray
    grid_shape: Tuple[int, ...]
    mins: Optional[jnp.ndarray] = None

    @property
    def cells(self) -> int:
        # math.prod over Python ints: exact at any D (np.prod silently
        # wraps int64 — 16-multiple extents overflow it from D=16 up,
        # which made huge grids look under-budget and corrupted probes)
        return math.prod(self.grid_shape)

    def tree_flatten(self):
        return (self.flat_idx, self.mins), (self.grid_shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        flat_idx, mins = children
        return cls(flat_idx, aux[0], mins)


@jax.jit
def _bbox(coords, valid):
    big = jnp.where(valid[:, None], coords, jnp.int32(2**30))
    small = jnp.where(valid[:, None], coords, jnp.int32(-(2**30)))
    return jnp.min(big, axis=0), jnp.max(small, axis=0)


@jax.jit
def _flat_indices(coords, valid, mins, extents_arr, tensor_stride):
    rel = (coords[:, 1:] - mins[None, 1:]) // tensor_stride[None, :]
    batch = coords[:, 0] - mins[0]
    flat = batch
    for d in range(rel.shape[1]):
        flat = flat * extents_arr[d] + rel[:, d]
    return jnp.where(valid, flat.astype(jnp.int32), -1)


def build_dense_plan_traced(coordinate_map, bbox_dev, grid_shape_floor):
    """Traceable dense plan at a KNOWN (ratcheted) grid shape.

    ``bbox_dev`` is the (2, D+1) device mins/maxs computed in the same trace;
    the static grid shape comes from the floor.  Returns (plan, ok) where
    ``ok`` is a device bool asserting the true extents fit the floor — the
    traced replay syncs it once per batch and falls back when violated.
    """
    coords = coordinate_map.coordinates
    valid = coordinate_map.valid_mask()
    ts = np.asarray(coordinate_map.tensor_stride, np.int32)
    mins, maxs = bbox_dev[0], bbox_dev[1]
    batches = int(grid_shape_floor[0])
    extents = np.asarray(grid_shape_floor[1:], np.int32)
    flat = _flat_indices(
        coords,
        valid,
        mins,
        jnp.asarray(extents),
        jnp.asarray(ts),
    )
    true_ext = jnp.maximum(
        (maxs[1:] - mins[1:]) // jnp.asarray(ts, maxs.dtype) + 1, 1
    )
    ok = jnp.all(true_ext <= jnp.asarray(extents, maxs.dtype)) & (
        (maxs[0] - mins[0] + 1) <= batches
    )
    plan = DensePlan(
        flat, tuple(int(g) for g in grid_shape_floor), mins.astype(jnp.int32)
    )
    return plan, ok


def build_dense_plan(
    coordinate_map, bbox=None, extent_floor=None, margin=1.0
) -> Optional[DensePlan]:
    """Dense plan for a coordinate map.

    ``bbox`` (host (2, D+1) mins/maxs) is normally supplied by the manager —
    it was fetched in the same host sync as the map's unique count, so no
    extra round trip is needed here.  ``extent_floor`` (a previous
    grid_shape) ratchets the grid so the static dense-conv shape stays
    stable across geometry jitter.
    """
    coords = coordinate_map.coordinates
    valid = coordinate_map.valid_mask()
    ts = np.asarray(coordinate_map.tensor_stride, np.int64)
    if bbox is not None:
        mins, maxs = np.asarray(bbox[0]), np.asarray(bbox[1])
    else:
        mins_d, maxs_d = _bbox(coords, valid)
        mins, maxs = jax.device_get((mins_d, maxs_d))
    if (maxs < mins).any():  # empty map
        return None
    # 16-multiple extents: stable conv/grid shapes across geometry jitter
    # (each new dense shape is an XLA recompile)
    grid_shape = grid_shape_from_bbox((mins, maxs), ts, extent_floor, margin)
    batches = grid_shape[0]
    extents = np.asarray(grid_shape[1:], np.int64)
    flat = _flat_indices(
        coords,
        valid,
        jnp.asarray(mins),
        jnp.asarray(extents.astype(np.int32)),
        jnp.asarray(ts.astype(np.int32)),
    )
    return DensePlan(flat, grid_shape, jnp.asarray(mins, jnp.int32))


def grid_shape_from_bbox(bbox, tensor_stride, extent_floor=None, margin=1.0):
    """(batches, *extents) for a host bbox — the shared grid-shape formula
    (16-multiple extents for shape stability) used by dense plans and the
    row-grid probes.  ``margin`` > 1 overshoots the spatial extents
    (recovery ratchets: converge in one step under geometry drift)."""
    mins, maxs = np.asarray(bbox[0]), np.asarray(bbox[1])
    ts = np.asarray(tensor_stride, np.int64)
    extents = np.maximum((maxs[1:] - mins[1:]) // ts + 1, 1)
    if margin > 1.0:
        extents = np.ceil(extents * margin).astype(extents.dtype)
    extents = ((extents + 15) // 16) * 16
    batches = int(maxs[0] - mins[0] + 1)
    if extent_floor is not None:
        batches = max(batches, int(extent_floor[0]))
        extents = np.maximum(extents, np.asarray(extent_floor[1:]))
    return (batches,) + tuple(int(e) for e in extents)


@functools.partial(jax.jit, static_argnums=(1,))
def build_row_grid(flat_idx: jnp.ndarray, cells: int) -> jnp.ndarray:
    """(cells + 1,) int32 inverse of a DensePlan: row id per grid cell, -1
    for empty cells.  The extra trailing cell stays -1 so out-of-bounds
    probes can be routed there.  This is the TPU replacement for a hash
    probe: coordinate lookup = O(1) gather from the bbox grid."""
    rows = jnp.arange(flat_idx.shape[0], dtype=jnp.int32)
    # padding rows target cells+1: out of range, dropped — the sentinel cell
    # at index ``cells`` must stay -1 (out-of-bounds probes land there)
    safe = jnp.where(flat_idx >= 0, flat_idx, cells + 1)
    return (
        jnp.full((cells + 1,), -1, jnp.int32).at[safe].set(rows, mode="drop")
    )


def dense_conv_beneficial(
    plan: Optional[DensePlan],
    n_points_capacity: int,
    kernel_volume: int,
    cin: int,
    cout: int,
    tile: int = 256,
    map_cached: bool = True,
    cached_slab_size: Optional[int] = None,
    cached_sub_tiles: int = 1,
    cached_ov_cap: int = 0,
) -> bool:
    """Cost model: dense scatter+conv+gather vs the sparse slab kernel.

    ``map_cached=False`` adds the (amortized) kernel-map build cost to the
    sparse side — on fresh geometry every batch rebuilds its maps, and a
    125-offset map at 32k rows costs ~55 ms to build, an order of magnitude
    more than either conv.  This is what routes MinkUNet's k=5 stem to the
    dense grid in the fresh-geometry training regime.

    ``cached_slab_size``: the built map's effective one-hot width (S or the
    two-tier sub-window S'); ``cached_sub_tiles``: J = T/SUB_TILE when
    two-tier windows are on (each grid step then runs J narrow gathers with
    their own fixed cost); ``cached_ov_cap``: outlier-correction list
    capacity (the XLA correction pass is ~0.02 µs/pair — measured 0.27 ms
    at 16k pairs k=3, 0.56 ms at 32k pairs k=5).  Per-step model
    ``0.22 + 0.02·J + 0.0004·width`` fits the r4 profile: k=3
    (S=320, S'=128, J=4) 0.32 µs/step measured, k=5 (S=512, S'=160, J=4)
    0.40 µs/step — the old ``0.2 + 0.0005·S'`` ignored the J sub-matmul
    dispatches and mispredicted k=5 sparse at 4.5 ms where it measures
    6.4 ms (vs 1.37 ms dense — the r4 k=5 ref-suite regression).
    """
    if plan is None:
        return False
    cells = plan.cells
    if cells * (cin + cout) * 4 > _MAX_DENSE_BYTES:
        return False
    # z-fold regime (tiny cin, 3-D, stride 1): calibrated on v5e
    # (prof_zfold2, sum-consumed): folded GEMMs sustain ~130 TFLOP/s of
    # their inflated FLOPs (2·cells·Z·kxy·cin·cout); the row<->grid edges
    # cost ~3.3 ns/cell; dW-zfold ≈ 2.5× the fwd GEMMs + the g scatter.
    Z = plan.grid_shape[-1]
    kxy = round(kernel_volume ** (2.0 / 3.0))
    if (
        len(plan.grid_shape) == 4
        and cin <= _ZFOLD_MAX_CIN
        and kxy * (Z * cin) * (Z * cout) * 4 <= _ZFOLD_MAX_B2_BYTES
    ):
        flops = 2.0 * cells * Z * kxy * cin * cout
        edges_us = 0.0033 * cells
        fwd_us = 150.0 + flops / 1.3e8 + edges_us
        dw_us = 250.0 + 2.5 * flops / 1.3e8 + 0.002 * cells
        dense_train = 1.2 * fwd_us + dw_us
        steps = max(n_points_capacity // tile, 1) * kernel_volume
        if cached_slab_size:
            sparse_us = steps * (
                0.22 + 0.02 * max(cached_sub_tiles, 1)
                + 0.0004 * cached_slab_size
            ) + 0.02 * cached_ov_cap
        else:
            sparse_us = steps * _SPARSE_US_PER_STEP
        sparse_train = 1.6 * sparse_us
        if not map_cached:
            sparse_train += (
                _KMAP_BUILD_US_PER_PAIR * kernel_volume * n_points_capacity
            )
        return dense_train < sparse_train
    kscale = (kernel_volume / 27.0) ** 0.3  # k5/k3 measured ratio ~1.57
    # per-cell cost is sublinear in grid size (measured: 11.5 ns/cell on
    # the 459k-cell uniform grid vs ~6 ns/cell·kscale on the 110k room
    # grid — the r4 k=5 anchor: 1.37 ms where the linear model said 2.8)
    base = _DENSE_US_PER_CELL_BASE * (cells / 459000.0) ** 0.7
    dense_us = _DENSE_US_FIXED + (
        cells * (base + _DENSE_US_PER_CELL_CH * (cin + cout)) * kscale
    )
    steps = max(n_points_capacity // tile, 1) * kernel_volume
    if cached_slab_size:
        sparse_us = steps * (
            0.22 + 0.02 * max(cached_sub_tiles, 1)
            + 0.0004 * cached_slab_size
        ) + 0.02 * cached_ov_cap
    else:
        sparse_us = steps * _SPARSE_US_PER_STEP
    # Training weights (profile-anchored, r2): sparse bwd ≈ 0.6× fwd.
    # Dense dx ≈ 0.2× fwd; the dense WEIGHT grad routing mirrors
    # _dense_conv_core_bwd (r5 calibration): XLA's filter-grad is
    # k-independent ~0.82 ms at ≤200k cells (≈0.6× the k=5 fwd), the
    # shifted-slice/patches GEMMs have ~the forward's FLOP count, and only
    # when none applies does the uncapped kernel-volume penalty stand.
    dw_ratio = 0.5 * (kernel_volume / 27.0) ** 1.2
    kv = (kernel_volume,)  # predicates only use math.prod(ks)
    if _use_shifted_dw(kv, cin, cout, cells) or _use_patches_dw(
        kv, cin, cout, cells
    ):
        # measured dW_shifted/fwd ratios: 1.4 (k=5) and 1.3 (k=7) on the
        # 110k-cell surface grid (prof_densebwd5); keep margin for larger
        # grids where the slice traffic grows faster than the conv
        dw_ratio = min(dw_ratio, 2.0)
    # In-situ bias: XLA dense convs overlap with neighboring ops while the
    # serial slab kernels don't — but the slab kernel's per-step overhead
    # grows with K (measured: dense wins outright at K=125/343 on room
    # grids, loses the k=3 tie), so the tie-break leans dense as K grows.
    bias = max(0.75, 1.15 - 0.13 * math.log(max(kernel_volume / 27.0, 1.0)))
    dense_train = bias * dense_us * (1.2 + dw_ratio)
    sparse_train = 1.6 * sparse_us
    if not map_cached:
        sparse_train += (
            _KMAP_BUILD_US_PER_PAIR * kernel_volume * n_points_capacity
        )
    return dense_train < sparse_train


_CONV_SPECS = {
    1: ("NWC", "WIO", "NWC"),
    2: ("NHWC", "HWIO", "NHWC"),
    3: ("NDHWC", "DHWIO", "NDHWC"),
}


def _dim_numbers(dense_shape, w_shape, D):
    if D not in _CONV_SPECS:
        raise NotImplementedError(f"dense dispatch for D={D}")
    return jax.lax.conv_dimension_numbers(
        dense_shape, w_shape, _CONV_SPECS[D]
    )


def _raw_dense_conv(dense, w, ks, dilation, padding):
    # no explicit preferred_element_type: XLA convs accumulate f32 for bf16
    # inputs internally, and mixed preferred dtypes break the conv VJP
    D = len(ks)
    return jax.lax.conv_general_dilated(
        dense,
        w,
        window_strides=(1,) * D,
        padding=list(padding),
        rhs_dilation=tuple(dilation),
        dimension_numbers=_dim_numbers(dense.shape, w.shape, D),
    )


_DW_CHUNK_BYTES = 192 * 1024 * 1024


def _patch_rows(xs, out_spatial, ks, dilation):
    """(rows, cin·K) patch matrix of a pre-padded grid slice by stacking
    the K shifted views (feature order: cin slow, offsets row-major fast —
    the `conv_general_dilated_patches` layout, but formed as ONE fused XLA
    copy program: the grouped-conv formation that helper lowers to
    measured 5.3 ms at K=343 where plain shifted slices cost HBM traffic
    only)."""
    import itertools

    D = len(ks)
    views = []
    for off in itertools.product(*[range(k) for k in ks]):
        v = xs
        for d, o in enumerate(off):
            v = jax.lax.slice_in_dim(
                v, o * dilation[d], o * dilation[d] + out_spatial[d],
                axis=1 + d,
            )
        views.append(v)
    stacked = jnp.stack(views, axis=-1)  # (B, *out_spatial, cin, K)
    cin = xs.shape[-1]
    return stacked.reshape(-1, cin * len(views))


def _dw_patches(dense, g, ks, dilation, padding):
    """Dense filter gradient as an im2col GEMM.

    XLA's own conv-backprop-filter degrades sharply at sparse-channel
    widths × large kernel volumes (measured 23.8 ms for the 5³ 3→32 stem
    on a 459k-cell grid — 3.2× its forward); forming the patch matrix
    (cells, Cin·K) by stacking shifted slices and contracting it against
    the flattened cotangent in ONE long-K MXU GEMM has exactly the
    forward's FLOP count and none of the filter-grad kernel's
    inefficiency.  Chunked along the first spatial axis to bound the
    patch buffer.

    Returns dW in standard (*ks, cin, cout) layout, f32.
    """
    D = len(ks)
    cin = dense.shape[-1]
    cout = g.shape[-1]
    K = math.prod(ks)
    cells = math.prod(dense.shape[:-1])
    n_chunk = int(
        max(1, -(-cells * cin * K * dense.dtype.itemsize // _DW_CHUNK_BYTES))
    )
    # pre-pad every spatial dim, then walk equal-length windows of the
    # first spatial axis (equal chunks = ONE compiled shape; zero-padded
    # tail rows of g contribute zero)
    E1 = g.shape[1]
    step = -(-E1 // n_chunk)
    eff1 = dilation[0] * (ks[0] - 1)
    pads = [(0, 0)] + [tuple(p) for p in padding] + [(0, 0)]
    pads[1] = (padding[0][0], padding[0][1] + n_chunk * step - E1)
    xp = jnp.pad(dense, pads)
    gp = g
    if n_chunk * step != E1:
        gp = jnp.pad(g, [(0, 0), (0, n_chunk * step - E1)] + [(0, 0)] * D)
    out_spatial = (step,) + tuple(g.shape[2 : 1 + D])
    dwflat = jnp.zeros((cin * K, cout), jnp.float32)
    for c in range(n_chunk):
        xs = jax.lax.slice_in_dim(
            xp, c * step, c * step + step + eff1, axis=1
        )
        dwflat = dwflat + jax.lax.dot_general(
            _patch_rows(xs, out_spatial, ks, dilation),
            jax.lax.slice_in_dim(gp, c * step, (c + 1) * step, axis=1)
            .reshape(-1, cout),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # patch features are channel-major: (cin, *ks) varying spatial fastest
    dw = dwflat.reshape((cin,) + tuple(ks) + (cout,))
    return jnp.transpose(dw, tuple(range(1, D + 1)) + (0, D + 1))


def _use_patches_dw(ks, cin, cout, cells) -> bool:
    """Patches-GEMM beats XLA's filter-grad only when the channel width is
    tiny relative to the kernel volume (measured on v5e, 110k-cell surface
    grid, fwd+bwd chains: k=3 3→32 XLA 1.40 ms bwd vs patches 0.69; k=5
    3→32 6.22 vs 4.41 — but k=3 128→128 1.85 vs 25.3 and k=5 32→32 5.76
    vs 38.9: at real channel widths the patch matrix is its own HBM
    problem).  Gate on tiny cin AND a bounded patch buffer."""
    return (
        math.prod(ks) >= 27
        and min(cin, cout) <= 8
        and cells * cin * math.prod(ks) * 4 <= 512 * 1024 * 1024
    )


def _dw_shifted(dense, g, ks, dilation, padding):
    """Dense filter gradient as K per-offset shifted-slice GEMMs.

    The patches-GEMM (_dw_patches) materializes a (cells, cin·K) patch
    matrix; measured 4.4 ms at k=5 3→32 / 110k cells, dominated by the
    stack's layout copy rather than the contraction.  Slicing the padded
    grid once per offset and contracting (cells, cin)ᵀ @ (cells, cout)
    has the same FLOPs with no intermediate: traffic is K·cells·cin
    reads and each slice feeds its GEMM directly.

    Returns dW in standard (*ks, cin, cout) layout, f32.
    """
    import itertools

    D = len(ks)
    cin = dense.shape[-1]
    cout = g.shape[-1]
    pads = [(0, 0)] + [tuple(p) for p in padding] + [(0, 0)]
    xp = jnp.pad(dense, pads)
    g2d = g.reshape(-1, cout)
    out_spatial = g.shape[1 : 1 + D]
    dws = []
    for off in itertools.product(*[range(k) for k in ks]):
        v = xp
        for d, o in enumerate(off):
            v = jax.lax.slice_in_dim(
                v,
                o * dilation[d],
                o * dilation[d] + out_spatial[d],
                axis=1 + d,
            )
        dws.append(
            jax.lax.dot_general(
                v.reshape(-1, cin),
                g2d,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.stack(dws, 0).reshape(tuple(ks) + (cin, cout))


# Calibration (v5e, surface-26k 110k-cell grid, 3→32, r5 prof_densebwd5 —
# outputs consumed by .sum(); earlier [0,0..]-pick probes let XLA slice
# the dots and reported fictions): XLA's conv-backprop-filter is the
# WORST dW at sparse channel widths — 6.0 ms (k=5) / 12.2 ms (k=7) vs
# shifted-slice 1.5 / 3.7 — so it is the fallback, never the preference.
def _use_xla_filtergrad_dw(ks, cin, cout, cells) -> bool:
    del ks, cin, cout, cells
    return False


def _use_shifted_dw(ks, cin, cout, cells, itemsize=4) -> bool:
    """Shifted-slice dW beats XLA's filter-grad whenever its K·cells·cin
    read traffic stays bounded (filter-grad degrades with grid size:
    23.8 ms for the 5³ 3→32 stem at 459k cells vs 0.82 ms at 110k); at
    wide channels × large K the slice reads explode and XLA's blocked
    kernel wins."""
    del cout
    return math.prod(ks) * cells * cin * itemsize <= 2 * 1024 * 1024 * 1024


# ---------------------------------------------------------------------------
# row <-> grid transfer edges with scatter-add-free custom VJPs
#
# The map row <-> grid cell correspondence is injective both ways (flat_idx
# never repeats a cell), so BOTH directions of BOTH transfers are a pure
# gather or an injective scatter-set.  Left to autodiff, the final
# `jnp.take(mode="fill")` emits a masked scatter-ADD in its VJP — the
# shape-erratic TPU scatter emitter (CLAUDE.md): measured 5-14 ms inside
# the k=5/7 dense backward where every real component (dx conv 0.47 ms,
# filter-grad 0.82 ms, injective set 0.53 ms) is sub-millisecond.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rows_to_grid(feats, flat_idx, cells):
    """(C, ch) padded rows -> (cells, ch) flat grid (zeros on empty cells)."""
    safe = jnp.where(flat_idx >= 0, flat_idx, cells)
    return (
        jnp.zeros((cells + 1, feats.shape[1]), feats.dtype)
        .at[safe].set(feats, mode="drop")[:cells]
    )


def _rows_to_grid_fwd(feats, flat_idx, cells):
    return _rows_to_grid(feats, flat_idx, cells), flat_idx


def _rows_to_grid_bwd(cells, flat_idx, g):
    # d_feats[r] = g[flat_idx[r]] — a gather (padding rows get zero)
    safe = jnp.where(flat_idx >= 0, flat_idx, cells)
    return (
        jnp.take(g, safe, axis=0, mode="fill", fill_value=0),
        None,
    )


_rows_to_grid.defvjp(_rows_to_grid_fwd, _rows_to_grid_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _grid_to_rows(grid, flat_idx, cells):
    """(cells, ch) flat grid -> (C, ch) padded rows (zeros on padding)."""
    safe = jnp.where(flat_idx >= 0, flat_idx, cells)
    return jnp.take(grid, safe, axis=0, mode="fill", fill_value=0)


def _grid_to_rows_fwd(grid, flat_idx, cells):
    return _grid_to_rows(grid, flat_idx, cells), flat_idx


def _grid_to_rows_bwd(cells, flat_idx, g):
    # d_grid = injective scatter-set of the row cotangents (cells the map
    # doesn't own stay zero; no adds, no masks beyond the drop)
    safe = jnp.where(flat_idx >= 0, flat_idx, cells)
    return (
        jnp.zeros((cells + 1, g.shape[1]), g.dtype)
        .at[safe].set(g, mode="drop")[:cells],
        None,
    )


_grid_to_rows.defvjp(_grid_to_rows_fwd, _grid_to_rows_bwd)


# ---------------------------------------------------------------------------
# z-fold core: the tiny-cin large-kernel specialist
#
# A 3-channel 3-D conv gives XLA's implicit GEMM a contraction depth of 3 —
# the MXU runs at <1% utilization (measured 0.86 ms for 2.65 GFLOP at k=5 on
# the 110k-cell surface grid).  Folding the minor spatial axis into channels
# — dense (B,X,Y,Z,cin) → (B,X,Y,Z·cin), W → a block-banded 2-D kernel
# (kx,ky,Z·cin,Z·cout) with the kz taps on the band diagonals — multiplies
# the FLOPs by Z/kz but runs them at MXU-saturating shapes: measured
# (v5e, prof_zfold2, sum-consumed) fwd 0.07 / 0.21 / 0.43 ms at k=3/5/7 vs
# 3-D conv 0.35* / 0.86 / 2.56, and the folded shifted-slice dW
# 0.45 / 0.76 / 1.17 ms vs 1.5 / 3.7 for the 3-D shifted slices.
# Exact to f32 roundoff (rel err ~3e-7).  No reference analogue: the
# reference's stem runs im2col/gather GEMMs (src/convolution_kernel.cu).
# ---------------------------------------------------------------------------

_ZFOLD_MAX_CIN = 8
_ZFOLD_MAX_B2_BYTES = 128 * 1024 * 1024


def _use_zfold(ks, cin, cout, grid_shape) -> bool:
    """Fold only 3-D stride-1 convs at tiny cin (the FLOP inflation Z/kz
    only pays when the unfolded contraction depth starves the MXU) with a
    bounded banded-weight buffer."""
    if len(ks) != 3 or len(grid_shape) != 4:
        return False
    Z = grid_shape[-1]
    if cin > _ZFOLD_MAX_CIN:
        return False
    kxy = ks[0] * ks[1]
    if kxy * (Z * cin) * (Z * cout) * 4 > _ZFOLD_MAX_B2_BYTES:
        return False
    return True


@functools.lru_cache(maxsize=64)
def _band_meta(kz, dil_z, pad_lo_z, Z, cin, cout):
    """Static scatter/gather indices between W's z taps and the banded 2-D
    kernel.  Returns (flat_band, widx, dw_gather):
      flat_band[i] — flat position in (Z·cin)·(Z·cout) of band entry i,
      widx[i]      — source position in kz·cin·cout for entry i,
      dw_gather    — (kz·Z·cin·cout,) int32 positions into the flat band
                     (-1 where (dz, z_out) is out of range), laid out so
                     dW = take(dB2, dw_gather).reshape(kz, Z, cin, cout)
                     .sum(axis=1) — a pure gather + dense reduction, no
                     scatter-add."""
    rows, cols, widx = [], [], []
    for dz in range(kz):
        for z_out in range(Z):
            z_in = z_out + dz * dil_z - pad_lo_z
            if not (0 <= z_in < Z):
                continue
            for ci in range(cin):
                for co in range(cout):
                    rows.append(z_in * cin + ci)
                    cols.append(z_out * cout + co)
                    widx.append((dz * cin + ci) * cout + co)
    flat_band = (
        np.asarray(rows, np.int64) * (Z * cout) + np.asarray(cols, np.int64)
    ).astype(np.int32)
    widx = np.asarray(widx, np.int32)
    dw_gather = np.full((kz * Z * cin * cout,), -1, np.int32)
    for dz in range(kz):
        for z_out in range(Z):
            z_in = z_out + dz * dil_z - pad_lo_z
            if not (0 <= z_in < Z):
                continue
            for ci in range(cin):
                for co in range(cout):
                    pos = ((dz * Z + z_out) * cin + ci) * cout + co
                    dw_gather[pos] = (z_in * cin + ci) * (Z * cout) + (
                        z_out * cout + co
                    )
    return flat_band, widx, dw_gather


def _build_band(w, ks, dilation, padding, Z):
    """W (kx,ky,kz,cin,cout) → banded 2-D kernel (kx,ky,Z·cin,Z·cout)."""
    kx, ky, kz, cin, cout = w.shape
    flat_band, widx, _ = _band_meta(
        kz, int(dilation[2]), int(padding[2][0]), Z, cin, cout
    )
    wflat = w.reshape(kx * ky, kz * cin * cout)
    b2 = (
        jnp.zeros((kx * ky, Z * cin * Z * cout), w.dtype)
        .at[:, jnp.asarray(flat_band)]
        .set(wflat[:, jnp.asarray(widx)])
    )
    return b2.reshape(kx, ky, Z * cin, Z * cout)


def _zfold_fwd_impl(dense, w, ks, dilation, padding):
    B, X, Y, Z, cin = dense.shape
    cout = w.shape[-1]
    d2 = dense.reshape(B, X, Y, Z * cin)
    b2 = _build_band(w, ks, dilation, padding, Z)
    o2 = jax.lax.conv_general_dilated(
        d2, b2,
        window_strides=(1, 1),
        padding=[tuple(padding[0]), tuple(padding[1])],
        rhs_dilation=tuple(dilation[:2]),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            d2.shape, b2.shape, ("NHWC", "HWIO", "NHWC")
        ),
    )
    return o2.reshape(B, X, Y, Z, cout)


def _dw_zfold(dense, g, ks, dilation, padding):
    """Filter gradient in the folded layout: kx·ky shifted-slice GEMMs at
    (cells_xy, Z·cin) @ (cells_xy, Z·cout) — MXU-saturating contraction
    shapes — then a scatter-free band gather + z-reduction back to
    (kx,ky,kz,cin,cout).  Measured 0.45/0.76/1.17 ms at k=3/5/7 (110k-cell
    surface grid) vs 1.5/3.7 ms for the unfolded shifted slices."""
    B, X, Y, Z, cin = dense.shape
    cout = g.shape[-1]
    kx, ky, kz = ks
    d2 = dense.reshape(B, X, Y, Z * cin)
    g2d = g.reshape(-1, Z * cout)
    xp = jnp.pad(
        d2, [(0, 0), tuple(padding[0]), tuple(padding[1]), (0, 0)]
    )
    _, _, dw_gather = _band_meta(
        kz, int(dilation[2]), int(padding[2][0]), Z, cin, cout
    )
    dws = []
    for dx in range(kx):
        for dy in range(ky):
            v = jax.lax.slice(
                xp,
                (0, dx * dilation[0], dy * dilation[1], 0),
                (B, dx * dilation[0] + X, dy * dilation[1] + Y, Z * cin),
            )
            dws.append(
                jax.lax.dot_general(
                    v.reshape(-1, Z * cin), g2d,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
    db2 = jnp.stack(dws, 0).reshape(kx * ky, Z * cin * Z * cout)
    idx = jnp.asarray(dw_gather)
    safe = jnp.where(idx >= 0, idx, db2.shape[1])
    picked = jnp.take(db2, safe, axis=1, mode="fill", fill_value=0.0)
    dw = picked.reshape(kx * ky, kz, Z, cin, cout).sum(axis=2)
    return dw.reshape(kx, ky, kz, cin, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _zfold_core(dense, w, ks, dilation, padding):
    return _zfold_fwd_impl(dense, w, ks, dilation, padding)


def _zfold_core_fwd(dense, w, ks, dilation, padding):
    return _zfold_fwd_impl(dense, w, ks, dilation, padding), (dense, w)


def _zfold_core_bwd(ks, dilation, padding, res, g):
    dense, w = res
    # dx: input-grad of the folded 2-D conv (measured ~free); dead code
    # when the caller never differentiates the input
    _, vjp_x = jax.vjp(
        lambda d: _zfold_fwd_impl(d, w, ks, dilation, padding), dense
    )
    (dx,) = vjp_x(g)
    dw = _dw_zfold(dense, g, ks, dilation, padding).astype(w.dtype)
    return dx, dw


_zfold_core.defvjp(_zfold_core_fwd, _zfold_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _dense_conv_core(dense, w, ks, dilation, padding):
    return _raw_dense_conv(dense, w, ks, dilation, padding)


def _dense_conv_core_fwd(dense, w, ks, dilation, padding):
    return _raw_dense_conv(dense, w, ks, dilation, padding), (dense, w)


def _dense_conv_core_bwd(ks, dilation, padding, res, g):
    dense, w = res
    # d_input: XLA's conv-input-grad is efficient at every shape — reuse it.
    # When the caller never uses dx (params-only training grads, the
    # reference bench methodology), this whole chain is dead code in the
    # surrounding jaxpr and XLA eliminates it.
    _, vjp_x = jax.vjp(
        lambda d: _raw_dense_conv(d, w, ks, dilation, padding), dense
    )
    (dx,) = vjp_x(g)
    cells = math.prod(dense.shape[:-1])
    if _use_xla_filtergrad_dw(ks, dense.shape[-1], g.shape[-1], cells):
        _, vjp_w = jax.vjp(
            lambda ww: _raw_dense_conv(dense, ww, ks, dilation, padding), w
        )
        (dw,) = vjp_w(g)
    elif _use_shifted_dw(
        ks, dense.shape[-1], g.shape[-1], cells, dense.dtype.itemsize
    ):
        dw = _dw_shifted(dense, g, ks, dilation, padding).astype(w.dtype)
    elif _use_patches_dw(ks, dense.shape[-1], g.shape[-1], cells):
        dw = _dw_patches(dense, g, ks, dilation, padding).astype(w.dtype)
    else:
        _, vjp_w = jax.vjp(
            lambda ww: _raw_dense_conv(dense, ww, ks, dilation, padding), w
        )
        (dw,) = vjp_w(g)
    return dx, dw


_dense_conv_core.defvjp(_dense_conv_core_fwd, _dense_conv_core_bwd)


@functools.partial(jax.jit, static_argnums=(3, 4))
def dense_conv(
    feats: jnp.ndarray,  # (C, Cin) padded map-aligned features
    weights: jnp.ndarray,  # (K, Cin, Cout), offsets dim-0-fastest
    plan: DensePlan,
    kernel_size: Tuple[int, ...],
    dilation: Tuple[int, ...],
) -> jnp.ndarray:
    """Stride-1 sparse conv evaluated on the dense bbox grid.

    jitted (static kernel shape) so eager module calls hit the trace cache.
    """
    B = plan.grid_shape[0]
    spatial = plan.grid_shape[1:]
    D = len(spatial)
    cin = feats.shape[1]
    cout = weights.shape[-1]
    cells = plan.cells

    dense = _rows_to_grid(feats, plan.flat_idx, cells).reshape(
        (B,) + spatial + (cin,)
    )

    # weight layout: offset k = i_0 + k_0·i_1 + k_0·k_1·i_2 (dim 0 fastest,
    # reference enumeration) → reshape reversed then transpose to (k_0..k_D)
    ks = tuple(kernel_size)
    w = weights.reshape(tuple(reversed(ks)) + (cin, cout))
    w = jnp.transpose(w, tuple(range(D - 1, -1, -1)) + (D, D + 1))

    # padding per dim: odd kernels are centered; even kernels probe the
    # positive side only (reference: src/kernel_region.hpp:204-220)
    padding = []
    for k, dil in zip(ks, dilation):
        if k % 2 == 1:
            p = dil * (k // 2)
            padding.append((p, p))
        else:
            padding.append((0, dil * (k - 1)))

    core = (
        _zfold_core
        if _use_zfold(ks, cin, cout, plan.grid_shape)
        else _dense_conv_core
    )
    out_dense = core(
        dense, w, ks, tuple(dilation), tuple(tuple(p) for p in padding)
    ).astype(feats.dtype)

    flat_out = out_dense.reshape(cells, cout)
    return _grid_to_rows(flat_out, plan.flat_idx, cells)
