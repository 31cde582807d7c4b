"""Pure feature-phase primitives: the traceable compute core.

Every function here is shape-static and differentiable; they consume the
index arrays produced by the (cached, host-driven) coordinate phase.  This is
the TPU re-expression of the reference's CUDA op kernels:

* convolution — gather → GEMM → accumulate over kernel offsets, with a
  custom VJP whose input-gradient is *also a pure gather* thanks to the
  dense-matching kernel map (see coords/kernel_map.py).  Replaces the
  reference's im2col+cuBLAS / fused atomic-scatter kernels
  (src/convolution_kernel.cu:114-494).
* pooling — masked reductions over kernel-map gathers; global pooling is a
  segment reduction over batch (origin) ids.  Replaces
  src/pooling_avg_kernel.cu (cuSPARSE SpMM) and src/pooling_max_kernel.cu.
* broadcast / pruning / union / interpolation — gathers and segment ops;
  their backward passes come from JAX autodiff (the reference hand-writes
  each one: src/broadcast_kernel.cu, src/pruning_cpu.cpp, ...).

Row convention: feature arrays are padded to the coordinate map's capacity;
index -1 means "no pair" and gathers a zero row.  Padding rows are never
*read* through valid indices; ops that reduce across rows mask them.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..coords.kernel_map import KernelMap

NEG_INF = -jnp.inf


def take_rows(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows; any index < 0 or >= N yields a zero row.

    Note: `jnp.take(mode="fill")` WRAPS negative indices before the bounds
    check, so -1 must be remapped to an out-of-range positive index first.
    """
    safe = jnp.where(idx >= 0, idx, feats.shape[0])
    return jnp.take(feats, safe, axis=0, mode="fill", fill_value=0)


# ---------------------------------------------------------------------------
# segment reductions (quantization, global pooling)
# ---------------------------------------------------------------------------


def segment_sum(feats, seg_ids, num_segments: int):
    """Sum rows by segment id; ids < 0 are dropped."""
    ids = jnp.where(seg_ids >= 0, seg_ids, num_segments)
    out = jnp.zeros((num_segments + 1,) + feats.shape[1:], feats.dtype)
    out = out.at[ids].add(feats, mode="drop")
    return out[:num_segments]


def segment_count(seg_ids, num_segments: int):
    ids = jnp.where(seg_ids >= 0, seg_ids, num_segments)
    out = jnp.zeros((num_segments + 1,), jnp.int32).at[ids].add(1, mode="drop")
    return out[:num_segments]


def segment_mean(feats, seg_ids, num_segments: int):
    s = segment_sum(feats, seg_ids, num_segments)
    c = segment_count(seg_ids, num_segments)
    return s / jnp.maximum(c, 1).astype(s.dtype)[:, None]


def segment_max(feats, seg_ids, num_segments: int):
    """Max rows by segment id; empty segments yield 0 (reference behavior:
    empty outputs stay zero-initialized)."""
    ids = jnp.where(seg_ids >= 0, seg_ids, num_segments)
    out = jnp.full((num_segments + 1,) + feats.shape[1:], NEG_INF, feats.dtype)
    out = out.at[ids].max(feats, mode="drop")
    out = out[:num_segments]
    return jnp.where(jnp.isneginf(out), 0.0, out)


# ---------------------------------------------------------------------------
# convolution
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def sparse_conv(feats, kernel, in_idx, out_idx_t):
    """Generalized sparse convolution.

    Args:
      feats: (C_in, ch_in) padded input features.
      kernel: (K, ch_in, ch_out) weights (offset-major, matching the
        reference layout, MinkowskiConvolution.py:262-285).
      in_idx: (K, C_out) int32 forward gather map.
      out_idx_t: (K, C_in) int32 transpose gather map (used by the VJP).

    Returns:
      (C_out, ch_out) output features; padding rows are zero.
    """
    return _conv_fwd(feats, kernel, in_idx)


def _conv_fwd(feats, kernel, in_idx):
    C_out = in_idx.shape[1]
    ch_out = kernel.shape[-1]
    acc0 = jnp.zeros((C_out, ch_out), feats.dtype)

    def step(acc, xs):
        idx_k, w_k = xs
        g = take_rows(feats, idx_k)  # (C_out, ch_in)
        return acc + jnp.dot(g, w_k, preferred_element_type=acc.dtype), None

    acc, _ = jax.lax.scan(step, acc0, (in_idx, kernel))
    return acc


def _conv_vjp_fwd(feats, kernel, in_idx, out_idx_t):
    out = _conv_fwd(feats, kernel, in_idx)
    return out, (feats, kernel, in_idx, out_idx_t)


def _conv_vjp_bwd(res, g):
    feats, kernel, in_idx, out_idx_t = res
    C_in = feats.shape[0]
    ch_in = feats.shape[1]

    # d_feats[i] = Σ_k g[out_idx_t[k, i]] @ W[k]ᵀ   — pure gather, no scatter.
    def step_din(acc, xs):
        t_idx_k, w_k = xs
        go = take_rows(g, t_idx_k)  # (C_in, ch_out)
        return acc + jnp.dot(go, w_k.T, preferred_element_type=acc.dtype), None

    d_feats, _ = jax.lax.scan(
        step_din, jnp.zeros((C_in, ch_in), feats.dtype), (out_idx_t, kernel)
    )

    # d_W[k] = gathered_inᵀ @ g (invalid rows gather zero and vanish).
    def step_dw(_, idx_k):
        gi = take_rows(feats, idx_k)  # (C_out, ch_in)
        return None, jnp.dot(gi.T, g, preferred_element_type=feats.dtype)

    _, d_kernel = jax.lax.scan(step_dw, None, in_idx)
    return d_feats, d_kernel, None, None


sparse_conv.defvjp(_conv_vjp_fwd, _conv_vjp_bwd)


# --- fused Pallas path (TPU): slab-DMA + one-hot MXU gather ----------------


def _outlier_apply(out, buf, kernel, slab):
    """Add the slab map's dropped-pair contributions:
    ``out[dst] += buf[src] @ W[k]`` over the outlier COO list.

    The slab kernel gathers ZERO for any pair whose slab-local index falls
    outside [0, S) (ops/pallas/conv_kernel.py ``_slab_metadata``); with
    outlier-tolerant rung sizing those pairs are real matches (span-tail
    pairs on surface geometry) carried in ``slab.ov_*`` and applied here
    as plain XLA gather → grouped GEMM → scatter-add.

    Two grouped-GEMM shapes, picked by channel width:
    - narrow: k-blocked rows (P, K·Cin) @ (K·Cin, Cout) — one dense MXU
      dot whose zero blocks select each pair's W[k]; K·P·Cin·Cout FLOPs,
      cheap while K·Cin is small.
    - wide (``_use_ragged_ov``): ``lax.ragged_dot`` over the k-sorted COO
      list (``_extract_outliers`` compacts in flat k-major order, so
      pairs are grouped by offset with the -1 padding tail folded into
      the last group — padding rows gather zero and contribute nothing).
      P·Cin·Cout FLOPs: at 128×128ch the k-blocked form costs as much as
      the whole slab conv (~0.45 ms measured), the ragged form ~K× less.

    The application itself is scatter-free when the slab map carries the
    build-time dst-sort permutation (``ov_perm``): permute contributions
    to dst-contiguous runs (run length ≤ K — one correction per offset
    per output at most), segmented-scan the run sums, and fetch each
    output row's run with one searchsorted + row gather.  The TPU
    scatter emitter is shape-erratic (0.04 → 96 ms for ~1M updates at
    near-identical shapes, CLAUDE.md); the gather form is deterministic.
    ``ME_OV_APPLY=scatter`` forces the old ``.at[].add`` path.
    """
    if slab.ov_src is None:
        return out
    Kv = kernel.shape[0]
    X = take_rows(buf, slab.ov_src)  # (P, Cin); padding rows zero
    if _use_ragged_ov(Kv, X.shape[1], kernel.shape[-1]):
        gs = slab.ov_gs if slab.ov_gs is not None else _ov_group_sizes(
            slab.ov_k, Kv
        )
        contrib = jax.lax.ragged_dot(
            X, kernel, gs, preferred_element_type=jnp.float32,
        )
    else:
        w2d = kernel.reshape(-1, kernel.shape[-1])
        parts = []
        # ONE MXU matmul per chunk: (P, K·Cin) @ (K·Cin, Cout); far fewer
        # dispatches than a K-step scan — the scan measured 0.9 ms at 27
        # offsets from per-step overhead alone
        for lo, hi in _p_chunks(X.shape[0], Kv * X.shape[1]):
            Xe = _k_blocked(X[lo:hi], slab.ov_k[lo:hi], Kv)
            parts.append(jnp.dot(Xe, w2d, preferred_element_type=jnp.float32))
        contrib = (
            jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        )
    if _use_gather_ov(slab):
        return _ov_apply_sorted(out, contrib, slab, Kv)
    tgt = jnp.where(slab.ov_dst >= 0, slab.ov_dst, out.shape[0])
    return out.at[tgt].add(contrib.astype(out.dtype), mode="drop")


_OV_APPLY_ENV = os.environ.get("ME_OV_APPLY")  # "scatter" forces .at[].add


def _use_gather_ov(slab) -> bool:
    return slab.ov_perm is not None and _OV_APPLY_ENV != "scatter"


def _segment_runsums(vals, seg, max_run: int):
    """Inclusive segmented (Hillis-Steele) scan over contiguous runs of
    equal ``seg``: after ceil(log2(max_run)) doubling steps each run's
    LAST element holds the run's full sum.  ``seg`` must be sorted so
    runs are contiguous; per-run sums are exact f32 segment sums (no
    cross-run cancellation, unlike a cumsum-difference)."""
    P = vals.shape[0]
    d = 1
    while d < max_run and d < P:
        shifted = jnp.concatenate([jnp.zeros_like(vals[:d]), vals[:-d]], 0)
        same = jnp.concatenate(
            [jnp.zeros((d,), bool), seg[d:] == seg[:-d]], 0
        )
        vals = vals + jnp.where(same[:, None], shifted, 0.0)
        d <<= 1
    return vals


def _ov_apply_sorted(out, contrib, slab, kernel_volume: int):
    """Scatter-free COO application: dst-sorted run sums, fetched from
    the output side by searchsorted + gather."""
    perm = slab.ov_perm
    dst_s = jnp.take(slab.ov_dst, perm)
    seg = jnp.where(dst_s >= 0, dst_s, jnp.int32(2**30))  # pad tail last
    contrib_s = jnp.take(contrib, perm, axis=0)
    sums = _segment_runsums(contrib_s, seg, kernel_volume)
    rows = jnp.arange(out.shape[0], dtype=jnp.int32)
    pos = jnp.searchsorted(seg, rows, side="right").astype(jnp.int32) - 1
    pos_c = jnp.clip(pos, 0, seg.shape[0] - 1)
    hit = (pos >= 0) & (jnp.take(seg, pos_c) == rows)
    add = jnp.where(hit[:, None], jnp.take(sums, pos_c, axis=0), 0.0)
    return out + add.astype(out.dtype)


_RAGGED_OV_ENV = os.environ.get("ME_RAGGED_OV")
_RAGGED_MIN_KCIN = 512  # k-blocked wins below (one tiny dense dot)


def _use_ragged_ov(kernel_volume, cin, cout):
    if _RAGGED_OV_ENV is not None:
        return _RAGGED_OV_ENV == "1"
    del cout
    return kernel_volume * cin >= _RAGGED_MIN_KCIN


def _ov_group_sizes(ov_k, kernel_volume):
    """Per-offset pair counts for the ragged grouped GEMMs.  ``ov_k`` is
    k-sorted with the -1 padding tail last; the tail is folded into the
    final group (its rows gather zero rows, so the group it lands in is
    irrelevant)."""
    counts = jnp.sum(
        (
            ov_k[:, None]
            == jnp.arange(kernel_volume, dtype=ov_k.dtype)[None, :]
        ).astype(jnp.int32),
        axis=0,
    )
    pad = jnp.int32(ov_k.shape[0]) - jnp.sum(counts)
    return counts.at[kernel_volume - 1].add(pad)


_MAX_XE_ELEMS = 32 * 1024 * 1024  # k-blocked intermediate cap (128 MB f32)


def _p_chunks(P, row_elems):
    """Static (lo, hi) chunks of the pair axis bounding P·K·Cin."""
    step = max(256, _MAX_XE_ELEMS // max(row_elems, 1))
    return [(lo, min(lo + step, P)) for lo in range(0, P, step)]


def _k_blocked(X, ov_k, kernel_volume):
    """(P, K·Cin) block row per pair: X[p] placed in block ov_k[p], zeros
    elsewhere — turns the per-pair weight selection into plain GEMM."""
    P, cin = X.shape
    sel = (
        ov_k[:, None] == jnp.arange(kernel_volume, dtype=jnp.int32)[None, :]
    )  # (P, K)
    return (
        sel[:, :, None].astype(X.dtype) * X[:, None, :]
    ).reshape(P, kernel_volume * cin)


def _outlier_dw(d_kernel, feats, g, slab):
    """dW correction for dropped pairs: ``dW[k] += feats[src]ᵀ ⊗ g[dst]``,
    as a grouped GEMM on the k-sorted pair rows (see _outlier_apply for
    the narrow/wide split; the wide form is ``ragged_dot_general`` with
    the pair axis ragged-contracted, yielding one (K, Cin, Cout) output)."""
    if slab.ov_src is None:
        return d_kernel
    Kv, cin, cout = d_kernel.shape
    X = take_rows(feats, slab.ov_src)
    G = take_rows(g, slab.ov_dst)  # (P, Cout); padding rows zero
    if _use_ragged_ov(Kv, cin, cout):
        rdn = jax.lax.RaggedDotDimensionNumbers(
            dot_dimension_numbers=(((0,), (0,)), ((), ())),
            lhs_ragged_dimensions=[0],
            rhs_group_dimensions=[],
        )
        gs = slab.ov_gs if slab.ov_gs is not None else _ov_group_sizes(
            slab.ov_k, Kv
        )
        dws = jax.lax.ragged_dot_general(
            X, G, gs, rdn, preferred_element_type=jnp.float32,
        )
        return d_kernel + dws.astype(d_kernel.dtype)
    dws = 0.0
    for lo, hi in _p_chunks(X.shape[0], Kv * cin):
        Xe = _k_blocked(X[lo:hi], slab.ov_k[lo:hi], Kv)
        dws = dws + jnp.dot(Xe.T, G[lo:hi], preferred_element_type=jnp.float32)
    return d_kernel + dws.reshape(Kv, cin, cout).astype(d_kernel.dtype)


@jax.custom_vjp
def sparse_conv_pallas(feats, kernel, fwd_slab, bwd_slab, n_out=None, n_in=None):
    """``n_out`` / ``n_in``: optional traced valid-row counts of the
    output / input maps — lets the slab kernels skip the all-padding tail
    tiles of the pow2 capacity bucket at runtime (up to ~25% of grid
    steps; no re-lowering when the counts jitter between batches)."""
    from .pallas.conv_kernel import sparse_conv_fwd_pallas

    out = sparse_conv_fwd_pallas(feats, kernel, fwd_slab, n_valid_out=n_out)
    return _outlier_apply(out, feats, kernel, fwd_slab)


def _conv_pallas_fwd(feats, kernel, fwd_slab, bwd_slab, n_out=None, n_in=None):
    out = sparse_conv_pallas(feats, kernel, fwd_slab, bwd_slab, n_out, n_in)
    return out, (feats, kernel, fwd_slab, bwd_slab, n_out, n_in)


def _conv_pallas_bwd(res, g):
    from .pallas.conv_kernel import (
        sparse_conv_dw_pallas,
        sparse_conv_fwd_pallas,
    )

    feats, kernel, fwd_slab, bwd_slab, n_out, n_in = res
    # d_in[i] = Σ_k g[out_idx_t[k, i]] @ W[k]ᵀ — the forward kernel run on
    # the transposed matching with transposed weights.
    w_t = jnp.swapaxes(kernel, 1, 2)
    d_feats = sparse_conv_fwd_pallas(g, w_t, bwd_slab, n_valid_out=n_in)
    d_feats = _outlier_apply(d_feats, g, w_t, bwd_slab)
    d_kernel = sparse_conv_dw_pallas(
        feats, g, fwd_slab, kernel.shape, n_valid_out=n_out
    )
    d_kernel = _outlier_dw(d_kernel, feats, g, fwd_slab)
    return d_feats, d_kernel, None, None, None, None


sparse_conv_pallas.defvjp(_conv_pallas_fwd, _conv_pallas_bwd)


# Jitted wrappers for eager-mode module calls: without them each eager
# invocation re-traces (and for pallas, re-lowers the Mosaic kernel —
# measured ~350 ms per eager conv call); the jit cache makes repeat eager
# calls O(dispatch).  Under an outer jit these inline transparently.
_sparse_conv_jit = jax.jit(sparse_conv)
_sparse_conv_pallas_jit = jax.jit(sparse_conv_pallas)


def use_pallas_conv(kmap: KernelMap, feats, kernel) -> bool:
    from ..config import force_xla_conv
    from .pallas.conv_kernel import pallas_conv_supported

    return (
        not force_xla_conv()
        and kmap.fwd_slab is not None
        and kmap.bwd_slab is not None
        and jax.default_backend() == "tpu"
        and feats.dtype in (jnp.float32, jnp.bfloat16)
        and pallas_conv_supported(kmap.fwd_slab, kernel.shape)
        and pallas_conv_supported(kmap.bwd_slab, kernel.shape)
    )


def sparse_conv_kmap(feats, kernel, kmap: KernelMap):
    from ..config import spatial_execution_ctx

    sp = spatial_execution_ctx()
    if sp is not None:
        # Spatial sharding: the halo-exchange conv (parallel/spatial.py).
        # halo=None measures the exact per-map halos (host-cached), so the
        # dropped-pair count is structurally zero.
        from ..parallel.spatial import spatial_conv_apply

        out, _dropped = spatial_conv_apply(
            feats, kernel, kmap, mesh=sp[0], axis_name=sp[1]
        )
        return out.astype(feats.dtype)
    if use_pallas_conv(kmap, feats, kernel):
        return _sparse_conv_pallas_jit(
            feats, kernel, kmap.fwd_slab, kmap.bwd_slab,
            kmap.n_out, kmap.n_in,
        )
    return _sparse_conv_jit(feats, kernel, kmap.in_idx, kmap.out_idx_t)


@jax.jit
def channelwise_conv(feats, kernel, in_idx):
    """Depthwise conv: out[o] = Σ_k in[in_idx[k,o]] * kernel[k].

    Reference: MinkowskiChannelwiseConvolution.py:142-191 (a pure-Python
    per-offset multiply-accumulate there too).  kernel: (K, ch).
    """
    def step(acc, xs):
        idx_k, w_k = xs
        return acc + take_rows(feats, idx_k) * w_k[None, :], None

    C_out = in_idx.shape[1]
    acc, _ = jax.lax.scan(
        step, jnp.zeros((C_out, feats.shape[1]), feats.dtype), (in_idx, kernel)
    )
    return acc


# ---------------------------------------------------------------------------
# local pooling
# ---------------------------------------------------------------------------


@jax.jit
def local_pool_sum(feats, in_idx) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (pooled (C_out, ch), num_nonzero (C_out,))."""
    def step(carry, idx_k):
        acc, cnt = carry
        acc = acc + take_rows(feats, idx_k)
        cnt = cnt + (idx_k >= 0).astype(feats.dtype)
        return (acc, cnt), None

    C_out = in_idx.shape[1]
    (acc, cnt), _ = jax.lax.scan(
        step,
        (
            jnp.zeros((C_out, feats.shape[1]), feats.dtype),
            jnp.zeros((C_out,), feats.dtype),
        ),
        in_idx,
    )
    return acc, cnt


@jax.jit
def local_pool_avg(feats, in_idx) -> Tuple[jnp.ndarray, jnp.ndarray]:
    acc, cnt = local_pool_sum(feats, in_idx)
    return acc / jnp.maximum(cnt, 1.0)[:, None], cnt


@jax.jit
def local_pool_max(feats, in_idx) -> jnp.ndarray:
    """Max pooling; rows with no pairs yield 0.

    Gradient routes entirely to the stored argmax (first maximum on ties),
    matching the reference's max_index mask
    (src/pooling_max_kernel.hpp:35-117) — a chained ``jnp.maximum`` would
    split tie gradients 50/50 instead.
    """
    K, C_out = in_idx.shape
    ch = feats.shape[1]

    def step(carry, x):
        k, idx_k = x
        g = take_rows(jax.lax.stop_gradient(feats), idx_k)
        g = jnp.where((idx_k >= 0)[:, None], g, NEG_INF)
        best, best_k = carry
        better = g > best  # strict: first max wins, like the reference
        return (
            jnp.where(better, g, best),
            jnp.where(better, k, best_k),
        ), None

    init = (
        jnp.full((C_out, ch), NEG_INF, feats.dtype),
        jnp.full((C_out, ch), -1, jnp.int32),
    )
    (_, best_k), _ = jax.lax.scan(
        step, init, (jnp.arange(K, dtype=jnp.int32), in_idx)
    )
    # Winning input row per (out, channel); -1 where no valid input.
    win_row = jnp.take_along_axis(
        in_idx.T, jnp.clip(best_k, 0, K - 1), axis=1
    )
    win_row = jnp.where(best_k >= 0, win_row, -1)
    gathered = feats[jnp.clip(win_row, 0), jnp.arange(ch)[None, :]]
    return jnp.where(win_row >= 0, gathered, 0.0)


# ---------------------------------------------------------------------------
# global pooling / broadcast
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2, 3))
def global_pool(feats, origin_rows, num_batches: int, mode: str):
    """Pool every row of each batch into one row.

    Args:
      origin_rows: (C_in,) int32 batch-segment id per row (-1 padding).
      num_batches: static segment capacity (origin map capacity).
      mode: 'sum' | 'avg' | 'max'.

    Returns:
      (pooled (num_batches, ch), num_nonzero (num_batches,)).
    Reference: src/global_pooling_cpu.cpp:44-227.
    """
    cnt = segment_count(origin_rows, num_batches)
    if mode == "sum":
        return segment_sum(feats, origin_rows, num_batches), cnt
    if mode == "avg":
        return segment_mean(feats, origin_rows, num_batches), cnt
    if mode == "max":
        return segment_max(feats, origin_rows, num_batches), cnt
    raise ValueError(f"unknown mode {mode}")


@functools.partial(jax.jit, static_argnums=(3,))
def broadcast(feats, glob, origin_rows, op: str):
    """Combine per-batch global rows back onto every point.

    Reference: src/broadcast_cpu.cpp:43-150 (hand-written backward there;
    autodiff here — gather VJP handles it).
    """
    g = take_rows(glob, origin_rows)  # (C_in, ch)
    if op == "add":
        out = feats + g
    elif op == "mul":
        out = feats * g
    else:
        raise ValueError(f"unknown op {op}")
    return jnp.where((origin_rows >= 0)[:, None], out, 0.0)


# ---------------------------------------------------------------------------
# pruning / union / interpolation
# ---------------------------------------------------------------------------


def prune_features(feats, out_from_in):
    """Copy kept rows (gather by the pruning map).  Reference:
    src/pruning_cpu.cpp:43-140."""
    return take_rows(feats, out_from_in)


def union_features(feats_list, out_from_in_list):
    """Sum features of several tensors onto the union coordinates.

    Each map is (C_union,) int32: the source row per union row (-1 absent).
    Reference: MinkowskiUnion.py:33-83 (scatter-add there; pure gather-sum
    here because per-tensor coordinate rows are unique).
    """
    acc = None
    for feats, idx in zip(feats_list, out_from_in_list):
        g = take_rows(feats, idx)
        acc = g if acc is None else acc + g
    return acc


def interpolate_features(feats, neighbor_rows, weights):
    """Multilinear interpolation: Σ_c w_c · feats[row_c].

    Args:
      neighbor_rows: (N, 2^D) int32, -1 for missing corners.
      weights: (N, 2^D) float, zero where missing.
    Reference: src/interpolation_kernel.hpp:40-124.
    """
    g = take_rows(feats, neighbor_rows)  # (N, 2^D, ch)
    return jnp.einsum("nc,ncf->nf", weights.astype(g.dtype), g)


def splat_features(field_feats, neighbor_rows, weights, num_rows: int):
    """Transpose of interpolation: scatter-add weighted field features onto
    sparse rows (TensorField.splat, MinkowskiTensorField.py:381-406)."""
    w = weights.astype(field_feats.dtype)
    contrib = field_feats[:, None, :] * w[:, :, None]  # (N, 2^D, ch)
    flat_rows = neighbor_rows.reshape(-1)
    flat = contrib.reshape(-1, field_feats.shape[-1])
    return segment_sum(flat, flat_rows, num_rows)
