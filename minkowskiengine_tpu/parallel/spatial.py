"""Spatial sharding: ONE large point cloud split across the device mesh.

Data parallelism (data_parallel.py) scales the BATCH axis; this module
scales the only remaining axis — a single cloud too large for one chip's
HBM (SURVEY §2.3 names it as the beyond-HBM scale-out with no reference
precedent: the reference's multi-GPU story, examples/multigpu.py and
examples/multigpu_ddp.py, is batch-replication only).

Design (TPU-native, no reference analogue):

* Coordinate maps are sorted by canonical key (batch-major lexicographic,
  coords/keys.py) — consecutive rows are spatially local slabs, the SAME
  invariant the Pallas slab kernels exploit.  Each device owns one
  CONTIGUOUS row range of every map: features shard as
  ``P('space', None)`` row blocks, kernel maps as ``P(None, 'space')``
  column blocks.  No re-indexing, no routing tables.
* A kernel offset is a bounded spatial shift, so the input rows an
  output block references cluster around the matching input block: a
  fixed-width HALO band from each neighbor (one ``lax.ppermute`` hop per
  side, riding the ICI ring) covers them.  The halo width is measured
  exactly per map (``required_halo``) and validated on device — pairs
  outside the window are COUNTED (``dropped``), never silently lost.
* Maps whose references are not local (coarse levels with few rows,
  stride maps) fall back to ``all_gather`` of the feature block — those
  levels are small, so the memory cost is bounded.
* Backward is scatter-free, mirroring ops/functional.py::sparse_conv:
  d_feats runs the SAME halo-gather with the transposed matching
  (``out_idx_t``) and transposed weights; dW is a per-device contraction
  ``psum``-reduced over the mesh.

Example::

    mesh = make_spatial_mesh(8)
    f = shard_rows(x.padded_features, mesh)
    out, dropped = spatial_conv_apply(f, W, kmap, mesh=mesh)

Gradients flow through ``ppermute``/``all_gather``/``psum`` (all
differentiable XLA collectives).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..coords.kernel_map import KernelMap
from ..ops.functional import take_rows

__all__ = [
    "make_spatial_mesh",
    "shard_rows",
    "shard_sparse_tensor",
    "required_halo",
    "spatial_conv_apply",
    "spatial_global_avg",
    "spatial_global_sum",
    "spatial_masked_moments",
]


def make_spatial_mesh(
    n_devices: Optional[int] = None, axis_name: str = "space"
) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_rows(arr, mesh: Mesh, axis_name: str = "space"):
    """Place a (rows, ch) array as contiguous per-device row blocks."""
    spec = P(axis_name, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def shard_sparse_tensor(x, mesh: Mesh, axis_name: str = "space"):
    """A SparseTensor whose padded feature rows are spatially sharded
    (same geometry/manager).  Use together with
    ``ME.spatial_execution(mesh)`` to run whole models over one sharded
    cloud::

        xs = shard_sparse_tensor(x, mesh)
        with ME.spatial_execution(mesh):
            y = net(xs)          # every conv runs the halo path
    """
    from ..sparse_tensor import SparseTensor

    return SparseTensor(
        shard_rows(x.padded_features, mesh, axis_name),
        coordinate_map_key=x.coordinate_map_key,
        coordinate_manager=x.coordinate_manager,
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# measured halos cached per kernel map (keyed by in_idx buffer identity;
# maps are immutable) — spatial_conv_apply(halo=None) in a training loop
# must not pay a host sync per step
_HALO_CACHE: dict = {}


def required_halo(kmap: KernelMap, n_dev: int) -> tuple:
    """(halo_fwd, halo_bwd) host ints: the exact single-hop halo widths
    that make every valid pair land inside its output block's window.

    halo_fwd covers ``in_idx`` references from out blocks; halo_bwd
    covers ``out_idx_t`` references from in blocks (the d_feats pass).
    A value > its block size means single-hop halos cannot cover the
    map — use the all-gather fallback (``spatial_conv_apply`` does this
    automatically when ``halo=None``).  Both maxima come back in ONE
    host sync, and the result is cached per (map, n_dev).
    """
    import weakref

    ck = (id(kmap.in_idx), n_dev)
    hit = _HALO_CACHE.get(ck)
    if hit is not None:
        ref, val = hit
        if ref() is kmap.in_idx:  # id() reuse after GC → treat as miss
            return val

    def one(idx, cap_ref):
        C = idx.shape[1]
        B_base = C // n_dev
        B_ref = cap_ref // n_dev
        blk = jnp.arange(C, dtype=jnp.int32) // B_base
        lo = blk * B_ref
        excess = jnp.maximum(lo - idx, idx - (lo + B_ref - 1))
        return jnp.max(jnp.where(idx >= 0, excess, 0))

    hf, hb = jax.device_get((
        one(kmap.in_idx, kmap.capacity_in),
        one(kmap.out_idx_t, kmap.capacity_out),
    ))
    out = _round_up(int(hf), 64), _round_up(int(hb), 64)
    if len(_HALO_CACHE) > 256:
        _HALO_CACHE.clear()
    try:
        _HALO_CACHE[ck] = (weakref.ref(kmap.in_idx), out)
    except TypeError:  # object not weakref-able: skip caching
        pass
    return out


def _halo_window(f_blk, halo: int, axis_name: str, n: int):
    """(B + 2·halo, ch) window: this block with one neighbor band per
    side.  Edge devices' missing bands arrive as zeros (ppermute with no
    matching source) — zero rows are exactly padding semantics."""
    if n == 1 or halo == 0:
        return jnp.pad(f_blk, ((halo, halo), (0, 0))) if halo else f_blk
    lo = jax.lax.ppermute(
        f_blk[-halo:], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    hi = jax.lax.ppermute(
        f_blk[:halo], axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    return jnp.concatenate([lo, f_blk, hi], axis=0)


def _local_gather_mm(window, idx_blk, kernel, base):
    """out[o] = Σ_k window[idx[k, o] - base] @ W[k] for window-local
    pairs; returns (out_blk, dropped_count) — dropped counts the VALID
    pairs whose reference falls outside the window (halo too narrow)."""
    W_rows = window.shape[0]

    def step(carry, xs):
        acc, dropped = carry
        idx_k, w_k = xs
        li = idx_k - base
        inside = (li >= 0) & (li < W_rows)
        valid = idx_k >= 0
        g = take_rows(window, jnp.where(valid & inside, li, -1))
        acc = acc + jnp.dot(g, w_k, preferred_element_type=jnp.float32)
        dropped = dropped + jnp.sum((valid & ~inside).astype(jnp.int32))
        return (acc, dropped), None

    C_out = idx_blk.shape[1]
    acc0 = jnp.zeros((C_out, kernel.shape[-1]), jnp.float32)
    (acc, dropped), _ = jax.lax.scan(step, (acc0, jnp.int32(0)), (idx_blk, kernel))
    return acc, dropped


def _gather_mm_sharded(feats, kernel, idx, mesh, axis_name, halo, gather_all):
    """Sharded out[o] = Σ_k feats[idx[k, o]] @ W[k].

    feats rows and idx columns are sharded over ``axis_name``; each
    device gathers from its halo window (or the all-gathered rows when
    ``gather_all``).  Returns (out sharded by rows, total dropped)."""
    n = mesh.shape[axis_name]
    B_in = feats.shape[0] // n

    def local_fn(f_blk, idx_blk):
        d = jax.lax.axis_index(axis_name)
        if gather_all:
            window = jax.lax.all_gather(f_blk, axis_name, tiled=True)
            base = jnp.int32(0)
        else:
            window = _halo_window(f_blk, halo, axis_name, n)
            base = d * B_in - halo
        out_blk, dropped = _local_gather_mm(window, idx_blk, kernel, base)
        return out_blk, jax.lax.psum(dropped, axis_name)

    return _shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(None, axis_name)),
        out_specs=(P(axis_name, None), P()),
        check_vma=False,
    )(feats, idx)


def _dw_sharded(feats, g, idx, mesh, axis_name, halo, gather_all, K):
    """dW[k] = Σ_o feats[idx[k, o]]ᵀ ⊗ g[o], psum-reduced over blocks."""
    n = mesh.shape[axis_name]
    B_in = feats.shape[0] // n

    def local_fn(f_blk, g_blk, idx_blk):
        d = jax.lax.axis_index(axis_name)
        if gather_all:
            window = jax.lax.all_gather(f_blk, axis_name, tiled=True)
            base = jnp.int32(0)
        else:
            window = _halo_window(f_blk, halo, axis_name, n)
            base = d * B_in - halo
        W_rows = window.shape[0]

        def step(_, idx_k):
            li = idx_k - base
            ok = (idx_k >= 0) & (li >= 0) & (li < W_rows)
            gath = take_rows(window, jnp.where(ok, li, -1))
            return None, jnp.dot(
                gath.T, g_blk, preferred_element_type=jnp.float32
            )

        _, dw = jax.lax.scan(step, None, idx_blk)  # (K, Cin, Cout)
        return jax.lax.psum(dw, axis_name)

    return _shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None), P(None, axis_name)),
        out_specs=P(),
        check_vma=False,
    )(feats, g, idx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _spatial_conv(feats, kernel, kmap, mesh, axis_name, halo_f, halo_b,
                  gather_all):
    out, dropped = _gather_mm_sharded(
        feats, kernel, kmap.in_idx, mesh, axis_name, halo_f, gather_all
    )
    return out, dropped


def _spatial_conv_fwd(feats, kernel, kmap, mesh, axis_name, halo_f, halo_b,
                      gather_all):
    out = _spatial_conv(
        feats, kernel, kmap, mesh, axis_name, halo_f, halo_b, gather_all
    )
    return out, (feats, kernel, kmap)


def _spatial_conv_bwd(mesh, axis_name, halo_f, halo_b, gather_all, res, cts):
    g, _ = cts
    feats, kernel, kmap = res
    g = g.astype(feats.dtype)
    w_t = jnp.swapaxes(kernel, 1, 2)
    # d_feats: the same halo gather run on the transposed matching —
    # scatter-free (mirrors ops/functional.py::_conv_vjp_bwd)
    d_feats, _ = _gather_mm_sharded(
        g, w_t, kmap.out_idx_t, mesh, axis_name, halo_b, gather_all
    )
    d_kernel = _dw_sharded(
        feats, g, kmap.in_idx, mesh, axis_name, halo_f, gather_all,
        kernel.shape[0],
    )
    return d_feats.astype(feats.dtype), d_kernel.astype(kernel.dtype), None


_spatial_conv.defvjp(_spatial_conv_fwd, _spatial_conv_bwd)


def spatial_conv_apply(
    feats,
    kernel,
    kmap: KernelMap,
    *,
    mesh: Mesh,
    axis_name: str = "space",
    halo: Optional[int] = None,
    force_all_gather: bool = False,
):
    """Sparse convolution over spatially sharded features.

    feats: (C_in, Cin) rows sharded ``P(axis_name, None)``.
    Returns (out (C_out, Cout) sharded by rows, dropped () int32).
    ``dropped`` > 0 means the halo was too narrow for this geometry —
    re-run with a wider one (``required_halo``) exactly like the slab
    floors ratchet; with ``halo=None`` it is measured and cannot drop.
    """
    n = mesh.shape[axis_name]
    B_in = kmap.capacity_in // n
    B_out = kmap.capacity_out // n
    if kmap.capacity_in % n or kmap.capacity_out % n:
        raise ValueError(
            f"capacities ({kmap.capacity_in}, {kmap.capacity_out}) must be "
            f"divisible by the {n}-device mesh"
        )
    gather_all = bool(force_all_gather)
    if halo is None:
        hf, hb = required_halo(kmap, n)
        if hf > B_in or hb > B_out:
            gather_all = True
        halo_f, halo_b = min(hf, B_in), min(hb, B_out)
    else:
        halo_f = halo_b = int(halo)
        if halo_f > min(B_in, B_out):
            gather_all = True
    return _spatial_conv(
        feats, kernel, kmap, mesh, axis_name, halo_f, halo_b, gather_all
    )


def spatial_masked_moments(feats, valid, *, mesh, axis_name: str = "space"):
    """(mean, var) over VALID sharded rows — the SyncBatchNorm statistics
    for spatially sharded features (mirrors nn/norm.py's psum SyncBN, but
    over the 'space' axis of one cloud instead of the batch axis)."""

    def local_fn(f_blk, v_blk):
        m = v_blk.astype(f_blk.dtype)[:, None]
        n = jax.lax.psum(jnp.sum(m), axis_name)
        s = jax.lax.psum(jnp.sum(f_blk * m, axis=0), axis_name)
        s2 = jax.lax.psum(jnp.sum(f_blk * f_blk * m, axis=0), axis_name)
        mean = s / jnp.maximum(n, 1.0)
        return mean, jnp.maximum(s2 / jnp.maximum(n, 1.0) - mean * mean, 0.0)

    return _shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )(feats, valid)


def spatial_global_sum(feats, batch_ids, n_batches, *, mesh,
                       axis_name: str = "space"):
    """Per-batch feature sums over sharded rows (batch_ids: (C,) int32,
    -1 = padding), psum-reduced across the mesh."""

    def local_fn(f_blk, b_blk):
        seg = jax.ops.segment_sum(
            jnp.where((b_blk >= 0)[:, None], f_blk, 0),
            jnp.where(b_blk >= 0, b_blk, n_batches),
            num_segments=n_batches + 1,
        )[:n_batches]
        return jax.lax.psum(seg, axis_name)

    return _shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )(feats, batch_ids)


def spatial_global_avg(feats, batch_ids, n_batches, *, mesh,
                       axis_name: str = "space"):
    """Per-batch feature means over sharded rows."""
    s = spatial_global_sum(feats, batch_ids, n_batches, mesh=mesh,
                          axis_name=axis_name)

    def count_fn(b_blk):
        cnt = jax.ops.segment_sum(
            jnp.ones_like(b_blk, jnp.float32),
            jnp.where(b_blk >= 0, b_blk, n_batches),
            num_segments=n_batches + 1,
        )[:n_batches]
        return jax.lax.psum(cnt, axis_name)

    cnt = _shard_map(
        count_fn, mesh=mesh, in_specs=P(axis_name), out_specs=P(),
        check_vma=False,
    )(batch_ids)
    return s / jnp.maximum(cnt, 1.0)[:, None]
