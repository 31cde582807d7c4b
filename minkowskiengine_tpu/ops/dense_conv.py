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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# cost-model constants calibrated on v5e (see CLAUDE.md):
# dense time is nearly channel/K-independent (scatter + XLA conv overhead,
# ~0.9 ms at 265k cells); sparse slab-kernel time scales with grid steps.
_DENSE_US_PER_CELL = 0.0035
_SPARSE_US_PER_STEP = 0.1
_MAX_DENSE_BYTES = 1 << 30


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DensePlan:
    """Scatter/gather indices between a coordinate map and its dense bbox grid.

    flat_idx: (C,) int32 — flattened cell index per map row (batch-major),
      -1 for padding rows.
    grid_shape: static (B, E_1..E_D) cell counts.
    """

    flat_idx: jnp.ndarray
    grid_shape: Tuple[int, ...]

    @property
    def cells(self) -> int:
        return int(np.prod(self.grid_shape))

    def tree_flatten(self):
        return (self.flat_idx,), (self.grid_shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (flat_idx,) = children
        return cls(flat_idx, aux[0])


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
    return DensePlan(flat, tuple(int(g) for g in grid_shape_floor)), ok


def build_dense_plan(
    coordinate_map, bbox=None, extent_floor=None
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
    extents = np.maximum((maxs[1:] - mins[1:]) // ts + 1, 1)
    # round extents up to multiples of 16: stable conv shapes across
    # geometry jitter (each new dense shape is an XLA recompile)
    extents = ((extents + 15) // 16) * 16
    batches = int(maxs[0] - mins[0] + 1)
    if extent_floor is not None:
        batches = max(batches, int(extent_floor[0]))
        extents = np.maximum(extents, np.asarray(extent_floor[1:]))
    grid_shape = (batches,) + tuple(int(e) for e in extents)
    flat = _flat_indices(
        coords,
        valid,
        jnp.asarray(mins),
        jnp.asarray(extents.astype(np.int32)),
        jnp.asarray(ts.astype(np.int32)),
    )
    return DensePlan(flat, grid_shape)


def dense_conv_beneficial(
    plan: Optional[DensePlan],
    n_points_capacity: int,
    kernel_volume: int,
    cin: int,
    cout: int,
    tile: int = 256,
) -> bool:
    """Cost model: dense scatter+conv+gather vs the sparse slab kernel."""
    if plan is None:
        return False
    cells = plan.cells
    if cells * (cin + cout) * 4 > _MAX_DENSE_BYTES:
        return False
    dense_us = cells * _DENSE_US_PER_CELL
    steps = max(n_points_capacity // tile, 1) * kernel_volume
    sparse_us = steps * _SPARSE_US_PER_STEP
    return dense_us < 0.8 * sparse_us


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

    safe = jnp.where(plan.flat_idx >= 0, plan.flat_idx, cells)
    dense = (
        jnp.zeros((cells + 1, cin), feats.dtype)
        .at[safe]
        .set(feats, mode="drop")[:cells]
        .reshape((B,) + spatial + (cin,))
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

    if D == 3:
        dn = jax.lax.conv_dimension_numbers(
            dense.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC")
        )
    elif D == 2:
        dn = jax.lax.conv_dimension_numbers(
            dense.shape, w.shape, ("NHWC", "HWIO", "NHWC")
        )
    elif D == 1:
        dn = jax.lax.conv_dimension_numbers(
            dense.shape, w.shape, ("NWC", "WIO", "NWC")
        )
    else:
        raise NotImplementedError(f"dense dispatch for D={D}")

    # no explicit preferred_element_type: XLA convs accumulate f32 for bf16
    # inputs internally, and mixed preferred dtypes break the conv VJP
    out_dense = jax.lax.conv_general_dilated(
        dense,
        w,
        window_strides=(1,) * D,
        padding=padding,
        rhs_dilation=tuple(dilation),
        dimension_numbers=dn,
    ).astype(feats.dtype)

    flat_out = out_dense.reshape(cells, cout)
    return jnp.take(flat_out, safe, axis=0, mode="fill", fill_value=0)
