"""Multi-chip data parallelism over a JAX device mesh.

TPU-native replacement for the reference's example-level DDP
(reference: examples/multigpu_ddp.py:81-119 — NCCL process groups + torch
DistributedDataParallel).  Here parallelism is compiled into the program:
`nnx.shard_map` over a `jax.sharding.Mesh`, with `lax.pmean` gradient
reduction riding the ICI and SyncBatchNorm statistics psum-reduced inside
the same program (nn/norm.py).  There is no NCCL, no process-group
bootstrap, no gradient bucketing — XLA schedules the collectives.

Two regimes:

- **Shared geometry template** (``make_data_parallel_step``): each device
  processes its own feature batch over one coordinate structure baked into
  the program as constants.  Cheapest when geometry repeats.
- **Per-device geometry** (``make_per_device_geometry_step``): each replica
  trains on its *own point cloud* — the reference's actual DDP regime
  (examples/multigpu_ddp.py:100-119).  Per-device ``Geometry`` pytrees
  (coords/geometry.py) are stacked along a device axis and flow through
  ``shard_map`` as sharded *arguments*; one compiled step serves every
  replica and every fresh batch in the same capacity bucket.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def replicate(tree, mesh: Mesh):
    """Place every leaf fully replicated across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(tree, mesh: Mesh, axis_name: str = "data"):
    """Shard the leading axis of every leaf across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P(axis_name)))


def make_data_parallel_step(
    model: nnx.Module,
    optimizer: nnx.Optimizer,
    loss_fn: Callable,
    mesh: Mesh,
    axis_name: str = "data",
):
    """Build a jitted data-parallel training step.

    Args:
      model: nnx model (parameters replicated across the mesh).
      optimizer: ``nnx.Optimizer(model, tx, wrt=nnx.Param)``.
      loss_fn: ``loss_fn(model, *local_batch) -> scalar``; each local batch
        leaf has a leading axis of size ``global // n_devices`` (usually 1).
        SyncBatchNorm layers should use this ``axis_name``.
      mesh: the device mesh.

    Returns:
      ``step(model, optimizer, *batch) -> loss`` — call with batch leaves
      whose leading axis spans devices (shard with ``shard_batch``).
    """

    def _inner(model, optimizer, *batch):
        loss, grads = nnx.value_and_grad(loss_fn)(model, *batch)
        grads = jax.lax.pmean(grads, axis_name)  # ← the DDP allreduce
        optimizer.update(model, grads)
        return jax.lax.pmean(loss, axis_name)

    state_spec = nnx.StateSharding({...: P()})  # replicate all model state

    @nnx.jit
    def step(model, optimizer, *batch):
        inner = nnx.shard_map(
            _inner,
            mesh=mesh,
            in_specs=(state_spec, state_spec)
            + tuple(P(axis_name) for _ in batch),
            out_specs=P(),
            check_vma=False,
        )
        return inner(model, optimizer, *batch)

    return step


def make_per_device_geometry_step(
    model: nnx.Module,
    optimizer: nnx.Optimizer,
    loss_fn: Callable,
    mesh: Mesh,
    axis_name: str = "data",
):
    """Build a jitted DP training step where each device owns its geometry.

    This is the reference's true DDP training regime — different samples
    (point clouds) per replica (reference: examples/multigpu_ddp.py:100-119)
    — expressed TPU-natively: geometry is DATA.  Stack per-device
    ``Geometry`` pytrees (``stack_geometries``), shard them with
    ``shard_batch``, and the compiled program gathers/reduces through each
    replica's own kernel maps before pmean-ing gradients over ICI.

    Args:
      loss_fn: ``loss_fn(model, geo, *local_batch) -> scalar`` where ``geo``
        is this replica's (already squeezed) ``Geometry`` and each
        local-batch leaf keeps its leading local-shard axis (usually 1).
        Rebuild the input inside with::

            mgr = ME.CoordinateManager.from_geometry(geo)
            xt = ME.SparseTensor(feats[0], coordinate_map_key=geo.entry_key,
                                 coordinate_manager=mgr)

    Returns:
      ``step(model, optimizer, stacked_geo, *batch) -> loss``; pass
      ``stacked_geo = shard_batch(stack_geometries(geos), mesh)`` and batch
      leaves with a leading device axis.
    """
    from ..coords.geometry import squeeze_geometry

    def _inner(model, optimizer, geo, *batch):
        loss, grads = nnx.value_and_grad(loss_fn)(
            model, squeeze_geometry(geo), *batch
        )
        grads = jax.lax.pmean(grads, axis_name)
        optimizer.update(model, grads)
        return jax.lax.pmean(loss, axis_name)

    state_spec = nnx.StateSharding({...: P()})

    @nnx.jit
    def step(model, optimizer, geo, *batch):
        inner = nnx.shard_map(
            _inner,
            mesh=mesh,
            in_specs=(state_spec, state_spec, P(axis_name))
            + tuple(P(axis_name) for _ in batch),
            out_specs=P(),
            check_vma=False,
        )
        return inner(model, optimizer, geo, *batch)

    return step


def all_reduce_metrics(tree, mesh: Mesh):
    """Mean-reduce per-device metric arrays (leading device axis) — the TPU
    analogue of the reference's explicit ``dist.all_reduce``
    (examples/multigpu_ddp.py:119)."""
    return jax.tree.map(lambda v: jax.numpy.mean(v, axis=0), tree)
