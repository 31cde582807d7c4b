"""Tensor parallelism for sparse convolutions — a beyond-reference capability.

The reference has no tensor parallelism (SURVEY §2.3: TP "Absent"); its
multi-GPU story is data-parallel only.  On TPU, channel-sharding the conv
GEMMs is the natural second mesh axis once models outgrow one chip's HBM:
a MinkowskiConvolution kernel is (K, C_in, C_out) and every sparse conv is
gather → dense GEMM, so sharding C_out across a ``"model"`` axis splits
each GEMM column-wise (Megatron-style column parallelism), with XLA's GSPMD
partitioner inserting the activation all-gathers/reduce-scatters — no
hand-written collectives, no NCCL.

This follows the scaling-book recipe: pick a mesh, annotate parameter
shardings, jit, and let the compiler place collectives on ICI.  Because
partitioning happens in XLA, it composes transparently with the
data-parallel axis (2-D ``("data", "model")`` meshes), with autodiff, and
with every layer type — normalization statistics are over the row
dimension, which stays unsharded.

Usage::

    mesh = make_tp_mesh(tp=4)                      # or 2-D dp x tp
    net = MinkUNet34(3, 20, D=3, rngs=nnx.Rngs(0))
    _ = net(x)                                     # warm coordinate phase
    apply_tensor_parallelism(net, mesh)            # shard params in place

    @nnx.jit
    def fwd(net, feats):
        xt = ME.SparseTensor(feats, coordinate_map_key=key,
                             coordinate_manager=mgr)
        return net(xt).padded_features

    out = fwd(net, feats)   # GSPMD runs each conv column-parallel

Note: TP forces the XLA (gather-einsum) conv path — the SPMD partitioner
can shard einsums but not a hand-written Pallas kernel's channel dimension
(``config.set_force_xla_conv``).  The Pallas kernel is single-chip-local by
design; TP targets the capacity regime, not the single-chip latency one.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tp_mesh(
    tp: int,
    dp: Optional[int] = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """Mesh with a trailing tensor-parallel axis (optionally 2-D dp × tp)."""
    devs = jax.devices()
    if dp is None:
        dp = len(devs) // tp
    devs = np.array(devs[: dp * tp]).reshape(dp, tp)
    if dp == 1:
        return Mesh(devs[0], (model_axis,))
    return Mesh(devs, (data_axis, model_axis))


def _param_spec(path, value, model_axis: str):
    """PartitionSpec for one parameter.

    Conv kernels (K, C_in, C_out) and matmul kernels (C_in, C_out) are
    column-parallel (output channels sharded); biases (1, C_out) follow.
    Everything else (norm scales/biases, 1-D vectors) is replicated — GSPMD
    resolves mixed layouts with all-gathers where needed.
    """
    shape = value.shape
    if value.ndim == 3:  # (K, C_in, C_out) sparse-conv kernel
        return P(None, None, model_axis)
    if value.ndim == 2 and "kernel" in str(path[-2:]).lower():
        return P(None, model_axis)  # (C_in, C_out) linear / use_mm conv
    if value.ndim == 2 and shape[0] == 1:  # (1, C_out) bias rows
        return P(None, model_axis)
    return P()


def apply_tensor_parallelism(
    net: nnx.Module, mesh: Mesh, model_axis: str = "model"
) -> nnx.Module:
    """Shard the model's GEMM weights column-parallel across ``model_axis``.

    Parameters are re-placed in place with NamedShardings; subsequent jitted
    calls run tensor-parallel under GSPMD.  Also forces the XLA conv path
    (see module docstring).  Only shards channel dims divisible by the axis
    size (others stay replicated).
    """
    from ..config import set_force_xla_conv

    axis_size = mesh.shape[model_axis]
    state = nnx.state(net, nnx.Param)
    flat = nnx.to_flat_state(state)
    new_items = []
    for path, leaf in flat:
        value = leaf.get_value() if hasattr(leaf, "get_value") else leaf
        spec = _param_spec(path, value, model_axis)
        # only shard when the sharded dim divides evenly
        ok = True
        for dim, name in enumerate(spec):
            if name is not None and value.shape[dim] % axis_size != 0:
                ok = False
        if not ok:
            spec = P()
        sharded = jax.device_put(value, NamedSharding(mesh, spec))
        leaf = leaf.replace(sharded) if hasattr(leaf, "replace") else sharded
        new_items.append((path, leaf))
    nnx.update(net, nnx.from_flat_state(new_items))
    set_force_xla_conv(True)
    return net
