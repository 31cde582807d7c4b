"""Global framework configuration.

``compute_dtype``: mixed-precision policy for the feature path.  When set to
``jnp.bfloat16``, convolution modules cast activations (and their weight
views) to bf16 — the TPU-idiomatic training precision: half the HBM/slab-DMA
bytes and full-rate MXU — while parameters stay float32 (master weights) and
normalization statistics are computed in float32.
"""

from __future__ import annotations

from typing import Optional

_compute_dtype = None
_force_xla_conv = False


def set_compute_dtype(dtype) -> None:
    """Set the activation compute dtype (None = follow input dtype)."""
    global _compute_dtype
    _compute_dtype = dtype


def compute_dtype():
    return _compute_dtype


_spatial_ctx = None


def set_spatial_execution(mesh, axis_name: str = "space") -> None:
    """Route every sparse convolution through the halo-exchange spatial
    path (parallel/spatial.py): features row-sharded P(axis_name, None)
    over ``mesh``, one ppermute halo per side, dW psum-reduced.  Pass
    ``mesh=None`` to clear.  Requires warm geometry (halos are measured
    per kernel map and cached); elementwise/norm ops auto-partition via
    GSPMD."""
    global _spatial_ctx
    _spatial_ctx = None if mesh is None else (mesh, axis_name)


def spatial_execution_ctx():
    return _spatial_ctx


class spatial_execution:
    """Context manager: ``with ME.spatial_execution(mesh): net(x)`` runs
    every conv spatially sharded (see set_spatial_execution)."""

    def __init__(self, mesh, axis_name: str = "space"):
        self.mesh = mesh
        self.axis_name = axis_name

    def __enter__(self):
        set_spatial_execution(self.mesh, self.axis_name)
        return self

    def __exit__(self, *exc):
        set_spatial_execution(None)
        return False


def set_force_xla_conv(value: bool) -> None:
    """Force the XLA (gather-einsum) sparse-conv path instead of the fused
    Pallas kernel.  Required for GSPMD-partitioned (tensor-parallel)
    execution: XLA's SPMD partitioner can shard einsums across the mesh but
    cannot split a hand-written Pallas kernel's channel dimension."""
    global _force_xla_conv
    _force_xla_conv = bool(value)


def force_xla_conv() -> bool:
    return _force_xla_conv
