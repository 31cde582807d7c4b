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


def set_force_xla_conv(value: bool) -> None:
    """Force the XLA (gather-einsum) sparse-conv path instead of the fused
    Pallas kernel.  Required for GSPMD-partitioned (tensor-parallel)
    execution: XLA's SPMD partitioner can shard einsums across the mesh but
    cannot split a hand-written Pallas kernel's channel dimension."""
    global _force_xla_conv
    _force_xla_conv = bool(value)


def force_xla_conv() -> bool:
    return _force_xla_conv
