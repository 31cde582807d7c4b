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


def set_compute_dtype(dtype) -> None:
    """Set the activation compute dtype (None = follow input dtype)."""
    global _compute_dtype
    _compute_dtype = dtype


def compute_dtype():
    return _compute_dtype
