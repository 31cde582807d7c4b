"""Gradient checking shim (reference: MinkowskiEngine/utils/gradcheck.py).

The reference vendors a float64 torch.autograd.gradcheck; the JAX-native
equivalent is `jax.test_util.check_grads`, wrapped here with the same
call shape used throughout the reference tests.
"""

from __future__ import annotations

import jax


def gradcheck(func, inputs, atol: float = 1e-3, rtol: float = 1e-2, eps: float = 1e-4):
    """Numerically verify VJPs of ``func`` at ``inputs``.  Returns True or
    raises."""
    from jax.test_util import check_grads

    if not isinstance(inputs, (tuple, list)):
        inputs = (inputs,)
    check_grads(func, tuple(inputs), order=1, modes=("rev",), atol=atol, rtol=rtol, eps=eps)
    return True
