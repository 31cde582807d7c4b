"""Model summary utility (reference: MinkowskiEngine/utils/summary.py)."""

from __future__ import annotations

import numpy as np
from flax import nnx


def summary(model, depth: int = 2) -> str:
    """Print a parameter summary of an nnx model tree."""
    lines = []
    total = 0
    state = nnx.state(model, nnx.Param)
    flat = nnx.to_flat_state(state) if hasattr(nnx, "to_flat_state") else state.flat_state()
    for path, leaf in flat:
        value = leaf.value if hasattr(leaf, "value") else leaf
        n = int(np.prod(value.shape)) if hasattr(value, "shape") else 1
        total += n
        name = "/".join(str(p) for p in path)
        lines.append(f"{name:60s} {str(getattr(value, 'shape', ())):20s} {n:>12,}")
    lines.append("-" * 94)
    lines.append(f"{'total parameters':60s} {'':20s} {total:>12,}")
    out = "\n".join(lines)
    print(out)
    return out
