"""Module base utilities for the Minkowski nn layer (flax.nnx backed).

The reference builds on torch.nn.Module; here modules are `flax.nnx.Module`s
— the pythonic, stateful JAX module system — so user code keeps the familiar
``layer = MinkowskiConvolution(...); out = layer(x)`` shape while remaining
jit/grad/shard_map-compatible through `nnx.jit` / `nnx.split`.

``rngs`` is optional everywhere: when omitted, parameters draw from a
process-global seed sequence (convenient, reference-like UX); pass an
explicit ``nnx.Rngs`` for reproducibility.
"""

from __future__ import annotations

import itertools
from typing import Optional

from flax import nnx

_seed_counter = itertools.count(0x5EED)


def resolve_rngs(rngs: Optional[nnx.Rngs]) -> nnx.Rngs:
    if rngs is None:
        return nnx.Rngs(next(_seed_counter))
    return rngs


class MinkowskiModuleBase(nnx.Module):
    pass


def get_postfix(tensor) -> str:
    return ""
