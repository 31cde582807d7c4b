"""Coordinate mapping helper (reference: MinkowskiEngine/utils/coords.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_coords_map(x, y):
    """Row correspondence between two sparse tensors sharing a manager.

    Returns (x_indices, y_indices) such that
    ``x.C[x_indices] // stride_ratio == y.C[y_indices]`` voxel-wise —
    the stride map between x's and y's coordinate maps
    (reference: utils/coords.py:29-63).
    """
    if x.coordinate_manager is not y.coordinate_manager:
        raise ValueError("x and y must share a coordinate manager")
    in_to_out = x.coordinate_manager.stride_map(
        x.coordinate_map_key, y.coordinate_map_key
    )
    io = np.asarray(in_to_out)[: x.size]
    valid = io >= 0
    x_idx = np.nonzero(valid)[0]
    return jnp.asarray(x_idx, jnp.int64), jnp.asarray(io[valid], jnp.int64)
