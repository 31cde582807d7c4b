"""Host-side quantization utilities (data-loader path).

Re-designs reference MinkowskiEngine/utils/quantization.py:32-363.  These run
on the host (numpy) inside data loaders — quantizing raw float point clouds
to voxel coordinates before device transfer — so they are implemented with
numpy (optionally accelerated by the native C++ extension, see
minkowskiengine_tpu/cpp) rather than JAX.
"""

from __future__ import annotations

from collections import namedtuple
from typing import Optional, Sequence, Union

import numpy as np


def fnv_hash_vec(arr: np.ndarray) -> np.ndarray:
    """FNV64-1A hash over coordinate rows (reference:
    utils/quantization.py:32-46)."""
    assert arr.ndim == 2
    arr = arr.copy().astype(np.uint64)
    hashed = np.uint64(14695981039346656037) * np.ones(
        arr.shape[0], dtype=np.uint64
    )
    for j in range(arr.shape[1]):
        hashed *= np.uint64(1099511628211)
        hashed = np.bitwise_xor(hashed, arr[:, j])
    return hashed


def ravel_hash_vec(arr: np.ndarray) -> np.ndarray:
    """Ravel (row-major flatten) hash; collision-free within the bounding box
    (reference: utils/quantization.py:49-65)."""
    assert arr.ndim == 2
    arr = arr.copy()
    arr -= arr.min(0)
    arr = arr.astype(np.uint64, copy=False)
    arr_max = arr.max(0).astype(np.uint64) + 1

    keys = np.zeros(arr.shape[0], dtype=np.uint64)
    for j in range(arr.shape[1] - 1):
        keys += arr[:, j]
        keys *= arr_max[j + 1]
    keys += arr[:, -1]
    return keys


def quantize(coords: np.ndarray):
    """(unique_map, inverse_map) over integer coordinate rows.

    Matches the reference contract (src/quantization.cpp:57-139):
    ``coords[unique_map][inverse_map] == coords``; unique rows are in
    first-occurrence order.  Uses the native C++ host engine when available
    (open-addressing hash, minkowskiengine_tpu/cpp), numpy otherwise.
    """
    coords = np.ascontiguousarray(coords)
    if coords.dtype == np.int32 or np.can_cast(coords.dtype, np.int32):
        from .. import cpp as hostengine

        native = hostengine.quantize_i32(coords.astype(np.int32, copy=False))
        if native is not None:
            return native
    _, unique_map, inverse_map = np.unique(
        coords, axis=0, return_index=True, return_inverse=True
    )
    # np.unique sorts; restore first-occurrence order like the reference.
    order = np.argsort(unique_map)
    unique_map = unique_map[order]
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    inverse_map = rank[inverse_map.reshape(-1)]
    return unique_map.astype(np.int64), inverse_map.astype(np.int64)


def quantize_label(coords: np.ndarray, labels: np.ndarray, ignore_label: int):
    """(unique_map, inverse_map, quantized labels): coordinates appearing with
    conflicting labels get ``ignore_label``
    (reference: src/quantization.cpp:141-260)."""
    coords = np.ascontiguousarray(coords)
    if coords.dtype == np.int32 or np.can_cast(coords.dtype, np.int32):
        from .. import cpp as hostengine

        native = hostengine.quantize_label_i32(
            coords.astype(np.int32, copy=False), labels, ignore_label
        )
        if native is not None:
            return native
    unique_map, inverse_map = quantize(coords)
    labels = np.asarray(labels)
    out_labels = labels[unique_map].copy()
    # detect collisions: any row whose label differs from its unique rep
    conflict = np.zeros(len(unique_map), dtype=bool)
    np.logical_or.at(conflict, inverse_map, labels != out_labels[inverse_map])
    out_labels[conflict] = ignore_label
    return unique_map, inverse_map, out_labels


QuantizationReturnType = namedtuple(
    "QuantizationReturnType", ["coordinates", "features", "labels"]
)


def sparse_quantize(
    coordinates,
    features=None,
    labels=None,
    ignore_label: int = -100,
    return_index: bool = False,
    return_inverse: bool = False,
    return_maps_only: bool = False,
    quantization_size=None,
    device: str = "cpu",
):
    """Voxelize a point cloud (reference: utils/quantization.py:136-340).

    Returns quantized coordinates (+features/labels reduced to unique rows),
    optionally the unique/inverse maps.
    """
    if return_inverse and not return_index:
        raise ValueError("return_index must be True when return_inverse is True")
    coordinates = np.asarray(coordinates)
    if coordinates.ndim != 2:
        raise ValueError("coordinates must be (N, D)")
    use_label = labels is not None
    use_feat = features is not None

    if quantization_size is not None:
        if isinstance(quantization_size, (Sequence, np.ndarray)):
            quantization_size = np.asarray(quantization_size, np.float64)
        else:
            quantization_size = np.full(
                coordinates.shape[1], float(quantization_size)
            )
        if np.any(quantization_size <= 0):
            raise ValueError("quantization_size must be positive")
        discrete = np.floor(coordinates / quantization_size)
    else:
        discrete = np.floor(coordinates)
    discrete = discrete.astype(np.int32)

    if use_label:
        unique_map, inverse_map, labels = quantize_label(
            discrete, np.asarray(labels), ignore_label
        )
    else:
        unique_map, inverse_map = quantize(discrete)

    if return_maps_only:
        return (unique_map, inverse_map) if return_inverse else unique_map

    out = [discrete[unique_map]]
    if use_feat:
        out.append(np.asarray(features)[unique_map])
    if use_label:
        out.append(labels)
    if return_index:
        out.append(unique_map)
    if return_inverse:
        out.append(inverse_map)
    return out[0] if len(out) == 1 else tuple(out)
