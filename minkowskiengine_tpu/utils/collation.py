"""Batch collation utilities (reference: MinkowskiEngine/utils/collation.py)."""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np


def batched_coordinates(coords: Sequence, dtype=np.int32, device=None) -> np.ndarray:
    """Concatenate per-sample D-dim coordinates into one (N, D+1) batch-first
    matrix (reference: utils/collation.py:30-95)."""
    if not isinstance(coords, (list, tuple)):
        raise TypeError("The coordinates must be a list or tuple of arrays")
    D = {np.asarray(cs).shape[1] for cs in coords}
    if len(D) != 1:
        raise ValueError(f"Dimension of the array mismatch. All dimensions: {D}")
    D = D.pop()

    N = int(np.sum([len(cs) for cs in coords]))
    bcoords = np.zeros((N, D + 1), dtype=dtype)
    s = 0
    for b, cs in enumerate(coords):
        cs = np.asarray(cs)
        cn = len(cs)
        bcoords[s : s + cn, 0] = b
        bcoords[s : s + cn, 1:] = np.floor(cs).astype(dtype)
        s += cn
    return bcoords


def sparse_collate(coords, feats, labels=None, dtype=np.int32, device=None):
    """Collate (coords, feats[, labels]) sample lists into batch arrays
    (reference: utils/collation.py:96-190)."""
    use_label = labels is not None
    coords_batch, feats_batch, labels_batch = [], [], []

    batch_id = 0
    for sample in zip(coords, feats, labels) if use_label else zip(coords, feats):
        if use_label:
            coord, feat, label = sample
        else:
            coord, feat = sample
        coord = np.asarray(coord)
        feat = np.asarray(feat)
        if coord.shape[0] != feat.shape[0]:
            raise ValueError("Coordinate and feature row mismatch")
        bcoord = np.concatenate(
            [
                np.full((coord.shape[0], 1), batch_id, dtype=dtype),
                np.floor(coord).astype(dtype),
            ],
            axis=1,
        )
        coords_batch.append(bcoord)
        feats_batch.append(feat)
        if use_label:
            labels_batch.append(np.asarray(label))
        batch_id += 1

    coords_batch = np.concatenate(coords_batch, axis=0)
    feats_batch = np.concatenate(feats_batch, axis=0)
    if use_label:
        labels_batch = np.concatenate(labels_batch, axis=0)
        return coords_batch, feats_batch, labels_batch
    return coords_batch, feats_batch


def batch_sparse_collate(data, dtype=np.int32, device=None):
    """DataLoader collate_fn form: list of (coords, feats[, labels]) tuples
    (reference: utils/collation.py:191-228)."""
    return sparse_collate(*list(zip(*data)), dtype=dtype, device=device)


class SparseCollation:
    """Collation functor with a point-count limit
    (reference: utils/collation.py:229-263)."""

    def __init__(self, limit_numpoints: int = -1, dtype=np.int32, device=None):
        self.limit_numpoints = limit_numpoints
        self.dtype = dtype
        self.device = device

    def __call__(self, list_data):
        coords, feats, labels = list(zip(*list_data))
        coords_batch, feats_batch, labels_batch = [], [], []

        batch_num_points = 0
        for batch_id, _ in enumerate(coords):
            num_points = coords[batch_id].shape[0]
            batch_num_points += num_points
            if 0 < self.limit_numpoints < batch_num_points:
                num_full_points = sum(len(c) for c in coords)
                num_full_batch_size = len(coords)
                print(
                    f"\tCannot fit {num_full_points} points into "
                    f"{self.limit_numpoints} points limit. Truncating batch "
                    f"size at {batch_id} out of {num_full_batch_size} with "
                    f"{batch_num_points - num_points}."
                )
                break
            coords_batch.append(coords[batch_id])
            feats_batch.append(feats[batch_id])
            labels_batch.append(labels[batch_id])

        return sparse_collate(
            coords_batch, feats_batch, labels_batch, dtype=self.dtype
        )
