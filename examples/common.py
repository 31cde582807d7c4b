"""Shared example utilities: synthetic data generators.

Mirrors the role of reference examples/common.py (data_loader with an
ASCII-art point pattern, PLY loading).  Network access is unavailable here,
so real point clouds are replaced by deterministic synthetic scenes.
"""

from __future__ import annotations

import numpy as np


def data_loader(nchannel=3, max_label=5, is_classification=True, seed=0,
                batch_size=4, dimension=2):
    """Tiny deterministic batch, reference-style
    (tests/python/common.py:57-70)."""
    rng = np.random.RandomState(seed)
    coords_list, feats_list, labels = [], [], []
    for b in range(batch_size):
        n = rng.randint(20, 40)
        coords = rng.randint(-10, 10, (n, dimension))
        feats = rng.randn(n, nchannel).astype(np.float32)
        coords_list.append(coords)
        feats_list.append(feats.astype(np.float32))
        labels.append(rng.randint(0, max_label))
    from minkowskiengine_tpu.utils import sparse_collate

    coords, feats = sparse_collate(coords_list, feats_list)
    if is_classification:
        label = np.array(labels, np.int32)
    else:
        label = rng.randint(0, max_label, len(coords)).astype(np.int32)
    return coords, feats, label


def random_scene(n_points=10000, room=(100, 100, 50), batch_size=1, seed=0):
    """ScanNet-like voxelized room(s): unique int voxels + rgb-ish features."""
    rng = np.random.RandomState(seed)
    coords = np.unique(
        np.concatenate(
            [
                rng.randint(0, batch_size, (n_points * 2, 1)),
                rng.randint(0, room[0], (n_points * 2, 1)),
                rng.randint(0, room[1], (n_points * 2, 1)),
                rng.randint(0, room[2], (n_points * 2, 1)),
            ],
            axis=1,
        ).astype(np.int32),
        axis=0,
    )[:n_points]
    feats = rng.rand(len(coords), 3).astype(np.float32)
    labels = rng.randint(0, 20, len(coords)).astype(np.int32)
    return coords, feats, labels


def random_point_cloud(n_points=2048, batch_size=4, scale=20.0, seed=0):
    """Continuous-coordinate point clouds for TensorField pipelines."""
    rng = np.random.RandomState(seed)
    coords = np.concatenate(
        [
            rng.randint(0, batch_size, (n_points, 1)).astype(np.float32),
            (rng.rand(n_points, 3) * scale).astype(np.float32),
        ],
        axis=1,
    )
    feats = rng.randn(n_points, 3).astype(np.float32)
    labels = rng.randint(0, 40, batch_size).astype(np.int32)
    return coords, feats, labels
