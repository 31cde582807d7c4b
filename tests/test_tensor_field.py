"""TensorField: voxelize, slice, splat, interpolation round trips."""

import numpy as np

import minkowskiengine_tpu as ME


def rand_field(n=50, d=2, ch=3, batch=2, scale=4.0, seed=0):
    rng = np.random.RandomState(seed)
    b = rng.randint(0, batch, (n, 1)).astype(np.float32)
    xyz = (rng.rand(n, d) * scale).astype(np.float32)
    coords = np.concatenate([b, xyz], axis=1)
    feats = rng.randn(n, ch).astype(np.float32)
    return coords, feats


class TestTensorField:
    def test_sparse_average(self):
        coords, feats = rand_field(seed=1)
        tf = ME.TensorField(feats, coords)
        x = tf.sparse()
        vox = np.floor(coords[:, 1:]).astype(np.int32)
        keys = np.concatenate([coords[:, :1].astype(np.int32), vox], axis=1)
        uniq = np.unique(keys, axis=0)
        assert x.size == len(uniq)
        np.testing.assert_array_equal(np.asarray(x.C), uniq)
        # averaged features per voxel
        for i, u in enumerate(uniq):
            sel = (keys == u).all(axis=1)
            np.testing.assert_allclose(
                np.asarray(x.F)[i], feats[sel].mean(0), rtol=1e-4, atol=1e-5
            )

    def test_slice_roundtrip(self):
        coords, feats = rand_field(seed=2)
        tf = ME.TensorField(feats, coords)
        x = tf.sparse()
        sliced = x.slice(tf)
        assert sliced.shape == (len(coords), 3)
        # each point receives its voxel's feature
        vox = np.floor(coords[:, 1:]).astype(np.int32)
        keys = np.concatenate([coords[:, :1].astype(np.int32), vox], axis=1)
        xc = np.asarray(x.C)
        table = {tuple(c): i for i, c in enumerate(xc)}
        for p in range(len(coords)):
            np.testing.assert_allclose(
                np.asarray(sliced.F)[p],
                np.asarray(x.F)[table[tuple(keys[p])]],
                rtol=1e-5,
            )

    def test_cat_slice(self):
        coords, feats = rand_field(seed=3)
        tf = ME.TensorField(feats, coords)
        x = tf.sparse()
        cs = x.cat_slice(tf)
        assert cs.shape == (len(coords), 6)

    def test_splat_conserves_mass(self):
        coords, feats = rand_field(n=30, seed=4)
        tf = ME.TensorField(feats, coords)
        s = tf.splat()
        # multilinear weights sum to 1 per point when all corners exist
        np.testing.assert_allclose(
            np.asarray(s.F).sum(0), feats.sum(0), rtol=1e-4, atol=1e-4
        )

    def test_features_at_coordinates(self):
        coords = np.array(
            [[0, 0, 0], [0, 1, 0], [0, 0, 1], [0, 1, 1]], np.int32
        )
        feats = np.array([[1.0], [2.0], [3.0], [4.0]], np.float32)
        x = ME.SparseTensor(feats, coords)
        out = x.features_at_coordinates(
            np.array([[0, 0.5, 0.5], [0, 0.0, 0.0]], np.float32)
        )
        np.testing.assert_allclose(np.asarray(out).ravel(), [2.5, 1.0], rtol=1e-5)
