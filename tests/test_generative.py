"""Generative models: completion net + VAE (generative transpose + pruning)."""

import numpy as np
import pytest

import jax.numpy as jnp
from flax import nnx

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.models import CompletionNet, VAE


def voxel_shape(n=60, res=32, batch=2, seed=0):
    rng = np.random.RandomState(seed)
    coords = np.unique(
        np.concatenate(
            [rng.randint(0, batch, (n, 1)), rng.randint(0, res, (n, 3))], axis=1
        ).astype(np.int32),
        axis=0,
    )
    feats = np.ones((len(coords), 1), np.float32)
    return coords, feats


SMALL = (4, 8, 8, 16, 16, 16, 16)


class TestCompletion:
    @pytest.mark.slow
    def test_forward_training(self):
        mgr = ME.CoordinateManager(D=3)
        coords, feats = voxel_shape(seed=1)
        partial = ME.SparseTensor(feats, coords, coordinate_manager=mgr)
        tgt_coords, _ = voxel_shape(seed=2)
        target_key, _ = mgr.insert_and_map(tgt_coords, 1)

        net = CompletionNet(
            resolution=32,
            enc_channels=SMALL,
            dec_channels=SMALL,
            rngs=nnx.Rngs(0),
        )
        out_cls, targets, final = net(partial, target_key)
        assert len(out_cls) == len(targets) == net.levels
        for cls, tgt in zip(out_cls, targets):
            assert cls.shape[1] == 1
            assert tgt.shape[0] == cls.shape[0]
        # generative decoder must actually expand coordinates somewhere
        assert final.size > 0

    @pytest.mark.slow
    def test_eval_prunes_hard(self):
        mgr = ME.CoordinateManager(D=3)
        coords, feats = voxel_shape(seed=3)
        partial = ME.SparseTensor(feats, coords, coordinate_manager=mgr)
        target_key, _ = mgr.insert_and_map(coords, 1)
        net = CompletionNet(
            resolution=32, enc_channels=SMALL, dec_channels=SMALL,
            rngs=nnx.Rngs(1),
        ).eval()
        out_cls, targets, final = net(partial, target_key)
        assert final.size >= 0  # runs end-to-end without target injection


class TestVAE:
    @pytest.mark.slow
    def test_forward(self):
        mgr = ME.CoordinateManager(D=3)
        coords, feats = voxel_shape(n=80, res=64, seed=4)
        sinput = ME.SparseTensor(feats, coords, coordinate_manager=mgr)
        target_key, _ = mgr.insert_and_map(coords, 1)
        net = VAE(channels=(4, 8, 8, 16), in_nchannel=1, resolution=64,
                  rngs=nnx.Rngs(0))
        out_cls, targets, sout, mean, log_var = net(sinput, target_key)
        assert mean.shape == log_var.shape
        assert mean.size == len(np.unique(coords[:, 0]))
        assert len(out_cls) == len(targets) == 3
        assert np.isfinite(np.asarray(mean.F)).all()
