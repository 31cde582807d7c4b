"""Generative VAE over sparse voxel grids.

Re-designs reference examples/vae.py:215-600 — encoder pools a shape into a
global latent; the decoder grows a sparse voxel grid from a single seed voxel
with generative transposed convolutions + per-level pruning classifiers.
Channel schedules are parameterized (reference defaults are the full-size
16..1024 pyramid).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..coords.manager import CoordinateMapKey
from ..nn.conv import (
    MinkowskiConvolution,
    MinkowskiGenerativeConvolutionTranspose,
)
from ..nn.module import MinkowskiModuleBase, resolve_rngs
from ..nn.nonlinearity import MinkowskiELU
from ..nn.norm import MinkowskiBatchNorm
from ..nn.ops import MinkowskiLinear
from ..nn.pooling import MinkowskiGlobalPooling
from ..nn.pruning import MinkowskiPruning
from ..sparse_tensor import SparseTensor
from ..types import RegionType
from .resnet import _Seq


def _conv_block(cin, cout, stride, rngs):
    return _Seq(
        MinkowskiConvolution(cin, cout, kernel_size=3, stride=stride,
                             dimension=3, rngs=rngs),
        MinkowskiBatchNorm(cout),
        MinkowskiELU(),
        MinkowskiConvolution(cout, cout, kernel_size=3, dimension=3, rngs=rngs),
        MinkowskiBatchNorm(cout),
        MinkowskiELU(),
    )


class Encoder(MinkowskiModuleBase):
    """Strided conv pyramid → global pooled (mean, log_var)
    (reference: examples/vae.py:215-318)."""

    def __init__(self, channels=(16, 32, 64, 128, 256, 512, 1024),
                 in_nchannel=1, rngs=None):
        rngs = resolve_rngs(rngs)
        ch = list(channels)
        blocks = [_conv_block(in_nchannel, ch[0], 2, rngs)]
        for i in range(len(ch) - 1):
            blocks.append(_conv_block(ch[i], ch[i + 1], 2, rngs))
        self.blocks = nnx.List(blocks)
        self.global_pool = MinkowskiGlobalPooling()
        self.linear_mean = MinkowskiLinear(ch[-1], ch[-1], bias=True, rngs=rngs)
        self.linear_log_var = MinkowskiLinear(ch[-1], ch[-1], bias=True, rngs=rngs)

    def __call__(self, sinput: SparseTensor):
        out = sinput
        for blk in self.blocks:
            out = blk(out)
        out = self.global_pool(out)
        return self.linear_mean(out), self.linear_log_var(out)


class Decoder(MinkowskiModuleBase):
    """Seed-voxel → generative upsampling with per-level pruning
    (reference: examples/vae.py:318-460)."""

    def __init__(self, channels=(1024, 512, 256, 128, 64, 32, 16),
                 resolution=128, rngs=None):
        rngs = resolve_rngs(rngs)
        ch = list(channels)
        self.resolution = resolution
        self.levels = len(ch) - 1

        def up_block(cin, cout):
            return _Seq(
                MinkowskiGenerativeConvolutionTranspose(
                    cin, cout, kernel_size=2, stride=2, dimension=3, rngs=rngs
                ),
                MinkowskiBatchNorm(cout),
                MinkowskiELU(),
                MinkowskiConvolution(cout, cout, kernel_size=3, dimension=3,
                                     rngs=rngs),
                MinkowskiBatchNorm(cout),
                MinkowskiELU(),
            )

        self.blocks = nnx.List(
            [up_block(ch[i], ch[i + 1]) for i in range(self.levels)]
        )
        self.cls_heads = nnx.List(
            [
                MinkowskiConvolution(ch[i + 1], 1, kernel_size=1, bias=True,
                                     dimension=3, rngs=rngs)
                for i in range(self.levels)
            ]
        )
        self.pruning = MinkowskiPruning()
        self.training = True

    def train(self, mode=True):
        self.training = bool(mode)
        return self

    def eval(self):
        return self.train(False)

    def get_target(self, out, target_key):
        cm = out.coordinate_manager
        strided_target_key = cm.stride(target_key, out.tensor_stride)
        kernel_map = cm.kernel_map(
            out.coordinate_map_key,
            strided_target_key,
            kernel_size=1,
            stride=1,
            region_type=RegionType.HYPER_CROSS,
        )
        return jnp.any(kernel_map.out_idx_t >= 0, axis=0)[: out.size]

    def __call__(self, z_glob: SparseTensor, target_key: CoordinateMapKey):
        """z_glob: per-batch latent rows on the origin map at the coarsest
        tensor stride (seed voxels)."""
        out_cls, targets = [], []
        dec = z_glob
        for i in range(self.levels):
            dec = self.blocks[i](dec)
            cls = self.cls_heads[i](dec)
            keep = cls.F[:, 0] > 0
            target = self.get_target(dec, target_key)
            targets.append(target)
            out_cls.append(cls)
            if self.training:
                keep = keep | target
            if bool(jnp.any(keep)):
                dec = self.pruning(dec, keep)
        return out_cls, targets, dec


class VAE(MinkowskiModuleBase):
    """Full VAE (reference: examples/vae.py:560-600)."""

    def __init__(self, channels=(16, 32, 64, 128, 256, 512, 1024),
                 in_nchannel=1, resolution=128, rngs=None):
        rngs = resolve_rngs(rngs)
        self.encoder = Encoder(channels, in_nchannel, rngs=rngs)
        self.decoder = Decoder(tuple(reversed(channels)), resolution, rngs=rngs)
        self._rngs = rngs

    def __call__(self, sinput: SparseTensor, gt_target: CoordinateMapKey,
                 rng_key=None):
        mean, log_var = self.encoder(sinput)
        if rng_key is None:
            rng_key = jax.random.PRNGKey(0)
        eps = jax.random.normal(rng_key, mean.padded_features.shape,
                                mean.padded_features.dtype)
        z_feats = mean.padded_features + eps * jnp.exp(
            0.5 * log_var.padded_features
        )
        # seed the decoder: latent rows live on per-batch seed voxels at the
        # coarsest stride — reuse the pooled origin map's coordinates scaled
        # to the decoder's input stride
        manager = sinput.coordinate_manager
        batch_coords = np.asarray(mean.C)
        stride0 = self.decoder_resolution_stride(sinput)
        seed_coords = batch_coords.copy()
        seed_key, _ = manager.insert_and_map(seed_coords, stride0)
        z = SparseTensor(
            z_feats[: mean.size],
            coordinate_map_key=seed_key,
            coordinate_manager=manager,
        )
        out_cls, targets, sout = self.decoder(z, gt_target)
        return out_cls, targets, sout, mean, log_var

    def decoder_resolution_stride(self, sinput):
        s = list(sinput.tensor_stride)
        return tuple(x * (2 ** len(self.encoder.blocks)) for x in s)
