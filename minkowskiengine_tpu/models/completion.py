"""Generative shape-completion network.

Re-designs reference examples/completion.py:152-470 — the model that
exercises the generative machinery end-to-end: generative transposed
convolutions expand coordinates level by level, per-level classifiers decide
which voxels survive, and MinkowskiPruning removes the rest.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

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
from ..nn.pruning import MinkowskiPruning
from ..sparse_tensor import SparseTensor
from ..types import RegionType
from .resnet import _Seq


class CompletionNet(MinkowskiModuleBase):
    """Encoder-decoder completion net (reference: examples/completion.py:152).

    The default channel schedule is scaled down relative to the reference's
    (16..1024) so the demo runs comfortably on one chip; pass
    ``enc_channels``/``dec_channels`` for the full-size model.
    """

    def __init__(
        self,
        resolution: int = 128,
        in_nchannel: int = 1,
        enc_channels=(16, 32, 64, 128, 256, 512, 1024),
        dec_channels=(16, 32, 64, 128, 256, 512, 1024),
        rngs=None,
    ):
        rngs = resolve_rngs(rngs)
        self.resolution = resolution
        enc_ch, dec_ch = list(enc_channels), list(dec_channels)
        self.levels = len(enc_ch) - 1

        def enc_first(cin, cout):
            return _Seq(
                MinkowskiConvolution(cin, cout, kernel_size=3, stride=1,
                                     dimension=3, rngs=rngs),
                MinkowskiBatchNorm(cout),
                MinkowskiELU(),
            )

        def enc_block(cin, cout):
            return _Seq(
                MinkowskiConvolution(cin, cout, kernel_size=2, stride=2,
                                     dimension=3, rngs=rngs),
                MinkowskiBatchNorm(cout),
                MinkowskiELU(),
                MinkowskiConvolution(cout, cout, kernel_size=3, dimension=3,
                                     rngs=rngs),
                MinkowskiBatchNorm(cout),
                MinkowskiELU(),
            )

        def dec_block(cin, cout, kernel_size):
            return _Seq(
                MinkowskiGenerativeConvolutionTranspose(
                    cin, cout, kernel_size=kernel_size, stride=2, dimension=3,
                    rngs=rngs,
                ),
                MinkowskiBatchNorm(cout),
                MinkowskiELU(),
                MinkowskiConvolution(cout, cout, kernel_size=3, dimension=3,
                                     rngs=rngs),
                MinkowskiBatchNorm(cout),
                MinkowskiELU(),
            )

        self.enc_first = enc_first(in_nchannel, enc_ch[0])
        self.enc_blocks = nnx.List(
            [enc_block(enc_ch[i], enc_ch[i + 1]) for i in range(self.levels)]
        )
        # decoder runs coarsest→finest; block i maps enc_ch[L-i] → dec_ch[L-i-1]
        self.dec_blocks = nnx.List(
            [
                dec_block(
                    enc_ch[self.levels - i] if i == 0 else dec_ch[self.levels - i],
                    dec_ch[self.levels - i - 1],
                    kernel_size=4 if i == 0 else 2,
                )
                for i in range(self.levels)
            ]
        )
        self.cls_heads = nnx.List(
            [
                MinkowskiConvolution(
                    dec_ch[self.levels - i - 1], 1, kernel_size=1, bias=True,
                    dimension=3, rngs=rngs,
                )
                for i in range(self.levels)
            ]
        )
        self.pruning = MinkowskiPruning()
        self.training = True

    def train(self, mode: bool = True):
        self.training = bool(mode)
        return self

    def eval(self):
        return self.train(False)

    def get_target(self, out: SparseTensor, target_key: CoordinateMapKey):
        """Boolean mask of output rows whose voxel exists in the target
        (reference: examples/completion.py:357-372)."""
        cm = out.coordinate_manager
        strided_target_key = cm.stride(
            target_key, out.tensor_stride
        )
        kernel_map = cm.kernel_map(
            out.coordinate_map_key,
            strided_target_key,
            kernel_size=1,
            stride=1,
            region_type=RegionType.HYPER_CROSS,
        )
        # volume-1 map: out row o is a target iff it pairs with any target row
        hit = jnp.any(kernel_map.out_idx_t >= 0, axis=0)
        return hit[: out.size]

    def __call__(
        self, partial_in: SparseTensor, target_key: CoordinateMapKey
    ) -> Tuple[List[SparseTensor], List[jnp.ndarray], SparseTensor]:
        out_cls, targets = [], []

        enc = [self.enc_first(partial_in)]
        for blk in self.enc_blocks:
            enc.append(blk(enc[-1]))

        dec = enc[-1]
        for i in range(self.levels):
            dec = self.dec_blocks[i](dec)
            skip = enc[self.levels - i - 1]
            dec = dec + skip  # union-coordinate addition
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
