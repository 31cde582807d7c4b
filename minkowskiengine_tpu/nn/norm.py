"""Normalization modules: BatchNorm, SyncBatchNorm, InstanceNorm.

Re-designs reference MinkowskiEngine/MinkowskiNormalization.py:51-399.

BatchNorm is implemented natively (rather than wrapping a dense-batch BN like
the reference wraps torch.nn.BatchNorm1d) because statistics must be masked:
feature buffers are padded to the coordinate map capacity and padding rows
must not contribute.  SyncBatchNorm is BatchNorm whose (sum, sq_sum, count)
are `lax.psum`-reduced across a named mesh axis — the TPU-native replacement
for torch.nn.SyncBatchNorm's NCCL allreduce (MinkowskiNormalization.py:101).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..ops import functional as F
from ..sparse_tensor import SparseTensor
from .module import MinkowskiModuleBase


class MinkowskiBatchNorm(MinkowskiModuleBase):
    """Batch norm over the feature rows of a sparse tensor.

    torch-compatible semantics: ``running = (1 - momentum) * running +
    momentum * batch_stat``; biased variance for normalization, unbiased for
    the running estimate.
    """

    def __init__(
        self,
        num_features: int,
        eps: float = 1e-5,
        momentum: float = 0.1,
        affine: bool = True,
        track_running_stats: bool = True,
        axis_name: Optional[str] = None,
    ):
        self.num_features = int(num_features)
        self.eps = float(eps)
        self.momentum = float(momentum)
        self.affine = bool(affine)
        self.track_running_stats = bool(track_running_stats)
        self.axis_name = axis_name
        if affine:
            self.weight = nnx.Param(jnp.ones((1, num_features), jnp.float32))
            self.bias = nnx.Param(jnp.zeros((1, num_features), jnp.float32))
        else:
            self.weight = None
            self.bias = None
        if track_running_stats:
            self.running_mean = nnx.BatchStat(
                jnp.zeros((num_features,), jnp.float32)
            )
            self.running_var = nnx.BatchStat(jnp.ones((num_features,), jnp.float32))
        self.training = True

    def train(self, mode: bool = True):
        self.training = bool(mode)
        return self

    def eval(self):
        return self.train(False)

    def _stats(self, feats: jnp.ndarray, mask: jnp.ndarray):
        m = mask[:, None].astype(feats.dtype)
        count = jnp.sum(m)
        s = jnp.sum(feats * m, axis=0)
        sq = jnp.sum(feats * feats * m, axis=0)
        if self.axis_name is not None:
            try:
                count = jax.lax.psum(count, self.axis_name)
                s = jax.lax.psum(s, self.axis_name)
                sq = jax.lax.psum(sq, self.axis_name)
            except NameError:
                # Not inside shard_map/pmap binding this axis: behave like
                # plain BN (e.g. eager eval of a converted model).
                pass
        count = jnp.maximum(count, 1.0)
        mean = s / count
        var = jnp.maximum(sq / count - mean * mean, 0.0)
        return mean, var, count

    def _apply(self, feats: jnp.ndarray, n_valid) -> jnp.ndarray:
        in_dtype = feats.dtype
        feats = feats.astype(jnp.float32)  # f32 statistics under bf16 compute
        mask = jnp.arange(feats.shape[0]) < n_valid
        if self.training or not self.track_running_stats:
            mean, var, count = self._stats(feats, mask)
            if self.track_running_stats:
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                self.running_mean[...] = (
                    1 - self.momentum
                ) * self.running_mean[...] + self.momentum * mean
                self.running_var[...] = (
                    1 - self.momentum
                ) * self.running_var[...] + self.momentum * unbiased
        else:
            mean = self.running_mean[...]
            var = self.running_var[...]
        out = (feats - mean[None, :]) * jax.lax.rsqrt(var[None, :] + self.eps)
        if self.affine:
            out = out * self.weight[...] + self.bias[...]
        return jnp.where(mask[:, None], out, 0.0).astype(in_dtype)

    def __call__(self, input):
        out = self._apply(input.padded_features, input.size_array)
        return input._wrap(out)

    def __repr__(self):
        return (
            f"{self.__class__.__name__}({self.num_features}, eps={self.eps}, "
            f"momentum={self.momentum}, affine={self.affine}, "
            f"track_running_stats={self.track_running_stats})"
        )


class MinkowskiSyncBatchNorm(MinkowskiBatchNorm):
    """Cross-replica batch norm (reference: MinkowskiNormalization.py:101-191).

    Pass the data-parallel mesh axis name (e.g. ``"data"``); statistics are
    psum-reduced across it.  Outside a mapped context, behaves like plain BN.
    """

    def __init__(
        self,
        num_features,
        eps=1e-5,
        momentum=0.1,
        affine=True,
        track_running_stats=True,
        process_group: Optional[str] = None,
        axis_name: Optional[str] = "data",
    ):
        super().__init__(
            num_features,
            eps,
            momentum,
            affine,
            track_running_stats,
            axis_name=process_group if process_group is not None else axis_name,
        )

    @classmethod
    def convert_sync_batchnorm(cls, module, process_group=None):
        """Recursively convert MinkowskiBatchNorm children to sync BN
        (reference: MinkowskiNormalization.py:139-191)."""
        if isinstance(module, MinkowskiBatchNorm) and not isinstance(
            module, MinkowskiSyncBatchNorm
        ):
            out = cls(
                module.num_features,
                module.eps,
                module.momentum,
                module.affine,
                module.track_running_stats,
                process_group=process_group,
            )
            if module.affine:
                out.weight = module.weight
                out.bias = module.bias
            if module.track_running_stats:
                out.running_mean = module.running_mean
                out.running_var = module.running_var
            return out
        if isinstance(module, (nnx.List, list)):
            for i in range(len(module)):
                module[i] = cls.convert_sync_batchnorm(module[i], process_group)
            return module
        for name, child in list(vars(module).items()):
            if isinstance(child, (MinkowskiModuleBase, nnx.Module, nnx.List, list)):
                setattr(
                    module, name, cls.convert_sync_batchnorm(child, process_group)
                )
        return module


class MinkowskiInstanceNormFunction:
    """Functional shim mirroring the reference autograd Function
    (MinkowskiNormalization.py:194-310).  The reference composes global
    pooling + broadcast with a hand-derived backward; here the same
    composition is expressed in pure JAX ops and autodiff covers it.
    """

    @staticmethod
    def apply(
        in_feat,
        in_coords_key,
        glob_coords_key=None,
        coords_manager=None,
        gpooling_mode=None,
    ):
        origin_key, origin_rows = coords_manager.origin_map(in_coords_key)
        if glob_coords_key is not None and not glob_coords_key.is_key_set():
            glob_coords_key.set_key(*origin_key.get_key())
        num = coords_manager.capacity(origin_key)
        mean = F.segment_mean(in_feat, origin_rows, num)
        centered = in_feat - F.take_rows(mean, origin_rows)
        var = F.segment_mean(centered * centered, origin_rows, num)
        inv_std = jax.lax.rsqrt(var + 1e-8)
        out = centered * F.take_rows(inv_std, origin_rows)
        return jnp.where((origin_rows >= 0)[:, None], out, 0.0)


class MinkowskiInstanceNorm(MinkowskiModuleBase):
    """Per-batch-item (per point cloud) normalization (reference:
    MinkowskiNormalization.py:361-399).  The reference hand-derives the
    backward through its pooling/broadcast composition
    (MinkowskiNormalization.py:194-310); autodiff covers it here.
    """

    def __init__(self, num_features: int):
        self.num_features = int(num_features)
        self.weight = nnx.Param(jnp.ones((1, num_features), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((1, num_features), jnp.float32))
        self.eps = 1e-6

    def __call__(self, input: SparseTensor) -> SparseTensor:
        origin_key, origin_rows = input.coordinate_manager.origin_map(
            input.coordinate_map_key
        )
        num = input.coordinate_manager.capacity(origin_key)
        feats = input.padded_features
        mean = F.segment_mean(feats, origin_rows, num)
        centered = feats - F.take_rows(mean, origin_rows)
        var = F.segment_mean(centered * centered, origin_rows, num)
        inv_std = jax.lax.rsqrt(var + self.eps)
        out = centered * F.take_rows(inv_std, origin_rows)
        out = out * self.weight[...] + self.bias[...]
        out = jnp.where((origin_rows >= 0)[:, None], out, 0.0)
        return input._wrap(out)

    def __repr__(self):
        return f"{self.__class__.__name__}(nchannels={self.num_features})"


class MinkowskiStableInstanceNorm(MinkowskiInstanceNorm):
    """Numerically-stabilized instance norm (reference:
    MinkowskiNormalization.py:313-360) — same centered-variance computation;
    our base implementation is already the stable form."""
