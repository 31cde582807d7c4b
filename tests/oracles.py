"""Independent numpy brute-force oracles for sparse ops.

These re-implement the *semantics* (out[u] = Σ_k W[k]·in[u+off_k]) directly
from the definition of generalized sparse convolution — deliberately naive,
dictionary-based, and separate from the library's vectorized implementation.
"""

import numpy as np


def cube_offsets(kernel_size, dilation, tensor_stride, d):
    """Reference HYPER_CUBE enumeration order (dim 0 fastest)."""
    ks = [kernel_size] * d if np.isscalar(kernel_size) else list(kernel_size)
    dil = [dilation] * d if np.isscalar(dilation) else list(dilation)
    ts = [tensor_stride] * d if np.isscalar(tensor_stride) else list(tensor_stride)
    offs = []
    volume = int(np.prod(ks))
    for k in range(volume):
        idx = k
        row = []
        for i in range(d):
            ki = idx % ks[i]
            idx //= ks[i]
            if ks[i] % 2 == 0:
                row.append(ki * dil[i] * ts[i])
            else:
                row.append((ki - ks[i] // 2) * dil[i] * ts[i])
        offs.append(row)
    return np.array(offs, np.int64)


def conv_oracle(in_coords, in_feats, out_coords, weights, offsets):
    """out[j] = Σ_k in_feats[row(out_coords[j] + offsets[k])] @ weights[k]."""
    table = {tuple(c): i for i, c in enumerate(np.asarray(in_coords))}
    out = np.zeros((len(out_coords), weights.shape[2]), np.float64)
    for j, u in enumerate(np.asarray(out_coords)):
        for k, off in enumerate(offsets):
            probe = (u[0],) + tuple(u[1:] + off)
            i = table.get(probe)
            if i is not None:
                out[j] += in_feats[i].astype(np.float64) @ weights[k].astype(
                    np.float64
                )
    return out


def conv_transpose_oracle(in_coords, in_feats, out_coords, weights, offsets):
    """out[j] += in[i] @ W[k] whenever out_coords[j] == in_coords[i] + off_k."""
    table = {tuple(c): j for j, c in enumerate(np.asarray(out_coords))}
    out = np.zeros((len(out_coords), weights.shape[2]), np.float64)
    for i, u in enumerate(np.asarray(in_coords)):
        for k, off in enumerate(offsets):
            probe = (u[0],) + tuple(u[1:] + off)
            j = table.get(probe)
            if j is not None:
                out[j] += in_feats[i].astype(np.float64) @ weights[k].astype(
                    np.float64
                )
    return out


def pool_oracle(in_coords, in_feats, out_coords, offsets, mode):
    table = {tuple(c): i for i, c in enumerate(np.asarray(in_coords))}
    ch = in_feats.shape[1]
    out = np.zeros((len(out_coords), ch), np.float64)
    for j, u in enumerate(np.asarray(out_coords)):
        vals = []
        for off in offsets:
            probe = (u[0],) + tuple(u[1:] + off)
            i = table.get(probe)
            if i is not None:
                vals.append(in_feats[i].astype(np.float64))
        if vals:
            vals = np.stack(vals)
            if mode == "sum":
                out[j] = vals.sum(0)
            elif mode == "avg":
                out[j] = vals.mean(0)
            elif mode == "max":
                out[j] = vals.max(0)
    return out
