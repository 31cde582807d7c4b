"""Sparse-matrix × dense-feature products (SPMM).

API parity with reference MinkowskiEngine/sparse_matrix_functions.py:32-213.
The reference routes these through cuSPARSE (src/spmm.cu:80-340); on TPU a
COO-weighted SPMM is a weighted segment-sum — which XLA turns into a fused
scatter-add — so no custom kernel is needed, and autodiff supplies the
transpose-SPMM backward the reference hand-writes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ops.functional import segment_count, segment_sum


def spmm(
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    vals: jnp.ndarray,
    size,  # (num_rows, num_cols)
    mat: jnp.ndarray,
    is_sorted: bool = False,
) -> jnp.ndarray:
    """out[r] = Σ_{(r,c,v)} v · mat[c] — COO × dense
    (reference: sparse_matrix_functions.py:32-77)."""
    rows = jnp.asarray(rows, jnp.int32)
    cols = jnp.asarray(cols, jnp.int32)
    vals = jnp.asarray(vals, mat.dtype)
    num_rows = int(size[0])
    safe_cols = jnp.where(cols >= 0, cols, mat.shape[0])
    gathered = (
        jnp.take(mat, safe_cols, axis=0, mode="fill", fill_value=0)
        * vals[:, None]
    )
    ids = jnp.where(rows >= 0, rows, -1)
    return segment_sum(gathered, ids, num_rows)


def spmm_average(
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    size,
    mat: jnp.ndarray,
    is_sorted: bool = False,
):
    """Row-averaged SPMM: out[r] = mean of mat[c] over entries of row r
    (reference: sparse_matrix_functions.py:80-121, coo_spmm_average).
    Returns (out, per-row entry counts)."""
    rows = jnp.asarray(rows, jnp.int32)
    cols = jnp.asarray(cols, jnp.int32)
    num_rows = int(size[0])
    safe_cols = jnp.where(cols >= 0, cols, mat.shape[0])
    gathered = jnp.take(mat, safe_cols, axis=0, mode="fill", fill_value=0)
    ids = jnp.where(rows >= 0, rows, -1)
    s = segment_sum(gathered, ids, num_rows)
    c = segment_count(ids, num_rows)
    return s / jnp.maximum(c, 1).astype(s.dtype)[:, None], c


class MinkowskiSPMMFunction:
    """Functional shim matching the reference autograd Function
    (sparse_matrix_functions.py:124-170)."""

    @staticmethod
    def apply(rows, cols, vals, size, mat):
        return spmm(rows, cols, vals, size, mat)


class MinkowskiSPMMAverageFunction:
    @staticmethod
    def apply(rows, cols, size, mat):
        return spmm_average(rows, cols, size, mat)[0]
