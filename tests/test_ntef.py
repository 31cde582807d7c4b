"""Dynamic tail-tile skipping (nt_eff) in the slab conv kernels.

Pow2 capacity buckets leave up to ~25% of output tiles all-padding; the
kernels read a live-tile count from the scalar-prefetch block and skip
dead tiles' DMAs and gather FLOPs at runtime (no static-shape change).
These tests run the REAL Mosaic kernels under the TPU interpreter and
check bit-equality against the no-skip path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from minkowskiengine_tpu.ops.pallas.conv_kernel import (
    build_slab_map_from_span,
    measure_spans,
    slab_ladder,
    slab_tile,
    sparse_conv_dw_pallas,
    sparse_conv_fwd_pallas,
    sub_ladder,
)


def _mk_map(cap, K, n, seed=0, span=40, density=0.5, ring=False):
    import dataclasses

    rng = np.random.RandomState(seed)
    base = np.arange(cap)[None, :].repeat(K, 0)
    idx = np.clip(base + rng.randint(-span, span, (K, cap)), 0, n - 1)
    mask = (rng.rand(K, cap) < density) & (np.arange(cap)[None, :] < n)
    in_idx = jnp.asarray(np.where(mask, idx, -1).astype(np.int32))
    tile = slab_tile(cap)
    sp = jax.device_get(
        measure_spans(in_idx, tile, cap, slab_ladder(tile), sub_ladder(tile))
    )
    sm = build_slab_map_from_span(
        in_idx, cap, int(sp[0]), union_extra=int(sp[1]),
        outlier_counts=sp[3:], total_pairs=int(sp[2]),
    )
    if ring:  # union disabled -> per-offset ring-DMA kernel variant
        sm = dataclasses.replace(sm, union_size=0)
    return sm


@pytest.mark.parametrize("ring", [False, True])  # union / ring kernel
@pytest.mark.parametrize(
    "n",
    [700]
    + [pytest.param(v, marks=pytest.mark.slow) for v in (1, 255, 256, 1024)],
)
def test_fwd_tail_skip_exact(ring, n):
    cap, K, Cin, Cout = 1024, 8, 3, 8
    sm = _mk_map(cap, K, n, ring=ring)
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(cap, Cin).astype(np.float32)).at[n:].set(0)
    w = jnp.asarray(rng.randn(K, Cin, Cout).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        full = sparse_conv_fwd_pallas(feats, w, sm)
        skip = sparse_conv_fwd_pallas(feats, w, sm, n_valid_out=jnp.int32(n))
    assert jnp.array_equal(full, skip)


@pytest.mark.parametrize("ring", [False, True])
def test_dw_tail_skip_exact(ring):
    cap, K, Cin, Cout, n = 1024, 8, 3, 8, 700
    sm = _mk_map(cap, K, n, ring=ring)
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(cap, Cin).astype(np.float32)).at[n:].set(0)
    # cotangent rows beyond n are deliberately GARBAGE: dead tiles gather
    # all-zeros, so the skipped contribution is exactly zero regardless
    g = jnp.asarray(rng.randn(cap, Cout).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        full = sparse_conv_dw_pallas(feats, g, sm, (K, Cin, Cout))
        skip = sparse_conv_dw_pallas(
            feats, g, sm, (K, Cin, Cout), n_valid_out=jnp.int32(n)
        )
    assert jnp.array_equal(full, skip)


@pytest.mark.parametrize("sub", [0, 64])
def test_wide_union_kernel_matches_standard(sub):
    """The wide-channel union variant (ME_WIDE_KERNEL): the gathers feed
    ONE (T, K*Cin)@(K*Cin, Cout) contraction which must equal the
    per-offset kernel (same gather dots; the long weight dot contracts
    the same products in a different association — exact at these
    magnitudes).  ``sub`` > 0 exercises the two-tier form, whose gathers
    stay per-(offset, sub-tile)."""
    from minkowskiengine_tpu.ops.pallas import conv_kernel as ck
    from minkowskiengine_tpu.ops.pallas.conv_kernel import (
        build_slab_map_floored,
    )

    cap, K, Cin, Cout, n = 1024, 8, 128, 128, 700
    rng0 = np.random.RandomState(0)
    base = np.arange(cap)[None, :].repeat(K, 0)
    idx = np.clip(base + rng0.randint(-40, 40, (K, cap)), 0, n - 1)
    mask = (rng0.rand(K, cap) < 0.5) & (np.arange(cap)[None, :] < n)
    in_idx = jnp.asarray(np.where(mask, idx, -1).astype(np.int32))
    sm = build_slab_map_floored(in_idx, cap, (128, 256, 4096, sub))
    assert sm.union_size > 0 and sm.sub_size == sub
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(cap, Cin).astype(np.float32)).at[n:].set(0)
    w = jnp.asarray(rng.randn(K, Cin, Cout).astype(np.float32)) * 0.1
    old = ck._WIDE_KERNEL_ENV
    try:
        with pltpu.force_tpu_interpret_mode():
            ck._WIDE_KERNEL_ENV = "0"
            std = sparse_conv_fwd_pallas(feats, w, sm, n_valid_out=jnp.int32(n))
            ck._WIDE_KERNEL_ENV = "1"
            assert ck._wide_eligible(sm, Cin, Cout, K)
            wide = sparse_conv_fwd_pallas(
                feats, w, sm, n_valid_out=jnp.int32(n)
            )
    finally:
        ck._WIDE_KERNEL_ENV = old
    np.testing.assert_allclose(
        np.asarray(std), np.asarray(wide), rtol=1e-6, atol=1e-5
    )
    assert float(jnp.abs(wide).sum()) > 0
