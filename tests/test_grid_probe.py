"""Grid-probe kernel-map construction: bit-equality with the sorted-key
paths across strides, kernels, dilations, transposes and negative coords.

The dense bbox row grid replaces the sorted join / binary search for
coordinate lookups and the sort-based scatter for the inverse matching
(coords/kernel_map.py).  Every variant must produce IDENTICAL index
matrices — these are correctness-critical (a wrong -1 silently zeroes a
contribution).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.coords.kernel_map import (
    _build_in_idx,
    _build_in_idx_grid,
    _invert_matching,
    build_stride_map,
)
from minkowskiengine_tpu.coords.manager import region_offsets_for
from minkowskiengine_tpu.types import RegionType


def rand_cloud(seed, n=600, lo=-40, hi=40, batches=3, D=3):
    rng = np.random.RandomState(seed)
    c = np.unique(
        np.concatenate(
            [rng.randint(0, batches, (n, 1)), rng.randint(lo, hi, (n, D))],
            axis=1,
        ).astype(np.int32),
        axis=0,
    )
    return c


def probe_of(mgr, key):
    pg = mgr._probe_grid_for(key)
    assert pg is not None, "grid probe unavailable for test map"
    return pg


CASES = [
    # (kernel_size, stride, dilation, region)
    (3, 1, 1, RegionType.HYPER_CUBE),
    (2, 2, 1, RegionType.HYPER_CUBE),
    (3, 2, 1, RegionType.HYPER_CUBE),
    (5, 1, 1, RegionType.HYPER_CUBE),
    (3, 1, 2, RegionType.HYPER_CUBE),
    (3, 1, 1, RegionType.HYPER_CROSS),
]


@pytest.fixture(params=["stack", "slices"])
def grid_build_mode(request):
    """Run grid-probe equality under BOTH build strategies (the sliced-
    window variant is env-selected in production; it must stay
    bit-identical to the shifted-stack baseline)."""
    import minkowskiengine_tpu.coords.kernel_map as KM

    old = KM._GRID_BUILD_MODE
    KM._GRID_BUILD_MODE = request.param
    try:
        yield request.param
    finally:
        KM._GRID_BUILD_MODE = old


class TestGridProbeEquality:
    @pytest.mark.parametrize("misaligned", [False, True])
    @pytest.mark.parametrize("ks,stride,dil,region", CASES)
    def test_in_idx_and_invert_match_sorted_paths(
        self, ks, stride, dil, region, misaligned, grid_build_mode
    ):
        if misaligned:
            # odd minima not multiples of any tested stride: strided output
            # coords floor BELOW the input bbox, exercising the padded-grid
            # boundary of the shifted-stack fast path (advisor r2 high)
            coords = rand_cloud(ks * 10 + stride, lo=-39, hi=41)
            coords = np.unique(
                np.concatenate(
                    [coords, np.array([[0, 1, 1, 1]], np.int32)], axis=0
                ),
                axis=0,
            )
        else:
            coords = rand_cloud(ks * 10 + stride)
        mgr = ME.CoordinateManager(D=3)
        in_key, _ = mgr.insert_and_map(coords)
        out_key = mgr.stride(in_key, stride)
        in_map = mgr.get_coordinate_map(in_key)
        out_map = mgr.get_coordinate_map(out_key)
        offs = region_offsets_for(
            region, (ks,) * 3, (dil,) * 3, in_map.tensor_stride, None
        )
        offs = np.concatenate(
            [np.zeros((offs.shape[0], 1), np.int32), offs], axis=1
        )

        ref = np.asarray(
            _build_in_idx(
                in_map.key_lanes, in_map.size_arr,
                out_map.coordinates, out_map.size_arr, jnp.asarray(offs),
            )
        )
        got = np.asarray(
            _build_in_idx_grid(
                probe_of(mgr, in_key), out_map.coordinates, out_map.size_arr,
                offs, base_stride=out_map.tensor_stride,
            )
        )
        np.testing.assert_array_equal(got, ref)

        # inverse matching: grid probe of the OUT map with negated offsets
        # must equal the scatter-based inversion of in_idx
        ref_t = np.asarray(_invert_matching(jnp.asarray(ref), in_map.capacity))
        got_t = np.asarray(
            _build_in_idx_grid(
                probe_of(mgr, out_key), in_map.coordinates, in_map.size_arr,
                -offs, base_stride=in_map.tensor_stride,
            )
        )
        np.testing.assert_array_equal(got_t, ref_t)

    def test_off_lattice_base_falls_back_correctly(self, grid_build_mode):
        """Probing a coarse map from a finer base (the transpose/invert
        regime) — the shifted-stack fast path must not engage, and the
        per-element path must agree with the sorted-key builder."""
        coords = rand_cloud(7)
        mgr = ME.CoordinateManager(D=3)
        in_key, _ = mgr.insert_and_map(coords)
        out_key = mgr.stride(in_key, 2)
        in_map = mgr.get_coordinate_map(in_key)
        out_map = mgr.get_coordinate_map(out_key)
        # offsets in FINE units probing the COARSE map
        offs = region_offsets_for(
            RegionType.HYPER_CUBE, (2,) * 3, (1,) * 3, (1, 1, 1), None
        )
        offs = np.concatenate(
            [np.zeros((offs.shape[0], 1), np.int32), offs], axis=1
        )
        ref = np.asarray(
            _build_in_idx(
                out_map.key_lanes, out_map.size_arr,
                in_map.coordinates, in_map.size_arr, jnp.asarray(offs),
            )
        )
        got = np.asarray(
            _build_in_idx_grid(
                probe_of(mgr, out_key), in_map.coordinates, in_map.size_arr,
                offs, base_stride=in_map.tensor_stride,
            )
        )
        np.testing.assert_array_equal(got, ref)

    def test_stride_map_grid_matches_binary_search(self):
        coords = rand_cloud(11)
        mgr = ME.CoordinateManager(D=3)
        in_key, _ = mgr.insert_and_map(coords)
        out_key = mgr.stride(in_key, 4)
        in_map = mgr.get_coordinate_map(in_key)
        out_map = mgr.get_coordinate_map(out_key)
        ref = np.asarray(
            build_stride_map(in_map, out_map, out_map.tensor_stride)
        )
        got = np.asarray(
            build_stride_map(
                in_map, out_map, out_map.tensor_stride,
                probe=probe_of(mgr, out_key),
            )
        )
        np.testing.assert_array_equal(got, ref)

    def test_chunked_stack_matches_unchunked(self):
        """Big-grid chunking (offsets processed in slices of the shifted
        stack) must be invisible in the results."""
        import minkowskiengine_tpu.coords.kernel_map as KM

        coords = rand_cloud(21)
        mgr = ME.CoordinateManager(D=3)
        key, _ = mgr.insert_and_map(coords)
        in_map = mgr.get_coordinate_map(key)
        offs = region_offsets_for(
            RegionType.HYPER_CUBE, (3,) * 3, (1,) * 3, (1, 1, 1), None
        )
        offs = np.concatenate(
            [np.zeros((offs.shape[0], 1), np.int32), offs], axis=1
        )
        pg = probe_of(mgr, key)
        ref = np.asarray(
            _build_in_idx_grid(
                pg, in_map.coordinates, in_map.size_arr, offs,
                base_stride=in_map.tensor_stride,
            )
        )
        cells = int(np.prod(pg[2]))
        old = KM._MAX_SHIFT_STACK
        KM._MAX_SHIFT_STACK = cells * 4  # force 4-offset chunks
        try:
            got = np.asarray(
                _build_in_idx_grid(
                    pg, in_map.coordinates, in_map.size_arr, offs,
                    base_stride=in_map.tensor_stride,
                )
            )
        finally:
            KM._MAX_SHIFT_STACK = old
        np.testing.assert_array_equal(got, ref)

    def test_full_kernel_map_through_manager(self, grid_build_mode):
        """End-to-end: manager-built maps (grid paths engaged) equal maps
        built with grids disabled."""
        import minkowskiengine_tpu.coords.manager as M

        coords = rand_cloud(13)
        mgr = ME.CoordinateManager(D=3)
        k1, _ = mgr.insert_and_map(coords)
        k2 = mgr.stride(k1, 2)
        km = mgr.kernel_map(k1, k2, stride=2, kernel_size=2)

        old = M._MAX_GRID_CELLS
        M._MAX_GRID_CELLS = 0  # disable grids entirely
        try:
            mgr2 = ME.CoordinateManager(D=3)
            j1, _ = mgr2.insert_and_map(coords)
            j2 = mgr2.stride(j1, 2)
            km2 = mgr2.kernel_map(j1, j2, stride=2, kernel_size=2)
        finally:
            M._MAX_GRID_CELLS = old
        np.testing.assert_array_equal(np.asarray(km.in_idx), np.asarray(km2.in_idx))
        np.testing.assert_array_equal(
            np.asarray(km.out_idx_t), np.asarray(km2.out_idx_t)
        )
