"""Native C++ host engine: contract + fallback equivalence."""

import numpy as np
import pytest

from minkowskiengine_tpu import cpp as hostengine
from minkowskiengine_tpu.utils.quantization import quantize, quantize_label


@pytest.fixture(scope="module")
def lib_available():
    return hostengine.load() is not None


class TestHostEngine:
    def test_quantize_contract(self, lib_available):
        rng = np.random.RandomState(0)
        coords = rng.randint(-50, 50, (5000, 4)).astype(np.int32)
        coords[: len(coords) // 2] = coords[len(coords) // 2 :]
        um, inv = quantize(coords)
        np.testing.assert_array_equal(coords[um][inv], coords)
        # first-occurrence semantics: representative set == np.unique's
        u, first = np.unique(coords, axis=0, return_index=True)
        assert len(um) == len(u)
        assert set(um.tolist()) == set(first.tolist())

    def test_native_matches_numpy_fallback(self, lib_available):
        if not lib_available:
            pytest.skip("no compiler")
        rng = np.random.RandomState(1)
        coords = rng.randint(0, 10, (1000, 3)).astype(np.int32)
        native = hostengine.quantize_i32(coords)
        assert native is not None
        um_n, inv_n = native
        np.testing.assert_array_equal(coords[um_n][inv_n], coords)

    def test_quantize_label_conflict(self, lib_available):
        coords = np.array([[0, 0], [0, 0], [2, 2], [0, 0]], np.int32)
        labels = np.array([7, 7, 3, 9], np.int32)
        um, inv, lab = quantize_label(coords, labels, ignore_label=-1)
        got = {tuple(coords[u]): l for u, l in zip(um, lab)}
        assert got[(0, 0)] == -1  # 7 vs 9 conflict
        assert got[(2, 2)] == 3

    def test_empty(self, lib_available):
        um, inv = quantize(np.zeros((0, 3), np.int32))
        assert len(um) == 0 and len(inv) == 0
