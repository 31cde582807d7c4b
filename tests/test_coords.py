"""Coordinate engine tests: packing, unique/inverse, lookup, manager ops.

Mirrors the reference's coordinate map tests
(tests/cpp/coordinate_map_cpu_test.py, tests/python/coordinate_manager.py):
insert counts, unique/inverse round-trip, batched find, stride semantics.
Oracles are independent numpy brute-force implementations.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from minkowskiengine_tpu.coords import keys as K
from minkowskiengine_tpu.coords.lookup import find_coordinates
from minkowskiengine_tpu.coords.manager import CoordinateManager
from minkowskiengine_tpu.coords.map import bucket_capacity
from minkowskiengine_tpu.coords.unique import prefix_mask, unique_coordinates


def rand_coords(n, d, batch=4, lo=-100, hi=100, seed=0):
    rng = np.random.RandomState(seed)
    b = rng.randint(0, batch, size=(n, 1))
    xyz = rng.randint(lo, hi, size=(n, d))
    return np.concatenate([b, xyz], axis=1).astype(np.int32)


def morton_key_ref(c, d):
    """Arbitrary-precision python-int reference of the canonical key under
    the ACTIVE order (K._ORDER): batch in the MSBs, then either Morton
    (bit i of dim j at position i*d + (d-1-j)) or lexicographic spatial
    bits; coordinates biased to unsigned.  Both reduce to the same
    batch-major total order requirement the engine relies on."""
    bits = K.bit_allocation(d)
    b = bits[1]
    W = 32 * K.n_lanes(d)
    if K._ORDER == "lex":
        key = int(c[0])
        for j in range(d):
            key = (key << b) | (int(c[j + 1]) + (1 << (b - 1)))
        return key << (W - sum(bits))  # top-aligned lex layout
    key = int(c[0]) << (d * b)
    for j in range(d):
        v = int(c[j + 1]) + (1 << (b - 1))
        for i in range(b):
            key |= ((v >> i) & 1) << (i * d + (d - 1 - j))
    return key


def lanes_to_int(lanes):
    """(N,) python-int keys from a lane tuple (most significant first)."""
    out = [0] * len(np.asarray(lanes[0]))
    for l in lanes:
        l = np.asarray(l)
        out = [(o << 32) | int(v) for o, v in zip(out, l)]
    return out


class TestKeys:
    def test_pack_matches_key_reference(self):
        for d in (1, 2, 3, 4, 5, 6, 7, 9, 13):
            lo_hi = 30 if d <= 8 else 14  # stay inside the per-dim budget
            coords = rand_coords(300, d, lo=-lo_hi, hi=lo_hi, seed=d)
            packed = lanes_to_int(K.pack(jnp.asarray(coords)))
            expected = [morton_key_ref(c, d) for c in coords]
            assert packed == expected, f"d={d}"

    def test_pack_order_batch_major(self):
        """Batch index is the major sort field — batch decomposition,
        origin maps and per-batch slicing rely on it."""
        for d in (3, 7):
            coords = rand_coords(500, d, batch=7, lo=-14, hi=14, seed=3)
            packed = lanes_to_int(K.pack(jnp.asarray(coords)))
            order = sorted(range(len(packed)), key=lambda i: packed[i])
            assert (np.diff(coords[order][:, 0]) >= 0).all()

    def test_pack_injective(self):
        for d in (3, 7):
            coords = rand_coords(2000, d, batch=16, lo=-3, hi=3, seed=1)
            uniq = np.unique(coords, axis=0)
            packed = lanes_to_int(K.pack(jnp.asarray(uniq)))
            assert len(set(packed)) == len(uniq)

    def test_overflow_detection(self):
        coords = np.array([[0, 40000, 0, 0]], np.int32)  # > 16-bit budget
        assert bool(K.overflow_mask(jnp.asarray(coords))[0])
        ok = np.array([[0, 32767, -32768, 5]], np.int32)
        assert not bool(K.overflow_mask(jnp.asarray(ok))[0])


class TestUnique:
    @pytest.mark.parametrize("d", [2, 3, 4])
    def test_roundtrip(self, d):
        coords = rand_coords(777, d, lo=-5, hi=5, seed=d)  # many duplicates
        n = coords.shape[0]
        cap = bucket_capacity(n)
        padded = np.zeros((cap, d + 1), np.int32)
        padded[:n] = coords
        res, u_coords, overflow, _bbox = unique_coordinates(
            jnp.asarray(padded), prefix_mask(cap, n)
        )
        assert not bool(overflow)
        nu = int(res.n_unique)
        expected_unique = np.unique(coords, axis=0)
        assert nu == len(expected_unique)
        # canonical order: ascending Morton key (batch-major)
        mk = np.array([morton_key_ref(c, d) for c in expected_unique])
        expected_unique = expected_unique[np.argsort(mk, kind="stable")]

        u = np.asarray(u_coords)[:nu]
        np.testing.assert_array_equal(u, expected_unique)

        inv = np.asarray(res.inverse_map)[:n]
        np.testing.assert_array_equal(u[inv], coords)

        umap = np.asarray(res.unique_map)[:nu]
        np.testing.assert_array_equal(coords[umap], u)
        # unique_map points at the FIRST occurrence
        for slot in range(nu):
            matches = np.nonzero((coords == u[slot]).all(axis=1))[0]
            assert umap[slot] == matches[0]

    def test_empty(self):
        padded = np.zeros((128, 4), np.int32)
        res, _, _, _ = unique_coordinates(jnp.asarray(padded), prefix_mask(128, 0))
        assert int(res.n_unique) == 0


class TestFind:
    def test_find_present_and_absent(self):
        mgr = CoordinateManager(D=3)
        coords = rand_coords(400, 3, lo=-20, hi=20, seed=7)
        key, _ = mgr.insert_and_map(coords)
        cmap = mgr.get_coordinate_map(key)

        uniq = np.unique(coords, axis=0)
        queries = np.concatenate(
            [uniq[:50], np.full((10, 4), 1000, np.int32)], axis=0
        )
        qcap = bucket_capacity(len(queries))
        qpad = np.zeros((qcap, 4), np.int32)
        qpad[: len(queries)] = queries
        rows = np.asarray(
            find_coordinates(
                cmap.key_lanes,
                jnp.int32(cmap.size),
                jnp.asarray(qpad),
                jnp.int32(len(queries)),
            )
        )
        stored = cmap.to_numpy()
        for i in range(50):
            assert rows[i] >= 0
            np.testing.assert_array_equal(stored[rows[i]], queries[i])
        assert (rows[50:60] == -1).all()
        assert (rows[len(queries) :] == -1).all()


class TestManager:
    def test_insert_and_map(self):
        mgr = CoordinateManager(D=2)
        coords = np.array(
            [[0, 1, 2], [0, 1, 2], [0, 3, 4], [1, 1, 2], [0, 1, 2]], np.int32
        )
        key, (unique_map, inverse_map) = mgr.insert_and_map(coords)
        assert mgr.size(key) == 3
        u = np.asarray(mgr.get_coordinates(key))
        np.testing.assert_array_equal(u, np.unique(coords, axis=0))
        np.testing.assert_array_equal(
            u[np.asarray(inverse_map)], coords
        )

    def test_stride(self):
        mgr = CoordinateManager(D=2)
        coords = np.array(
            [[0, -3, 1], [0, -2, 1], [0, 3, 2], [0, 2, 3]], np.int32
        )
        key, _ = mgr.insert_and_map(coords)
        skey = mgr.stride(key, 2)
        assert skey.get_tensor_stride() == (2, 2)
        got = np.asarray(mgr.get_coordinates(skey))
        # floor-division semantics (negative coords round towards -inf),
        # reference: src/coordinate_map.hpp:58-76
        expected = np.unique(
            np.concatenate(
                [coords[:, :1], (coords[:, 1:] // 2) * 2], axis=1
            ),
            axis=0,
        )
        np.testing.assert_array_equal(got, expected)

    def test_origin_and_origin_map(self):
        mgr = CoordinateManager(D=3)
        coords = rand_coords(300, 3, batch=5, seed=3)
        key, _ = mgr.insert_and_map(coords)
        okey, omap = mgr.origin_map(key)
        origin_coords = np.asarray(mgr.get_coordinates(okey))
        batches = np.unique(coords[:, 0])
        assert mgr.size(okey) == len(batches)
        np.testing.assert_array_equal(origin_coords[:, 0], batches)
        assert (origin_coords[:, 1:] == 0).all()

        cmap = mgr.get_coordinate_map(key)
        stored = cmap.to_numpy()
        omap = np.asarray(omap)
        for i in range(cmap.size):
            assert batches[omap[i]] == stored[i, 0]
        assert (omap[cmap.size :] == -1).all()

    def test_prune(self):
        mgr = CoordinateManager(D=2)
        coords = np.unique(rand_coords(200, 2, seed=11), axis=0)
        key, _ = mgr.insert_and_map(coords)
        n = mgr.size(key)
        keep = np.zeros(n, bool)
        keep[::3] = True
        new_key, in_to_out, out_from_in = mgr.prune(key, keep)
        n_kept = int(keep.sum())
        assert mgr.size(new_key) == n_kept
        old = mgr.get_coordinate_map(key).to_numpy()
        new = mgr.get_coordinate_map(new_key).to_numpy()
        np.testing.assert_array_equal(new, old[keep])
        io = np.asarray(in_to_out)[:n]
        np.testing.assert_array_equal(old[keep], new[io[keep]])
        assert (io[~keep] == -1).all()
        ofi = np.asarray(out_from_in)[:n_kept]
        np.testing.assert_array_equal(old[ofi], new)

    def test_merge_and_union_map(self):
        mgr = CoordinateManager(D=2)
        c1 = np.unique(rand_coords(50, 2, seed=1), axis=0)
        c2 = np.unique(rand_coords(50, 2, seed=2), axis=0)
        k1, _ = mgr.insert_and_map(c1)
        k2, _ = mgr.insert_and_map(c2)
        mkey = mgr.merge([k1, k2])
        merged = mgr.get_coordinate_map(mkey).to_numpy()
        expected = np.unique(np.concatenate([c1, c2]), axis=0)
        mk = np.array([morton_key_ref(c, 2) for c in expected])
        np.testing.assert_array_equal(merged, expected[np.argsort(mk)])

        maps = mgr.union_map([k1, k2], mkey)
        for ci, ki, m in ((c1, k1, maps[0]), (c2, k2, maps[1])):
            m = np.asarray(m)
            sz = mgr.size(ki)
            stored = mgr.get_coordinate_map(ki).to_numpy()
            np.testing.assert_array_equal(merged[m[:sz]], stored)

    def test_batch_first_sorted(self):
        """Maps are sorted batch-major — batch decomposition relies on it."""
        mgr = CoordinateManager(D=2)
        coords = rand_coords(500, 2, batch=7, seed=13)
        key, _ = mgr.insert_and_map(coords)
        stored = mgr.get_coordinate_map(key).to_numpy()
        assert (np.diff(stored[:, 0]) >= 0).all()


class TestGoldenSurfaceScan:
    """Correctness-at-scale on realistic (surface-like) geometry.

    The reference pins quantization to a real scan: 1.ply @ 2cm must give
    161,890 unique voxels (tests/cpp/coordinate_map_cpu_test.py:34).  With
    no network egress, the equivalent golden here is a deterministic
    synthetic room scan: 400k points on room+furniture surfaces @ 2cm.
    Both the host quantizer (C++ engine / numpy) and the device sort-unique
    path must agree with the frozen count.
    """

    GOLDEN_VOXELS_2CM = 271_794
    GOLDEN_VOXELS_5CM = 78_443

    @pytest.fixture(scope="class")
    def scan(self):
        from minkowskiengine_tpu.utils.datasets import make_room_scan

        return make_room_scan(n_points=400_000, seed=0)

    def test_host_quantizer_golden(self, scan):
        from minkowskiengine_tpu.utils.quantization import quantize

        disc = np.floor(scan / 0.02).astype(np.int32)
        unique_map, inverse_map = quantize(disc)
        assert len(unique_map) == self.GOLDEN_VOXELS_2CM
        # round-trip contract
        np.testing.assert_array_equal(disc[unique_map][inverse_map], disc)

    def test_device_unique_path_golden(self, scan):
        disc = np.floor(scan / 0.05).astype(np.int32)
        coords = np.concatenate(
            [np.zeros((len(disc), 1), np.int32), disc], axis=1
        )
        mgr = CoordinateManager(D=3)
        key, _ = mgr.insert_and_map(coords)
        assert mgr.size(key) == self.GOLDEN_VOXELS_5CM
        # device unique count == host unique count
        from minkowskiengine_tpu.utils.quantization import quantize

        unique_map, _ = quantize(coords)
        assert len(unique_map) == self.GOLDEN_VOXELS_5CM

    def test_conv_on_surface_scan(self, scan):
        """Full conv on surface geometry — exercises realistic slab spans
        (a 5cm voxelization, downsampled to keep CPU-sim runtime sane)."""
        from minkowskiengine_tpu.utils.datasets import voxelize_scan

        coords = voxelize_scan(scan[:60_000], 0.05)
        rng = np.random.RandomState(0)
        feats = rng.randn(len(coords), 3).astype(np.float32)
        import minkowskiengine_tpu as ME
        from flax import nnx

        x = ME.SparseTensor(feats, coords)
        conv = ME.MinkowskiConvolution(
            3, 8, kernel_size=3, stride=1, dimension=3, rngs=nnx.Rngs(0)
        )
        out = conv(x)
        assert out.size == x.size
        assert np.isfinite(np.asarray(out.F)).all()
