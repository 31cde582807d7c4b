"""Outlier-tolerant slab decomposition: dropped-pair extraction and the
XLA correction pass.

The slab conv kernel sizes its window S at a ladder rung that may be
SMALLER than the max per-(offset, tile) span; valid pairs outside their
window gather zero inside the kernel and are instead carried in a
static-capacity COO list applied by ``ops.functional._outlier_apply`` /
``_outlier_dw``.  These tests prove, on CPU, that

  slab-windowed contributions + outlier corrections == the exact conv

in forward, input-gradient and weight-gradient directions, and that the
extraction bit-matches the fused outlier counters in ``measure_spans``.
(The Pallas kernel implements exactly the windowed semantics emulated
here: local indices outside [0, S) gather a zero row.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.ops.functional import (
    _outlier_apply,
    _outlier_dw,
    sparse_conv,
    take_rows,
)
from minkowskiengine_tpu.ops.pallas.conv_kernel import (
    SUB_TILE,
    _extract_outliers,
    build_slab_map_floored,
    measure_spans,
    slab_ladder,
    slab_tile,
    sub_ladder,
)


def surface_kmap(seed=0, n_points=80_000, ks=3):
    from minkowskiengine_tpu.utils.datasets import room_scan_voxels

    coords, feats = room_scan_voxels(
        voxel_size=0.05, n_points=n_points, extent=(3.0, 3.0, 2.5), seed=seed
    )
    x = ME.SparseTensor(feats, coords)
    mgr = x.coordinate_manager
    key = x.coordinate_map_key
    km = mgr.kernel_map(key, key, kernel_size=ks, stride=1)
    return x, km


def windowed_in_idx(in_idx, slab):
    """The effective gather map the slab kernel implements: pairs whose
    window-local index falls outside the window are dropped (-1).  With
    two-tier windows the window is the per-(offset, tile, sub-tile)
    S'-row slice at ``starts + sub_rel``."""
    idx = np.asarray(in_idx)
    Kv, C = idx.shape
    T = slab.tile
    nt = C // T
    tiles = idx.reshape(Kv, nt, T)
    starts = np.asarray(slab.starts)  # (K, nt)
    local = tiles - starts[:, :, None]
    if slab.sub_size and slab.sub_rel is not None:
        J = T // SUB_TILE
        # (K·J, nt) → (K, nt, J)
        rel = np.asarray(slab.sub_rel).reshape(Kv, J, nt).transpose(0, 2, 1)
        l4 = local.reshape(Kv, nt, J, SUB_TILE) - rel[..., None]
        keep = (
            (tiles.reshape(Kv, nt, J, SUB_TILE) >= 0)
            & (l4 >= 0)
            & (l4 < slab.sub_size)
        ).reshape(Kv, nt, T)
    else:
        keep = (tiles >= 0) & (local >= 0) & (local < slab.slab_size)
    return np.where(keep, tiles, -1).reshape(Kv, C)


class TestOutlierSlabs:
    def test_extraction_matches_measure_counters(self):
        x, km = surface_kmap()
        tile = slab_tile(km.in_idx.shape[1])
        ladder = slab_ladder(tile)
        vec = np.asarray(
            measure_spans(km.in_idx, tile, km.capacity_in, ladder)
        )
        assert int(vec[2]) == int((np.asarray(km.in_idx) >= 0).sum())
        for S, expected in zip(ladder, vec[3:]):
            src, dst, kk, cnt, _perm, _gs = _extract_outliers(
                km.in_idx, km.capacity_in, tile, S, 1 << 16
            )
            assert int(cnt) == int(expected)
            n = int(cnt)
            src, dst, kk = (np.asarray(a) for a in (src, dst, kk))
            assert (src[:n] >= 0).all() and (src[n:] == -1).all()
            # every extracted pair is a real (dropped) match
            idx = np.asarray(km.in_idx)
            assert (idx[kk[:n], dst[:n]] == src[:n]).all()

    @pytest.mark.parametrize(
        "S,sub", [(320, 0), (512, 0), (512, 160), (320, 128)]
    )
    def test_windowed_plus_correction_is_exact(self, S, sub):
        x, km = surface_kmap()
        rng = np.random.RandomState(3)
        Kv = km.kernel_volume
        cin, cout = 3, 8
        W = jnp.asarray(rng.randn(Kv, cin, cout).astype(np.float32)) * 0.1
        feats = x.padded_features

        floor = (S, 256, 16384, sub if sub else S)
        fwd = build_slab_map_floored(km.in_idx, km.capacity_in, floor)
        bwd = build_slab_map_floored(km.out_idx_t, km.capacity_out, floor)
        assert fwd.sub_size == sub and bwd.sub_size == sub
        if sub:
            # sub windows sit inside the slab, 16-aligned
            rel = np.asarray(fwd.sub_rel)
            assert rel.min() >= 0 and rel.max() <= S - sub
            assert (rel % 16 == 0).all()
            loc = np.asarray(fwd.local_tk)
            assert loc.min() >= 0 and loc.max() <= sub
        assert fwd.ov_src is not None and int(fwd.ov_count) > 0, (
            "test requires real outliers; surface cloud should produce them"
        )
        assert int(fwd.ov_count) <= fwd.ov_cap
        assert int(bwd.ov_count) <= bwd.ov_cap

        exact = sparse_conv(feats, W, km.in_idx, km.out_idx_t)

        # forward: windowed gather + correction
        eff = jnp.asarray(windowed_in_idx(km.in_idx, fwd))
        windowed = sparse_conv(feats, W, eff, km.out_idx_t)
        fixed = _outlier_apply(windowed, feats, W, fwd)
        np.testing.assert_allclose(
            np.asarray(fixed), np.asarray(exact), rtol=1e-5, atol=1e-5
        )

        # gradients of the exact path
        def loss_exact(f, w):
            o = sparse_conv(f, w, km.in_idx, km.out_idx_t)
            return jnp.sum(o * cot)

        cot = jnp.asarray(
            rng.randn(exact.shape[0], cout).astype(np.float32)
        )
        d_feats_e, d_w_e = jax.grad(loss_exact, argnums=(0, 1))(feats, W)

        # input gradient: windowed transpose gather + correction on the
        # bwd slab (source buffer = cotangent, weights transposed)
        eff_t = jnp.asarray(windowed_in_idx(km.out_idx_t, bwd))
        w_t = jnp.swapaxes(W, 1, 2)
        d_feats_w = sparse_conv(cot, w_t, eff_t, eff)
        d_feats = _outlier_apply(d_feats_w, cot, w_t, bwd)
        np.testing.assert_allclose(
            np.asarray(d_feats), np.asarray(d_feats_e), rtol=1e-4, atol=1e-4
        )

        # weight gradient: windowed dW + correction on the fwd slab
        def dw_windowed():
            def step(_, idx_k):
                gi = take_rows(feats, idx_k)
                return None, jnp.dot(gi.T, cot)

            _, dw = jax.lax.scan(step, None, eff)
            return dw

        d_w = _outlier_dw(dw_windowed(), feats, cot, fwd)
        np.testing.assert_allclose(
            np.asarray(d_w), np.asarray(d_w_e), rtol=1e-4, atol=1e-4
        )

    def test_ragged_correction_matches_k_blocked(self, monkeypatch):
        """The wide-channel ``ragged_dot`` grouped-GEMM correction path is
        bit-for-bit the same contraction as the narrow k-blocked one-hot
        GEMM (both route through _outlier_apply/_outlier_dw; the ragged
        form folds the -1 padding tail into the last offset group whose
        gathered rows are zero)."""
        import minkowskiengine_tpu.ops.functional as F

        x, km = surface_kmap()
        rng = np.random.RandomState(7)
        Kv = km.kernel_volume
        cin, cout = 48, 40  # Kv*cin above the default ragged threshold
        W = jnp.asarray(rng.randn(Kv, cin, cout).astype(np.float32)) * 0.1
        feats = jnp.asarray(
            rng.randn(km.capacity_in, cin).astype(np.float32)
        )
        cot = jnp.asarray(
            rng.randn(km.capacity_out, cout).astype(np.float32)
        )
        fwd = build_slab_map_floored(
            km.in_idx, km.capacity_in, (320, 256, 16384, 320)
        )
        assert fwd.ov_src is not None and int(fwd.ov_count) > 0
        out0 = jnp.zeros((km.capacity_out, cout), jnp.float32)
        dw0 = jnp.zeros((Kv, cin, cout), jnp.float32)

        monkeypatch.setattr(F, "_RAGGED_OV_ENV", "0")
        apply_blocked = F._outlier_apply(out0, feats, W, fwd)
        dw_blocked = F._outlier_dw(dw0, feats, cot, fwd)
        monkeypatch.setattr(F, "_RAGGED_OV_ENV", "1")
        apply_ragged = F._outlier_apply(out0, feats, W, fwd)
        dw_ragged = F._outlier_dw(dw0, feats, cot, fwd)

        np.testing.assert_allclose(
            np.asarray(apply_ragged), np.asarray(apply_blocked),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(dw_ragged), np.asarray(dw_blocked),
            rtol=2e-4, atol=2e-4,
        )
        # default gate: wide channels ragged, tiny channels k-blocked
        monkeypatch.setattr(F, "_RAGGED_OV_ENV", None)
        assert F._use_ragged_ov(Kv, cin, cout)
        assert not F._use_ragged_ov(27, 3, 32)

    def test_gather_apply_matches_scatter(self, monkeypatch):
        """The scatter-free dst-sorted application (segmented run sums +
        searchsorted gather, the default when ``ov_perm`` exists) equals
        the ``.at[].add`` scatter form on a real outlier list, for both
        grouped-GEMM shapes."""
        import minkowskiengine_tpu.ops.functional as F

        x, km = surface_kmap()
        rng = np.random.RandomState(9)
        Kv = km.kernel_volume
        for cin, cout in ((3, 8), (48, 40)):  # k-blocked and ragged GEMMs
            W = jnp.asarray(rng.randn(Kv, cin, cout).astype(np.float32)) * 0.1
            feats = jnp.asarray(
                rng.randn(km.capacity_in, cin).astype(np.float32)
            )
            fwd = build_slab_map_floored(
                km.in_idx, km.capacity_in, (320, 256, 16384, 128)
            )
            assert fwd.ov_perm is not None and int(fwd.ov_count) > 0
            # build-time group sizes == the apply-time one-hot recompute
            np.testing.assert_array_equal(
                np.asarray(fwd.ov_gs),
                np.asarray(F._ov_group_sizes(fwd.ov_k, Kv)),
            )
            out0 = jnp.asarray(
                rng.randn(km.capacity_out, cout).astype(np.float32)
            )
            monkeypatch.setattr(F, "_OV_APPLY_ENV", "scatter")
            a = F._outlier_apply(out0, feats, W, fwd)
            monkeypatch.setattr(F, "_OV_APPLY_ENV", None)
            assert F._use_gather_ov(fwd)
            b = F._outlier_apply(out0, feats, W, fwd)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5
            )

    def test_subtier_extraction_matches_measure_counters(self):
        """The two-tier block of measure_spans bit-matches
        _extract_outliers under the same (S, S') window rule."""
        x, km = surface_kmap()
        tile = slab_tile(km.in_idx.shape[1])
        ladder = slab_ladder(tile)
        subs = sub_ladder(tile)
        vec = np.asarray(
            measure_spans(km.in_idx, tile, km.capacity_in, ladder, subs)
        )
        assert len(vec) == 3 + len(ladder) * (1 + len(subs))
        tbl = vec[3 + len(ladder):]
        for i, S in enumerate(ladder):
            for j, Sp in enumerate(subs):
                expected = int(tbl[i * len(subs) + j])
                if Sp >= S:
                    # degenerate combo repeats the single-tier count
                    assert expected == int(vec[3 + i])
                    continue
                src, dst, kk, cnt, _perm, _gs = _extract_outliers(
                    km.in_idx, km.capacity_in, tile, S, 1 << 16, Sp
                )
                assert int(cnt) == expected
                # two-tier outliers superset the single-tier ones
                assert expected >= int(vec[3 + i])
                n = int(cnt)
                idx = np.asarray(km.in_idx)
                kk, dst, src = (np.asarray(a) for a in (kk, dst, src))
                assert (idx[kk[:n], dst[:n]] == src[:n]).all()

    def test_manager_build_enables_subtier(self):
        """The span-driven builder picks a sub-window rung on both
        geometries (uniform: zero-outlier S'; surface: ~1% budget)."""
        x, km = surface_kmap()
        fwd = km.fwd_slab
        assert fwd is not None
        assert 0 < fwd.sub_size < fwd.slab_size
        assert fwd.ov_src is not None  # validity always checkable
        assert int(fwd.ov_count) <= fwd.ov_cap
        # floors ratcheted with the sub component
        floors = list(x.coordinate_manager._slab_floors.values())
        assert floors, "slab floor should be ratcheted"
        ffloor, _bfloor = floors[0]
        assert len(ffloor) == 4 and ffloor[3] == fwd.sub_size

    def test_surface_build_picks_small_rung_with_outliers(self):
        """End-to-end: the manager-built surface kernel map must choose a
        ladder-rung slab (not a max-span slab) and carry outliers."""
        x, km = surface_kmap(seed=1)
        assert km.fwd_slab is not None
        tile = km.fwd_slab.tile
        assert km.fwd_slab.slab_size <= slab_ladder(tile)[-1]
        vec = np.asarray(
            measure_spans(km.in_idx, tile, km.capacity_in, ())
        )
        if int(vec[0]) + 15 > km.fwd_slab.slab_size:
            # span tail exceeded the rung ⇒ outliers must be present+exact
            assert km.fwd_slab.ov_src is not None
            assert 0 < int(km.fwd_slab.ov_count) <= km.fwd_slab.ov_cap


class TestTracedOkSubWindows:
    def test_capacity_sized_slab_with_sub_windows_checks_ov_count(self):
        """traced_ok must gate on ov_count whenever an outlier list
        exists — INCLUDING slab_size == capacity_in, where two-tier
        sub-windows can still drop pairs (regression: the old gate
        `slab_size < capacity_in` skipped the check and traced replays
        silently truncated outliers)."""
        import dataclasses

        from minkowskiengine_tpu.coords.kernel_map import KernelMap

        mgr = ME.CoordinateManager(D=3)
        cap = 256
        in_idx = jnp.full((8, cap), -1, jnp.int32)
        slab = build_slab_map_floored(
            in_idx, cap, (cap, 0, 64, 128), tile=cap
        )
        assert slab is not None and slab.slab_size == slab.capacity_in
        assert slab.sub_size > 0 and slab.ov_count is not None
        # forge an overflowing outlier count (count > ov_cap)
        bad = dataclasses.replace(
            slab, ov_count=jnp.int32(slab.ov_cap + 1)
        )
        km = KernelMap(in_idx, in_idx, 10, 10, bad, None)
        mgr._begin_deferred(traced=True)
        mgr._kernel_maps[("fake",)] = km
        span = jnp.zeros((3,), jnp.int32)
        mgr._deferred["slabs"].append((("fake",), span, span))
        assert not bool(mgr.traced_ok())
        # and a fitting count passes
        good = dataclasses.replace(slab, ov_count=jnp.int32(slab.ov_cap))
        mgr._kernel_maps[("fake",)] = KernelMap(in_idx, in_idx, 10, 10, good, None)
        assert bool(mgr.traced_ok())
        mgr._deferred = None


class TestSmemPrefetchGate:
    """The scalar-prefetch block must fit SMEM (1 MiB on v5e): K=125
    two-tier at 512 tiles is 627 rows x 512 x 4 B = 1.28 MB and crashed
    Mosaic allocation at the 104k-voxel batch=4 scale."""

    def test_sub_disabled_when_prefetch_would_overflow_smem(self):
        from minkowskiengine_tpu.ops.pallas.conv_kernel import (
            _prefetch_fits,
            pallas_conv_supported,
        )

        K, cap = 125, 131072
        rng = np.random.default_rng(0)
        in_idx = jnp.asarray(
            np.where(
                rng.random((K, cap)) < 0.2,
                rng.integers(0, cap, (K, cap)),
                -1,
            ).astype(np.int32)
        )
        sm = build_slab_map_floored(in_idx, cap, (320, 256, 512, 128))
        assert sm.sub_size == 0  # two-tier would need 1.28 MB of SMEM
        assert _prefetch_fits(K, sm.tile, sm.local_tk.shape[0], False)
        assert pallas_conv_supported(sm, (K, 3, 32))

    def test_base_overflow_routes_to_xla(self):
        from minkowskiengine_tpu.ops.pallas.conv_kernel import (
            pallas_conv_supported,
        )

        K, cap = 343, 524288  # 345 rows x 2048 tiles x 4 B = 2.8 MB
        in_idx = jnp.full((K, cap), -1, jnp.int32)
        in_idx = in_idx.at[:, :64].set(0)
        sm = build_slab_map_floored(in_idx, cap, (320, 256, 512, 0))
        assert sm is None or not pallas_conv_supported(sm, (K, 3, 32))

    def test_small_builds_keep_two_tier(self):
        sm_small = surface_kmap(n_points=80_000)[0]
        # the headline-scale surface map still gets its sub windows
        assert sm_small is not None
