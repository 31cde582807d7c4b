"""Dispatch-decision goldens (VERDICT r4 item 8).

Twice in round 4 a cost-model/routing tweak silently regressed a
production path (the k=5 dense misroute to a 6.4 ms sparse kernel,
e566dda; the slices grid-build default, c14e77b) and was caught only by
ad-hoc TPU profiling.  These tests freeze today's *intended* routing on
canned configs so the next cost-model tweak that flips one is a red test,
not a bench surprise.

If a golden legitimately changes, re-measure the affected path on TPU
(benchmarks/prof_refsuite.py) before updating the expectation here.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from minkowskiengine_tpu.ops.dense_conv import (
    DensePlan,
    dense_conv_beneficial,
)
from minkowskiengine_tpu.ops.pallas.conv_kernel import (
    DEFAULT_TILE,
    build_slab_map_from_span,
    measure_spans,
    slab_ladder,
    sub_ladder,
)


SURFACE = DensePlan(jnp.zeros((32768,), jnp.int32), (1, 48, 48, 48))
UNIFORM = DensePlan(jnp.zeros((32768,), jnp.int32), (1, 112, 112, 64))


class TestDenseDispatchGolden:
    """dense_conv_beneficial on the regimes the bench exercises.

    Measured anchors (v5e, r5 zfold): surface-26k k=3 sparse
    fwd 1.06 + bwd 0.28 ms vs dense-zfold fwd 0.45 + bwd 0.65 (dense wins
    training); k=5 sparse 6.4 ms fwd alone vs dense-zfold 0.57 (dense —
    the e566dda regression was this flipping); 128-ch (no zfold: cin > 8)
    slab kernel always beats dense conv FLOPs on empty cells.
    """

    CASES = [
        # (name, plan, capacity, K, cin, cout, kwargs, expected)
        ("k3_surface_cached_dense", SURFACE, 32768, 27, 3, 32,
         dict(cached_slab_size=128, cached_sub_tiles=4,
              cached_ov_cap=16384), True),
        ("k3_uniform_cached_sparse", UNIFORM, 32768, 27, 3, 32,
         dict(cached_slab_size=128, cached_sub_tiles=4,
              cached_ov_cap=16384), False),
        ("k5_surface_cached_dense", SURFACE, 32768, 125, 3, 32,
         dict(cached_slab_size=160, cached_sub_tiles=4,
              cached_ov_cap=32768), True),
        ("k5_fresh_dense", SURFACE, 32768, 125, 3, 32,
         dict(map_cached=False), True),
        ("k7_surface_cached_dense", SURFACE, 32768, 343, 3, 32,
         dict(cached_slab_size=1024, cached_sub_tiles=1,
              cached_ov_cap=32768), True),
        ("k3_128ch_surface_sparse", SURFACE, 32768, 27, 128, 128,
         dict(cached_slab_size=128, cached_sub_tiles=4,
              cached_ov_cap=16384), False),
        ("k3_128ch_uniform_sparse", UNIFORM, 32768, 27, 128, 128,
         dict(cached_slab_size=128, cached_sub_tiles=4,
              cached_ov_cap=16384), False),
    ]

    @pytest.mark.parametrize(
        "name,plan,cap,K,cin,cout,kw,expected",
        CASES,
        ids=[c[0] for c in CASES],
    )
    def test_routing(self, name, plan, cap, K, cin, cout, kw, expected):
        assert dense_conv_beneficial(plan, cap, K, cin, cout, **kw) == expected


def _mk_inidx(seed, K, cap, tile, span_core, tail_frac, tail_span):
    """Synthetic per-(offset, tile) kernel-map indices: clustered within
    span_core of the tile base, with an optional scattered tail."""
    rng = np.random.RandomState(seed)
    nt = cap // tile
    idx = np.full((K, cap), -1, np.int64)
    for k in range(K):
        for t in range(nt):
            base = t * tile
            n = rng.randint(tile // 2, tile)
            rows = rng.choice(tile, n, replace=False)
            vals = base + rng.randint(0, span_core, n)
            if tail_frac > 0:
                tail = rng.rand(n) < tail_frac
                vals = np.where(
                    tail, base + rng.randint(0, tail_span, n), vals
                )
            idx[k, base + rows] = np.clip(vals, 0, cap - 1)
    return jnp.asarray(idx.astype(np.int32))


class TestSlabRungGolden:
    """build_slab_map_from_span rung picks on canned span distributions.

    Geometry archetypes: outlier-tail surface scans (small rung + ov
    list), tight uniform spans (smallest rung + sub window), wide k=5
    125-offset maps, and heavy spans with no tail (big rung, no ov)."""

    CASES = [
        # name: (seed, K, cap, core, tail_frac, tail_span,
        #        S, sub, U, ov_cap)
        ("surface_like_k27", (0, 27, 4096, 300, 0.01, 3000,
                              320, 0, 1024, 1024)),
        ("tight_k27", (1, 27, 4096, 90, 0.0, 0, 320, 96, 1024, 256)),
        ("k125_wide", (2, 125, 4096, 480, 0.02, 3500, 512, 0, 1024, 8192)),
        ("k27_spanheavy", (3, 27, 4096, 900, 0.0, 0, 1024, 0, 1536, 0)),
    ]

    @pytest.mark.parametrize(
        "name,params", CASES, ids=[c[0] for c in CASES]
    )
    def test_rungs(self, name, params):
        seed, K, cap, core, tf, ts, exp_S, exp_sub, exp_U, exp_ov = params
        tile = DEFAULT_TILE
        ii = _mk_inidx(seed, K, cap, tile, core, tf, ts)
        ladder = slab_ladder(tile)
        subs = sub_ladder(tile)
        sp = np.asarray(measure_spans(ii, tile, cap, ladder, subs))
        sm = build_slab_map_from_span(
            ii, cap, int(sp[0]), tile, None, int(sp[1]),
            [int(v) for v in sp[3:]], int(sp[2]),
        )
        got = (sm.slab_size, sm.sub_size, sm.union_size, sm.ov_cap)
        assert got == (exp_S, exp_sub, exp_U, exp_ov), (
            f"{name}: rung pick changed — re-measure on TPU before "
            f"updating this golden (got {got})"
        )
