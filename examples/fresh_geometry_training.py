"""Fresh-geometry training: every batch is a brand-new point cloud.

This is the real training regime for point-cloud networks — unlike the
fixed-geometry benchmarks, each step must rebuild every coordinate map
and kernel map.  The TPU-native recipe makes that rebuild a TRACED part
of one compiled program:

1. Run the model once eagerly on a representative cloud; the manager
   records the coordinate-op recipe (an oplog).
2. Replay a few warmup clouds through ``GeometryReplayer`` — this
   ratchets the static-shape floors (capacity buckets, slab sizes,
   grid extents) that make the replay traceable.
3. ``CompiledReplayer.trace`` then rebuilds the ENTIRE coordinate phase
   (all maps, all levels, slab metadata, outlier lists) inside jit, so
   one XLA program does coordinate phase + feature reduction + forward +
   backward per batch.  A single device bool (``ok``) reports whether
   every floor held; on False, replay that cloud in sync mode once (the
   floors ratchet up) and continue.

Run (CPU or TPU):
    python examples/fresh_geometry_training.py [--cpu]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

import jax

if "--cpu" in _sys.argv:  # the axon TPU plugin ignores JAX_PLATFORMS
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax
from flax import nnx

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.coords.map import bucket_capacity
from minkowskiengine_tpu.models import MinkUNet14A


def make_cloud(seed, n_target=4000, extent=24):
    rng = np.random.RandomState(seed)
    coords = np.unique(
        np.concatenate(
            [
                np.zeros((n_target * 2, 1), np.int32),
                rng.randint(0, extent, (n_target * 2, 3)),
            ],
            axis=1,
        ).astype(np.int32),
        axis=0,
    )[:n_target]
    feats = rng.randn(len(coords), 3).astype(np.float32)
    return coords, feats


def pad_batch(c, f):
    """Pad a cloud to its capacity bucket (static shapes for jit)."""
    n = len(c)
    cap = bucket_capacity(n)
    cp = np.zeros((cap, c.shape[1]), np.int32)
    cp[:n] = c
    fp = np.zeros((cap, f.shape[1]), f.dtype)
    fp[:n] = f
    return jnp.asarray(cp), jnp.asarray(n, jnp.int32), jnp.asarray(fp)


def main():
    n_classes = 10

    # 1. record the recipe on a representative cloud
    coords0, feats0 = make_cloud(seed=0)
    x0 = ME.SparseTensor(jnp.asarray(feats0), jnp.asarray(coords0))
    net = MinkUNet14A(3, n_classes, D=3, rngs=nnx.Rngs(0))
    _ = net(x0)
    manager = x0.coordinate_manager

    # 2. settle the floors on a few warmup clouds
    replayer = ME.GeometryReplayer(manager)
    for s in (1, 2):
        replayer(make_cloud(seed=s)[0])

    # 3. compile the whole step (coordinate phase included)
    crep = ME.CompiledReplayer(manager)
    crep.adopt(replayer)

    graphdef, gstate = nnx.split(net)
    opt = optax.sgd(1e-2)
    opt_state = opt.init(nnx.state(net, nnx.Param))

    def make_train_step():
        # A FRESH jitted closure per (re)build: jax.jit caches on input
        # shapes, not on crep's mutated floors — re-jitting after
        # crep.adopt() is what makes the ratchet-and-retry loop actually
        # pick up the new floors (see CLAUDE.md's stale-jit-cache trap).
        @jax.jit
        def train_step(state, opt_state, coords_p, n, feats_p, labels):
            geo, fp, ok = crep.trace(coords_p, n, feats_p)
            model = nnx.merge(graphdef, state)

            def loss_fn(m):
                vmgr = ME.CoordinateManager.from_geometry(geo)
                xt = ME.SparseTensor(
                    fp, coordinate_map_key=geo.entry_key,
                    coordinate_manager=vmgr,
                )
                logits = m(xt).padded_features
                mask = xt.valid_row_mask.astype(jnp.float32)
                losses = optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels[: logits.shape[0]]
                )
                return jnp.sum(losses * mask) / jnp.sum(mask)

            loss, grads = nnx.value_and_grad(loss_fn)(model)
            params = nnx.state(model, nnx.Param)
            updates, new_opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            nnx.update(model, params)
            _, state = nnx.split(model)
            return state, new_opt_state, loss, ok

        return train_step

    train_step = make_train_step()

    rng = np.random.RandomState(0)
    t0 = time.perf_counter()
    for step in range(8):
        c, f = make_cloud(seed=100 + step)
        cp, n, fp = pad_batch(c, f)
        labels = jnp.asarray(
            rng.randint(0, n_classes, cp.shape[0]).astype(np.int32)
        )
        gstate, opt_state, loss, ok = train_step(
            gstate, opt_state, cp, n, fp, labels
        )
        if not bool(ok):
            # a floor was violated by this geometry: sync-replay it once
            # (ratchets the floors), adopt them, and re-jit the step —
            # the OLD jitted closure would silently reuse the executable
            # traced under the stale floors
            replayer(c)
            crep.adopt(replayer)
            train_step = make_train_step()
            gstate, opt_state, loss, ok = train_step(
                gstate, opt_state, cp, n, fp, labels
            )
            assert bool(ok)
        print(f"step {step}: loss {float(loss):.4f} "
              f"({(time.perf_counter()-t0)*1e3:.0f} ms elapsed)")
    print("done — every batch rebuilt its geometry inside ONE compiled step")


if __name__ == "__main__":
    main()
