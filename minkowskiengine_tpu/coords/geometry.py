"""Geometry: a coordinate manager's cached state as a traceable pytree.

Why this exists (the fresh-geometry training problem): the coordinate phase
is host-driven, so when a jitted train step closes over a manager, every
kernel map it fetches is baked into the compiled program as a CONSTANT —
each new point cloud forces a full retrace + recompile.  ``Geometry`` turns
that state into a pytree *argument*: one compiled step then serves every
geometry whose padded capacity buckets match (power-of-two bucketing makes
matches the common case), and per-device geometries can be stacked and fed
through ``shard_map`` as sharded arguments — the reference's per-GPU DDP
regime (reference: examples/multigpu_ddp.py:100-119), which its engine
expresses by simply being a separate process per GPU.

Flow::

    x = ME.SparseTensor(feats, coords)          # builds maps, records oplog
    _ = net(x)                                  # first (eager) forward
    log = x.coordinate_manager.oplog()          # the coordinate-op recipe

    # per fresh batch:
    mgr2 = ME.CoordinateManager.replay(log, new_coords)   # no model needed
    geo = mgr2.export_geometry()

    @nnx.jit
    def step(model, feats, geo):
        mgr = ME.CoordinateManager.from_geometry(geo)     # trace-time view
        xt = ME.SparseTensor(feats, coordinate_map_key=geo.entry_key,
                             coordinate_manager=mgr)
        ...                                               # cache-hit reuse

All static identification (map keys, kernel-map cache keys, slab/grid shape
ladders) lives in aux data; everything data-dependent (coordinates, packed
keys, index matrices, valid-row counts) is a leaf.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .manager import CoordinateMapKey


def _sorted_items(d: dict):
    return sorted(d.items(), key=lambda kv: repr(kv[0]))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Geometry:
    """Snapshot of a manager's coordinate/kernel-map caches.

    maps / kernel_maps / stride_maps / dense_plans are leaves-bearing
    (values are pytrees); their keys, plus origin_keys and the entry key,
    are static aux.
    """

    D: int
    maps: Dict[tuple, object]
    kernel_maps: Dict[tuple, object]
    stride_maps: Dict[tuple, object]
    dense_plans: Dict[tuple, object]
    origin_keys: Dict[tuple, tuple]  # static: in key-tuple -> origin key-tuple
    entry_key_tuple: Optional[Tuple[Tuple[int, ...], str]] = None

    @property
    def entry_key(self) -> CoordinateMapKey:
        """The key of the first inserted map (the network input)."""
        if self.entry_key_tuple is None:
            raise ValueError("Geometry has no recorded entry map")
        return CoordinateMapKey(*self.entry_key_tuple)

    def tree_flatten(self):
        m = _sorted_items(self.maps)
        k = _sorted_items(self.kernel_maps)
        s = _sorted_items(self.stride_maps)
        p = _sorted_items(self.dense_plans)
        children = (
            [v for _, v in m],
            [v for _, v in k],
            [v for _, v in s],
            [v for _, v in p],
        )
        aux = (
            self.D,
            tuple(key for key, _ in m),
            tuple(key for key, _ in k),
            tuple(key for key, _ in s),
            tuple(key for key, _ in p),
            tuple(_sorted_items(self.origin_keys)),
            self.entry_key_tuple,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        D, mk, kk, sk, pk, origin_items, entry = aux
        mv, kv, sv, pv = children
        return cls(
            D=D,
            maps=dict(zip(mk, mv)),
            kernel_maps=dict(zip(kk, kv)),
            stride_maps=dict(zip(sk, sv)),
            dense_plans=dict(zip(pk, pv)),
            origin_keys=dict(origin_items),
            entry_key_tuple=entry,
        )


def stack_geometries(geometries: List[Geometry]) -> Geometry:
    """Stack same-structure geometries along a new leading device axis.

    All geometries must share treedef (same model recipe, same capacity
    buckets — pad inputs to a common bucket if needed).  The result's array
    leaves have shape (n_devices, ...) and can be device_put with a
    ``P("data")`` sharding for per-device-geometry data parallelism.
    """
    import jax.numpy as jnp

    leaves0, treedef = jax.tree.flatten(geometries[0])
    stacked = []
    for i in range(len(leaves0)):
        stacked.append(
            jnp.stack([jax.tree.flatten(g)[0][i] for g in geometries])
        )
    return jax.tree.unflatten(treedef, stacked)


def index_geometry(geo: Geometry, i) -> Geometry:
    """Take slice ``i`` of a stacked Geometry (inside shard_map, i=0 after
    the leading device axis is sharded away use ``squeeze_geometry``)."""
    return jax.tree.map(lambda v: v[i], geo)


def squeeze_geometry(geo: Geometry) -> Geometry:
    """Drop a leading singleton device axis (inside shard_map bodies)."""
    return jax.tree.map(lambda v: v[0], geo)


class CompiledReplayer:
    """The coordinate phase as ONE compiled program per batch.

    ``GeometryReplayer`` runs the recorded coordinate ops eagerly with one
    deferred host sync — dozens of small dispatches per batch (measured
    ~0.4-0.5 s per fresh MinkUNet34 cloud through a remote-TPU tunnel).
    This driver instead traces the WHOLE replay (slab/dense shapes pinned
    to the ratcheted floors) into a single jitted function::

        coords, n, feats  ->  (Geometry, padded_features, ok)

    where ``ok`` is a device bool asserting every floor held.  Callers can
    sync ``ok`` together with their loss (one round trip per batch); when a
    floor is violated (rare after warm-up) the batch transparently re-runs
    through the sync replay, ratcheting the floor and recompiling.

    Usage::

        x = ME.SparseTensor(feats0, coords0); _ = net(x)      # warm + record
        replayer = ME.CompiledReplayer(x.coordinate_manager)
        for coords, feats in batches:
            geo, fp = replayer(coords, feats)                  # 1 dispatch
            loss = jitted_step(state, fp, geo)                 # cache hit

    Or fused end-to-end (zero extra syncs) with ``run()`` + ``check()``.
    """

    def __init__(self, recorded_manager, quantization_mode=None):
        self.oplog = recorded_manager.oplog()
        self.cap_floors = dict(recorded_manager._cap_floors)
        self.slab_floors = dict(recorded_manager._slab_floors)
        self.grid_floors = dict(recorded_manager._grid_floors)
        self.join_floors = dict(recorded_manager._join_floors)
        self.quantization_mode = quantization_mode
        self._version = 0  # bumped on ratchet: old jits are stale
        self._jits = {}

    def adopt(self, replayer: "GeometryReplayer"):
        """Take over a warmed ``GeometryReplayer``'s recipe and ratcheted
        floors (the replayer keeps its own floor dicts — they are NOT
        written back to the recorded manager).  Invalidates compiled
        replays traced under older floors."""
        self.oplog = list(replayer.oplog)
        self.cap_floors = dict(replayer.cap_floors)
        self.slab_floors = dict(replayer.slab_floors)
        self.grid_floors = dict(replayer.grid_floors)
        self.join_floors = dict(replayer.join_floors)
        self._version += 1
        self._jits = {}
        return self

    # -- traceable core ----------------------------------------------------
    def trace(self, coords_padded, n_valid, feats_padded=None):
        """Traceable: call inside your own jit to fuse the coordinate phase
        into a training step.  Returns (Geometry, padded_feats|None, ok)."""
        from .manager import CoordinateManager

        mgr = CoordinateManager.replay(
            self.oplog,
            coords_padded,
            cap_floors=self.cap_floors,
            slab_floors=self.slab_floors,
            grid_floors=self.grid_floors,
            join_floors=self.join_floors,
            traced=True,
            n_valids=[n_valid],
        )
        geo = mgr.export_geometry()
        fp = None
        if feats_padded is not None:
            fp = mgr.reduce_features(
                geo.entry_key, feats_padded, self.quantization_mode
            )
        return geo, fp, mgr.traced_ok()

    # -- per-batch drivers ---------------------------------------------
    def _bucket(self, n):
        from .manager import bucket_capacity

        return bucket_capacity(n)

    def run(self, coordinates, features=None):
        """One jitted dispatch; returns (Geometry, padded_feats, ok_device).
        Sync ``ok`` later (e.g. with the loss) and call ``recover()`` if it
        comes back False."""
        import numpy as _np

        coords = _np.asarray(coordinates)
        n = coords.shape[0]
        cap = self._bucket(n)
        coords_p = _np.zeros((cap, coords.shape[1]), _np.int32)
        coords_p[:n] = coords
        args = [jnp.asarray(coords_p), jnp.asarray(n, jnp.int32)]
        fshape = None
        if features is not None:
            f = _np.asarray(features)
            f_p = _np.zeros((cap,) + f.shape[1:], f.dtype)
            f_p[:n] = f
            args.append(jnp.asarray(f_p))
            fshape = (f.shape[1:], f.dtype.str)
        key = (cap, coords.shape[1], fshape, self._version)
        fn = self._jits.get(key)
        if fn is None:
            # jit a FRESH closure, not the bound method: bound methods of
            # the same instance compare equal, so jax's jit cache would
            # resurrect an executable traced with PRE-ratchet floors after
            # recover() — the floor checks would then fail forever and every
            # batch would silently take the slow sync-replay path.
            trace = self.trace
            fn = jax.jit(lambda *a: trace(*a))
            self._jits[key] = fn
        if features is None:
            geo, fp, ok = fn(args[0], args[1])
        else:
            geo, fp, ok = fn(*args)
        return geo, fp, ok

    def recover(self, coordinates, features=None):
        """Sync-replay fallback for a failed batch: ratchets the violated
        floors and invalidates the compiled programs.

        Ratchets OVERSHOOT the measured need (spans ×1.3 before ladder
        quantization): a violation means geometry statistics drifted past
        the settled floors, and similar clouds will follow — creeping up
        one ladder rung per violating batch would recompile every time.
        """
        from .manager import CoordinateManager

        mgr = CoordinateManager.replay(
            self.oplog,
            coordinates,
            cap_floors=self.cap_floors,
            slab_floors=self.slab_floors,
            grid_floors=self.grid_floors,
            join_floors=self.join_floors,
            deferred=True,
            overprovision=1.3,
        )
        self.cap_floors.update(mgr._cap_floors)
        self.slab_floors.update(mgr._slab_floors)
        self.grid_floors.update(mgr._grid_floors)
        self.join_floors.update(mgr._join_floors)
        self._version += 1
        geo = mgr.export_geometry()
        fp = None
        if features is not None:
            fp = mgr.reduce_features(
                geo.entry_key, features, self.quantization_mode
            )
        return geo, fp

    def __call__(self, coordinates, features=None):
        """(Geometry, padded_feats) — checks ``ok`` immediately (one sync)
        and falls back transparently.  For the zero-extra-sync pattern use
        ``run()`` and check ``ok`` alongside your loss."""
        from .manager import UntraceableReplay

        try:
            geo, fp, ok = self.run(coordinates, features)
        except UntraceableReplay:
            return self.recover(coordinates, features)
        if not bool(ok):
            return self.recover(coordinates, features)
        return geo, fp


class GeometryReplayer:
    """Per-batch coordinate-phase replayer with shape-stability ratchets.

    Usage (fresh-geometry training)::

        x = ME.SparseTensor(feats0, coords0)
        _ = net(x)                                  # warm + record
        replayer = GeometryReplayer(x.coordinate_manager)

        for coords, feats in batches:
            mgr = replayer(coords)                  # coordinate phase only
            geo = mgr.export_geometry()
            fp = mgr.reduce_features(geo.entry_key, feats)
            loss = jitted_step(model, fp, geo)      # compile-cache hit

    The replayer carries capacity and slab-rung floors forward so that leaf
    shapes and static aux stay identical across batches once the ratchets
    settle — after the first couple of batches the jitted step stops
    retracing entirely.
    """

    def __init__(self, recorded_manager):
        self.oplog = recorded_manager.oplog()
        self.cap_floors = dict(recorded_manager._cap_floors)
        self.slab_floors = dict(recorded_manager._slab_floors)
        self.grid_floors = dict(recorded_manager._grid_floors)
        self.join_floors = dict(recorded_manager._join_floors)

    def __call__(self, coordinates, tensor_stride=1):
        from .manager import CoordinateManager

        mgr = CoordinateManager.replay(
            self.oplog,
            coordinates,
            tensor_stride,
            cap_floors=self.cap_floors,
            slab_floors=self.slab_floors,
            grid_floors=self.grid_floors,
            join_floors=self.join_floors,
        )
        self.cap_floors.update(mgr._cap_floors)
        self.slab_floors.update(mgr._slab_floors)
        self.grid_floors.update(mgr._grid_floors)
        self.join_floors.update(mgr._join_floors)
        return mgr
