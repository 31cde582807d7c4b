"""Tensor parallelism: GSPMD column-parallel conv GEMMs over a model axis.

Beyond-reference capability (SURVEY §2.3: the reference has no TP).  These
tests run on the 8-virtual-device CPU mesh from conftest.py and assert that
sharded execution is numerically identical to single-device execution, for
forward and for a full gradient step, on both 1-D tp and 2-D dp×tp meshes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.models import MinkUNet14A
from minkowskiengine_tpu.parallel import apply_tensor_parallelism, make_tp_mesh


def cloud(seed, n=300, hi=20):
    rng = np.random.RandomState(seed)
    c = np.unique(
        np.concatenate(
            [rng.randint(0, 2, (n, 1)), rng.randint(0, hi, (n, 3))], axis=1
        ).astype(np.int32),
        axis=0,
    )
    return c, rng.randn(len(c), 3).astype(np.float32)


@pytest.fixture(autouse=True)
def _restore_conv_path():
    yield
    from minkowskiengine_tpu.config import set_force_xla_conv

    set_force_xla_conv(False)


class TestTensorParallel:
    @pytest.mark.slow
    def test_forward_matches_single_device(self):
        c, f = cloud(0)
        x = ME.SparseTensor(f, c)
        net = MinkUNet14A(3, 4, D=3, rngs=nnx.Rngs(0))
        net.eval_mode = True
        ref = np.asarray(net(x).padded_features)

        mesh = make_tp_mesh(tp=8)
        assert mesh.axis_names == ("model",)
        apply_tensor_parallelism(net, mesh)
        mgr, key = x.coordinate_manager, x.coordinate_map_key

        @nnx.jit
        def fwd(net, feats):
            xt = ME.SparseTensor(
                feats, coordinate_map_key=key, coordinate_manager=mgr
            )
            return net(xt).padded_features

        out = np.asarray(fwd(net, x.padded_features))
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    def test_param_shardings_applied(self):
        net = ME.MinkowskiConvolution(
            8, 16, kernel_size=3, dimension=3, rngs=nnx.Rngs(0)
        )
        mesh = make_tp_mesh(tp=8)
        apply_tensor_parallelism(net, mesh)
        sh = net.kernel[...].sharding
        assert isinstance(sh, jax.sharding.NamedSharding)
        assert sh.spec == jax.sharding.PartitionSpec(None, None, "model")

    def test_indivisible_channels_stay_replicated(self):
        net = ME.MinkowskiConvolution(
            3, 6, kernel_size=3, dimension=3, rngs=nnx.Rngs(0)
        )  # 6 % 8 != 0
        mesh = make_tp_mesh(tp=8)
        apply_tensor_parallelism(net, mesh)
        assert net.kernel[...].sharding.spec == jax.sharding.PartitionSpec()

    @pytest.mark.slow
    def test_training_step_matches_single_device(self):
        import optax

        c, f = cloud(1)
        x = ME.SparseTensor(f, c)

        def build():
            net = MinkUNet14A(3, 4, D=3, rngs=nnx.Rngs(0))
            net.eval_mode = True
            _ = net(x)
            opt = nnx.Optimizer(net, optax.sgd(1e-2), wrt=nnx.Param)
            return net, opt

        mgr, key = x.coordinate_manager, x.coordinate_map_key
        labels = np.random.RandomState(0).randint(0, 4, x.capacity)
        labels = jnp.asarray(labels)

        def loss_fn(model, feats):
            xt = ME.SparseTensor(
                feats, coordinate_map_key=key, coordinate_manager=mgr
            )
            logits = model(xt).padded_features
            mask = xt.valid_row_mask.astype(jnp.float32)
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            )
            return jnp.sum(losses * mask) / jnp.sum(mask)

        @nnx.jit
        def step(model, opt, feats):
            loss, grads = nnx.value_and_grad(loss_fn)(model, feats)
            opt.update(model, grads)
            return loss

        net_ref, opt_ref = build()
        l_ref = float(step(net_ref, opt_ref, x.padded_features))

        net_tp, opt_tp = build()
        mesh = make_tp_mesh(tp=8)
        apply_tensor_parallelism(net_tp, mesh)
        l_tp = float(step(net_tp, opt_tp, x.padded_features))

        assert abs(l_ref - l_tp) < 2e-5
        # parameters after one step agree too
        pr = nnx.to_flat_state(nnx.state(net_ref, nnx.Param))
        pt = nnx.to_flat_state(nnx.state(net_tp, nnx.Param))
        for (pa, va), (pb, vb) in zip(pr, pt):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(va.get_value()),
                np.asarray(vb.get_value()),
                rtol=2e-4,
                atol=1e-4,
            )

    @pytest.mark.slow
    def test_2d_mesh_dp_times_tp(self):
        """dp×tp: data sharding composes with column-parallel weights."""
        c, f = cloud(2)
        x = ME.SparseTensor(f, c)
        net = MinkUNet14A(3, 4, D=3, rngs=nnx.Rngs(0))
        net.eval_mode = True
        ref = np.asarray(net(x).padded_features)

        mesh = make_tp_mesh(tp=4, dp=2)
        assert mesh.axis_names == ("data", "model")
        apply_tensor_parallelism(net, mesh)
        mgr, key = x.coordinate_manager, x.coordinate_map_key

        @nnx.jit
        def fwd(net, feats):
            xt = ME.SparseTensor(
                feats, coordinate_map_key=key, coordinate_manager=mgr
            )
            return net(xt).padded_features

        out = np.asarray(fwd(net, x.padded_features))
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
