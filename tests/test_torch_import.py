"""Reference-checkpoint import/export (utils/torch_import.py)."""

import numpy as np
import jax.numpy as jnp
import pytest
from flax import nnx

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.models import MinkUNet14A, ResNet14
from minkowskiengine_tpu.utils.torch_import import (
    export_reference_state_dict,
    load_reference_state_dict,
    reference_named_params,
)


def test_minkunet_reference_names():
    net = MinkUNet14A(3, 5, D=3, rngs=nnx.Rngs(0))
    names = set(reference_named_params(net))
    for expect in (
        "conv0p1s1.kernel",
        "bn0.bn.weight",
        "bn0.bn.running_mean",
        "block1.0.conv1.kernel",
        "block1.0.norm1.bn.bias",
        "convtr4p16s2.kernel",
        "bntr4.bn.running_var",
        "final.kernel",
        "final.bias",
    ):
        assert expect in names, expect


def test_resnet_reference_names():
    net = ResNet14(3, 4, D=3, rngs=nnx.Rngs(0))
    names = set(reference_named_params(net))
    assert "conv1.0.kernel" in names
    assert "conv1.1.weight" in names  # InstanceNorm, unwrapped names
    assert "final.linear.weight" in names
    assert any(".downsample.0.kernel" in n for n in names)
    assert any(".downsample.1.bn.weight" in n for n in names)


@pytest.mark.slow
def test_round_trip_restores_weights_and_outputs():
    net_a = MinkUNet14A(3, 5, D=3, rngs=nnx.Rngs(0))
    net_b = MinkUNet14A(3, 5, D=3, rngs=nnx.Rngs(7))
    sd = export_reference_state_dict(net_a)
    # reference-format shapes: BN params are (C,), linear (out, in)
    assert sd["bn0.bn.weight"].ndim == 1
    assert sd["bn0.bn.num_batches_tracked"].shape == ()
    report = load_reference_state_dict(net_b, sd)
    assert not report["missing"]
    for key, leaf_b in reference_named_params(net_b).items():
        leaf_a = reference_named_params(net_a)[key]
        np.testing.assert_array_equal(
            np.asarray(leaf_a["var"][...]), np.asarray(leaf_b["var"][...])
        )

    rng = np.random.RandomState(0)
    coords = np.unique(
        np.concatenate(
            [rng.randint(0, 2, (300, 1)), rng.randint(0, 12, (300, 3))], 1
        ).astype(np.int32),
        axis=0,
    )
    feats = jnp.asarray(rng.randn(len(coords), 3).astype(np.float32))
    net_a.eval_mode = True
    net_b.eval_mode = True
    ya = net_a(ME.SparseTensor(feats, jnp.asarray(coords)))
    yb = net_b(ME.SparseTensor(feats, jnp.asarray(coords)))
    np.testing.assert_allclose(
        np.asarray(ya.F), np.asarray(yb.F), rtol=1e-6, atol=1e-6
    )


@pytest.mark.slow
def test_torch_tensor_inputs():
    torch = pytest.importorskip("torch")
    net_a = ResNet14(3, 4, D=3, rngs=nnx.Rngs(0))
    net_b = ResNet14(3, 4, D=3, rngs=nnx.Rngs(3))
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_reference_state_dict(net_a).items()
    }
    report = load_reference_state_dict(net_b, sd)
    assert not report["missing"]
    w_a = np.asarray(net_a.final.weight[...])
    w_b = np.asarray(net_b.final.weight[...])
    np.testing.assert_array_equal(w_a, w_b)


def test_strict_errors():
    net = ResNet14(3, 4, D=3, rngs=nnx.Rngs(0))
    sd = export_reference_state_dict(net)
    sd["not.a.key"] = np.zeros((3,), np.float32)
    with pytest.raises(KeyError):
        load_reference_state_dict(net, sd)
    del sd["not.a.key"]
    bad = dict(sd)
    bad["final.linear.weight"] = np.zeros((1, 1), np.float32)
    with pytest.raises(ValueError):
        load_reference_state_dict(net, bad)
    partial = {"final.linear.weight": sd["final.linear.weight"]}
    with pytest.raises(KeyError):
        load_reference_state_dict(net, partial)
    report = load_reference_state_dict(net, partial, strict=False)
    assert report["loaded"] == ["final.linear.weight"]
