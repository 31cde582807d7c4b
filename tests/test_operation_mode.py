"""SHARE_COORDINATE_MANAGER operation mode + mixed-coordinate arithmetic
(mirrors /root/reference/tests/python/sparse_tensor.py::test_operation_mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import minkowskiengine_tpu as ME


@pytest.fixture
def shared_mode():
    ME.set_sparse_tensor_operation_mode(
        ME.SparseTensorOperationMode.SHARE_COORDINATE_MANAGER
    )
    yield
    ME.clear_global_coordinate_manager()
    ME.set_sparse_tensor_operation_mode(
        ME.SparseTensorOperationMode.SEPARATE_COORDINATE_MANAGER
    )


def test_operation_mode(shared_mode):
    rng = np.random.RandomState(0)
    coords = np.unique(
        np.concatenate(
            [rng.randint(0, 2, (200, 1)), rng.randint(0, 10, (200, 3))], 1
        ).astype(np.int32),
        axis=0,
    )
    A = ME.SparseTensor(
        jnp.asarray(rng.rand(len(coords), 2).astype(np.float32)),
        jnp.asarray(coords),
    )
    B = ME.SparseTensor(
        jnp.asarray(rng.rand(4, 2).astype(np.float32)),
        jnp.asarray(
            np.array(
                [[0, 0, 0, 0], [1, 1, 1, 1], [0, 1, 0, 1], [1, 0, 1, 0]],
                np.int32,
            )
        ),
    )
    assert A.coordinate_manager is B.coordinate_manager

    # mixed-coordinate arithmetic goes through the union map; gradients of
    # sum(C.F) w.r.t. both inputs are all ones (reference checks the same)
    def loss(fa, fb):
        A2 = ME.SparseTensor(
            fa, coordinate_map_key=A.coordinate_map_key,
            coordinate_manager=A.coordinate_manager,
        )
        B2 = ME.SparseTensor(
            fb, coordinate_map_key=B.coordinate_map_key,
            coordinate_manager=B.coordinate_manager,
        )
        return jnp.sum((A2 + B2).F)

    ga, gb = jax.grad(loss, argnums=(0, 1))(A.F, B.F)
    assert bool(jnp.all(ga == 1.0))
    assert bool(jnp.all(gb == 1.0))

    for op in ("__sub__", "__mul__", "__truediv__"):
        C = getattr(A, op)(B)
        assert bool(jnp.isfinite(C.F).all()) or op == "__truediv__"

    # in-place ops against a tensor on the SAME coordinates
    D = ME.SparseTensor(
        jnp.asarray(rng.rand(len(coords), 2).astype(np.float32) + 1.0),
        coordinate_map_key=A.coordinate_map_key,
        coordinate_manager=A.coordinate_manager,
    )
    before = np.asarray(A.F)
    A -= D
    A *= D
    A /= D
    assert A.F.shape == before.shape
    assert not np.allclose(np.asarray(A.F), before)


def test_global_manager_cleared(shared_mode):
    x = ME.SparseTensor(
        jnp.ones((2, 1), jnp.float32),
        jnp.asarray(np.array([[0, 0, 0, 0], [0, 1, 1, 1]], np.int32)),
    )
    assert ME.global_coordinate_manager() is x.coordinate_manager
    ME.clear_global_coordinate_manager()
    assert ME.global_coordinate_manager() is None
