"""Convolution fundamentals: strided conv, transposed conv (generative),
and convolution on user-specified output coordinates
(reference: examples/convolution.py).

Run: python examples/convolution.py [--cpu]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import argparse

import numpy as np


def get_random_coords(dimension=2, tensor_stride=2, seed=0):
    """Random coordinates with the given tensor stride
    (reference: examples/convolution.py:get_random_coords)."""
    import minkowskiengine_tpu as ME

    rng = np.random.RandomState(seed)
    coords = np.floor(
        np.concatenate(
            [rng.rand(10, 1) * 2, rng.rand(10, dimension) * 5], axis=1
        )
    ).astype(np.int32)
    coords = ME.utils.sparse_quantize(coords)
    coords = np.asarray(coords).copy()
    coords[:, 1:] *= tensor_stride
    return coords, tensor_stride


def print_sparse_tensor(tensor):
    for c, f in zip(
        np.asarray(tensor.C), np.asarray(tensor.F)
    ):
        print(f"  Coordinate {c} : Feature {np.round(f, 3)}")


def conv():
    from flax import nnx

    import minkowskiengine_tpu as ME
    from common import data_loader

    in_channels, out_channels, D = 2, 3, 2
    coords, feats, _ = data_loader(in_channels, batch_size=1)

    # strided convolution: output coordinates are the stride-2 grid
    x = ME.SparseTensor(features=feats, coordinates=coords)
    conv = ME.MinkowskiConvolution(
        in_channels, out_channels, kernel_size=3, stride=2, bias=False,
        dimension=D, rngs=nnx.Rngs(0),
    )
    y = conv(x)
    print("Input:")
    print_sparse_tensor(x)
    print("Output (stride-2 conv):")
    print_sparse_tensor(y)

    # transposed convolution GENERATES upsampled coordinates
    strided_coords, tensor_stride = get_random_coords()
    x2 = ME.SparseTensor(
        features=np.random.RandomState(1)
        .rand(len(strided_coords), in_channels)
        .astype(np.float32),
        coordinates=strided_coords,
        tensor_stride=tensor_stride,
    )
    conv_tr = ME.MinkowskiConvolutionTranspose(
        in_channels, out_channels, kernel_size=3, stride=2, bias=False,
        dimension=D, rngs=nnx.Rngs(0),
    )
    y2 = conv_tr(x2)
    print("\nInput (tensor stride 2):")
    print_sparse_tensor(x2)
    print("Convolution transpose output (tensor stride 1, generated coords):")
    print(f"  {y2.size} output sites from {x2.size} inputs")
    print_sparse_tensor(y2)


def conv_on_coords():
    """Convolution evaluated AT caller-chosen output coordinates — the
    reference's conv(input, coords) overload."""
    from flax import nnx

    import minkowskiengine_tpu as ME

    in_channels, out_channels, D = 2, 3, 2
    coords4, ts4 = get_random_coords(tensor_stride=4, seed=2)
    coords2, ts2 = get_random_coords(tensor_stride=2, seed=3)
    x = ME.SparseTensor(
        features=np.random.RandomState(2)
        .rand(len(coords4), in_channels)
        .astype(np.float32),
        coordinates=coords4,
        tensor_stride=ts4,
    )
    cm = x.coordinate_manager

    conv_tr = ME.MinkowskiConvolutionTranspose(
        in_channels, out_channels, kernel_size=3, stride=2, bias=False,
        dimension=D, rngs=nnx.Rngs(0),
    )

    # 1) default: generate the stride-2 coordinates
    out1 = conv_tr(x)
    print(f"\nconv_tr(x): generated {out1.size} coords at stride "
          f"{out1.tensor_stride}")

    # 2) evaluate at explicit raw coordinates
    out2 = conv_tr(x, coords2)
    print(f"conv_tr(x, coords): {out2.size} outputs at caller coords")

    # 3) evaluate at a pre-inserted coordinate map key
    key, _ = cm.insert_and_map(coords2, tensor_stride=2)
    out3 = conv_tr(x, key)
    print(f"conv_tr(x, key): {out3.size} outputs at key {key}")
    np.testing.assert_allclose(
        np.asarray(out2.F), np.asarray(out3.F), rtol=1e-5, atol=1e-6
    )
    print("coords overload == key overload ✓")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    conv()
    conv_on_coords()
