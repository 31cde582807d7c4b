"""SparseTensor basics (reference: examples/sparse_tensor_basic.py):
construction, quantization modes, TensorField round trips, dense export.

Run: python examples/sparse_tensor_basic.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

if "--cpu" in _sys.argv:  # the axon TPU plugin ignores JAX_PLATFORMS
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import minkowskiengine_tpu as ME
from minkowskiengine_tpu.utils import batched_coordinates, sparse_quantize


def main():
    # 1. quantize a float point cloud on the host (native C++ engine)
    rng = np.random.RandomState(0)
    pts = rng.rand(1000, 3) * 5
    feats = rng.randn(1000, 3).astype(np.float32)
    coords, qfeats = sparse_quantize(pts, features=feats, quantization_size=0.2)
    print("quantized:", coords.shape, qfeats.shape)

    # 2. batch several clouds
    bcoords = batched_coordinates([coords, coords[:100]])
    print("batched:", bcoords.shape, "batches:", np.unique(bcoords[:, 0]))

    # 3. SparseTensor with duplicate-coordinate feature averaging
    dup = np.array([[0, 0, 0], [0, 0, 0], [0, 1, 1]], np.int32)
    f = np.array([[1.0], [3.0], [5.0]], np.float32)
    avg = ME.SparseTensor(
        f, dup,
        quantization_mode=ME.SparseTensorQuantizationMode.UNWEIGHTED_AVERAGE,
    )
    print("averaged duplicates:", np.asarray(avg.F).ravel())

    # 4. TensorField → sparse → slice round trip
    tf = ME.TensorField(feats, np.concatenate(
        [np.zeros((1000, 1), np.float32), pts.astype(np.float32) / 0.2], axis=1
    ))
    s = tf.sparse()
    back = s.slice(tf)
    print("field:", tf.shape, "→ sparse:", s.shape, "→ slice:", back.shape)

    # 5. dense export
    small = ME.SparseTensor(
        np.ones((3, 2), np.float32),
        np.array([[0, 0, 0], [0, 1, 2], [0, 2, 1]], np.int32),
    )
    dense, min_c, stride = small.dense()
    print("dense:", dense.shape)

    # 6. arithmetic across different coordinate sets (union semantics)
    mgr = ME.CoordinateManager(D=2)
    a = ME.SparseTensor(np.ones((2, 1), np.float32),
                        np.array([[0, 0, 0], [0, 1, 0]], np.int32),
                        coordinate_manager=mgr)
    b = ME.SparseTensor(np.ones((2, 1), np.float32) * 2,
                        np.array([[0, 0, 0], [0, 2, 2]], np.int32),
                        coordinate_manager=mgr)
    c = a + b
    print("union add:", {tuple(x): float(v) for x, v in
                         zip(np.asarray(c.C), np.asarray(c.F)[:, 0])})


if __name__ == "__main__":
    main()
