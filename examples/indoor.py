"""Indoor semantic segmentation on a room scan
(reference: examples/indoor.py — MinkUNet34C on ScanNet rooms).

Full inference pipeline: load a point cloud (a real ``.ply`` via
``--file_name``, or a deterministic synthetic room scan — this environment
has no network egress for the reference's ``1.ply``/``weights.pth``
downloads), normalize colors, build a ``TensorField`` at 2 cm voxels with
``UNWEIGHTED_AVERAGE`` quantization, run MinkUNet34C, slice the voxel
predictions back onto the raw points, and write a color-coded prediction
cloud next to the input.

Run: python examples/indoor.py [--file_name scan.ply] [--voxel_size 0.02]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CLASS_LABELS = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
)

# one distinct color per class (ScanNet-style palette, rgb 0-255)
CLASS_COLORS = np.array(
    [
        (174, 199, 232), (152, 223, 138), (31, 119, 180), (255, 187, 120),
        (188, 189, 34), (140, 86, 75), (255, 152, 150), (214, 39, 40),
        (197, 176, 213), (148, 103, 189), (196, 156, 148), (23, 190, 207),
        (247, 182, 210), (219, 219, 141), (255, 127, 14), (158, 218, 229),
        (44, 160, 44), (112, 128, 144), (227, 119, 194), (82, 84, 163),
    ],
    dtype=np.float64,
)


def read_ply(path):
    """Minimal PLY reader (ascii / binary_little_endian, x y z [+colors]).

    Returns (points (N,3) f64, colors (N,3) f64 in [0,1])."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path} is not a PLY file")
        fmt, n_vertex, props, line = None, None, [], b""
        in_vertex = False
        while line.strip() != b"end_header":
            line = f.readline()
            t = line.strip().split()
            if not t:
                continue
            if t[0] == b"format":
                fmt = t[1].decode()
            elif t[0] == b"element":
                in_vertex = t[1] == b"vertex"
                if in_vertex:
                    n_vertex = int(t[2])
            elif t[0] == b"property" and in_vertex:
                props.append((t[2].decode(), t[1].decode()))
        np_types = {
            "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
            "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
            "short": "i2", "ushort": "u2", "int": "i4", "int32": "i4",
            "uint": "u4", "uint32": "u4",
        }
        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n_vertex)
            arr = {name: data[:, i] for i, (name, _) in enumerate(props)}
        elif fmt == "binary_little_endian":
            dtype = np.dtype([(n, "<" + np_types[t]) for n, t in props])
            raw = np.frombuffer(f.read(n_vertex * dtype.itemsize), dtype)
            arr = {name: raw[name].astype(np.float64) for name, _ in props}
        else:
            raise ValueError(f"unsupported PLY format {fmt}")
    pts = np.stack([arr["x"], arr["y"], arr["z"]], axis=1)
    if "red" in arr:
        colors = np.stack([arr["red"], arr["green"], arr["blue"]], axis=1)
        if colors.max() > 1.0:
            colors = colors / 255.0
    else:
        colors = np.full_like(pts, 0.5)
    return pts, colors


def write_ply(path, points, colors_0_255):
    """ASCII PLY writer (points + uint8 colors)."""
    c = np.clip(colors_0_255, 0, 255).astype(np.uint8)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(points)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for p, col in zip(points, c):
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
                    f"{col[0]} {col[1]} {col[2]}\n")


def synthetic_room(seed=0):
    """Room scan with height/surface-coded colors (no network for 1.ply)."""
    from minkowskiengine_tpu.utils.datasets import make_room_scan

    pts = make_room_scan(n_points=200_000, extent=(4.0, 5.0, 2.5), seed=seed)
    # colors loosely encode surface identity: height + horizontal position
    colors = np.stack(
        [
            pts[:, 2] / 2.5,
            0.5 + 0.5 * np.sin(pts[:, 0] * 2.1),
            0.5 + 0.5 * np.cos(pts[:, 1] * 1.7),
        ],
        axis=1,
    ).astype(np.float64)
    return pts, colors


def normalize_color(color):
    """[0,1] colors -> [-0.5, 0.5] (the reference's normalization,
    examples/indoor.py:normalize_color)."""
    return (color - 0.5).astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--file_name", type=str, default=None,
                        help=".ply scan; synthetic room when omitted")
    parser.add_argument("--voxel_size", type=float, default=0.02)
    parser.add_argument("--out", type=str, default="indoor_prediction.ply")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    from common import enable_compilation_cache

    enable_compilation_cache()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from flax import nnx

    import minkowskiengine_tpu as ME
    from minkowskiengine_tpu.models import MinkUNet34C

    if args.file_name:
        points, colors = read_ply(args.file_name)
        print(f"loaded {args.file_name}: {len(points)} points")
    else:
        points, colors = synthetic_room()
        print(f"synthetic room scan: {len(points)} points "
              "(no network for the reference's 1.ply)")

    # The reference loads pretrained ScanNet weights (weights.pth download);
    # offline we run the same architecture randomly initialized — the
    # pipeline (field -> sparse -> net -> slice -> colors) is identical.
    model = MinkUNet34C(3, 20, D=3, rngs=nnx.Rngs(0))
    model.eval_mode = True

    t0 = time.perf_counter()
    in_field = ME.TensorField(
        features=normalize_color(colors),
        coordinates=ME.utils.batched_coordinates(
            [points / args.voxel_size], dtype=np.float32
        ),
        quantization_mode=ME.SparseTensorQuantizationMode.UNWEIGHTED_AVERAGE,
    )
    sinput = in_field.sparse()
    print(f"voxelized @ {args.voxel_size*100:.0f} cm: {sinput.size} voxels "
          f"({time.perf_counter()-t0:.2f}s)")

    t0 = time.perf_counter()
    soutput = model(sinput)
    out_field = soutput.slice(in_field)
    logits = np.asarray(out_field.features)
    print(f"MinkUNet34C forward + slice: {time.perf_counter()-t0:.2f}s")

    pred = logits.argmax(1)
    counts = np.bincount(pred, minlength=20)
    print("predicted class histogram (top 5):")
    for cls in np.argsort(counts)[::-1][:5]:
        print(f"  {CLASS_LABELS[cls]:>16s}: {counts[cls]:7d} points "
              f"({100.0*counts[cls]/len(pred):.1f}%)")

    write_ply(args.out, points, CLASS_COLORS[pred])
    print(f"wrote color-coded prediction cloud -> {args.out}")


if __name__ == "__main__":
    main()
