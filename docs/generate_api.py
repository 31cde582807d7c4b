"""Generate the markdown API reference under docs/api/ from docstrings.

Mirrors the reference's sphinx-autodoc page layout
(/root/reference/docs/index.rst sidebar: sparse tensor, convolution,
pooling, broadcast, pruning, interpolation, normalization, nonlinearity,
coordinate manager, utilities, misc) but emits plain markdown so no doc
toolchain is needed.

Run:  python docs/generate_api.py        # rewrites docs/api/*.md
"""

import inspect
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # doc build never needs the TPU

import minkowskiengine_tpu as ME  # noqa: E402
from minkowskiengine_tpu import utils  # noqa: E402
from minkowskiengine_tpu import parallel  # noqa: E402
from minkowskiengine_tpu import models  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "api")

# Page layout: (filename, title, intro, [object names resolved on ME.*
# unless the entry is an explicit object]).
PAGES = [
    (
        "sparse_tensor.md",
        "SparseTensor and TensorField",
        "The two tensor types. `SparseTensor` holds quantized integer "
        "coordinates; `TensorField` holds continuous coordinates and "
        "converts to/from sparse tensors (`sparse()`, `splat()`, "
        "`slice`).",
        [
            "SparseTensor",
            "TensorField",
            "SparseTensorOperationMode",
            "SparseTensorQuantizationMode",
            "set_sparse_tensor_operation_mode",
            "sparse_tensor_operation_mode",
            "clear_global_coordinate_manager",
            "global_coordinate_manager",
            "set_global_coordinate_manager",
        ],
    ),
    (
        "coords.md",
        "Coordinate management",
        "Coordinate maps, kernel maps, and the manager that caches them. "
        "Coordinate ops run on host and are cached; feature ops are "
        "traced. See docs/PERFORMANCE.md for the two-phase model.",
        [
            "CoordinateManager",
            "CoordinateMapKey",
            "CoordsManager",
            "KernelGenerator",
            "KernelRegion",
            "RegionType",
            "CoordinateMapType",
            "GPUMemoryAllocatorType",
            "MinkowskiAlgorithm",
        ],
    ),
    (
        "convolution.md",
        "Convolution",
        "Sparse convolution modules. On TPU the generalized sparse "
        "convolution runs as gather -> one-hot MXU contraction -> "
        "scatter-free combine (Pallas slab kernels), or as a dense XLA "
        "conv when the cost model prefers it.",
        [
            "MinkowskiConvolution",
            "MinkowskiConvolutionTranspose",
            "MinkowskiGenerativeConvolutionTranspose",
            "MinkowskiChannelwiseConvolution",
            "MinkowskiConvolutionFunction",
            "MinkowskiConvolutionTransposeFunction",
        ],
    ),
    (
        "pooling.md",
        "Pooling",
        "Local, global, and direct pooling. Global ops accept a "
        "SparseTensor or a TensorField, as in the reference.",
        [
            "MinkowskiSumPooling",
            "MinkowskiAvgPooling",
            "MinkowskiMaxPooling",
            "MinkowskiPoolingTranspose",
            "MinkowskiGlobalPooling",
            "MinkowskiGlobalSumPooling",
            "MinkowskiGlobalAvgPooling",
            "MinkowskiGlobalMaxPooling",
            "PoolingMode",
            "MinkowskiLocalPoolingFunction",
            "MinkowskiLocalPoolingTransposeFunction",
            "MinkowskiGlobalPoolingFunction",
            "MinkowskiDirectMaxPoolingFunction",
        ],
    ),
    (
        "broadcast_prune_union.md",
        "Broadcast, pruning, union, interpolation",
        "",
        [
            "MinkowskiBroadcast",
            "MinkowskiBroadcastAddition",
            "MinkowskiBroadcastMultiplication",
            "MinkowskiBroadcastConcatenation",
            "MinkowskiPruning",
            "MinkowskiUnion",
            "MinkowskiInterpolation",
            "MinkowskiInterpolationFunction",
            "MinkowskiPruningFunction",
            "MinkowskiUnionFunction",
        ],
    ),
    (
        "normalization.md",
        "Normalization",
        "Masked batch norm over valid rows; SyncBN reduces statistics "
        "with `psum` across the device mesh.",
        [
            "MinkowskiBatchNorm",
            "MinkowskiSyncBatchNorm",
            "MinkowskiInstanceNorm",
            "MinkowskiInstanceNormFunction",
            "MinkowskiStableInstanceNorm",
        ],
    ),
    (
        "nonlinearity.md",
        "Nonlinearities and ops",
        "Elementwise module wrappers (all 30 reference classes) plus "
        "concatenation/linear ops.",
        [
            "MinkowskiReLU",
            "MinkowskiPReLU",
            "MinkowskiSELU",
            "MinkowskiCELU",
            "MinkowskiDropout",
            "MinkowskiAlphaDropout",
            "MinkowskiSoftmax",
            "MinkowskiSigmoid",
            "MinkowskiTanh",
            "MinkowskiAdaptiveLogSoftmaxWithLoss",
            "MinkowskiLinear",
            "cat",
            "mean",
            "var",
            "dense_coordinates",
            "to_sparse",
            "to_sparse_all",
            "SparseMinkowskiNetwork" if hasattr(ME, "SparseMinkowskiNetwork") else "MinkowskiNetwork",
        ],
    ),
    (
        "sparse_matrix.md",
        "Sparse matrix functions",
        "COO sparse-matrix multiply built on segment reductions.",
        [
            "spmm",
            "spmm_average",
            "MinkowskiSPMMFunction",
            "MinkowskiSPMMAverageFunction",
        ],
    ),
    (
        "utils.md",
        "Utilities",
        "Collation, quantization, gradcheck, initialization, summary, "
        "checkpointing (orbax), profiling, and the procedural dataset "
        "generators used by the benchmarks.",
        [
            ("utils.batched_coordinates", utils.batched_coordinates),
            ("utils.sparse_collate", utils.sparse_collate),
            ("utils.batch_sparse_collate", utils.batch_sparse_collate),
            ("utils.sparse_quantize", utils.sparse_quantize),
            ("utils.quantize_label", getattr(utils, "quantize_label", None)),
            ("utils.gradcheck", getattr(utils, "gradcheck", None)),
            ("utils.summary", getattr(utils, "summary", None)),
        ],
    ),
    (
        "parallel.md",
        "Parallelism",
        "Multi-device training over a `jax.sharding.Mesh`: replicated "
        "data parallel, per-device-geometry DDP, tensor parallelism, and "
        "spatial sharding of one large cloud (beyond-HBM scale axis; no "
        "reference precedent).",
        [
            ("parallel.make_data_parallel_step", getattr(parallel, "make_data_parallel_step", None)),
            ("parallel.make_per_device_geometry_step", getattr(parallel, "make_per_device_geometry_step", None)),
            ("parallel", parallel),
        ],
    ),
    (
        "models.md",
        "Models",
        "The model zoo: ResNet14/18/34/50, MinkUNet14/18/34/50 (+A/B/C/D "
        "variants), completion/VAE generative nets.",
        [("models", models)],
    ),
]


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return ""


def _doc(obj):
    d = inspect.getdoc(obj)
    return d or ""


def _emit_object(fh, name, obj):
    if obj is None:
        return
    if inspect.isclass(obj):
        fh.write(f"### `{name}`\n\n")
        init = vars(obj).get("__init__") or next(
            (vars(b).get("__init__") for b in obj.__mro__[1:-1] if vars(b).get("__init__")),
            None,
        )
        sig = _sig(init) if init else ""
        if sig:
            sig = sig.replace("(self, ", "(").replace("(self)", "()")
            fh.write(f"```python\n{name}{sig}\n```\n\n")
        doc = _doc(obj)
        if doc:
            fh.write(doc + "\n\n")
        # public methods with docstrings, declared on the class itself
        for mname, meth in sorted(vars(obj).items()):
            if mname.startswith("_") and mname != "__call__":
                continue
            if not callable(meth) and not isinstance(meth, property):
                continue
            target = meth.fget if isinstance(meth, property) else meth
            mdoc = _doc(target)
            if not mdoc or mdoc == "Call self as a function.":
                continue
            label = f"{name}.{mname}"
            msig = "" if isinstance(meth, property) else _sig(target)
            msig = msig.replace("(self, ", "(").replace("(self)", "()")
            fh.write(f"**`{label}{msig}`**" + ("  *(property)*" if isinstance(meth, property) else "") + "\n\n")
            fh.write(textwrap.indent(mdoc, "") + "\n\n")
    elif inspect.ismodule(obj):
        fh.write(f"### module `{name}`\n\n")
        doc = _doc(obj)
        if doc:
            fh.write(doc + "\n\n")
        for mname in sorted(getattr(obj, "__all__", dir(obj))):
            if mname.startswith("_"):
                continue
            member = getattr(obj, mname, None)
            if inspect.isclass(member) or inspect.isfunction(member):
                mdoc = (_doc(member).splitlines() or [""])[0]
                fh.write(f"- `{name}.{mname}` — {mdoc}\n")
        fh.write("\n")
    else:
        fh.write(f"### `{name}{_sig(obj)}`\n\n")
        doc = _doc(obj)
        if doc:
            fh.write(doc + "\n\n")


def main():
    os.makedirs(OUT, exist_ok=True)
    index_lines = [
        "# API reference",
        "",
        "Generated from docstrings by `python docs/generate_api.py` — do not",
        "edit the files in this directory by hand.",
        "",
    ]
    for fname, title, intro, entries in PAGES:
        path = os.path.join(OUT, fname)
        with open(path, "w") as fh:
            fh.write(f"# {title}\n\n")
            fh.write("<!-- generated by docs/generate_api.py -->\n\n")
            if intro:
                fh.write(intro + "\n\n")
            for entry in entries:
                if isinstance(entry, tuple):
                    name, obj = entry
                else:
                    name, obj = entry, getattr(ME, entry, None)
                    if obj is None:
                        print(f"  !! missing export: {entry}", file=sys.stderr)
                _emit_object(fh, name, obj)
        index_lines.append(f"- [{title}]({fname})")
        print(f"wrote {path}")
    with open(os.path.join(OUT, "index.md"), "w") as fh:
        fh.write("\n".join(index_lines) + "\n")
    print("wrote docs/api/index.md")


if __name__ == "__main__":
    main()
