"""Model summary utility (reference: MinkowskiEngine/utils/summary.py:33-47
— per-module parameter counts, pruned-weight sparsity ratios, and
coordinate-map occupancy hints)."""

from __future__ import annotations

import numpy as np
from flax import nnx


def _leaf_value(leaf):
    """Extract the array from an nnx Variable/VariableState without hitting
    the deprecated ``.value`` accessor."""
    if isinstance(leaf, nnx.Variable):
        return leaf[...]
    if hasattr(leaf, "get_value"):
        return leaf.get_value()
    return leaf


def _zero_fraction(value) -> float:
    """Fraction of exactly-zero entries — the reference reports this for
    weight-pruned modules (pruned_weight_sparsity_string)."""
    try:
        arr = np.asarray(value)
        if arr.size == 0:
            return 0.0
        return float(np.mean(arr == 0))
    except Exception:
        return 0.0


def summary(model, sample_input=None, depth: int = 2) -> str:
    """Print a per-module summary of an nnx model tree.

    Groups variables by the first ``depth`` path segments; reports
    trainable (``nnx.Param``) vs non-trainable counts per module and the
    weight zero-fraction (sparsity) of each group.  With ``sample_input``
    (a SparseTensor), runs a forward pass and appends coordinate-map
    occupancy (valid rows / padded capacity) for every map the model
    touched — the analogue of the reference's hash-occupancy hints.
    """
    state = nnx.state(model)
    flat = (
        nnx.to_flat_state(state)
        if hasattr(nnx, "to_flat_state")
        else state.flat_state()
    )

    groups: dict[str, dict] = {}
    total_train = 0
    total_other = 0
    for path, leaf in flat:
        value = _leaf_value(leaf)
        n = int(np.prod(value.shape)) if hasattr(value, "shape") else 1
        trainable = isinstance(leaf, (nnx.Param,)) or (
            getattr(leaf, "type", None) is nnx.Param
        )
        key = "/".join(str(p) for p in path[:depth]) or "(root)"
        g = groups.setdefault(
            key, {"train": 0, "other": 0, "zeros": 0, "size": 0}
        )
        if trainable:
            g["train"] += n
            total_train += n
        else:
            g["other"] += n
            total_other += n
        g["zeros"] += int(round(_zero_fraction(value) * n))
        g["size"] += n

    lines = [
        f"{'module':44s} {'params':>12s} {'buffers':>10s} {'zero%':>7s}",
        "-" * 76,
    ]
    for key in sorted(groups):
        g = groups[key]
        zero_pct = 100.0 * g["zeros"] / max(g["size"], 1)
        lines.append(
            f"{key:44s} {g['train']:>12,} {g['other']:>10,} {zero_pct:>6.1f}%"
        )
    lines.append("-" * 76)
    lines.append(f"{'total trainable params':44s} {total_train:>12,}")
    lines.append(f"{'total non-trainable (BN stats etc.)':44s} {total_other:>12,}")
    lines.append(
        f"{'total':44s} {total_train + total_other:>12,}"
    )

    if sample_input is not None:
        try:
            out = model(sample_input)
            mgr = sample_input.coordinate_manager
            lines.append("")
            lines.append(
                f"{'coordinate map (tensor stride)':44s} {'rows':>10s} "
                f"{'capacity':>10s} {'occ%':>7s}"
            )
            lines.append("-" * 76)
            for raw in mgr.get_keys():
                cmap = mgr._maps[raw]
                occ = 100.0 * cmap.size / max(cmap.capacity, 1)
                lines.append(
                    f"{str(raw):44s} {cmap.size:>10,} {cmap.capacity:>10,} "
                    f"{occ:>6.1f}%"
                )
            lines.append(
                f"output: {out.size:,} rows x {out.features.shape[1]} ch"
            )
        except Exception as e:  # keep the param table useful regardless
            lines.append(f"(forward-pass occupancy unavailable: {e!r})")

    out_str = "\n".join(lines)
    print(out_str)
    return out_str
