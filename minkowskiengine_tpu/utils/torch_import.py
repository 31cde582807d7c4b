"""Load torch MinkowskiEngine checkpoints into minkowskiengine_tpu models.

The models in ``models/`` are weight-layout bit-matched to the reference
(same attribute names, same (K, Cin, Cout) kernel layout), so a reference
``state_dict`` maps 1:1 onto them modulo three container conventions:

* reference ``MinkowskiBatchNorm`` wraps ``torch.nn.BatchNorm1d`` as
  ``.bn`` → keys ``...bn.weight`` with (C,) shapes; ours holds (1, C)
  parameters directly,
* reference ``MinkowskiLinear`` wraps ``torch.nn.Linear`` as ``.linear``
  → ``...linear.weight`` is (out, in); ours is (in, out),
* reference ``nn.Sequential`` children are numeric keys (``block1.0``);
  our sequential containers hold a ``.layers`` list.

One recursive walker (``reference_named_params``) enumerates a model's
parameters UNDER THE REFERENCE NAMES with per-leaf convert functions;
import and export both consume it, so the two directions cannot drift.

Usage::

    sd = torch.load("weights.pth")          # or np arrays from anywhere
    report = load_reference_state_dict(net, sd)
    sd_back = export_reference_state_dict(net)   # torch-compatible names
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

__all__ = [
    "reference_named_params",
    "load_reference_state_dict",
    "export_reference_state_dict",
]


def _to_numpy(v):
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _leaf(variable, to_ref, from_ref):
    return {"var": variable, "to_ref": to_ref, "from_ref": from_ref}


def _ident_leaf(variable):
    return _leaf(variable, lambda a: a, lambda a: np.asarray(a))


def _squeeze_leaf(variable):
    """(1, C) parameter stored as (C,) on the reference side."""
    shape = tuple(variable[...].shape)
    return _leaf(
        variable,
        lambda a: a.reshape(-1),
        lambda a, _s=shape: np.asarray(a).reshape(_s),
    )


def reference_named_params(module, prefix: str = "") -> Dict[str, dict]:
    """{reference_name: leaf} for every parameter/buffer of ``module``,
    named and value-converted exactly as a reference state_dict would."""
    from flax import nnx

    from ..nn.conv import MinkowskiConvolutionBase
    from ..nn.norm import (
        MinkowskiBatchNorm,
        MinkowskiInstanceNorm,
        MinkowskiStableInstanceNorm,
    )
    from ..nn.ops import MinkowskiLinear

    out: Dict[str, dict] = {}
    p = prefix + "." if prefix else ""

    if isinstance(module, MinkowskiConvolutionBase):
        out[p + "kernel"] = _ident_leaf(module.kernel)
        if module.bias is not None:
            out[p + "bias"] = _squeeze_leaf(module.bias)
        return out
    if isinstance(module, MinkowskiBatchNorm):
        if module.weight is not None:
            out[p + "bn.weight"] = _squeeze_leaf(module.weight)
            out[p + "bn.bias"] = _squeeze_leaf(module.bias)
        if module.track_running_stats:
            out[p + "bn.running_mean"] = _ident_leaf(module.running_mean)
            out[p + "bn.running_var"] = _ident_leaf(module.running_var)
        return out
    if isinstance(module, (MinkowskiInstanceNorm, MinkowskiStableInstanceNorm)):
        out[p + "weight"] = _ident_leaf(module.weight)
        out[p + "bias"] = _ident_leaf(module.bias)
        return out
    if isinstance(module, MinkowskiLinear):
        out[p + "linear.weight"] = _leaf(
            module.weight, lambda a: a.T, lambda a: np.asarray(a).T
        )
        if module.bias is not None:
            out[p + "linear.bias"] = _squeeze_leaf(module.bias)
        return out

    # containers: our sequential wrappers hold .layers; reference
    # nn.Sequential children are bare indices
    layers = getattr(module, "layers", None)
    if layers is not None and not hasattr(module, "kernel"):
        for i, child in enumerate(layers):
            out.update(reference_named_params(child, f"{prefix}.{i}"
                                              if prefix else str(i)))
        return out

    from flax import nnx as _nnx

    for name, child in sorted(vars(module).items()):
        if name.startswith("_"):
            continue
        if isinstance(child, _nnx.Module):
            out.update(
                reference_named_params(child, p + name if prefix else name)
            )
        elif isinstance(child, (list, tuple, _nnx.List)):
            for i, sub in enumerate(child):
                if isinstance(sub, _nnx.Module):
                    out.update(
                        reference_named_params(
                            sub, f"{p}{name}.{i}" if prefix else f"{name}.{i}"
                        )
                    )
    return out


def load_reference_state_dict(model, state_dict, *, strict: bool = True):
    """Copy a reference-format ``state_dict`` (torch tensors or arrays)
    into ``model`` in place.  Returns {"loaded": [...], "skipped": [...],
    "missing": [...]}; with ``strict`` raises on unknown keys, shape
    mismatches, and parameters the checkpoint does not cover."""
    named = reference_named_params(model)
    loaded, skipped = [], []
    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            skipped.append(key)
            continue
        leaf = named.get(key)
        if leaf is None:
            if strict:
                raise KeyError(f"{key}: no matching parameter in the model")
            skipped.append(key)
            continue
        var = leaf["var"]
        cur = var[...]
        new = leaf["from_ref"](_to_numpy(value))
        if tuple(new.shape) != tuple(cur.shape):
            raise ValueError(
                f"{key}: shape {tuple(new.shape)} != model {tuple(cur.shape)}"
            )
        var[...] = jnp.asarray(new, dtype=cur.dtype)
        loaded.append(key)
    missing = [k for k in named if k not in set(loaded)]
    if strict and missing:
        raise KeyError(f"checkpoint missing {len(missing)} keys: "
                       f"{missing[:5]}{'...' if len(missing) > 5 else ''}")
    return {"loaded": loaded, "skipped": skipped, "missing": missing}


def export_reference_state_dict(model) -> Dict[str, np.ndarray]:
    """The model's parameters as a reference-format state_dict (numpy
    arrays, reference names/shapes — loadable by the torch reference)."""
    out = {}
    for key, leaf in reference_named_params(model).items():
        out[key] = np.asarray(leaf["to_ref"](np.asarray(leaf["var"][...])))
        if key.endswith("bn.running_var"):
            out[key.replace("running_var", "num_batches_tracked")] = np.asarray(
                0, np.int64
            )
    return out
