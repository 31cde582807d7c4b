"""Checkpoint / resume via orbax.

The reference delegates checkpointing to torch.save/torch.load of module
state dicts (reference: examples/completion.py:573,667-668) and never
persists coordinate managers ("coordinate state is ephemeral",
SURVEY.md §5).  Same contract here: model parameters/statistics are a
pytree saved with orbax; coordinate maps are rebuilt from data on resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

from flax import nnx


def save_checkpoint(path: str, model: nnx.Module, extra: Optional[dict] = None):
    """Save a model's full nnx state (+ optional extra pytree) to ``path``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    state = nnx.state(model)
    payload = {"model": nnx.to_pure_dict(state)}
    if extra is not None:
        payload["extra"] = extra
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, model: nnx.Module):
    """Restore ``model`` (in place) from ``path``.  Returns the ``extra``
    payload (or None)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    state = nnx.state(model)
    template = {"model": nnx.to_pure_dict(state)}
    ckptr = ocp.StandardCheckpointer()
    try:
        restored = ckptr.restore(path, template)
    except Exception:
        restored = ckptr.restore(path)
    nnx.replace_by_pure_dict(state, restored["model"])
    nnx.update(model, state)
    return restored.get("extra")
