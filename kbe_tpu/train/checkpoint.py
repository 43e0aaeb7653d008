"""Checkpointing: orbax save/restore + optimizer/scheduler state.

Replaces the reference's torch.save dict format (utils/utils.py:190-217):
``save_model`` wrote {nb_iter, model_state_dict, optimizer/scheduler state}
to ``models/trained/<type>-<name>.tar``; ``load_models`` tolerated both
that format and raw state-dicts. Here the same roles map to orbax
checkpoints of {state, step}; torch ``.tar`` conversion lives in
utils/torch_convert.py.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, name: str, state: Any,
                    step: int) -> str:
    """Save ``state`` under ``<directory>/<name>-<step>`` (every-500-iters
    cadence decided by the trainers, train_depth.py:121-126)."""
    path = os.path.abspath(os.path.join(directory, f"{name}-{step}"))
    os.makedirs(directory, exist_ok=True)
    ckptr = _checkpointer()
    ckptr.save(path, {"state": jax.device_get(state), "step": step},
               force=True)
    return path


def latest_checkpoint(directory: str, name: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for entry in os.listdir(directory):
        if entry.startswith(name + "-"):
            try:
                step = int(entry.rsplit("-", 1)[1])
            except ValueError:
                continue
            if step > best_step:
                best, best_step = entry, step
    return os.path.join(directory, best) if best else None


def load_checkpoint(path: str, template: Any = None):
    """Restore {state, step}. With ``template`` the tree structure/dtypes
    are validated against it (continue_training path,
    utils/utils.py:209-212)."""
    ckptr = _checkpointer()
    if template is not None:
        restored = ckptr.restore(
            path, item={"state": jax.device_get(template), "step": 0})
    else:
        restored = ckptr.restore(path)
    return restored["state"], restored["step"]
