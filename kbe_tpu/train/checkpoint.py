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

    # synchronous Checkpointer wrapping the modern StandardCheckpointHandler
    # (StandardCheckpointer is async; its metadata futures outlive short
    # CLI processes and crash at interpreter shutdown)
    return ocp.Checkpointer(ocp.StandardCheckpointHandler())


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
            path, {"state": jax.device_get(template), "step": 0})
    else:
        restored = ckptr.restore(path)
    return restored["state"], restored["step"]


def _state_params(state_like):
    """Extract model params from a restored train state, tolerating the
    namedtuple (in-process), dict (orbax restore without template), and
    sequence encodings."""
    if hasattr(state_like, "context") and hasattr(state_like, "net"):
        return {"context": state_like.context, "net": state_like.net}
    if hasattr(state_like, "params"):
        return state_like.params
    if isinstance(state_like, dict):
        if "context" in state_like and "net" in state_like:
            return {"context": state_like["context"],
                    "net": state_like["net"]}
        if "params" in state_like:
            return state_like["params"]
        if "0" in state_like:  # positional namedtuple encoding
            return state_like["0"]
    if isinstance(state_like, (list, tuple)):
        return state_like[0]
    raise ValueError("unrecognized checkpoint state structure")


def load_pretrained_params(path: str, kind: str):
    """Load model params for warm-starting a trainer (the reference's
    load_models path, utils/utils.py:202-217, reached from train.py
    --model-path at train.py:110-176).

    ``path``: either a reference torch ``.tar`` (converted via
    utils/torch_convert.py) or one of our orbax checkpoints (a directory
    saved by ``save_checkpoint``). ``kind``: 'disparity' | 'refine' |
    'inpaint'. For 'inpaint' returns {'context': ..., 'net': ...}.
    """
    if path.endswith(".tar"):
        from kbe_tpu.utils import torch_convert as tc

        if kind == "disparity":
            return tc.convert_disparity(path)
        if kind == "refine":
            return tc.convert_refine(path)
        if kind == "inpaint":
            ctx, net = tc.convert_inpaint(path)
            return {"context": ctx, "net": net}
        raise ValueError(f"unknown kind {kind!r}")
    state, _ = load_checkpoint(path)
    if isinstance(state, (list, tuple)) and kind == "disparity" \
            and len(state) == 2:
        state = state[0]  # (dstate, rstate) refine-mode checkpoint
    return _state_params(state)


def load_pipeline_params(path: str):
    """Restore a full-inference-stack checkpoint (the flat dict saved by
    tools/make_bench_weights.py) as a ``PipelineParams``.

    The reference's equivalent is Pipeline.__init__ loading the six
    released ``.tar`` weights (utils/pipeline.py:34-57 + download.sh);
    offline, bench.py / fidelity tooling load the deterministic synthetic
    training recipe's checkpoint instead.
    """
    from kbe_tpu.pipeline.kenburns import PipelineParams

    state, _ = load_checkpoint(path)
    return PipelineParams(
        semantics=state["semantics"],
        disparity=state["disparity"],
        refine=state["refine"],
        context=state["context"],
        inpaint=state["inpaint"],
        context_depth=state.get("context_depth"),
        inpaint_depth=state.get("inpaint_depth"),
    )


def find_bench_weights(repo_root: Optional[str] = None) -> Optional[str]:
    """Latest ``.bench_weights/pipeline-*`` checkpoint, or None.

    Resolution order: $KBE_BENCH_WEIGHTS (a checkpoint path, or '' / '0'
    to force random weights), then ``<repo_root>/.bench_weights``.
    """
    env = os.environ.get("KBE_BENCH_WEIGHTS")
    if env is not None:
        return env if env not in ("", "0", "none") else None
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    return latest_checkpoint(os.path.join(repo_root, ".bench_weights"),
                             "pipeline")
