"""Checkpoint save/restore for train states and param PyTrees.

Replaces the reference's torch.save checkpoints (reference: utils.py:176-197
``save_cpk``, main.py:348-369 best-checkpoint writes). States are immutable
PyTrees; we serialise the array leaves (host numpy) plus metadata with
pickle — fully self-contained, no torch.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(path: str, state, metadata: Optional[Dict] = None) -> None:
    """Write {params, teacher_params, model_state, opt_state, step, rng}
    plus free-form metadata (epoch, fold, early-stop state, metrics...)."""
    payload = {
        "params": _to_host(state.params),
        "teacher_params": _to_host(state.teacher_params)
        if state.teacher_params is not None
        else None,
        "model_state": _to_host(state.model_state),
        "opt_state": _to_host(state.opt_state),
        "step": int(state.step),
        "rng": np.asarray(jax.device_get(state.rng)),
        "metadata": metadata or {},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_state(state, payload: Dict[str, Any]):
    """Rebuild a train state from a checkpoint payload (templated on the
    freshly-initialised ``state`` for tx/apply_fn and tree structure)."""
    import jax.numpy as jnp

    return state.replace(
        step=jnp.asarray(payload["step"], jnp.int32),
        params=payload["params"],
        teacher_params=payload["teacher_params"],
        model_state=payload["model_state"],
        opt_state=payload["opt_state"],
        rng=jnp.asarray(payload["rng"]),
    )


def overlay_params(init_params, loaded_params):
    """Overlay ``loaded_params`` onto freshly-initialised ``init_params``,
    keeping init values for any subtree the checkpoint lacks — the partial
    teacher-init reconciliation (reference modules/__init__.py:190-207 loads
    a ``mhim_pure`` checkpoint into the full MHIM, which has extra Merge
    parameters)."""
    if not isinstance(init_params, dict):
        return loaded_params if loaded_params is not None else init_params
    out = {}
    for k, v in init_params.items():
        if isinstance(loaded_params, dict) and k in loaded_params:
            out[k] = overlay_params(v, loaded_params[k])
        else:
            out[k] = v
    return out
