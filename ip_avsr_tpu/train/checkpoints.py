"""Checkpoint / resume of full training state (params + optimizer + progress).

The reference only ever pickles model parameters (best-val snapshot,
utils/io.py:32-48, runners/4stream.py:463-467) and cannot resume optimizer
state (SURVEY.md §5 "Checkpoint / resume").  The rebuild adds proper
train-state checkpointing via orbax with the pickle formats kept as
import/export paths (io/matio.py).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(directory: str, step: int, params, opt_state, extra: Optional[dict] = None):
    """Write a step checkpoint under ``directory/step_<N>``."""
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    state = {"params": params, "opt_state": opt_state,
             "extra": extra or {}, "step": np.int64(step)}
    _checkpointer().save(path, jax.tree_util.tree_map(np.asarray, state), force=True)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_train_state(directory: str, step: Optional[int] = None) -> Optional[dict]:
    """Restore the given (or latest) checkpoint; None if absent — for an
    explicit ``step`` too (a missing step_<N> dir returns None rather than
    leaking orbax's FileNotFoundError)."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            return None
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    if not os.path.isdir(path):
        return None
    return _checkpointer().restore(path)
