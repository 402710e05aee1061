"""Checkpointing: save/load pytrees of arrays.

The reference saves ``{'model_state': state_dict, 'optimizer_state': ...}``
with ``torch.save`` (General/Learner.py:119-153).  Here a checkpoint is a
single ``.npz`` file holding every pytree leaf keyed by its flattened path —
dependency-free, portable, and adequate for single-controller training (the
reference's scope; see SURVEY §5).  Arrays are pulled to host numpy on save
and restored as numpy on load (the Learner re-shards on first use; jax.device_put
happens lazily inside the jitted step).
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import jax
import numpy as np

from neuralnetworklibrary_tpu.core.pytree import flatten_params, unflatten_params

_SEP = "\x1f"  # path-component separator unlikely to appear in names


def save_pytrees(path: str, trees: Mapping[str, Any]) -> None:
    """Save named pytrees (e.g. {'params': ..., 'opt_state': ...}) to ``path``."""
    arrays: dict[str, np.ndarray] = {}
    for name, tree in trees.items():
        if tree is None:
            continue
        for leaf_path, leaf in flatten_params(tree).items():
            key = _SEP.join((name,) + leaf_path)
            arrays[key] = np.asarray(jax.device_get(leaf))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_pytrees(path: str) -> dict[str, Any]:
    """Load a checkpoint back into ``{name: pytree}`` of numpy arrays."""
    out: dict[str, dict] = {}
    with np.load(path, allow_pickle=False) as data:
        for key in data.files:
            parts = tuple(key.split(_SEP))
            name, leaf_path = parts[0], parts[1:]
            out.setdefault(name, {})[leaf_path] = data[key]
    return {name: unflatten_params(flat) for name, flat in out.items()}
