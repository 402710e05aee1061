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


# ---------------------------------------------------------------------------
# Async checkpointing (SURVEY §5 'checkpoint/resume' rebuild note)
# ---------------------------------------------------------------------------

class AsyncCheckpointer:
    """Non-blocking checkpoint writer: the device→host pull happens on the
    caller's thread (cheap, overlaps with the next dispatched step), the disk
    write on a background thread so training never waits on IO.

    >>> ck = AsyncCheckpointer()
    >>> ck.save(path, {"params": learner.params})   # returns immediately
    >>> ck.wait()                                    # join outstanding writes
    """

    def __init__(self):
        import threading

        self._threads: list = []
        self._lock = threading.Lock()
        self._errors: list = []

    def save(self, path: str, trees: Mapping[str, Any]) -> None:
        import threading

        # pull to host NOW (values at this step, not whenever the thread runs)
        host_trees = {
            name: (jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), t)
                   if t is not None else None)
            for name, t in trees.items()
        }

        def write():
            try:
                save_pytrees(path, host_trees)
            except Exception as e:  # surfaced on wait()
                with self._lock:
                    self._errors.append(e)

        t = threading.Thread(target=write, daemon=True)
        t.start()
        with self._lock:
            self._threads = [th for th in self._threads if th.is_alive()] + [t]

    def wait(self) -> None:
        """Block until all outstanding writes finish; re-raise any failure."""
        with self._lock:
            threads = list(self._threads)
        for t in threads:
            t.join()
        with self._lock:
            if self._errors:
                raise self._errors.pop()
