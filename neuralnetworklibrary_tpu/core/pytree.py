"""Pytree utilities: the functional analogue of the reference's tensor/module helpers.

The reference (General/Core.py) works on mutable ``nn.Module`` objects: it
flattens modules into layer lists (``flatten_module``, Core.py:154), averages
``state_dict``s for SWA/ensembling (``combine_models``, Core.py:252), and moves
tensors to one GPU (``to_cuda``, Core.py:140).  On TPU the natural objects are
immutable pytrees of ``jax.Array``s, so all of those become pure functions over
flattened ``{path: leaf}`` dicts, and device placement is handled by
``jax.sharding`` (see neuralnetworklibrary_tpu.parallel).
"""

from __future__ import annotations

from typing import Any, Iterable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

PyTree = Any
Path = tuple[str, ...]


def flatten_params(tree: Mapping) -> dict[Path, Any]:
    """Flatten a nested dict pytree into ``{(k1, k2, ...): leaf}``.

    Key order is the deterministic sorted order of paths — the fixed leaf
    ordering that Partition and Optimizer rely on.
    """
    out: dict[Path, Any] = {}

    def rec(prefix: Path, node: Any) -> None:
        if isinstance(node, Mapping):
            for k in node:
                rec(prefix + (str(k),), node[k])
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(prefix + (str(i),), v)
        else:
            out[prefix] = node

    rec((), tree)
    return dict(sorted(out.items()))


def unflatten_params(flat: Mapping[Path, Any]) -> dict:
    """Inverse of :func:`flatten_params` (lists come back as dicts keyed '0','1',...).

    Round-tripping through flatten/unflatten therefore normalises any
    list-valued subtrees into dicts; all first-party models use dict params so
    this is lossless in practice.
    """
    tree: dict = {}
    for path, leaf in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return tree


def tree_paths(tree: Mapping) -> list[Path]:
    return list(flatten_params(tree).keys())


def global_norm(leaves: Iterable[jax.Array]) -> jax.Array:
    """L2 norm of all leaves combined — same quantity torch's
    ``clip_grad_norm_`` computes over ``model.parameters()`` (Optimizer.py:54-56)."""
    sq = [jnp.sum(jnp.square(leaf.astype(jnp.float32))) for leaf in leaves]
    if not sq:
        return jnp.zeros((), jnp.float32)
    return jnp.sqrt(sum(sq))


def combine_pytrees(trees: Sequence[PyTree], weights: Sequence[float] | None = None) -> PyTree:
    """Weighted average of identically-structured pytrees.

    Functional analogue of ``combine_models`` (Core.py:252): averaging model
    params *and* running statistics (batch_stats), used for SWA and model
    ensembling.  ``weights`` should sum to 1; defaults to uniform.
    """
    n = len(trees)
    if weights is None:
        weights = [1.0 / n] * n
    if len(weights) != n:
        raise ValueError("len(weights) must equal len(trees)")

    def avg(*leaves):
        out = sum(w * leaf for w, leaf in zip(weights, leaves))
        # Preserve integer leaves (e.g. step counters) by rounding back.
        if np.issubdtype(np.asarray(leaves[0]).dtype, np.integer):
            out = jnp.round(out).astype(leaves[0].dtype)
        return out

    return jax.tree_util.tree_map(avg, *trees)


def combine_preds(
    preds: Sequence[np.ndarray],
    target_type: str,
    weights: Sequence[float] | None = None,
):
    """Average multiple prediction sets — mirrors ``combine_preds`` (Core.py:277).

    For 'cont' returns the combined array; for 'cat'/'single_label' also the
    argmax labels; for 'multi_label' also the 0/1 rounded labels.
    """
    n = len(preds)
    if weights is None:
        weights = [1.0 / n] * n
    combined = sum(w * p for w, p in zip(weights, preds))
    if target_type == "cont":
        return combined
    if target_type in ("cat", "single_label", "text_classify"):
        return combined, combined.argmax(axis=1)
    if target_type == "multi_label":
        return combined, np.round(combined).astype(int)
    raise ValueError(f"unknown target_type {target_type!r}")


def joint_sort(lists: Sequence[Sequence], reverse: bool = False) -> list[list]:
    """Sort the first list and reorder the rest by the same permutation
    (Core.py:116)."""
    order = sorted(range(len(lists[0])), key=lambda k: lists[0][k], reverse=reverse)
    return [[lst[i] for i in order] for lst in lists]


def broadcast_to_groups(x, n_groups: int) -> list:
    """The reference's ``LIST`` (Core.py:78): broadcast a scalar to a length-NL
    list, or validate an existing length-NL list/tuple/array."""
    if isinstance(x, (list, tuple, np.ndarray)) and len(x) == n_groups:
        return list(x)
    if isinstance(x, (list, tuple, np.ndarray)):
        raise ValueError(
            f"per-group value has length {len(x)}, expected {n_groups} layer groups"
        )
    return [x] * n_groups


# --------------------------------------------------------------------------
# Small list/array utilities (Core.py:86-133)
# --------------------------------------------------------------------------

def list_del(lst, del_idxs):
    """Remove elements at the given indices (list_del, Core.py:88-96)."""
    drop = set(int(i) for i in del_idxs)
    return [v for i, v in enumerate(lst) if i not in drop]


def list_mult(lst, c):
    """Multiply every element by a scalar (list_mult, Core.py:98-102)."""
    return [v * c for v in lst]


def outer_mult(lst, vec):
    """Outer product of a list with a vector: [[v * c for c in vec] for v]
    (outer_mult, Core.py:104-107)."""
    return [[v * c for c in vec] for v in lst]


def linear_space(start, stop, N):
    """N evenly spaced values including both endpoints (linear_space,
    Core.py:109-114)."""
    import numpy as np

    return list(np.linspace(start, stop, N))
