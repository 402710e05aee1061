"""Device mesh + sharding helpers — the framework's distributed layer.

The reference is single-GPU (`README.md:11-12`, ``to_cuda`` per batch,
Core.py:140-144).  The TPU-native replacement: a ``jax.sharding.Mesh`` over all
local devices with a 'data' axis; batches are device_put with their leading
axis sharded over 'data', params replicated.  Under ``jax.jit`` XLA's GSPMD
partitioner then runs the train step SPMD and inserts the gradient all-reduce
(psum) over ICI automatically — no NCCL-style explicit communication code.

Scaling beyond pure DP is a matter of widening the mesh (e.g. ('data',
'model')) and giving params non-trivial PartitionSpecs; the helpers here keep
that door open by taking arbitrary axis names.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)) -> Mesh:
    """A 1D mesh over the first ``n_devices`` local devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def get_mesh_2d(dp: int, tp: int = 1, axis_names: Sequence[str] = ("data", "model")) -> Mesh:
    """A (dp × tp) mesh for combined data + tensor parallelism.

    Lay the 'model' axis innermost so tensor-parallel collectives ride the
    fastest links (contiguous device ids map to adjacent ICI neighbors)."""
    devices = jax.devices()[: dp * tp]
    if len(devices) < dp * tp:
        raise ValueError(f"need {dp * tp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices).reshape(dp, tp), axis_names)


def get_mesh_nd(axis_names: Sequence[str], shape: Sequence[int]) -> Mesh:
    """An N-D mesh, e.g. ``get_mesh_nd(("data", "expert", "model"),
    (2, 2, 2))`` for combined data + expert + tensor parallelism.  Later
    axes are innermost — put the chattiest axis ('model') last so its
    collectives ride adjacent-ICI links."""
    n = int(np.prod(shape))
    devices = jax.devices()[:n]
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices).reshape(tuple(shape)), tuple(axis_names))


def default_param_rule(mesh: Mesh, min_size: int = 512):
    """Default tensor-parallel sharding rule: shard a leaf's LAST axis over
    'model' when it divides evenly and is large enough (matmul weights and
    embeddings — the MXU-heavy params); everything else replicates.

    This is the scaling-book recipe: annotate shardings, let XLA GSPMD insert
    the all-gathers/reduce-scatters.
    """
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)

    def rule(path, leaf) -> P:
        if (tp > 1 and getattr(leaf, "ndim", 0) >= 2
                and leaf.shape[-1] % tp == 0 and leaf.shape[-1] >= min_size):
            return P(*([None] * (leaf.ndim - 1) + ["model"]))
        return P()

    return rule


def zero_rule(mesh: Mesh, base=None, axis: str = "data", min_size: int = 4096):
    """ZeRO-1 optimizer-state sharding rule (beyond reference parity —
    the reference is single-GPU).

    On top of whatever tensor-parallel spec ``base`` assigns a leaf, shard
    the first still-unsharded axis that divides the '{axis}' mesh dimension
    over it — so the Adam moments occupy 1/dp of their replicated footprint
    per device.  Data-parallel gradients are replicated after GSPMD's psum,
    each device updates only its moment shard, and XLA inserts exactly one
    all-gather of the (sharded) param update per step — the ZeRO-1
    schedule, derived from shardings rather than hand-written collectives.
    Small leaves (< min_size elements) replicate: a collective per tiny
    bias costs more than it saves.
    """
    dp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1)

    def rule(path, leaf) -> P:
        nd = getattr(leaf, "ndim", 0)
        spec = tuple(base(path, leaf)) if base is not None else ()
        spec = spec + (None,) * (nd - len(spec))
        if dp > 1 and getattr(leaf, "size", 0) >= min_size:
            for i in range(nd):
                if spec[i] is None and leaf.shape[i] % dp == 0:
                    return P(*spec[:i], axis, *spec[i + 1:])
        return P(*spec)

    return rule


def fsdp_rule(mesh: Mesh, base=None, axis: str = "data", min_size: int = 4096):
    """ZeRO-3 / FSDP parameter-sharding rule (beyond reference parity).

    The same axis-picking transformation as :func:`zero_rule`, applied to the
    PARAMS themselves (and, through the Learner, to the optimizer moments —
    ZeRO-3 subsumes ZeRO-1): each large leaf keeps only 1/dp of its elements
    per device, sharded over the '{axis}' mesh dimension on top of any
    tensor-parallel spec from ``base``.  Under ``jax.jit`` GSPMD then derives
    the FSDP schedule from the shardings alone — an all-gather of each weight
    at its use site in the forward/backward and a reduce-scatter of its
    gradient — instead of the hand-written bucketing/prefetch machinery a
    torch FSDP wrapper needs.  Small leaves (< min_size elements) replicate:
    a collective per tiny bias costs more than it saves.

    Use through ``Learner(fsdp_sharding=True)``, which also pins the
    post-update params/moments back to this rule inside the train step.
    """
    return zero_rule(mesh, base, axis=axis, min_size=min_size)


def shard_params(tree: Any, mesh: Mesh, rule=None):
    """device_put a param/opt pytree with per-leaf shardings from ``rule``
    (None or a 1-sized/absent 'model' axis → fully replicated)."""
    if rule is None:
        return replicate_tree(tree, mesh)

    def put(path, x):
        return jax.device_put(x, NamedSharding(mesh, rule(path, x)))

    return jax.tree_util.tree_map_with_path(put, tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for batches."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch_arrays, mesh: Mesh, axis: str = "data"):
    """device_put a pytree of host arrays with leading-axis sharding.

    The training loader's fixed ``bs`` is checked divisible at Learner
    construction; an array whose leading dim does NOT divide the mesh axis
    (e.g. a bs=1 detection eval batch on a multi-device mesh) is replicated
    instead — numerically identical, just without the DP split.
    """
    sh = batch_sharding(mesh, axis)
    rep = replicated(mesh)

    def put(x):
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] % mesh.shape[axis] != 0:
            return jax.device_put(x, rep)
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch_arrays)


def device_prefetch(batch_iter, mesh: Mesh, size: int = 2, axis: str = "data"):
    """Move batches to device ``size`` iterations ahead of consumption.

    The host→device transfer of batch k+1 overlaps the device compute of
    batch k (the flax ``prefetch_to_device`` pattern) — without this the
    upload serializes with the train step.  Yields the incoming items with
    their array fields already sharded (objects exposing .xs/.y/.mask get
    those replaced; plain pytrees are sharded whole).
    """
    import collections
    import dataclasses

    queue = collections.deque()

    def put(item):
        if hasattr(item, "xs"):
            xs, y, mask = shard_batch((item.xs, item.y, item.mask), mesh, axis)
            return dataclasses.replace(item, xs=xs, y=y, mask=mask)
        return shard_batch(item, mesh, axis)

    # puts stay on the consumer thread: device_put is asynchronous enough in
    # practice, and a dedicated upload thread measurably HURTS on CPU-poor
    # hosts (GIL/core contention with the decode threads)
    for item in batch_iter:
        queue.append(put(item))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def replicate_tree(tree: Any, mesh: Mesh):
    """device_put a pytree fully replicated over the mesh (params/opt state)."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
