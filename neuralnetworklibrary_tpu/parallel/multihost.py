"""Multi-host (DCN) scaffolding — beyond reference parity (SURVEY §2.5: the
reference is single-GPU; DCN was listed as a possible later extension).

Three pieces, each degrading gracefully to single-host:

- :func:`initialize`: ``jax.distributed.initialize`` when a coordinator is
  configured (args or JAX's standard env vars); a recorded no-op otherwise.
  After it, ``jax.devices()`` spans all hosts, so the existing
  ``get_mesh``/``get_mesh_2d`` constructors build GLOBAL meshes unchanged.
- per-host data sharding: :func:`host_shard` slices a dataset/index list so
  each process reads only its share, and :func:`global_batch` assembles a
  globally-sharded jax.Array from per-host local batches
  (``jax.make_array_from_process_local_data``) — host-local uploads ride
  PCIe/DMA, the DP gradient psum rides ICI/DCN.
- sharded checkpointing: :func:`save_sharded` / :func:`load_sharded` write
  one npz per process holding its addressable shards plus a small index;
  on a single host this reduces to the regular checkpoint layout.

No real multi-host run is possible in this environment; everything here is
unit-tested in its single-process degradation and documented for the real
topology.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping, Optional, Sequence

import jax
import numpy as np

from neuralnetworklibrary_tpu.core.pytree import flatten_params, unflatten_params

_SEP = "\x1f"

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize JAX's distributed runtime when multi-host is configured.

    Configuration sources, in order: explicit args; JAX's standard env vars
    (JAX_COORDINATOR_ADDRESS / cloud-TPU metadata, which
    ``jax.distributed.initialize()`` reads itself).  Returns True when the
    distributed runtime was started, False for the single-host no-op.
    """
    global _initialized
    if _initialized:
        return True
    env_coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and env_coord is None:
        return False  # single host — nothing to do
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — (0, 1) on a single host."""
    return jax.process_index(), jax.process_count()


def host_shard(items: Sequence, process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> list:
    """This host's contiguous slice of ``items`` (len padded up so every
    host sees the same number of elements — the tail repeats the last item,
    mirroring the loaders' mask-padded short batches)."""
    pi, pc = process_info()
    pi = pi if process_index is None else process_index
    pc = pc if process_count is None else process_count
    if pc == 1:
        return list(items)
    per = -(-len(items) // pc)  # ceil
    padded = list(items) + [items[-1]] * (per * pc - len(items))
    return padded[pi * per: (pi + 1) * per]


def global_batch(local_arrays, mesh, axis: str = "data"):
    """Assemble globally-sharded jax.Arrays from per-host local batch arrays.

    Each process passes ITS slice of the global batch (leading dim =
    global_bs / process_count); the result is one jax.Array whose leading
    dim is the global batch, sharded over the '{axis}' mesh axis.  On a
    single host this is an ordinary sharded device_put.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, local_arrays)


# ---------------------------------------------------------------------------
# Sharded checkpointing
# ---------------------------------------------------------------------------

def save_sharded(path: str, trees: Mapping[str, Any]) -> None:
    """Write each process's addressable shards to ``{path}.shard{pi}.npz``
    plus a ``{path}.index.json`` with global shapes and shard placement.

    Every process calls this; each writes only what it holds (no cross-host
    gathers, no host-0 memory spike).  Single-host: one shard file holding
    full arrays — same on-disk contract.
    """
    pi, pc = process_info()
    arrays: dict[str, np.ndarray] = {}
    index: dict[str, Any] = {"process_count": pc, "leaves": {}}
    for name, tree in trees.items():
        if tree is None:
            continue
        for leaf_path, leaf in flatten_params(tree).items():
            key = _SEP.join((name,) + leaf_path)
            if isinstance(leaf, jax.Array) and hasattr(leaf, "addressable_shards"):
                shards = leaf.addressable_shards
                for s in shards:
                    starts = [(i.start or 0) for i in s.index]
                    skey = f"{key}{_SEP}@{'_'.join(map(str, starts))}"
                    arrays[skey] = np.asarray(s.data)
                index["leaves"][key] = {
                    "shape": list(leaf.shape), "dtype": str(leaf.dtype),
                    "starts": [[(i.start or 0) for i in s.index] for s in shards],
                }
            else:
                arrays[key] = np.asarray(leaf)
                index["leaves"][key] = {"shape": list(np.shape(leaf)),
                                        "dtype": str(np.asarray(leaf).dtype),
                                        "starts": [[0] * np.ndim(leaf)]}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(f"{path}.shard{pi}.npz", "wb") as f:
        np.savez(f, **arrays)
    if pi == 0:
        with open(f"{path}.index.json", "w") as f:
            json.dump(index, f)


def load_sharded(path: str) -> dict[str, Any]:
    """Reassemble ``{name: pytree}`` of full numpy arrays from shard files.

    Reads every ``{path}.shard*.npz`` present (a restarted job can have a
    different process count than the writer; each host reconstructs full
    arrays and re-shards through the Learner's normal placement path).
    """
    import glob

    with open(f"{path}.index.json") as f:
        index = json.load(f)
    leaves = index["leaves"]
    full: dict[str, np.ndarray] = {}
    for shard_file in sorted(glob.glob(f"{path}.shard*.npz")):
        with np.load(shard_file, allow_pickle=False) as data:
            for skey in data.files:
                if _SEP + "@" in skey:
                    key, loc = skey.rsplit(_SEP + "@", 1)
                    # 0-d leaves have no start coordinates: loc is "".
                    starts = [int(v) for v in loc.split("_")] if loc else []
                else:
                    key, starts = skey, [0] * data[skey].ndim
                info = leaves[key]
                if key not in full:
                    full[key] = np.zeros(info["shape"], dtype=info["dtype"])
                block = data[skey]
                sl = tuple(slice(s, s + d) for s, d in zip(starts, block.shape))
                full[key][sl] = block
    out: dict[str, dict] = {}
    for key, arr in full.items():
        parts = tuple(key.split(_SEP))
        out.setdefault(parts[0], {})[parts[1:]] = arr
    return {name: unflatten_params(flat) for name, flat in out.items()}
