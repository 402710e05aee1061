"""Worker for tests/test_multihost_2proc.py: one of two cooperating
jax.distributed CPU processes.  Exercises parallel/multihost.py end to end
— distributed init, host_shard, global_batch + a global collective, and the
per-process sharded checkpoint round-trip.  Prints one JSON result line."""

import json
import os
import sys

coordinator, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

# the axon TPU plugin ignores the JAX_PLATFORMS env var — only the config
# switch actually selects the cpu backend here (CLAUDE.md)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neuralnetworklibrary_tpu.parallel import multihost  # noqa: E402
from neuralnetworklibrary_tpu.parallel.mesh import get_mesh  # noqa: E402

started = multihost.initialize(coordinator, num_processes=2, process_id=pid)
assert started, "distributed runtime did not start"
pi, pc = multihost.process_info()
assert (pi, pc) == (pid, 2), (pi, pc)
assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4

# per-host data sharding: contiguous disjoint halves
shard = multihost.host_shard(list(range(10)))
assert shard == (list(range(5)) if pid == 0 else list(range(5, 10))), shard

# global batch assembly + a global collective over it
mesh = get_mesh(8)
local = np.arange(12, dtype=np.float32).reshape(4, 3) + 100 * pid
gb = multihost.global_batch({"x": local}, mesh)["x"]
assert gb.shape == (8, 3)
total = float(jax.jit(lambda a: jnp.sum(a))(gb))
want = float(np.arange(12).sum() * 2 + 100 * 12)
assert abs(total - want) < 1e-3, (total, want)

# sharded checkpoint round-trip: a (8, 4) tree sharded over 'data'
from jax.sharding import NamedSharding, PartitionSpec as P

arr = jax.device_put(
    np.arange(32, dtype=np.float32).reshape(8, 4),
    NamedSharding(mesh, P("data")))
scalar = jnp.float32(7.5)
path = os.path.join(outdir, "ckpt")
multihost.save_sharded(path, {"params": {"w": arr, "s": scalar}})

from jax.experimental import multihost_utils

multihost_utils.sync_global_devices("ckpt-written")

loaded = multihost.load_sharded(path)
np.testing.assert_array_equal(loaded["params"]["w"],
                              np.arange(32, dtype=np.float32).reshape(8, 4))
assert float(loaded["params"]["s"]) == 7.5

print(json.dumps({"pid": pid, "total": total, "ok": True}))
