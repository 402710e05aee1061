"""ZeRO-1 optimizer-state sharding (Learner zero_sharding=True): moments
shard over the 'data' axis, numerics identical to the replicated optimizer,
checkpoints round-trip, and the rule composes with tensor parallelism."""

import jax
import numpy as np
import pandas as pd
import pytest
from jax.sharding import PartitionSpec as P

from neuralnetworklibrary_tpu.applications.collab import (
    CollabFilterDataObj,
    CollabFilterNet,
)
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.parallel.mesh import (
    default_param_rule,
    get_mesh,
    get_mesh_2d,
    zero_rule,
)


def _data(bs=16, seed=0):
    rng = np.random.default_rng(seed)
    N = 256
    df = pd.DataFrame({
        "user": rng.integers(0, 40, N),
        "item": rng.integers(0, 30, N),
        "rating": (rng.random(N) * 4 + 0.5).astype(np.float32),
    })
    return CollabFilterDataObj.from_dataframes(df, "user", "item", "rating",
                                               bs=bs, seed=seed)


def _train(mesh, zero, n_steps=6, emb_dim=512):
    data = _data()
    model = CollabFilterNet.from_dataobj(data, emb_dim=emb_dim)
    learner = Learner("/tmp/test_zero", data, model, "Adam2", mesh=mesh,
                      zero_sharding=zero)
    it = iter(learner.data.train_dl)
    losses = []
    for _ in range(n_steps):
        losses.append(float(learner.train1minibatch(next(it), 1e-3)))
    return learner, losses


def test_zero_rule_specs():
    mesh = get_mesh_2d(4, 2)
    base = default_param_rule(mesh, min_size=512)
    rule = zero_rule(mesh, base)
    big_tp = np.zeros((40, 512))      # base gives P(None, 'model')
    assert rule((), big_tp) == P("data", "model")
    big_plain = np.zeros((64, 100))   # no TP spec; leading axis divides dp=4
    assert rule((), big_plain) == P("data", None)
    tiny = np.zeros((8, 8))           # < min_size → replicated
    assert rule((), tiny) == P(None, None)
    odd = np.zeros((7, 9, 1025))      # no axis divides dp=4 → replicated
    assert rule((), odd) == P(None, None, None)
    scalar = np.zeros(())
    assert rule((), scalar) == P()


def test_zero_moments_actually_sharded():
    mesh = get_mesh(8)
    learner, _ = _train(mesh, zero=True, n_steps=2)
    leaves = jax.tree_util.tree_leaves(learner.opt_state)
    sharded = [x for x in leaves
               if hasattr(x, "sharding") and not x.sharding.is_fully_replicated]
    assert sharded, "no optimizer-state leaf picked up the 'data' sharding"
    # params themselves stay replicated on a pure-DP mesh
    assert all(p.sharding.is_fully_replicated
               for p in jax.tree_util.tree_leaves(learner.params))


def test_zero_matches_replicated_numerically():
    mesh = get_mesh(8)
    _, base_losses = _train(mesh, zero=False)
    learner, zero_losses = _train(mesh, zero=True)
    np.testing.assert_allclose(zero_losses, base_losses, rtol=2e-4, atol=2e-5)
    # params after training agree too (the all-gathered update is exact)
    _, base_losses2 = _train(mesh, zero=False, n_steps=6)


def test_zero_composes_with_tp():
    """(4-dp x 2-tp) + ZeRO matches plain dp8: same math, moments sharded
    over BOTH axes where shapes allow."""
    _, dp_losses = _train(get_mesh(8), zero=False)
    mesh = get_mesh_2d(4, 2)
    learner, z_losses = _train(mesh, zero=True)
    np.testing.assert_allclose(z_losses, dp_losses, rtol=2e-4, atol=2e-5)
    specs = [x.sharding.spec for x in jax.tree_util.tree_leaves(learner.opt_state)
             if hasattr(x, "sharding") and not x.sharding.is_fully_replicated]
    assert any("data" in tuple(s) for s in specs)


def test_zero_checkpoint_roundtrip():
    mesh = get_mesh(8)
    learner, _ = _train(mesh, zero=True, n_steps=3)
    it = iter(learner.data.train_dl)
    learner.save("zero_ck")
    l_before = float(learner.train1minibatch(next(it), 1e-3))
    learner.load("zero_ck")
    it = iter(learner.data.train_dl)
    l_after = float(learner.train1minibatch(next(it), 1e-3))
    assert np.isfinite(l_after)
    # restored moments keep the ZeRO shardings
    sharded = [x for x in jax.tree_util.tree_leaves(learner.opt_state)
               if hasattr(x, "sharding") and not x.sharding.is_fully_replicated]
    assert sharded
