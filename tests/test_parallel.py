"""Mesh/sharding tests: DP invariance, 2D (data, model) tensor parallelism."""

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
    shard_params,
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


def _train(mesh, n_steps=6, emb_dim=512):
    data = _data()
    model = CollabFilterNet.from_dataobj(data, emb_dim=emb_dim)
    learner = Learner("/tmp/test_parallel", data, model, "Adam2", mesh=mesh)
    it = iter(learner.data.train_dl)
    losses = []
    for _ in range(n_steps):
        losses.append(float(learner.train1minibatch(next(it), 1e-3)))
    return learner, losses


def test_mesh_2d_shape():
    mesh = get_mesh_2d(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        get_mesh_2d(8, 2)  # only 8 virtual devices


def test_default_rule_shards_large_last_axis():
    mesh = get_mesh_2d(4, 2)
    rule = default_param_rule(mesh, min_size=512)
    big = np.zeros((40, 512))
    small = np.zeros((40, 30))
    assert rule((), big) == P(None, "model")
    assert rule((), small) == P()


def test_tp_params_actually_sharded():
    mesh = get_mesh_2d(4, 2)
    learner, _ = _train(mesh, n_steps=1)
    sharded = [
        p for p in jax.tree_util.tree_leaves(learner.params)
        if not p.sharding.is_fully_replicated
    ]
    assert sharded, "no param leaf picked up a 'model'-axis sharding"


def test_tp_matches_dp_numerically():
    """Same model/data/seed on (8-dp) vs (4-dp x 2-tp): identical math, so
    the loss trajectories agree to float tolerance."""
    _, dp_losses = _train(get_mesh(8))
    _, tp_losses = _train(get_mesh_2d(4, 2))
    np.testing.assert_allclose(dp_losses, tp_losses, rtol=2e-4, atol=2e-5)


def test_tp_checkpoint_roundtrip():
    mesh = get_mesh_2d(4, 2)
    learner, _ = _train(mesh, n_steps=2)
    before = learner.evaluate("val")[0] if isinstance(learner.evaluate("val"), list) else learner.evaluate("val")
    learner.save("tp_ck")
    learner.load("tp_ck")
    after = learner.evaluate("val")
    after = after[0] if isinstance(after, list) else after
    before = before if not isinstance(before, list) else before[0]
    assert abs(float(before) - float(after)) < 1e-6


def test_device_count_invariance():
    """SURVEY §4: same loss trajectory at fixed bs for n_devices in {1, 8}."""
    _, l1 = _train(get_mesh(1), emb_dim=16)
    _, l8 = _train(get_mesh(8), emb_dim=16)
    np.testing.assert_allclose(l1, l8, rtol=2e-4, atol=2e-5)
