"""FSDP / ZeRO-3 parameter sharding (Learner fsdp_sharding=True): params and
moments shard over the 'data' axis, GSPMD derives the all-gather /
reduce-scatter schedule, numerics identical to replicated training,
checkpoints round-trip, and the rule composes with tensor parallelism."""

import jax
import numpy as np
import pandas as pd
from jax.sharding import PartitionSpec as P

from neuralnetworklibrary_tpu.applications.collab import (
    CollabFilterDataObj,
    CollabFilterNet,
)
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.parallel.mesh import (
    default_param_rule,
    fsdp_rule,
    get_mesh,
    get_mesh_2d,
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


def _train(mesh, fsdp, n_steps=6, emb_dim=512):
    data = _data()
    model = CollabFilterNet.from_dataobj(data, emb_dim=emb_dim)
    learner = Learner("/tmp/test_fsdp", data, model, "Adam2", mesh=mesh,
                      fsdp_sharding=fsdp)
    it = iter(learner.data.train_dl)
    losses = []
    for _ in range(n_steps):
        losses.append(float(learner.train1minibatch(next(it), 1e-3)))
    return learner, losses


def test_fsdp_rule_specs():
    mesh = get_mesh_2d(4, 2)
    base = default_param_rule(mesh, min_size=512)
    rule = fsdp_rule(mesh, base)
    big_tp = np.zeros((40, 512))      # base gives P(None, 'model')
    assert rule((), big_tp) == P("data", "model")
    big_plain = np.zeros((64, 100))   # no TP spec; leading axis divides dp=4
    assert rule((), big_plain) == P("data", None)
    tiny = np.zeros((8, 8))           # < min_size → replicated
    assert rule((), tiny) == P(None, None)
    scalar = np.zeros(())
    assert rule((), scalar) == P()


def test_fsdp_params_and_moments_actually_sharded():
    mesh = get_mesh(8)
    learner, _ = _train(mesh, fsdp=True, n_steps=2)
    p_sharded = [x for x in jax.tree_util.tree_leaves(learner.params)
                 if hasattr(x, "sharding") and not x.sharding.is_fully_replicated]
    assert p_sharded, "no param leaf picked up the 'data' sharding"
    m_sharded = [x for x in jax.tree_util.tree_leaves(learner.opt_state)
                 if hasattr(x, "sharding") and not x.sharding.is_fully_replicated]
    assert m_sharded, "no moment leaf picked up the 'data' sharding"
    # the second step must not have re-gathered them (constraint holds)
    spec = p_sharded[0].sharding.spec
    assert "data" in tuple(spec)


def test_fsdp_matches_replicated_numerically():
    mesh = get_mesh(8)
    _, base_losses = _train(mesh, fsdp=False)
    _, fsdp_losses = _train(mesh, fsdp=True)
    np.testing.assert_allclose(fsdp_losses, base_losses, rtol=2e-4, atol=2e-5)


def test_fsdp_composes_with_tp():
    """(4-dp x 2-tp) + FSDP matches plain dp8: embeddings shard over BOTH
    axes where shapes allow."""
    _, dp_losses = _train(get_mesh(8), fsdp=False)
    mesh = get_mesh_2d(4, 2)
    learner, f_losses = _train(mesh, fsdp=True)
    np.testing.assert_allclose(f_losses, dp_losses, rtol=2e-4, atol=2e-5)
    specs = [tuple(x.sharding.spec)
             for x in jax.tree_util.tree_leaves(learner.params)
             if hasattr(x, "sharding") and not x.sharding.is_fully_replicated]
    assert any("data" in s and "model" in s for s in specs), specs


def test_fsdp_checkpoint_roundtrip():
    mesh = get_mesh(8)
    learner, _ = _train(mesh, fsdp=True, n_steps=3)
    it = iter(learner.data.train_dl)
    learner.save("fsdp_ck")
    float(learner.train1minibatch(next(it), 1e-3))
    learner.load("fsdp_ck")
    it = iter(learner.data.train_dl)
    l_after = float(learner.train1minibatch(next(it), 1e-3))
    assert np.isfinite(l_after)
    sharded = [x for x in jax.tree_util.tree_leaves(learner.params)
               if hasattr(x, "sharding") and not x.sharding.is_fully_replicated]
    assert sharded, "restored params lost the FSDP shardings"


def test_fsdp_freeze_then_train():
    """freeze() resets the optimizer state; the sharded path must survive
    the recompile, keep the frozen (FSDP-sharded) body bit-identical, and
    still move the head."""
    import types

    import flax.linen as nn
    import jax.numpy as jnp

    from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader

    class BodyHead(nn.Module):
        layer_group_prefixes = None
        head_prefixes = ("head",)

        @nn.compact
        def __call__(self, x, train: bool = False):
            h = nn.relu(nn.Dense(512, name="body")(x))
            return nn.Dense(1, name="head")(h)[:, 0]

    rng = np.random.default_rng(0)
    x = rng.normal(size=(128, 64)).astype(np.float32)
    y = x.sum(1).astype(np.float32)
    ds = ArrayDataset(x, y)
    data = types.SimpleNamespace(
        target_type="cont", bs=16,
        train_dl=DataLoader(ds, 16, shuffle=True, prefetch=0),
        val_dl=DataLoader(ds, 16, prefetch=0), train_ds=ds, val_ds=ds)
    mesh = get_mesh(8)
    learner = Learner("/tmp/test_fsdp", data, BodyHead(), "Adam2", mesh=mesh,
                      fsdp_sharding=True)
    it = iter(data.train_dl)
    for _ in range(2):
        float(learner.train1minibatch(next(it), 1e-3))
    # the body kernel (64x512 = 32768 elems) is the FSDP-sharded leaf
    assert not learner.params["body"]["kernel"].sharding.is_fully_replicated
    before = jax.tree_util.tree_map(np.asarray, learner.params)
    learner.freeze()
    float(learner.train1minibatch(next(it), 1e-3))
    after = learner.params
    assert np.array_equal(before["body"]["kernel"],
                          np.asarray(after["body"]["kernel"]))
    assert np.array_equal(before["body"]["bias"],
                          np.asarray(after["body"]["bias"]))
    assert not np.array_equal(before["head"]["kernel"],
                              np.asarray(after["head"]["kernel"]))
    learner.unfreeze()
    assert np.isfinite(float(learner.train1minibatch(next(it), 1e-3)))
