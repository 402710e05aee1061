"""LAMB optimizer: exact single-step oracle, trust-ratio semantics, and
Learner-level large-batch training."""

import types

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neuralnetworklibrary_tpu.core.optim import Optimizer
from neuralnetworklibrary_tpu.core.partition import build_partition
from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.parallel.mesh import get_mesh


def _one_step(params, grads, wd=None):
    opt = Optimizer("LAMB")
    part = build_partition(params)
    state = opt.init(params)
    trainable = (True,) * len(part.paths)
    wd_groups = None if wd is None else jnp.asarray([wd], jnp.float32)
    new_p, _ = opt.apply(params, grads, state, part, trainable,
                         lr_groups=jnp.asarray([0.1], jnp.float32),
                         wd_groups=wd_groups)
    return new_p


def test_lamb_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 1, (8, 16)).astype(np.float32)
    g = rng.normal(0, 1, (8, 16)).astype(np.float32)
    got = np.asarray(_one_step({"w": jnp.asarray(w)},
                               {"w": jnp.asarray(g)}, wd=0.01)["w"])

    # paper step at t=1: m̂ = g, v̂ = g², update = g/(|g|+eps) + wd·w
    m_hat = g
    v_hat = g * g
    upd = m_hat / (np.sqrt(v_hat) + 1e-8) + 0.01 * w
    trust = np.linalg.norm(w) / np.linalg.norm(upd)
    expect = w - 0.1 * trust * upd
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_lamb_zero_param_trust_is_one():
    """A zero-initialized leaf (bias) has ||p||=0 → trust ratio 1 (plain
    Adam step), not a frozen zero step."""
    g = jnp.ones((4,), jnp.float32)
    got = np.asarray(_one_step({"b": jnp.zeros((4,), jnp.float32)},
                               {"b": g})["b"])
    # update = 1/(1+eps) each; trust=1 → p = -0.1 * update
    np.testing.assert_allclose(got, -0.1 * np.ones(4), rtol=1e-5)


def test_lamb_wd_inside_trust_ratio():
    """With LAMB, weight decay must ride inside the normed update (no
    pre-multiplicative shrink): a pure-decay step (g=0 after warmup ... use
    g tiny) moves p along -p direction scaled by trust·lr."""
    w = jnp.full((4,), 2.0, jnp.float32)
    g = jnp.full((4,), 1e-12, jnp.float32)
    got = np.asarray(_one_step({"w": w}, {"w": g}, wd=0.1)["w"])
    # update ≈ tiny + 0.1·w = 0.2 each; trust = ||w||/||upd|| = 2/0.2 = 10
    # p ← 2 - 0.1·10·0.2 = 1.8
    np.testing.assert_allclose(got, 1.8 * np.ones(4), rtol=1e-3)


class _Net(nn.Module):
    layer_group_prefixes = None
    head_prefixes = ("head",)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(nn.Dense(64, name="body")(x))
        return nn.Dense(1, name="head")(h)[:, 0]


def test_lamb_learner_trains_large_batch():
    """LAMB through the Learner at a large (mesh-sharded, accumulated)
    effective batch converges on the regression toy."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(256, 8)).astype(np.float32)
    y = x.sum(1).astype(np.float32)
    ds = ArrayDataset(x, y)
    data = types.SimpleNamespace(
        target_type="cont", bs=128,
        train_dl=DataLoader(ds, 128, shuffle=True, prefetch=0),
        val_dl=DataLoader(ds, 128, prefetch=0), train_ds=ds, val_ds=ds)
    learner = Learner("/tmp/test_lamb", data, _Net(), "LAMB",
                      mesh=get_mesh(8), grad_accum=2)
    learner.fit(2e-2, 12, wd=1e-4)
    val = [row[1] for row in learner.values]
    assert val[-1] < 0.2 * val[0], val
