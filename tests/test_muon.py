"""Muon: the Newton–Schulz iteration really orthogonalizes (vs an SVD
oracle), routing sends matrices to Muon and embeddings/vectors to AdamW,
frozen leaves stay untouched, and the Learner trains with it."""

import types

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neuralnetworklibrary_tpu.core.optim import (
    Optimizer,
    newton_schulz_orthogonalize,
)
from neuralnetworklibrary_tpu.core.partition import build_partition
from neuralnetworklibrary_tpu.core.pytree import flatten_params
from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.parallel.mesh import get_mesh


def test_newton_schulz_approximates_polar_factor():
    rng = np.random.default_rng(0)
    for shape in ((64, 96), (96, 64), (48, 48)):
        m = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
        o = np.asarray(newton_schulz_orthogonalize(m))
        # singular values pushed into the NS5 convergence band around 1
        sv = np.linalg.svd(o, compute_uv=False)
        assert sv.max() < 1.5 and sv.min() > 0.3, sv
        # direction matches the exact polar factor UVᵀ
        u, _, vt = np.linalg.svd(np.asarray(m), full_matrices=False)
        polar = u @ vt
        cos = (o * polar).sum() / (np.linalg.norm(o) * np.linalg.norm(polar))
        assert cos > 0.98, cos


def _params(rng):
    return {
        "word_embed": {"weight": jnp.asarray(rng.normal(0, 1, (50, 16)),
                                             jnp.float32)},
        "block": {"kernel": jnp.asarray(rng.normal(0, 0.1, (16, 32)),
                                        jnp.float32),
                  "bias": jnp.zeros((32,))},
    }


def test_state_routing_and_update_shapes():
    params = _params(np.random.default_rng(0))
    opt = Optimizer("Muon")
    state = opt.init(params)
    flat = flatten_params(state)
    # matrix kernel → Muon slot; embedding (2-d but 'embed') + bias → AdamW
    assert ("block", "kernel", "mu") in flat
    assert ("word_embed", "weight", "m") in flat
    assert ("block", "bias", "v") in flat

    part = build_partition(params)
    trainable = (True,) * len(part.paths)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.ones_like(p) * 0.1, params)
    new_p, new_s = opt.apply(params, grads, state, part, trainable,
                             lr_groups=jnp.asarray([0.02], jnp.float32))
    for k in ("word_embed", "block"):
        assert jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: a.shape == b.shape, new_p[k], params[k]))
    # every trainable leaf moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()) > 0, new_p, params)
    assert all(jax.tree_util.tree_leaves(moved))


def test_frozen_leaves_untouched():
    params = _params(np.random.default_rng(1))
    opt = Optimizer("Muon")
    part = build_partition(params)
    state = opt.init(params)
    trainable = tuple(path[0] == "block" for path in part.paths)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    new_p, new_s = opt.apply(params, grads, state, part, trainable,
                             lr_groups=jnp.asarray([0.02], jnp.float32))
    np.testing.assert_array_equal(np.asarray(new_p["word_embed"]["weight"]),
                                  np.asarray(params["word_embed"]["weight"]))
    assert not np.allclose(np.asarray(new_p["block"]["kernel"]),
                           np.asarray(params["block"]["kernel"]))


class _Net(nn.Module):
    layer_group_prefixes = None
    head_prefixes = ("head",)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(nn.Dense(64, name="body")(x))
        return nn.Dense(1, name="head")(h)[:, 0]


def test_muon_learner_trains():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(256, 8)).astype(np.float32)
    y = x.sum(1).astype(np.float32)
    ds = ArrayDataset(x, y)
    data = types.SimpleNamespace(
        target_type="cont", bs=128,
        train_dl=DataLoader(ds, 128, shuffle=True, prefetch=0),
        val_dl=DataLoader(ds, 128, prefetch=0), train_ds=ds, val_ds=ds)
    learner = Learner("/tmp/test_muon", data, _Net(), "Muon",
                      mesh=get_mesh(8))
    learner.fit(2e-2, 15, wd=1e-5)
    val = [row[1] for row in learner.values]
    assert val[-1] < 0.1 * val[0], val
