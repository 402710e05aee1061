"""Lion: differential exactness vs optax.lion (including the decoupled-wd
formulation), single-buffer state, and Learner-level training.

The implementation (core/optim.py kind='lion') follows Chen et al. 2023:
update = sign(b1*m + (1-b1)*g), buffer m = b2*m + (1-b2)*g.  The repo's
shared multiplicative pre-step weight decay p *= 1 - wd*lr is algebraically
identical to optax.lion's additive add_decayed_weights, so optax is the
oracle for both paths.
"""

import types

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuralnetworklibrary_tpu.core.optim import Optimizer
from neuralnetworklibrary_tpu.core.partition import build_partition
from neuralnetworklibrary_tpu.core.pytree import flatten_params
from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.parallel.mesh import get_mesh


def _make_params(rng):
    return {
        "w": jnp.asarray(rng.normal(0, 1, (48, 32)), jnp.float32),
        "emb": jnp.asarray(rng.normal(0, 1, (96, 16)), jnp.float32),
        "bias": jnp.asarray(rng.normal(0, 1, (32,)), jnp.float32),
        "scalar": jnp.asarray(rng.normal(), jnp.float32),
    }


def _run_pair(wd):
    """Step our Lion and optax.lion side by side; return both param dicts."""
    rng = np.random.default_rng(0)
    params = _make_params(rng)

    opt = Optimizer("Lion", wd=wd)
    part = build_partition(params)
    trainable = (True,) * len(part.paths)
    state = opt.init(params)
    lr = jnp.asarray([3e-4], jnp.float32)
    wd_groups = None if wd is None else jnp.asarray([wd], jnp.float32)

    ref = optax.lion(learning_rate=3e-4, weight_decay=wd or 0.0)
    ref_params = dict(params)
    ref_state = ref.init(ref_params)

    ours = dict(params)
    for step in range(8):
        grads = jax.tree.map(
            lambda p: jnp.asarray(rng.normal(0, 1, p.shape), jnp.float32),
            ours)
        ours, state = opt.apply(ours, grads, state, part, trainable,
                                lr_groups=lr, wd_groups=wd_groups)
        upd, ref_state = ref.update(grads, ref_state, ref_params)
        ref_params = optax.apply_updates(ref_params, upd)
        for key in params:
            np.testing.assert_allclose(
                np.asarray(ours[key]), np.asarray(ref_params[key]),
                rtol=1e-6, atol=1e-8, err_msg=f"{key} step {step} wd={wd}")
    return ours, ref_params


def test_lion_matches_optax():
    _run_pair(wd=None)


def test_lion_matches_optax_with_weight_decay():
    _run_pair(wd=0.1)


def test_lion_state_is_one_buffer():
    """Lion's memory point: a single momentum slot per leaf, no v, no t."""
    params = _make_params(np.random.default_rng(1))
    flat = flatten_params(Optimizer("Lion").init(params))
    assert flat[("w", "m")].shape == (48, 32)
    assert ("w", "v") not in flat
    assert ("w", "t") not in flat


def test_lion_frozen_leaves_untouched():
    params = _make_params(np.random.default_rng(2))
    opt = Optimizer("Lion")
    part = build_partition(params)
    state = opt.init(params)
    trainable = tuple(path[0] == "w" for path in part.paths)
    grads = jax.tree.map(lambda p: jnp.ones_like(p), params)
    new_p, new_s = opt.apply(params, grads, state, part, trainable,
                             lr_groups=jnp.asarray([1e-3], jnp.float32))
    assert not np.allclose(np.asarray(new_p["w"]), np.asarray(params["w"]))
    for key in ("emb", "bias", "scalar"):
        np.testing.assert_array_equal(np.asarray(new_p[key]),
                                      np.asarray(params[key]))
        np.testing.assert_array_equal(
            np.asarray(flatten_params(new_s)[(key, "m")]), 0.0)


class _Net(nn.Module):
    layer_group_prefixes = None
    head_prefixes = ("head",)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(nn.Dense(64, name="body")(x))
        return nn.Dense(1, name="head")(h)[:, 0]


def test_lion_learner_trains():
    """Lion through the mesh-sharded Learner converges on the regression toy
    (lr ~3-10x below an Adam setting, per the paper's guidance)."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(256, 8)).astype(np.float32)
    y = x.sum(1).astype(np.float32)
    ds = ArrayDataset(x, y)
    data = types.SimpleNamespace(
        target_type="cont", bs=128,
        train_dl=DataLoader(ds, 128, shuffle=True, prefetch=0),
        val_dl=DataLoader(ds, 128, prefetch=0), train_ds=ds, val_ds=ds)
    learner = Learner("/tmp/test_lion", data, _Net(), "Lion",
                      mesh=get_mesh(8))
    learner.fit(5e-3, 18, wd=1e-5)
    val = [row[1] for row in learner.values]
    assert val[-1] < 0.2 * val[0], val
