"""Adafactor: differential exactness vs optax.adafactor, factored-state
memory shapes, and Learner-level training.

The implementation (core/optim.py kind='adafactor') targets optax.adafactor's
default semantics exactly — factored second moments over the two largest dims
(min size 128), 1 - t^-0.8 decay, per-leaf update-RMS clip at 1.0, relative
step (x max(RMS(p), 1e-3)) — so optax serves as the oracle here.
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
        "emb": jnp.asarray(rng.normal(0, 1, (256, 192)), jnp.float32),
        "conv": jnp.asarray(rng.normal(0, 0.1, (3, 3, 129, 256)), jnp.float32),
        "small": jnp.asarray(rng.normal(0, 1, (64, 32)), jnp.float32),
        "bias": jnp.asarray(rng.normal(0, 1, (256,)), jnp.float32),
        "scalar": jnp.asarray(rng.normal(), jnp.float32),
    }


def test_adafactor_matches_optax():
    """Six steps with fresh random grads match optax.adafactor leaf-for-leaf
    (factored 2-d, factored 4-d, unfactored small/vector/scalar leaves)."""
    rng = np.random.default_rng(0)
    params = _make_params(rng)

    opt = Optimizer("Adafactor")
    part = build_partition(params)
    trainable = (True,) * len(part.paths)
    state = opt.init(params)
    lr = jnp.asarray([0.01], jnp.float32)

    ref = optax.adafactor(learning_rate=0.01)
    ref_params = dict(params)
    ref_state = ref.init(ref_params)

    ours = dict(params)
    for step in range(6):
        grads = jax.tree.map(
            lambda p: jnp.asarray(rng.normal(0, 1, p.shape), jnp.float32),
            ours)
        ours, state = opt.apply(ours, grads, state, part, trainable,
                                lr_groups=lr)
        upd, ref_state = ref.update(grads, ref_state, ref_params)
        ref_params = optax.apply_updates(ref_params, upd)
        for key in params:
            np.testing.assert_allclose(
                np.asarray(ours[key]), np.asarray(ref_params[key]),
                rtol=1e-5, atol=1e-7, err_msg=f"{key} step {step}")


def test_adafactor_state_is_factored():
    """>=128-dim matrix leaves store O(n+m) row/col stats, small leaves a
    full v — the sublinear-memory contract."""
    params = _make_params(np.random.default_rng(1))
    state = Optimizer("Adafactor").init(params)
    flat = flatten_params(state)
    # (256, 192): factored over both dims (v_row drops the LARGEST dim,
    # optax convention)
    assert flat[("emb", "v_row")].shape == (192,)
    assert flat[("emb", "v_col")].shape == (256,)
    # (3, 3, 129, 256): factored over the two largest dims (2, 3)
    assert flat[("conv", "v_row")].shape == (3, 3, 129)
    assert flat[("conv", "v_col")].shape == (3, 3, 256)
    # below min_dim_size_to_factor: full second moment
    assert flat[("small", "v")].shape == (64, 32)
    assert flat[("bias", "v")].shape == (256,)
    assert flat[("scalar", "v")].shape == ()
    assert ("emb", "m") not in flat  # no first moment: the memory point


def test_adafactor_frozen_leaves_untouched():
    params = _make_params(np.random.default_rng(2))
    opt = Optimizer("Adafactor")
    part = build_partition(params)
    state = opt.init(params)
    # freeze everything except 'emb'
    trainable = tuple(path[0] == "emb" for path in part.paths)
    grads = jax.tree.map(lambda p: jnp.ones_like(p), params)
    new_p, new_s = opt.apply(params, grads, state, part, trainable,
                             lr_groups=jnp.asarray([0.01], jnp.float32))
    assert not np.allclose(np.asarray(new_p["emb"]), np.asarray(params["emb"]))
    for key in ("conv", "small", "bias", "scalar"):
        np.testing.assert_array_equal(np.asarray(new_p[key]),
                                      np.asarray(params[key]))
    assert int(flatten_params(new_s)[("conv", "t")]) == 0


class _Net(nn.Module):
    layer_group_prefixes = None
    head_prefixes = ("head",)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(nn.Dense(64, name="body")(x))
        return nn.Dense(1, name="head")(h)[:, 0]


def test_adafactor_learner_trains():
    """Adafactor through the Learner (mesh-sharded) converges on the
    regression toy; relative step sizes mean lr ~ 0.05 is a sane setting."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(256, 8)).astype(np.float32)
    y = x.sum(1).astype(np.float32)
    ds = ArrayDataset(x, y)
    data = types.SimpleNamespace(
        target_type="cont", bs=128,
        train_dl=DataLoader(ds, 128, shuffle=True, prefetch=0),
        val_dl=DataLoader(ds, 128, prefetch=0), train_ds=ds, val_ds=ds)
    learner = Learner("/tmp/test_adafactor", data, _Net(), "Adafactor",
                      mesh=get_mesh(8))
    learner.fit(5e-2, 12, wd=1e-5)
    val = [row[1] for row in learner.values]
    assert val[-1] < 0.2 * val[0], val
