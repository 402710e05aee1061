"""Gradient accumulation (Learner grad_accum=k): k sequential microbatches
inside one jitted step, averaged gradient applied once — numerics match the
unaccumulated step, memory scales down, and the option composes with the
mesh and FSDP."""

import types

import flax.linen as nn
import numpy as np
import pytest

from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.parallel.mesh import get_mesh


class TinyMLP(nn.Module):
    layer_group_prefixes = None
    head_prefixes = ("head",)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(nn.Dense(64, name="body")(x))
        return nn.Dense(1, name="head")(h)[:, 0]


def _data(bs=16, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(128, 8)).astype(np.float32)
    y = x.sum(1).astype(np.float32)
    ds = ArrayDataset(x, y)
    return types.SimpleNamespace(
        target_type="cont", bs=bs,
        train_dl=DataLoader(ds, bs, shuffle=False, prefetch=0),
        val_dl=DataLoader(ds, bs, prefetch=0), train_ds=ds, val_ds=ds)


def _train(accum, mesh=None, n_steps=8, **kw):
    data = _data()
    learner = Learner("/tmp/test_accum", data, TinyMLP(), "Adam2",
                      mesh=mesh, grad_accum=accum, **kw)
    it = iter(data.train_dl)
    losses = []
    for _ in range(n_steps):
        try:
            b = next(it)
        except StopIteration:
            it = iter(data.train_dl)
            b = next(it)
        losses.append(float(learner.train1minibatch(b, 1e-2)))
    return losses, learner


def test_accum_matches_single_step():
    """grad_accum=4 reproduces the unaccumulated trajectory (equal-size
    all-valid microbatches → the averaged microbatch means ARE the full
    batch mean, up to fp reassociation)."""
    base, l1 = _train(1, mesh=get_mesh(1))
    acc, l4 = _train(4, mesh=get_mesh(1))
    np.testing.assert_allclose(acc, base, rtol=1e-4, atol=1e-6)
    a = np.asarray(l1.params["body"]["kernel"])
    b = np.asarray(l4.params["body"]["kernel"])
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6)


def test_accum_on_mesh_and_fsdp():
    """accum=2 × dp=8 (microbatch 8 rows over 8 devices) with FSDP params
    still matches the plain dp run."""
    mesh = get_mesh(8)
    base, _ = _train(1, mesh=mesh)
    acc, learner = _train(2, mesh=mesh, fsdp_sharding=True)
    np.testing.assert_allclose(acc, base, rtol=1e-4, atol=1e-6)


def test_accum_rejects_indivisible_bs():
    data = _data(bs=12)
    with pytest.raises(ValueError, match="grad_accum"):
        Learner("/tmp/test_accum", data, TinyMLP(), "Adam2",
                mesh=get_mesh(1), grad_accum=5)


def test_accum_rejects_custom_loss_and_grad():
    model = TinyMLP()
    model.loss_and_grad = lambda *a, **k: None
    with pytest.raises(ValueError, match="loss_and_grad"):
        Learner("/tmp/test_accum", _data(), model, "Adam2",
                mesh=get_mesh(1), grad_accum=2)


def test_accum_fit_converges_with_batchnorm_state():
    """A model with batch_stats trains through fit() under accumulation —
    the scanned state threading (each microbatch updates the running
    stats sequentially) holds up end-to-end."""

    class BNNet(nn.Module):
        layer_group_prefixes = None
        head_prefixes = ("head",)

        @nn.compact
        def __call__(self, x, train: bool = False):
            h = nn.Dense(32, name="body")(x)
            h = nn.BatchNorm(use_running_average=not train, name="bn")(h)
            return nn.Dense(1, name="head")(nn.relu(h))[:, 0]

    data = _data()
    learner = Learner("/tmp/test_accum_bn", data, BNNet(), "Adam2",
                      mesh=get_mesh(8), grad_accum=2)
    learner.fit(1e-2, 6)
    val = learner.values
    assert val[-1][1] < 0.2 * val[0][1], [row[1] for row in val]


def test_accum_composes_with_zero_sharding():
    """grad_accum=2 under ZeRO-1 moment sharding still matches the plain
    dp run (the averaged gradient feeds the sharded optimizer update)."""
    mesh = get_mesh(8)
    base, _ = _train(1, mesh=mesh)
    # (TinyMLP's leaves are below zero_rule's min_size, so the moments stay
    # replicated here — sharding engagement is test_zero.py's job; this
    # test pins that the two FEATURES compose without changing numerics)
    acc, _ = _train(2, mesh=mesh, zero_sharding=True)
    np.testing.assert_allclose(acc, base, rtol=1e-4, atol=1e-6)
