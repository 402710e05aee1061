"""Mixup (Learner mixup=alpha): Beta-blended inputs with the two-term loss,
off by default, trains classification, composes with grad_accum."""

import types

import flax.linen as nn
import numpy as np
import pytest

from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.parallel.mesh import get_mesh


class _Clf(nn.Module):
    layer_group_prefixes = None
    head_prefixes = ("head",)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(nn.Dense(64, name="body")(x))
        return nn.Dense(4, name="head")(h)


def _data(bs=32, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 4, 256).astype(np.int32)
    x = (np.eye(4, 8)[y] * 3 + rng.normal(0, 1, (256, 8))).astype(np.float32)
    ds = ArrayDataset(x, y)
    return types.SimpleNamespace(
        target_type="single_label", bs=bs,
        categories={i: str(i) for i in range(4)},
        train_dl=DataLoader(ds, bs, shuffle=True, prefetch=0),
        val_dl=DataLoader(ds, bs, prefetch=0), train_ds=ds, val_ds=ds)


def _train(mixup, n_epochs=6, **kw):
    learner = Learner("/tmp/test_mixup", _data(), _Clf(), "Adam2",
                      mesh=get_mesh(1), mixup=mixup, **kw)
    learner.fit(5e-3, n_epochs)
    return learner


def test_mixup_zero_matches_off_exactly():
    a = _train(0.0, n_epochs=2)
    b = _train(0, n_epochs=2)
    va = [row[1] for row in a.values]
    vb = [row[1] for row in b.values]
    np.testing.assert_allclose(va, vb, rtol=1e-6)


def test_mixup_trains_to_high_accuracy():
    """Blended inputs still reach ~full accuracy on the separable toy —
    and val evaluation (no mixup at eval) is the clean path."""
    learner = _train(0.4, n_epochs=10)
    acc = [row[2] for row in learner.values]
    assert acc[-1] > 0.9, acc


def test_mixup_composes_with_grad_accum():
    learner = Learner("/tmp/test_mixup", _data(), _Clf(), "Adam2",
                      mesh=get_mesh(1), mixup=0.4, grad_accum=2)
    learner.fit(5e-3, 8)
    acc = [row[2] for row in learner.values]
    assert acc[-1] > 0.85, acc


def test_mixup_rejects_custom_loss_and_grad():
    model = _Clf()
    model.loss_and_grad = lambda *a, **k: None
    with pytest.raises(ValueError, match="mixup"):
        Learner("/tmp/test_mixup", _data(), model, "Adam2",
                mesh=get_mesh(1), mixup=0.4)
