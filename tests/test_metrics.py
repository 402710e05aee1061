"""Loss/metric parity vs torch built-ins + masking semantics."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from neuralnetworklibrary_tpu.core import metrics as M


def rng():
    return np.random.default_rng(42)


def test_mse_matches_torch():
    r = rng()
    a, b = r.normal(size=12).astype(np.float32), r.normal(size=12).astype(np.float32)
    ours = float(M.mse_loss(jnp.asarray(a), jnp.asarray(b)))
    theirs = float(F.mse_loss(torch.tensor(a), torch.tensor(b)))
    assert np.isclose(ours, theirs, rtol=1e-5)


def test_cross_entropy_matches_torch():
    r = rng()
    logits = r.normal(size=(8, 5)).astype(np.float32)
    y = r.integers(0, 5, size=8)
    ours = float(M.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(y)))
    theirs = float(F.cross_entropy(torch.tensor(logits), torch.tensor(y)))
    assert np.isclose(ours, theirs, rtol=1e-5)


def test_bce_matches_torch():
    r = rng()
    logits = r.normal(size=(8, 4)).astype(np.float32)
    y = (r.random(size=(8, 4)) > 0.5).astype(np.float32)
    ours = float(M.bce_with_logits_loss(jnp.asarray(logits), jnp.asarray(y)))
    theirs = float(F.binary_cross_entropy_with_logits(torch.tensor(logits), torch.tensor(y)))
    assert np.isclose(ours, theirs, rtol=1e-4)


def test_masked_loss_equals_unpadded():
    """Padding + mask must reproduce the loss of the unpadded batch exactly."""
    r = rng()
    logits = r.normal(size=(8, 5)).astype(np.float32)
    y = r.integers(0, 5, size=8)
    full = float(M.cross_entropy_loss(jnp.asarray(logits[:5]), jnp.asarray(y[:5])))
    mask = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0], jnp.float32)
    masked = float(M.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(y), mask))
    assert np.isclose(full, masked, rtol=1e-5)

    a, b = r.normal(size=(8, 3)).astype(np.float32), r.normal(size=(8, 3)).astype(np.float32)
    full = float(M.mse_loss(jnp.asarray(a[:5]), jnp.asarray(b[:5])))
    masked = float(M.mse_loss(jnp.asarray(a), jnp.asarray(b), mask))
    assert np.isclose(full, masked, rtol=1e-5)


def test_regression_losses():
    preds = jnp.asarray([1.1, 2.2, 2.9])
    target = jnp.asarray([1.0, 2.0, 3.0])
    mspe = float(M.MSPE_loss(preds, target))
    expected = np.mean(((np.array([1.1, 2.2, 2.9]) - np.array([1.0, 2.0, 3.0])) / np.array([1.0, 2.0, 3.0])) ** 2)
    assert np.isclose(mspe, expected, rtol=1e-5)
    # expMSPE(log x) == MSPE(x)
    e = float(M.expMSPE_loss(jnp.log(preds), jnp.log(target)))
    assert np.isclose(e, expected, rtol=1e-4)
    lm = float(M.logMSE_loss(preds, target))
    assert np.isclose(lm, np.mean((np.log([1.1, 2.2, 2.9]) - np.log([1.0, 2.0, 3.0])) ** 2), rtol=1e-4)


def test_accuracy():
    logits = jnp.asarray([[2.0, 1.0], [0.0, 3.0], [5.0, 0.0]])
    y = jnp.asarray([0, 1, 1])
    assert np.isclose(float(M.accuracy(logits, y)), 2 / 3)


def test_fbeta_perfect_predictions():
    y = jnp.asarray([[1, 0, 1], [0, 1, 0]], jnp.float32)
    logits = jnp.where(y > 0, 10.0, -10.0)
    f2 = M.fbeta_loss(beta=2)
    assert float(f2(logits, y)) > 0.999


def test_kprecision():
    # sample 0: true label ranked 1st -> 1; sample 1: ranked 2nd -> 1/2; sample 2: outside top2 -> 0
    preds = jnp.asarray([[5.0, 1.0, 0.0], [4.0, 3.0, 0.0], [4.0, 3.0, 0.0]])
    y = jnp.asarray([0, 1, 2])
    kp = M.kPrecision(k=2)
    assert np.isclose(float(kp(preds, y)), (1.0 + 0.5 + 0.0) / 3)


def test_auc_end_metric():
    r = rng()
    logits = r.normal(size=(64, 2)).astype(np.float32)
    y = r.integers(0, 2, size=64)
    auc = M.AUC()(logits, y)
    from sklearn.metrics import roc_auc_score

    probs = torch.softmax(torch.tensor(logits), dim=1).numpy()[:, 1]
    assert np.isclose(auc, roc_auc_score(y, probs), rtol=1e-5)
    assert M.AUC.is_end_metric


def test_auc_prepare_streaming_matches_direct():
    """The streaming prepare() path (per-batch reduction to prob + int8 label)
    must reproduce the direct full-logits AUC exactly."""
    r = rng()
    logits = r.normal(size=(64, 2)).astype(np.float32)
    y = r.integers(0, 2, size=64)
    auc = M.AUC()
    direct = auc(logits, y)
    ps, ls = [], []
    for i in range(0, 64, 16):
        p, l = auc.prepare(logits[i:i + 16], y[i:i + 16])
        assert p.ndim == 1 and p.dtype == np.float32 and l.dtype == np.int8
        ps.append(p)
        ls.append(l)
    streamed = auc(np.concatenate(ps), np.concatenate(ls))
    assert np.isclose(direct, streamed, rtol=1e-6)


def test_label_smoothing_cross_entropy():
    """ε=0 equals plain CE; ε>0 equals the (1-ε)·one_hot + ε/C target CE
    (numpy oracle), for both (N, C) and (B, T, V) logits."""
    import jax
    import jax.numpy as jnp

    from neuralnetworklibrary_tpu.core.metrics import (
        LabelSmoothingCrossEntropy,
        cross_entropy_loss,
    )

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 1, (6, 5)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, 6), jnp.int32)
    np.testing.assert_allclose(
        float(LabelSmoothingCrossEntropy(0.0)(logits, y)),
        float(cross_entropy_loss(logits, y)), rtol=1e-6)

    eps = 0.2
    logp = np.asarray(jax.nn.log_softmax(logits, -1))
    tgt = (1 - eps) * np.eye(5)[np.asarray(y)] + eps / 5.0
    want = float(np.mean(-np.sum(tgt * logp, -1)))
    got = float(LabelSmoothingCrossEntropy(eps)(logits, y))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # sequence logits with a row mask
    seq = jnp.asarray(rng.normal(0, 1, (2, 4, 5)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 5, (2, 4)), jnp.int32)
    m = jnp.asarray([1.0, 0.0])
    full = LabelSmoothingCrossEntropy(eps)(seq, ys, m)
    only = LabelSmoothingCrossEntropy(eps)(seq[:1], ys[:1])
    np.testing.assert_allclose(float(full), float(only), rtol=1e-6)

    import pytest
    with pytest.raises(ValueError, match="smoothing"):
        LabelSmoothingCrossEntropy(1.0)
