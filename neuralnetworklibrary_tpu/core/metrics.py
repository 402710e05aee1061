"""Losses and metrics.

Ports the semantics of General/LossesMetrics.py plus the built-in torch losses
the reference registry uses (Learner.py:20-21: MSELoss, CrossEntropyLoss,
BCEWithLogitsLoss) to pure jnp callables.

TPU-native difference: every loss/metric takes an optional ``mask`` over the
batch dimension.  The reference lets the final short minibatch of an epoch keep
its dynamic size and rescales the learning rate (Learner.py:503-505); under XLA
we instead pad every batch to a static shape and mask the padded rows — a
masked mean over valid rows combined with the same lr rescale reproduces the
reference's effective update exactly, with zero recompiles.

Protocol: ``loss(y_pred, y, mask=None) -> scalar`` (jnp).  Metrics follow the
same signature; "end metrics" (computed on the full concatenated predictions,
e.g. AUC — Learner.py:16, :467-473) are host-side callables registered in
:data:`end_metrics`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _expand(mask, ndim):
    """Broadcast a (N,) batch mask against an (N, ...) array."""
    return mask.reshape(mask.shape + (1,) * (ndim - 1))


def masked_mean(values: jax.Array, mask=None) -> jax.Array:
    """Mean over all elements, counting only rows where mask is 1."""
    if mask is None:
        return jnp.mean(values)
    mask = _expand(mask.astype(values.dtype), values.ndim)
    weights = jnp.broadcast_to(mask, values.shape)
    return jnp.sum(values * weights) / jnp.maximum(jnp.sum(weights), 1.0)


# ---------------------------------------------------------------------------
# Losses (the loss_func_dict equivalents, Learner.py:20-21)
# ---------------------------------------------------------------------------

def mse_loss(y_pred, y, mask=None):
    """nn.MSELoss(): mean squared error over all elements."""
    return masked_mean(jnp.square(y_pred - y.astype(y_pred.dtype)), mask)


def cross_entropy_loss(y_pred, y, mask=None):
    """nn.CrossEntropyLoss(): softmax CE over logits (N, C) w/ int labels (N,).
    Tuple model outputs (logits, aux...) are unwrapped to their first element."""
    if isinstance(y_pred, tuple):
        y_pred = y_pred[0]
    logp = jax.nn.log_softmax(y_pred, axis=-1)
    nll = -jnp.take_along_axis(logp, y[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return masked_mean(nll, mask)


def seq_cross_entropy_loss(y_pred, y, mask=None):
    """Token-level CE over (B, T, V) logits vs (B, T) targets — the default
    language-model loss (the unregularized part of Text.py:756-777)."""
    if isinstance(y_pred, tuple):
        y_pred = y_pred[0]
    logp = jax.nn.log_softmax(y_pred, axis=-1)
    nll = -jnp.take_along_axis(logp, y[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return masked_mean(nll, mask)


class LabelSmoothingCrossEntropy:
    """Softmax CE with uniform label smoothing (beyond reference parity —
    a standard regularizer the reference lacks): the target distribution is
    (1-ε)·one_hot + ε/C, equivalently loss = (1-ε)·NLL + ε·mean(-logp).
    Works for (N, C) classification and (B, T, V) sequence logits; tuple
    model outputs unwrap to their first element."""

    def __init__(self, smoothing: float = 0.1):
        if not 0.0 <= smoothing < 1.0:
            raise ValueError(f"smoothing must be in [0, 1), got {smoothing}")
        self.smoothing = smoothing

    def __call__(self, y_pred, y, mask=None):
        if isinstance(y_pred, tuple):
            y_pred = y_pred[0]
        logp = jax.nn.log_softmax(y_pred, axis=-1)
        nll = -jnp.take_along_axis(
            logp, y[..., None].astype(jnp.int32), axis=-1)[..., 0]
        uniform = -jnp.mean(logp, axis=-1)
        eps = self.smoothing
        return masked_mean((1.0 - eps) * nll + eps * uniform, mask)


def bce_with_logits_loss(y_pred, y, mask=None):
    """nn.BCEWithLogitsLoss(): elementwise sigmoid BCE, mean over all elements."""
    y = y.astype(y_pred.dtype)
    # log-sum-exp stable form: max(x,0) - x*y + log(1 + exp(-|x|))
    x = y_pred
    losses = jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return masked_mean(losses, mask)


loss_func_dict = {
    "cont": mse_loss,
    "cat": cross_entropy_loss,
    "single_label": cross_entropy_loss,
    "multi_label": bce_with_logits_loss,
    "text_classify": cross_entropy_loss,
    "lang_model": seq_cross_entropy_loss,
}


# ---------------------------------------------------------------------------
# Regression losses (LossesMetrics.py:18-42)
# ---------------------------------------------------------------------------

def MSPE_loss(y_pred, y, mask=None):
    """Mean square percentage error (LossesMetrics.py:18)."""
    return masked_mean(jnp.square((y_pred - y) / y), mask)


def logMSE_loss(y_pred, y, mask=None):
    """MSE of logs (LossesMetrics.py:25) — stable MSPE approximation."""
    return masked_mean(jnp.square(jnp.log(y_pred) - jnp.log(y)), mask)


def expMSPE_loss(y_pred, y, mask=None):
    """MSPE of exponentiated predictions (LossesMetrics.py:34) — the Rossmann
    metric when training on log targets."""
    ep, et = jnp.exp(y_pred), jnp.exp(y)
    return masked_mean(jnp.square((ep - et) / et), mask)


# ---------------------------------------------------------------------------
# Classification metrics
# ---------------------------------------------------------------------------

def accuracy(y_pred, y, mask=None):
    """Single-label accuracy: argmax over logits vs int labels."""
    correct = (jnp.argmax(y_pred, axis=-1) == y).astype(jnp.float32)
    return masked_mean(correct, mask)


def multi_label_accuracy(y_pred, y, mask=None):
    """Elementwise accuracy of thresholded sigmoids (Learner.py:463-465,480)."""
    pred = jnp.round(jax.nn.sigmoid(y_pred))
    return masked_mean((pred == y.astype(pred.dtype)).astype(jnp.float32), mask)


class fbeta_loss:
    """Thresholded F-beta for multi-label classification (LossesMetrics.py:44-78).

    With ``use_thresh``, predictions are ``sigmoid(y_pred) >= threshold``; the
    per-sample F-beta is averaged over the batch.
    """

    def __init__(self, beta, threshold=0.5, use_thresh=True, eps=1e-9):
        self.beta, self.threshold, self.use_thresh, self.eps = beta, threshold, use_thresh, eps

    def __call__(self, y_pred, y, mask=None):
        beta2 = self.beta ** 2
        if self.use_thresh:
            y_pred = (jax.nn.sigmoid(y_pred) >= self.threshold).astype(jnp.float32)
        else:
            y_pred = y_pred.astype(jnp.float32)
        y = y.astype(jnp.float32)
        tp = jnp.sum(y_pred * y, axis=1)
        p = tp / (jnp.sum(y_pred, axis=1) + self.eps)
        r = tp / (jnp.sum(y, axis=1) + self.eps)
        f = (1 + beta2) * p * r / (beta2 * p + r + self.eps)
        return masked_mean(f, mask)


class kPrecision:
    """precision@k for single-label classification (LossesMetrics.py:80-107):
    per sample, 1/(j+1) where j is the *last* position (< k) at which the true
    label appears in the descending sort of predictions, else 0."""

    def __init__(self, k):
        self.k = k

    def __call__(self, y_pred, y, mask=None):
        _, top = jax.lax.top_k(y_pred, self.k)
        hits = top == y[:, None].astype(top.dtype)
        idxs = jnp.arange(self.k)
        # last hit wins (the reference loop overwrites `precision` per hit)
        last_hit = jnp.max(jnp.where(hits, idxs, -1), axis=1)
        per_sample = jnp.where(last_hit >= 0, 1.0 / (last_hit + 1.0), 0.0)
        return masked_mean(per_sample, mask)


class AUC:
    """ROC AUC for binary classification (LossesMetrics.py:110-124).

    An "end metric": computed host-side on the full dataset like the
    reference's sklearn call — but memory-bounded: ``prepare`` reduces each
    batch to the positive-class probability (f32) and an int8 label, so
    evaluating a 100k-row val set stores ~500 KB instead of the full logits.
    """

    is_end_metric = True

    def prepare(self, y_pred, y):
        """Per-batch host reduction: (N, 2 logits) → (N,) f32 prob, (N,) i8."""
        y_pred = np.asarray(y_pred)
        e = np.exp(y_pred - y_pred.max(axis=1, keepdims=True))
        probs = (e / e.sum(axis=1, keepdims=True))[:, 1].astype(np.float32)
        return probs, np.asarray(y).astype(np.int8)

    def __call__(self, y_pred, y):
        from sklearn.metrics import roc_auc_score

        y_pred = np.asarray(y_pred)
        if y_pred.ndim == 2:  # called directly on raw logits
            y_pred, y = self.prepare(y_pred, y)
        return float(roc_auc_score(np.asarray(y), y_pred))


# End-metric registry (Learner.py:16).
end_metrics = {"auc": AUC}
