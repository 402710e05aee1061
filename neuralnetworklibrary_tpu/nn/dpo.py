"""Direct Preference Optimization — alignment fine-tuning for the
transformer family.

Beyond reference parity: the reference's fine-tuning story ends at ULMFiT
classification transfer (Applications/Text.py:577-651); it has no
preference-optimization stage.  DPO (Rafailov et al. 2023) trains a policy
directly on preference pairs — no reward model, no PPO rollouts — which maps
cleanly onto this framework's jitted Learner step: one forward over the
stacked (chosen, rejected) pair per example, a closed-form logistic loss on
the sequence log-probability margins, everything static-shape.

The pieces (composable with LoRA, FSDP, TP, grad_accum — it's just a model
plus a loss):

- :class:`PairedLM` — flax wrapper flattening (B, 2, T) preference pairs
  into a (2B, T) forward of the wrapped :class:`TransformerLM`, returning
  (B, 2, T, V) logits.  Learner layer-group / head / LoRA contracts forward
  to the inner model (paths gain the ``lm/`` prefix).
- :func:`reference_logprobs` — frozen-reference per-sequence logprob sums,
  precomputed once over the dataset (the DPO trick: the reference policy
  never runs inside the training step).
- :class:`PreferenceDataset` / :func:`preference_collate` — items are
  (tokens (2,T), targets (2,T), completion mask (2,T), ref_lp (2,)); the
  collate packs y = (targets, mask, ref_lp) so the standard DataLoader /
  Learner pipeline carries the whole tuple to the loss.
- :class:`DPOLoss` — -log σ(β·margin) with optional conservative label
  smoothing, or the IPO square loss (Azar et al. 2023) via ``ipo=True``.
- :class:`DPORewardAccuracy` — fraction of pairs whose implicit reward
  margin is positive (the quantity DPO pushes toward 1).

Typical run::

    ref_lp = reference_logprobs(model, base_params, tokens, targets, mask)
    ds     = PreferenceDataset(tokens, targets, mask, ref_lp)
    dl     = DataLoader(ds, bs, shuffle=True, collate=preference_collate)
    data   = ...  # target_type="dpo", train_dl/val_dl = dl
    learner = Learner(path, data, PairedLM(lm=model), "Adam2",
                      loss_func=DPOLoss(beta=0.1))
    learner.set_params({"lm": base_params})       # start FROM the reference
                                                  # (copies — donation-safe)
    learner.fit_one_cycle(lr, epochs, metrics=[DPORewardAccuracy(beta=0.1)])
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class PairedLM(nn.Module):
    """Run the wrapped LM over (B, 2, T) chosen/rejected pairs in ONE
    (2B, T) forward — pairs ride the batch axis, so the MXU sees one large
    matmul stream and data parallelism shards pairs like any batch."""

    lm: Any  # TransformerLM (or any (B, T) -> (logits, ...) flax LM)

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, two, T = x.shape
        out = self.lm(x.reshape(B * two, T), train=train)
        logits = out[0] if isinstance(out, tuple) else out
        return logits.reshape(B, two, T, -1)

    @property
    def layer_group_prefixes(self):
        inner = getattr(self.lm, "layer_group_prefixes", None)
        if inner is None:
            return None
        return [[f"lm/{p}" for p in group] for group in inner]

    @property
    def head_prefixes(self):
        return tuple(f"lm/{p}"
                     for p in getattr(self.lm, "head_prefixes", ("head",)))


def sequence_logprobs(logits, targets, mask):
    """Per-sequence sums of target-token logprobs.  logits (..., T, V),
    targets (..., T) int, mask (..., T) float (1 on completion tokens —
    prompt and padding excluded).  Returns (...,) float32."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok = jnp.take_along_axis(
        logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return jnp.sum(tok * mask, axis=-1)


class DPOLoss:
    """Preference loss on the implicit-reward margin
    m = β·[(logπ_c − logref_c) − (logπ_r − logref_r)]:

    - DPO:  (1−ls)·(−log σ(m)) + ls·(−log σ(−m))   (ls = conservative
      label smoothing for noisy preference labels, Mitchell 2023)
    - IPO (``ipo=True``): (m/β − 1/(2β))² — bounded, no σ saturation
      (Azar et al. 2023).

    Call: (outputs (B, 2, T, V) from PairedLM — column 0 chosen, column 1
    rejected; y = (targets (B,2,T), mask (B,2,T), ref_lp (B,2))); an
    optional row mask (B,) from the loader weighs padded rows out."""

    def __init__(self, beta: float = 0.1, label_smoothing: float = 0.0,
                 ipo: bool = False):
        if beta <= 0:
            raise ValueError(f"beta must be > 0, got {beta}")
        if not 0 <= label_smoothing < 0.5:
            raise ValueError(
                f"label_smoothing must be in [0, 0.5), got {label_smoothing}")
        self.beta = float(beta)
        self.ls = float(label_smoothing)
        self.ipo = bool(ipo)

    def margin(self, outputs, y):
        targets, tok_mask, ref_lp = y
        pi_lp = sequence_logprobs(outputs, targets, tok_mask)    # (B, 2)
        m = (pi_lp[:, 0] - ref_lp[:, 0]) - (pi_lp[:, 1] - ref_lp[:, 1])
        return self.beta * m

    def __call__(self, outputs, y, mask=None):
        m = self.margin(outputs, y)
        if self.ipo:
            per = (m / self.beta - 1.0 / (2.0 * self.beta)) ** 2
        else:
            per = (-(1.0 - self.ls) * jax.nn.log_sigmoid(m)
                   - self.ls * jax.nn.log_sigmoid(-m))
        if mask is not None:
            return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return jnp.mean(per)


class DPORewardAccuracy:
    """Fraction of pairs whose implicit reward prefers the chosen response
    (margin > 0) — the observable DPO drives toward 1.0."""

    def __init__(self, beta: float = 0.1):
        self._loss = DPOLoss(beta=beta)
        self.__name__ = "dpo_acc"

    def __call__(self, outputs, y, mask=None):
        correct = (self._loss.margin(outputs, y) > 0).astype(jnp.float32)
        if mask is not None:
            return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return jnp.mean(correct)


def reference_logprobs(model, params, tokens, targets, mask, bs: int = 32):
    """Frozen-reference per-sequence logprobs for the whole preference set,
    computed once up front (the training step never runs the reference).
    tokens/targets/mask: (N, 2, T); returns (N, 2) float32 (np)."""
    tokens = np.asarray(tokens)
    N, two, T = tokens.shape

    @jax.jit
    def score(tok, tgt, msk):
        out = model.apply({"params": params}, tok.reshape(-1, T))
        logits = out[0] if isinstance(out, tuple) else out
        return sequence_logprobs(logits, tgt.reshape(-1, T),
                                 msk.reshape(-1, T)).reshape(-1, two)

    out = np.empty((N, two), np.float32)
    for i in range(0, N, bs):
        j = min(i + bs, N)
        k = max(j - bs, 0)  # full-width chunk (one jit shape), overlap-safe
        out[k:j] = np.asarray(score(jnp.asarray(tokens[k:j]),
                                    jnp.asarray(targets[k:j]),
                                    jnp.asarray(mask[k:j])))
    return out


class PreferenceDataset:
    """Items: (tokens (2, T) int32, targets (2, T) int32, completion mask
    (2, T) float32, ref_lp (2,) float32).  Use with
    ``DataLoader(..., collate=preference_collate)``."""

    def __init__(self, tokens, targets, mask, ref_lp):
        self.tokens = np.asarray(tokens, np.int32)
        self.targets = np.asarray(targets, np.int32)
        self.mask = np.asarray(mask, np.float32)
        self.ref_lp = np.asarray(ref_lp, np.float32)
        n = len(self.tokens)
        if not (len(self.targets) == len(self.mask) == len(self.ref_lp) == n):
            raise ValueError("preference arrays must share their length")
        if self.tokens.ndim != 3 or self.tokens.shape[1] != 2:
            raise ValueError(
                f"tokens must be (N, 2, T) pairs, got {self.tokens.shape}")

    def __len__(self):
        return len(self.tokens)

    def __getitem__(self, i):
        return (self.tokens[i], self.targets[i], self.mask[i], self.ref_lp[i])


def preference_collate(samples):
    """Stack preference items and pack y = (targets, mask, ref_lp) — the
    loader's ``fields[-1]`` convention carries the tuple to the loss."""
    tok, tgt, msk, ref = (np.stack([s[i] for s in samples]) for i in range(4))
    return (tok, (tgt, msk, ref))


def build_preference_pairs(prompts, chosen, rejected, pad_token: int = 0,
                           length: Optional[int] = None):
    """Assemble (tokens, targets, mask) arrays from per-example token lists.
    Each sequence is ``prompt + completion``; targets are the next tokens;
    the mask covers exactly the completion's target positions (the prompt
    is conditioned on, never scored — Rafailov et al. §4).  Sequences pad
    to ``length`` (default: longest pair)."""
    if not (len(prompts) == len(chosen) == len(rejected)):
        raise ValueError("prompts/chosen/rejected must share their length")
    seqs = []
    for p, c, r in zip(prompts, chosen, rejected):
        if len(p) < 1 or len(c) < 1 or len(r) < 1:
            raise ValueError("prompts and completions must be non-empty")
        seqs.append((list(p) + list(c), list(p) + list(r), len(p)))
    L = max(max(len(a), len(b)) for a, b, _ in seqs)
    if length is not None:
        if length < L:
            raise ValueError(f"length {length} < longest pair {L}")
        L = length
    N = len(seqs)
    tokens = np.full((N, 2, L - 1), pad_token, np.int32)
    targets = np.full((N, 2, L - 1), pad_token, np.int32)
    mask = np.zeros((N, 2, L - 1), np.float32)
    for i, (a, b, np_len) in enumerate(seqs):
        for col, s in enumerate((a, b)):
            s = np.asarray(s, np.int32)
            tokens[i, col, : len(s) - 1] = s[:-1]
            targets[i, col, : len(s) - 1] = s[1:]
            mask[i, col, np_len - 1 : len(s) - 1] = 1.0
    return tokens, targets, mask
