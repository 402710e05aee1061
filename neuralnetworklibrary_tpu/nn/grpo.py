"""Group Relative Policy Optimization — RL fine-tuning for the transformer
family (GRPO; Shao et al. 2024, DeepSeekMath).

Beyond reference parity: the reference has no RL stage at all; together
with nn/dpo.py this completes the post-training stack (SFT → preference /
reward optimization).  GRPO is PPO without the value network: for each
prompt the policy samples a GROUP of G completions, each completion's
advantage is its reward z-scored WITHIN the group, and the policy ascends
the clipped importance-ratio objective with a per-token KL penalty against
a frozen reference.  No critic, no GAE — which maps cleanly onto this
framework's jitted Learner step: everything is static-shape (N, G, T)
arrays, the rollout is the existing KV-cached ``generate``, and the update
is an ordinary Learner minibatch over a rollout-built dataset.

The pieces (composable with LoRA, FSDP, TP, grad_accum):

- :class:`GroupedLM` — flax wrapper flattening (B, G, T) groups into a
  (B·G, T) forward of the wrapped :class:`TransformerLM` (same mechanism
  as dpo.PairedLM, group-size agnostic).
- :func:`group_advantages` — (N, G) rewards → within-group z-scores.
- :func:`grpo_collect` — one on-policy iteration's data: sample G
  completions per prompt, score rewards, compute per-token logprobs under
  the sampling-time policy (π_old) and the frozen reference.
- :class:`GRPODataset` / :func:`grpo_collate` — Learner-pipeline carriers.
- :class:`GRPOLoss` — −E[min(ρ·A, clip(ρ, 1±ε)·A) − β·KL₃(π‖ref)] with
  ρ the per-token importance ratio and KL₃ the unbiased low-variance
  estimator exp(q−p) − (q−p) − 1 (Schulman 2020).

Typical iteration (repeat: collect → a few inner epochs)::

    roll = grpo_collect(model, learner.params, prompts, G=8, n_new=64,
                        reward_fn=my_reward, ref_params=base_params,
                        seed=it)
    ds   = GRPODataset(*roll[:6])
    dl   = DataLoader(ds, bs, shuffle=True, collate=grpo_collate)
    data = ...  # target_type="grpo", train_dl/val_dl = dl
    learner = Learner(path, data, GroupedLM(lm=model), "Adam2",
                      loss_func=GRPOLoss(beta=0.04, clip_eps=0.2))
    learner.set_params({"lm": policy_params})   # copies (donation-safe)
    for _ in range(mu_inner):
        for b in data.train_dl: learner.train1minibatch(b, lr)
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neuralnetworklibrary_tpu.nn.dpo import PairedLM


class GroupedLM(PairedLM):
    """(B, G, T) → (B, G, T, V): groups ride the batch axis through ONE
    (B·G, T) forward of the wrapped LM (PairedLM's reshape is group-size
    agnostic; the name marks intent).  Learner layer-group / head / LoRA
    contracts forward to the inner model (paths gain the ``lm/`` prefix)."""


def token_logprobs(logits, targets):
    """Per-token target logprobs: logits (..., T, V), targets (..., T) int
    → (..., T) float32."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(
        logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]


def group_advantages(rewards, eps: float = 1e-4):
    """(N, G) rewards → within-group z-scores (the GRPO advantage: no
    critic, the group IS the baseline).  A constant-reward group (std 0)
    gets all-zero advantages — no gradient, the correct degenerate case."""
    r = jnp.asarray(rewards, jnp.float32)
    if r.ndim != 2:
        raise ValueError(f"rewards must be (N, G), got {r.shape}")
    mu = r.mean(axis=1, keepdims=True)
    sd = r.std(axis=1, keepdims=True)
    return (r - mu) / (sd + eps)


class GRPOLoss:
    """Clipped-ratio policy gradient with a KL penalty to a frozen
    reference, token-level:

        ρ_t  = exp(logπ_t − logπ_old_t)
        pg_t = min(ρ_t·A, clip(ρ_t, 1−ε, 1+ε)·A)       (A per sequence)
        kl_t = exp(logref_t − logπ_t) − (logref_t − logπ_t) − 1
        loss = −mean_seq[ Σ_t mask·(pg_t − β·kl_t) / Σ_t mask ]

    Call: (outputs (B, G, T, V) from GroupedLM; y = (targets (B,G,T),
    token mask (B,G,T), advantages (B,G), old_lp (B,G,T), ref_lp
    (B,G,T))); an optional row mask (B,) weighs padded rows out.  With
    ``beta=0`` ref_lp is ignored (pass zeros).  On the FIRST inner update
    after a collect, ρ ≡ 1 and the objective reduces to the plain
    group-baselined REINFORCE gradient (pinned in tests/test_grpo.py)."""

    def __init__(self, beta: float = 0.0, clip_eps: float = 0.2):
        if beta < 0:
            raise ValueError(f"beta must be >= 0, got {beta}")
        if not 0 < clip_eps < 1:
            raise ValueError(f"clip_eps must be in (0, 1), got {clip_eps}")
        self.beta = float(beta)
        self.clip_eps = float(clip_eps)

    def __call__(self, outputs, y, mask=None):
        targets, tok_mask, adv, old_lp, ref_lp = y
        logp = token_logprobs(outputs, targets)              # (B, G, T)
        ratio = jnp.exp(logp - old_lp)
        a = adv[..., None]                                   # (B, G, 1)
        pg = jnp.minimum(
            ratio * a,
            jnp.clip(ratio, 1.0 - self.clip_eps, 1.0 + self.clip_eps) * a)
        obj = pg
        if self.beta > 0:
            d = ref_lp - logp
            obj = obj - self.beta * (jnp.exp(d) - d - 1.0)
        denom = jnp.maximum(tok_mask.sum(axis=-1), 1.0)      # (B, G)
        per_seq = (obj * tok_mask).sum(axis=-1) / denom
        per_row = per_seq.mean(axis=-1)                      # (B,)
        if mask is not None:
            return -jnp.sum(per_row * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return -jnp.mean(per_row)


class GRPOMeanKL:
    """Masked mean of the KL₃ estimate vs the reference — the quantity the
    β penalty bounds (watch it to catch policy drift)."""

    def __init__(self):
        self.__name__ = "grpo_kl"

    def __call__(self, outputs, y, mask=None):
        targets, tok_mask, _, _, ref_lp = y
        logp = token_logprobs(outputs, targets)
        d = ref_lp - logp
        kl = (jnp.exp(d) - d - 1.0) * tok_mask
        w = tok_mask
        if mask is not None:
            kl = kl * mask[:, None, None]
            w = w * mask[:, None, None]
        return jnp.sum(kl) / jnp.maximum(jnp.sum(w), 1.0)


def _score_logprobs(model, params, tokens, targets, bs: int):
    """Per-token logprobs of ``targets`` under ``model(params)`` in
    full-width jit chunks (one compile shape).  tokens/targets (N, T) np
    → (N, T) float32 np."""
    N, T = tokens.shape

    @jax.jit
    def score(tok, tgt):
        out = model.apply({"params": params}, tok)
        logits = out[0] if isinstance(out, tuple) else out
        return token_logprobs(logits, tgt)

    out = np.empty((N, T), np.float32)
    for i in range(0, N, bs):
        j = min(i + bs, N)
        k = max(j - bs, 0)  # full-width chunk, overlap-safe
        out[k:j] = np.asarray(score(jnp.asarray(tokens[k:j]),
                                    jnp.asarray(targets[k:j])))
    return out


def grpo_collect(model, params, prompts, G: int, n_new: int,
                 reward_fn: Callable, ref_params=None,
                 temperature: float = 1.0, k: int = 0, seed: int = 0,
                 score_bs: int = 32):
    """One GRPO iteration's on-policy data.

    model: the UNWRAPPED TransformerLM (rollouts need its KV-cache decode).
    prompts: (N, P) int32 — fixed-width prompt block (left-pad upstream if
    needed; static shapes are the TPU contract).
    reward_fn(prompts (N, P), completions (N, G, n_new)) → (N, G) floats.
    k: top-k truncation for the sampler (0 → the full vocab, the unbiased
    on-policy choice).  NOTE: ``old_lp`` scores the UNTEMPERED policy —
    with ``temperature=1.0`` and ``k=0`` the behavior policy equals the
    scored policy and the importance ratios are exact; other settings make
    the rollout mildly off-policy (the clipped objective tolerates it,
    but temperature=1 is the faithful GRPO regime).
    ref_params: frozen reference for the KL penalty (None → zeros; use
    ``GRPOLoss(beta=0)``).

    Returns (tokens (N,G,T), targets (N,G,T), mask (N,G,T), advantages
    (N,G), old_lp (N,G,T), ref_lp (N,G,T), rewards (N,G)) numpy arrays,
    T = P + n_new − 1; mask covers exactly the completion targets.
    """
    from neuralnetworklibrary_tpu.nn.transformer import generate

    prompts = np.asarray(prompts, np.int32)
    if prompts.ndim != 2:
        raise ValueError(f"prompts must be (N, P), got {prompts.shape}")
    if G < 2:
        raise ValueError(f"G must be >= 2 (the group is the baseline), "
                         f"got {G}")
    N, P = prompts.shape
    rep = np.repeat(prompts, G, axis=0)                      # (N·G, P)
    comp = np.asarray(generate(
        model, params, jnp.asarray(rep), n_new,
        k=k or model.vocab_size, temperature=temperature, seed=seed))
    seq = np.concatenate([rep, comp], axis=1)                # (N·G, P+n_new)
    tokens, targets = seq[:, :-1], seq[:, 1:]
    T = tokens.shape[1]
    mask = np.zeros((N * G, T), np.float32)
    mask[:, P - 1:] = 1.0                                    # completion targets
    rewards = np.asarray(reward_fn(prompts, comp.reshape(N, G, n_new)),
                         np.float32)
    if rewards.shape != (N, G):
        raise ValueError(
            f"reward_fn must return (N, G) = ({N}, {G}), got {rewards.shape}")
    adv = np.asarray(group_advantages(rewards))
    old_lp = _score_logprobs(model, params, tokens, targets, score_bs)
    ref_lp = (np.zeros_like(old_lp) if ref_params is None else
              _score_logprobs(model, ref_params, tokens, targets, score_bs))
    shp = (N, G, T)
    return (tokens.reshape(shp), targets.reshape(shp), mask.reshape(shp),
            adv, old_lp.reshape(shp), ref_lp.reshape(shp), rewards)


class GRPODataset:
    """Items: (tokens (G, T) int32, y-parts...) matching GRPOLoss's y
    tuple.  Use with ``DataLoader(..., collate=grpo_collate)``."""

    def __init__(self, tokens, targets, mask, advantages, old_lp, ref_lp):
        self.tokens = np.asarray(tokens, np.int32)
        self.targets = np.asarray(targets, np.int32)
        self.mask = np.asarray(mask, np.float32)
        self.advantages = np.asarray(advantages, np.float32)
        self.old_lp = np.asarray(old_lp, np.float32)
        self.ref_lp = np.asarray(ref_lp, np.float32)
        n = len(self.tokens)
        if self.tokens.ndim != 3:
            raise ValueError(
                f"tokens must be (N, G, T) groups, got {self.tokens.shape}")
        for a in (self.targets, self.mask, self.advantages, self.old_lp,
                  self.ref_lp):
            if len(a) != n:
                raise ValueError("grpo arrays must share their length")

    def __len__(self):
        return len(self.tokens)

    def __getitem__(self, i):
        return (self.tokens[i], self.targets[i], self.mask[i],
                self.advantages[i], self.old_lp[i], self.ref_lp[i])


def grpo_collate(samples):
    """Stack GRPO items and pack y = (targets, mask, adv, old_lp, ref_lp)
    — the loader's ``fields[-1]`` convention carries the tuple to the
    loss."""
    cols = [np.stack([s[i] for s in samples]) for i in range(6)]
    return (cols[0], tuple(cols[1:]))
