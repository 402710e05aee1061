"""Proximal Policy Optimization (actor–critic) — RLHF fine-tuning for the
transformer family (Schulman et al. 2017; the InstructGPT recipe,
Ouyang et al. 2022).

Beyond reference parity: the reference has no RL stage; nn/dpo.py and
nn/grpo.py cover the critic-free regimes, and this module completes the
post-training stack with the classic learned-value PPO — per-token GAE
advantages from a value head, the clipped surrogate objective, and a
clipped value loss, all static-shape so the whole update is ONE jitted
Learner step.

Design (TPU-first):

- :class:`ValueHeadLM` — flax wrapper running the wrapped
  :class:`TransformerLM` once and adding a scalar value head over the
  final hidden states: (B, T) tokens → (logits (B, T, V), values (B, T)).
  The value head is a fresh Dense the Learner trains jointly with the
  policy (InstructGPT shares the backbone); layer-group / head contracts
  forward to the inner model (paths gain the ``lm/`` prefix, the value
  head joins the head group).
- :func:`gae_advantages` — masked generalized advantage estimation over
  per-token rewards: a single `lax.scan` backward recursion, exact over
  right-padded completions.
- :func:`ppo_collect` — one on-policy iteration's data: roll out
  completions with the KV-cached ``generate``, build per-token rewards
  (sequence reward on the last completion token, minus ``kl_coef`` times
  the per-token KL to the frozen reference — the InstructGPT shaping),
  score behavior-policy logprobs and values, run GAE, whiten advantages.
- :class:`PPODataset` / :func:`ppo_collate` — Learner-pipeline carriers.
- :class:`PPOLoss` — −E[min(ρA, clip(ρ)A)] + vf_coef·½·max((v−R)²,
  (clipᵥ(v)−R)²) − ent_coef·H(π), masked means over completion tokens.

Typical iteration (repeat: collect → a few inner epochs)::

    roll = ppo_collect(model, policy_params, value_apply, prompts,
                       reward_fn=my_reward, ref_params=base_params,
                       kl_coef=0.05, n_new=64, seed=it)
    ds   = PPODataset(*roll)
    dl   = DataLoader(ds, bs, shuffle=True, collate=ppo_collate)
    learner = Learner(path, data, ValueHeadLM(lm=model), "Adam2",
                      loss_func=PPOLoss(clip_eps=0.2, vf_coef=0.5))

where ``value_apply(tokens) -> (N, T) values`` scores under the CURRENT
ValueHeadLM params (see tests/test_ppo.py for the closure).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neuralnetworklibrary_tpu.nn.grpo import token_logprobs


class ValueHeadLM(nn.Module):
    """Shared-backbone actor–critic: one forward of the wrapped LM, logits
    from its decoder, values from a scalar Dense over the SAME final hidden
    states (h is the LM's second output).  Output (logits (B,T,V),
    values (B,T))."""

    lm: Any  # TransformerLM (or any (B, T) -> (logits, h, ...) flax LM)

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = self.lm(x, train=train)
        if not isinstance(out, tuple) or len(out) < 2:
            raise ValueError("ValueHeadLM needs an LM returning (logits, h)")
        logits, h = out[0], out[1]
        v = nn.Dense(1, name="value_head",
                     kernel_init=nn.initializers.normal(0.01))(h)[..., 0]
        return logits, v

    @property
    def layer_group_prefixes(self):
        inner = getattr(self.lm, "layer_group_prefixes", None)
        if inner is None:
            return None
        groups = [[f"lm/{p}" for p in group] for group in inner]
        groups[-1] = list(groups[-1]) + ["value_head"]
        return groups

    @property
    def head_prefixes(self):
        return tuple(f"lm/{p}" for p in
                     getattr(self.lm, "head_prefixes", ("head",))
                     ) + ("value_head",)


def gae_advantages(rewards, values, mask, gamma: float = 1.0,
                   lam: float = 0.95):
    """Generalized advantage estimation, masked and static-shape.

    rewards/values/mask: (N, T) float — position t holds the reward for
    EMITTING target t and the value estimate at that state; mask is 1 on
    completion targets (prompt/padding 0, advantages there are 0).

        δ_t = r_t + γ·V_{t+1}·m_{t+1} − V_t
        A_t = δ_t + γλ·m_{t+1}·A_{t+1}

    (masking the t+1 terms terminates each sequence at its last real
    token).  Returns (advantages (N, T), returns (N, T) = A + V).
    γ=λ=1 reduces to rewards-to-go minus values (pinned in
    tests/test_ppo.py)."""
    r = jnp.asarray(rewards, jnp.float32)
    v = jnp.asarray(values, jnp.float32)
    m = jnp.asarray(mask, jnp.float32)
    if r.ndim != 2 or r.shape != v.shape or r.shape != m.shape:
        raise ValueError(
            f"rewards/values/mask must share (N, T), got {r.shape}, "
            f"{v.shape}, {m.shape}")
    v_next = jnp.concatenate([v[:, 1:], jnp.zeros_like(v[:, :1])], 1)
    m_next = jnp.concatenate([m[:, 1:], jnp.zeros_like(m[:, :1])], 1)
    delta = r + gamma * v_next * m_next - v

    def step(carry, xs):
        d, mn = xs
        a = d + gamma * lam * mn * carry
        return a, a

    _, adv = jax.lax.scan(step, jnp.zeros(r.shape[0]),
                          (delta.T, m_next.T), reverse=True)
    adv = adv.T * m
    return adv, adv + v


class PPOLoss:
    """Clipped-surrogate PPO with a clipped value loss and an entropy
    bonus, token-level over the completion mask:

        ρ_t   = exp(logπ_t − logπ_old_t)
        pg_t  = min(ρ_t·A_t, clip(ρ_t, 1±ε)·A_t)
        vf_t  = ½·max((v_t−R_t)², (v_old_t + clip(v_t−v_old_t, ±εᵥ) − R_t)²)
        loss  = −mean[pg_t] + vf_coef·mean[vf_t] − ent_coef·mean[H_t]

    Call: (outputs (logits (B,T,V), values (B,T)) from ValueHeadLM;
    y = (targets (B,T), token mask (B,T), advantages (B,T), returns (B,T),
    old_lp (B,T), old_v (B,T))); an optional row mask (B,) weighs padded
    rows out.  At ρ ≡ 1 (the first inner update) the policy-gradient term's
    gradient is exactly the advantage-weighted REINFORCE gradient (pinned
    in tests/test_ppo.py)."""

    def __init__(self, clip_eps: float = 0.2, vf_coef: float = 0.5,
                 vf_clip: float = 0.2, ent_coef: float = 0.0):
        if not 0 < clip_eps < 1:
            raise ValueError(f"clip_eps must be in (0, 1), got {clip_eps}")
        if vf_coef < 0 or ent_coef < 0:
            raise ValueError("vf_coef/ent_coef must be >= 0")
        if vf_clip <= 0:
            raise ValueError(f"vf_clip must be > 0, got {vf_clip}")
        self.clip_eps = float(clip_eps)
        self.vf_coef = float(vf_coef)
        self.vf_clip = float(vf_clip)
        self.ent_coef = float(ent_coef)

    def __call__(self, outputs, y, mask=None):
        logits, values = outputs
        targets, tok_mask, adv, ret, old_lp, old_v = y
        w = tok_mask.astype(jnp.float32)
        if mask is not None:
            w = w * mask[:, None].astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(w), 1.0)

        logp = token_logprobs(logits, targets)               # (B, T)
        ratio = jnp.exp(logp - old_lp)
        pg = jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1.0 - self.clip_eps, 1.0 + self.clip_eps) * adv)
        loss = -jnp.sum(pg * w) / denom

        v = values.astype(jnp.float32)
        v_clip = old_v + jnp.clip(v - old_v, -self.vf_clip, self.vf_clip)
        vf = 0.5 * jnp.maximum(jnp.square(v - ret),
                               jnp.square(v_clip - ret))
        loss = loss + self.vf_coef * jnp.sum(vf * w) / denom

        if self.ent_coef > 0:
            lp_full = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            ent = -jnp.sum(jnp.exp(lp_full) * lp_full, axis=-1)  # (B, T)
            loss = loss - self.ent_coef * jnp.sum(ent * w) / denom
        return loss


class PPOMeanValueError:
    """Masked RMS of (value − return) — critic calibration to watch."""

    def __init__(self):
        self.__name__ = "ppo_verr"

    def __call__(self, outputs, y, mask=None):
        _, values = outputs
        _, tok_mask, _, ret, _, _ = y
        w = tok_mask.astype(jnp.float32)
        if mask is not None:
            w = w * mask[:, None].astype(jnp.float32)
        se = jnp.square(values.astype(jnp.float32) - ret) * w
        return jnp.sqrt(jnp.sum(se) / jnp.maximum(jnp.sum(w), 1.0))


def whiten(adv, mask, eps: float = 1e-6):
    """Zero-mean unit-variance advantages over the masked tokens (the
    standard PPO normalization); masked-out positions stay 0."""
    a = jnp.asarray(adv, jnp.float32)
    m = jnp.asarray(mask, jnp.float32)
    n = jnp.maximum(m.sum(), 1.0)
    mu = jnp.sum(a * m) / n
    var = jnp.sum(jnp.square(a - mu) * m) / n
    return (a - mu) * m / jnp.sqrt(var + eps)


def ppo_collect(model, params, value_apply: Callable, prompts,
                n_new: int, reward_fn: Callable, ref_params=None,
                kl_coef: float = 0.0, gamma: float = 1.0,
                lam: float = 0.95, temperature: float = 1.0, k: int = 0,
                seed: int = 0, score_bs: int = 32,
                whiten_adv: bool = True):
    """One PPO iteration's on-policy rollout data.

    model / params: the UNWRAPPED TransformerLM policy (rollouts run its
    KV-cached ``generate``; ``params`` is the current ``lm`` subtree of the
    ValueHeadLM params).
    value_apply(tokens (n, T) int32) → (n, T) float32 values under the
    CURRENT value head (a closure over the full ValueHeadLM apply).
    prompts: (N, P) int32 fixed-width block.
    reward_fn(prompts (N, P), completions (N, n_new)) → (N,) floats — the
    sequence-level reward (a reward model, a programmatic check, ...).
    ref_params: frozen reference for the per-token KL shaping
    r_t −= kl_coef·(logπ_old_t − logref_t) (InstructGPT); None with
    kl_coef=0 skips it.
    k / temperature: sampler truncation — k=0, temperature=1 is the
    faithful on-policy regime (see grpo_collect's note).

    Returns numpy (tokens (N,T), targets (N,T), mask (N,T), advantages
    (N,T), returns (N,T), old_lp (N,T), old_v (N,T)), T = P + n_new − 1;
    mask covers exactly the completion targets.
    """
    from neuralnetworklibrary_tpu.nn.grpo import _score_logprobs
    from neuralnetworklibrary_tpu.nn.transformer import generate

    prompts = np.asarray(prompts, np.int32)
    if prompts.ndim != 2:
        raise ValueError(f"prompts must be (N, P), got {prompts.shape}")
    if kl_coef > 0 and ref_params is None:
        raise ValueError("kl_coef > 0 needs ref_params")
    N, P = prompts.shape
    comp = np.asarray(generate(
        model, params, jnp.asarray(prompts), n_new,
        k=k or model.vocab_size, temperature=temperature, seed=seed))
    seq = np.concatenate([prompts, comp], axis=1)            # (N, P+n_new)
    tokens, targets = seq[:, :-1], seq[:, 1:]
    T = tokens.shape[1]
    mask = np.zeros((N, T), np.float32)
    mask[:, P - 1:] = 1.0                                    # completion targets

    rewards_seq = np.asarray(reward_fn(prompts, comp), np.float32)
    if rewards_seq.shape != (N,):
        raise ValueError(
            f"reward_fn must return (N,) = ({N},), got {rewards_seq.shape}")
    old_lp = _score_logprobs(model, params, tokens, targets, score_bs)
    rewards = np.zeros((N, T), np.float32)
    rewards[:, -1] = rewards_seq                             # terminal reward
    if kl_coef > 0:
        ref_lp = _score_logprobs(model, ref_params, tokens, targets,
                                 score_bs)
        rewards -= kl_coef * (old_lp - ref_lp) * mask

    old_v = np.empty((N, T), np.float32)
    for i in range(0, N, score_bs):
        j = min(i + score_bs, N)
        kk = max(j - score_bs, 0)                            # full-width chunk
        old_v[kk:j] = np.asarray(value_apply(jnp.asarray(tokens[kk:j])))
    adv, ret = gae_advantages(rewards, old_v, mask, gamma, lam)
    if whiten_adv:
        adv = whiten(adv, mask)
    # positions outside the completion mask never reach the loss — ship
    # them zeroed so the arrays are self-consistent (ret == adv + old_v
    # holds element-wise on the masked views)
    return (tokens, targets, mask, np.asarray(adv), np.asarray(ret) * mask,
            old_lp, old_v * mask)


class PPODataset:
    """Items: (tokens (T,) int32, y-parts...) matching PPOLoss's y tuple.
    Use with ``DataLoader(..., collate=ppo_collate)``."""

    def __init__(self, tokens, targets, mask, advantages, returns, old_lp,
                 old_v):
        self.cols = (np.asarray(tokens, np.int32),
                     np.asarray(targets, np.int32),
                     np.asarray(mask, np.float32),
                     np.asarray(advantages, np.float32),
                     np.asarray(returns, np.float32),
                     np.asarray(old_lp, np.float32),
                     np.asarray(old_v, np.float32))
        n = len(self.cols[0])
        if self.cols[0].ndim != 2:
            raise ValueError(
                f"tokens must be (N, T), got {self.cols[0].shape}")
        if any(len(c) != n for c in self.cols):
            raise ValueError("ppo arrays must share their length")

    def __len__(self):
        return len(self.cols[0])

    def __getitem__(self, i):
        return tuple(c[i] for c in self.cols)


def ppo_collate(samples):
    """Stack PPO items and pack y = (targets, mask, adv, returns, old_lp,
    old_v) — the loader's ``fields[-1]`` convention carries the tuple to
    the loss."""
    cols = [np.stack([s[i] for s in samples]) for i in range(7)]
    return (cols[0], tuple(cols[1:]))
