"""Speculative decoding: draft-model lookahead with exact target semantics.

Beyond reference parity (the reference has no serving stack) — this is the
standard large-model latency lever (Leviathan et al. 2023, "Fast Inference
from Transformers via Speculative Decoding"): a small DRAFT model proposes
``gamma`` tokens autoregressively (cheap), the TARGET model scores all of
them in ONE forward pass (one weight read for γ+1 positions — the win, since
single-token decode is HBM-bandwidth-bound on TPU), and a rejection-sampling
rule keeps the longest valid prefix plus one bonus token.  The output
DISTRIBUTION equals ancestral sampling from the target exactly (greedy mode:
token-for-token identical to target-only greedy) — the draft only changes
speed, never results.

TPU-native shape discipline: everything is static — the draft loop is a
``lax.scan`` of γ one-token cached steps, the target scores a fixed
(1, γ+1) chunk, and the outer loop is a ``lax.while_loop`` whose carries
(both KV caches, the output buffer, position/count scalars) never change
shape.  Stale KV-cache entries from rejected drafts need no cleanup: round
r+1 resumes at position pos+k+1 and its chunk write covers every stale slot
before any later query can attend to it (writes happen before attention in
the decode path), so rewinding the shared ``cache["idx"]`` counter is the
only bookkeeping.

Works with any pair of :class:`~neuralnetworklibrary_tpu.nn.transformer.
TransformerLM` configs sharing a vocabulary (e.g. a 2-layer draft for a
48-layer target, or an int8-quantized draft via ``utils.quantize``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neuralnetworklibrary_tpu.nn.transformer import TransformerLM, init_cache


def accept_window(key, dtoks, dlogs, L, inv_t: float):
    """One round's accept/resample rule (the exactness core, factored out so
    tests can Monte-Carlo its output distribution against the target's).

    dtoks: (γ,) draft tokens sampled from softmax(dlogs·inv_t) row-wise;
    dlogs: (γ, V) draft logits; L: (γ+1, V) target logits for the same
    positions (+ the bonus position).  inv_t == 0 → greedy.

    Returns (v, k_acc): v (γ+1,) where v[:k_acc] are the accepted drafts and
    v[k_acc] is the rejection-resample (or the bonus token when the whole
    window was accepted); entries past k_acc are placeholders the caller
    overwrites on later rounds.  Guarantee (Leviathan et al. 2023, App. A):
    marginally, each emitted token is distributed exactly as ancestral
    sampling from softmax(L·inv_t) — the draft never biases results.
    """
    gamma = dtoks.shape[0]
    greedy = isinstance(inv_t, (int, float)) and inv_t == 0.0
    if greedy:
        e = jnp.argmax(L, -1).astype(jnp.int32)                  # (γ+1,)
        acc = dtoks == e[:gamma]
        k_acc = jnp.sum(jnp.cumprod(acc.astype(jnp.int32)))
        return e, k_acc          # e[i<k] == dtoks[i<k]; e[k] is the bonus
    ka, kr, kb = jax.random.split(key, 3)
    p = jax.nn.softmax(L[:gamma] * inv_t, -1)                    # (γ, V)
    q = jax.nn.softmax(dlogs * inv_t, -1)
    rows = jnp.arange(gamma)
    pd = p[rows, dtoks]
    qd = q[rows, dtoks]
    u = jax.random.uniform(ka, (gamma,))
    acc = u * qd < pd              # u < min(1, p/q); q > 0 at a sampled d
    k_acc = jnp.sum(jnp.cumprod(acc.astype(jnp.int32)))
    resid = jnp.maximum(p - q, 0.0)
    resid = resid / jnp.maximum(jnp.sum(resid, -1, keepdims=True), 1e-30)
    rtoks = jax.random.categorical(
        kr, jnp.log(resid + 1e-30)).astype(jnp.int32)            # (γ,)
    bonus = jax.random.categorical(kb, L[gamma] * inv_t).astype(jnp.int32)
    # v[i<k] = accepted drafts; v[k] = resample (reject) or bonus (all-accept)
    fix = jnp.where(k_acc < gamma,
                    rtoks[jnp.minimum(k_acc, gamma - 1)], bonus)
    v = jnp.concatenate([dtoks, bonus[None]])
    v = jnp.where(jnp.arange(gamma + 1) == k_acc, fix, v)
    return v, k_acc


def speculative_generate(model: TransformerLM, params,
                         draft_model: TransformerLM, draft_params,
                         prompt, n: int, gamma: int = 4,
                         temperature: float = 0.0, seed: int = 0,
                         return_stats: bool = False):
    """Generate ``n`` tokens from the target ``model``, accelerated by
    ``draft_model`` proposals.

    temperature == 0 → greedy: the result is token-for-token identical to
    the target's own greedy decode (any draft, even a random one, only
    affects how many rounds it takes).  temperature > 0 → the modified
    rejection-sampling rule: draft token d_i is accepted with probability
    min(1, p(d_i)/q(d_i)); the first rejection resamples from
    normalize(max(p − q, 0)); a fully accepted window earns a bonus token
    from the target's (γ+1)-th distribution.  Either way each round emits
    between 1 and γ+1 tokens.

    prompt: (1, Tp) int32 — speculative decoding is the latency path, so
    batch 1 (batched serving wants plain :func:`generate`'s throughput).
    Returns (1, n) int32, plus ``{"rounds", "drafted", "accepted"}`` host
    ints when ``return_stats`` (acceptance rate = accepted/drafted — the
    draft-quality diagnostic).
    """
    prompt = jnp.asarray(prompt, jnp.int32)
    B, Tp = prompt.shape
    if B != 1:
        raise ValueError(f"speculative_generate is the batch-1 latency path, "
                         f"got batch {B}")
    if model.vocab_size != draft_model.vocab_size:
        raise ValueError("target and draft must share a vocabulary, got "
                         f"{model.vocab_size} vs {draft_model.vocab_size}")
    if gamma < 1:
        raise ValueError(f"gamma must be >= 1, got {gamma}")
    limit = min(model.max_len, draft_model.max_len)
    if Tp + n + gamma + 1 > limit:
        raise ValueError(
            f"prompt ({Tp}) + n ({n}) + gamma+1 draft overshoot "
            f"({gamma + 1}) exceed max_len {limit}")
    greedy = temperature <= 0.0
    inv_t = 0.0 if greedy else 1.0 / temperature

    def set_idx(cache, pos):
        return {**cache, "idx": jnp.asarray(pos, jnp.int32)}

    def tgt(cache, toks):
        out, mut = model.apply({"params": params, "cache": cache}, toks,
                               decode=True, mutable=["cache"])
        return out[0], mut["cache"]

    def dft(cache, toks):
        out, mut = draft_model.apply(
            {"params": draft_params, "cache": cache}, toks,
            decode=True, mutable=["cache"])
        return out[0], mut["cache"]

    def pick(key, logits):  # (V,) -> () sampled/argmax token
        if greedy:
            return jnp.argmax(logits, -1).astype(jnp.int32)
        return jax.random.categorical(key, logits * inv_t).astype(jnp.int32)

    @jax.jit
    def run(params, draft_params, prompt, key):
        tcache = init_cache(model, 1)
        dcache = init_cache(draft_model, 1)
        tlog, tcache = tgt(tcache, prompt)
        _, dcache = dft(dcache, prompt)
        key, k0 = jax.random.split(key)
        first = pick(k0, tlog[0, -1])
        out = jnp.zeros((n + gamma + 1,), jnp.int32).at[0].set(first)

        def cond(c):
            return c[3] < n

        def round_body(c):
            tcache, dcache, out, cnt, pos, cur, key, rounds, accepted = c
            key, kd, kw = jax.random.split(key, 3)

            # -- draft γ tokens (scan of one-token cached steps) ------------
            dcache = set_idx(dcache, pos)

            def dstep(carry, k):
                dc, tok = carry
                dlog, dc = dft(dc, tok[None, None])
                nxt = pick(k, dlog[0, -1])
                return (dc, nxt), (nxt, dlog[0, -1])

            (dcache, _), (dtoks, dlogs) = jax.lax.scan(
                dstep, (dcache, cur), jax.random.split(kd, gamma))

            # -- target scores the whole window in one forward --------------
            chunk = jnp.concatenate([cur[None], dtoks])[None]   # (1, γ+1)
            tcache = set_idx(tcache, pos)
            tlog, tcache = tgt(tcache, chunk)
            v, k_acc = accept_window(kw, dtoks, dlogs, tlog[0],
                                     0.0 if greedy else inv_t)

            out = jax.lax.dynamic_update_slice(out, v, (cnt,))
            emitted = k_acc + 1
            cur = jnp.take(v, k_acc)
            return (tcache, dcache, out, cnt + emitted, pos + emitted,
                    cur, key, rounds + 1, accepted + k_acc)

        init = (tcache, dcache, out, jnp.asarray(1, jnp.int32),
                jnp.asarray(Tp, jnp.int32), first, key,
                jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
        final = jax.lax.while_loop(cond, round_body, init)
        return final[2][:n], final[7], final[8]

    toks, rounds, accepted = run(params, draft_params, prompt,
                                 jax.random.PRNGKey(seed))
    if return_stats:
        r = int(rounds)
        stats = {"rounds": r, "drafted": r * gamma, "accepted": int(accepted)}
        return toks[None], stats
    return toks[None]
