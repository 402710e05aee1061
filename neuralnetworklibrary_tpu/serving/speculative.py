"""Speculative continuous-batching engine: draft-model lookahead INSIDE the
slot-scheduled serving loop.

:func:`nn.speculative.speculative_generate` is the batch-1 latency path;
this engine brings the same win to batched serving: every round, a small
DRAFT model proposes ``gamma`` greedy tokens per slot (γ cheap cached
steps), the TARGET model verifies all slots' windows in ONE (S, γ+1)
forward (one weight read for γ+1 positions — the whole point, since
single-token decode is HBM-bandwidth-bound on TPU), and each slot keeps its
longest agreeing prefix plus the target's bonus/correction token.  Emission
is token-for-token identical to the plain engine's greedy decode — the
draft changes only how many rounds it takes (pinned in
tests/test_spec_serving.py).

Per-slot variable acceptance rides the base engine's ``_last_emit`` hook:
the jitted round returns (S, γ+1) candidate tokens plus per-slot valid
counts, and the host loop appends exactly that many (EOS/stop trimming
unchanged).  Slots sit at different sequence positions, so the verify
forward uses the decode path's per-row offsets; the (γ+1)-token chunk
write covers every stale rejected-draft cache entry before any later query
can attend to it (the same invariant nn/speculative.py proves — rewinding
each slot's length is the only bookkeeping, and here lengths only ever
advance by the accepted count).

Bookkeeping subtlety — the draft lags the target by one round: accepted
tokens were written into the TARGET cache during verification, but the
draft saw only its own proposals.  Each round therefore starts with a
"catch-up" draft forward over the previously emitted tokens (statically
padded to γ+1; pad writes land beyond the slot's live length and are
overwritten before they are ever attendable) whose last valid logit row
doubles as the first proposal — catch-up costs no extra pass.

Sampling (r4): each slot is either GREEDY (k=1 — longest argmax-agreeing
prefix, token-for-token identical to the plain engine) or TEMPERATURE-
sampled (temperature>0 with k >= vocab and top_p=1 — the modified
rejection rule of Leviathan et al.: draft token d_i sampled from
q = softmax(draft/T) is accepted with prob min(1, p(d_i)/q(d_i)), the
first rejection resamples from normalize(max(p-q, 0)), a fully accepted
window earns a bonus sample — the output DISTRIBUTION equals ancestral
target sampling exactly; per-slot inv-temperatures ride one jitted round,
so greedy and sampled requests mix freely).  Truncated sampling (top-k <
vocab, nucleus, repetition penalties) has no sound rejection factorization
mid-window and is rejected at admission — use the plain engine for those.

Reference: beyond parity — the reference has no serving stack.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from neuralnetworklibrary_tpu.serving.engine import Request, ServingEngine
from neuralnetworklibrary_tpu.serving.paged import PagedServingEngine


class SpeculativeServingEngine(ServingEngine):
    """Continuous batching with draft-accelerated greedy decode.

    model/params: the target TransformerLM (dense KV cache; paged models
    serve through PagedServingEngine, unaccelerated).
    draft_model/draft_params: a smaller TransformerLM sharing the target's
    vocabulary (e.g. 2 layers against 48, or an int8-quantized twin).
    gamma: proposals per round; each round emits 1..gamma+1 tokens per
    slot.  Throughput improves when the draft's acceptance rate beats
    roughly 1/(gamma+1) worth of extra work — watch
    ``stats['accepted'] / stats['drafted']``.

    Every request must leave room for the draft overshoot:
    ``len(prompt) + max_new + gamma + 1 <= max_len`` (checked at
    admission, like nn.speculative).  Engine kwargs are the base engine's
    minus ``chunk`` (a round IS the chunk) and ``adapters`` (base weights
    only); ``prefill_chunk=`` composes (r5) — long prompts chunk-prefill
    the TARGET while the cheap draft prefills one-shot.  TP serving
    composes (r5): pass
    ``mesh=`` + ``param_rule=`` — the target shards Megatron-style with a
    head-sharded KV cache while the (small) draft replicates; emission is
    token-exact vs the single-chip engine.
    """

    _paged = False   # PagedSpeculativeServingEngine flips this

    def __init__(self, model, params, draft_model, draft_params,
                 gamma: int = 4, **kw):
        if gamma < 1:
            raise ValueError(f"gamma must be >= 1, got {gamma}")
        if model.vocab_size != getattr(draft_model, "vocab_size", -1):
            raise ValueError(
                "target and draft must share a vocabulary, got "
                f"{model.vocab_size} vs "
                f"{getattr(draft_model, 'vocab_size', None)}")
        if getattr(model, "paged_kv_blocks", 0) > 0 and not self._paged:
            raise ValueError(
                "speculative serving on a paged-KV target goes through "
                "PagedSpeculativeServingEngine")
        for bad, ok in (("chunk", (None, 1)), ("adapters", (None,))):
            if kw.get(bad) not in ok:
                raise ValueError(f"SpeculativeServingEngine does not take "
                                 f"{bad}=")
            kw.pop(bad, None)
        super().__init__(model, params, **kw)
        self._check_spec_sampling(self.k, self.temperature, self.top_p,
                                  self.repetition_penalty, "engine defaults")
        from neuralnetworklibrary_tpu.utils.quantize import _is_qtensor

        self.gamma = int(gamma)
        self.draft_model = draft_model
        self.draft_params = draft_params
        self._draft_quantized = any(
            _is_qtensor(leaf) for leaf in
            jax.tree_util.tree_leaves(draft_params, is_leaf=_is_qtensor))
        if draft_model.max_len < model.max_len:
            raise ValueError(
                f"draft max_len {draft_model.max_len} must cover the "
                f"target's {model.max_len}")
        self.draft_cache = self._init_cache(draft_model, self.slots)
        if self.mesh is not None:
            # TP serving (r5): the TARGET shards Megatron-style through the
            # base engine (param_rule= + head-sharded cache); the DRAFT is
            # small — replicate its params and cache so every device runs
            # the full draft and the jitted round mixes the two freely
            from neuralnetworklibrary_tpu.parallel import mesh as pmesh

            self.draft_params = pmesh.replicate_tree(self.draft_params,
                                                     self.mesh)
            self.draft_cache = pmesh.replicate_tree(self.draft_cache,
                                                    self.mesh)
        # tokens emitted last round MINUS the last one — they have target
        # K/V (accepted proposals) but the draft hasn't seen them yet
        self._pend = np.zeros((self.slots, self.gamma), np.int32)
        self._n_pend = np.zeros(self.slots, np.int32)
        self._draft_prefill_jits: dict = {}
        self._round = jax.jit(self._spec_round)
        self._decode = self._spec_decode
        self.stats.update(spec_rounds=0, drafted=0, accepted=0)

    def _check_spec_sampling(self, k, t, p, r, who: str):
        """greedy (k=1) or pure-temperature (k >= vocab, top_p=1) only —
        truncated/penalized sampling has no sound rejection factorization."""
        if r != 1.0:
            raise ValueError(
                f"speculative serving: {who} must keep "
                "repetition_penalty=1 (no rejection rule reproduces the "
                "penalized chain mid-window)")
        if int(k) == 1:
            return
        if int(k) >= self.model.vocab_size and float(p) >= 1.0 \
                and float(t) > 0.0:
            return
        raise ValueError(
            f"speculative serving: {who} must be greedy (k=1) or pure "
            "temperature sampling (k >= vocab_size, top_p=1, "
            f"temperature>0); got k={k}, temperature={t}, top_p={p}")

    # ------------------------------------------------------------ admission

    def _admit(self, req: Request, slot: int, lengths, toks):
        # a preempted request re-admits with prompt grown by its emitted
        # tokens — count only the REMAINING budget
        need = (len(req.prompt) + req.max_new - len(req.tokens)
                + self.gamma + 1)
        if need > self.model.max_len:
            raise ValueError(
                f"prompt ({len(req.prompt)}) + max_new ({req.max_new}) + "
                f"gamma+1 draft overshoot ({self.gamma + 1}) exceed "
                f"max_len {self.model.max_len}")
        ret = super()._admit(req, slot, lengths, toks)
        self._check_spec_sampling(self._k_arr[slot], self._t_arr[slot],
                                  self._p_arr[slot], self._r_arr[slot],
                                  "request")
        # the DRAFT prefill is one-shot regardless of chunked TARGET
        # prefill (prefill_chunk=, r5): the draft is cheap, and its cache
        # only needs to be ready by the first spec round — which cannot
        # happen before the target's final prefill slice lands (pending
        # slots stay inactive)
        p = np.asarray(req.prompt, np.int32)
        tb = self._bucket_for(len(p))
        padded = np.full((1, tb), self.pad_token, np.int32)
        padded[0, :len(p)] = p
        fn = self._draft_prefill_jits.get(tb)
        if fn is None:
            fn = self._draft_prefill_jits[tb] = jax.jit(
                self._draft_prefill, static_argnums=3)
        self.draft_cache = fn(self.draft_params, self.draft_cache,
                              jnp.asarray(padded), slot)
        self._n_pend[slot] = 0
        return ret     # False while the target's chunked prefill is pending

    def _on_retire(self, slot: int):
        self._n_pend[slot] = 0
        super()._on_retire(slot)

    # ----------------------------------------------------------- device fns

    def _draft_prefill(self, dparams, dcache, prompt, slot):
        """Prompt K/V into the draft cache's ``slot`` rows (right-pad writes
        land beyond the live length; the first round's catch-up overwrites
        position L and later rounds stay contiguous, so pads are never
        attendable before being rewritten)."""
        if self._draft_quantized:
            dparams = self._dequantize(dparams)
        cache1 = self._init_cache(self.draft_model, 1)
        _, mut = self.draft_model.apply(
            {"params": dparams, "cache": cache1}, prompt, decode=True,
            mutable=["cache"])

        def ins(big, small):
            if big.ndim == 0:
                return big
            return jax.lax.dynamic_update_slice(
                big, small, (slot,) + (0,) * (big.ndim - 1))

        return jax.tree_util.tree_map(ins, dcache, mut["cache"])

    def _spec_round(self, params, dparams, cache, dcache, toks, lengths,
                    pend, n_pend, active, inv_t, key, *extra):
        """One speculative round for every slot, fully jitted.

        toks (S,): last emitted token per slot (its K/V not yet written);
        lengths (S,): its position; pend (S, γ) / n_pend (S,): earlier
        tokens from last round the draft must catch up on; inv_t (S,):
        per-slot inverse temperature — 0 marks a GREEDY slot (argmax
        proposals + longest argmax-agreeing prefix), > 0 a temperature-
        sampled slot (Leviathan accept/resample, exact target
        distribution).  Returns (cache, dcache, candidates (S, γ+1),
        n_emit (S,)) — rows valid up to n_emit.
        """
        if self._quantized:
            params = self._dequantize(params)
        if self._draft_quantized:
            dparams = self._dequantize(dparams)
        # paged target: the block table rides along to every target apply
        # (the draft stays dense — it is small, its cache is cheap)
        tkw = {"block_table": extra[0]} if extra else {}
        S, g = self.slots, self.gamma
        greedy = inv_t <= 0.0                                  # (S,)
        kd, ka, kr, kb = jax.random.split(key, 4)

        def propose(logits, k1):
            """Per-slot proposal from (S, V) draft logits: argmax for
            greedy slots, temperature sample otherwise."""
            arg = jnp.argmax(logits, -1).astype(jnp.int32)
            smp = jax.random.categorical(
                k1, logits * jnp.maximum(inv_t, 1e-6)[:, None]
            ).astype(jnp.int32)
            return jnp.where(greedy, arg, smp)

        # -- draft catch-up + first proposal (one T=γ+1 forward) ----------
        t_idx = jnp.arange(g + 1)[None, :]
        pend_w = jnp.concatenate([pend, pend[:, :1]], 1)       # (S, γ+1)
        cu_in = jnp.where(t_idx < n_pend[:, None], pend_w, toks[:, None])
        dout, dmut = self.draft_model.apply(
            {"params": dparams, "cache": dcache}, cu_in, decode=True,
            offsets=lengths - n_pend, mutable=["cache"])
        dcache = dmut["cache"]
        dlog0 = jnp.take_along_axis(
            dout[0], n_pend[:, None, None], axis=1)[:, 0]      # (S, V)
        d1 = propose(dlog0, jax.random.fold_in(kd, 0))

        # -- draft proposals d_2..d_γ (γ−1 cached one-token steps) --------
        def dstep(carry, j):
            dc, tok = carry
            out, mut = self.draft_model.apply(
                {"params": dparams, "cache": dc}, tok[:, None], decode=True,
                offsets=lengths + j, mutable=["cache"])
            dlog = out[0][:, -1]                               # (S, V)
            nxt = propose(dlog, jax.random.fold_in(kd, j))
            return (mut["cache"], nxt), (nxt, dlog)

        (dcache, _), (rest, rest_logs) = jax.lax.scan(
            dstep, (dcache, d1), jnp.arange(1, g))
        dtoks = jnp.concatenate([d1[None], rest], 0).T         # (S, γ)
        dlogs = jnp.concatenate([dlog0[None], rest_logs], 0)   # (γ, S, V)
        dlogs = jnp.moveaxis(dlogs, 0, 1)                      # (S, γ, V)

        # -- target verifies every slot's window in ONE forward -----------
        ver_in = jnp.concatenate([toks[:, None], dtoks], 1)    # (S, γ+1)
        out, mut = self.model.apply(
            {"params": params, "cache": cache}, ver_in, decode=True,
            offsets=lengths, mutable=["cache"], **tkw)
        cache = mut["cache"]
        L = out[0]                                             # (S, γ+1, V)
        g_toks = jnp.argmax(L, -1).astype(jnp.int32)           # (S, γ+1)

        # -- acceptance: longest valid prefix per slot --------------------
        it = jnp.maximum(inv_t, 1e-6)[:, None, None]
        p = jax.nn.softmax(L[:, :g] * it, -1)                  # (S, γ, V)
        q = jax.nn.softmax(dlogs * it, -1)
        rows = jnp.arange(g)[None, :]
        pd = jnp.take_along_axis(p, dtoks[:, :, None], -1)[..., 0]
        qd = jnp.take_along_axis(q, dtoks[:, :, None], -1)[..., 0]
        u = jax.random.uniform(ka, (S, g))
        acc_samp = u * qd < pd          # u < min(1, p/q); q > 0 at a sample
        acc_greedy = dtoks == g_toks[:, :g]
        acc = jnp.where(greedy[:, None], acc_greedy, acc_samp)
        k_acc = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)

        # -- the token at position k_acc: correction / resample / bonus ---
        resid = jnp.maximum(p - q, 0.0)
        resid = resid / jnp.maximum(jnp.sum(resid, -1, keepdims=True),
                                    1e-30)
        rtoks = jax.random.categorical(
            kr, jnp.log(resid + 1e-30).reshape(S * g, -1)
        ).reshape(S, g).astype(jnp.int32)                      # (S, γ)
        bonus = jnp.where(
            greedy, g_toks[:, g],
            jax.random.categorical(kb, L[:, g] * it[..., 0]).astype(
                jnp.int32))
        corr_g = jnp.take_along_axis(g_toks, k_acc[:, None], 1)[:, 0]
        corr_s = jnp.take_along_axis(
            rtoks, jnp.minimum(k_acc, g - 1)[:, None], 1)[:, 0]
        fix = jnp.where(k_acc < g,
                        jnp.where(greedy, corr_g, corr_s), bonus)
        v = jnp.where(greedy[:, None], g_toks,
                      jnp.concatenate([dtoks, bonus[:, None]], 1))
        v = jnp.where(jnp.arange(g + 1)[None] == k_acc[:, None],
                      fix[:, None], v)
        n_emit = jnp.where(active, k_acc + 1, 0)
        return cache, dcache, v, n_emit

    def _spec_decode(self, params, cache, toks, lengths, active, seen,
                     kv, tv, pv, rv, av, key, *extra):
        """Drop-in for the base ``_decode``: runs one speculative round and
        reports per-slot emission counts through ``_last_emit``.  ``seen``
        passes through untouched (repetition penalties are rejected at
        admission — the machinery never reads it).  Greedy slots carry
        inv_t = 0, sampled slots 1/temperature."""
        inv_t = jnp.where(jnp.asarray(kv) == 1, 0.0,
                          1.0 / jnp.maximum(jnp.asarray(tv), 1e-6))
        cache, dcache, v, n_emit = self._round(
            params, self.draft_params, cache, self.draft_cache, toks,
            lengths, jnp.asarray(self._pend), jnp.asarray(self._n_pend),
            jnp.asarray(active), inv_t, key, *extra)
        self.draft_cache = dcache
        v = np.asarray(v)                                      # (S, γ+1)
        n_emit = np.asarray(n_emit)
        self._last_emit = n_emit
        for s in range(self.slots):
            n = int(n_emit[s])
            if n > 0:
                self._n_pend[s] = n - 1
                self._pend[s, :n - 1] = v[s, :n - 1]
        n_active = int(np.sum(n_emit > 0))
        self.stats["spec_rounds"] += 1
        self.stats["drafted"] += self.gamma * n_active
        self.stats["accepted"] += int(np.sum(np.maximum(n_emit - 1, 0)))
        return cache, seen, v.T                                # (γ+1, S)

    @property
    def acceptance(self) -> float:
        """Fraction of draft proposals the target accepted — the draft-
        quality diagnostic (throughput needs this comfortably > 0)."""
        d = self.stats["drafted"]
        return self.stats["accepted"] / d if d else 0.0


class PagedSpeculativeServingEngine(SpeculativeServingEngine,
                                    PagedServingEngine):
    """Speculative decode on a PAGED-KV target (VERDICT r4 #4): the target
    TransformerLM carries ``paged_kv_blocks > 0`` — block-table pools,
    on-demand allocation, youngest-first recompute preemption, optional
    int8 pools and vLLM prefix sharing all come from
    :class:`~neuralnetworklibrary_tpu.serving.paged.PagedServingEngine` —
    while the DRAFT model stays dense (it is small; its (S, max_len) cache
    is the cheap part).  The (S, γ+1) verify forward runs the paged decode
    path at per-row offsets (nn/transformer.py T>1 paged decode, r5);
    emission is token-for-token identical to the dense speculative engine,
    including across preemption (re-prefill reproduces the causal state).

    Cooperative MRO: the speculative round (``_decode``, draft bookkeeping,
    admission checks) layers over the paged allocator hooks;
    ``_pre_decode`` allocates γ+1 positions ahead via ``_alloc_horizon``.
    """

    _paged = True

    @property
    def _alloc_horizon(self) -> int:
        return self.gamma + 1
