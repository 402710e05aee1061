"""Continuous-batching serving engine for :class:`~neuralnetworklibrary_tpu.
nn.transformer.TransformerLM` — iteration-level scheduling (Orca / vLLM
style) over the static-shape KV-cache decode path.

The reference has no serving story at all (its only generation entry point is
the single-sequence ``predict_from_string``, Applications/Text.py:655-676);
``nn.transformer.generate`` already batches, but the whole batch must share
one prompt length and one stop step — a production endpoint gets requests of
different lengths at different times, and padding everything to the batch
maximum wastes both HBM and decode steps.

TPU-first design — everything the chip executes has a static shape:

- the engine owns a ``slots``-row KV cache (one row per in-flight sequence);
  the decode step is ONE jitted function of shape ``(slots, 1)`` that never
  recompiles, with each row attending at its own position via the (B,)
  ``offsets`` vector the decode path accepts,
- prefill runs per request at a bucketed prompt length (a handful of jit
  specializations, amortized across all requests that hit the bucket) with a
  batch-1 cache, then the filled rows are inserted into the slot cache with
  one ``dynamic_update_slice`` — right-padding is provably inert because a
  causal query never attends positions after its own,
- scheduling is iteration-level: after every decode step the host frees
  finished slots (EOS / max_new / cache full) and admits queued requests into
  them immediately — a long sequence never stalls the batch behind it, and a
  newly-arrived short request starts decoding mid-flight of the others.

Greedy decode (``k=1``) is token-for-token identical to
``nn.transformer.generate(k=1)`` per request (pinned in
tests/test_serving.py); sampled decode draws from the same renormalized
top-k/temperature family but consumes per-slot rng streams, so sequences are
reproducible given the engine seed but differ from single-request streams.
"""

from __future__ import annotations

from collections import deque
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class Request:
    """One generation request: ``prompt`` (token ids), ``max_new`` tokens to
    emit, optional per-request ``eos_token`` override.  After the engine
    finishes it: ``tokens`` (the emitted ids, EOS included when hit),
    ``finished``, and scheduling telemetry (``admitted_at_step`` /
    ``finished_at_step``, in engine decode steps)."""

    def __init__(self, prompt: Sequence[int], max_new: int,
                 eos_token: Optional[int] = None):
        if max_new < 1:
            raise ValueError(f"max_new must be >= 1, got {max_new}")
        self.prompt = list(int(t) for t in prompt)
        if not self.prompt:
            raise ValueError("empty prompt")
        self.max_new = int(max_new)
        self.eos_token = eos_token
        self.tokens: list = []
        self.finished = False
        self.admitted_at_step: Optional[int] = None
        self.finished_at_step: Optional[int] = None


class ServingEngine:
    """Slot-scheduled continuous batching over a TransformerLM.

    model: a decode-capable TransformerLM (max_len > 0, causal).
    params: its trained params pytree.
    slots: in-flight sequences = the static decode batch (the KV cache is
        ``slots x max_len x Hkv x hd`` per layer — size HBM accordingly; GQA
        ``n_kv_heads`` shrinks it).
    prompt_buckets: prefill jit specializations; a prompt pads up to the
        smallest bucket >= its length (longer prompts fall back to the next
        power of two, adding one compile).
    k / temperature: top-k sampling family (k=1 => greedy, argmax).
    eos_token: default stop token (None: run to max_new).
    pad_token: id used to right-pad prefill buckets (inert, any id works).
    chunk: decode steps per host round-trip.  1 = pure iteration-level
        scheduling (admit/retire after every token).  >1 runs ``chunk``
        steps in one jitted ``lax.scan`` before the host looks at the
        tokens — slots that finish mid-chunk ride to the boundary and their
        surplus tokens are trimmed (emitted sequences are IDENTICAL; only
        admission latency coarsens).  Use when host↔device latency, not
        compute, binds the decode loop.
    """

    def __init__(self, model, params, slots: int = 4,
                 prompt_buckets: Sequence[int] = (32, 128, 512),
                 eos_token: Optional[int] = None, k: int = 1,
                 temperature: float = 1.0, pad_token: int = 0,
                 seed: int = 0, chunk: int = 1):
        if getattr(model, "max_len", 0) <= 0:
            raise ValueError("model.max_len must be > 0 for decoding")
        if not getattr(model, "n_experts", 0) == 0:
            # MoE decode works through the same path; capacity routing at
            # batch 1-per-slot is untested for serving — keep it explicit.
            raise ValueError("ServingEngine currently supports dense models")
        from neuralnetworklibrary_tpu.utils.quantize import (
            _is_qtensor,
            dequantize_params,
        )

        # int8/int4 weight-only serving (utils.quantize): quantized leaves
        # stay resident; each jitted fn dequantizes on entry — XLA fuses the
        # scale expansion into the consuming matmuls, so HBM streams only
        # the quantized bytes
        self._quantized = any(
            _is_qtensor(leaf) for leaf in
            jax.tree_util.tree_leaves(params, is_leaf=_is_qtensor))
        self._dequantize = dequantize_params
        self.model, self.params = model, params
        self.slots = int(slots)
        self.eos_token = eos_token
        self.k, self.temperature = int(k), float(temperature)
        self.pad_token = int(pad_token)
        if chunk < 1:
            raise ValueError(f"chunk must be >= 1, got {chunk}")
        self.chunk = int(chunk)
        self.buckets = tuple(sorted(b for b in prompt_buckets
                                    if b <= model.max_len))
        from neuralnetworklibrary_tpu.nn.transformer import init_cache

        self._init_cache = init_cache
        self.cache = init_cache(model, self.slots)
        self._key = jax.random.PRNGKey(seed)
        self._prefill_jits: dict = {}
        self._suffix_jits: dict = {}
        self._decode = jax.jit(self._decode_chunk)
        self._prefix: Optional[tuple] = None   # (tokens, batch-1 cache)
        self.stats = {"decode_steps": 0, "prefills": 0,
                      "prefix_hits": 0, "prefill_tokens": 0,
                      "slot_steps_active": 0, "slot_steps_total": 0}

    # -------------------------------------------------------- prefix caching

    def set_prefix(self, tokens: Sequence[int]):
        """Prefill a shared prompt prefix (a system prompt) ONCE and reuse
        its KV rows for every request whose prompt starts with it — those
        requests prefill only their suffix.  Exactness: the suffix prefill
        continues the saved batch-1 cache at the prefix length through the
        same scalar-offset decode path, so logits are identical to a full
        prefill (pinned in tests/test_serving.py)."""
        tokens = [int(t) for t in tokens]
        if not tokens:
            self._prefix = None
            return
        if len(tokens) + 1 >= self.model.max_len:
            raise ValueError("prefix leaves no room to decode")
        cache1 = self._init_cache(self.model, 1)
        _, mut = jax.jit(
            lambda p, c, x: self.model.apply(
                {"params": self._dequantize(p) if self._quantized else p,
                 "cache": c}, x, decode=True,
                mutable=["cache"]))(
            self.params, cache1, jnp.asarray([tokens], jnp.int32))
        self._prefix = (tokens, mut["cache"])
        self.stats["prefill_tokens"] += len(tokens)

    def _prefill_suffix(self, params, cache, pcache, suffix, true_len,
                        slot, key):
        """Continue the saved prefix cache with the request's suffix (the
        internal position counter resumes at the prefix length), then insert
        the filled batch-1 rows at ``slot``."""
        if self._quantized:
            params = self._dequantize(params)
        out, mut = self.model.apply({"params": params, "cache": pcache},
                                    suffix, decode=True, mutable=["cache"])
        logits = out[0][0, true_len - 1]

        def ins(big, small):
            if big.ndim == 0:
                return big
            return jax.lax.dynamic_update_slice(
                big, small, (slot,) + (0,) * (big.ndim - 1))

        cache = jax.tree_util.tree_map(ins, cache, mut["cache"])
        return cache, self._sample(key, logits)

    # ------------------------------------------------------------- device fns

    def _sample(self, key, logits):
        """Renormalized top-k / temperature sampling over the last axis;
        k=1 is exact greedy (argmax, first-index tie-break like top_k)."""
        if self.k == 1:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logits = logits / jnp.maximum(self.temperature, 1e-6)
        vals, idxs = jax.lax.top_k(logits, self.k)
        choice = jax.random.categorical(key, vals)
        return jnp.take_along_axis(
            idxs, choice[..., None], -1)[..., 0].astype(jnp.int32)

    def _prefill_into(self, params, cache, prompt, true_len, slot, key):
        """Run the prompt through a batch-1 cache, insert the filled rows at
        ``slot`` of the engine cache, sample the first continuation token
        from the logits at position true_len-1 (right-padding beyond it is
        never attendable by a causal query, so it cannot perturb them)."""
        cache1 = self._init_cache(self.model, 1)
        if self._quantized:
            params = self._dequantize(params)
        out, mut = self.model.apply({"params": params, "cache": cache1},
                                    prompt, decode=True, mutable=["cache"])
        logits = out[0][0, true_len - 1]

        def ins(big, small):
            if big.ndim == 0:          # the shared idx counter — unused here
                return big
            return jax.lax.dynamic_update_slice(
                big, small, (slot,) + (0,) * (big.ndim - 1))

        cache = jax.tree_util.tree_map(ins, cache, mut["cache"])
        return cache, self._sample(key, logits)

    def _decode_step(self, params, cache, toks, lengths, active, key):
        """One token for every slot at its own offset; inactive slots recycle
        their last token (their writes land in rows a future prefill fully
        replaces)."""
        if self._quantized:
            params = self._dequantize(params)
        out, mut = self.model.apply({"params": params, "cache": cache},
                                    toks[:, None], decode=True,
                                    offsets=lengths, mutable=["cache"])
        logits = out[0][:, -1]                                  # (S, V)
        if self.k == 1:
            nxt = self._sample(key, logits)
        else:
            keys = jax.random.split(key, self.slots)
            nxt = jax.vmap(self._sample)(keys, logits)
        return mut["cache"], jnp.where(active, nxt, toks)

    def _decode_chunk(self, params, cache, toks, lengths, active, key):
        """``chunk`` decode steps in one device program — per-step offsets
        advance on device, the host sees (chunk, S) tokens at the end."""
        def step(carry, k1):
            cache, toks, lens = carry
            cache, nxt = self._decode_step(params, cache, toks, lens,
                                           active, k1)
            return (cache, nxt, lens + active.astype(jnp.int32)), nxt

        (cache, _, _), seq = jax.lax.scan(
            step, (cache, toks, lengths), jax.random.split(key, self.chunk))
        return cache, seq                                       # (chunk, S)

    # ------------------------------------------------------------- scheduling

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        p = 1
        while p < n:
            p *= 2
        return min(p, self.model.max_len)

    def _admit(self, req: Request, slot: int, lengths, toks):
        p = np.asarray(req.prompt, np.int32)
        if len(p) + 1 > self.model.max_len:
            raise ValueError(
                f"prompt length {len(p)} leaves no room to decode under "
                f"max_len {self.model.max_len}")
        self._key, k1 = jax.random.split(self._key)
        pre = self._prefix
        if (pre is not None and len(p) > len(pre[0])
                and list(p[:len(pre[0])]) == pre[0]):
            # shared-prefix hit: prefill only the suffix on top of the saved
            # prefix cache
            suf = p[len(pre[0]):]
            tb = self._bucket_for(len(suf))
            padded = np.full((1, tb), self.pad_token, np.int32)
            padded[0, :len(suf)] = suf
            fn = self._suffix_jits.get(tb)
            if fn is None:
                fn = self._suffix_jits[tb] = jax.jit(self._prefill_suffix)
            self.cache, tok = fn(self.params, self.cache, pre[1],
                                 jnp.asarray(padded), len(suf), slot, k1)
            self.stats["prefix_hits"] += 1
            self.stats["prefill_tokens"] += len(suf)
        else:
            tb = self._bucket_for(len(p))
            padded = np.full((1, tb), self.pad_token, np.int32)
            padded[0, :len(p)] = p
            fn = self._prefill_jits.get(tb)
            if fn is None:
                fn = self._prefill_jits[tb] = jax.jit(self._prefill_into)
            self.cache, tok = fn(self.params, self.cache,
                                 jnp.asarray(padded), len(p), slot, k1)
            self.stats["prefill_tokens"] += len(p)
        req.tokens.append(int(tok))
        req.admitted_at_step = self.stats["decode_steps"]
        self.stats["prefills"] += 1
        lengths[slot] = len(p)
        toks[slot] = req.tokens[-1]

    def _finished(self, req: Request, length: int) -> bool:
        eos = req.eos_token if req.eos_token is not None else self.eos_token
        return (len(req.tokens) >= req.max_new
                or (eos is not None and req.tokens[-1] == int(eos))
                or length + 1 >= self.model.max_len)

    def run(self, requests: Sequence[Request]):
        """Process requests to completion with continuous batching; returns
        the same list with ``tokens`` / ``finished`` / telemetry filled in.
        Callable repeatedly; the engine state (cache, rng, stats) persists."""
        queue = deque(requests)
        slot_req: list = [None] * self.slots
        lengths = np.zeros(self.slots, np.int32)
        toks = np.zeros(self.slots, np.int32)

        def retire(s):
            req = slot_req[s]
            req.finished = True
            req.finished_at_step = self.stats["decode_steps"]
            slot_req[s] = None

        while queue or any(r is not None for r in slot_req):
            for s in range(self.slots):
                if slot_req[s] is None and queue:
                    req = queue.popleft()
                    self._admit(req, s, lengths, toks)
                    slot_req[s] = req
                    if self._finished(req, int(lengths[s])):
                        retire(s)
            active = np.array([r is not None for r in slot_req])
            if not active.any():
                continue
            self._key, k1 = jax.random.split(self._key)
            self.cache, seq = self._decode(
                self.params, self.cache, jnp.asarray(toks),
                jnp.asarray(lengths), jnp.asarray(active), k1)
            seq = np.asarray(seq)                        # (chunk, S)
            n_steps = seq.shape[0]
            self.stats["decode_steps"] += n_steps
            self.stats["slot_steps_total"] += self.slots * n_steps
            for s in range(self.slots):
                if slot_req[s] is None:
                    continue
                req = slot_req[s]
                for t in range(n_steps):
                    lengths[s] += 1
                    toks[s] = int(seq[t, s])
                    req.tokens.append(int(seq[t, s]))
                    self.stats["slot_steps_active"] += 1
                    if self._finished(req, int(lengths[s])):
                        retire(s)      # surplus chunk tokens are trimmed
                        break
        return list(requests)

    @property
    def occupancy(self) -> float:
        """Mean fraction of slots doing useful work per decode step — the
        number continuous batching exists to push toward 1.0."""
        tot = self.stats["slot_steps_total"]
        return self.stats["slot_steps_active"] / tot if tot else 0.0
