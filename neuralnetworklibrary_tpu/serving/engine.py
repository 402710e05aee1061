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
tests/test_serving.py); sampled decode draws from the same
penalty → temperature → top-k → nucleus family as ``generate`` — with every
Request free to override (k, temperature, top_p, repetition_penalty)
individually, applied per slot inside the one jitted step — but consumes
per-slot rng streams, so sequences are reproducible given the engine seed
while differing from single-request streams.
"""

from __future__ import annotations

import functools
from collections import deque
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class Request:
    """One generation request: ``prompt`` (token ids), ``max_new`` tokens to
    emit, optional per-request ``eos_token`` override.  ``k`` /
    ``temperature`` / ``top_p`` / ``repetition_penalty`` override the engine
    defaults PER REQUEST (None keeps the engine's) — different requests in
    the same continuous batch each sample under their own parameters, the
    production-endpoint contract.  After the engine finishes it: ``tokens``
    (the emitted ids, EOS included when hit), ``finished``, and scheduling
    telemetry (``admitted_at_step`` / ``finished_at_step``, in engine decode
    steps)."""

    def __init__(self, prompt: Sequence[int], max_new: int,
                 eos_token: Optional[int] = None, k: Optional[int] = None,
                 temperature: Optional[float] = None,
                 top_p: Optional[float] = None,
                 repetition_penalty: Optional[float] = None,
                 adapter: Optional[int] = None,
                 stop_sequences: Optional[Sequence[Sequence[int]]] = None):
        if max_new < 1:
            raise ValueError(f"max_new must be >= 1, got {max_new}")
        self.prompt = list(int(t) for t in prompt)
        if not self.prompt:
            raise ValueError("empty prompt")
        self.max_new = int(max_new)
        self.eos_token = eos_token
        self.k = k
        self.temperature = temperature
        self.top_p = top_p
        self.repetition_penalty = repetition_penalty
        # LoRA adapter index into the engine's ``adapters`` list (None =
        # the base model) — multi-tenant serving: every request in the
        # batch decodes under ITS OWN fine-tune
        self.adapter = adapter
        # multi-token stop: generation ends when the emitted tail equals any
        # of these id sequences (the matched sequence is kept, like EOS)
        self.stop_sequences = ([list(int(t) for t in s)
                                for s in stop_sequences]
                               if stop_sequences else [])
        if any(not s for s in self.stop_sequences):
            raise ValueError("empty stop sequence")
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
    k / temperature / top_p / repetition_penalty: DEFAULT sampling family
        (k=1 => exact greedy); every Request may override any of them, and
        each slot of the jitted decode step samples under its own values
        (the parameters enter as (slots,) vectors, so mixed batches never
        recompile).  Semantics match nn.transformer.generate: penalty →
        temperature → top-k → nucleus.  The repetition penalty reads a
        device-resident (slots, V) seen-count buffer seeded from the prompt
        at admission.
    max_k: static top-k width of the jitted sampler; any request k <= max_k
        shares the same compilation.
    eos_token: default stop token (None: run to max_new).
    pad_token: id used to right-pad prefill buckets (inert, any id works).
    chunk: decode steps per host round-trip.  1 = pure iteration-level
        scheduling (admit/retire after every token).  >1 runs ``chunk``
        steps in one jitted ``lax.scan`` before the host looks at the
        tokens — slots that finish mid-chunk ride to the boundary and their
        surplus tokens are trimmed (emitted sequences are IDENTICAL; only
        admission latency coarsens).  Use when host↔device latency, not
        compute, binds the decode loop.
    mesh / param_rule: tensor-parallel serving.  Pass the model's
        ``jax.sharding.Mesh`` (the model itself should be built with
        ``mesh=`` so its internal activation constraints apply) and a
        param rule (``transformer_param_rule(mesh)``): the weights are
        device_put under the Megatron layout, the KV cache is sharded on
        its head axis over '{model}' (when tp divides n_kv_heads;
        replicated otherwise), and every jitted engine fn — prefill,
        suffix prefill, chunked decode — runs under GSPMD, which derives
        the per-layer collectives.  A model too big for one chip serves
        at 1/tp weights + 1/tp KV per chip; emitted tokens are EXACTLY
        the single-chip engine's (pinned in tests/test_serving.py).
        Quantized params are replicated (QTensor leaves don't match the
        Megatron rule's path shapes).
    adapters: MULTI-LoRA serving (LoRAX-style multi-tenant).  A list of N
        single-adapter LoRA params trees (each trained at the model's
        ``lora_rank``); the engine stacks them into the model's
        ``n_adapters = N+1`` leaves (row 0 = zero base adapter,
        nn.lora.stack_adapters) and every Request picks its fine-tune via
        ``adapter=i`` (None = base).  Per-slot adapter ids ride the same
        jitted decode step — any adapter mix in the batch, zero
        recompiles.  Requires ``model.n_adapters == N+1``; pass
        ``adapters=None`` with a pre-stacked params tree to address rows
        directly.  Prefix caching applies only to base-adapter requests
        (a prefix prefilled by the base would be stale under an adapter).
    """

    def __init__(self, model, params, slots: int = 4,
                 prompt_buckets: Sequence[int] = (32, 128, 512),
                 eos_token: Optional[int] = None, k: int = 1,
                 temperature: float = 1.0, top_p: float = 1.0,
                 repetition_penalty: float = 1.0, max_k: int = 64,
                 pad_token: int = 0, seed: int = 0, chunk: int = 1,
                 mesh=None, param_rule=None, adapters=None,
                 prefill_chunk: int = 0):
        if getattr(model, "max_len", 0) <= 0:
            raise ValueError("model.max_len must be > 0 for decoding")
        if getattr(model, "paged_kv_blocks", 0) > 0 \
                and not hasattr(self, "n_blocks"):
            raise ValueError(
                "paged_kv_blocks > 0 models serve through "
                "serving.paged.PagedServingEngine, not the dense engine")
        # MoE models serve through the same decode path (generate/beam
        # already handle the 3-tuple output).  Caveat inherited from GShard
        # capacity routing: when capacity BINDS, a token's expert slot
        # depends on the other rows in the decode batch, so emitted tokens
        # can differ from a solo generate of the same prompt.  With
        # capacity_factor >= n_experts the FCFS fill can never overflow
        # (C >= top_k*N), routing is per-token independent, and engine
        # greedy is token-exact vs generate (pinned in tests/test_serving).
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
        self.top_p, self.repetition_penalty = float(top_p), float(
            repetition_penalty)
        # static top-k width of the jitted sampler — per-request k masks
        # within it, so any k <= max_k never recompiles
        self.max_k = min(int(max_k), model.vocab_size)
        self._check_sampling(self.k, self.temperature, self.top_p,
                             self.repetition_penalty)
        self.pad_token = int(pad_token)
        # per-slot sampling parameters (host mirrors, shipped per decode
        # call) and the device-resident seen-token counts the repetition
        # penalty reads (row s is fully rebuilt when a request is admitted
        # into slot s)
        self._k_arr = np.full(self.slots, self.k, np.int32)
        self._t_arr = np.full(self.slots, self.temperature, np.float32)
        self._p_arr = np.full(self.slots, self.top_p, np.float32)
        self._r_arr = np.full(self.slots, self.repetition_penalty,
                              np.float32)
        self._seen = jnp.zeros((self.slots, model.vocab_size), jnp.int32)
        self._seen_put = jax.jit(
            lambda s, row, i: jax.lax.dynamic_update_slice(
                s, row[None], (i, 0)))
        # multi-LoRA: stacked adapter rows + per-slot adapter ids
        self._n_adapters = int(getattr(model, "n_adapters", 0) or 0)
        self._adapter_base_row = 0
        if adapters is not None:
            from neuralnetworklibrary_tpu.nn.lora import stack_adapters

            adapters = list(adapters)
            if self._n_adapters != len(adapters) + 1:
                raise ValueError(
                    f"model.n_adapters must be len(adapters)+1 = "
                    f"{len(adapters) + 1}, got {self._n_adapters}")
            if getattr(model, "lora_rank", 0) <= 0:
                raise ValueError("adapters= needs a model with lora_rank > 0")
            self.params = stack_adapters(self.params, adapters)
            self._adapter_base_row = 1
        self._ad_arr = np.zeros(self.slots, np.int32)
        if chunk < 1:
            raise ValueError(f"chunk must be >= 1, got {chunk}")
        self.chunk = int(chunk)
        # chunked prefill (vLLM-style): prompts LONGER than prefill_chunk
        # process in fixed prefill_chunk-token slices, one per scheduler
        # iteration, INTERLEAVED with the other slots' decode steps — a
        # long prompt no longer stalls every in-flight request for its
        # whole prefill.  0 = off (one-shot bucketed prefill).  Emission is
        # unchanged: the sliced forwards continue one batch-1 cache at
        # advancing offsets, exactly the prefix-suffix continuation
        # discipline, so the first sampled token is identical.
        if prefill_chunk < 0:
            raise ValueError(
                f"prefill_chunk must be >= 0, got {prefill_chunk}")
        self.prefill_chunk = int(prefill_chunk)
        self._pending_prefill: dict = {}
        self._chunk_jit = None
        self._sample_jit = None
        self._insert_jit = None
        self.buckets = tuple(sorted(b for b in prompt_buckets
                                    if b <= model.max_len))
        from neuralnetworklibrary_tpu.nn.transformer import init_cache

        self._init_cache = init_cache
        self.cache = init_cache(model, self.slots)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from neuralnetworklibrary_tpu.parallel import mesh as pmesh

            if self._quantized or param_rule is None:
                self.params = pmesh.replicate_tree(self.params, mesh)
            else:
                self.params = pmesh.shard_params(self.params, mesh,
                                                 param_rule)
            tp = dict(zip(mesh.axis_names, mesh.devices.shape)
                      ).get("model", 1)

            def put_cache(x):
                # (B, max_len, Hkv, hd) K/V rows: shard heads over 'model';
                # (B, max_len, Hkv) int8-KV scale rows shard the same axis
                if x.ndim == 4 and x.shape[2] % tp == 0:
                    spec = PartitionSpec(None, None, "model", None)
                elif x.ndim == 3 and x.shape[2] % tp == 0:
                    spec = PartitionSpec(None, None, "model")
                else:
                    spec = PartitionSpec()
                return jax.device_put(x, NamedSharding(mesh, spec))

            self.cache = jax.tree_util.tree_map(put_cache, self.cache)
            self._seen = jax.device_put(
                self._seen, NamedSharding(mesh, PartitionSpec()))
        self._key = jax.random.PRNGKey(seed)
        # per-slot valid-token counts of the LAST decode call; None means
        # "every step of the chunk" (dense/paged).  The speculative engine
        # emits a VARIABLE number of tokens per slot per round and sets
        # this (S,) array each call.
        self._last_emit = None
        self._prefill_jits: dict = {}
        self._suffix_jits: dict = {}
        self._decode = jax.jit(self._decode_chunk)
        self._decode_njits: dict = {}
        self._prefix: Optional[tuple] = None   # (tokens, batch-1 cache)
        self.stats = {"decode_steps": 0, "prefills": 0,
                      "prefix_hits": 0, "prefill_tokens": 0,
                      "slot_steps_active": 0, "slot_steps_total": 0,
                      "sat_slot_steps_active": 0, "sat_slot_steps_total": 0,
                      "prefill_slices": 0}

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
                        slot, key, k, temp, top_p, rep, seen_row, aid=0):
        """Continue the saved prefix cache with the request's suffix (the
        internal position counter resumes at the prefix length), then insert
        the filled batch-1 rows at ``slot``."""
        if self._quantized:
            params = self._dequantize(params)
        out, mut = self.model.apply({"params": params, "cache": pcache},
                                    suffix, decode=True, mutable=["cache"],
                                    **self._adapter_kw(aid, 1))
        logits = out[0][0, true_len - 1]

        def ins(big, small):
            if big.ndim == 0:
                return big
            return jax.lax.dynamic_update_slice(
                big, small, (slot,) + (0,) * (big.ndim - 1))

        cache = jax.tree_util.tree_map(ins, cache, mut["cache"])
        return cache, self._sample(key, logits, k, temp, top_p, rep,
                                   seen_row)

    # ------------------------------------------------------------- device fns

    def _adapter_kw(self, aid, bs):
        """adapter_ids kwarg for a batch-``bs`` apply — empty for plain
        models, so non-LoRA models never see the argument."""
        if self._n_adapters <= 0:
            return {}
        ids = (aid if hasattr(aid, "ndim") and getattr(aid, "ndim", 0)
               else jnp.full((bs,), aid, jnp.int32))
        return {"adapter_ids": ids}

    def _check_sampling(self, k, temperature, top_p, rep):
        if not 1 <= int(k) <= self.max_k:
            raise ValueError(f"k must be in [1, max_k={self.max_k}], got {k}")
        if temperature <= 0:
            raise ValueError(f"temperature must be > 0, got {temperature}")
        if not 0 < top_p <= 1:
            raise ValueError(f"top_p must be in (0, 1], got {top_p}")
        if rep <= 0:
            raise ValueError(
                f"repetition_penalty must be > 0, got {rep}")

    def _sample(self, key, logits, k, temp, top_p, rep, seen):
        """One slot's sample under ITS parameters — the same semantics chain
        as nn.transformer.generate (repetition penalty → temperature →
        top-k → nucleus → categorical over the renormalized survivors).
        logits (V,), seen (V,) int32 emitted/prompt counts.  k=1 is exact
        greedy: only rank 0 survives the k mask, and rank 0 always survives
        the nucleus mask (its exclusive cumulative mass is 0 < top_p), so
        the choice is argmax with top_k's first-index tie-break."""
        pen = jnp.where(logits > 0, logits / rep, logits * rep)
        logits = jnp.where(seen > 0, pen, logits)
        logits = logits / jnp.maximum(temp, 1e-6)
        vals, idxs = jax.lax.top_k(logits, self.max_k)
        vals = jnp.where(jnp.arange(self.max_k) < k, vals, -jnp.inf)
        probs = jax.nn.softmax(vals)
        vals = jnp.where(jnp.cumsum(probs) - probs < top_p, vals, -jnp.inf)
        choice = jax.random.categorical(key, vals)
        return idxs[choice].astype(jnp.int32)

    def _prefill_into(self, params, cache, prompt, true_len, slot, key,
                      k, temp, top_p, rep, seen_row, aid=0):
        """Run the prompt through a batch-1 cache, insert the filled rows at
        ``slot`` of the engine cache, sample the first continuation token
        from the logits at position true_len-1 (right-padding beyond it is
        never attendable by a causal query, so it cannot perturb them)."""
        cache1 = self._init_cache(self.model, 1)
        if self._quantized:
            params = self._dequantize(params)
        out, mut = self.model.apply({"params": params, "cache": cache1},
                                    prompt, decode=True, mutable=["cache"],
                                    **self._adapter_kw(aid, 1))
        logits = out[0][0, true_len - 1]

        def ins(big, small):
            if big.ndim == 0:          # the shared idx counter — unused here
                return big
            return jax.lax.dynamic_update_slice(
                big, small, (slot,) + (0,) * (big.ndim - 1))

        cache = jax.tree_util.tree_map(ins, cache, mut["cache"])
        return cache, self._sample(key, logits, k, temp, top_p, rep,
                                   seen_row)

    # ------------------------------------------------------ chunked prefill

    def _chunk_prefill_model(self):
        """Model the sliced prefill forwards run through (the paged engine
        substitutes its dense batch-1 clone)."""
        return self.model

    def _prefill_chunk_step(self, params, cache1, chunk, off, idx, row):
        """One (1, prefill_chunk) slice at scalar offset ``off`` continuing
        the staged batch-1 cache; returns (cache, logits[0, idx]) — idx
        only matters on the final slice (right-pad writes land beyond the
        true length and are overwritten before attendable, the standard
        decode-path invariant)."""
        if self._quantized:
            params = self._dequantize(params)
        out, mut = self._chunk_prefill_model().apply(
            {"params": params, "cache": cache1}, chunk, decode=True,
            offsets=off, mutable=["cache"], **self._adapter_kw(row, 1))
        return mut["cache"], out[0][0, idx]

    def _insert_prefill(self, cache, mut_cache, slot, *extra):
        """Insert a completed batch-1 prefill cache at ``slot`` (the paged
        engine scatters into its pool rows instead)."""
        def ins(big, small):
            if big.ndim == 0:
                return big
            return jax.lax.dynamic_update_slice(
                big, small, (slot,) + (0,) * (big.ndim - 1))

        return jax.tree_util.tree_map(ins, cache, mut_cache)

    def _advance_prefills(self, slot_req, lengths, toks, on_token, retire):
        """Run ONE prefill slice for every mid-prefill slot; finalize slots
        whose prompt just completed (sample the first token, insert the
        strip, stream, retire-check)."""
        if not self._pending_prefill:
            return
        if self._chunk_jit is None:
            self._chunk_jit = jax.jit(self._prefill_chunk_step)
        C = self.prefill_chunk
        for slot in list(self._pending_prefill):
            st = self._pending_prefill[slot]
            p, pos = st["prompt"], st["pos"]
            n = min(C, len(p) - pos)
            sl = np.full((1, C), self.pad_token, np.int32)
            sl[0, :n] = p[pos:pos + n]
            idx = min(max(len(p) - 1 - pos, 0), C - 1)
            st["cache1"], logits = self._chunk_jit(
                self.params, st["cache1"], jnp.asarray(sl),
                jnp.asarray(pos, jnp.int32), jnp.asarray(idx, jnp.int32),
                jnp.asarray(st["row"], jnp.int32))
            st["pos"] = pos + n
            self.stats["prefill_slices"] += 1
            if st["pos"] < len(p):
                continue
            # final slice landed: sample, insert, finalize the admission
            rk, rt, rp, rr = st["samp"]
            if self._sample_jit is None:
                self._sample_jit = jax.jit(self._sample)
            seen_row = st["seen_row"]
            tok = int(self._sample_jit(
                st["key"], logits, rk, rt, rp, rr, jnp.asarray(seen_row)))
            if self._insert_jit is None:
                self._insert_jit = jax.jit(self._insert_prefill)
            self.cache = self._insert_jit(
                self.cache, st["cache1"], jnp.asarray(slot, jnp.int32),
                *self._extra_prefill_args(slot))
            req = st["req"]
            req.tokens.append(tok)
            seen_row[tok] += 1
            self._seen = self._seen_put(self._seen, jnp.asarray(seen_row),
                                        slot)
            req.admitted_at_step = self.stats["decode_steps"]
            self.stats["prefills"] += 1
            self.stats["prefill_tokens"] += len(p)
            lengths[slot] = len(p)
            toks[slot] = tok
            del self._pending_prefill[slot]
            if on_token is not None:
                on_token(req, tok)
            if self._finished(req, int(lengths[slot])):
                retire(slot)

    def _decode_step(self, params, cache, toks, lengths, active, seen,
                     kv, tv, pv, rv, av, key, table=None):
        """One token for every slot at its own offset, each slot sampling
        under ITS OWN (k, temperature, top_p, repetition_penalty) — and,
        multi-LoRA, under its own adapter; inactive slots recycle their
        last token (their writes land in rows a future prefill fully
        replaces).  ``table`` is the paged-KV block table (PagedServingEngine
        threads it; dense engines never pass it)."""
        if self._quantized:
            params = self._dequantize(params)
        kw = {} if table is None else {"block_table": table}
        out, mut = self.model.apply({"params": params, "cache": cache},
                                    toks[:, None], decode=True,
                                    offsets=lengths, mutable=["cache"],
                                    **kw, **self._adapter_kw(av, self.slots))
        logits = out[0][:, -1]                                  # (S, V)
        keys = jax.random.split(key, self.slots)
        nxt = jax.vmap(self._sample)(keys, logits, kv, tv, pv, rv, seen)
        nxt = jnp.where(active, nxt, toks)
        seen = seen + (jax.nn.one_hot(nxt, seen.shape[-1], dtype=seen.dtype)
                       * active[:, None])
        return mut["cache"], seen, nxt

    def _decode_chunk(self, params, cache, toks, lengths, active, seen,
                      kv, tv, pv, rv, av, key, table=None, *, n_steps=None):
        """``n_steps`` (default ``chunk``) decode steps in one device
        program — per-step offsets advance on device, the host sees
        (n_steps, S) tokens at the end."""
        def step(carry, k1):
            cache, toks, lens, seen = carry
            cache, seen, nxt = self._decode_step(
                params, cache, toks, lens, active, seen, kv, tv, pv, rv,
                av, k1, table)
            return (cache, nxt, lens + active.astype(jnp.int32), seen), nxt

        (cache, _, _, seen), seq = jax.lax.scan(
            step, (cache, toks, lengths, seen),
            jax.random.split(key, self.chunk if n_steps is None
                             else n_steps))
        return cache, seen, seq                                # (n_steps, S)

    def _decode_for(self, n_steps: int):
        """The jitted decode program for an ``n_steps``-long chunk.

        The run loop shortens a chunk to the nearest power of two at or
        under the smallest KNOWN remaining budget among active slots
        (max_new / max_len), so a slot retiring at its budget does it AT a
        chunk boundary instead of wasting the tail of a full chunk on
        trimmed tokens — the single biggest occupancy leak at chunk>1
        (r3 recorded 0.759).  At most log2(chunk) extra compiled variants;
        eos/stop-sequence retirements still trim (they are data-dependent).
        """
        if n_steps >= self.chunk:
            return self._decode
        fn = self._decode_njits.get(n_steps)
        if fn is None:
            fn = self._decode_njits[n_steps] = jax.jit(
                functools.partial(self._decode_chunk, n_steps=n_steps))
        return fn

    # ------------------------------------------------- paged-engine hooks

    def _extra_decode_args(self) -> tuple:
        """Extra positional args appended to every jitted decode call
        (the paged engine ships its block table here)."""
        return ()

    def _extra_prefill_args(self, slot: int) -> tuple:
        """Extra positional args appended to the jitted prefill calls
        (the paged engine ships the slot's pool-row vector here)."""
        return ()

    def _can_admit(self, req: Request) -> bool:
        """May ``req`` be admitted right now?  The paged engine gates on
        free pool blocks for the prompt."""
        return True

    def _on_retire(self, slot: int):
        """A slot's request just finished (paged engine frees its blocks)."""

    def _pre_decode(self, queue, slot_req, lengths, toks):
        """Runs before every decode chunk — the paged engine allocates the
        blocks the chunk will write (preempting a slot if the pool is
        exhausted)."""

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
        # per-request sampling parameters (engine defaults unless overridden)
        rk = self.k if req.k is None else int(req.k)
        rt = self.temperature if req.temperature is None else float(
            req.temperature)
        rp = self.top_p if req.top_p is None else float(req.top_p)
        rr = (self.repetition_penalty if req.repetition_penalty is None
              else float(req.repetition_penalty))
        self._check_sampling(rk, rt, rp, rr)
        self._k_arr[slot], self._t_arr[slot] = rk, rt
        self._p_arr[slot], self._r_arr[slot] = rp, rr
        # adapter row: 0 = base; engine-stacked adapters are 1-indexed rows
        if req.adapter is not None and self._n_adapters <= 0:
            raise ValueError(
                "Request.adapter needs an engine built with adapters= "
                "(or a pre-stacked n_adapters model)")
        row = 0 if req.adapter is None \
            else int(req.adapter) + self._adapter_base_row
        if not 0 <= row < max(1, self._n_adapters):
            raise ValueError(
                f"adapter {req.adapter} out of range (engine serves "
                f"{max(0, self._n_adapters - self._adapter_base_row)} "
                f"adapters + base)")
        self._ad_arr[slot] = row
        seen_row = np.bincount(p, minlength=self.model.vocab_size) \
            .astype(np.int32)
        self._key, k1 = jax.random.split(self._key)
        pre = self._prefix
        hit = (pre is not None and row == 0 and len(p) > len(pre[0])
               and list(p[:len(pre[0])]) == pre[0])
        if self.prefill_chunk > 0 and not hit \
                and len(p) > self.prefill_chunk:
            # chunked prefill: stage the state and return False — the run
            # loop advances one prefill_chunk-token slice per iteration,
            # interleaved with the other slots' decode steps; the first
            # token samples when the last slice lands
            self._pending_prefill[slot] = {
                "req": req, "prompt": p, "pos": 0, "key": k1,
                "samp": (rk, rt, rp, rr), "seen_row": seen_row,
                "row": row,
                "cache1": self._init_cache(self._chunk_prefill_model(), 1)}
            return False
        if hit:
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
                                 jnp.asarray(padded), len(suf), slot, k1,
                                 rk, rt, rp, rr, jnp.asarray(seen_row), row,
                                 *self._extra_prefill_args(slot))
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
                                 jnp.asarray(padded), len(p), slot, k1,
                                 rk, rt, rp, rr, jnp.asarray(seen_row), row,
                                 *self._extra_prefill_args(slot))
            self.stats["prefill_tokens"] += len(p)
        req.tokens.append(int(tok))
        seen_row[int(tok)] += 1
        self._seen = self._seen_put(self._seen, jnp.asarray(seen_row),
                                    slot)
        req.admitted_at_step = self.stats["decode_steps"]
        self.stats["prefills"] += 1
        lengths[slot] = len(p)
        toks[slot] = req.tokens[-1]

    def _finished(self, req: Request, length: int) -> bool:
        eos = req.eos_token if req.eos_token is not None else self.eos_token
        return (len(req.tokens) >= req.max_new
                or (eos is not None and req.tokens[-1] == int(eos))
                or any(req.tokens[-len(s):] == s
                       for s in req.stop_sequences)
                or length + 1 >= self.model.max_len)

    def run(self, requests: Sequence[Request], on_token=None):
        """Process requests to completion with continuous batching; returns
        the same list with ``tokens`` / ``finished`` / telemetry filled in.
        Callable repeatedly; the engine state (cache, rng, stats) persists.

        ``on_token(request, token_id)`` streams every emitted token to the
        caller as the host sees it — per decode step at ``chunk=1`` (true
        token streaming), per chunk boundary otherwise (trimmed tokens are
        never streamed).  The prefill's first token streams at admission."""
        queue = deque(requests)
        slot_req: list = [None] * self.slots
        lengths = np.zeros(self.slots, np.int32)
        toks = np.zeros(self.slots, np.int32)

        def retire(s):
            req = slot_req[s]
            req.finished = True
            req.finished_at_step = self.stats["decode_steps"]
            slot_req[s] = None
            self._on_retire(s)

        while queue or any(r is not None for r in slot_req):
            for s in range(self.slots):
                if slot_req[s] is None and queue \
                        and self._can_admit(queue[0]):
                    req = queue.popleft()
                    slot_req[s] = req
                    if self._admit(req, s, lengths, toks) is False:
                        continue            # mid chunked prefill
                    if on_token is not None:
                        on_token(req, req.tokens[-1])
                    if self._finished(req, int(lengths[s])):
                        retire(s)
            self._advance_prefills(slot_req, lengths, toks, on_token,
                                   retire)
            self._pre_decode(queue, slot_req, lengths, toks)
            active = np.array([slot_req[s] is not None
                               and s not in self._pending_prefill
                               for s in range(self.slots)])
            if not active.any():
                continue
            self._key, k1 = jax.random.split(self._key)
            # shorten the chunk to the nearest power of two at or under the
            # smallest KNOWN remaining budget among active slots, so
            # budget-bound retirements land at chunk boundaries (trimmed
            # steps were the main occupancy leak — see _decode_for)
            rem = min(
                min(slot_req[s].max_new - len(slot_req[s].tokens),
                    self.model.max_len - 1 - int(lengths[s]))
                for s in range(self.slots) if active[s])
            n_chunk = 1
            while n_chunk * 2 <= min(self.chunk, rem):
                n_chunk *= 2
            self.cache, self._seen, seq = self._decode_for(n_chunk)(
                self.params, self.cache, jnp.asarray(toks),
                jnp.asarray(lengths), jnp.asarray(active), self._seen,
                jnp.asarray(self._k_arr), jnp.asarray(self._t_arr),
                jnp.asarray(self._p_arr), jnp.asarray(self._r_arr),
                jnp.asarray(self._ad_arr), k1, *self._extra_decode_args())
            seq = np.asarray(seq)                        # (chunk, S)
            n_steps = seq.shape[0]
            saturated = bool(queue)  # work was WAITING while this chunk ran
            self.stats["decode_steps"] += n_steps
            self.stats["slot_steps_total"] += self.slots * n_steps
            if saturated:
                self.stats["sat_slot_steps_total"] += self.slots * n_steps
            emit = self._last_emit
            for s in range(self.slots):
                if slot_req[s] is None or s in self._pending_prefill:
                    continue            # mid chunked prefill: no emissions
                req = slot_req[s]
                for t in range(n_steps if emit is None else int(emit[s])):
                    lengths[s] += 1
                    toks[s] = int(seq[t, s])
                    req.tokens.append(int(seq[t, s]))
                    if on_token is not None:
                        on_token(req, int(seq[t, s]))
                    self.stats["slot_steps_active"] += 1
                    if saturated:
                        self.stats["sat_slot_steps_active"] += 1
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

    @property
    def occupancy_saturated(self) -> float:
        """Occupancy over only the chunks dispatched while requests were
        WAITING in the queue — the scheduler-quality number a finite
        benchmark's drain tail (empty slots with an empty queue, which no
        scheduler can fill) cannot depress.  A production endpoint under
        load lives in this regime."""
        tot = self.stats["sat_slot_steps_total"]
        return self.stats["sat_slot_steps_active"] / tot if tot else 0.0
