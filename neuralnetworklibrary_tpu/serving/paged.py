"""Paged-KV continuous-batching engine — the vLLM memory model on TPU.

The dense :class:`~neuralnetworklibrary_tpu.serving.engine.ServingEngine`
reserves ``slots x max_len`` KV rows per layer whether or not the slots use
them; real request mixes are mostly short, so almost all of that HBM idles.
This engine stores K/V in one shared pool of fixed-size blocks per layer
(``TransformerLM(paged_kv_blocks=N, paged_kv_block=B)``) and gives each
in-flight sequence only the blocks its tokens actually occupy:

- a host-side allocator hands out pool rows (row 0 is the reserved trash
  block — unallocated table entries point at it, inactive slots write into
  it, and the position mask keeps it out of every softmax),
- each decode chunk ships a ``(slots, ceil(max_len/block))`` int32 block
  table; the jitted step scatters this step's K/V at
  ``pool[table[s, off//B], off%B]`` and gathers each slot's logical strip
  back for attention — static shapes, one compilation,
- blocks are allocated ON DEMAND as sequences cross block boundaries, and
  freed the moment a request retires,
- when the pool runs dry the engine preempts the youngest active request
  vLLM-style (recompute: its blocks are freed and it re-queues with
  ``prompt + emitted`` as the new prompt — greedy decoding is bit-exact
  across preemption because causal re-prefill reproduces the logits;
  sampled requests resume from a fresh rng split).

Because HBM holds ``N·B`` cached positions instead of ``slots·max_len``,
the engine serves MANY more concurrent slots than a dense cache fits —
the pool is sized to the expected TOTAL live tokens, not to
``slots × worst case``.

Prefill runs through a dense batch-1 clone of the model (the causal
right-pad argument of the dense engine applies unchanged), then one jitted
scatter distributes the strip into the slot's blocks.  Greedy emission is
token-for-token identical to the dense engine and to ``generate`` (pinned
in tests/test_paged.py).  Composes with ``kv_quant=True``: the pools hold
int8 codes plus (blocks, block, Hkv) f32 scales — write-time quantization
is the SAME function as the dense int8 cache, so paged+quant greedy
emission is token-exact vs the dense kv_quant engine (also pinned).

Reference: the reference has no serving story (Applications/Text.py:655-676
is its only generation entry point); this subsystem is beyond-parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from neuralnetworklibrary_tpu.serving.engine import Request, ServingEngine


def _pool_insert(pool, dense, rows, block):
    """Scatter a dense batch-1 cache strip into pool blocks.

    pool: the engine's paged cache subtree ({'pool_k','pool_v'} leaves);
    dense: the batch-1 dense cache subtree ({'k','v'} strips, (1, M, ...));
    rows: (MB,) int32 pool rows for the slot's logical blocks (0 = trash
    for unallocated entries — those writes land in the trash block).
    """
    dense_key = {"pool_k": "k", "pool_v": "v",
                 "pool_k_scale": "k_scale", "pool_v_scale": "v_scale"}
    new = {}
    for kk, vv in pool.items():
        if isinstance(vv, dict):
            new[kk] = _pool_insert(vv, dense[kk], rows, block)
        elif kk in dense_key:
            strip = dense[dense_key[kk]][0]   # (M, Hkv, hd) / (M, Hkv) scale
            mb = rows.shape[0]
            pad = mb * block - strip.shape[0]
            if pad > 0:
                strip = jnp.pad(strip,
                                ((0, pad),) + ((0, 0),) * (strip.ndim - 1))
            blocks = strip[: mb * block].reshape(mb, block,
                                                 *strip.shape[1:])
            new[kk] = vv.at[rows].set(blocks.astype(vv.dtype))
        else:                       # the shared idx counter
            new[kk] = vv
    return new


class PagedServingEngine(ServingEngine):
    """Continuous batching over a paged KV pool.

    model: a TransformerLM built with ``paged_kv_blocks > 0`` (and
        optionally ``paged_kv_block``); the pool must hold at least one
        max-length sequence plus the trash block
        (``paged_kv_blocks > ceil(max_len / paged_kv_block)``) so a lone
        request can always run to completion.
    Everything else — per-request sampling, multi-LoRA adapters, prompt
    buckets, chunked decode, prefix caching, tensor-parallel ``mesh=`` —
    behaves exactly as in :class:`ServingEngine`.

    Extra stats: ``preemptions`` (recompute evictions) and ``blocks_peak``
    (high-water pool occupancy, excluding the trash block).
    """

    def __init__(self, model, params, slots: int = 4, **kw):
        if getattr(model, "paged_kv_blocks", 0) <= 0:
            raise ValueError(
                "PagedServingEngine needs a model with paged_kv_blocks > 0 "
                "(use the dense ServingEngine otherwise)")
        self.block = int(model.paged_kv_block)
        self.n_blocks = int(model.paged_kv_blocks)
        self.mb = -(-model.max_len // self.block)
        if self.n_blocks < self.mb + 1:
            raise ValueError(
                f"paged_kv_blocks must exceed ceil(max_len/block) = "
                f"{self.mb} (one max-length sequence + the trash block), "
                f"got {self.n_blocks}")
        super().__init__(model, params, slots=slots, **kw)
        # dense batch-1 clone for prefill (same param tree; its (1, max_len)
        # cache exists only inside the prefill jit)
        self._prefill_model = model.clone(paged_kv_blocks=0)
        self._table = np.zeros((self.slots, self.mb), np.int32)
        self._free = list(range(self.n_blocks - 1, 0, -1))  # row 0 = trash
        self._owned: list = [[] for _ in range(self.slots)]
        # shared-prefix block count per slot: the first _shared[s] table
        # entries point at the engine-owned prefix rows (read-only for the
        # slot — decode writes land at offsets past the prefix, and the
        # suffix-prefill scatter rewrites them with identical bytes)
        self._shared = np.zeros(self.slots, np.int32)
        self._prefix_rows: list = []
        self._slot_seq = np.zeros(self.slots, np.int64)
        self._seq = 0
        self.stats.update(preemptions=0, blocks_peak=0)

    # ------------------------------------------------------------- allocator

    def _alloc(self, slot: int, n: int) -> bool:
        """Grow ``slot`` to ``n`` logical blocks (shared prefix rows count);
        False if the pool is dry."""
        n = min(n, self.mb)
        while int(self._shared[slot]) + len(self._owned[slot]) < n:
            if not self._free:
                return False
            r = self._free.pop()
            self._table[slot, int(self._shared[slot])
                        + len(self._owned[slot])] = r
            self._owned[slot].append(r)
        used = self.n_blocks - 1 - len(self._free)
        if used > self.stats["blocks_peak"]:
            self.stats["blocks_peak"] = used
        return True

    def _free_slot(self, slot: int):
        """Release the slot's OWNED rows; shared prefix rows belong to the
        engine and outlive every slot."""
        self._free.extend(self._owned[slot])
        self._owned[slot].clear()
        self._shared[slot] = 0
        self._table[slot, :] = 0

    def _preempt(self, slot: int, queue, slot_req, lengths, toks):
        """Recompute-style eviction: free the slot's blocks and re-queue the
        request with ``original prompt + emitted tokens`` as its prompt —
        re-prefill reproduces the causal state exactly, so greedy emission
        is unchanged (sampling resumes from a fresh rng split)."""
        req = slot_req[slot]
        if not hasattr(req, "_orig_prompt"):
            req._orig_prompt = list(req.prompt)
        req.prompt = list(req._orig_prompt) + list(req.tokens)
        slot_req[slot] = None
        self._free_slot(slot)
        queue.appendleft(req)
        self.stats["preemptions"] += 1

    # ------------------------------------------------------- engine hooks

    @property
    def _alloc_horizon(self) -> int:
        """Positions a decode round may write per slot — chunk tokens here;
        the speculative subclass advances up to γ+1 per round."""
        return self.chunk

    def _extra_decode_args(self):
        return (jnp.asarray(self._table),)

    def _extra_prefill_args(self, slot: int):
        return (jnp.asarray(self._table[slot]),)

    def _prefix_hit(self, req: Request) -> bool:
        """Mirror of the dense engine's prefix-hit test (engine.py _admit):
        a set prefix, the base adapter, and a strictly-longer prompt that
        starts with it."""
        pre = self._prefix
        return (pre is not None and req.adapter is None
                and len(req.prompt) > len(pre[0])
                and [int(t) for t in req.prompt[:len(pre[0])]] == pre[0])

    def _can_admit(self, req: Request) -> bool:
        need = min((len(req.prompt) + 1 + self.block - 1) // self.block,
                   self.mb)
        if self._prefix_hit(req):
            need -= len(self._prefix_rows)
        return len(self._free) >= max(need, 0)

    def _on_retire(self, slot: int):
        self._free_slot(slot)

    def _admit(self, req: Request, slot: int, lengths, toks):
        if self._prefix_hit(req) and self._prefix_rows:
            # point the slot's first table entries at the engine's shared
            # prefix rows — the prefix KV occupies pool blocks ONCE however
            # many slots reuse it (vLLM block sharing); the suffix prefill's
            # scatter rewrites them with identical bytes, decode never
            # writes them (its offsets start past the prefix)
            nsh = len(self._prefix_rows)
            self._table[slot, :nsh] = self._prefix_rows
            self._shared[slot] = nsh
        need = (len(req.prompt) + 1 + self.block - 1) // self.block
        if not self._alloc(slot, need):
            raise RuntimeError("pool exhausted at admission "
                               "(_can_admit should have gated this)")
        self._slot_seq[slot] = self._seq
        self._seq += 1
        super()._admit(req, slot, lengths, toks)

    def _pre_decode(self, queue, slot_req, lengths, toks):
        """Allocate the blocks this chunk will write; preempt youngest-first
        when the pool runs dry (self-preemption only as the last resort —
        the pool invariant guarantees a lone request always fits)."""
        for s in range(self.slots):
            # mid-chunked-prefill slots neither decode this round nor may
            # be preempted (their pool rows are being filled)
            if slot_req[s] is None or s in self._pending_prefill:
                continue
            need = (int(lengths[s]) + self._alloc_horizon
                    + self.block - 1) // self.block
            while not self._alloc(s, need):
                victims = [t for t in range(self.slots)
                           if t != s and slot_req[t] is not None
                           and t not in self._pending_prefill]
                if victims:
                    v = max(victims, key=lambda t: self._slot_seq[t])
                else:
                    v = s
                self._preempt(v, queue, slot_req, lengths, toks)
                if v == s:
                    break

    # ------------------------------------------------------------- prefill

    def _chunk_prefill_model(self):
        # chunked prefill slices run through the dense batch-1 clone, like
        # every other paged prefill; the final scatter distributes the
        # completed strip into the slot's pool rows
        return self._prefill_model

    def _insert_prefill(self, cache, mut_cache, slot, rows=None):
        return _pool_insert(cache, mut_cache, rows, self.block)

    def set_prefix(self, tokens):
        """Shared-prefix caching, paged twice over: the saved batch-1 cache
        is DENSE (it belongs to the prefill clone) so suffix prefill can
        continue it, AND the prefix's FULL blocks are scattered once into
        engine-owned pool rows every hitting slot's block table points at —
        the prefix occupies ``len(tokens) // block`` pool blocks TOTAL, not
        per slot (vLLM block sharing).  The partial tail block (and the
        suffix) stay per-slot."""
        tokens = [int(t) for t in tokens]
        # release the previous prefix's shared rows (no slot may be active)
        if self._prefix_rows:
            if any(self._shared[s] for s in range(self.slots)):
                raise RuntimeError(
                    "set_prefix while slots still reference the old prefix "
                    "(call between run() batches)")
            self._free.extend(self._prefix_rows)
            self._prefix_rows = []
        if not tokens:
            self._prefix = None
            return
        if len(tokens) + 1 >= self.model.max_len:
            raise ValueError("prefix leaves no room to decode")
        cache1 = self._init_cache(self._prefill_model, 1)
        _, mut = jax.jit(
            lambda p, c, x: self._prefill_model.apply(
                {"params": self._dequantize(p) if self._quantized else p,
                 "cache": c}, x, decode=True,
                mutable=["cache"]))(
            self.params, cache1, jnp.asarray([tokens], jnp.int32))
        self._prefix = (tokens, mut["cache"])
        self.stats["prefill_tokens"] += len(tokens)
        n_full = len(tokens) // self.block
        if n_full:
            if len(self._free) < n_full:
                raise ValueError(
                    f"prefix needs {n_full} free pool blocks, "
                    f"{len(self._free)} free")
            rows = [self._free.pop() for _ in range(n_full)]
            self.cache = jax.jit(
                lambda c, d, r: _pool_insert(c, d, r, self.block))(
                self.cache, mut["cache"], jnp.asarray(rows, jnp.int32))
            self._prefix_rows = rows
            used = self.n_blocks - 1 - len(self._free)
            if used > self.stats["blocks_peak"]:
                self.stats["blocks_peak"] = used

    def _prefill_into(self, params, cache, prompt, true_len, slot, key,
                      k, temp, top_p, rep, seen_row, aid=0, rows=None):
        """Dense batch-1 prefill through the unpaged clone, then one scatter
        distributes the strip into the slot's pool blocks (trash rows absorb
        the unallocated tail; right-pad positions are causally inert and
        overwritten by decode writes as the sequence grows)."""
        cache1 = self._init_cache(self._prefill_model, 1)
        if self._quantized:
            params = self._dequantize(params)
        out, mut = self._prefill_model.apply(
            {"params": params, "cache": cache1}, prompt, decode=True,
            mutable=["cache"], **self._adapter_kw(aid, 1))
        logits = out[0][0, true_len - 1]
        cache = _pool_insert(cache, mut["cache"], rows, self.block)
        return cache, self._sample(key, logits, k, temp, top_p, rep,
                                   seen_row)

    def _prefill_suffix(self, params, cache, pcache, suffix, true_len,
                        slot, key, k, temp, top_p, rep, seen_row, aid=0,
                        rows=None):
        if self._quantized:
            params = self._dequantize(params)
        out, mut = self._prefill_model.apply(
            {"params": params, "cache": pcache}, suffix, decode=True,
            mutable=["cache"], **self._adapter_kw(aid, 1))
        logits = out[0][0, true_len - 1]
        cache = _pool_insert(cache, mut["cache"], rows, self.block)
        return cache, self._sample(key, logits, k, temp, top_p, rep,
                                   seen_row)
