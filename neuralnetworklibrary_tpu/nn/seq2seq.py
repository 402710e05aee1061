"""Encoder–decoder sequence-to-sequence transformer (BART-style layout).

The reference framework is decoder-only / classifier-only (its generation
entry point is the AWD-LSTM ``predict_from_string``, Applications/
Text.py:655-676); translation/summarization-shaped tasks need an encoder the
target stream can cross-attend.  This module builds that family from the
same primitives as :mod:`~neuralnetworklibrary_tpu.nn.transformer` — the
bidirectional encoder blocks reuse ``CausalSelfAttention(causal=False)``
with a padded-source key mask, the decoder self-attention reuses the
KV-cached causal path — so every serving trick (static-shape caches, jitted
scan decode) carries over.

TPU-first decode design: the encoder runs ONCE per sequence and its
per-layer cross-attention K/V are PRECOMPUTED once (``memory_kv``) — a
decode step touches only one token's worth of projections plus two
memory-read einsums, never re-projecting the source.  All shapes static;
``seq2seq_generate`` runs the whole continuation as one jitted
prefill + ``lax.scan``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import math

from neuralnetworklibrary_tpu.nn.transformer import (
    MLP,
    CausalSelfAttention,
)


def t5_relative_bucket(rel, bidirectional: bool, num_buckets: int = 32,
                       max_dist: int = 128):
    """T5 relative-position bucketing (Raffel et al. §2.1): map signed
    relative distances ``rel = key_pos - query_pos`` to bucket ids — half
    the buckets cover small exact distances, the rest log-spaced out to
    ``max_dist`` (everything farther shares the last bucket).
    Bidirectional (encoder) splits the budget between sign directions;
    causal (decoder) buckets only the past and sends the (unattendable
    anyway) future to bucket 0."""
    rel = jnp.asarray(rel, jnp.int32)
    n = num_buckets
    buckets = jnp.zeros_like(rel)
    if bidirectional:
        n //= 2
        buckets = buckets + (rel > 0).astype(jnp.int32) * n
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = n // 2
    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / math.log(max_dist / max_exact)
        * (n - max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, n - 1)
    return buckets + jnp.where(rel < max_exact, rel, large)


class CrossAttention(nn.Module):
    """Decoder→memory attention: queries from the target stream, K/V from
    the (precomputed) encoder memory, padded source positions masked.

    ``memory_kv`` projects the encoder output once — the decode loop reuses
    the result for every step, which is what makes cached seq2seq decode
    O(1) in source length per step (re-projecting would cost 2·S·D² per
    layer per token, ~100× the token's own FLOPs at production shapes)."""

    d_model: int
    n_heads: int
    drop: float = 0.0

    def setup(self):
        D = self.d_model
        self.q_proj = nn.Dense(D, name="q")
        self.kv_proj = nn.Dense(2 * D, name="kv")
        self.out = nn.Dense(D, name="out")
        self.att_drop = nn.Dropout(self.drop)

    def memory_kv(self, memory):
        """(B, S, D) encoder output → ((B, S, H, hd), (B, S, H, hd))."""
        B, S, D = memory.shape
        H, hd = self.n_heads, D // self.n_heads
        k, v = jnp.split(self.kv_proj(memory), 2, axis=-1)
        return k.reshape(B, S, H, hd), v.reshape(B, S, H, hd)

    def __call__(self, x, mk, mv, mem_mask, train: bool = False):
        B, T, D = x.shape
        H, hd = self.n_heads, D // self.n_heads
        q = self.q_proj(x).reshape(B, T, H, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, mk) / math.sqrt(hd)
        att = jnp.where(mem_mask[:, None, None, :], att, -1e30)
        att = jax.nn.softmax(att, axis=-1)
        if train and self.drop > 0.0:
            att = self.att_drop(att, deterministic=False)
        o = jnp.einsum("bhqk,bkhd->bqhd", att, mv).reshape(B, T, D)
        return self.out(o)


def _make_norm(kind: str, eps: float, name: str):
    if kind == "rmsnorm":
        return nn.RMSNorm(epsilon=eps, name=name)
    if kind == "layernorm":
        return nn.LayerNorm(epsilon=eps, name=name)
    raise ValueError(f"norm must be 'layernorm' or 'rmsnorm', got {kind!r}")


class EncoderBlock(nn.Module):
    """Pre-LN bidirectional block over the padded source (key mask keeps
    pad positions unattendable; pad QUERIES produce garbage rows that the
    cross-attention mask makes unreadable downstream).  ``att_bias`` is the
    T5 relative-position bias, shared across layers by the caller."""

    d_model: int
    n_heads: int
    d_ff: int
    drop: float = 0.0
    norm: str = "layernorm"
    norm_eps: float = 1e-6
    mlp_act: Optional[str] = None
    gated_mlp: bool = False
    exact_gelu: bool = False
    flash: bool = False   # r5: bidirectional flash + kv_mask (+ the T5
                          # batch-shared bias) keep the encoder on-kernel

    def setup(self):
        self.ln1 = _make_norm(self.norm, self.norm_eps, "ln1")
        self.attn = CausalSelfAttention(self.d_model, self.n_heads,
                                        self.drop, causal=False,
                                        flash=self.flash, name="attn")
        self.ln2 = _make_norm(self.norm, self.norm_eps, "ln2")
        self.mlp = MLP(self.d_model, self.d_ff, self.drop,
                       gated=self.gated_mlp, act=self.mlp_act,
                       exact_gelu=self.exact_gelu, name="mlp")

    def __call__(self, x, kv_mask, train: bool = False, att_bias=None):
        x = x + self.attn(self.ln1(x), train=train, kv_mask=kv_mask,
                          att_bias=att_bias)
        return x + self.mlp(self.ln2(x), train=train)


class DecoderBlock(nn.Module):
    """Pre-LN decoder block: causal self-attention (KV-cache capable via
    the shared CausalSelfAttention decode path) → cross-attention into the
    encoder memory → MLP.  ``att_bias`` applies to the SELF-attention only
    (T5's cross-attention carries no position bias)."""

    d_model: int
    n_heads: int
    d_ff: int
    drop: float = 0.0
    max_len: int = 0
    kv_quant: bool = False
    norm: str = "layernorm"
    norm_eps: float = 1e-6
    mlp_act: Optional[str] = None
    gated_mlp: bool = False
    exact_gelu: bool = False
    flash: bool = False

    def setup(self):
        self.ln1 = _make_norm(self.norm, self.norm_eps, "ln1")
        self.self_attn = CausalSelfAttention(
            self.d_model, self.n_heads, self.drop, max_len=self.max_len,
            kv_quant=self.kv_quant, flash=self.flash, name="self_attn")
        self.ln2 = _make_norm(self.norm, self.norm_eps, "ln2")
        self.cross = CrossAttention(self.d_model, self.n_heads, self.drop,
                                    name="cross")
        self.ln3 = _make_norm(self.norm, self.norm_eps, "ln3")
        self.mlp = MLP(self.d_model, self.d_ff, self.drop,
                       gated=self.gated_mlp, act=self.mlp_act,
                       exact_gelu=self.exact_gelu, name="mlp")

    def __call__(self, x, mk, mv, mem_mask, train: bool = False,
                 decode: bool = False, offset=None, att_bias=None):
        x = x + self.self_attn(self.ln1(x), train=train, decode=decode,
                               offset=offset, att_bias=att_bias)
        x = x + self.cross(self.ln2(x), mk, mv, mem_mask, train=train)
        return x + self.mlp(self.ln3(x), train=train)


class TransformerSeq2Seq(nn.Module):
    """Encoder–decoder LM with a shared source/target vocabulary and
    tied-embedding decoder head (BART layout).

    Training call: ``model(src, tgt_in)`` → (logits, h); pair with
    ``SeqCrossEntropyLoss`` on the shifted targets (``seq2seq_collate``
    builds (src, tgt_in) / tgt_out with ``pad_token`` masking).  Inference:
    :func:`seq2seq_generate` — encode once, precompute cross K/V, jitted
    cached decode scan.

    Learner contract mirrors TransformerLM: ``head_prefixes`` /
    ``layer_group_prefixes`` give [encoder, decoder, embedding] groups for
    discriminative lrs / freeze().
    """

    vocab_size: int
    pad_token: int = 0
    d_model: int = 256
    n_heads: int = 8
    enc_layers: int = 4
    dec_layers: int = 4
    d_ff: int = 0                  # 0 → 4·d_model
    max_src_len: int = 512
    max_len: int = 512             # target/decode length bound (cache size)
    drop: float = 0.1
    kv_quant: bool = False         # int8 decoder self-attn KV cache
    flash_attention: bool = False  # decoder self-attention takes the
                                   # pallas flash kernel when it applies
                                   # (full-sequence causal scoring at
                                   # T%128==0; T5 relative biases ride the
                                   # kernel's batch-shared bias operand —
                                   # r4).  Encoder/cross stay einsum
                                   # (bidirectional / kv-masked).
    pos_embedding: str = "learned"  # 'learned' (BART) or 'relative' (T5):
                                    # no absolute positions — bucketed
                                    # relative biases on the attention
                                    # logits, ONE (rel_buckets, H) table per
                                    # stack shared by every layer (T5 shares
                                    # layer 0's), none on cross-attention
    rel_buckets: int = 32
    rel_max_dist: int = 128
    norm: str = "layernorm"        # 'layernorm' (BART) or 'rmsnorm' (T5)
    norm_eps: float = 1e-6
    mlp_act: Optional[str] = None  # None → gelu; 'relu' (T5 v1.0);
                                   # with gated_mlp 'gelu' = T5 v1.1/Flan
    gated_mlp: bool = False
    tied_decoder: bool = True      # False → separate (V, D) lm_head
                                   # (Flan-T5 unties)
    logit_scale: float = 1.0       # pre-head hidden scale — tied T5 uses
                                   # d_model**-0.5 (HF multiplies the
                                   # sequence output when embeddings tie)
    audio_frontend: bool = False   # Whisper: ``encode`` takes
                                   # (B, n_mels, frames) float mel features
                                   # through two gelu Conv1Ds (stride 1
                                   # then 2) instead of token ids; the
                                   # encoder attends every position (audio
                                   # is padded to a fixed window upstream,
                                   # there is no pad mask), enc_pos covers
                                   # frames//2 positions.  Requires
                                   # pos_embedding='learned'.
    n_mels: int = 80               # mel-filterbank channels of the frontend
    exact_gelu: bool = False       # erf gelu in the MLPs (HF Whisper/BERT)
                                   # vs the tanh approximation

    @property
    def head_prefixes(self):
        return (("word_embed",) if self.tied_decoder
                else ("word_embed", "lm_head"))

    @property
    def layer_group_prefixes(self):
        enc = tuple(f"enc_block_{i}" for i in range(self.enc_layers)) \
            + ("enc_pos", "enc_rel_bias", "enc_ln", "conv1", "conv2")
        dec = tuple(f"dec_block_{i}" for i in range(self.dec_layers)) \
            + ("dec_pos", "dec_rel_bias", "dec_ln")
        return (enc, dec, self.head_prefixes)

    def setup(self):
        D, ff = self.d_model, self.d_ff or 4 * self.d_model
        if self.pos_embedding not in ("learned", "relative"):
            raise ValueError("pos_embedding must be 'learned' or "
                             f"'relative', got {self.pos_embedding!r}")
        self.word_embed = self.param("word_embed",
                                     nn.initializers.normal(0.02),
                                     (self.vocab_size, D))
        if not self.tied_decoder:
            self.lm_head = self.param("lm_head",
                                      nn.initializers.normal(0.02),
                                      (self.vocab_size, D))
        if self.pos_embedding == "learned":
            self.enc_pos = self.param("enc_pos",
                                      nn.initializers.normal(0.02),
                                      (self.max_src_len, D))
            self.dec_pos = self.param("dec_pos",
                                      nn.initializers.normal(0.02),
                                      (self.max_len, D))
        else:
            self.enc_rel_bias = self.param(
                "enc_rel_bias", nn.initializers.normal(0.02),
                (self.rel_buckets, self.n_heads))
            self.dec_rel_bias = self.param(
                "dec_rel_bias", nn.initializers.normal(0.02),
                (self.rel_buckets, self.n_heads))
        if self.audio_frontend:
            if self.pos_embedding != "learned":
                raise ValueError(
                    "audio_frontend requires pos_embedding='learned'")
            self.conv1 = nn.Conv(D, (3,), padding=[(1, 1)], name="conv1")
            self.conv2 = nn.Conv(D, (3,), strides=(2,), padding=[(1, 1)],
                                 name="conv2")
        blk_kw = dict(norm=self.norm, norm_eps=self.norm_eps,
                      mlp_act=self.mlp_act, gated_mlp=self.gated_mlp,
                      exact_gelu=self.exact_gelu)
        self.enc_blocks = [EncoderBlock(D, self.n_heads, ff, self.drop,
                                        flash=self.flash_attention,
                                        name=f"enc_block_{i}", **blk_kw)
                           for i in range(self.enc_layers)]
        self.enc_ln = _make_norm(self.norm, self.norm_eps, "enc_ln")
        self.dec_blocks = [DecoderBlock(D, self.n_heads, ff, self.drop,
                                        max_len=self.max_len,
                                        kv_quant=self.kv_quant,
                                        flash=self.flash_attention,
                                        name=f"dec_block_{i}", **blk_kw)
                           for i in range(self.dec_layers)]
        self.dec_ln = _make_norm(self.norm, self.norm_eps, "dec_ln")
        self.embed_drop = nn.Dropout(self.drop)

    def _rel_bias(self, table, q_pos, k_pos, bidirectional: bool):
        """Bucketed relative-position bias: q_pos (T,) or (B, T), k_pos
        (M,) → (1|B, H, T, M) added to the attention logits."""
        rel = k_pos[None, :] - q_pos[..., :, None]      # (…, T, M)
        b = t5_relative_bucket(rel, bidirectional, self.rel_buckets,
                               self.rel_max_dist)
        bias = jnp.take(table, b, axis=0)               # (…, T, M, H)
        bias = jnp.moveaxis(bias, -1, -3)               # (…, H, T, M)
        return bias if bias.ndim == 4 else bias[None]

    # --------------------------------------------------------------- encoder

    def encode(self, src, train: bool = False):
        """(B, S) int32 padded source → ((B, S, D) memory, (B, S) bool
        valid-position mask).  With ``audio_frontend``: (B, n_mels, frames)
        float mel features → ((B, frames//2, D) memory, all-True mask) —
        the Whisper encoder (gelu conv stride 1 → gelu conv stride 2 →
        +positions → blocks; every position attendable)."""
        bias = None
        if self.audio_frontend:
            if src.ndim != 3 or src.shape[1] != self.n_mels:
                raise ValueError(
                    f"audio_frontend wants (B, n_mels={self.n_mels}, "
                    f"frames) mel features, got {src.shape}")
            x = jnp.transpose(jnp.asarray(src, jnp.float32), (0, 2, 1))
            x = jax.nn.gelu(self.conv1(x), approximate=False)
            h = jax.nn.gelu(self.conv2(x), approximate=False)
            B, S, _ = h.shape
            if S > self.max_src_len:
                raise ValueError(
                    f"frames//2 = {S} > max_src_len {self.max_src_len} "
                    f"(HF max_source_positions)")
            h = h + self.enc_pos[None, :S]
            mask = jnp.ones((B, S), bool)
        else:
            B, S = src.shape
            if S > self.max_src_len:
                raise ValueError(f"source length {S} > max_src_len "
                                 f"{self.max_src_len}")
            mask = src != self.pad_token
            h = jnp.take(self.word_embed, src, axis=0)
            if self.pos_embedding == "learned":
                h = h + self.enc_pos[None, :S]
            else:
                pos = jnp.arange(S)
                bias = self._rel_bias(self.enc_rel_bias, pos, pos, True)
        if train and self.drop > 0.0:
            h = self.embed_drop(h, deterministic=False)
        for blk in self.enc_blocks:
            h = blk(h, mask, train=train, att_bias=bias)
        return self.enc_ln(h), mask

    def memory_kv(self, memory):
        """Per-decoder-layer cross-attention K/V, projected ONCE."""
        return [blk.cross.memory_kv(memory) for blk in self.dec_blocks]

    # --------------------------------------------------------------- decoder

    def decode_tgt(self, tgt, mem_kv, mem_mask, train: bool = False,
                   decode: bool = False, offset=None):
        """Target stream through the decoder stack against precomputed
        memory K/V.  ``decode=True`` uses the self-attention KV cache at
        ``offset`` (scalar, or (B,) per-row for slot serving) — the
        caller owns the position counter."""
        B, T = tgt.shape
        if T > self.max_len:
            raise ValueError(f"target length {T} > max_len {self.max_len}")
        h = jnp.take(self.word_embed, tgt, axis=0)
        bias = None
        if self.pos_embedding == "learned":
            if decode and offset is not None:
                off = jnp.asarray(offset, jnp.int32)
                if off.ndim == 0:
                    h = h + jax.lax.dynamic_slice_in_dim(
                        self.dec_pos, off, T, axis=0)[None]
                else:
                    h = h + jnp.take(self.dec_pos,
                                     off[:, None] + jnp.arange(T), axis=0)
            else:
                h = h + self.dec_pos[None, :T]
        else:
            # causal relative bias — queries sit at offset+arange(T) against
            # the full (max_len under decode, T otherwise) key strip; the
            # bias depends only on relative distance, so cached decode needs
            # no position state beyond the offset the caller already owns
            if decode and offset is not None:
                off = jnp.asarray(offset, jnp.int32)
                q_pos = (off[..., None] + jnp.arange(T) if off.ndim
                         else off + jnp.arange(T))
                k_pos = jnp.arange(self.max_len)
            else:
                q_pos = k_pos = jnp.arange(T)
            bias = self._rel_bias(self.dec_rel_bias, q_pos, k_pos, False)
        if train and self.drop > 0.0:
            h = self.embed_drop(h, deterministic=False)
        for blk, (mk, mv) in zip(self.dec_blocks, mem_kv):
            h = blk(h, mk, mv, mem_mask, train=train, decode=decode,
                    offset=offset, att_bias=bias)
        h = self.dec_ln(h)
        if self.logit_scale != 1.0:
            h_out = h * self.logit_scale
        else:
            h_out = h
        head = self.word_embed if self.tied_decoder else self.lm_head
        logits = jnp.einsum("btd,vd->btv", h_out, head)
        return logits, h

    def __call__(self, src, tgt, train: bool = False):
        memory, mem_mask = self.encode(src, train=train)
        mem_kv = self.memory_kv(memory)
        return self.decode_tgt(tgt, mem_kv, mem_mask, train=train)


def seq2seq_param_rule(mesh, axis: str = "model"):
    """Learner ``param_sharding`` rule for :class:`TransformerSeq2Seq` —
    :func:`nn.transformer.transformer_param_rule`'s Megatron layout
    extended to the encoder–decoder: the shared leaf names (qkv / fc_in /
    fc_gate column-parallel, attention-out / fc_out row-parallel) apply
    unchanged to the encoder and decoder blocks, and the cross-attention's
    ``q`` and fused 2·D ``kv`` projections go column-parallel (their head
    reshape follows the same output-feature split; the cross ``out`` is
    already row-parallel by name).  Embeddings, relative-bias tables,
    norms and biases replicate."""
    from jax.sharding import PartitionSpec as P

    from neuralnetworklibrary_tpu.nn.transformer import (
        transformer_param_rule)

    base = transformer_param_rule(mesh, axis)

    def rule(path, leaf):
        parts = [str(p).strip("[].'\"") for p in path]
        if (getattr(leaf, "ndim", 0) == 2 and "kernel" in parts
                and "cross" in parts and ("q" in parts or "kv" in parts)):
            return P(None, axis)
        return base(path, leaf)

    return rule


def init_seq2seq_cache(model: TransformerSeq2Seq, bs: int):
    """Allocate the decoder self-attention KV cache (static
    (B, max_len, H, hd) per decoder layer; int8 + scales under
    ``kv_quant``)."""
    D, H = model.d_model, model.n_heads
    dummy_kv = [(jnp.zeros((bs, 1, H, D // H)),) * 2
                for _ in range(model.dec_layers)]
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((bs, 1), jnp.int32), dummy_kv,
            jnp.ones((bs, 1), bool), decode=True, offset=0,
            method=TransformerSeq2Seq.decode_tgt))
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype),
                                  variables["cache"])


def seq2seq_generate(model: TransformerSeq2Seq, params, src, n: int,
                     bos: int, k: int = 1, temperature: float = 1.0,
                     seed: int = 0):
    """Cached encoder–decoder continuation: ONE encoder pass + ONE cross-K/V
    projection, then a jitted prefill + ``lax.scan`` emits ``n`` target
    tokens (top-k sampled; k=1 greedy).  Returns (B, n) int32.

    Mirrors :func:`nn.transformer.generate`'s decode discipline — static
    shapes, no recompilation across calls of the same (B, S, n).
    """
    src = jnp.asarray(src)
    if src.ndim == 2:                      # token sources; audio features
        src = src.astype(jnp.int32)        # (B, n_mels, frames) pass as-is
    B = src.shape[0]
    if n + 1 > model.max_len:
        raise ValueError(f"n + bos ({n + 1}) exceeds max_len "
                         f"{model.max_len}")

    def sample(key, logits):
        logits = logits / jnp.maximum(temperature, 1e-6)
        vals, idxs = jax.lax.top_k(logits, k)
        choice = jax.random.categorical(key, vals)
        return jnp.take_along_axis(idxs, choice[..., None], -1)[..., 0]

    @jax.jit
    def run(params, cache, src, key):
        memory, mem_mask = model.apply(
            {"params": params}, src, method=TransformerSeq2Seq.encode)
        mem_kv = model.apply({"params": params}, memory,
                             method=TransformerSeq2Seq.memory_kv)
        start = jnp.full((B, 1), bos, jnp.int32)
        (out, _), mut = model.apply(
            {"params": params, "cache": cache}, start, mem_kv, mem_mask,
            decode=True, offset=0, mutable=["cache"],
            method=TransformerSeq2Seq.decode_tgt)

        def step(carry, inp):
            cache, last, off = carry
            key = inp
            tok = sample(key, last)
            (out, _), mut = model.apply(
                {"params": params, "cache": cache}, tok[:, None], mem_kv,
                mem_mask, decode=True, offset=off, mutable=["cache"],
                method=TransformerSeq2Seq.decode_tgt)
            return (mut["cache"], out[:, -1], off + 1), tok

        (_, _, _), toks = jax.lax.scan(
            step, (mut["cache"], out[:, -1], jnp.asarray(1, jnp.int32)),
            jax.random.split(key, n))
        return toks.T

    cache = init_seq2seq_cache(model, B)
    return run(params, cache, src, jax.random.PRNGKey(seed))


def seq2seq_collate(pairs, pad: int, bos: int, eos: int,
                    max_src: Optional[int] = None,
                    max_tgt: Optional[int] = None):
    """Batch (source_ids, target_ids) pairs into the Learner's
    ((src, tgt_in), tgt_out) layout: right-padded source, teacher-forced
    target shifted by one ([bos] + tgt vs tgt + [eos]), pad everywhere
    else.  Pair with ``SeqCrossEntropyLoss`` — pad target positions carry
    ``pad`` and should be excluded by loss masks built from
    ``tgt_out != pad`` at the call site (see tests for the pattern).
    Returns (src, tgt_in, tgt_out) int32 arrays.
    """
    import numpy as np

    S = max_src or max(len(s) for s, _ in pairs)
    T = max_tgt + 1 if max_tgt else max(len(t) for _, t in pairs) + 1
    src = np.full((len(pairs), S), pad, np.int32)
    tin = np.full((len(pairs), T), pad, np.int32)
    tout = np.full((len(pairs), T), pad, np.int32)
    for i, (s, t) in enumerate(pairs):
        s, t = list(s)[:S], list(t)[:T - 1]
        src[i, :len(s)] = s
        tin[i, 0], tin[i, 1:len(t) + 1] = bos, t
        tout[i, :len(t)], tout[i, len(t)] = t, eos
    return src, tin, tout


class Seq2SeqCrossEntropyLoss:
    """Token-masked sequence CE for the encoder–decoder: pad TARGET
    positions (tgt_out == pad) carry no loss, composing with the Learner's
    per-row short-batch mask.  (The stock SeqCrossEntropyLoss row-masks
    only — LM windows have no pad tokens; teacher-forced targets do.)"""

    def __init__(self, pad: int):
        self.pad = pad

    def __call__(self, outputs, target, mask=None):
        logits = outputs[0] if isinstance(outputs, tuple) else outputs
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            logp, target[..., None].astype(jnp.int32), axis=-1)[..., 0]
        w = (target != self.pad).astype(nll.dtype)
        if mask is not None:
            w = w * mask[:, None].astype(nll.dtype)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def seq2seq_beam_search(model: TransformerSeq2Seq, params, src, n: int,
                        bos: int, beam: int = 4):
    """Exact KV-cached beam search over the encoder–decoder (the
    :func:`nn.transformer.beam_search` discipline: joint (parent beam ×
    vocab) top-k per step, per-step cache reordering, parent backtracking).
    The encoder memory and cross K/V are computed once and beam-tiled.

    Returns (tokens (B, n) int32 — the best beam — and its total log-prob
    (B,) float32).  beam=1 reduces exactly to greedy
    :func:`seq2seq_generate`.
    """
    src = jnp.asarray(src)
    if src.ndim == 2:                      # token sources; audio features
        src = src.astype(jnp.int32)        # (B, n_mels, frames) pass as-is
    B = src.shape[0]
    V = model.vocab_size
    if n + 1 > model.max_len:
        raise ValueError(f"n + bos ({n + 1}) exceeds max_len "
                         f"{model.max_len}")

    @jax.jit
    def run(params, cache, src):
        memory, mem_mask = model.apply(
            {"params": params}, src, method=TransformerSeq2Seq.encode)
        mem_kv = model.apply({"params": params}, memory,
                             method=TransformerSeq2Seq.memory_kv)
        start = jnp.full((B, 1), bos, jnp.int32)
        (out, _), mut = model.apply(
            {"params": params, "cache": cache}, start, mem_kv, mem_mask,
            decode=True, offset=0, mutable=["cache"],
            method=TransformerSeq2Seq.decode_tgt)
        last_lp = jax.nn.log_softmax(out[:, -1].astype(jnp.float32), -1)

        def tile(x):
            return (jnp.repeat(x, beam, axis=0)
                    if getattr(x, "ndim", 0) >= 1 and x.shape[0] == B
                    else x)

        cache = jax.tree_util.tree_map(tile, mut["cache"])
        mem_kv = jax.tree_util.tree_map(tile, mem_kv)
        mem_mask = tile(mem_mask)
        init_scores = jnp.broadcast_to(
            jnp.where(jnp.arange(beam) == 0, 0.0, -jnp.inf), (B, beam))
        init_lp = jnp.repeat(last_lp[:, None], beam, axis=1)

        def step(carry, off):
            cache, scores, lp = carry
            total = scores[:, :, None] + lp
            top, idx = jax.lax.top_k(total.reshape(B, beam * V), beam)
            parent = idx // V
            tok = (idx % V).astype(jnp.int32)

            def reorder(x):
                if getattr(x, "ndim", 0) >= 1 and x.shape[0] == B * beam:
                    xb = x.reshape(B, beam, *x.shape[1:])
                    pb = parent.reshape(
                        B, beam, *([1] * (x.ndim - 1))).astype(jnp.int32)
                    return jnp.take_along_axis(
                        xb, jnp.broadcast_to(pb, (B, beam) + x.shape[1:]),
                        axis=1).reshape(x.shape)
                return x

            cache = jax.tree_util.tree_map(reorder, cache)
            (out, _), mut = model.apply(
                {"params": params, "cache": cache},
                tok.reshape(B * beam, 1), mem_kv, mem_mask, decode=True,
                offset=off, mutable=["cache"],
                method=TransformerSeq2Seq.decode_tgt)
            lp = jax.nn.log_softmax(
                out[:, -1].astype(jnp.float32), -1).reshape(B, beam, V)
            return (mut["cache"], top, lp), (tok, parent)

        (_, scores, _), (toks, parents) = jax.lax.scan(
            step, (cache, init_scores, init_lp),
            jnp.arange(1, n + 1, dtype=jnp.int32))

        def backtrack(carry, inp):
            b = carry
            tok, parent = inp
            t = jnp.take_along_axis(tok, b[:, None], 1)[:, 0]
            b = jnp.take_along_axis(parent, b[:, None], 1)[:, 0]
            return b, t

        best = jnp.argmax(scores, axis=-1)
        _, rev = jax.lax.scan(backtrack, best, (toks, parents),
                              reverse=True)
        return rev.T, jnp.max(scores, axis=-1)

    cache = init_seq2seq_cache(model, B)
    return run(params, cache, src)
