"""BERT-family bidirectional encoder: masked-LM pretraining + [CLS]
classification, HF-checkpoint compatible.

The reference's only text transfer-learning story is the AWD-LSTM ULMFiT
pipeline (Applications/Text.py); this adds the encoder-side counterpart —
the same pretrain→fine-tune contract, but with a bidirectional transformer
that loads standard ``bert-base``-layout checkpoints
(:mod:`~neuralnetworklibrary_tpu.utils.bert_convert`, activation-parity
pinned against ``transformers`` in tests/test_bert.py).

Architecture (post-LN, matching HF ``BertModel`` exactly in eval mode):
token + learned-position + segment embeddings → embedding LayerNorm →
n_layers post-LN blocks (fused-qkv self-attention with a padded-token key
mask, exact-GELU MLP) → (sequence_output, tanh pooler over [CLS]).
The attention core is the shared
:class:`~neuralnetworklibrary_tpu.nn.transformer.CausalSelfAttention`
(``causal=False`` + ``kv_mask``), so TPU execution rides the same fused
einsum path as the rest of the framework.

Training-mode dropout placement differs benignly from HF (we drop attention
probabilities and MLP outputs; HF additionally drops the attention output
projection) — eval-mode numerics, the parity contract, are identical.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from neuralnetworklibrary_tpu.nn.transformer import (
    MLP,
    CausalSelfAttention,
)


class BertBlock(nn.Module):
    """Post-LN encoder block: LN(x + attn(x)) → LN(h + mlp(h))."""

    d_model: int
    n_heads: int
    d_ff: int
    drop: float = 0.0
    eps: float = 1e-12
    flash: bool = False   # non-causal flash kernel with the key-pad mask

    def setup(self):
        self.attn = CausalSelfAttention(self.d_model, self.n_heads,
                                        self.drop, causal=False,
                                        flash=self.flash,
                                        name="attn")
        self.ln1 = nn.LayerNorm(epsilon=self.eps, name="ln1")
        self.mlp = MLP(self.d_model, self.d_ff, self.drop,
                       exact_gelu=True, name="mlp")
        self.ln2 = nn.LayerNorm(epsilon=self.eps, name="ln2")

    def __call__(self, x, kv_mask, train: bool = False):
        x = self.ln1(x + self.attn(x, train=train, kv_mask=kv_mask))
        return self.ln2(x + self.mlp(x, train=train))


class BertModel(nn.Module):
    """Encoder backbone → (sequence_output (B, T, D), pooled (B, D)).

    ``token_type_ids`` selects the segment embedding (sentence-pair tasks);
    pad positions (``input_ids == pad_token``) are masked as attention KEYS
    everywhere — pad rows of the output exist but carry no influence on
    valid rows.
    """

    vocab_size: int
    pad_token: int = 0
    d_model: int = 256
    n_heads: int = 8
    n_layers: int = 4
    d_ff: int = 0                   # 0 → 4·d_model
    max_len: int = 512
    type_vocab: int = 2
    drop: float = 0.1
    eps: float = 1e-12
    flash_attention: bool = False   # r5: bidirectional flash + kv_mask —
                                    # the encoder rides the pallas kernel

    def setup(self):
        D, ff = self.d_model, self.d_ff or 4 * self.d_model
        init = nn.initializers.normal(0.02)
        self.word_embed = self.param("word_embed", init,
                                     (self.vocab_size, D))
        self.pos_embed = self.param("pos_embed", init, (self.max_len, D))
        self.type_embed = self.param("type_embed", init,
                                     (self.type_vocab, D))
        self.emb_ln = nn.LayerNorm(epsilon=self.eps, name="emb_ln")
        self.blocks = [BertBlock(D, self.n_heads, ff, self.drop, self.eps,
                                 flash=self.flash_attention,
                                 name=f"block_{i}")
                       for i in range(self.n_layers)]
        self.pooler = nn.Dense(D, name="pooler")
        self.embed_drop = nn.Dropout(self.drop)

    def __call__(self, input_ids, token_type_ids=None, train: bool = False):
        B, T = input_ids.shape
        if T > self.max_len:
            raise ValueError(f"sequence length {T} > max_len {self.max_len}")
        mask = input_ids != self.pad_token
        h = (jnp.take(self.word_embed, input_ids, axis=0)
             + self.pos_embed[None, :T])
        tt = (jnp.zeros_like(input_ids) if token_type_ids is None
              else token_type_ids)
        h = h + jnp.take(self.type_embed, tt, axis=0)
        h = self.emb_ln(h)
        if train and self.drop > 0.0:
            h = self.embed_drop(h, deterministic=False)
        for blk in self.blocks:
            h = blk(h, mask, train=train)
        pooled = jnp.tanh(self.pooler(h[:, 0]))
        return h, pooled


class BertMLM(nn.Module):
    """Masked-LM head over the backbone (HF ``BertForMaskedLM`` layout):
    transform Dense + GELU + LN, then the TIED word-embedding decoder plus
    a per-vocab bias.  Returns (logits (B, T, V), h)."""

    config: Any = None              # BertModel kwargs

    @property
    def head_prefixes(self):
        return ("mlm_transform", "mlm_ln", "mlm_bias")

    @property
    def layer_group_prefixes(self):
        n = self.config["n_layers"]
        backbone = tuple(f"bert/block_{i}" for i in range(n)) \
            + ("bert/pos_embed", "bert/type_embed", "bert/emb_ln",
               "bert/pooler")
        return (backbone, ("bert/word_embed",), self.head_prefixes)

    def setup(self):
        cfg = dict(self.config)
        self.bert = BertModel(**cfg, name="bert")
        D = self.bert.d_model
        self.mlm_transform = nn.Dense(D, name="mlm_transform")
        self.mlm_ln = nn.LayerNorm(epsilon=self.bert.eps, name="mlm_ln")
        self.mlm_bias = self.param("mlm_bias", nn.initializers.zeros,
                                   (self.bert.vocab_size,))

    def __call__(self, input_ids, token_type_ids=None, train: bool = False):
        h, _ = self.bert(input_ids, token_type_ids, train=train)
        t = self.mlm_ln(jax.nn.gelu(self.mlm_transform(h),
                                    approximate=False))
        logits = (jnp.einsum("btd,vd->btv", t, self.bert.word_embed)
                  + self.mlm_bias)
        return logits, h


class BertClassifier(nn.Module):
    """[CLS]-pooled classifier (HF ``BertForSequenceClassification``
    layout) — the fine-tune stage; graft a pretrained backbone by copying
    its ``bert`` subtree."""

    num_classes: int
    config: Any = None

    @property
    def head_prefixes(self):
        return ("clf",)

    @property
    def layer_group_prefixes(self):
        n = self.config["n_layers"]
        backbone = tuple(f"bert/block_{i}" for i in range(n)) \
            + ("bert/pos_embed", "bert/type_embed", "bert/emb_ln",
               "bert/pooler")
        return (backbone, ("bert/word_embed",), self.head_prefixes)

    def setup(self):
        self.bert = BertModel(**dict(self.config), name="bert")
        self.clf = nn.Dense(self.num_classes, name="clf")
        self.head_drop = nn.Dropout(self.bert.drop)

    def __call__(self, input_ids, token_type_ids=None, train: bool = False):
        _, pooled = self.bert(input_ids, token_type_ids, train=train)
        if train and self.bert.drop > 0.0:
            pooled = self.head_drop(pooled, deterministic=False)
        return self.clf(pooled), pooled


def mlm_mask(rng, ids, vocab_size: int, mask_token: int, p: float = 0.15,
             special_tokens: int = 0):
    """BERT masking (Devlin et al.): select ``p`` of the (non-special)
    positions; 80% → [MASK], 10% → random token, 10% → unchanged.  Returns
    (masked_ids, targets) where unselected targets are −1 (ignored by
    :class:`MLMLoss`).  Host-side numpy — runs in the loader's fetch
    threads like the vision augments."""
    import numpy as np

    r = np.random.default_rng(rng) if not hasattr(rng, "random") else rng
    ids = np.asarray(ids)
    sel = (r.random(ids.shape) < p) & (ids >= special_tokens)
    roll = r.random(ids.shape)
    masked = ids.copy()
    masked[sel & (roll < 0.8)] = mask_token
    rnd = sel & (roll >= 0.8) & (roll < 0.9)
    masked[rnd] = r.integers(special_tokens, vocab_size, int(rnd.sum()))
    targets = np.where(sel, ids, -1).astype(np.int64)
    return masked, targets


class MLMLoss:
    """CE over the selected (target ≥ 0) positions only, composing with the
    Learner's per-row short-batch mask."""

    def __call__(self, outputs, target, mask=None):
        logits = outputs[0] if isinstance(outputs, tuple) else outputs
        logp = jax.nn.log_softmax(logits, axis=-1)
        safe = jnp.maximum(target, 0)
        nll = -jnp.take_along_axis(
            logp, safe[..., None].astype(jnp.int32), axis=-1)[..., 0]
        w = (target >= 0).astype(nll.dtype)
        if mask is not None:
            w = w * mask[:, None].astype(nll.dtype)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


class MLMAccuracy:
    """Prediction accuracy over the selected positions."""

    def __call__(self, preds, target, mask=None):
        preds = preds[0] if isinstance(preds, tuple) else preds
        hit = (jnp.argmax(preds, -1) == jnp.maximum(target, 0)) \
            .astype(jnp.float32)
        w = (target >= 0).astype(jnp.float32)
        if mask is not None:
            w = w * mask[:, None].astype(jnp.float32)
        return jnp.sum(hit * w) / jnp.maximum(jnp.sum(w), 1.0)
