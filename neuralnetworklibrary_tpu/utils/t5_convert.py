"""Convert HuggingFace T5 / Flan-T5 weights into
:class:`nn.seq2seq.TransformerSeq2Seq`.

T5 is the seq2seq family's pretrained-checkpoint path (what
``utils.gpt2_convert`` / ``utils.llama_convert`` are to the decoder-only
family).  The T5 block maps onto the existing encoder–decoder with three
architecture switches and one numerical surgery:

- ``norm="rmsnorm"`` — T5LayerNorm is RMSNorm (no mean subtraction, no
  bias), eps from ``layer_norm_epsilon`` (1e-6).
- ``pos_embedding="relative"`` — no absolute positions; bucketed relative
  biases on the self-attention logits, one table per stack (HF stores it
  on block 0 and shares it with every layer — exactly this module's
  layout), none on cross-attention.
- ``mlp_act`` / ``gated_mlp`` — T5 v1.0 is a plain relu MLP (wi/wo);
  v1.1 and Flan-T5 are GEGLU (``gated_mlp=True, mlp_act="gelu"``:
  gelu(wi_0) ⊙ wi_1 → wo).
- **Unscaled attention**: T5 does NOT divide attention logits by
  ``sqrt(head_dim)`` (the scale is folded into the initializer).  This
  framework's attention always scales, so every q kernel (self AND cross)
  is multiplied by ``sqrt(head_dim)`` at conversion — algebraically exact:
  ``(q·√hd)ᵀk / √hd = qᵀk``.

Orientation: HF ``nn.Linear`` stores (out, in); flax Dense kernels are
(in, out) → transpose everything.  q/k/v fuse into the framework's
column-blocked qkv Dense; the cross-attention k/v fuse into its 2D ``kv``
Dense.  T5 has no biases anywhere — zeros load exactly.  Tied checkpoints
(t5-small/base/...) set ``logit_scale = d_model**-0.5`` (HF multiplies the
sequence output by it when embeddings tie); Flan-T5 unties
(``tied_decoder=False`` + ``lm_head``).

Requires ``num_heads · d_kv == d_model`` (true for every released T5/Flan
size); checkpoints violating it are rejected rather than silently wrong.

Activation + greedy-generation parity vs the HF torch implementation is
pinned (random-init, environment-safe) in tests/test_t5_parity.py.
"""

from __future__ import annotations

import math

import numpy as np


def _t(x):
    import torch

    if isinstance(x, torch.Tensor):
        return np.asarray(x.detach().cpu().float().numpy(), np.float32)
    return np.asarray(x, np.float32)


def _zeros(n):
    return np.zeros(n, np.float32)


def _mlp(sd, p):
    """DenseReluDense → MLP params; detects the gated (v1.1/Flan) layout."""
    if p + "wi_0.weight" in sd:                       # GEGLU
        wi0 = _t(sd[p + "wi_0.weight"]).T             # (D, F) gelu side
        wi1 = _t(sd[p + "wi_1.weight"]).T             # (D, F) linear side
        wo = _t(sd[p + "wo.weight"]).T                # (F, D)
        return {
            "fc_in": {"kernel": wi0, "bias": _zeros(wi0.shape[1])},
            "fc_gate": {"kernel": wi1, "bias": _zeros(wi1.shape[1])},
            "fc_out": {"kernel": wo, "bias": _zeros(wo.shape[1])},
        }
    wi = _t(sd[p + "wi.weight"]).T
    wo = _t(sd[p + "wo.weight"]).T
    return {
        "fc_in": {"kernel": wi, "bias": _zeros(wi.shape[1])},
        "fc_out": {"kernel": wo, "bias": _zeros(wo.shape[1])},
    }


def _self_attn(sd, p, hd):
    """SelfAttention q/k/v/o → fused-qkv CausalSelfAttention params, with
    the q kernel pre-multiplied by sqrt(hd) to cancel this framework's
    logit scaling (T5 attends unscaled)."""
    q = _t(sd[p + "q.weight"]).T * math.sqrt(hd)      # (D, H·hd)
    k = _t(sd[p + "k.weight"]).T
    v = _t(sd[p + "v.weight"]).T
    o = _t(sd[p + "o.weight"]).T                      # (H·hd, D)
    qkv = np.concatenate([q, k, v], axis=1)
    return {
        "qkv": {"kernel": qkv, "bias": _zeros(qkv.shape[1])},
        "out": {"kernel": o, "bias": _zeros(o.shape[1])},
    }


def _cross_attn(sd, p, hd):
    """EncDecAttention q/k/v/o → CrossAttention params (fused 2D kv
    Dense); q scaled by sqrt(hd) like the self-attention."""
    q = _t(sd[p + "q.weight"]).T * math.sqrt(hd)
    k = _t(sd[p + "k.weight"]).T
    v = _t(sd[p + "v.weight"]).T
    o = _t(sd[p + "o.weight"]).T
    kv = np.concatenate([k, v], axis=1)               # (D, 2D)
    return {
        "q": {"kernel": q, "bias": _zeros(q.shape[1])},
        "kv": {"kernel": kv, "bias": _zeros(kv.shape[1])},
        "out": {"kernel": o, "bias": _zeros(o.shape[1])},
    }


def convert_t5_state_dict(state_dict, enc_layers: int, dec_layers: int,
                          n_heads: int) -> dict:
    """HF T5ForConditionalGeneration state_dict → TransformerSeq2Seq
    params.  Returns params whose presence of ``lm_head`` says whether the
    checkpoint unties (build the model with ``tied_decoder`` accordingly —
    :func:`load_t5` does this)."""
    sd = {k: v for k, v in dict(state_dict).items()
          if not k.startswith(("encoder.embed_tokens",
                               "decoder.embed_tokens"))}
    embed = _t(sd["shared.weight"])
    d_model = embed.shape[1]
    inner = _t(sd["encoder.block.0.layer.0.SelfAttention.q.weight"]).shape[0]
    if inner != d_model:
        raise ValueError(
            f"num_heads*d_kv = {inner} != d_model = {d_model}: this "
            "checkpoint's inner attention width is unsupported")
    hd = d_model // n_heads
    head = _t(sd["lm_head.weight"]) if "lm_head.weight" in sd else None
    if head is not None and np.array_equal(head, embed):
        head = None                                   # torch-aliased tie
    params: dict = {
        "word_embed": embed,
        "enc_ln": {"scale": _t(sd["encoder.final_layer_norm.weight"])},
        "dec_ln": {"scale": _t(sd["decoder.final_layer_norm.weight"])},
        "enc_rel_bias": _t(sd["encoder.block.0.layer.0.SelfAttention."
                              "relative_attention_bias.weight"]),
        "dec_rel_bias": _t(sd["decoder.block.0.layer.0.SelfAttention."
                              "relative_attention_bias.weight"]),
    }
    if head is not None:
        params["lm_head"] = head
    for i in range(enc_layers):
        p = f"encoder.block.{i}."
        params[f"enc_block_{i}"] = {
            "ln1": {"scale": _t(sd[p + "layer.0.layer_norm.weight"])},
            "attn": _self_attn(sd, p + "layer.0.SelfAttention.", hd),
            "ln2": {"scale": _t(sd[p + "layer.1.layer_norm.weight"])},
            "mlp": _mlp(sd, p + "layer.1.DenseReluDense."),
        }
    for i in range(dec_layers):
        p = f"decoder.block.{i}."
        params[f"dec_block_{i}"] = {
            "ln1": {"scale": _t(sd[p + "layer.0.layer_norm.weight"])},
            "self_attn": _self_attn(sd, p + "layer.0.SelfAttention.", hd),
            "ln2": {"scale": _t(sd[p + "layer.1.layer_norm.weight"])},
            "cross": _cross_attn(sd, p + "layer.1.EncDecAttention.", hd),
            "ln3": {"scale": _t(sd[p + "layer.2.layer_norm.weight"])},
            "mlp": _mlp(sd, p + "layer.2.DenseReluDense."),
        }
    return params


def load_t5(state_dict, enc_layers: int, dec_layers: int, n_heads: int,
            d_model: int, vocab_size: int, d_ff: int = 0,
            max_src_len: int = 512, max_len: int = 512,
            norm_eps: float = 1e-6, rel_buckets: int = 32,
            rel_max_dist: int = 128, drop: float = 0.0, **model_kw):
    """Build the matching TransformerSeq2Seq and its converted params.

    Returns (model, params).  The MLP flavor (relu vs GEGLU) and the
    tied/untied head are detected from the state_dict; ``rel_buckets`` /
    ``rel_max_dist`` / ``norm_eps`` mirror the HF config fields
    relative_attention_num_buckets / relative_attention_max_distance /
    layer_norm_epsilon.  Extra kwargs (kv_quant=, ...) flow to the model.
    """
    from neuralnetworklibrary_tpu.nn.seq2seq import TransformerSeq2Seq

    params = convert_t5_state_dict(state_dict, enc_layers, dec_layers,
                                   n_heads)
    gated = "fc_gate" in params["enc_block_0"]["mlp"]
    tied = "lm_head" not in params
    model = TransformerSeq2Seq(
        vocab_size=vocab_size, pad_token=0, d_model=d_model,
        n_heads=n_heads, enc_layers=enc_layers, dec_layers=dec_layers,
        d_ff=d_ff, max_src_len=max_src_len, max_len=max_len, drop=drop,
        pos_embedding="relative", rel_buckets=rel_buckets,
        rel_max_dist=rel_max_dist, norm="rmsnorm", norm_eps=norm_eps,
        mlp_act="gelu" if gated else "relu", gated_mlp=gated,
        tied_decoder=tied,
        logit_scale=d_model ** -0.5 if tied else 1.0, **model_kw)
    return model, params


def load_t5_dir(path: str, max_src_len: int = 512, max_len: int = 512,
                **model_kw):
    """Load a T5/Flan-T5 HF snapshot DIRECTORY (config.json +
    .safetensors) → (model, params) — no torch, no transformers (weights
    via ``utils.safetensors_io``)."""
    import json
    import os

    from neuralnetworklibrary_tpu.utils.safetensors_io import (
        load_safetensors_auto)

    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    sd = load_safetensors_auto(path)
    return load_t5(
        sd,
        enc_layers=cfg["num_layers"],
        dec_layers=cfg.get("num_decoder_layers", cfg["num_layers"]),
        n_heads=cfg["num_heads"],
        d_model=cfg["d_model"],
        d_ff=cfg.get("d_ff", 0) or 0,
        vocab_size=cfg["vocab_size"],
        norm_eps=float(cfg.get("layer_norm_epsilon", 1e-6)),
        rel_buckets=int(cfg.get("relative_attention_num_buckets", 32)),
        rel_max_dist=int(cfg.get("relative_attention_max_distance", 128)),
        max_src_len=max_src_len, max_len=max_len, **model_kw)
