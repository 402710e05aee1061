"""Convert HuggingFace Llama-family weights into
:class:`nn.transformer.TransformerLM`.

The Llama block is exactly this framework's "modern" transformer
configuration — pre-RMSNorm blocks, rotary position embeddings in the
split-half (rotate_half) convention, grouped-query attention, SwiGLU MLP,
untied lm_head — so conversion is renaming plus two mechanical surgeries:

- HF ``nn.Linear`` stores weights (out_features, in_features); flax Dense
  kernels are (in, out) → every kernel is transposed.
- HF keeps q/k/v as separate projections; this framework fuses them into
  one column-blocked [q | k | v] Dense → the transposed kernels concatenate
  along the OUTPUT axis (widths H·hd | Hkv·hd | Hkv·hd, matching
  CausalSelfAttention's split).

Llama projections carry no biases; flax Dense biases are loaded as zeros
(numerically exact).  Checkpoints that DO ship attention biases (Qwen2's
q/k/v biases) load them.  Works for Llama 1/2/3-style checkpoints
(Mistral's dense path shares the layout; Qwen2 differs only in the
biases): set ``rope_base`` to the checkpoint's ``rope_theta`` (Llama-3
uses 500000) and ``n_kv_heads`` to ``num_key_value_heads``.  Mixtral's
sparse-MoE layers load via :func:`load_mixtral`; ``load_llama_dir``
dispatches on config.json's model_type and picks up Mistral/Qwen2 sliding
windows.

Usage (weights from any source — HF hub snapshot on disk, a .bin/.pt,
safetensors loaded to a dict):

    sd = torch.load("pytorch_model.bin", map_location="cpu")
    model, params = load_llama(sd, n_layers=32, n_heads=32, n_kv_heads=8,
                               d_model=4096, d_ff=14336, vocab_size=128256,
                               max_len=8192, rope_base=500000.0)

Activation + greedy-generation parity vs the HF torch implementation is
pinned (random-init, environment-safe) in tests/test_llama_parity.py.
"""

from __future__ import annotations

import numpy as np


def _t(x):
    import torch

    if isinstance(x, torch.Tensor):
        return np.asarray(x.detach().cpu().float().numpy(), np.float32)
    return np.asarray(x, np.float32)


def convert_llama_state_dict(state_dict, n_layers: int) -> dict:
    """HF LlamaForCausalLM (or LlamaModel) state_dict → TransformerLM params.

    Returns params for ``TransformerLM(..., tied_decoder=False)`` — or, when
    the checkpoint has no ``lm_head.weight`` (``tie_word_embeddings=True``,
    e.g. TinyLlama variants), for the default tied decoder.
    """
    sd = dict(state_dict)
    if any(k.startswith("model.") for k in sd):
        head = (_t(sd["lm_head.weight"]) if "lm_head.weight" in sd
                else None)
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}
    else:                     # bare LlamaModel
        head = None
    if head is not None and np.array_equal(head, _t(sd["embed_tokens.weight"])):
        # tie_word_embeddings=True: torch state_dicts alias lm_head to the
        # embedding (safetensors exports usually omit it instead) — either
        # way it's the tied decoder
        head = None
    params: dict = {
        "word_embed": _t(sd["embed_tokens.weight"]),
        "ln_f": {"scale": _t(sd["norm.weight"])},
    }
    if head is not None:
        params["lm_head"] = head
    def _b(key, width):
        # biases load when the checkpoint has them (Qwen2-style q/k/v
        # biases), zeros otherwise (Llama/Mistral are bias-free) — both
        # numerically exact
        return _t(sd[key]) if key in sd else np.zeros(width, np.float32)

    for i in range(n_layers):
        p = f"layers.{i}."
        q = _t(sd[p + "self_attn.q_proj.weight"]).T     # (D, H·hd)
        k = _t(sd[p + "self_attn.k_proj.weight"]).T     # (D, Hkv·hd)
        v = _t(sd[p + "self_attn.v_proj.weight"]).T     # (D, Hkv·hd)
        qkv = np.concatenate([q, k, v], axis=1)
        qkv_b = np.concatenate([
            _b(p + "self_attn.q_proj.bias", q.shape[1]),
            _b(p + "self_attn.k_proj.bias", k.shape[1]),
            _b(p + "self_attn.v_proj.bias", v.shape[1])])
        o = _t(sd[p + "self_attn.o_proj.weight"]).T     # (H·hd, D)
        gate = _t(sd[p + "mlp.gate_proj.weight"]).T     # (D, F)
        up = _t(sd[p + "mlp.up_proj.weight"]).T         # (D, F)
        down = _t(sd[p + "mlp.down_proj.weight"]).T     # (F, D)
        attn = {
            "qkv": {"kernel": qkv, "bias": qkv_b},
            "out": {"kernel": o,
                    "bias": _b(p + "self_attn.o_proj.bias", o.shape[1])},
        }
        if p + "self_attn.q_norm.weight" in sd:
            # Qwen3 per-head q/k RMSNorms → TransformerLM(qk_norm=True)
            attn["q_norm"] = {"scale": _t(sd[p + "self_attn.q_norm.weight"])}
            attn["k_norm"] = {"scale": _t(sd[p + "self_attn.k_norm.weight"])}
        params[f"block_{i}"] = {
            "ln1": {"scale": _t(sd[p + "input_layernorm.weight"])},
            "ln2": {"scale": _t(sd[p + "post_attention_layernorm.weight"])},
            "attn": attn,
            "mlp": {
                # MLP(gated=True): silu(fc_in) ⊙ fc_gate → fc_out, i.e.
                # fc_in ↔ HF gate_proj (the silu side), fc_gate ↔ up_proj
                "fc_in": {"kernel": gate,
                          "bias": np.zeros(gate.shape[1], np.float32)},
                "fc_gate": {"kernel": up,
                            "bias": np.zeros(up.shape[1], np.float32)},
                "fc_out": {"kernel": down,
                           "bias": np.zeros(down.shape[1], np.float32)},
            },
        }
    return params


def load_llama(state_dict, n_layers: int, n_heads: int, d_model: int,
               vocab_size: int, n_kv_heads: int = 0, d_ff: int = 0,
               max_len: int = 4096, rope_base: float = 10000.0,
               norm_eps: float = 1e-5, drop: float = 0.0, **model_kw):
    """Build the matching TransformerLM and its converted params.

    Returns (model, params).  ``n_kv_heads``/``d_ff``/``rope_base``/
    ``norm_eps`` mirror the HF config fields num_key_value_heads /
    intermediate_size / rope_theta / rms_norm_eps.  Pass mesh/param-rule
    kwargs through ``model_kw`` (e.g. mesh=, flash_attention=True,
    remat=True); shard with Learner/param rules as usual.
    """
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    params = convert_llama_state_dict(state_dict, n_layers)
    model = TransformerLM(
        vocab_size=vocab_size, pad_token=0, d_model=d_model,
        n_heads=n_heads, n_kv_heads=n_kv_heads, n_layers=n_layers,
        d_ff=d_ff, max_len=max_len, drop=drop, pos_embedding="rope",
        rope_base=rope_base, mlp="swiglu", norm="rmsnorm",
        norm_eps=norm_eps, tied_decoder="lm_head" not in params, **model_kw)
    return model, params


def load_qwen3(state_dict, n_layers: int, n_heads: int, d_model: int,
               vocab_size: int, head_dim: int, n_kv_heads: int = 0,
               d_ff: int = 0, max_len: int = 4096,
               rope_base: float = 1000000.0, norm_eps: float = 1e-6,
               drop: float = 0.0, **model_kw):
    """HF Qwen3ForCausalLM → TransformerLM.  Qwen3 = the Llama block with
    (a) per-head RMSNorms on q and k before RoPE (``qk_norm=True``; the
    HF q_norm/k_norm leaves land beside the fused qkv) and (b) a fixed
    ``head_dim`` decoupled from hidden_size (the HF config field of the
    same name).  No attention biases.  Returns (model, params)."""
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    params = convert_llama_state_dict(state_dict, n_layers)
    model = TransformerLM(
        vocab_size=vocab_size, pad_token=0, d_model=d_model,
        n_heads=n_heads, n_kv_heads=n_kv_heads, n_layers=n_layers,
        d_ff=d_ff, max_len=max_len, drop=drop, pos_embedding="rope",
        rope_base=rope_base, mlp="swiglu", norm="rmsnorm",
        norm_eps=norm_eps, head_dim=head_dim, qk_norm=True,
        tied_decoder="lm_head" not in params, **model_kw)
    return model, params


def load_gemma(state_dict, n_layers: int, n_heads: int, d_model: int,
               vocab_size: int, head_dim: int, n_kv_heads: int = 0,
               d_ff: int = 0, max_len: int = 4096,
               rope_base: float = 10000.0, norm_eps: float = 1e-6,
               drop: float = 0.0, **model_kw):
    """HF GemmaForCausalLM → TransformerLM.  Gemma vs Llama:

    - input embeddings scaled by sqrt(hidden_size)
      (``embed_scale=d_model**0.5``; the tied logits stay unscaled),
    - RMSNorm weights stored ZERO-centered — HF computes x̂·(1+w), so
      every norm scale is folded to ``1 + w`` at conversion (exact),
    - GEGLU feed-forward (``mlp="geglu"``: tanh-approx gelu on the gate
      side — every released Gemma checkpoint uses gelu_pytorch_tanh),
    - ``head_dim`` decoupled from hidden_size (256 at every size; 7B has
      16 heads × 256 on a 3072 stream), tied decoder, theta 10000.

    Returns (model, params)."""
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    params = convert_llama_state_dict(state_dict, n_layers)
    for blk in params.values():
        if isinstance(blk, dict):
            for name in ("ln1", "ln2"):
                if name in blk:
                    blk[name]["scale"] = blk[name]["scale"] + 1.0
    params["ln_f"]["scale"] = params["ln_f"]["scale"] + 1.0
    model = TransformerLM(
        vocab_size=vocab_size, pad_token=0, d_model=d_model,
        n_heads=n_heads, n_kv_heads=n_kv_heads, n_layers=n_layers,
        d_ff=d_ff, max_len=max_len, drop=drop, pos_embedding="rope",
        rope_base=rope_base, mlp="geglu", norm="rmsnorm",
        norm_eps=norm_eps, head_dim=head_dim,
        embed_scale=float(d_model) ** 0.5,
        tied_decoder="lm_head" not in params, **model_kw)
    return model, params


def load_gemma2(state_dict, n_layers: int, n_heads: int, d_model: int,
                vocab_size: int, head_dim: int = 256, n_kv_heads: int = 0,
                d_ff: int = 0, max_len: int = 4096,
                rope_base: float = 10000.0, norm_eps: float = 1e-6,
                query_pre_attn_scalar: float = 256.0,
                attn_softcap: float = 50.0, logit_softcap: float = 30.0,
                sliding_window: int = 4096, layer_types=None,
                drop: float = 0.0, **model_kw):
    """HF Gemma2ForCausalLM → TransformerLM.  Gemma2 on top of Gemma:

    - SANDWICH norms (``post_norm=True``): each sublayer output is
      RMS-normalized again before its residual add — HF's
      post_attention_layernorm is attention's POST-norm (→ ln1_post) and
      the MLP gets pre/post_feedforward_layernorm (→ ln2 / ln2_post),
    - tanh soft-capping of the attention logits (attn_logit_softcapping=50
      → ``attn_softcap``) and the final lm logits
      (final_logit_softcapping=30 → ``logit_softcap``),
    - alternating local/global attention: config.layer_types marks every
      other layer "sliding_attention" (window 4096) → ``window_pattern``,
    - attention scaled by 1/sqrt(query_pre_attn_scalar) instead of
      1/sqrt(head_dim) (→ ``att_scale``; 27B uses 4608/32=144 with hd 128).

    All RMSNorm weights are zero-centered like Gemma (folded to 1 + w).
    ``layer_types`` defaults to the HF alternation (even layers sliding).
    Returns (model, params)."""
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    params = convert_llama_state_dict(state_dict, n_layers)
    sd = dict(state_dict)
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}
    for i in range(n_layers):
        blk = params[f"block_{i}"]
        p = f"layers.{i}."
        blk["ln1"] = {"scale":
                      _t(sd[p + "input_layernorm.weight"]) + 1.0}
        blk["ln1_post"] = {"scale":
                           _t(sd[p + "post_attention_layernorm.weight"])
                           + 1.0}
        blk["ln2"] = {"scale":
                      _t(sd[p + "pre_feedforward_layernorm.weight"]) + 1.0}
        blk["ln2_post"] = {"scale":
                           _t(sd[p + "post_feedforward_layernorm.weight"])
                           + 1.0}
    params["ln_f"]["scale"] = params["ln_f"]["scale"] + 1.0
    if layer_types is None:
        layer_types = ["sliding_attention" if (i + 1) % 2 else
                       "full_attention" for i in range(n_layers)]
    wp = tuple(int(sliding_window) if t == "sliding_attention" else 0
               for t in layer_types)
    model = TransformerLM(
        vocab_size=vocab_size, pad_token=0, d_model=d_model,
        n_heads=n_heads, n_kv_heads=n_kv_heads, n_layers=n_layers,
        d_ff=d_ff, max_len=max_len, drop=drop, pos_embedding="rope",
        rope_base=rope_base, mlp="geglu", norm="rmsnorm",
        norm_eps=norm_eps, head_dim=head_dim,
        embed_scale=float(d_model) ** 0.5, post_norm=True,
        att_scale=float(query_pre_attn_scalar),
        attn_softcap=float(attn_softcap or 0.0),
        logit_softcap=float(logit_softcap or 0.0),
        window_pattern=wp,
        tied_decoder="lm_head" not in params, **model_kw)
    return model, params


def load_phi3(state_dict, n_layers: int, n_heads: int, d_model: int,
              vocab_size: int, n_kv_heads: int = 0, d_ff: int = 0,
              max_len: int = 4096, rope_base: float = 10000.0,
              norm_eps: float = 1e-5, window: int = 0,
              drop: float = 0.0, **model_kw):
    """HF Phi3ForCausalLM → TransformerLM.  Phi-3 is the Llama block with
    the q/k/v and gate/up projections ALREADY fused in the checkpoint
    (modeling_phi3.py: qkv_proj is [q | k | v] in this framework's own
    column order; gate_up_proj is [gate (silu side) | up]), bias-free,
    untied lm_head; the mini-4k variants carry a sliding_window (2047)
    applied to every layer.  longrope 128k variants load via
    load_llama_dir, which normalizes the config's rope_scaling into the
    static tuple TransformerLM carries (rope_scaling= flows through
    **model_kw); a partial_rotary_factor flows through as rotary_dim=.
    Returns (model, params)."""
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    sd = dict(state_dict)
    head = _t(sd["lm_head.weight"]) if "lm_head.weight" in sd else None
    sd = {k[len("model."):]: v for k, v in sd.items()
          if k.startswith("model.")}
    if head is not None and np.array_equal(head,
                                           _t(sd["embed_tokens.weight"])):
        head = None
    params: dict = {
        "word_embed": _t(sd["embed_tokens.weight"]),
        "ln_f": {"scale": _t(sd["norm.weight"])},
    }
    if head is not None:
        params["lm_head"] = head
    for i in range(n_layers):
        p = f"layers.{i}."
        qkv = _t(sd[p + "self_attn.qkv_proj.weight"]).T   # (D, (H+2Hkv)·hd)
        o = _t(sd[p + "self_attn.o_proj.weight"]).T
        gu = _t(sd[p + "mlp.gate_up_proj.weight"]).T      # (D, 2F)
        gate, up = np.split(gu, 2, axis=1)
        down = _t(sd[p + "mlp.down_proj.weight"]).T
        params[f"block_{i}"] = {
            "ln1": {"scale": _t(sd[p + "input_layernorm.weight"])},
            "ln2": {"scale": _t(sd[p + "post_attention_layernorm.weight"])},
            "attn": {
                "qkv": {"kernel": qkv,
                        "bias": np.zeros(qkv.shape[1], np.float32)},
                "out": {"kernel": o,
                        "bias": np.zeros(o.shape[1], np.float32)},
            },
            "mlp": {
                "fc_in": {"kernel": gate,
                          "bias": np.zeros(gate.shape[1], np.float32)},
                "fc_gate": {"kernel": up,
                            "bias": np.zeros(up.shape[1], np.float32)},
                "fc_out": {"kernel": down,
                           "bias": np.zeros(down.shape[1], np.float32)},
            },
        }
    model = TransformerLM(
        vocab_size=vocab_size, pad_token=0, d_model=d_model,
        n_heads=n_heads, n_kv_heads=n_kv_heads, n_layers=n_layers,
        d_ff=d_ff, max_len=max_len, drop=drop, pos_embedding="rope",
        rope_base=rope_base, mlp="swiglu", norm="rmsnorm",
        norm_eps=norm_eps, window=window,
        tied_decoder="lm_head" not in params, **model_kw)
    return model, params


def load_phi2(state_dict, n_layers: int, n_heads: int, d_model: int,
              vocab_size: int, n_kv_heads: int = 0, d_ff: int = 0,
              max_len: int = 2048,
              rope_base: float = 10000.0, rotary_dim: int = 0,
              norm_eps: float = 1e-5, drop: float = 0.0, **model_kw):
    """HF PhiForCausalLM (Phi-1/Phi-2) → TransformerLM.  The Phi block
    (modeling_phi.PhiDecoderLayer) is a PARALLEL residual: attention and
    the gelu MLP both read the same input_layernorm output and one
    residual add sums both (``parallel_block=True``; no ln2); all
    projections carry biases, norms are LayerNorm (weight+bias), the
    untied lm_head has a bias, and rope is PARTIAL — only the first
    ``rotary_dim = int(hd · partial_rotary_factor)`` head features rotate
    (Phi-2: 0.4 · 80 = 32).  hidden_act gelu_new == this MLP's default
    tanh-approx gelu.  Returns (model, params)."""
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    sd = dict(state_dict)
    head = _t(sd["lm_head.weight"])
    head_b = _t(sd["lm_head.bias"])
    sd = {k[len("model."):]: v for k, v in sd.items()
          if k.startswith("model.")}
    params: dict = {
        "word_embed": _t(sd["embed_tokens.weight"]),
        "ln_f": {"scale": _t(sd["final_layernorm.weight"]),
                 "bias": _t(sd["final_layernorm.bias"])},
        "lm_head": head,
        "lm_head_bias": head_b,
    }
    for i in range(n_layers):
        p = f"layers.{i}."
        q = _t(sd[p + "self_attn.q_proj.weight"]).T
        k = _t(sd[p + "self_attn.k_proj.weight"]).T
        v = _t(sd[p + "self_attn.v_proj.weight"]).T
        qkv = np.concatenate([q, k, v], axis=1)
        qkv_b = np.concatenate([_t(sd[p + "self_attn.q_proj.bias"]),
                                _t(sd[p + "self_attn.k_proj.bias"]),
                                _t(sd[p + "self_attn.v_proj.bias"])])
        o = _t(sd[p + "self_attn.dense.weight"]).T
        params[f"block_{i}"] = {
            "ln1": {"scale": _t(sd[p + "input_layernorm.weight"]),
                    "bias": _t(sd[p + "input_layernorm.bias"])},
            "attn": {
                "qkv": {"kernel": qkv, "bias": qkv_b},
                "out": {"kernel": o,
                        "bias": _t(sd[p + "self_attn.dense.bias"])},
            },
            "mlp": {
                "fc_in": {"kernel": _t(sd[p + "mlp.fc1.weight"]).T,
                          "bias": _t(sd[p + "mlp.fc1.bias"])},
                "fc_out": {"kernel": _t(sd[p + "mlp.fc2.weight"]).T,
                           "bias": _t(sd[p + "mlp.fc2.bias"])},
            },
        }
    model = TransformerLM(
        vocab_size=vocab_size, pad_token=0, d_model=d_model,
        n_heads=n_heads, n_kv_heads=n_kv_heads, n_layers=n_layers,
        d_ff=d_ff, max_len=max_len,
        drop=drop, pos_embedding="rope", rope_base=rope_base,
        rotary_dim=rotary_dim, norm="layernorm", norm_eps=norm_eps,
        parallel_block=True, tied_decoder=False, head_bias=True,
        **model_kw)
    return model, params


def convert_mixtral_state_dict(state_dict, n_layers: int,
                               n_experts: int) -> dict:
    """HF MixtralForCausalLM state_dict → TransformerLM params.

    Mixtral = the Llama block with the dense SwiGLU MLP replaced by a
    top-2 sparse MoE in EVERY layer (``moe_every=1``): a bias-free (D, E)
    router plus per-expert w1 (silu side) / w3 (up) / w2 (down).  The
    per-expert (F, D)/(D, F) torch matrices transpose and stack into this
    framework's (E, D, F)/(E, F, D) leaves; biases load as zeros (Mixtral
    has none).  Use with ``TransformerLM(..., n_experts=E, moe_every=1,
    mlp="swiglu", moe_eval_dense=True)`` — the dense-eval path reproduces
    HF's dropless inference exactly (tests/test_llama_parity.py).
    """
    sd = dict(state_dict)
    head = _t(sd["lm_head.weight"]) if "lm_head.weight" in sd else None
    sd = {k[len("model."):]: v for k, v in sd.items()
          if k.startswith("model.")}
    if head is not None and np.array_equal(head,
                                           _t(sd["embed_tokens.weight"])):
        head = None
    params: dict = {
        "word_embed": _t(sd["embed_tokens.weight"]),
        "ln_f": {"scale": _t(sd["norm.weight"])},
    }
    if head is not None:
        params["lm_head"] = head
    for i in range(n_layers):
        p = f"layers.{i}."
        q = _t(sd[p + "self_attn.q_proj.weight"]).T
        k = _t(sd[p + "self_attn.k_proj.weight"]).T
        v = _t(sd[p + "self_attn.v_proj.weight"]).T
        qkv = np.concatenate([q, k, v], axis=1)
        o = _t(sd[p + "self_attn.o_proj.weight"]).T
        m = p + "block_sparse_moe."
        gate = _t(sd[m + "gate.weight"]).T                  # (D, E)
        w1 = np.stack([_t(sd[f"{m}experts.{e}.w1.weight"]).T
                       for e in range(n_experts)])          # (E, D, F)
        w3 = np.stack([_t(sd[f"{m}experts.{e}.w3.weight"]).T
                       for e in range(n_experts)])          # (E, D, F)
        w2 = np.stack([_t(sd[f"{m}experts.{e}.w2.weight"]).T
                       for e in range(n_experts)])          # (E, F, D)
        E, D, F = w1.shape
        params[f"block_{i}"] = {
            "ln1": {"scale": _t(sd[p + "input_layernorm.weight"])},
            "ln2": {"scale": _t(sd[p + "post_attention_layernorm.weight"])},
            "attn": {
                "qkv": {"kernel": qkv,
                        "bias": np.zeros(qkv.shape[1], np.float32)},
                "out": {"kernel": o,
                        "bias": np.zeros(o.shape[1], np.float32)},
            },
            "moe": {
                "gate": gate,
                "w1": w1, "b1": np.zeros((E, F), np.float32),
                "w2": w2, "b2": np.zeros((E, D), np.float32),
                "w3": w3, "b3": np.zeros((E, F), np.float32),
            },
        }
    return params


def load_mixtral(state_dict, n_layers: int, n_heads: int, d_model: int,
                 vocab_size: int, n_experts: int = 8, moe_top_k: int = 2,
                 n_kv_heads: int = 0, d_ff: int = 0, max_len: int = 4096,
                 rope_base: float = 10000.0, norm_eps: float = 1e-5,
                 window: int = 0, drop: float = 0.0, **model_kw):
    """Build the matching MoE TransformerLM and its converted params.

    Returns (model, params).  The model is configured with
    ``moe_eval_dense=True`` so eval/decode reproduce HF's dropless
    inference exactly; training on top of the loaded weights uses the
    GShard capacity path (set ``capacity_factor`` via ``model_kw``).
    """
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    params = convert_mixtral_state_dict(state_dict, n_layers, n_experts)
    model = TransformerLM(
        vocab_size=vocab_size, pad_token=0, d_model=d_model,
        n_heads=n_heads, n_kv_heads=n_kv_heads, n_layers=n_layers,
        d_ff=d_ff, max_len=max_len, drop=drop, pos_embedding="rope",
        rope_base=rope_base, mlp="swiglu", norm="rmsnorm",
        norm_eps=norm_eps, n_experts=n_experts, moe_every=1,
        moe_top_k=moe_top_k, moe_eval_dense=True, window=window,
        tied_decoder="lm_head" not in params, **model_kw)
    return model, params


def load_gpt_oss(state_dict, n_layers: int, n_heads: int, d_model: int,
                 vocab_size: int, n_experts: int = 32, moe_top_k: int = 4,
                 head_dim: int = 64, n_kv_heads: int = 0, d_ff: int = 0,
                 max_len: int = 4096, rope_base: float = 150000.0,
                 norm_eps: float = 1e-5, sliding_window: int = 128,
                 layer_types=None, drop: float = 0.0, **model_kw):
    """HF GptOssForCausalLM → TransformerLM.  GPT-OSS vs the Llama block:

    - learned per-head attention SINKS (modeling_gpt_oss.py:257-258: a
      (H,) logit joins every softmax row, its mass discarded →
      ``sinks=True``),
    - alternating sliding/full attention via config.layer_types
      (window 128 → ``window_pattern``), attention q/k/v/o biases,
    - a top-4 MoE in EVERY layer: router WITH bias
      (``moe_gate_bias=True``), weights = softmax over the selected
      logits (the eval_dense top_k>2 path), experts with INTERLEAVED
      [gate|up] columns (gate_up_proj[..., ::2] / [..., 1::2] —
      de-interleaved here into w1/w3) and the clamped GLU
      gate·σ(1.702·gate)·(up+1) (``moe_act="gptoss"``), all biased.

    The HF expert tensors are (E, D, 2F)/(E, F, D) parameters already in
    (in, out) orientation — no transpose.  YaRN rope_scaling (the 131k
    context extension) is supported: load_llama_dir normalizes the
    config's rope_scaling into the static tuple and passes it through
    **model_kw (rope_scaling_tuple; parity pinned in
    tests/test_llama_parity.py).  Checkpoints
    shipping MXFP4-quantized expert blocks must be dequantized to float
    state_dicts first.  Returns (model, params)."""
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    sd = dict(state_dict)
    head = _t(sd["lm_head.weight"]) if "lm_head.weight" in sd else None
    sd = {k[len("model."):]: v for k, v in sd.items()
          if k.startswith("model.")}
    if head is not None and np.array_equal(head,
                                           _t(sd["embed_tokens.weight"])):
        head = None
    params: dict = {
        "word_embed": _t(sd["embed_tokens.weight"]),
        "ln_f": {"scale": _t(sd["norm.weight"])},
    }
    if head is not None:
        params["lm_head"] = head

    def _b(key, width):
        return _t(sd[key]) if key in sd else np.zeros(width, np.float32)

    for i in range(n_layers):
        p = f"layers.{i}."
        q = _t(sd[p + "self_attn.q_proj.weight"]).T
        k = _t(sd[p + "self_attn.k_proj.weight"]).T
        v = _t(sd[p + "self_attn.v_proj.weight"]).T
        qkv = np.concatenate([q, k, v], axis=1)
        qkv_b = np.concatenate([
            _b(p + "self_attn.q_proj.bias", q.shape[1]),
            _b(p + "self_attn.k_proj.bias", k.shape[1]),
            _b(p + "self_attn.v_proj.bias", v.shape[1])])
        o = _t(sd[p + "self_attn.o_proj.weight"]).T
        gu = _t(sd[p + "mlp.experts.gate_up_proj"])       # (E, D, 2F)
        gub = _t(sd[p + "mlp.experts.gate_up_proj_bias"])  # (E, 2F)
        w2 = _t(sd[p + "mlp.experts.down_proj"])          # (E, F, D)
        b2 = _t(sd[p + "mlp.experts.down_proj_bias"])     # (E, D)
        params[f"block_{i}"] = {
            "ln1": {"scale": _t(sd[p + "input_layernorm.weight"])},
            "ln2": {"scale": _t(sd[p + "post_attention_layernorm.weight"])},
            "attn": {
                "qkv": {"kernel": qkv, "bias": qkv_b},
                "out": {"kernel": o,
                        "bias": _b(p + "self_attn.o_proj.bias",
                                   o.shape[1])},
                "sink": _t(sd[p + "self_attn.sinks"]),
            },
            "moe": {
                "gate": _t(sd[p + "mlp.router.weight"]).T,   # (D, E)
                "gate_b": _t(sd[p + "mlp.router.bias"]),
                "w1": np.ascontiguousarray(gu[..., 0::2]),   # gate side
                "b1": np.ascontiguousarray(gub[..., 0::2]),
                "w3": np.ascontiguousarray(gu[..., 1::2]),   # up side
                "b3": np.ascontiguousarray(gub[..., 1::2]),
                "w2": w2, "b2": b2,
            },
        }
    if layer_types is None:
        layer_types = ["sliding_attention" if i % 2 == 0 else
                       "full_attention" for i in range(n_layers)]
    wp = tuple(int(sliding_window) if t == "sliding_attention" else 0
               for t in layer_types)
    model = TransformerLM(
        vocab_size=vocab_size, pad_token=0, d_model=d_model,
        n_heads=n_heads, n_kv_heads=n_kv_heads, n_layers=n_layers,
        d_ff=d_ff, max_len=max_len, drop=drop, pos_embedding="rope",
        rope_base=rope_base, mlp="swiglu", norm="rmsnorm",
        norm_eps=norm_eps, head_dim=head_dim, sinks=True,
        window_pattern=wp, n_experts=n_experts, moe_every=1,
        moe_top_k=moe_top_k, moe_eval_dense=True, moe_act="gptoss",
        moe_gate_bias=True,
        tied_decoder="lm_head" not in params, **model_kw)
    return model, params


def load_llama_dir(path: str, max_len: int = 0, **model_kw):
    """Load a Llama-family HF snapshot DIRECTORY (config.json +
    .safetensors, single-file or index-sharded) → (model, params).

    Reads the architecture hyperparameters from ``config.json``
    (hidden_size / num_attention_heads / num_key_value_heads /
    num_hidden_layers / intermediate_size / vocab_size / rope_theta /
    rms_norm_eps) and the weights via
    :func:`utils.safetensors_io.load_safetensors_auto` — no torch, no
    transformers.  ``max_len`` defaults to the checkpoint's
    ``max_position_embeddings`` (pass a smaller value to bound the KV
    cache); remaining kwargs (mesh=, flash_attention=, kv_quant=, ...)
    flow to TransformerLM.
    """
    import json
    import os

    from neuralnetworklibrary_tpu.utils.safetensors_io import (
        load_safetensors_auto)

    from neuralnetworklibrary_tpu.nn.transformer import rope_scaling_tuple

    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    prf = float(cfg.get("partial_rotary_factor", 1.0))
    if prf != 1.0:
        # Phi-2/GPT-NeoX-style partial rotation: only the first
        # int(hd·factor) head features rotate (rope rotary_dim=)
        hd_ = cfg.get("head_dim") or (cfg["hidden_size"]
                                      // cfg["num_attention_heads"])
        model_kw.setdefault("rotary_dim", int(hd_ * prf))
    sd = load_safetensors_auto(path)
    common = dict(
        n_layers=cfg["num_hidden_layers"],
        n_heads=cfg["num_attention_heads"],
        n_kv_heads=cfg.get("num_key_value_heads", 0) or 0,
        d_model=cfg["hidden_size"],
        d_ff=cfg.get("intermediate_size", 0) or 0,
        vocab_size=cfg["vocab_size"],
        max_len=max_len or cfg.get("max_position_embeddings", 4096),
        rope_base=float(cfg.get("rope_theta", 10000.0)),
        norm_eps=float(cfg.get("rms_norm_eps", 1e-5)))
    if cfg.get("rope_scaling"):
        # YaRN (GPT-OSS, Qwen long-context), llama3 (Llama-3.1+), linear,
        # and longrope (Phi-3 128k) all normalize into the static tuple the
        # attention modules carry.  The attention factor uses the CONFIG's
        # max_position_embeddings (HF semantics) even when the caller
        # bounds max_len to shrink the KV cache.
        hd = cfg.get("head_dim") or common["d_model"] // common["n_heads"]
        model_kw["rope_scaling"] = rope_scaling_tuple(
            cfg["rope_scaling"], hd, common["rope_base"],
            int(cfg.get("max_position_embeddings", common["max_len"])),
            original_max=int(
                cfg.get("original_max_position_embeddings", 0)))
    # Mistral-style local attention: both HF and this framework let query t
    # attend keys (t − W, t], so the config value passes straight through.
    # Qwen2/Qwen3 configs CARRY a sliding_window value but gate it behind
    # use_sliding_window (False on every released checkpoint) — respect it.
    window = int(cfg.get("sliding_window") or 0)
    if cfg.get("use_sliding_window") is False:
        window = 0
    mt = cfg.get("model_type")
    if mt == "mixtral":
        return load_mixtral(
            sd, n_experts=cfg.get("num_local_experts", 8),
            moe_top_k=cfg.get("num_experts_per_tok", 2),
            window=window, **common, **model_kw)
    if mt == "gemma2":
        # Gemma2's sliding_window rides window_pattern (per-layer
        # alternation from config.layer_types), NOT the global window=
        common["norm_eps"] = float(cfg.get("rms_norm_eps", 1e-6))
        return load_gemma2(
            sd, head_dim=cfg.get("head_dim", 256),
            query_pre_attn_scalar=float(
                cfg.get("query_pre_attn_scalar", 256)),
            attn_softcap=float(cfg.get("attn_logit_softcapping") or 0.0),
            logit_softcap=float(cfg.get("final_logit_softcapping") or 0.0),
            sliding_window=int(cfg.get("sliding_window") or 0),
            layer_types=cfg.get("layer_types"), **common, **model_kw)
    if mt == "gpt_oss":
        return load_gpt_oss(
            sd, n_experts=cfg.get("num_local_experts", 32),
            moe_top_k=cfg.get("num_experts_per_tok", 4),
            head_dim=cfg.get("head_dim", 64),
            sliding_window=int(cfg.get("sliding_window") or 0),
            layer_types=cfg.get("layer_types"), **common, **model_kw)
    if mt == "phi3":
        return load_phi3(sd, window=window, **common, **model_kw)
    if mt == "phi":
        # Phi-1/Phi-2: parallel residual + LayerNorm + partial rotary;
        # the prf block above put rotary_dim into model_kw
        common["norm_eps"] = float(cfg.get("layer_norm_eps", 1e-5))
        return load_phi2(sd, rotary_dim=model_kw.pop("rotary_dim", 0),
                         **common, **model_kw)
    if window:
        model_kw.setdefault("window", window)
    if mt == "qwen3":
        common["rope_base"] = float(cfg.get("rope_theta", 1000000.0))
        common["norm_eps"] = float(cfg.get("rms_norm_eps", 1e-6))
        return load_qwen3(
            sd, head_dim=cfg.get(
                "head_dim", common["d_model"] // common["n_heads"]),
            **common, **model_kw)
    if mt == "gemma":
        common["norm_eps"] = float(cfg.get("rms_norm_eps", 1e-6))
        return load_gemma(
            sd, head_dim=cfg.get(
                "head_dim", common["d_model"] // common["n_heads"]),
            **common, **model_kw)
    return load_llama(sd, **common, **model_kw)
