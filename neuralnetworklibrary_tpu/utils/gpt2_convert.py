"""Convert HuggingFace GPT-2 weights into :class:`nn.transformer.TransformerLM`.

GPT-2's architecture is exactly this framework's default transformer
configuration — pre-LN blocks (x + attn(ln1 x), x + mlp(ln2 x)), fused
[q|k|v] attention projection, learned positional embeddings, gelu_new
(= jax.nn.gelu's tanh approximation), final LayerNorm, tied wte decoder —
so conversion is a pure renaming with no numerical surgery.  HF's Conv1D
stores weights (in_features, out_features), the same orientation as a flax
Dense kernel: no transposes anywhere.

Usage (weights from any source — HF hub snapshot on disk, a .bin/.pt file):

    import torch
    sd = torch.load("pytorch_model.bin", map_location="cpu")
    model, params = load_gpt2(sd, n_layers=12, n_heads=12, d_model=768,
                              vocab_size=50257, max_len=1024)

Activation parity vs the HF torch implementation is pinned (random-init,
environment-safe) in tests/test_gpt2_parity.py.
"""

from __future__ import annotations

import numpy as np


def _t(x):
    import torch

    if isinstance(x, torch.Tensor):
        return np.asarray(x.detach().cpu().numpy(), np.float32)
    return np.asarray(x, np.float32)


def convert_gpt2_state_dict(state_dict, n_layers: int) -> dict:
    """HF GPT2LMHeadModel (or GPT2Model) state_dict → TransformerLM params."""
    sd = dict(state_dict)
    # GPT2LMHeadModel prefixes the body with 'transformer.'
    if any(k.startswith("transformer.") for k in sd):
        sd = {k[len("transformer."):]: v for k, v in sd.items()
              if k.startswith("transformer.")}
    params: dict = {
        "word_embed": _t(sd["wte.weight"]),
        "pos_embed": _t(sd["wpe.weight"]),
        "ln_f": {"scale": _t(sd["ln_f.weight"]), "bias": _t(sd["ln_f.bias"])},
    }
    for i in range(n_layers):
        p = f"h.{i}."
        params[f"block_{i}"] = {
            "ln1": {"scale": _t(sd[p + "ln_1.weight"]),
                    "bias": _t(sd[p + "ln_1.bias"])},
            "ln2": {"scale": _t(sd[p + "ln_2.weight"]),
                    "bias": _t(sd[p + "ln_2.bias"])},
            "attn": {
                "qkv": {"kernel": _t(sd[p + "attn.c_attn.weight"]),
                        "bias": _t(sd[p + "attn.c_attn.bias"])},
                "out": {"kernel": _t(sd[p + "attn.c_proj.weight"]),
                        "bias": _t(sd[p + "attn.c_proj.bias"])},
            },
            "mlp": {
                "fc_in": {"kernel": _t(sd[p + "mlp.c_fc.weight"]),
                          "bias": _t(sd[p + "mlp.c_fc.bias"])},
                "fc_out": {"kernel": _t(sd[p + "mlp.c_proj.weight"]),
                           "bias": _t(sd[p + "mlp.c_proj.bias"])},
            },
        }
    return params


def load_gpt2(state_dict, n_layers: int, n_heads: int, d_model: int,
              vocab_size: int, max_len: int = 1024, drop: float = 0.0,
              **model_kw):
    """Build the matching TransformerLM and its converted params.

    Returns (model, params).  Pass mesh/param-rule kwargs through
    ``model_kw`` (e.g. mesh=, flash_attention=True) — the converted params
    are plain numpy; shard with Learner/param rules as usual.
    """
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    model = TransformerLM(vocab_size=vocab_size, pad_token=0,
                          d_model=d_model, n_heads=n_heads,
                          n_layers=n_layers, max_len=max_len, drop=drop,
                          norm_eps=1e-5, **model_kw)
    return model, convert_gpt2_state_dict(state_dict, n_layers)
