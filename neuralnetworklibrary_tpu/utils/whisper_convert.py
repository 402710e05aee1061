"""Convert HuggingFace Whisper weights onto :class:`nn.seq2seq.
TransformerSeq2Seq` with the audio conv frontend — speech-to-text joins the
framework's seq2seq family.

Mechanics mirror :mod:`utils.llama_convert` / :mod:`utils.t5_convert`: HF
``nn.Linear`` stores (out, in) → flax kernels transpose; separate q/k/v
concatenate along the OUTPUT axis into the fused ``qkv`` (order q | k | v —
Whisper's ``k_proj`` carries NO bias, so its fused third is zero); cross
``k_proj``/``v_proj`` fuse into the ``kv`` Dense the same way.  The conv
frontend maps torch Conv1d (out, in, k) → flax Conv (k, in, out), and both
position tables load verbatim (the encoder's sinusoids ARE a weight in the
HF state dict).  Numerics knobs: erf gelu everywhere
(``exact_gelu=True`` — HF 'gelu' is exact), LayerNorm eps 1e-5, tied
``proj_out`` (decoder logits = embed_tokens).

Activation + greedy-generation parity vs the torch implementation
(random-init, no downloads) is pinned in tests/test_whisper_parity.py:
encoder memory, teacher-forced logits, and the cached
:func:`~nn.seq2seq.seq2seq_generate` continuation token-for-token against
an HF greedy loop.

Reference: beyond parity — the reference has no audio modality at all.
"""

from __future__ import annotations

import numpy as np


def _t(x):
    import torch

    if isinstance(x, torch.Tensor):
        return np.asarray(x.detach().cpu().float().numpy(), np.float32)
    return np.asarray(x, np.float32)


def _dense(sd, prefix, width: int = 0):
    w = _t(sd[f"{prefix}.weight"]).T
    b = (_t(sd[f"{prefix}.bias"]) if f"{prefix}.bias" in sd
         else np.zeros(width or w.shape[1], np.float32))
    return {"kernel": w, "bias": b}


def _ln(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"])}


def _attn_qkv(sd, prefix):
    """q/k/v/out projections → fused CausalSelfAttention params (k has no
    bias in Whisper — zero third of the fused bias)."""
    qs = [_dense(sd, f"{prefix}.{n}_proj") for n in ("q", "k", "v")]
    return {
        "qkv": {"kernel": np.concatenate([d["kernel"] for d in qs], axis=1),
                "bias": np.concatenate([d["bias"] for d in qs])},
        "out": _dense(sd, f"{prefix}.out_proj"),
    }


def _cross(sd, prefix):
    k = _dense(sd, f"{prefix}.k_proj")
    v = _dense(sd, f"{prefix}.v_proj")
    return {
        "q": _dense(sd, f"{prefix}.q_proj"),
        "kv": {"kernel": np.concatenate([k["kernel"], v["kernel"]], axis=1),
               "bias": np.concatenate([k["bias"], v["bias"]])},
        "out": _dense(sd, f"{prefix}.out_proj"),
    }


def convert_whisper_state_dict(state_dict, enc_layers: int,
                               dec_layers: int) -> dict:
    """HF WhisperForConditionalGeneration / WhisperModel state_dict →
    TransformerSeq2Seq params (``model.`` prefix stripped when present)."""
    sd = state_dict
    if not any(k.startswith("encoder.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}

    def conv(prefix):
        # torch Conv1d (out, in, k) → flax Conv kernel (k, in, out)
        return {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 1, 0),
                "bias": _t(sd[f"{prefix}.bias"])}

    params = {
        "word_embed": _t(sd["decoder.embed_tokens.weight"]),
        "enc_pos": _t(sd["encoder.embed_positions.weight"]),
        "dec_pos": _t(sd["decoder.embed_positions.weight"]),
        "conv1": conv("encoder.conv1"),
        "conv2": conv("encoder.conv2"),
        "enc_ln": _ln(sd, "encoder.layer_norm"),
        "dec_ln": _ln(sd, "decoder.layer_norm"),
    }
    for i in range(enc_layers):
        p = f"encoder.layers.{i}"
        params[f"enc_block_{i}"] = {
            "ln1": _ln(sd, f"{p}.self_attn_layer_norm"),
            "attn": _attn_qkv(sd, f"{p}.self_attn"),
            "ln2": _ln(sd, f"{p}.final_layer_norm"),
            "mlp": {"fc_in": _dense(sd, f"{p}.fc1"),
                    "fc_out": _dense(sd, f"{p}.fc2")},
        }
    for i in range(dec_layers):
        p = f"decoder.layers.{i}"
        params[f"dec_block_{i}"] = {
            "ln1": _ln(sd, f"{p}.self_attn_layer_norm"),
            "self_attn": _attn_qkv(sd, f"{p}.self_attn"),
            "ln2": _ln(sd, f"{p}.encoder_attn_layer_norm"),
            "cross": _cross(sd, f"{p}.encoder_attn"),
            "ln3": _ln(sd, f"{p}.final_layer_norm"),
            "mlp": {"fc_in": _dense(sd, f"{p}.fc1"),
                    "fc_out": _dense(sd, f"{p}.fc2")},
        }
    return params


def load_whisper(state_dict, n_mels: int, d_model: int, n_heads: int,
                 enc_layers: int, dec_layers: int, vocab_size: int,
                 max_source_positions: int = 1500,
                 max_target_positions: int = 448, d_ff: int = 0,
                 drop: float = 0.0, **model_kw):
    """HF Whisper → (TransformerSeq2Seq(audio_frontend=True), params).

    Dims follow the HF config: d_model, encoder_attention_heads,
    encoder_layers/decoder_layers, num_mel_bins, max_source_positions
    (frames//2), max_target_positions, vocab_size.  Decode with
    :func:`nn.seq2seq.seq2seq_generate` feeding (B, n_mels, frames) mel
    features and Whisper's forced BOS chain as the start tokens.
    """
    from neuralnetworklibrary_tpu.nn.seq2seq import TransformerSeq2Seq

    params = convert_whisper_state_dict(state_dict, enc_layers, dec_layers)
    model = TransformerSeq2Seq(
        vocab_size=vocab_size, pad_token=-1, d_model=d_model,
        n_heads=n_heads, enc_layers=enc_layers, dec_layers=dec_layers,
        d_ff=d_ff, max_src_len=max_source_positions,
        max_len=max_target_positions, drop=drop, audio_frontend=True,
        n_mels=n_mels, exact_gelu=True, norm_eps=1e-5, **model_kw)
    return model, params


def load_whisper_dir(path: str, **model_kw):
    """Load a Whisper checkpoint directory (config.json +
    model.safetensors[.index.json]) — same resolution as
    :func:`utils.llama_convert.load_llama_dir`."""
    import json
    import os

    from neuralnetworklibrary_tpu.utils.safetensors_io import (
        load_safetensors_auto,
    )

    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    sd = load_safetensors_auto(path)
    return load_whisper(
        sd,
        n_mels=int(cfg.get("num_mel_bins", 80)),
        d_model=int(cfg["d_model"]),
        n_heads=int(cfg["encoder_attention_heads"]),
        enc_layers=int(cfg["encoder_layers"]),
        dec_layers=int(cfg["decoder_layers"]),
        vocab_size=int(cfg["vocab_size"]),
        max_source_positions=int(cfg.get("max_source_positions", 1500)),
        max_target_positions=int(cfg.get("max_target_positions", 448)),
        d_ff=int(cfg.get("encoder_ffn_dim", 0)),
        **model_kw)
