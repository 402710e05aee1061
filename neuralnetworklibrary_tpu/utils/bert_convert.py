"""Convert HuggingFace BERT-family weights onto :mod:`nn.bert`.

Mechanics mirror :mod:`utils.llama_convert`: HF ``nn.Linear`` stores
(out, in) → flax kernels transpose; HF keeps q/k/v separate → concatenate
the transposed kernels along the OUTPUT axis into the fused ``qkv`` Dense
(order q | k | v, matching CausalSelfAttention's split).  Layout follows
``BertForMaskedLM`` (``bert.encoder.layer.N...`` + ``cls.predictions...``);
a bare ``BertModel`` state_dict loads the backbone with a fresh MLM head.

Activation parity vs the torch implementation (random-init, no downloads)
is pinned in tests/test_bert.py: sequence output, pooled output, and MLM
logits to ~1e-5 with padded batches and segment ids.
"""

from __future__ import annotations

import numpy as np


def _t(x):
    import torch

    if isinstance(x, torch.Tensor):
        return np.asarray(x.detach().cpu().float().numpy(), np.float32)
    return np.asarray(x, np.float32)


def _dense(sd, prefix):
    return {"kernel": _t(sd[f"{prefix}.weight"]).T,
            "bias": _t(sd[f"{prefix}.bias"])}


def _ln(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"])}


def convert_bert_state_dict(state_dict, n_layers: int) -> dict:
    """HF BertForMaskedLM / BertModel state_dict → :class:`nn.bert.BertMLM`
    params (backbone under ``bert``; MLM head zero-fresh when absent)."""
    sd = {k: v for k, v in dict(state_dict).items()}
    if any(k.startswith("bert.") for k in sd):
        body = {k[len("bert."):]: v for k, v in sd.items()
                if k.startswith("bert.")}
    else:
        body = sd
    emb = "embeddings"
    word = _t(body[f"{emb}.word_embeddings.weight"])
    D = word.shape[1]
    bert = {
        "word_embed": word,
        "pos_embed": _t(body[f"{emb}.position_embeddings.weight"]),
        "type_embed": _t(body[f"{emb}.token_type_embeddings.weight"]),
        "emb_ln": _ln(body, f"{emb}.LayerNorm"),
        # BertForMaskedLM checkpoints carry no pooler (HF builds its
        # backbone with add_pooling_layer=False) — identity-init one so the
        # [CLS] path stays usable for classifier grafts
        "pooler": (_dense(body, "pooler.dense")
                   if "pooler.dense.weight" in body
                   else {"kernel": np.eye(D, dtype=np.float32),
                         "bias": np.zeros(D, np.float32)}),
    }
    for i in range(n_layers):
        p = f"encoder.layer.{i}"
        q = _t(body[f"{p}.attention.self.query.weight"]).T
        k = _t(body[f"{p}.attention.self.key.weight"]).T
        v = _t(body[f"{p}.attention.self.value.weight"]).T
        qb = _t(body[f"{p}.attention.self.query.bias"])
        kb = _t(body[f"{p}.attention.self.key.bias"])
        vb = _t(body[f"{p}.attention.self.value.bias"])
        bert[f"block_{i}"] = {
            "attn": {"qkv": {"kernel": np.concatenate([q, k, v], axis=1),
                             "bias": np.concatenate([qb, kb, vb])},
                     "out": _dense(body, f"{p}.attention.output.dense")},
            "ln1": _ln(body, f"{p}.attention.output.LayerNorm"),
            "mlp": {"fc_in": _dense(body, f"{p}.intermediate.dense"),
                    "fc_out": _dense(body, f"{p}.output.dense")},
            "ln2": _ln(body, f"{p}.output.LayerNorm"),
        }
    V = word.shape[0]
    if "cls.predictions.transform.dense.weight" in sd:
        head = {
            "mlm_transform": _dense(sd, "cls.predictions.transform.dense"),
            "mlm_ln": _ln(sd, "cls.predictions.transform.LayerNorm"),
            "mlm_bias": _t(sd["cls.predictions.bias"]),
        }
    else:
        head = {"mlm_transform": {
                    "kernel": np.eye(D, dtype=np.float32),
                    "bias": np.zeros(D, np.float32)},
                "mlm_ln": {"scale": np.ones(D, np.float32),
                           "bias": np.zeros(D, np.float32)},
                "mlm_bias": np.zeros(V, np.float32)}
    return {"bert": bert, **head}


def load_bert(state_dict, n_layers: int, n_heads: int, d_model: int,
              vocab_size: int, d_ff: int = 0, max_len: int = 512,
              type_vocab: int = 2, pad_token: int = 0, drop: float = 0.1):
    """Build (BertMLM model, params) from an HF state_dict."""
    import jax

    from neuralnetworklibrary_tpu.nn.bert import BertMLM

    cfg = dict(vocab_size=vocab_size, pad_token=pad_token, d_model=d_model,
               n_heads=n_heads, n_layers=n_layers, d_ff=d_ff,
               max_len=max_len, type_vocab=type_vocab, drop=drop)
    model = BertMLM(config=cfg)
    params = convert_bert_state_dict(state_dict, n_layers)
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 4), np.int32)))["params"]
    got = {k: jax.tree_util.tree_map(np.shape, v)
           for k, v in params.items()}
    want = {k: jax.tree_util.tree_map(lambda s: tuple(s.shape), v)
            for k, v in ref.items()}
    if got != want:
        raise ValueError(f"converted tree mismatch:\n{got}\nvs\n{want}")
    import jax.numpy as jnp

    params = jax.tree_util.tree_map(jnp.asarray, params)
    return model, params
