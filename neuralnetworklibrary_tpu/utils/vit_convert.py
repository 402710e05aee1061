"""Convert HuggingFace ViT weights into :class:`nn.vit.ViT`.

HF's ViT (Dosovitskiy et al. 2021, `transformers.ViTForImageClassification`)
is the same computation as ``nn.vit.ViT`` configured with
``exact_gelu=True, norm_eps=1e-12`` — pre-LN encoder blocks, CLS pooling,
classifier on the final-LN CLS token — so conversion is renaming plus two
mechanical layout moves:

- torch Linear weights are (out, in) → flax kernels (in, out): transpose;
  the separate q/k/v projections concatenate into this framework's fused
  [q|k|v] kernel (same per-head feature order).
- the patch-embedding conv is torch (D, C, P, P) → flax (P, P, C, D).

Usage (weights from any source on disk):

    import torch
    sd = torch.load("pytorch_model.bin", map_location="cpu")
    model, params = load_hf_vit(sd, image_size=224, patch=16, d_model=768,
                                n_heads=12, n_layers=12, num_classes=1000)

Activation parity vs the HF torch implementation is pinned (random-init,
environment-safe) in tests/test_vit_convert.py.
"""

from __future__ import annotations

import numpy as np


def _t(x):
    import torch

    if isinstance(x, torch.Tensor):
        return np.asarray(x.detach().cpu().numpy(), np.float32)
    return np.asarray(x, np.float32)


def convert_vit_state_dict(state_dict, n_layers: int) -> dict:
    """HF ViTForImageClassification (or ViTModel) state_dict → ViT params."""
    sd = {k: v for k, v in dict(state_dict).items()}
    pre = "vit." if any(k.startswith("vit.") for k in sd) else ""
    emb = pre + "embeddings."
    params: dict = {
        "cls": _t(sd[emb + "cls_token"]),                       # (1, 1, D)
        "pos_embed": _t(sd[emb + "position_embeddings"])[0],    # (N+1, D)
        "patch_embed": {
            # torch conv (D, C, P, P) → flax (P, P, C, D)
            "kernel": _t(sd[emb + "patch_embeddings.projection.weight"]
                         ).transpose(2, 3, 1, 0),
            "bias": _t(sd[emb + "patch_embeddings.projection.bias"]),
        },
        "ln_f": {"scale": _t(sd[pre + "layernorm.weight"]),
                 "bias": _t(sd[pre + "layernorm.bias"])},
    }
    for i in range(n_layers):
        p = f"{pre}encoder.layer.{i}."
        att = p + "attention.attention."
        qkv_kernel = np.concatenate(
            [_t(sd[att + n + ".weight"]).T for n in ("query", "key", "value")],
            axis=1)                                             # (D, 3D)
        qkv_bias = np.concatenate(
            [_t(sd[att + n + ".bias"]) for n in ("query", "key", "value")])
        params[f"block_{i}"] = {
            "ln1": {"scale": _t(sd[p + "layernorm_before.weight"]),
                    "bias": _t(sd[p + "layernorm_before.bias"])},
            "ln2": {"scale": _t(sd[p + "layernorm_after.weight"]),
                    "bias": _t(sd[p + "layernorm_after.bias"])},
            "attn": {
                "qkv": {"kernel": qkv_kernel, "bias": qkv_bias},
                "out": {"kernel": _t(sd[p + "attention.output.dense.weight"]).T,
                        "bias": _t(sd[p + "attention.output.dense.bias"])},
            },
            "mlp": {
                "fc_in": {"kernel": _t(sd[p + "intermediate.dense.weight"]).T,
                          "bias": _t(sd[p + "intermediate.dense.bias"])},
                "fc_out": {"kernel": _t(sd[p + "output.dense.weight"]).T,
                           "bias": _t(sd[p + "output.dense.bias"])},
            },
        }
    if "classifier.weight" in sd:
        params["head"] = {"kernel": _t(sd["classifier.weight"]).T,
                          "bias": _t(sd["classifier.bias"])}
    return params


def load_hf_vit(state_dict, image_size: int, patch: int, d_model: int,
                n_heads: int, n_layers: int, num_classes: int, **kw):
    """Build the matching :class:`nn.vit.ViT` and its converted params.

    Returns (model, variables) ready for ``model.apply(variables, images)``
    — images NHWC float (HF feeds NCHW; transpose at the boundary).  A
    state_dict without a classifier head (plain ViTModel) leaves ``head``
    random — init the model and graft, or fine-tune.
    """
    import jax
    import jax.numpy as jnp

    from neuralnetworklibrary_tpu.nn.vit import ViT

    model = ViT(num_classes=num_classes, image_size=image_size, patch=patch,
                d_model=d_model, n_heads=n_heads, n_layers=n_layers,
                drop=0.0, exact_gelu=True, norm_eps=1e-12, **kw)
    params = convert_vit_state_dict(state_dict, n_layers)
    if "head" not in params:
        init = model.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, image_size, image_size, 3)))
        params["head"] = jax.tree_util.tree_map(np.asarray,
                                                init["params"]["head"])
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return model, {"params": params}
