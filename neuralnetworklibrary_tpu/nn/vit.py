"""Vision Transformer classifier (ViT, Dosovitskiy et al. 2021).

Beyond reference parity (the reference's zoo is conv-nets:
Applications/VisionModels/vmods.py) — the transformer-era image classifier,
built from the SAME pre-LN blocks as the language family
(:class:`~neuralnetworklibrary_tpu.nn.transformer.TransformerBlock` with
``causal=False``), so every transformer scaling lever — Megatron TP via
``transformer_param_rule``, sequence parallelism, per-block remat — applies
to vision unchanged.

TPU notes: the patch embedding is a stride-P conv (one big MXU matmul over
(P·P·C, D)); all shapes are static (N = (H/P)·(W/P) tokens + 1 CLS); NHWC
layout like the rest of the zoo (`nn/resnet.py`).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from neuralnetworklibrary_tpu.nn.transformer import TransformerBlock


class ViT(nn.Module):
    """ViT classifier: stride-P patch conv → [CLS] + learned position
    embeddings → L bidirectional pre-LN blocks → final LN → head on the CLS
    token (or mean-pooled tokens with ``pool="mean"``).

    Learner contract matches the zoo classifiers: two layer groups
    (backbone, head) for discriminative lrs and ``freeze()`` head-only
    fine-tuning.  Inputs are NHWC float images (the Learner's input
    pipeline hands over normalized floats).
    """

    num_classes: int
    image_size: int = 224
    patch: int = 16
    d_model: int = 384
    n_heads: int = 6
    n_layers: int = 12
    d_ff: int = 0              # 0 → 4·d_model
    drop: float = 0.0
    pool: str = "cls"          # 'cls' | 'mean'
    mesh: Optional[Mesh] = None
    sp: bool = False
    remat: bool = False
    norm_eps: float = 1e-6     # HF ViT checkpoints use 1e-12
    exact_gelu: bool = False   # True matches HF ViT's erf gelu
    flash_attention: bool = False  # r5: bidirectional flash kernel (token
                               # count is padded to a 128-multiple inside
                               # the kernel wrapper); a win at high-res/
                               # small-patch token counts, measure first
    lora_rank: int = 0         # > 0: LoRA adapters on the block projections
    lora_alpha: float = 16.0   # (nn/lora.py — graft/merge/train helpers)

    head_prefixes = ("head",)

    @property
    def layer_group_prefixes(self):
        blocks = tuple(f"block_{i}" for i in range(self.n_layers))
        return (("patch_embed", "cls", "pos_embed", "ln_f") + blocks,
                ("head",))

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.pool not in ("cls", "mean"):
            raise ValueError(f"pool must be 'cls' or 'mean', got {self.pool!r}")
        B, H, W, C = x.shape
        P = self.patch
        if H % P or W % P:
            raise ValueError(f"image {H}x{W} not divisible by patch {P}")
        n_tokens = (H // P) * (W // P) + 1
        d_ff = self.d_ff or 4 * self.d_model

        h = nn.Conv(self.d_model, (P, P), strides=(P, P), padding="VALID",
                    name="patch_embed")(x)
        h = h.reshape(B, -1, self.d_model)                    # (B, N-1, D)
        cls = self.param("cls", nn.initializers.zeros, (1, 1, self.d_model))
        h = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.d_model)), h], 1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (n_tokens, self.d_model))
        h = h + pos[None]
        if train and self.drop > 0.0:
            h = nn.Dropout(self.drop, deterministic=False)(h)

        block_cls = TransformerBlock
        if self.remat:
            block_cls = nn.remat(TransformerBlock, static_argnums=(2, 3))
        for i in range(self.n_layers):
            h, _ = block_cls(self.d_model, self.n_heads, d_ff, self.drop,
                             mesh=self.mesh, sp=self.sp, causal=False,
                             flash=self.flash_attention,
                             norm_eps=self.norm_eps,
                             exact_gelu=self.exact_gelu,
                             lora_rank=self.lora_rank,
                             lora_alpha=self.lora_alpha,
                             name=f"block_{i}")(h, train, False, None)
        h = nn.LayerNorm(epsilon=self.norm_eps, name="ln_f")(h)
        feat = h[:, 0] if self.pool == "cls" else jnp.mean(h, axis=1)
        return nn.Dense(self.num_classes, name="head")(feat)

    @classmethod
    def from_dataobj(cls, data, **kw):
        sz = getattr(data, "sz", kw.pop("image_size", 224))
        return cls(num_classes=len(getattr(data, "classes", [])) or
                   kw.pop("num_classes"), image_size=sz, **kw)
