"""Pipeline-parallel transformer LM: the flagship block stack as stages.

Beyond reference parity (the reference is single-GPU and has no transformer)
— this is the production pipeline case the schedules in
:mod:`neuralnetworklibrary_tpu.parallel.pipeline` exist for: unlike the
AWD-LSTM's heterogeneous padded widths, transformer blocks are homogeneous
(width d_model in and out), so L layers fold naturally into S stages of
K = L/S blocks each with no padding and no masking.

:class:`PipelinedTransformerLM` re-implements the math of
``nn.transformer.TransformerLM`` (pre-LN causal blocks, LayerNorm/RMSNorm,
GELU/SwiGLU MLP, MHA/GQA, learned/rotary positions, tied decoder) as a plain
init/apply model whose block parameters are stacked ``(S, K, ...)`` — the
layout :func:`pipeline_apply` / :func:`pipeline_1f1b` schedule over a 'stage'
mesh axis, and :func:`pipelined_param_rule` shards.  Numerics are EXACTLY the
flax model's (``from_transformer_lm`` copies weights; tests pin logits
equality), so anything that loads into TransformerLM — including GPT-2
checkpoints via ``utils.gpt2_convert.load_gpt2`` — can be staged.

Schedules:

- ``schedule="gpipe"`` (default): the differentiable scan formulation;
  ``jax.grad`` through it yields the reversed backward pipeline.
- ``schedule="1f1b"``: the interleaved one-forward-one-backward schedule via
  the Learner's model-owned ``loss_and_grad`` hook — stored activations are
  O(S²), independent of the microbatch count.

Scope: training/scoring.  KV-cached generation stays with the flax
``TransformerLM`` (decode is latency-bound and single-microbatch — a
pipeline bubble with M=1 is all bubble); copy weights back with
:meth:`to_transformer_lm` to serve a pipeline-trained model.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from neuralnetworklibrary_tpu.parallel.pipeline import (
    pipeline_1f1b,
    pipeline_apply,
)


def _lecun(key, shape):
    # flax nn.Dense default: variance_scaling(1.0, 'fan_in', 'truncated_normal')
    return jax.nn.initializers.lecun_normal()(key, shape, jnp.float32)


class PipelinedTransformerLM:
    """Decoder-only causal LM with its block stack pipelined over 'stage'.

    Same computation as ``nn.transformer.TransformerLM`` (token [+ learned
    positional] embedding → L pre-LN blocks → final norm → tied-embedding
    decoder; output ``(logits, h)`` so SeqCrossEntropyLoss drops in), but the
    L = S·K blocks run through the differentiable GPipe schedule (or 1F1B via
    the ``loss_and_grad`` hook).

    Learner contract mirrors :class:`PipelinedLanguageModelNet`: plain
    init/apply, ``layer_group_prefixes`` [[pos_embed, stack, ln_f],
    [word_embed]], head = the tied embedding.

    Dropout caveat (as for the pipelined AWD-LSTM): masks are drawn per
    stage-block, so all microbatches of a window share them — variational
    dropout at microbatch granularity.  Set ``drop=0`` for exact-parity
    tests; the flax model's rng stream differs regardless.
    """

    def __init__(self, vocab_size: int, pad_token: int = 1,
                 d_model: int = 256, n_heads: int = 8, n_layers: int = 4,
                 d_ff: int = 0, max_len: int = 512, drop: float = 0.0,
                 n_microbatches: int = 4, n_kv_heads: int = 0,
                 pos_embedding: str = "learned", rope_base: float = 10000.0,
                 mlp: str = "gelu", norm: str = "layernorm",
                 norm_eps: float = 1e-6, blocks_per_stage: int = 1,
                 mesh: Optional[Mesh] = None, axis: str = "stage",
                 remat: bool = False, schedule: str = "gpipe"):
        if n_layers % blocks_per_stage:
            raise ValueError(f"n_layers {n_layers} must divide into "
                             f"blocks_per_stage {blocks_per_stage}")
        if pos_embedding not in ("learned", "rope"):
            raise ValueError(f"pos_embedding must be 'learned' or 'rope', "
                             f"got {pos_embedding!r}")
        if mlp not in ("gelu", "swiglu"):
            raise ValueError(f"mlp must be 'gelu' or 'swiglu', got {mlp!r}")
        if norm not in ("layernorm", "rmsnorm"):
            raise ValueError(f"norm must be 'layernorm' or 'rmsnorm', "
                             f"got {norm!r}")
        if schedule not in ("gpipe", "1f1b"):
            raise ValueError(f"schedule must be 'gpipe' or '1f1b', "
                             f"got {schedule!r}")
        self.vocab_size, self.pad_token = vocab_size, pad_token
        self.d_model, self.n_heads = d_model, n_heads
        self.n_layers = n_layers
        self.d_ff = d_ff or 4 * d_model
        self.max_len, self.drop = max_len, drop
        self.M = n_microbatches
        self.n_kv_heads = n_kv_heads or n_heads
        if n_heads % self.n_kv_heads:
            raise ValueError(f"n_heads {n_heads} must be a multiple of "
                             f"n_kv_heads {self.n_kv_heads}")
        self.pos_embedding, self.rope_base = pos_embedding, rope_base
        self.mlp_kind, self.norm_kind, self.norm_eps = mlp, norm, norm_eps
        self.K = blocks_per_stage
        self.S = n_layers // blocks_per_stage
        self.mesh, self.axis, self.remat = mesh, axis, remat
        self.schedule = schedule
        self.layer_group_prefixes = [["pos_embed", "stack", "ln_f"],
                                     ["word_embed"]]
        self.head_prefixes = ("word_embed",)
        if schedule == "1f1b":
            self.loss_and_grad = self._loss_and_grad_1f1b

    def __call__(self, x, train=False):
        raise TypeError("PipelinedTransformerLM is driven via init()/apply()")

    @classmethod
    def from_dataobj(cls, data, **kw):
        return cls(vocab_size=len(data.stoi), pad_token=data.stoi["_pad_"], **kw)

    # ------------------------------------------------------------ parameters

    def init(self, rngs, *xs, train=False):
        key = rngs["params"] if isinstance(rngs, dict) else rngs
        S, K, D, F = self.S, self.K, self.d_model, self.d_ff
        hd = D // self.n_heads
        qkv_out = (self.n_heads + 2 * self.n_kv_heads) * hd
        keys = jax.random.split(key, 8)

        def stacked(k, in_out):  # one (S, K, in, out) kernel per block
            ks = jax.random.split(k, S * K)
            w = jnp.stack([_lecun(ks[i], in_out) for i in range(S * K)])
            return w.reshape((S, K) + in_out)

        stack = {
            "ln1_scale": jnp.ones((S, K, D)),
            "ln2_scale": jnp.ones((S, K, D)),
            "qkv_kernel": stacked(keys[0], (D, qkv_out)),
            "qkv_bias": jnp.zeros((S, K, qkv_out)),
            "out_kernel": stacked(keys[1], (D, D)),
            "out_bias": jnp.zeros((S, K, D)),
            "fc_in_kernel": stacked(keys[2], (D, F)),
            "fc_in_bias": jnp.zeros((S, K, F)),
            "fc_out_kernel": stacked(keys[3], (F, D)),
            "fc_out_bias": jnp.zeros((S, K, D)),
        }
        if self.norm_kind == "layernorm":
            stack["ln1_bias"] = jnp.zeros((S, K, D))
            stack["ln2_bias"] = jnp.zeros((S, K, D))
        if self.mlp_kind == "swiglu":
            stack["fc_gate_kernel"] = stacked(keys[4], (D, F))
            stack["fc_gate_bias"] = jnp.zeros((S, K, F))
        params = {
            "word_embed": {
                "weight": 0.02 * jax.random.normal(
                    keys[5], (self.vocab_size, D))},
            "stack": stack,
            "ln_f": ({"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}
                     if self.norm_kind == "layernorm"
                     else {"scale": jnp.ones((D,))}),
        }
        if self.pos_embedding == "learned":
            params["pos_embed"] = {
                "weight": 0.02 * jax.random.normal(keys[6],
                                                   (self.max_len, D))}
        return {"params": params}

    # flax TransformerLM <-> stacked layout bridges ---------------------------

    def from_transformer_lm(self, flax_params):
        """Map a ``nn.transformer.TransformerLM`` param tree (same config)
        into this model's stacked layout — e.g. GPT-2 weights from
        ``utils.gpt2_convert.load_gpt2``.  Returns a param tree for apply().
        """
        S, K = self.S, self.K

        def per_block(get):
            rows = [[get(flax_params[f"block_{s * K + k}"])
                     for k in range(K)] for s in range(S)]
            return jnp.asarray(np.stack([[np.asarray(v) for v in r]
                                         for r in rows]))

        stack = {
            "ln1_scale": per_block(lambda b: b["ln1"]["scale"]),
            "ln2_scale": per_block(lambda b: b["ln2"]["scale"]),
            "qkv_kernel": per_block(lambda b: b["attn"]["qkv"]["kernel"]),
            "qkv_bias": per_block(lambda b: b["attn"]["qkv"]["bias"]),
            "out_kernel": per_block(lambda b: b["attn"]["out"]["kernel"]),
            "out_bias": per_block(lambda b: b["attn"]["out"]["bias"]),
            "fc_in_kernel": per_block(lambda b: b["mlp"]["fc_in"]["kernel"]),
            "fc_in_bias": per_block(lambda b: b["mlp"]["fc_in"]["bias"]),
            "fc_out_kernel": per_block(lambda b: b["mlp"]["fc_out"]["kernel"]),
            "fc_out_bias": per_block(lambda b: b["mlp"]["fc_out"]["bias"]),
        }
        if self.norm_kind == "layernorm":
            stack["ln1_bias"] = per_block(lambda b: b["ln1"]["bias"])
            stack["ln2_bias"] = per_block(lambda b: b["ln2"]["bias"])
        if self.mlp_kind == "swiglu":
            stack["fc_gate_kernel"] = per_block(
                lambda b: b["mlp"]["fc_gate"]["kernel"])
            stack["fc_gate_bias"] = per_block(
                lambda b: b["mlp"]["fc_gate"]["bias"])
        params = {
            "word_embed": {"weight": jnp.asarray(flax_params["word_embed"])},
            "stack": stack,
            "ln_f": jax.tree_util.tree_map(jnp.asarray,
                                           dict(flax_params["ln_f"])),
        }
        if self.pos_embedding == "learned":
            params["pos_embed"] = {
                "weight": jnp.asarray(flax_params["pos_embed"])}
        return params

    def to_transformer_lm(self, params):
        """Inverse of :meth:`from_transformer_lm`: unstack back into the flax
        TransformerLM layout (to serve a pipeline-trained model through the
        KV-cached generate/beam_search paths)."""
        S, K = self.S, self.K
        st = params["stack"]
        out = {"word_embed": params["word_embed"]["weight"],
               "ln_f": dict(params["ln_f"])}
        if self.pos_embedding == "learned":
            out["pos_embed"] = params["pos_embed"]["weight"]
        for s in range(S):
            for k in range(K):
                blk = {
                    "ln1": {"scale": st["ln1_scale"][s, k]},
                    "ln2": {"scale": st["ln2_scale"][s, k]},
                    "attn": {"qkv": {"kernel": st["qkv_kernel"][s, k],
                                     "bias": st["qkv_bias"][s, k]},
                             "out": {"kernel": st["out_kernel"][s, k],
                                     "bias": st["out_bias"][s, k]}},
                    "mlp": {"fc_in": {"kernel": st["fc_in_kernel"][s, k],
                                      "bias": st["fc_in_bias"][s, k]},
                            "fc_out": {"kernel": st["fc_out_kernel"][s, k],
                                       "bias": st["fc_out_bias"][s, k]}},
                }
                if self.norm_kind == "layernorm":
                    blk["ln1"]["bias"] = st["ln1_bias"][s, k]
                    blk["ln2"]["bias"] = st["ln2_bias"][s, k]
                if self.mlp_kind == "swiglu":
                    blk["mlp"]["fc_gate"] = {
                        "kernel": st["fc_gate_kernel"][s, k],
                        "bias": st["fc_gate_bias"][s, k]}
                out[f"block_{s * K + k}"] = blk
        return out

    # ------------------------------------------------------------ block math

    def _norm(self, x, scale, bias):
        if self.norm_kind == "rmsnorm":
            x = x * jax.lax.rsqrt(
                jnp.mean(jnp.square(x), axis=-1, keepdims=True)
                + self.norm_eps)
            return x * scale
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - mean * mean
        return (x - mean) * jax.lax.rsqrt(var + self.norm_eps) * scale + bias

    def _block(self, p, k, h, drop_key, train):
        """One pre-LN transformer block; p holds (K, ...) leaves, k indexes
        the block within the stage.  Math identical to
        nn.transformer.TransformerBlock (einsum attention path)."""
        D, H, Hkv = self.d_model, self.n_heads, self.n_kv_heads
        hd = D // H
        mb, T, _ = h.shape
        x = h
        b1 = p["ln1_bias"][k] if self.norm_kind == "layernorm" else None
        hn = self._norm(x, p["ln1_scale"][k], b1)
        qkv = hn @ p["qkv_kernel"][k] + p["qkv_bias"][k]
        q, kk, v = jnp.split(qkv, [H * hd, (H + Hkv) * hd], axis=-1)
        q = q.reshape(mb, T, H, hd)
        kk = kk.reshape(mb, T, Hkv, hd)
        v = v.reshape(mb, T, Hkv, hd)
        if self.pos_embedding == "rope":
            from neuralnetworklibrary_tpu.nn.transformer import rope
            pos = jnp.arange(T)
            q = rope(q, pos, self.rope_base)
            kk = rope(kk, pos, self.rope_base)
        if H != Hkv:
            kk = jnp.repeat(kk, H // Hkv, axis=2)
            v = jnp.repeat(v, H // Hkv, axis=2)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, kk) / math.sqrt(hd)
        mask = jnp.tril(jnp.ones((T, T), bool))
        att = jnp.where(mask, att, -1e30)
        att = jax.nn.softmax(att, axis=-1)
        if train and self.drop > 0.0:
            keep = jax.random.bernoulli(jax.random.fold_in(drop_key, 2 * k),
                                        1.0 - self.drop, att.shape)
            att = att * keep.astype(att.dtype) / (1.0 - self.drop)
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(mb, T, D)
        x = x + (o @ p["out_kernel"][k] + p["out_bias"][k])
        b2 = p["ln2_bias"][k] if self.norm_kind == "layernorm" else None
        hn = self._norm(x, p["ln2_scale"][k], b2)
        if self.mlp_kind == "swiglu":
            g = jax.nn.silu(hn @ p["fc_in_kernel"][k] + p["fc_in_bias"][k])
            y = g * (hn @ p["fc_gate_kernel"][k] + p["fc_gate_bias"][k])
        else:
            y = jax.nn.gelu(hn @ p["fc_in_kernel"][k] + p["fc_in_bias"][k])
        y = y @ p["fc_out_kernel"][k] + p["fc_out_bias"][k]
        if train and self.drop > 0.0:
            keep = jax.random.bernoulli(
                jax.random.fold_in(drop_key, 2 * k + 1),
                1.0 - self.drop, (mb, 1, D))
            y = y * keep.astype(y.dtype) / (1.0 - self.drop)
        return x + y

    def _stage_fn_factory(self, train, dropout_key):
        K = self.K

        def stage_fn(p, h):
            # p: dict of (K, ...) leaves + this stage's index
            skey = jax.random.fold_in(dropout_key, p["s_idx"])
            for k in range(K):
                h = self._block(p, k, h, skey, train)
            return h

        return stage_fn

    def _stacked(self, params):
        st = dict(params["stack"])
        st["s_idx"] = jnp.arange(self.S)
        return st

    # -------------------------------------------------------------- forward

    def _embed(self, params, x, train, key):
        B, T = x.shape
        if T > self.max_len:
            raise ValueError(f"sequence length {T} > max_len {self.max_len}")
        h = jnp.take(params["word_embed"]["weight"], x, axis=0)
        if self.pos_embedding == "learned":
            h = h + params["pos_embed"]["weight"][None, :T]
        if train and self.drop > 0.0:
            keep = jax.random.bernoulli(key, 1.0 - self.drop, h.shape)
            h = h * keep.astype(h.dtype) / (1.0 - self.drop)
        return h

    def _decode_head(self, params, out):
        ln = params["ln_f"]
        h = self._norm(out, ln["scale"], ln.get("bias"))
        logits = jnp.einsum("btd,vd->btv", h,
                            params["word_embed"]["weight"])
        return logits, h

    def apply(self, variables, *xs, train=False, rngs=None, mutable=None,
              pipelined: bool = True):
        params = variables["params"]
        x = xs[0]
        key = (rngs or {}).get("dropout") if isinstance(rngs, dict) else rngs
        if key is None:
            key = jax.random.PRNGKey(0)
        k_emb, k_stage = jax.random.split(key)
        h = self._embed(params, x, train, k_emb)
        stacked = self._stacked(params)
        stage_fn = self._stage_fn_factory(train, k_stage)
        if pipelined:
            out = pipeline_apply(stage_fn, stacked, h, self.M,
                                 mesh=self.mesh, axis=self.axis,
                                 remat=self.remat)
        else:  # sequential oracle: stages applied in order
            for s in range(self.S):
                p_s = jax.tree_util.tree_map(lambda a: a[s], stacked)
                h = stage_fn(p_s, h)
            out = h
        y = self._decode_head(params, out)
        if mutable:
            return y, {}
        return y

    # ---------------------------------------------------------------- 1F1B

    def _loss_and_grad_1f1b(self, params, state, xs, y, mask, rng, loss_func):
        """Training loss + gradients via the interleaved 1F1B schedule
        (:func:`pipeline_1f1b`): stored stage activations O(S²), independent
        of the microbatch count.  Exact for (masked-)mean losses: dense
        windows decompose as the sum of per-microbatch means / M, and a
        masked mean decomposes as Σ_m loss_m · (Σmask_m / Σmask) — each
        microbatch's masked mean reweighted by its share of the valid count
        (Σmask is constant wrt params, so gradients are exact too).  The
        final norm + tied decoder are differentiated as the schedule's
        ``aux``; the embedding's input-side gradient returns through the
        schedule's x-grad and an outer ``jax.vjp`` of the embed."""
        x = xs[0]
        B, T = x.shape
        M = self.M
        mb = B // M
        key = rng if rng is not None else jax.random.PRNGKey(0)
        k_emb, k_stage = jax.random.split(key)

        emb_w = params["word_embed"]["weight"]
        embed_in = {"emb": emb_w}
        if self.pos_embedding == "learned":
            embed_in["pos"] = params["pos_embed"]["weight"]

        def embed(w):
            p = {"word_embed": {"weight": w["emb"]}}
            if "pos" in w:
                p["pos_embed"] = {"weight": w["pos"]}
            return self._embed(p, x, True, k_emb)

        h, emb_vjp = jax.vjp(embed, embed_in)
        ys = y.reshape(M, mb, T)
        if mask is not None:
            # per-sequence (B,) or per-token (B, T) masks both decompose:
            # the in-loss broadcast factor is the same for every microbatch
            masks = mask.reshape((M, mb) + mask.shape[1:])
            total_valid = jnp.maximum(jnp.sum(mask), 1.0)
        aux = {"weight": emb_w, "ln_f": params["ln_f"]}

        def loss_fn(aux, m, out_mb):
            ln = aux["ln_f"]
            hn = self._norm(out_mb, ln["scale"], ln.get("bias"))
            logits = jnp.einsum("btd,vd->btv", hn, aux["weight"])
            if mask is None:
                return loss_func((logits, hn), ys[m]) / M
            w = jnp.sum(masks[m]) / total_valid
            return loss_func((logits, hn), ys[m], masks[m]) * w

        stacked = self._stacked(params)
        stage_fn = self._stage_fn_factory(True, k_stage)
        loss, pg, auxg, xg = pipeline_1f1b(
            stage_fn, stacked, h, loss_fn, aux, M,
            mesh=self.mesh, axis=self.axis)
        (d_embed,) = emb_vjp(xg)
        pg.pop("s_idx", None)
        grads = {
            "word_embed": {"weight": d_embed["emb"] + auxg["weight"]},
            "stack": pg,
            "ln_f": auxg["ln_f"],
        }
        if self.pos_embedding == "learned":
            grads["pos_embed"] = {"weight": d_embed["pos"]}
        return (loss, state if state is not None else {}), grads
