"""LoRA — parameter-efficient fine-tuning for the transformer family.

Beyond reference parity (the reference's transfer-learning story is full
fine-tuning with discriminative lrs + freezing, General/Learner.py:237-272):
low-rank adapters (Hu et al. 2021) train ~1% of the weights while the frozen
base rides along, the TPU-friendly recipe for adapting large checkpoints —
the base matmuls stay big/batched on the MXU, the adapter adds two skinny
matmuls XLA fuses in, and the optimizer state (the usual HBM cost of
fine-tuning) shrinks to the adapter leaves.

Usage (any ``TransformerLM`` / ``ViT`` config, incl. GPT-2/ViT checkpoints
loaded via utils.gpt2_convert / utils.vit_convert)::

    base  = TransformerLM(vocab_size=V, ...)             # trained / converted
    model = TransformerLM(vocab_size=V, ..., lora_rank=8)
    learn = Learner(data, model, loss)                   # fresh init
    learn.params = graft_base(base_params, learn.params) # exact base forward
    learn.set_trainable(lora_trainable)                  # adapters only
    learn.fit_one_cycle(...)
    serving_params = merge_lora(learn.params, alpha=model.lora_alpha)
    # -> loads into the lora_rank=0 architecture, zero inference overhead

Adapter leaves are siblings of their base Dense scope — ``qkv_lora_a``
(in, r) and ``qkv_lora_b`` (r, out) next to ``qkv/kernel`` — with B
initialized to zero, so a freshly grafted model computes EXACTLY the base
forward.  Tensor parallelism: transformer_param_rule shards the wide adapter
dim to match the base kernel's Megatron split (the rank dim replicates).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp


def is_lora_path(path) -> bool:
    """True for adapter leaves.  ``path`` is a tuple of str names (the
    Learner's Partition paths) or a jax KeyPath."""
    last = str(path[-1]).strip("[].'\"") if path else ""
    return last.endswith(("_lora_a", "_lora_b"))


def lora_trainable(path) -> bool:
    """Per-leaf predicate for ``Learner.set_trainable``: train ONLY the
    adapter leaves (the base model is entirely frozen)."""
    return is_lora_path(path)


def graft_base(base_params: Mapping, lora_params: Mapping):
    """Copy a base (``lora_rank=0``) checkpoint into a freshly initialized
    LoRA model's params: every leaf present in ``base_params`` is taken from
    it, the adapter leaves keep their init (B = 0, so the grafted model's
    forward equals the base model's exactly).  Raises on shape mismatch or
    base leaves with no destination.

    Base leaves are COPIED, not aliased: the jitted train step donates its
    params buffers, so handing the caller's base arrays to a Learner would
    DELETE them on the first step — the caller's ``base_params`` stays
    valid for grafting further adapters / serving the base model (the
    failure mode is a delayed "Array has been deleted" on the second
    graft; pinned in tests/test_lora.py)."""

    def walk(base, tree, prefix):
        out = {}
        for k, v in tree.items():
            if isinstance(v, Mapping):
                out[k] = walk(base.get(k, {}) if isinstance(base, Mapping)
                              else {}, v, prefix + (k,))
            elif isinstance(base, Mapping) and k in base:
                b = base[k]
                if jnp.shape(b) != jnp.shape(v):
                    raise ValueError(
                        f"graft_base: shape mismatch at "
                        f"{'/'.join(prefix + (k,))}: base {jnp.shape(b)} "
                        f"vs lora-model {jnp.shape(v)}")
                out[k] = jnp.array(b)   # copy: never alias donated buffers
            else:
                out[k] = v
        return out

    grafted = walk(base_params, dict(lora_params), ())
    base_leaves = {p for p, _ in
                   jax.tree_util.tree_flatten_with_path(base_params)[0]}
    new_leaves = {p for p, _ in
                  jax.tree_util.tree_flatten_with_path(grafted)[0]}
    missing = base_leaves - new_leaves
    if missing:
        names = sorted(jax.tree_util.keystr(p) for p in missing)
        raise ValueError(f"graft_base: base leaves with no destination in "
                         f"the LoRA model: {names[:5]}")
    return grafted


def stack_adapters(base_params: Mapping, adapters):
    """Build params for a MULTI-adapter model (``n_adapters=len(adapters)+1``)
    from a base checkpoint plus N single-adapter LoRA params trees (each
    trained via the usual rank-r graft/fine-tune flow, same rank): every
    ``*_lora_a``/``*_lora_b`` leaf becomes a stacked (N+1, ...) array whose
    row 0 is ZERO (the base adapter — exact base forward) and row i+1 is
    adapter i's leaf; non-adapter leaves come from ``base_params``.

    The result serves through ``TransformerLM(..., lora_rank=r,
    n_adapters=N+1)`` with per-row ``adapter_ids`` — the
    ``ServingEngine(adapters=[...])`` multi-tenant path: one base model,
    one batch, every request under its own fine-tune."""
    adapters = list(adapters)
    if not adapters:
        raise ValueError("stack_adapters: need at least one adapter")

    def walk(trees, base, prefix):
        out = {}
        first = trees[0]
        for k, v in first.items():
            here = prefix + (k,)
            if isinstance(v, Mapping):
                out[k] = walk([t[k] for t in trees],
                              base.get(k, {}) if isinstance(base, Mapping)
                              else {}, here)
            elif isinstance(k, str) and k.endswith(("_lora_a", "_lora_b")):
                leaves = [t[k] for t in trees]
                shp = jnp.shape(leaves[0])
                if any(jnp.shape(le) != shp for le in leaves):
                    raise ValueError(
                        f"stack_adapters: adapter shapes differ at "
                        f"{'/'.join(here)}")
                out[k] = jnp.concatenate(
                    [jnp.zeros((1,) + shp, leaves[0].dtype)]
                    + [jnp.asarray(le)[None] for le in leaves], axis=0)
            else:
                if not (isinstance(base, Mapping) and k in base):
                    raise ValueError(
                        f"stack_adapters: base_params missing leaf "
                        f"{'/'.join(here)}")
                out[k] = base[k]
        return out

    return walk([dict(a) for a in adapters], dict(base_params), ())


def merge_lora(params: Mapping, alpha: float = 16.0):
    """Fold every adapter pair into its base kernel —
    ``kernel += (alpha/rank) · A @ B`` — and drop the adapter leaves.  The
    result loads into the same architecture with ``lora_rank=0`` and
    reproduces the adapted model's forward exactly (zero serving overhead).
    ``alpha`` must match the model's ``lora_alpha``; rank is read off A."""

    def walk(tree):
        out = {}
        loras = [k for k in tree if isinstance(k, str)
                 and k.endswith("_lora_a")]
        for k, v in tree.items():
            if isinstance(k, str) and k.endswith(("_lora_a", "_lora_b")):
                continue
            if isinstance(v, Mapping):
                out[k] = walk(v)
            else:
                out[k] = v
        for la in loras:
            base = la[: -len("_lora_a")]
            a, b = tree[la], tree[base + "_lora_b"]
            if base not in out or "kernel" not in out[base]:
                raise ValueError(f"merge_lora: no base kernel for {la}")
            rank = a.shape[-1]
            k = out[base]["kernel"]
            out[base] = dict(out[base])
            out[base]["kernel"] = (
                k + (alpha / rank) * (a @ b)).astype(k.dtype)
        return out

    return walk(dict(params))
