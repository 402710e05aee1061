"""Vocab-chunked softmax cross-entropy for tied-decoder language models.

A wt103-dimension LM step materializes a (B, T, V) = (64, 75, 30k) float32
logits tensor — 576 MB — twice (forward + its gradient).  On TPU the step is
HBM-bound long before it is MXU-bound, so the TPU-native fix is to never
materialize the logits: stream the vocabulary in chunks of C columns,
folding each chunk's contribution into an online logsumexp (forward) and
recomputing the chunk's softmax block inside the backward (activation
rematerialization at the op level).  Peak memory drops from O(B·T·V) to
O(B·T·C); FLOPs are unchanged forward and ~2× backward for the recompute —
the classic bandwidth-for-FLOPs trade the MXU wins.

``chunked_softmax_ce(h, emb, targets, mask)`` == the dense
``CE(h @ emb.T, targets)`` exactly (same reduction; differential-tested),
gradients flow to BOTH h and the (tied) embedding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pad_vocab(emb, chunk):
    V = emb.shape[0]
    n_chunks = -(-V // chunk)
    pad = n_chunks * chunk - V
    if pad:
        emb = jnp.concatenate(
            [emb, jnp.zeros((pad, emb.shape[1]), emb.dtype)], 0)
    return emb, n_chunks, pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def chunked_softmax_ce(h, emb, targets, mask, chunk: int = 8192):
    """Masked-mean token cross-entropy of the tied decoder ``h @ emb.T``
    without materializing the logits.

    h: (B, T, D) (any float dtype; reductions run f32), emb: (V, D),
    targets: (B, T) int32, mask: (B, T) float (1 = count the token) or None
    semantics via jnp.ones.  Returns the scalar masked mean CE.
    """
    loss, _ = _fwd(h, emb, targets, mask, chunk)
    return loss


def _fwd(h, emb, targets, mask, chunk):
    B, T, D = h.shape
    N = B * T
    hf = h.reshape(N, D)
    tf = targets.reshape(N)
    mf = mask.reshape(N).astype(jnp.float32)
    emb_p, _, pad = _pad_vocab(emb, chunk)
    # padded rows are all-zero → their logit is 0; a real vocab row could
    # also be 0, and exp(0) extra mass would corrupt the lse — instead pad
    # with -inf logits by masking inside the scan via a huge negative bias
    if pad:
        bias = jnp.concatenate([jnp.zeros(emb.shape[0], jnp.float32),
                                jnp.full((pad,), -1e30, jnp.float32)])
    else:
        bias = None
    lse = _lse_scan_biased(hf, emb_p, bias, chunk)
    tgt = jnp.take(emb, tf, axis=0)                          # (N, D)
    tgt_logit = jnp.sum(hf.astype(jnp.float32)
                        * tgt.astype(jnp.float32), axis=-1)
    per_tok = lse - tgt_logit
    denom = jnp.maximum(jnp.sum(mf), 1.0)
    loss = jnp.sum(per_tok * mf) / denom
    return loss, (h, emb, targets, mask, lse)


def _lse_scan_biased(hf, emb_p, bias, chunk):
    N, D = hf.shape
    n_chunks = emb_p.shape[0] // chunk
    emb_c = emb_p.reshape(n_chunks, chunk, D)
    bias_c = (None if bias is None
              else bias.reshape(n_chunks, chunk))

    def step(carry, inp):
        m, s = carry
        if bias_c is None:
            emb_i = inp
            logits = (hf @ emb_i.T).astype(jnp.float32)
        else:
            emb_i, b_i = inp
            logits = (hf @ emb_i.T).astype(jnp.float32) + b_i[None, :]
        m_i = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m, m_i)
        s = s * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(logits - m_new[:, None]), axis=-1)
        return (m_new, s), None

    init = (jnp.full((N,), -jnp.inf, jnp.float32),
            jnp.zeros((N,), jnp.float32))
    xs = emb_c if bias_c is None else (emb_c, bias_c)
    (m, s), _ = jax.lax.scan(step, init, xs)
    return m + jnp.log(s)


def _bwd(chunk, res, g):
    h, emb, targets, mask, lse = res
    B, T, D = h.shape
    V = emb.shape[0]
    N = B * T
    hf = h.reshape(N, D).astype(jnp.float32)
    tf = targets.reshape(N)
    mf = mask.reshape(N).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mf), 1.0)
    w = (g * mf / denom)                                     # (N,) per-token
    emb_p, n_chunks, pad = _pad_vocab(emb, chunk)
    emb_c = emb_p.reshape(n_chunks, chunk, D).astype(jnp.float32)
    if pad:
        bias = jnp.concatenate([jnp.zeros(V, jnp.float32),
                                jnp.full((pad,), -1e30, jnp.float32)])
        bias_c = bias.reshape(n_chunks, chunk)
    else:
        bias_c = jnp.zeros((n_chunks, chunk), jnp.float32)

    # dh = Σ_v p_v · emb_v − emb_target ;  demb_v = Σ_n p_nv · h_n − scatter
    def step(dh, inp):
        emb_i, b_i = inp
        logits = hf @ emb_i.T + b_i[None, :]
        p = jnp.exp(logits - lse[:, None])                   # (N, C) softmax
        pw = p * w[:, None]
        dh = dh + pw @ emb_i                                 # (N, D)
        demb_i = pw.T @ hf                                   # (C, D)
        return dh, demb_i

    dh, demb_chunks = jax.lax.scan(step, jnp.zeros((N, D), jnp.float32),
                                   (emb_c, bias_c))
    demb = demb_chunks.reshape(n_chunks * chunk, D)[:V]
    # target-column corrections
    tgt = jnp.take(emb, tf, axis=0).astype(jnp.float32)
    dh = dh - w[:, None] * tgt
    demb = demb.at[tf].add(-w[:, None] * hf)
    return (dh.reshape(B, T, D).astype(h.dtype),
            demb.astype(emb.dtype), None, None)


def _fwd_vjp(h, emb, targets, mask, chunk):
    return _fwd(h, emb, targets, mask, chunk)


chunked_softmax_ce.defvjp(_fwd_vjp, _bwd)


def dense_softmax_ce(h, emb, targets, mask):
    """The dense oracle: CE(h @ emb.T) with the same masked-mean reduction
    (materializes (B, T, V) — what chunking avoids)."""
    logits = jnp.einsum("btd,vd->btv", h, emb).astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(
        logits, targets[..., None].astype(jnp.int32), -1)[..., 0]
    mf = mask.astype(jnp.float32)
    return jnp.sum((lse - tgt) * mf) / jnp.maximum(jnp.sum(mf), 1.0)
