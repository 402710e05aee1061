"""Ring attention: exact causal attention over a context-sharded sequence.

Beyond reference parity (SURVEY §2.5 lists context parallelism / ring
attention as ABSENT in the reference) — this is the context-parallel
compute path for sequences too long for one device's HBM.

The sequence axis is sharded over a mesh axis (``'context'``): each device
holds a (B, T/N, H, hd) chunk of q/k/v.  N rounds of a ``lax.scan`` each
(1) attend the local queries to the currently-held K/V chunk with the
GLOBAL causal mask, folding the result into an online-softmax accumulator
(running max m, normalizer l — the same math as ops/flash_attention.py at
the chunk level), and (2) rotate the K/V chunk to the next device with
``lax.ppermute`` — so the K/V blocks ride the ICI ring while every device
computes, and no device ever materializes more than one remote chunk.
After N rounds every chunk has visited every device: the result is EXACTLY
softmax(QKᵀ)V (differential-tested against the einsum oracle, forward and
gradients — ppermute's transpose is the reverse rotation, so jax.grad
through the scan yields the reverse ring automatically).

r5 additions (VERDICT r4 #6 — the models round 4 taught the flash kernel
could still not context-parallelize):

- ``window`` — banded (sliding-window) attention.  The global band mask
  intersects the causal mask, and rounds whose chunk lies entirely LEFT of
  every device's band are truncated from the scan (the chunk that is
  out-of-band for the furthest-right query block is out-of-band for every
  one): the ring runs ``min(N, ceil((window-1)/Tc) + 2)`` rounds instead
  of N — banding cuts ring compute AND ring traffic, its whole point.
- ``sink`` — GPT-OSS per-head attention sinks.  Exactly the flash-kernel
  trick: the sink logit joins only the FINAL normalizer (max-folded after
  the scan), so the ring math is untouched; with Megatron head sharding
  the (H,) vector shards over the head axis alongside q/k/v.
- ``bias`` — a BATCH-SHARED (H, T, T) additive logit bias (T5 relative
  positions).  Sharded over the QUERY axis — each device owns its
  (H, Tc, T) row block and dynamic-slices the (Tc, Tc) column tile of the
  chunk it holds each round.  dbias falls out of autodiff per-shard (rows
  live exactly where their queries live; no cross-device reduction).

Compute cost note: chunks entirely above the causal diagonal contribute
all-masked scores (p = 0) — exactness is preserved and the implementation
stays branch-free; the idle-triangle waste is the standard non-load-
balanced ring schedule (striped/zigzag balancing is a known follow-up).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from neuralnetworklibrary_tpu.ops.flash_attention import _drop_keep

_NEG_INF = -1e30


def _ring_local(q, k, v, bias, sink, seed, qstart, *, axis_name: str,
                n_chunks: int, n_rounds: int, sm_scale: float, window: int,
                drop: float, batch_axis=None, head_axis=None,
                n_heads_total: int = 0, vary_axes=()):
    """Per-device body (runs under shard_map).  q/k/v: (B, Tc, H, hd);
    bias: (H, Tc, T) query-row shard or None; sink: (H,) head shard or
    None; seed: () int32 dropout seed or None; qstart: (B, Tc) local
    query-document-start shard or None (packed sequences)."""
    B, Tc, H, hd = q.shape
    idx = jax.lax.axis_index(axis_name)
    q_pos = idx * Tc + jnp.arange(Tc)                        # global positions
    bh = None
    if drop > 0.0:
        # the SAME position-hashed mask stream as the flash kernel
        # (ops/flash_attention._drop_keep), with GLOBAL batch·head indices
        # so batch/head sharding does not correlate masks across shards
        b_off = (jax.lax.axis_index(batch_axis) * B
                 if batch_axis is not None else 0)
        h_off = (jax.lax.axis_index(head_axis) * H
                 if head_axis is not None else 0)
        bh = ((b_off + jnp.arange(B))[:, None] * n_heads_total
              + (h_off + jnp.arange(H))[None, :])            # (B, H)

    perm = [(j, (j + 1) % n_chunks) for j in range(n_chunks)]

    def round_fn(carry, r):
        acc, m, l, k_cur, v_cur = carry
        # the chunk we hold in round r started on device (idx - r) mod N
        src = (idx - r) % n_chunks
        k_pos = src * Tc + jnp.arange(Tc)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k_cur) * sm_scale
        if bias is not None:
            tile = jax.lax.dynamic_slice(
                bias, (0, 0, src * Tc), (H, Tc, Tc))         # (H, Tc, Tc)
            s = s + tile[None].astype(s.dtype)
        mask = q_pos[:, None] >= k_pos[None, :]              # (Tc, Tc) global
        if window > 0:
            mask &= q_pos[:, None] - k_pos[None, :] < window
        if qstart is not None:
            # packed rows: keys BEFORE a query's document start belong to
            # earlier documents (contiguous packing: same-segment ∧ causal
            # ≡ k_pos >= start_q) — per-batch, so the mask gains a B axis
            mask = (mask[None] &
                    (k_pos[None, None, :] >= qstart[:, :, None]))  # (B,Tc,Tck)
            s = jnp.where(mask[:, None], s, _NEG_INF)
        else:
            s = jnp.where(mask[None, None], s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        if drop > 0.0:
            # normalizer l uses UNDROPPED probabilities (dropout acts on
            # softmax outputs); only the value accumulation is masked —
            # the flash kernel's exact recipe
            keep = _drop_keep(seed, bh[:, :, None, None],
                              q_pos[None, None, :, None].astype(jnp.int32),
                              k_pos[None, None, None, :].astype(jnp.int32),
                              drop)
            p = p * (keep.astype(jnp.float32) / (1.0 - drop))
        pv = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v_cur.dtype), v_cur)
        acc_new = acc * alpha.transpose(0, 2, 1, 3) + pv.astype(jnp.float32)
        # rotate K/V to the next device over the ICI ring
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (acc_new, m_new, l_new, k_nxt, v_nxt), None

    # constants start replicated; the scan carry becomes device-varying, so
    # mark them varying over the ring axis up front (shard_map VMA check)
    def vary(x):
        axes = tuple(vary_axes) or (axis_name,)
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(x, axes, to="varying")
        if hasattr(jax.lax, "pvary"):
            return jax.lax.pvary(x, axes)
        return x

    acc0 = vary(jnp.zeros((B, Tc, H, hd), jnp.float32))
    m0 = vary(jnp.full((B, H, Tc, 1), _NEG_INF, jnp.float32))
    l0 = vary(jnp.zeros((B, H, Tc, 1), jnp.float32))
    (acc, m, l, _, _), _ = jax.lax.scan(
        round_fn, (acc0, m0, l0, k, v), jnp.arange(n_rounds))
    if sink is not None:
        # the sink competes in every row's softmax and its mass is
        # discarded: only the normalizer changes, max-folded for stability
        sk = sink.astype(jnp.float32)[None, :, None, None]   # (1, H, 1, 1)
        m_tot = jnp.maximum(m, sk)
        scale = jnp.exp(m - m_tot)
        l = l * scale + jnp.exp(sk - m_tot)
        acc = acc * scale.transpose(0, 2, 1, 3)
    out = acc / l.transpose(0, 2, 1, 3)
    return out.astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, axis: str = "context",
                   batch_axis=None, head_axis=None, sm_scale=None,
                   window: int = 0, bias=None, sink=None,
                   dropout: float = 0.0, dropout_seed=None, q_start=None):
    """Causal ring attention over a context-sharded sequence.

    q/k/v: (B, T, H, hd) with T sharded over mesh axis ``axis`` (and the
    batch optionally sharded over ``batch_axis``, heads over ``head_axis``
    — the Megatron TP composition: each (batch, head) shard runs its own
    independent ring).  T must divide evenly into mesh.shape[axis] chunks.
    ``window`` > 0 bands the attention (query t sees keys (t-window, t])
    and truncates out-of-band ring rounds; ``bias`` is a batch-shared
    (H, T, T) or (1, H, T, T) additive logit bias (differentiable);
    ``sink`` is an (H,) per-head sink-logit vector (differentiable).
    Returns (B, T, H, hd), same shardings.
    Exact: equals the einsum oracle under the same mask/bias/sink;
    differential-tested in tests/test_ring_attention.py.
    """
    B, T, H, hd = q.shape
    n = mesh.shape[axis]
    if T % n:
        raise ValueError(f"seq_len {T} must divide the '{axis}' axis size {n}")
    if head_axis is not None and H % mesh.shape[head_axis]:
        raise ValueError(f"n_heads {H} must divide the '{head_axis}' axis "
                         f"size {mesh.shape[head_axis]}")
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(hd)
    Tc = T // n
    # banding truncates the ring: chunks further back than the band's reach
    # are masked for EVERY query row on every device
    n_rounds = n if window <= 0 else min(n, (window - 1) // Tc + 2)
    if bias is not None:
        if bias.ndim == 4:
            if bias.shape[0] != 1:
                raise ValueError(
                    "ring_attention bias must be batch-shared, got leading "
                    f"dim {bias.shape[0]}")
            bias = bias[0]
        if bias.shape != (H, T, T):
            raise ValueError(f"bias must be (H, T, T) = ({H}, {T}, {T}), "
                             f"got {bias.shape}")
    if sink is not None and sink.shape != (H,):
        raise ValueError(f"sink must be ({H},), got {sink.shape}")
    if q_start is not None and q_start.shape != (B, T):
        raise ValueError(f"q_start must be (B, T) = ({B}, {T}), "
                         f"got {q_start.shape}")
    seed = None
    if dropout > 0.0:
        if not 0.0 < dropout < 1.0:
            raise ValueError(f"dropout must lie in (0, 1), got {dropout}")
        if dropout_seed is None:
            raise ValueError("dropout > 0 needs dropout_seed=")
        seed = jnp.asarray(dropout_seed, jnp.int32)
    spec = P(batch_axis, axis, head_axis, None)
    bias_spec = P(head_axis, axis, None)       # query rows sharded, k full
    sink_spec = P(head_axis)
    vary_axes = tuple(a for a in (batch_axis, axis, head_axis)
                      if a is not None)
    f = shard_map(
        functools.partial(_ring_local, axis_name=axis, n_chunks=n,
                          n_rounds=n_rounds, sm_scale=sm_scale,
                          window=window, drop=float(dropout),
                          batch_axis=batch_axis, head_axis=head_axis,
                          n_heads_total=H, vary_axes=vary_axes),
        mesh=mesh,
        in_specs=(spec, spec, spec,
                  None if bias is None else bias_spec,
                  None if sink is None else sink_spec,
                  None if seed is None else P(),
                  None if q_start is None else P(batch_axis, axis)),
        out_specs=spec,
    )
    return f(q, k, v, bias, sink, seed,
             None if q_start is None
             else jnp.asarray(q_start, jnp.int32))
