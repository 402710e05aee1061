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

_NEG_INF = -1e30


def _ring_local(q, k, v, *, axis_name: str, n_chunks: int, sm_scale: float,
                vary_axes=()):
    """Per-device body (runs under shard_map).  q/k/v: (B, Tc, H, hd)."""
    B, Tc, H, hd = q.shape
    idx = jax.lax.axis_index(axis_name)
    q_pos = idx * Tc + jnp.arange(Tc)                        # global positions

    perm = [(j, (j + 1) % n_chunks) for j in range(n_chunks)]

    def round_fn(carry, r):
        acc, m, l, k_cur, v_cur = carry
        # the chunk we hold in round r started on device (idx - r) mod N
        src = (idx - r) % n_chunks
        k_pos = src * Tc + jnp.arange(Tc)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k_cur) * sm_scale
        mask = q_pos[:, None] >= k_pos[None, :]              # (Tc, Tc) global
        s = jnp.where(mask[None, None], s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
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
        round_fn, (acc0, m0, l0, k, v), jnp.arange(n_chunks))
    out = acc / l.transpose(0, 2, 1, 3)
    return out.astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, axis: str = "context",
                   batch_axis=None, head_axis=None, sm_scale=None):
    """Causal ring attention over a context-sharded sequence.

    q/k/v: (B, T, H, hd) with T sharded over mesh axis ``axis`` (and the
    batch optionally sharded over ``batch_axis``, heads over ``head_axis``
    — the Megatron TP composition: each (batch, head) shard runs its own
    independent ring).  T must divide evenly into mesh.shape[axis] chunks.
    Returns (B, T, H, hd), same shardings.
    Exact: equals softmax(QKᵀ·scale)V with the causal mask; differentiable.
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
    spec = P(batch_axis, axis, head_axis, None)
    vary_axes = tuple(a for a in (batch_axis, axis, head_axis)
                      if a is not None)
    f = shard_map(
        functools.partial(_ring_local, axis_name=axis, n_chunks=n,
                          sm_scale=sm_scale, vary_axes=vary_axes),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    return f(q, k, v)
