"""Paged attention for TPU (pallas): single-token decode attention that
reads K/V directly from the shared block POOL, guided by each slot's block
table.

Beyond reference parity (the reference has no serving path at all) — this is
the hot op of :class:`serving.paged.PagedServingEngine`.  The portable XLA
formulation in nn/transformer.py gathers every slot's logical strip out of
the pool first (``pool[table]`` → a fresh (B, MB·bs, Hkv, hd) array) and
then runs the attention einsum over it, so each decode step writes the
gathered copy to HBM and reads it back: ~3× the pool bytes in HBM traffic,
on an op that is purely HBM-bound.  This kernel streams each (bs, hd) pool
block through VMEM exactly once per (slot, kv-head) with an online softmax
(running max m, normalizer l) — the gathered copy never exists.

Layout: grid (B, Hkv, MB), MB innermost.  The block table and the per-slot
offsets ride scalar prefetch (``pltpu.PrefetchScalarGridSpec``) so the K/V
BlockSpec index_maps can pick the POOL ROW to DMA per grid step — the
pallas "dynamic gather" idiom.  Logical blocks past a slot's offset repeat
the last active row's index, and consecutive equal indices skip the re-DMA,
so dead tail blocks of short sequences cost neither bandwidth nor compute
(their body is ``pl.when``-gated off).

Semantics match the gather path bit-for-bit in spirit and to float32
round-off in practice (differential-tested in tests/test_paged_attention.py,
interpret mode on CPU): positions 0..off inclusive are attendable (the
engine scatters this step's K/V BEFORE attention), ``window`` > 0 keeps only
(off−window, off], GQA query groups share their kv head, and int8-quantized
pools (kv_quant) dequantize per-vector inside the kernel from the same
(N, bs, Hkv) scale pools the scatter writes.

Opt-in from the transformer via ``TransformerLM(paged_attention=True)`` or
NNL_PAGED_ATTENTION=1 — same honesty contract as ops/flash_attention.py:
measured before defaulting (see PERF.md "Paged attention").
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _interpret():
    return jax.devices()[0].platform == "cpu"


def _kernel(tbl_ref, off_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
            acc_ref, m_ref, l_ref, *, block, sm_scale, window, quant):
    """One (slot b, kv head, logical block i) step of the online softmax.

    q_ref (1, 1, G, hd); k/v_ref (1, block, 1, hd) — the pool row the
    index_map chose; ks/vs_ref (1, block, 1) scale slices (quant only);
    scratch acc (G, hd) f32, m/l (G, 1) f32 persist across the MB-innermost
    grid axis and are reset at i == 0, finalized into o_ref at the last
    block.
    """
    b = pl.program_id(0)
    i = pl.program_id(2)
    nb = pl.num_programs(2)
    G, hd = q_ref.shape[2], q_ref.shape[3]
    off = off_ref[b]

    @pl.when(i == 0)
    def _reset():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # blocks wholly past the offset carry no attendable position
    @pl.when(i * block <= off)
    def _step():
        q = q_ref[0, 0] * sm_scale                              # (G, hd)
        k = k_ref[0, :, 0, :]                                   # (bs, hd)
        v = v_ref[0, :, 0, :]
        if quant:
            k = k.astype(jnp.float32) * ks_ref[0, :, 0][:, None]
            v = v.astype(jnp.float32) * vs_ref[0, :, 0][:, None]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        pos = i * block + jax.lax.broadcasted_iota(jnp.int32, (G, block), 1)
        keep = pos <= off                                       # inclusive
        if window > 0:
            keep &= pos > off - window
        s = jnp.where(keep, s, _NEG_INF)
        m_new = jnp.maximum(m_ref[...], jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)                                  # (G, bs)
        alpha = jnp.exp(m_ref[...] - m_new)
        l_ref[...] = alpha * l_ref[...] + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = m_new

    @pl.when(i == nb - 1)
    def _finalize():
        o_ref[0, 0] = (acc_ref[...]
                       / jnp.maximum(l_ref[...], 1e-30)).astype(o_ref.dtype)


def paged_attention(q, pool_k, pool_v, block_table, offsets, *,
                    sm_scale=None, window: int = 0,
                    pool_k_scale=None, pool_v_scale=None):
    """Single-step decode attention over a paged KV pool.

    q: (B, H, hd) — this step's queries (one token per slot).
    pool_k/pool_v: (N, bs, Hkv, hd) shared pools (float, or int8 with the
    scale pools given); block_table: (B, MB) int32 pool-row indices per
    logical block; offsets: (B,) int32 — THIS token's position (its K/V
    must already be scattered at it).  window > 0 bands to (off−window,
    off].  pool_*_scale: (N, bs, Hkv) float32 for int8 pools.

    Returns (B, H, hd) in q.dtype.  Matches the gather-then-einsum path to
    float32 round-off.
    """
    B, H, hd = q.shape
    N, bs, Hkv, _ = pool_k.shape
    MB = block_table.shape[1]
    if H % Hkv:
        raise ValueError(f"H {H} must be a multiple of Hkv {Hkv}")
    G = H // Hkv
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(hd)
    quant = pool_k.dtype == jnp.int8
    if quant and (pool_k_scale is None or pool_v_scale is None):
        raise ValueError("int8 pools need pool_k_scale/pool_v_scale")

    table = jnp.asarray(block_table, jnp.int32)
    off = jnp.asarray(offsets, jnp.int32)
    if off.ndim == 0:
        off = jnp.full((B,), off)
    # logical blocks past a slot's offset re-point at its LAST ACTIVE row:
    # consecutive identical indices skip the DMA, so dead tails are free
    active = off // bs                                          # (B,)
    idx = jnp.minimum(jnp.arange(MB)[None, :], active[:, None])
    safe_table = jnp.take_along_axis(table, idx, axis=1)        # (B, MB)

    qg = q.reshape(B, Hkv, G, hd)

    def q_map(b, h, i, tbl, off_):
        return (b, h, 0, 0)

    def kv_map(b, h, i, tbl, off_):
        return (tbl[b, i], 0, h, 0)

    def sc_map(b, h, i, tbl, off_):
        return (tbl[b, i], 0, h)

    def o_map(b, h, i, tbl, off_):
        return (b, h, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, G, hd), q_map),
        pl.BlockSpec((1, bs, 1, hd), kv_map),
        pl.BlockSpec((1, bs, 1, hd), kv_map),
    ]
    args = [qg, pool_k, pool_v]
    if quant:
        in_specs += [pl.BlockSpec((1, bs, 1), sc_map),
                     pl.BlockSpec((1, bs, 1), sc_map)]
        args += [pool_k_scale, pool_v_scale]
    else:
        # keep the kernel arity fixed: dummy (1,1,1) zero scales, never read
        zero = jnp.zeros((1, 1, 1), jnp.float32)
        in_specs += [pl.BlockSpec((1, 1, 1), lambda b, h, i, t, o: (0, 0, 0)),
                     pl.BlockSpec((1, 1, 1), lambda b, h, i, t, o: (0, 0, 0))]
        args += [zero, zero]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv, MB),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, G, hd), o_map),
        scratch_shapes=[
            pltpu.VMEM((G, hd), jnp.float32),
            pltpu.VMEM((G, 1), jnp.float32),
            pltpu.VMEM((G, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block=bs, sm_scale=sm_scale,
                          window=int(window), quant=quant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, hd), q.dtype),
        interpret=_interpret(),
    )(safe_table, off, *args)
    return out.reshape(B, H, hd)


def reference_paged_attention(q, pool_k, pool_v, block_table, offsets, *,
                              sm_scale=None, window: int = 0,
                              pool_k_scale=None, pool_v_scale=None):
    """The gather-then-einsum formulation (materializes every slot's strip)
    — differential oracle, mirroring nn/transformer.py's paged branch."""
    B, H, hd = q.shape
    N, bs, Hkv, _ = pool_k.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(hd)
    G = H // Hkv
    table = jnp.asarray(block_table, jnp.int32)
    off = jnp.asarray(offsets, jnp.int32)
    MB = table.shape[1]
    Mp = MB * bs
    if pool_k.dtype == jnp.int8:
        kf = (pool_k[table].reshape(B, Mp, Hkv, hd).astype(jnp.float32)
              * pool_k_scale[table].reshape(B, Mp, Hkv)[..., None])
        vf = (pool_v[table].reshape(B, Mp, Hkv, hd).astype(jnp.float32)
              * pool_v_scale[table].reshape(B, Mp, Hkv)[..., None])
        kf, vf = kf.astype(q.dtype), vf.astype(q.dtype)
    else:
        kf = pool_k[table].reshape(B, Mp, Hkv, hd)
        vf = pool_v[table].reshape(B, Mp, Hkv, hd)
    kf = jnp.repeat(kf, G, axis=2)
    vf = jnp.repeat(vf, G, axis=2)
    att = jnp.einsum("bhd,bkhd->bhk", q, kf) * sm_scale
    mask = jnp.arange(Mp)[None, None, :] <= off[:, None, None]
    if window > 0:
        mask &= jnp.arange(Mp)[None, None, :] > (off[:, None, None] - window)
    att = jnp.where(mask, att, _NEG_INF)
    att = jax.nn.softmax(att, axis=-1)
    return jnp.einsum("bhk,bkhd->bhd", att, vf).astype(q.dtype)
