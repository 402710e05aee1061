"""Paged attention for TPU (pallas): single-token decode attention that
reads K/V directly from the shared block POOL, guided by each slot's block
table.

Beyond reference parity (the reference has no serving path at all) — this is
the hot op of :class:`serving.paged.PagedServingEngine`.  The portable XLA
formulation in nn/transformer.py gathers every slot's logical strip out of
the pool first (``pool[table]`` → a fresh (B, MB·bs, Hkv, hd) array) and
then runs the attention einsum over it, so each decode step writes the
gathered copy to HBM and reads it back: ~3× the pool bytes in HBM traffic,
on an op that is purely HBM-bound.  This kernel streams each (bs, Hkv, hd)
pool block through VMEM exactly once per slot with an online softmax
(running max m, normalizer l) — the gathered copy never exists.

Design:

- grid (B, MB), MB innermost.  The block table and per-slot offsets ride
  scalar prefetch (``pltpu.PrefetchScalarGridSpec``) so the K/V BlockSpec
  index_maps pick the POOL ROW to DMA per grid step — the pallas "dynamic
  gather" idiom.  Logical blocks past a slot's offset repeat the last
  active row's index; consecutive equal indices skip the re-DMA, so dead
  tails of short sequences cost neither bandwidth nor compute (their body
  is ``pl.when``-gated off).
- VIRTUAL KEYS: a block's (bs, Hkv, hd) entries flatten to bs·Hkv rows and
  score against ALL H query heads in ONE MXU dot; a head-match mask
  (lane % Hkv == head // G) kills the wrong-head pairs before the online
  softmax, and the masked probabilities drive one (H, bs·Hkv)×(bs·Hkv, hd)
  output dot.  GQA/MHA thus cost two real MXU ops per block instead of
  Hkv skinny ones, and no lane reshapes are needed.

Semantics match the gather path (differential-tested in
tests/test_paged_attention.py, interpret mode on CPU — float32-exact
there; on the MXU both paths round bf16-wise and agree to ~1e-3 like any
two XLA attention formulations): positions 0..off inclusive are attendable
(the engine scatters this step's K/V BEFORE attention), ``window`` > 0
keeps only (off−window, off], and int8-quantized pools (kv_quant)
dequantize inside the kernel — k-scales fold into the scores, v-scales
into the probabilities, both as (1, bs·Hkv) lane vectors.

Measured on v5e (bf16, pools sized B·MB+1, offsets uniform in the upper
half of context — see PERF.md "Paged attention"): wins 1.2–2.2× over the
gather path at block ≥ 64 tokens and at hd 128, roughly break-even at the
32-token default block with hd 64 (32 KB DMAs under-fill the memory
pipeline).  Serve kernel-enabled models with ``paged_kv_block=64``.

Opt-in from the transformer via ``TransformerLM(paged_attention=True)`` or
NNL_PAGED_ATTENTION=1 — same honesty contract as ops/flash_attention.py:
measure before defaulting.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _interpret():
    return jax.devices()[0].platform == "cpu"


def _kernel(tbl_ref, off_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
            sink_ref, o_ref, acc_ref, m_ref, l_ref, *, block, G, sm_scale,
            window, quant, has_sink):
    """One (slot b, logical block i) step of the online softmax.

    q_ref (1, H, hd); k/v_ref (1, block, Hkv, hd) — the pool row the
    index_map chose; ks/vs_ref (1, block·Hkv) flattened scale rows (quant
    only).  Scratch acc (H, hd) f32 and m/l (H, 1) f32 persist across the
    MB-innermost grid axis: reset at i == 0, finalized into o_ref at the
    last block.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    H, hd = q_ref.shape[1], q_ref.shape[2]
    Hkv = H // G
    BK = block * Hkv                          # virtual keys per block
    off = off_ref[b]

    @pl.when(i == 0)
    def _reset():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # blocks wholly past the offset carry no attendable position
    @pl.when(i * block <= off)
    def _step():
        q = q_ref[0] * sm_scale                              # (H, hd)
        if quant:
            # cast BEFORE the reshape: Mosaic's shape-cast inference does
            # not handle int8 sublane merges (f32 ones it does)
            k2 = k_ref[0].astype(jnp.float32).reshape(BK, hd)
            v2 = v_ref[0].astype(jnp.float32).reshape(BK, hd)
            q = q.astype(jnp.float32)
        else:
            k2 = k_ref[0].reshape(BK, hd)                    # sublane merge
            v2 = v_ref[0].reshape(BK, hd)
        s = jax.lax.dot_general(q, k2, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if quant:                                            # (1, BK) k-scales
            s = s * ks_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (H, BK), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (H, BK), 0)
        pos = i * block + lane // Hkv
        keep = (lane % Hkv == row // G) & (pos <= off)       # head-match
        if window > 0:
            keep &= pos > off - window
        s = jnp.where(keep, s, _NEG_INF)
        m_old = m_ref[...]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)                               # (H, BK)
        alpha = jnp.exp(m_old - m_new)
        l_ref[...] = alpha * l_ref[...] + jnp.sum(p, axis=1, keepdims=True)
        if quant:                                            # (1, BK) v-scales
            p = p * vs_ref[0]
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v2.dtype), v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = m_new

    @pl.when(i == nb - 1)
    def _finalize():
        acc = acc_ref[...]
        m = m_ref[...]
        l = l_ref[...]
        if has_sink:
            # GPT-OSS sinks: the per-head sink logit joins the normalizer
            # only (its mass is discarded from the numerator) — max-folded
            sk = sink_ref[...]                               # (H, 1)
            m_tot = jnp.maximum(m, sk)
            sc = jnp.exp(m - m_tot)
            l = l * sc + jnp.exp(sk - m_tot)
            acc = acc * sc
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def paged_attention(q, pool_k, pool_v, block_table, offsets, *,
                    sm_scale=None, window: int = 0,
                    pool_k_scale=None, pool_v_scale=None, sink=None):
    """Single-step decode attention over a paged KV pool.

    q: (B, H, hd) — this step's queries (one token per slot).
    pool_k/pool_v: (N, bs, Hkv, hd) shared pools (float, or int8 with the
    scale pools given); block_table: (B, MB) int32 pool-row indices per
    logical block; offsets: (B,) int32 — THIS token's position (its K/V
    must already be scattered at it).  window > 0 bands to (off−window,
    off].  pool_*_scale: (N, bs, Hkv) float32 for int8 pools.

    Returns (B, H, hd) in q.dtype.  Matches the gather-then-einsum path
    (float32-exact in interpret mode; MXU-round-off apart on chip).
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
    active = off // bs
    idx = jnp.minimum(jnp.arange(MB)[None, :], active[:, None])
    safe_table = jnp.take_along_axis(table, idx, axis=1)        # (B, MB)

    def q_map(b, i, tbl, off_):
        return (b, 0, 0)

    def kv_map(b, i, tbl, off_):
        return (tbl[b, i], 0, 0, 0)

    def sc_map(b, i, tbl, off_):
        return (tbl[b, i], 0, 0)

    in_specs = [
        pl.BlockSpec((1, H, hd), q_map),
        pl.BlockSpec((1, bs, Hkv, hd), kv_map),
        pl.BlockSpec((1, bs, Hkv, hd), kv_map),
    ]
    args = [q, pool_k, pool_v]
    if quant:
        # (N, bs, Hkv) → (N, 1, bs·Hkv): minor-dims merge, layout-free; a
        # block is one (1, BK) lane vector and its last two dims EQUAL the
        # array dims (the Mosaic block-mapping rule)
        in_specs += [pl.BlockSpec((1, 1, bs * Hkv), sc_map),
                     pl.BlockSpec((1, 1, bs * Hkv), sc_map)]
        args += [pool_k_scale.reshape(N, 1, bs * Hkv),
                 pool_v_scale.reshape(N, 1, bs * Hkv)]
    else:
        # keep the kernel arity fixed: dummy zero scales, never read
        zero = jnp.zeros((1, 1, 1), jnp.float32)
        in_specs += [
            pl.BlockSpec((1, 1, 1), lambda b, i, t, o: (0, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda b, i, t, o: (0, 0, 0))]
        args += [zero, zero]
    if sink is not None:
        # full-array (H, 1) block (Mosaic's (8,128)-or-full rule)
        in_specs.append(pl.BlockSpec((H, 1), lambda b, i, t, o: (0, 0)))
        args.append(jnp.asarray(sink, jnp.float32).reshape(H, 1))
    else:
        in_specs.append(pl.BlockSpec((1, 1), lambda b, i, t, o: (0, 0)))
        args.append(jnp.zeros((1, 1), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, MB),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, hd), q_map),
        scratch_shapes=[
            pltpu.VMEM((H, hd), jnp.float32),
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, block=bs, G=G, sm_scale=sm_scale,
                          window=int(window), quant=quant,
                          has_sink=sink is not None),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, hd), q.dtype),
        interpret=_interpret(),
    )(safe_table, off, *args)


def reference_paged_attention(q, pool_k, pool_v, block_table, offsets, *,
                              sm_scale=None, window: int = 0,
                              pool_k_scale=None, pool_v_scale=None,
                              sink=None):
    """The gather-then-einsum formulation (materializes every slot's strip)
    — differential oracle, mirroring nn/transformer.py's paged branch."""
    B, H, hd = q.shape
    N, bs, Hkv, _ = pool_k.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(hd)
    G = H // Hkv
    table = jnp.asarray(block_table, jnp.int32)
    off = jnp.asarray(offsets, jnp.int32)
    if off.ndim == 0:
        off = jnp.full((B,), off)
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
    if sink is not None:
        sc = jnp.broadcast_to(
            jnp.asarray(sink, att.dtype)[None, :, None], (B, H, 1))
        att = jax.nn.softmax(jnp.concatenate([att, sc], -1),
                             axis=-1)[..., :-1]
    else:
        att = jax.nn.softmax(att, axis=-1)
    return jnp.einsum("bhk,bkhd->bhd", att, vf).astype(q.dtype)
