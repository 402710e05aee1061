"""Pallas TPU kernel: weight-resident LSTM scan.

The AWD-LSTM hot loop (Text.py:477-513 → applications.text.WeightDropLSTM)
is a ``lax.scan`` whose per-step recurrent matmul re-streams ``w_hh``
(1150×4600 f32 ≈ 21 MB) from HBM every timestep: 75 steps × 3 layers ≈ 4.7 GB
of HBM traffic per forward — the measured bottleneck (the whole forward is
~6.8 ms at ~800 GB/s, i.e. bandwidth-bound, while the MXU math is <1 ms).

This kernel runs the scan as a T-step Pallas grid with ``w_hh`` (bf16) pinned
in VMEM for the WHOLE sequence; per-step inputs/outputs stream through the
automatic block pipeline.  The backward pass is a second kernel holding
``w_hhᵀ`` resident and emitting per-step gate gradients; the weight gradient
then reduces to ONE big XLA matmul over all timesteps (no per-step accumulator
in scarce VMEM).

Numerics: matmuls run bf16×bf16→f32 on the MXU; the (h, c) carry stays f32 in
VMEM.  Residuals (gates, c sequence) are stored bf16 — standard mixed
precision for recurrent training.

Use :func:`lstm_scan` — it pads (H → multiple of 128, per gate block), calls
the kernels, and exposes a custom VJP.  ``interpret=True`` runs on CPU for
tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _split4(a):
    H = a.shape[-1] // 4
    return a[..., :H], a[..., H:2 * H], a[..., 2 * H:3 * H], a[..., 3 * H:]


# ---------------------------------------------------------------------------
# forward kernel: grid=(T,), carry in VMEM scratch, w resident
# ---------------------------------------------------------------------------

def _make_fwd_kernel(K: int):
    """K timesteps per grid step (unrolled) — amortizes the per-grid-step
    pipeline overhead that dominates at 1 step/iteration."""

    def _fwd_kernel(w_ref, xp_ref, h0_ref, c0_ref,
                    ys_ref, cs_ref, gates_ref, hT_ref, cT_ref,
                    h_scr, c_scr):
        t = pl.program_id(0)
        nT = pl.num_programs(0)

        @pl.when(t == 0)
        def _():
            h_scr[:] = h0_ref[:]
            c_scr[:] = c0_ref[:]

        h = h_scr[:]
        c = c_scr[:]
        for k in range(K):
            xp_t = xp_ref[k].astype(jnp.float32)
            gates = xp_t + jnp.dot(h.astype(jnp.bfloat16), w_ref[:],
                                   preferred_element_type=jnp.float32)
            i_g, f_g, g_g, o_g = _split4(gates)
            i_g = jax.nn.sigmoid(i_g)
            f_g = jax.nn.sigmoid(f_g)
            g_g = jnp.tanh(g_g)
            o_g = jax.nn.sigmoid(o_g)
            c = f_g * c + i_g * g_g
            h = o_g * jnp.tanh(c)
            ys_ref[k] = h.astype(ys_ref.dtype)
            cs_ref[k] = c.astype(cs_ref.dtype)
            gates_ref[k] = jnp.concatenate([i_g, f_g, g_g, o_g],
                                           axis=-1).astype(gates_ref.dtype)
        h_scr[:] = h
        c_scr[:] = c

        @pl.when(t == nT - 1)
        def _():
            hT_ref[:] = h
            cT_ref[:] = c

    return _fwd_kernel


def _chunk(T: int, max_k: int = 16) -> int:
    """Largest divisor of T that is ≤ max_k (1 always divides)."""
    for k in range(max_k, 0, -1):
        if T % k == 0:
            return k
    return 1


def _fwd_call(xp, w, h0, c0, interpret=False):
    """xp (T,B,4Hp) time-major, w (Hp,4Hp) bf16, h0/c0 (B,Hp) f32."""
    T, B, G = xp.shape
    Hp = w.shape[0]
    K = _chunk(T)
    grid = (T // K,)
    # time-major blocks: (K, B, G) keeps the tiled (last two) dims aligned
    step_spec = lambda g: pl.BlockSpec((K, B, g), lambda t: (t, 0, 0),
                                       memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda t: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_fwd_kernel(K),
        grid=grid,
        in_specs=[const((Hp, G)), step_spec(G), const((B, Hp)), const((B, Hp))],
        out_specs=(step_spec(Hp), step_spec(Hp), step_spec(G),
                   const((B, Hp)), const((B, Hp))),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, Hp), jnp.bfloat16),   # ys
            jax.ShapeDtypeStruct((T, B, Hp), jnp.bfloat16),   # cs
            jax.ShapeDtypeStruct((T, B, G), jnp.bfloat16),    # gates (post-act)
            jax.ShapeDtypeStruct((B, Hp), jnp.float32),       # hT
            jax.ShapeDtypeStruct((B, Hp), jnp.float32),       # cT
        ),
        scratch_shapes=[
            pltpu.VMEM((B, Hp), jnp.float32),
            pltpu.VMEM((B, Hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(w, xp, h0, c0)


# ---------------------------------------------------------------------------
# backward kernel: reverse grid, wᵀ resident, emits per-step dgates
# ---------------------------------------------------------------------------

def _make_bwd_kernel(K: int):
    def _bwd_kernel(wT_ref, gates_ref, cs_ref, cprev_ref, dys_ref,
                    dhT_ref, dcT_ref,
                    dgates_ref, dh0_ref, dc0_ref,
                    dh_scr, dc_scr):
        t = pl.program_id(0)  # blocks are indexed REVERSED (latest first)
        nT = pl.num_programs(0)

        @pl.when(t == 0)
        def _():
            dh_scr[:] = dhT_ref[:]
            dc_scr[:] = dcT_ref[:]

        dh_carry = dh_scr[:]
        dc = dc_scr[:]
        for k in reversed(range(K)):
            i_g, f_g, g_g, o_g = _split4(gates_ref[k].astype(jnp.float32))
            c_t = cs_ref[k].astype(jnp.float32)
            # c_{t-1}: the wrapper pre-builds the shifted sequence [c0, cs[:-1]]
            c_prev = cprev_ref[k].astype(jnp.float32)

            dh = dys_ref[k].astype(jnp.float32) + dh_carry
            tanh_c = jnp.tanh(c_t)
            do = dh * tanh_c
            dc = dc + dh * o_g * (1.0 - tanh_c * tanh_c)
            di = dc * g_g
            dg = dc * i_g
            df = dc * c_prev

            dgates = jnp.concatenate([
                di * i_g * (1.0 - i_g),
                df * f_g * (1.0 - f_g),
                dg * (1.0 - g_g * g_g),
                do * o_g * (1.0 - o_g),
            ], axis=-1)
            dgates_ref[k] = dgates.astype(dgates_ref.dtype)

            dh_carry = jnp.dot(dgates.astype(jnp.bfloat16), wT_ref[:],
                               preferred_element_type=jnp.float32)
            dc = dc * f_g
        dh_scr[:] = dh_carry
        dc_scr[:] = dc

        @pl.when(t == nT - 1)
        def _():
            dh0_ref[:] = dh_carry
            dc0_ref[:] = dc

    return _bwd_kernel


def _bwd_call(wT, gates, cs, cprev, dys, dhT, dcT, interpret=False):
    T, B, G = gates.shape
    Hp = wT.shape[1]
    K = _chunk(T)
    nT = T // K
    rev = lambda g: pl.BlockSpec((K, B, g), lambda t: (nT - 1 - t, 0, 0),
                                 memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda t: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_bwd_kernel(K),
        grid=(nT,),
        in_specs=[const((G, Hp)), rev(G), rev(Hp), rev(Hp), rev(Hp),
                  const((B, Hp)), const((B, Hp))],
        out_specs=(rev(G), const((B, Hp)), const((B, Hp))),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, G), jnp.float32),  # dgates
            jax.ShapeDtypeStruct((B, Hp), jnp.float32),    # dh0
            jax.ShapeDtypeStruct((B, Hp), jnp.float32),    # dc0
        ),
        scratch_shapes=[
            pltpu.VMEM((B, Hp), jnp.float32),
            pltpu.VMEM((B, Hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wT, gates, cs, cprev, dys, dhT, dcT)


# ---------------------------------------------------------------------------
# public entry: padding + custom VJP
# ---------------------------------------------------------------------------

def _pad_gates_cols(a, H, Hp):
    """Pad the last (4H) axis per gate block → 4Hp."""
    *lead, G = a.shape
    a = a.reshape(*lead, 4, H)
    a = jnp.pad(a, [(0, 0)] * len(lead) + [(0, 0), (0, Hp - H)])
    return a.reshape(*lead, 4 * Hp)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def lstm_scan(xp, w_hh, h0, c0, interpret=False):
    """LSTM over time with VMEM-resident recurrent weights.

    xp (B, T, 4H): precomputed input projections + biases, gate order
    [i, f, g, o] (torch LSTM convention); w_hh (H, 4H); h0/c0 (B, H).
    Returns (ys (B, T, H) f32, hT (B, H), cT (B, H)).  Equivalent to the
    lax.scan in applications.text.WeightDropLSTM up to bf16 matmul precision.
    """
    ys, hT, cT, _res = _lstm_fwd_impl(xp, w_hh, h0, c0, interpret)
    return ys, hT, cT


def _lstm_fwd_impl(xp, w_hh, h0, c0, interpret):
    B, T, G = xp.shape
    H = G // 4
    Hp = _round_up(max(H, 128), 128)
    Bp = _round_up(max(B, 8), 8)

    xp_p = _pad_gates_cols(xp.astype(jnp.float32), H, Hp)
    w_p = _pad_gates_cols(jnp.pad(w_hh, ((0, Hp - H), (0, 0))), H, Hp)
    if Bp != B:
        xp_p = jnp.pad(xp_p, ((0, Bp - B), (0, 0), (0, 0)))
        h0 = jnp.pad(h0, ((0, Bp - B), (0, 0)))
        c0 = jnp.pad(c0, ((0, Bp - B), (0, 0)))
    h0_p = jnp.pad(h0.astype(jnp.float32), ((0, 0), (0, Hp - H)))
    c0_p = jnp.pad(c0.astype(jnp.float32), ((0, 0), (0, Hp - H)))

    ys, cs, gates, hT, cT = _fwd_call(
        jnp.swapaxes(xp_p, 0, 1).astype(jnp.bfloat16),  # time-major (T, B, G)
        w_p.astype(jnp.bfloat16), h0_p, c0_p, interpret=interpret)
    res = (gates, cs, h0_p, c0_p, w_p, ys)  # residuals stay time-major
    out_ys = jnp.swapaxes(ys, 0, 1)[:B, :, :H].astype(xp.dtype)
    return out_ys, hT[:B, :H].astype(xp.dtype), cT[:B, :H].astype(xp.dtype), res


def _lstm_fwd_rule(xp, w_hh, h0, c0, interpret):
    ys, hT, cT, res = _lstm_fwd_impl(xp, w_hh, h0, c0, interpret)
    return (ys, hT, cT), res


def _lstm_bwd_rule(interpret, saved, grads):
    gates, cs, h0_p, c0_p, w_p, ys_p = saved
    dys, dhT, dcT = grads
    # static shapes/dtype recovered from the cotangents (dys is (B, T, H) in
    # the caller's dtype)
    B, T, H = dys.shape
    dtype = dys.dtype
    _, Bp, Gp = gates.shape
    Hp = Gp // 4

    dys_p = jnp.zeros((T, Bp, Hp), jnp.float32)
    dys_p = dys_p.at[:, :B, :H].set(jnp.swapaxes(dys.astype(jnp.float32), 0, 1))
    dhT_p = jnp.zeros((Bp, Hp), jnp.float32).at[:B, :H].set(dhT.astype(jnp.float32))
    dcT_p = jnp.zeros((Bp, Hp), jnp.float32).at[:B, :H].set(dcT.astype(jnp.float32))

    # c_{t-1} sequence (time-major): [c0, cs[:-1]]
    cprev = jnp.concatenate([c0_p[None].astype(cs.dtype), cs[:-1]], axis=0)
    wT = jnp.swapaxes(w_p, 0, 1).astype(jnp.bfloat16)

    dgates, dh0, dc0 = _bwd_call(wT, gates, cs, cprev, dys_p, dhT_p, dcT_p,
                                 interpret=interpret)

    # weight grad as ONE matmul over (T·B): dW[h, k] = Σ h_prev · dgates
    hprev = jnp.concatenate([h0_p[None].astype(ys_p.dtype), ys_p[:-1]], axis=0)
    dw_p = jnp.einsum("tbh,tbk->hk", hprev.astype(jnp.float32), dgates)

    # unpad (dgates is (T, Bp, Gp) time-major)
    dxp = jnp.swapaxes(dgates[:, :B], 0, 1).reshape(B, T, 4, Hp)[..., :H].reshape(
        B, T, 4 * H).astype(dtype)
    dw = dw_p.reshape(Hp, 4, Hp)[:H, :, :H].reshape(H, 4 * H).astype(dtype)
    dh0_o = dh0[:B, :H].astype(dtype)
    dc0_o = dc0[:B, :H].astype(dtype)
    return dxp, dw, dh0_o, dc0_o


lstm_scan.defvjp(_lstm_fwd_rule, _lstm_bwd_rule)


def pallas_lstm_available() -> bool:
    """True when the TPU backend is active AND the kernel is opted in
    (NNL_PALLAS_LSTM=1).

    Off by default: honest synced benchmarks (value-fetch barriers — see
    utils.profiling.sync) show the lax.scan path is ~15% FASTER inside the
    full jitted train step on v5e (XLA already keeps the scan-invariant
    w_hh in the chip's large VMEM), so the kernel currently serves as
    infrastructure for future tuning rather than a default win.
    """
    import os

    if os.environ.get("NNL_PALLAS_LSTM", "") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
