"""Pallas LSTM scan kernel vs the lax.scan reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def reference_lstm(xp, w_hh, h0, c0):
    """The WeightDropLSTM scan body (applications/text.py) in plain jnp."""
    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + h @ w_hh
        i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
        i_g = jax.nn.sigmoid(i_g)
        f_g = jax.nn.sigmoid(f_g)
        g_g = jnp.tanh(g_g)
        o_g = jax.nn.sigmoid(o_g)
        c = f_g * c + i_g * g_g
        h = o_g * jnp.tanh(c)
        return (h, c), h

    (hT, cT), ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(xp, 0, 1))
    return jnp.swapaxes(ys, 0, 1), hT, cT


def _random_case(B=4, T=6, H=16, seed=0):
    rng = np.random.default_rng(seed)
    xp = jnp.asarray(rng.normal(0, 0.5, (B, T, 4 * H)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (H, 4 * H)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(0, 0.3, (B, H)).astype(np.float32))
    c0 = jnp.asarray(rng.normal(0, 0.3, (B, H)).astype(np.float32))
    return xp, w, h0, c0


def test_forward_matches_reference():
    from neuralnetworklibrary_tpu.ops.pallas_lstm import lstm_scan

    xp, w, h0, c0 = _random_case()
    ys_r, hT_r, cT_r = reference_lstm(xp, w, h0, c0)
    ys_p, hT_p, cT_p = lstm_scan(xp, w, h0, c0, True)
    # bf16 matmuls inside the kernel → loose-ish tolerance
    np.testing.assert_allclose(ys_p, ys_r, atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(hT_p, hT_r, atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(cT_p, cT_r, atol=3e-2, rtol=2e-2)


def test_forward_carry_chains():
    """Splitting a sequence in two with carried (h, c) equals one long scan."""
    from neuralnetworklibrary_tpu.ops.pallas_lstm import lstm_scan

    xp, w, h0, c0 = _random_case(T=8, seed=1)
    ys_full, hT, cT = lstm_scan(xp, w, h0, c0, True)
    ys_a, h_a, c_a = lstm_scan(xp[:, :4], w, h0, c0, True)
    ys_b, h_b, c_b = lstm_scan(xp[:, 4:], w, h_a, c_a, True)
    np.testing.assert_allclose(np.concatenate([ys_a, ys_b], 1), ys_full,
                               atol=3e-2, rtol=3e-2)


def test_gradients_match_reference():
    from neuralnetworklibrary_tpu.ops.pallas_lstm import lstm_scan

    xp, w, h0, c0 = _random_case(B=3, T=5, H=8, seed=2)

    def loss_ref(xp, w, h0, c0):
        ys, hT, cT = reference_lstm(xp, w, h0, c0)
        return jnp.sum(ys * jnp.cos(ys)) + jnp.sum(hT) + 0.5 * jnp.sum(cT)

    def loss_pal(xp, w, h0, c0):
        ys, hT, cT = lstm_scan(xp, w, h0, c0, True)
        return jnp.sum(ys * jnp.cos(ys)) + jnp.sum(hT) + 0.5 * jnp.sum(cT)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xp, w, h0, c0)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(xp, w, h0, c0)
    for a, b, name in zip(g_pal, g_ref, ["dxp", "dw", "dh0", "dc0"]):
        np.testing.assert_allclose(a, b, atol=5e-2, rtol=5e-2, err_msg=name)


def test_batch_padding_path():
    """B not a multiple of 8 exercises the batch-padding branch."""
    from neuralnetworklibrary_tpu.ops.pallas_lstm import lstm_scan

    xp, w, h0, c0 = _random_case(B=3, T=4, H=8, seed=3)
    ys_r, hT_r, _ = reference_lstm(xp, w, h0, c0)
    ys_p, hT_p, _ = lstm_scan(xp, w, h0, c0, True)
    np.testing.assert_allclose(ys_p, ys_r, atol=2e-2, rtol=2e-2)
