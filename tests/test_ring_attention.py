"""Ring attention (context parallelism): exact vs the einsum oracle on the
8-device CPU mesh — forward, gradients, dp×cp composition, bf16."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.ops.flash_attention import reference_attention
from neuralnetworklibrary_tpu.parallel.mesh import get_mesh, get_mesh_2d
from neuralnetworklibrary_tpu.parallel.ring_attention import ring_attention


def _qkv(B, T, H, hd, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.normal(0, 1, (B, T, H, hd)), dtype)
                 for _ in range(3))


def test_matches_reference_cp8():
    mesh = get_mesh(8, axis_names=("context",))
    q, k, v = _qkv(2, 128, 2, 16)
    out = ring_attention(q, k, v, mesh)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    mesh = get_mesh(8, axis_names=("context",))
    q, k, v = _qkv(1, 64, 2, 8, seed=1)

    def loss(fn, *extra):
        return lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v, *extra)))

    g_ring = jax.grad(loss(ring_attention, mesh), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(reference_attention), argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_ring, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=f"d{name} diverges (the reverse ring is wrong)")


def test_dp_cp_composition():
    """(data=2, context=4): batch sharded over 'data', sequence over
    'context' — same numerics as the unsharded oracle."""
    mesh = get_mesh_2d(2, 4, axis_names=("data", "context"))
    q, k, v = _qkv(4, 64, 2, 16, seed=2)
    out = ring_attention(q, k, v, mesh, axis="context", batch_axis="data")
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bf16():
    mesh = get_mesh(4, axis_names=("context",))
    q, k, v = _qkv(1, 64, 2, 16, seed=3, dtype=jnp.bfloat16)
    out = ring_attention(q, k, v, mesh)
    assert out.dtype == jnp.bfloat16
    ref = reference_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                              v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_tp_composition_head_axis():
    """(context=4, model=2): sequence over 'context', heads over 'model'
    (the Megatron TP composition) — same numerics as the unsharded oracle."""
    mesh = get_mesh_2d(4, 2, axis_names=("context", "model"))
    q, k, v = _qkv(2, 64, 4, 16, seed=5)
    out = ring_attention(q, k, v, mesh, axis="context", head_axis="model")
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_rejects_indivisible_heads():
    mesh = get_mesh_2d(2, 4, axis_names=("context", "model"))
    q, k, v = _qkv(1, 64, 2, 8)   # 2 heads can't split over model=4
    with pytest.raises(ValueError, match="n_heads"):
        ring_attention(q, k, v, mesh, axis="context", head_axis="model")


def test_rejects_indivisible():
    mesh = get_mesh(8, axis_names=("context",))
    q, k, v = _qkv(1, 100, 2, 8)
    with pytest.raises(ValueError, match="divide"):
        ring_attention(q, k, v, mesh)


def test_causality_across_chunks():
    """Perturbing late tokens never changes early outputs, even across
    chunk boundaries."""
    mesh = get_mesh(8, axis_names=("context",))
    q, k, v = _qkv(1, 128, 2, 16, seed=4)
    out1 = ring_attention(q, k, v, mesh)
    k2 = k.at[:, 100:].set(7.0)
    v2 = v.at[:, 100:].set(-7.0)
    out2 = ring_attention(q, k2, v2, mesh)
    np.testing.assert_allclose(np.asarray(out1[:, :100]),
                               np.asarray(out2[:, :100]), atol=1e-6)
    assert np.abs(np.asarray(out1[:, 100:]) - np.asarray(out2[:, 100:])).max() > .1
