"""Flash attention (ops/flash_attention.py): differential-tested against the
einsum oracle — forward, all three gradients, multiple shapes/dtypes — and
the TransformerLM flash=True integration (CPU interpret mode)."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.ops.flash_attention import (
    flash_attention,
    reference_attention,
)


def _qkv(B, T, H, hd, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.normal(0, 1, (B, T, H, hd)), dtype)
                 for _ in range(3))


@pytest.mark.parametrize("T,hd,bq,bk", [
    (128, 64, 128, 128),
    (256, 64, 128, 128),
    (256, 32, 128, 64),     # uneven q/k blocks, small head dim
    (384, 128, 128, 128),   # T not a power of two
])
def test_forward_matches_reference(T, hd, bq, bk):
    q, k, v = _qkv(2, T, 2, hd)
    o = flash_attention(q, k, v, block_q=bq, block_k=bk)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    q, k, v = _qkv(2, 256, 4, 64, seed=1)

    def loss(fn):
        return lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v)))

    g_flash = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(reference_attention), argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=f"d{name} diverges from the einsum oracle")


def test_bfloat16_forward():
    q, k, v = _qkv(1, 256, 2, 64, seed=2, dtype=jnp.bfloat16)
    o = flash_attention(q, k, v)
    ref = reference_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                              v.astype(jnp.float32))
    assert o.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(o, np.float32), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_rejects_indivisible_seq_len():
    # T=192 is not a multiple of 128 and no 128-multiple block divides it
    q, k, v = _qkv(1, 192, 2, 64)
    with pytest.raises(ValueError, match="no valid block size"):
        flash_attention(q, k, v, block_q=128, block_k=128)


def test_block_fit_fallback():
    """T=1280: the 512 default doesn't divide it; fit() falls back to the
    largest 128-multiple divisor (256) instead of erroring."""
    q, k, v = _qkv(1, 1280, 2, 64, seed=7)
    o = flash_attention(q, k, v)  # default block 512 -> fitted 256
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_causality():
    """Token t's output must not depend on tokens > t."""
    q, k, v = _qkv(1, 256, 2, 64, seed=3)
    o1 = flash_attention(q, k, v)
    k2 = k.at[:, 200:].set(99.0)
    v2 = v.at[:, 200:].set(-99.0)
    o2 = flash_attention(q, k2, v2)
    np.testing.assert_allclose(np.asarray(o1[:, :200]),
                               np.asarray(o2[:, :200]), atol=1e-6)
    assert np.abs(np.asarray(o1[:, 200:]) - np.asarray(o2[:, 200:])).max() > 1


# --------------------------------------------- TransformerLM integration


from neuralnetworklibrary_tpu.nn.transformer import TransformerLM  # noqa: E402

V = 50


def test_transformer_flash_matches_einsum():
    """flash_attention=True changes the compute path, not the numerics —
    logits and parameter gradients match the einsum model."""
    x = jnp.asarray(np.random.default_rng(0).integers(0, V, (2, 128)),
                    jnp.int32)
    kw = dict(vocab_size=V, pad_token=1, d_model=64, n_heads=2, n_layers=2,
              max_len=128, drop=0.0)
    m_ein = TransformerLM(**kw)
    m_fla = TransformerLM(**kw, flash_attention=True)
    variables = m_ein.init(jax.random.PRNGKey(0), x)
    l_ein = m_ein.apply(variables, x)[0]
    l_fla = m_fla.apply(variables, x)[0]
    np.testing.assert_allclose(np.asarray(l_fla), np.asarray(l_ein),
                               rtol=2e-4, atol=2e-4)

    def loss(model):
        def f(params):
            logits = model.apply({"params": params}, x)[0]
            return jnp.mean((logits - 1.0) ** 2)
        return f

    g_ein = jax.grad(loss(m_ein))(variables["params"])
    g_fla = jax.grad(loss(m_fla))(variables["params"])
    flat_e, _ = jax.flatten_util.ravel_pytree(g_ein)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fla)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_e),
                               rtol=2e-3, atol=1e-5)


def test_transformer_flash_fallback_on_short_seq():
    """T not divisible by 128 silently keeps the einsum path — identical
    numerics, no error."""
    x = jnp.asarray(np.random.default_rng(1).integers(0, V, (2, 10)),
                    jnp.int32)
    kw = dict(vocab_size=V, pad_token=1, d_model=32, n_heads=2, n_layers=1,
              max_len=64, drop=0.0)
    m_ein = TransformerLM(**kw)
    m_fla = TransformerLM(**kw, flash_attention=True)
    variables = m_ein.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(m_fla.apply(variables, x)[0]),
                               np.asarray(m_ein.apply(variables, x)[0]),
                               atol=0)


def test_windowed_flash_matches_banded_oracle():
    """window=W flash (out-of-band blocks skipped) equals the banded einsum
    in forward AND all three gradients, for W crossing block boundaries."""
    import math

    def banded_reference(q, k, v, window):
        B, T, H, hd = q.shape
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        pos = jnp.arange(T)
        mask = (pos[None, :] <= pos[:, None]) & (pos[None, :] > pos[:, None] - window)
        s = jnp.where(mask, s, -1e30)
        return jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, -1), v)

    rng = np.random.default_rng(0)
    B, T, H, hd = 2, 512, 2, 32
    q, k, v = (jnp.asarray(rng.normal(0, 1, (B, T, H, hd)), jnp.float32)
               for _ in range(3))
    for W in (64, 200, 512):   # sub-block, block-crossing, full
        out = flash_attention(q, k, v, block_q=128, block_k=128, window=W)
        ref = banded_reference(q, k, v, W)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    W = 200
    def loss_f(fn):
        return lambda a, b, c: jnp.sum(jnp.square(fn(a, b, c)))
    gf = jax.grad(loss_f(lambda a, b, c: flash_attention(
        a, b, c, block_q=128, block_k=128, window=W)), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_f(lambda a, b, c: banded_reference(a, b, c, W)),
                  argnums=(0, 1, 2))(q, k, v)
    for got, want in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_windowed_flash_model_path():
    """TransformerLM(window=W, flash_attention=True) == the einsum window
    path at the model level."""
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    V, W = 50, 40
    me = TransformerLM(vocab_size=V, pad_token=1, d_model=32, n_heads=4,
                       n_layers=2, max_len=128, drop=0.0, window=W)
    mf = TransformerLM(vocab_size=V, pad_token=1, d_model=32, n_heads=4,
                       n_layers=2, max_len=128, drop=0.0, window=W,
                       flash_attention=True)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, V, (2, 128)), jnp.int32)
    variables = me.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(mf.apply(variables, x)[0]),
                               np.asarray(me.apply(variables, x)[0]),
                               rtol=2e-4, atol=2e-4)


# ------------------------------------------------------ bias + sinks (r4)


def test_flash_bias_matches_reference_fwd_bwd():
    """Batch-shared (H, T, T) additive bias (T5 relative positions):
    forward AND dq/dk/dv/dbias match the einsum oracle."""
    B, T, H, hd = 2, 256, 3, 32
    rng = np.random.default_rng(7)
    q, k, v = (jnp.asarray(rng.normal(size=(B, T, H, hd)), jnp.float32)
               for _ in range(3))
    bias = jnp.asarray(rng.normal(size=(H, T, T)), jnp.float32) * 0.5

    of = flash_attention(q, k, v, block_q=128, block_k=128, bias=bias)
    orf = reference_attention(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(of), np.asarray(orf),
                               rtol=2e-5, atol=2e-5)

    def lf(a, b, c, bb):
        return jnp.sum(jnp.square(flash_attention(
            a, b, c, block_q=128, block_k=128, bias=bb)))

    def lr(a, b, c, bb):
        return jnp.sum(jnp.square(reference_attention(a, b, c, bias=bb)))

    gf = jax.grad(lf, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for got, want, nm in zip(gf, gr, "qkvb"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"d{nm}")


def test_flash_sink_matches_reference_fwd_bwd():
    """GPT-OSS attention sinks: the discarded-mass softmax and the dsink
    gradient (computed OUTSIDE the kernel from lse/delta) both match."""
    B, T, H, hd = 2, 256, 2, 32
    rng = np.random.default_rng(8)
    q, k, v = (jnp.asarray(rng.normal(size=(B, T, H, hd)), jnp.float32)
               for _ in range(3))
    sink = jnp.asarray(rng.normal(size=(H,)), jnp.float32)

    of = flash_attention(q, k, v, block_q=128, block_k=128, sink=sink)
    orf = reference_attention(q, k, v, sink=sink)
    np.testing.assert_allclose(np.asarray(of), np.asarray(orf),
                               rtol=2e-5, atol=2e-5)

    def lf(a, b, c, s):
        return jnp.sum(jnp.square(flash_attention(
            a, b, c, block_q=128, block_k=128, sink=s)))

    def lr(a, b, c, s):
        return jnp.sum(jnp.square(reference_attention(a, b, c, sink=s)))

    gf = jax.grad(lf, argnums=(0, 1, 2, 3))(q, k, v, sink)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3))(q, k, v, sink)
    for got, want, nm in zip(gf, gr, "qkvs"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-4, err_msg=f"d{nm}")


@pytest.mark.slow
def test_flash_bias_long_context():
    """flash == einsum with bias at T=2048 (VERDICT item 6's 'Done' bar) —
    the T5-shaped long-context case, 512-blocks."""
    B, T, H, hd = 1, 2048, 1, 16
    rng = np.random.default_rng(9)
    q, k, v = (jnp.asarray(rng.normal(size=(B, T, H, hd)), jnp.float32)
               for _ in range(3))
    bias = jnp.asarray(rng.normal(size=(H, T, T)), jnp.float32) * 0.3
    of = flash_attention(q, k, v, bias=bias)  # default 512 blocks
    orf = reference_attention(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(of), np.asarray(orf),
                               rtol=5e-5, atol=5e-5)


def test_flash_per_batch_bias_rejected():
    B, T, H, hd = 2, 256, 2, 16
    q = k = v = jnp.zeros((B, T, H, hd))
    bad = jnp.zeros((B, H, T, T))
    with pytest.raises(ValueError, match="batch-shared"):
        flash_attention(q, k, v, block_q=128, block_k=128, bias=bad)


def test_sinks_model_flash_matches_einsum():
    """TransformerLM(sinks=True, flash_attention=True) — the GPT-OSS
    configuration — now takes the kernel and equals the einsum path."""
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    V = 50
    kw = dict(vocab_size=V, pad_token=1, d_model=32, n_heads=4, n_layers=2,
              max_len=128, drop=0.0, sinks=True, pos_embedding="rope")
    me = TransformerLM(**kw)
    mf = TransformerLM(**kw, flash_attention=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, V, (2, 128)), jnp.int32)
    variables = me.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(mf.apply(variables, x)[0]),
                               np.asarray(me.apply(variables, x)[0]),
                               rtol=2e-4, atol=2e-4)
