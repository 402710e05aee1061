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


def test_arbitrary_seq_len_padded():
    """r5: T that no block divides (192, 197) is padded to the next
    128-multiple inside the wrapper — causal and non-causal both match the
    oracle, and dq/dk/dv stay exact through the pad/slice."""
    for T in (192, 197):
        q, k, v = _qkv(1, T, 2, 64, seed=T)
        for causal in (True, False):
            o = flash_attention(q, k, v, block_q=128, block_k=128,
                                causal=causal)
            ref = reference_attention(q, k, v, causal=causal)
            np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)

    q, k, v = _qkv(1, 197, 2, 64, seed=9)

    def loss(fn):
        return lambda a, b, c: jnp.sum(jnp.sin(fn(a, b, c)))

    gf = jax.grad(loss(lambda a, b, c: flash_attention(
        a, b, c, causal=False)), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(lambda a, b, c: reference_attention(
        a, b, c, causal=False)), argnums=(0, 1, 2))(q, k, v)
    for got, want, nm in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"d{nm}")


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


def test_transformer_flash_short_seq_padded():
    """r5: T not divisible by 128 now rides the kernel through the pad
    path — same numerics as the einsum model to round-off."""
    x = jnp.asarray(np.random.default_rng(1).integers(0, V, (2, 10)),
                    jnp.int32)
    kw = dict(vocab_size=V, pad_token=1, d_model=32, n_heads=2, n_layers=1,
              max_len=64, drop=0.0)
    m_ein = TransformerLM(**kw)
    m_fla = TransformerLM(**kw, flash_attention=True)
    variables = m_ein.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(m_fla.apply(variables, x)[0]),
                               np.asarray(m_ein.apply(variables, x)[0]),
                               rtol=2e-4, atol=2e-4)


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


# --------------------------------------- non-causal + kv_mask (r5, VERDICT #2)


def test_noncausal_forward_and_grads_match_reference():
    """causal=False (encoder) flash == bidirectional einsum, forward and
    dq/dk/dv."""
    q, k, v = _qkv(2, 256, 3, 32, seed=11)
    o = flash_attention(q, k, v, block_q=128, block_k=128, causal=False)
    ref = reference_attention(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda a, b, c: jnp.sum(jnp.sin(fn(a, b, c)))

    gf = jax.grad(loss(lambda a, b, c: flash_attention(
        a, b, c, block_q=128, block_k=128, causal=False)),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(lambda a, b, c: reference_attention(
        a, b, c, causal=False)), argnums=(0, 1, 2))(q, k, v)
    for got, want, nm in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4, err_msg=f"d{nm}")


def test_kv_mask_matches_reference_fwd_bwd():
    """Key-padding mask in the kernel (per-batch valid lengths) == the
    einsum -1e30 masking, causal and non-causal, fwd + grads; masked keys
    get exactly zero dk/dv."""
    B, T, H, hd = 3, 256, 2, 32
    q, k, v = _qkv(B, T, H, hd, seed=12)
    lengths = np.array([256, 130, 7])
    kv_mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])

    for causal in (True, False):
        o = flash_attention(q, k, v, block_q=128, block_k=128,
                            causal=causal, kv_mask=kv_mask)
        ref = reference_attention(q, k, v, causal=causal, kv_mask=kv_mask)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"causal={causal}")

    def loss(fn):
        return lambda a, b, c: jnp.sum(jnp.sin(fn(a, b, c)))

    gf = jax.grad(loss(lambda a, b, c: flash_attention(
        a, b, c, block_q=128, block_k=128, causal=False,
        kv_mask=kv_mask)), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(lambda a, b, c: reference_attention(
        a, b, c, causal=False, kv_mask=kv_mask)),
        argnums=(0, 1, 2))(q, k, v)
    for got, want, nm in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4, err_msg=f"d{nm}")
    # masked keys contribute nothing -> exactly zero dk/dv there
    assert np.abs(np.asarray(gf[1][2, 7:])).max() == 0.0
    assert np.abs(np.asarray(gf[2][2, 7:])).max() == 0.0


def test_kv_mask_with_bias_matches_reference():
    """The T5-encoder configuration: bidirectional + batch-shared bias +
    key-padding mask, forward and all four gradients (incl. dbias)."""
    B, T, H, hd = 2, 256, 2, 32
    rng = np.random.default_rng(13)
    q, k, v = (jnp.asarray(rng.normal(size=(B, T, H, hd)), jnp.float32)
               for _ in range(3))
    bias = jnp.asarray(rng.normal(size=(H, T, T)), jnp.float32) * 0.5
    kv_mask = jnp.asarray(np.arange(T)[None, :]
                          < np.array([256, 100])[:, None])

    of = flash_attention(q, k, v, block_q=128, block_k=128, causal=False,
                         bias=bias, kv_mask=kv_mask)
    orf = reference_attention(q, k, v, causal=False, bias=bias,
                              kv_mask=kv_mask)
    np.testing.assert_allclose(np.asarray(of), np.asarray(orf),
                               rtol=2e-5, atol=2e-5)

    def lf(a, b, c, bb):
        return jnp.sum(jnp.square(flash_attention(
            a, b, c, block_q=128, block_k=128, causal=False, bias=bb,
            kv_mask=kv_mask)))

    def lr(a, b, c, bb):
        return jnp.sum(jnp.square(reference_attention(
            a, b, c, causal=False, bias=bb, kv_mask=kv_mask)))

    gf = jax.grad(lf, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for got, want, nm in zip(gf, gr, "qkvb"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-4, err_msg=f"d{nm}")


def test_window_requires_causal():
    q, k, v = _qkv(1, 256, 2, 32)
    with pytest.raises(ValueError, match="window banding requires causal"):
        flash_attention(q, k, v, window=64, causal=False)


def test_bert_encoder_flash_matches_einsum():
    """BertModel(flash_attention=True) — padded batch — equals the einsum
    encoder end-to-end (logits through the MLM head)."""
    from neuralnetworklibrary_tpu.nn.bert import BertMLM

    V, T = 60, 136
    cfg = dict(vocab_size=V, pad_token=0, d_model=32, n_heads=4,
               n_layers=2, max_len=256, drop=0.0)
    me = BertMLM(config=cfg)
    mf = BertMLM(config={**cfg, "flash_attention": True})
    rng = np.random.default_rng(5)
    ids = rng.integers(1, V, (2, T))
    ids[0, 100:] = 0  # pad tail -> kv_mask engages
    x = jnp.asarray(ids, jnp.int32)
    variables = me.init(jax.random.PRNGKey(0), x)
    le = me.apply(variables, x)[0]
    lf_ = mf.apply(variables, x)[0]
    # valid rows only: pad QUERY rows exist in both but carry no meaning
    np.testing.assert_allclose(np.asarray(lf_[0, :100]),
                               np.asarray(le[0, :100]),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(lf_[1]), np.asarray(le[1]),
                               rtol=3e-4, atol=3e-4)


def test_t5_encoder_flash_matches_einsum():
    """TransformerSeq2Seq(flash_attention=True): the ENCODER (relative
    bias + padded source) now rides the kernel — encoder outputs match the
    einsum model on valid rows."""
    from neuralnetworklibrary_tpu.nn.seq2seq import TransformerSeq2Seq

    V = 40
    kw = dict(vocab_size=V, pad_token=0, d_model=32, n_heads=4,
              enc_layers=2, dec_layers=1, max_len=64,
              pos_embedding="relative", norm="rmsnorm", drop=0.0)
    me = TransformerSeq2Seq(**kw)
    mf = TransformerSeq2Seq(**kw, flash_attention=True)
    rng = np.random.default_rng(6)
    src = rng.integers(1, V, (2, 48))
    src[1, 30:] = 0
    src = jnp.asarray(src, jnp.int32)
    variables = me.init(jax.random.PRNGKey(0), src,
                        jnp.ones((2, 4), jnp.int32))
    he, _ = me.apply(variables, src, method="encode")
    hf, _ = mf.apply(variables, src, method="encode")
    np.testing.assert_allclose(np.asarray(hf[0]), np.asarray(he[0]),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(hf[1, :30]),
                               np.asarray(he[1, :30]),
                               rtol=3e-4, atol=3e-4)


# ------------------------------------- in-kernel attention dropout (r5, #5)


def _dropped_reference(q, k, v, seed, rate, causal=True):
    """Einsum attention with the SAME position-hashed dropout mask the
    kernel regenerates — an exact oracle for the dropped forward."""
    import math

    from neuralnetworklibrary_tpu.ops.flash_attention import _drop_keep

    B, T, H, hd = q.shape
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
    if causal:
        s = jnp.where(jnp.tril(jnp.ones((T, T), bool)), s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    qpos = jnp.broadcast_to(jnp.arange(T)[:, None], (T, T)).astype(jnp.int32)
    kpos = jnp.broadcast_to(jnp.arange(T)[None, :], (T, T)).astype(jnp.int32)
    keep = jnp.stack([
        jnp.stack([_drop_keep(jnp.int32(seed), jnp.int32(b * H + h),
                              qpos, kpos, rate) for h in range(H)])
        for b in range(B)])                                    # (B, H, T, T)
    pd = p * keep.astype(p.dtype) / (1.0 - rate)
    return jnp.einsum("bhqk,bkhd->bqhd", pd, v)


def test_dropout_forward_matches_hash_oracle():
    """The kernel's dropped forward EXACTLY equals einsum attention with
    the same regenerated mask — causal and non-causal."""
    q, k, v = _qkv(2, 256, 2, 32, seed=21)
    for causal in (True, False):
        o = flash_attention(q, k, v, block_q=128, block_k=128,
                            causal=causal, dropout=0.2, dropout_seed=123)
        ref = _dropped_reference(q, k, v, 123, 0.2, causal=causal)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"causal={causal}")


def test_dropout_grads_match_hash_oracle():
    """dq/dk/dv through the dropped kernel equal autodiff through the
    masked einsum oracle (the backward kernels regenerate the mask)."""
    q, k, v = _qkv(1, 256, 2, 32, seed=22)

    def lf(a, b, c):
        return jnp.sum(jnp.sin(flash_attention(
            a, b, c, block_q=128, block_k=128, dropout=0.15,
            dropout_seed=77)))

    def lr(a, b, c):
        return jnp.sum(jnp.sin(_dropped_reference(a, b, c, 77, 0.15)))

    gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for got, want, nm in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{nm}")


def test_dropout_statistics():
    """Keep rate ≈ 1-r, different seeds give different masks, the
    seed-mean of the dropped output approaches the undropped output, and
    drop=0 is the exact undropped kernel."""
    from neuralnetworklibrary_tpu.ops.flash_attention import _drop_keep

    T, r = 512, 0.3
    qpos = jnp.broadcast_to(jnp.arange(T)[:, None], (T, T)).astype(jnp.int32)
    kpos = jnp.broadcast_to(jnp.arange(T)[None, :], (T, T)).astype(jnp.int32)
    keep = np.asarray(_drop_keep(jnp.int32(5), jnp.int32(0), qpos, kpos, r))
    rate = keep.mean()
    assert abs(rate - (1 - r)) < 0.01, rate
    keep2 = np.asarray(_drop_keep(jnp.int32(6), jnp.int32(0), qpos, kpos, r))
    assert (keep != keep2).mean() > 0.2          # seeds decorrelate
    # rows are not degenerate (independence across positions)
    row_rates = keep.mean(1)
    assert row_rates.std() < 0.1

    q, k, v = _qkv(1, 128, 2, 16, seed=23)
    o0 = flash_attention(q, k, v, block_q=128, block_k=128)
    acc = np.zeros(o0.shape, np.float64)
    n = 64
    for s in range(n):
        acc += np.asarray(flash_attention(
            q, k, v, block_q=128, block_k=128, dropout=r,
            dropout_seed=1000 + s), np.float64)
    # E[dropped] = undropped; mc error ~ sigma/sqrt(64).  Early rows attend
    # a handful of keys (row 0: exactly one — dropping it zeroes the row),
    # so their per-seed variance is huge; judge the spread-attention rows
    # and the mean error instead of a global max
    err = np.abs(acc / n - np.asarray(o0))
    assert err[:, 16:].max() < 0.15, err[:, 16:].max()
    assert err.mean() < 0.03, err.mean()


def test_dropout_model_training_keeps_flash():
    """TransformerLM(flash_attention=True, drop>0): the train-mode forward
    now differs from the einsum model ONLY through the dropout stream
    (different masks), while eval mode matches exactly — and a train step
    with gradients runs without falling back (finite grads)."""
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    V = 50
    kw = dict(vocab_size=V, pad_token=1, d_model=32, n_heads=2, n_layers=2,
              max_len=128, drop=0.3)
    me = TransformerLM(**kw)
    mf = TransformerLM(**kw, flash_attention=True)
    x = jnp.asarray(np.random.default_rng(4).integers(0, V, (2, 128)),
                    jnp.int32)
    variables = me.init(jax.random.PRNGKey(0), x)
    # eval: exact equality of compute paths (no dropout active)
    np.testing.assert_allclose(
        np.asarray(mf.apply(variables, x)[0]),
        np.asarray(me.apply(variables, x)[0]), rtol=2e-4, atol=2e-4)

    def loss(model, params, key):
        logits = model.apply({"params": params}, x, train=True,
                             rngs={"dropout": key})[0]
        return jnp.mean((logits - 1.0) ** 2)

    key = jax.random.PRNGKey(3)
    lf_, gf = jax.value_and_grad(lambda p: loss(mf, p, key))(
        variables["params"])
    le_, ge = jax.value_and_grad(lambda p: loss(me, p, key))(
        variables["params"])
    assert np.isfinite(lf_) and np.isfinite(le_)
    flat_f, _ = jax.flatten_util.ravel_pytree(gf)
    assert bool(jnp.all(jnp.isfinite(flat_f)))
    # different dropout streams -> different losses; same model at eval
    assert abs(float(lf_) - float(le_)) > 1e-6


def test_flash_auto_default():
    """flash_attention=None is AUTO: off on the cpu backend (einsum is
    exact and the kernel only interprets there); explicit True/False and
    the NNL_FLASH_ATTENTION env variable force it."""
    import os

    kw = dict(vocab_size=V, pad_token=1, d_model=32, n_heads=2, n_layers=1,
              max_len=128, drop=0.0)
    x = jnp.asarray(np.random.default_rng(0).integers(0, V, (1, 128)),
                    jnp.int32)
    m_auto = TransformerLM(**kw)                    # None → auto
    assert m_auto.flash_attention is None
    variables = m_auto.init(jax.random.PRNGKey(0), x)
    # on cpu auto must resolve to einsum — outputs exactly equal the
    # explicit flash_attention=False model
    m_off = TransformerLM(**kw, flash_attention=False)
    np.testing.assert_array_equal(
        np.asarray(m_auto.apply(variables, x)[0]),
        np.asarray(m_off.apply(variables, x)[0]))
    # env kill switch wins over an explicit True
    m_on = TransformerLM(**kw, flash_attention=True)
    os.environ["NNL_FLASH_ATTENTION"] = "0"
    try:
        np.testing.assert_array_equal(
            np.asarray(m_on.apply(variables, x)[0]),
            np.asarray(m_off.apply(variables, x)[0]))
    finally:
        del os.environ["NNL_FLASH_ATTENTION"]
