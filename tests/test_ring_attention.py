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


# --------------------------------- window / sinks / bias (r5, VERDICT #6)


def _banded_reference(q, k, v, window):
    import math

    B, T, H, hd = q.shape
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
    pos = jnp.arange(T)
    mask = (pos[None, :] <= pos[:, None]) & (pos[None, :]
                                             > pos[:, None] - window)
    s = jnp.where(mask, s, -1e30)
    return jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, -1), v)


def test_windowed_ring_matches_banded_oracle():
    """window=W on the ring (band mask + round truncation) equals the
    banded einsum for sub-chunk, chunk-crossing, and full windows —
    forward and all three grads at a crossing W."""
    mesh = get_mesh(8, axis_names=("context",))
    q, k, v = _qkv(2, 128, 2, 16, seed=5)
    for W in (8, 40, 128):       # Tc = 16: sub-chunk, crossing, full
        out = ring_attention(q, k, v, mesh, window=W)
        ref = _banded_reference(q, k, v, W)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5, err_msg=f"W={W}")

    W = 40
    gf = jax.grad(lambda a, b, c: jnp.sum(jnp.sin(ring_attention(
        a, b, c, mesh, window=W))), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda a, b, c: jnp.sum(jnp.sin(_banded_reference(
        a, b, c, W))), argnums=(0, 1, 2))(q, k, v)
    for nm, a, b in zip("qkv", gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=f"d{nm}")


def test_ring_sink_matches_reference():
    """GPT-OSS sinks on the ring: the normalizer-only fold equals the
    concatenated-softmax oracle; dsink matches autodiff through it."""
    mesh = get_mesh(8, axis_names=("context",))
    q, k, v = _qkv(2, 128, 2, 16, seed=6)
    rng = np.random.default_rng(7)
    sink = jnp.asarray(rng.normal(0, 1, (2,)), jnp.float32)
    out = ring_attention(q, k, v, mesh, sink=sink)
    ref = reference_attention(q, k, v, sink=sink)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    gf = jax.grad(lambda a, b, c, s: jnp.sum(jnp.square(ring_attention(
        a, b, c, mesh, sink=s))), argnums=(0, 1, 2, 3))(q, k, v, sink)
    gr = jax.grad(lambda a, b, c, s: jnp.sum(jnp.square(
        reference_attention(a, b, c, sink=s))),
        argnums=(0, 1, 2, 3))(q, k, v, sink)
    for nm, a, b in zip(("q", "k", "v", "sink"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5, err_msg=f"d{nm}")


def test_ring_bias_matches_reference():
    """Batch-shared (H, T, T) bias (T5 relative positions) on the ring:
    forward + dq/dk/dv/dbias equal the einsum oracle (dbias rows live on
    the device owning their query rows — no reduction needed)."""
    mesh = get_mesh(8, axis_names=("context",))
    q, k, v = _qkv(2, 128, 2, 16, seed=8)
    rng = np.random.default_rng(9)
    bias = jnp.asarray(rng.normal(0, 0.5, (2, 128, 128)), jnp.float32)
    out = ring_attention(q, k, v, mesh, bias=bias)
    ref = reference_attention(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    gf = jax.grad(lambda a, b, c, bb: jnp.sum(jnp.square(ring_attention(
        a, b, c, mesh, bias=bb))), argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(lambda a, b, c, bb: jnp.sum(jnp.square(
        reference_attention(a, b, c, bias=bb))),
        argnums=(0, 1, 2, 3))(q, k, v, bias)
    for nm, a, b in zip(("q", "k", "v", "bias"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5, err_msg=f"d{nm}")


def test_ring_window_sink_tp_composition():
    """The GPT-OSS shape — window + sinks — under cp×tp (heads sharded):
    per-shard sink rows follow their heads."""
    mesh = get_mesh_2d(4, 2, axis_names=("context", "model"))
    q, k, v = _qkv(2, 64, 4, 16, seed=10)
    rng = np.random.default_rng(11)
    sink = jnp.asarray(rng.normal(0, 1, (4,)), jnp.float32)
    W = 24
    out = ring_attention(q, k, v, mesh, axis="context", head_axis="model",
                         window=W, sink=sink)

    import math
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(16)
    pos = jnp.arange(64)
    mask = (pos[None, :] <= pos[:, None]) & (pos[None, :]
                                             > pos[:, None] - W)
    s = jnp.where(mask, s, -1e30)
    sc = jnp.broadcast_to(sink[None, :, None, None], (2, 4, 64, 1))
    p = jax.nn.softmax(jnp.concatenate([s, sc], -1), -1)[..., :-1]
    ref = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_model_cp_window_sinks_bias():
    """TransformerLM(cp=True) no longer falls back for window/sinks, and
    the T5-style att_bias rides the ring — model-level equality vs the
    single-path einsum model."""
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM
    from neuralnetworklibrary_tpu.parallel.mesh import get_mesh_2d

    mesh = get_mesh_2d(2, 4, axis_names=("data", "context"))
    V = 50
    kw = dict(vocab_size=V, pad_token=1, d_model=32, n_heads=4, n_layers=2,
              max_len=64, drop=0.0, pos_embedding="rope", window=24,
              sinks=True)
    me = TransformerLM(**kw)
    mc = TransformerLM(**kw, mesh=mesh, cp=True)
    x = jnp.asarray(np.random.default_rng(12).integers(0, V, (2, 64)),
                    jnp.int32)
    variables = me.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(mc.apply(variables, x)[0]),
                               np.asarray(me.apply(variables, x)[0]),
                               rtol=3e-4, atol=3e-4)


# --------------------------------------------- attention dropout (r5, #5)


def test_ring_dropout_matches_hash_oracle():
    """Ring dropout uses the flash kernel's position-hashed mask stream:
    the dropped output EXACTLY equals einsum attention with the same
    regenerated mask; drop=0 equals the plain ring; different seeds give
    different outputs."""
    import math

    from neuralnetworklibrary_tpu.ops.flash_attention import _drop_keep

    mesh = get_mesh(8, axis_names=("context",))
    B, T, H, hd = 2, 128, 2, 16
    q, k, v = _qkv(B, T, H, hd, seed=20)
    r, seed = 0.25, 99

    out = ring_attention(q, k, v, mesh, dropout=r, dropout_seed=seed)

    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
    s = jnp.where(jnp.tril(jnp.ones((T, T), bool)), s, -1e30)
    p = jax.nn.softmax(s, -1)
    qpos = jnp.broadcast_to(jnp.arange(T)[:, None], (T, T)).astype(jnp.int32)
    kpos = jnp.broadcast_to(jnp.arange(T)[None, :], (T, T)).astype(jnp.int32)
    keep = jnp.stack([
        jnp.stack([_drop_keep(jnp.int32(seed), jnp.int32(b * H + h),
                              qpos, kpos, r) for h in range(H)])
        for b in range(B)])
    pd = p * keep.astype(p.dtype) / (1.0 - r)
    ref = jnp.einsum("bhqk,bkhd->bqhd", pd, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    o0 = ring_attention(q, k, v, mesh)
    o0d = ring_attention(q, k, v, mesh, dropout=1e-9, dropout_seed=seed)
    np.testing.assert_allclose(np.asarray(o0d), np.asarray(o0),
                               rtol=1e-6, atol=1e-6)
    o2 = ring_attention(q, k, v, mesh, dropout=r, dropout_seed=seed + 1)
    assert np.abs(np.asarray(out) - np.asarray(o2)).max() > 1e-3

    # grads finite through the dropped ring
    g = jax.grad(lambda a, b, c: jnp.sum(jnp.square(ring_attention(
        a, b, c, mesh, dropout=r, dropout_seed=seed))),
        argnums=(0, 1, 2))(q, k, v)
    for x in g:
        assert bool(jnp.all(jnp.isfinite(x)))


def test_model_cp_dropout_trains():
    """TransformerLM(cp=True, drop>0): the train forward stays on the ring
    (no einsum fallback) and produces finite loss + grads."""
    import jax.flatten_util

    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM
    from neuralnetworklibrary_tpu.parallel.mesh import get_mesh_2d

    mesh = get_mesh_2d(2, 4, axis_names=("data", "context"))
    V = 40
    m = TransformerLM(vocab_size=V, pad_token=1, d_model=32, n_heads=4,
                      n_layers=2, max_len=64, drop=0.2,
                      pos_embedding="rope", mesh=mesh, cp=True)
    x = jnp.asarray(np.random.default_rng(7).integers(0, V, (2, 64)),
                    jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), x)

    def loss(p, key):
        logits = m.apply({"params": p}, x, train=True,
                         rngs={"dropout": key})[0]
        return jnp.mean(jnp.square(logits - 1.0))

    l1, g = jax.value_and_grad(loss)(variables["params"],
                                     jax.random.PRNGKey(1))
    l2 = loss(variables["params"], jax.random.PRNGKey(2))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert abs(float(l1) - float(l2)) > 1e-8   # dropout stream is live
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert bool(jnp.all(jnp.isfinite(flat)))


# -------------------------------------------------- packed sequences (r5)


def test_ring_packed_matches_reference():
    """q_start (packed rows) on the ring == the block-diagonal-∧-causal
    einsum, forward and grads; the CP model path (reset_at packing under
    cp=True) equals the single-path packed model."""
    import math

    mesh = get_mesh(8, axis_names=("context",))
    B, T, H, hd = 2, 128, 2, 16
    q, k, v = _qkv(B, T, H, hd, seed=30)
    starts = np.zeros((B, T), np.int32)
    starts[0, 50:] = 50
    starts[1, 30:90] = 30
    starts[1, 90:] = 90
    qs = jnp.asarray(starts)

    def packed_ref(a, b, c):
        s = jnp.einsum("bqhd,bkhd->bhqk", a, b) / math.sqrt(hd)
        pos = jnp.arange(T)
        m = (pos[None, :] <= pos[:, None])[None] \
            & (pos[None, None, :] >= qs[:, :, None])
        s = jnp.where(m[:, None], s, -1e30)
        return jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, -1), c)

    out = ring_attention(q, k, v, mesh, q_start=qs)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(packed_ref(q, k, v)),
                               rtol=1e-5, atol=1e-5)
    gf = jax.grad(lambda a, b, c: jnp.sum(jnp.sin(ring_attention(
        a, b, c, mesh, q_start=qs))), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda a, b, c: jnp.sum(jnp.sin(packed_ref(a, b, c))),
                  argnums=(0, 1, 2))(q, k, v)
    for nm, a, b in zip("qkv", gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=f"d{nm}")


def test_model_cp_packed_matches_solo():
    """TransformerLM(reset_at=EOS, cp=True): packed rows context-
    parallelize — logits equal the unsharded packed model."""
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM
    from neuralnetworklibrary_tpu.parallel.mesh import get_mesh_2d

    mesh = get_mesh_2d(2, 4, axis_names=("data", "context"))
    V, EOS = 40, 0
    kw = dict(vocab_size=V, pad_token=1, d_model=32, n_heads=4, n_layers=2,
              max_len=64, drop=0.0, pos_embedding="rope", reset_at=EOS)
    msolo = TransformerLM(**kw)
    mc = TransformerLM(**kw, mesh=mesh, cp=True)
    rng = np.random.default_rng(9)
    row = rng.integers(2, V, 64)
    row[20] = EOS
    row[45] = EOS
    x = jnp.asarray(np.stack([row, row]), jnp.int32)
    vv = msolo.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(mc.apply(vv, x)[0]),
                               np.asarray(msolo.apply(vv, x)[0]),
                               rtol=3e-4, atol=3e-4)
