"""Vocab-chunked cross-entropy: exact equality with the dense oracle in
value AND gradients (h and tied embedding), padding/mask edges, and the
TransformerLM(fused_ce=True) trajectory matching the materialized path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.ops.chunked_ce import (
    chunked_softmax_ce,
    dense_softmax_ce,
)


def _case(B=2, T=6, D=16, V=100, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(0, 1, (B, T, D)), dtype)
    emb = jnp.asarray(rng.normal(0, 0.5, (V, D)), dtype)
    tgt = jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32)
    mask = jnp.asarray((rng.random((B, T)) > 0.2), jnp.float32)
    return h, emb, tgt, mask


@pytest.mark.parametrize("chunk", [16, 32, 100, 256])
def test_matches_dense_forward(chunk):
    """Every chunk size — divisible, padding, single-chunk — reproduces the
    dense masked-mean CE."""
    h, emb, tgt, mask = _case()
    got = chunked_softmax_ce(h, emb, tgt, mask, chunk)
    want = dense_softmax_ce(h, emb, tgt, mask)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_matches_dense_gradients():
    """dh and demb (the tied decoder's two gradients) equal jax.grad of the
    dense oracle — including the scatter into target rows."""
    h, emb, tgt, mask = _case(V=70, seed=3)
    gc = jax.grad(lambda a, b: chunked_softmax_ce(a, b, tgt, mask, 32),
                  argnums=(0, 1))(h, emb)
    gd = jax.grad(lambda a, b: dense_softmax_ce(a, b, tgt, mask),
                  argnums=(0, 1))(h, emb)
    np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(gd[0]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(gd[1]),
                               rtol=1e-5, atol=1e-7)


def test_all_masked_rows_are_safe():
    h, emb, tgt, _ = _case()
    mask = jnp.zeros(tgt.shape, jnp.float32)
    loss = chunked_softmax_ce(h, emb, tgt, mask, 32)
    g = jax.grad(lambda a: chunked_softmax_ce(a, emb, tgt, mask, 32))(h)
    assert float(loss) == 0.0
    assert np.all(np.asarray(g) == 0.0)


def test_bf16_inputs():
    h, emb, tgt, mask = _case(dtype=jnp.bfloat16)
    got = chunked_softmax_ce(h, emb, tgt, mask, 32)
    want = dense_softmax_ce(h.astype(jnp.float32),
                            emb.astype(jnp.float32), tgt, mask)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-2)
    g = jax.grad(lambda a, b: chunked_softmax_ce(a, b, tgt, mask, 32),
                 argnums=(0, 1))(h, emb)
    assert g[0].dtype == jnp.bfloat16 and g[1].dtype == jnp.bfloat16


# ------------------------------------------- model integration


def test_fused_ce_transformer_matches_materialized():
    """TransformerLM(fused_ce=True) + FusedSeqCrossEntropyLoss trains with
    EXACTLY the loss trajectory of the materialized-logits path, and its
    decode path (logits needed) still works."""
    import types

    from neuralnetworklibrary_tpu.applications.text import SeqCrossEntropyLoss
    from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
    from neuralnetworklibrary_tpu.learner import Learner
    from neuralnetworklibrary_tpu.nn.transformer import (
        FusedSeqCrossEntropyLoss,
        TransformerLM,
        generate,
    )

    V, T, B = 40, 10, 8
    rng = np.random.default_rng(0)
    starts = rng.integers(0, V, (8 * B, 1))
    xs = ((starts + np.arange(T)) % V).astype(np.int32)
    ys = ((xs + 1) % V).astype(np.int32)
    ds = ArrayDataset(xs, ys)

    def data():
        return types.SimpleNamespace(
            target_type="lm", bs=B,
            train_dl=DataLoader(ds, B, shuffle=False, prefetch=0),
            val_dl=DataLoader(ds, B, prefetch=0), train_ds=ds, val_ds=ds)

    def run(fused):
        model = TransformerLM(vocab_size=V, pad_token=1, d_model=32,
                              n_heads=4, n_layers=2, max_len=64, drop=0.0,
                              fused_ce=fused)
        loss = FusedSeqCrossEntropyLoss(chunk=16) if fused else SeqCrossEntropyLoss()
        learner = Learner("/tmp/test_fused_ce", data(), model, "Adam2",
                          loss_func=loss, seed=0)
        it = iter(learner.data.train_dl)
        out = [float(learner.train1minibatch(next(it), 3e-3))
               for _ in range(8)]
        return out, learner

    base, _ = run(False)
    fused, learner = run(True)
    np.testing.assert_allclose(fused, base, rtol=1e-4, atol=1e-6)

    # decode still materializes per-step logits: greedy generation runs
    prompt = xs[:1, :5]
    toks = generate(learner.model, learner.params, prompt, n=3, k=1)
    assert np.asarray(toks).shape == (1, 3)


def test_fused_ce_awd_lstm_matches_materialized():
    """LanguageModelNet(fused_ce=True) + FusedRegSeqCrossEntropyLoss: the
    SAME loss trajectory as the materialized decoder — including active
    weight-drop/locked dropout (identical rng streams) and carried state."""
    import types

    from neuralnetworklibrary_tpu.applications.text import (
        FusedRegSeqCrossEntropyLoss,
        LanguageModelNet,
        RegSeqCrossEntropyLoss,
    )
    from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
    from neuralnetworklibrary_tpu.learner import Learner

    V, T, B = 60, 8, 8
    rng = np.random.default_rng(0)
    xs = rng.integers(0, V, (4 * B, T)).astype(np.int32)
    ys = np.roll(xs, -1, axis=1).astype(np.int32)
    ds = ArrayDataset(xs, ys)

    def data():
        return types.SimpleNamespace(
            target_type="lm", bs=B,
            train_dl=DataLoader(ds, B, shuffle=False, prefetch=0),
            val_dl=DataLoader(ds, B, prefetch=0), train_ds=ds, val_ds=ds)

    def run(fused):
        model = LanguageModelNet(
            vocab_size=V, pad_token=1, emb_dim=16, hidden_size=24,
            num_layers=2, enc_drops=(0.1, 0.1, 0.1, 0.1), dec_drop=0.1,
            fused_ce=fused)
        loss = (FusedRegSeqCrossEntropyLoss(0.1, 0.1, chunk=16) if fused
                else RegSeqCrossEntropyLoss(0.1, 0.1))
        learner = Learner("/tmp/test_fused_lm", data(), model, "Adam2",
                          loss_func=loss, seed=0)
        it = iter(learner.data.train_dl)
        return [float(learner.train1minibatch(next(it), 3e-3))
                for _ in range(4)]

    base = run(False)
    fused = run(True)
    np.testing.assert_allclose(fused, base, rtol=1e-4, atol=1e-6)
