"""Sequence packing: pack_documents bin-packing invariants, EXACT
per-document logits under TransformerLM(reset_at=...) (block-diagonal
attention + per-segment positions, learned-pos and RoPE), the packed loss's
token masking, and end-to-end Learner training on packed rows."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
from neuralnetworklibrary_tpu.data.packing import pack_documents
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.nn.transformer import (
    PackedSeqCrossEntropyLoss,
    TransformerLM,
)
from neuralnetworklibrary_tpu.parallel.mesh import get_mesh

V, EOS, PAD = 50, 0, 1


def _model_and_params(seed=0, **kw):
    cfg = dict(vocab_size=V, d_model=32, n_heads=4, n_layers=2,
               max_len=64, drop=0.0, reset_at=EOS)
    cfg.update(kw)
    model = TransformerLM(**cfg)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    return model, params


def test_pack_documents_roundtrip():
    rng = np.random.default_rng(0)
    docs = [rng.integers(2, V, n).tolist() for n in (5, 11, 3, 7, 2, 9)]
    x, y, pad = pack_documents(docs, 16, EOS, pad_token=PAD)
    assert pad == PAD and x.shape == y.shape and x.shape[1] == 16
    # every document appears exactly once, terminated by eos, and y is x
    # shifted by one within the row
    flat = []
    for row_x, row_y in zip(x, y):
        valid = row_y != PAD
        n = int(valid.sum())
        assert valid[:n].all() and not valid[n:].any()  # contiguous prefix
        np.testing.assert_array_equal(row_x[1:n], row_y[:n - 1])
        flat.extend(row_x[:n].tolist() + [int(row_y[n - 1])])
    stream, docs_seen = [t for t in flat], []
    cur = []
    for t in stream:
        if t == EOS:
            docs_seen.append(cur)
            cur = []
        else:
            cur.append(t)
    assert not cur
    assert sorted(map(tuple, docs_seen)) == sorted(map(tuple, docs))
    with pytest.raises(ValueError):
        pack_documents([list(range(2, 40))], 16, EOS)


@pytest.mark.parametrize("kw", [
    {},                                  # learned positions
    {"pos_embedding": "rope"},           # rotary positions restart too
    {"n_kv_heads": 2, "mlp": "swiglu"},  # GQA + gated MLP
])
def test_packed_logits_match_standalone(kw):
    """A document's logits inside a packed row equal its standalone forward
    exactly: attention never crosses the separator and positions restart."""
    model, params = _model_and_params(**kw)
    rng = np.random.default_rng(1)
    d1 = rng.integers(2, V, 9).tolist()
    d2 = rng.integers(2, V, 13).tolist()
    row = d1 + [EOS] + d2 + [EOS]
    row = row + [PAD] * (32 - len(row))
    packed = jnp.asarray([row], jnp.int32)
    alone = jnp.asarray([d2 + [EOS]], jnp.int32)

    logits_packed = model.apply({"params": params}, packed)[0]
    logits_alone = model.apply({"params": params}, alone)[0]
    s = len(d1) + 1                                     # d2's start in the row
    np.testing.assert_allclose(
        np.asarray(logits_packed[0, s:s + len(d2) + 1]),
        np.asarray(logits_alone[0]), rtol=1e-5, atol=1e-5)
    # without reset_at the same row contaminates: logits differ
    plain, _ = _model_and_params(reset_at=None, **kw)
    lp = plain.apply({"params": params}, packed)[0]
    assert not np.allclose(np.asarray(lp[0, s:s + len(d2) + 1]),
                           np.asarray(logits_alone[0]), atol=1e-3)


def test_packed_loss_masks_pad_targets():
    logits = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, 8, V)), jnp.float32)
    target = np.full((2, 8), PAD, np.int32)
    target[0, :5] = [7, 8, 9, EOS, 3]
    target[1, :2] = [11, EOS]
    loss_fn = PackedSeqCrossEntropyLoss(PAD)
    loss = loss_fn((logits, None), jnp.asarray(target))
    logp = jax.nn.log_softmax(np.asarray(logits), axis=-1)
    picks = [logp[0, i, target[0, i]] for i in range(5)] + [
        logp[1, i, target[1, i]] for i in range(2)]
    np.testing.assert_allclose(float(loss), -np.mean(picks), rtol=1e-6)
    # a (B,) row mask composes in
    loss0 = loss_fn((logits, None), jnp.asarray(target),
                    mask=jnp.asarray([1.0, 0.0]))
    np.testing.assert_allclose(float(loss0), -np.mean(picks[:5]), rtol=1e-6)


def test_packed_learner_trains():
    """Packed mod-V documents through the Learner: the model learns the
    in-document successor rule from many short docs per row."""
    rng = np.random.default_rng(3)
    docs = []
    for _ in range(600):
        n = int(rng.integers(4, 12))
        start = int(rng.integers(2, V))
        d = [(start + i - 2) % (V - 2) + 2 for i in range(n)]
        docs.append(d)
    x, y, pad = pack_documents(docs, 32, EOS, pad_token=PAD)
    n_rows = (len(x) // 32) * 32
    ds = ArrayDataset(x[:n_rows], y[:n_rows])
    data = types.SimpleNamespace(
        target_type="lm", bs=32,
        train_dl=DataLoader(ds, 32, shuffle=True, prefetch=0),
        val_dl=DataLoader(ds, 32, prefetch=0), train_ds=ds, val_ds=ds)
    model = TransformerLM(vocab_size=V, d_model=64, n_heads=4, n_layers=2,
                          max_len=32, drop=0.0, reset_at=EOS)
    learner = Learner("/tmp/test_packing", data, model, "Adam",
                      loss_func=PackedSeqCrossEntropyLoss(pad),
                      mesh=get_mesh(8), seed=0)
    learner.fit_one_cycle(5e-3, 10)
    val = [row[1] for row in learner.values]
    assert val[-1] < 0.35 * val[0], val


# --------------------------------------------- packed × flash kernel (r5)


def test_packed_flash_matches_einsum():
    """reset_at packing on the FLASH path: the kernel enforces the
    block-diagonal-∧-causal mask via per-query document starts
    (k_pos >= start_q) — logits and parameter gradients equal the einsum
    packed model, and a document's logits still equal its standalone
    forward."""
    import jax.flatten_util

    kw = dict(pos_embedding="rope")
    m_ein, params = _model_and_params(**kw)
    m_fla, _ = _model_and_params(flash_attention=True, **kw)
    rng = np.random.default_rng(3)
    d1 = rng.integers(2, V, 9).tolist()
    d2 = rng.integers(2, V, 13).tolist()
    row = d1 + [EOS] + d2 + [EOS]
    row = row + [PAD] * (32 - len(row))
    packed = jnp.asarray([row, row], jnp.int32)

    le = m_ein.apply({"params": params}, packed)[0]
    lf = m_fla.apply({"params": params}, packed)[0]
    np.testing.assert_allclose(np.asarray(lf), np.asarray(le),
                               rtol=3e-4, atol=3e-4)

    # standalone-document equality through the kernel
    alone = jnp.asarray([d2 + [EOS]], jnp.int32)
    la = m_fla.apply({"params": params}, alone)[0]
    s = len(d1) + 1
    np.testing.assert_allclose(np.asarray(lf[0, s:s + len(d2) + 1]),
                               np.asarray(la[0]), rtol=3e-4, atol=3e-4)

    def loss(model):
        def f(p):
            return jnp.mean(jnp.square(
                model.apply({"params": p}, packed)[0] - 1.0))
        return f

    ge = jax.grad(loss(m_ein))(params)
    gf = jax.grad(loss(m_fla))(params)
    fe, _ = jax.flatten_util.ravel_pytree(ge)
    ff, _ = jax.flatten_util.ravel_pytree(gf)
    np.testing.assert_allclose(np.asarray(ff), np.asarray(fe),
                               rtol=2e-3, atol=1e-5)
