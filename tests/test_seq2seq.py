"""Encoder–decoder transformer (nn/seq2seq.py): decoder causality,
padded-source invariance, cross-attention liveness, cached-decode parity
with the teacher-forced forward, Learner training on a sequence-reversal
task, and int8-KV-cache composition."""

import types

import jax
import jax.numpy as jnp
import numpy as np

from neuralnetworklibrary_tpu.nn.seq2seq import (
    Seq2SeqCrossEntropyLoss,
    TransformerSeq2Seq,
    seq2seq_collate,
    seq2seq_generate,
)

V, PAD, BOS, EOS = 30, 0, 1, 2


def _model_and_params(seed=0, **kw):
    cfg = dict(vocab_size=V, pad_token=PAD, d_model=32, n_heads=4,
               enc_layers=2, dec_layers=2, max_src_len=32, max_len=32,
               drop=0.0)
    cfg.update(kw)
    model = TransformerSeq2Seq(**cfg)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 4), jnp.int32),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    return model, params


def _fwd(model, params, src, tgt):
    out = model.apply({"params": params}, jnp.asarray(src, jnp.int32),
                      jnp.asarray(tgt, jnp.int32))
    return np.asarray(out[0])


def test_decoder_causality():
    """Perturbing target token j leaves logits at positions < j unchanged."""
    model, params = _model_and_params()
    rng = np.random.default_rng(0)
    src = rng.integers(3, V, (2, 6))
    tgt = rng.integers(3, V, (2, 8))
    base = _fwd(model, params, src, tgt)
    tgt2 = tgt.copy()
    tgt2[:, 5] = (tgt2[:, 5] + 7) % V
    pert = _fwd(model, params, src, tgt2)
    np.testing.assert_allclose(base[:, :5], pert[:, :5], atol=1e-5)
    assert np.abs(base[:, 5:] - pert[:, 5:]).max() > 1e-4


def test_source_padding_is_inert():
    """Extending the source with extra pad columns changes nothing: pad
    keys are masked in encoder self-attention AND in cross-attention."""
    model, params = _model_and_params()
    rng = np.random.default_rng(1)
    src = rng.integers(3, V, (2, 5))
    tgt = rng.integers(3, V, (2, 6))
    base = _fwd(model, params, src, tgt)
    padded = np.concatenate([src, np.full((2, 4), PAD)], axis=1)
    np.testing.assert_allclose(base, _fwd(model, params, padded, tgt),
                               atol=1e-5)


def test_cross_attention_is_live():
    """Different sources give different target logits (the decoder really
    reads the memory)."""
    model, params = _model_and_params()
    rng = np.random.default_rng(2)
    tgt = rng.integers(3, V, (1, 6))
    a = _fwd(model, params, rng.integers(3, V, (1, 5)), tgt)
    b = _fwd(model, params, rng.integers(3, V, (1, 5)), tgt)
    assert np.abs(a - b).max() > 1e-3


def test_cached_decode_matches_teacher_forcing():
    """Greedy cached generation re-fed through the full teacher-forced
    forward reproduces itself: argmax of the full forward at every
    position equals the token the cache path emitted."""
    model, params = _model_and_params(seed=4)
    rng = np.random.default_rng(3)
    src = rng.integers(3, V, (2, 7))
    n = 6
    toks = np.asarray(seq2seq_generate(model, params, src, n, bos=BOS))
    tgt_in = np.concatenate([np.full((2, 1), BOS), toks[:, :-1]], axis=1)
    logits = _fwd(model, params, src, tgt_in)
    np.testing.assert_array_equal(np.argmax(logits, -1), toks)


def test_collate_layout():
    pairs = [([5, 6, 7], [8, 9]), ([10], [11, 12, 13])]
    src, tin, tout = seq2seq_collate(pairs, PAD, BOS, EOS)
    np.testing.assert_array_equal(src, [[5, 6, 7], [10, 0, 0]])
    np.testing.assert_array_equal(tin, [[1, 8, 9, 0], [1, 11, 12, 13]])
    np.testing.assert_array_equal(tout, [[8, 9, 2, 0], [11, 12, 13, 2]])


def test_learner_trains_reversal():
    """fit on tgt = reversed(src): loss collapses and greedy generation
    reverses held-out sequences."""
    from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
    from neuralnetworklibrary_tpu.learner import Learner

    rng = np.random.default_rng(0)
    L = 6
    srcs = rng.integers(3, V, (512, L))
    pairs = [(s.tolist(), s.tolist()[::-1]) for s in srcs]
    src, tin, tout = seq2seq_collate(pairs, PAD, BOS, EOS)
    ds = ArrayDataset(src, tin, tout)
    data = types.SimpleNamespace(
        target_type="lm", bs=64,
        train_dl=DataLoader(ds, 64, shuffle=True, prefetch=0),
        val_dl=DataLoader(ds, 64, prefetch=0), train_ds=ds, val_ds=ds)
    model = TransformerSeq2Seq(vocab_size=V, pad_token=PAD, d_model=64,
                               n_heads=4, enc_layers=2, dec_layers=2,
                               max_src_len=16, max_len=16, drop=0.0)
    learner = Learner("/tmp/test_seq2seq", data, model, "Adam2",
                      loss_func=Seq2SeqCrossEntropyLoss(PAD), seed=0)
    it = iter(data.train_dl)
    losses = []
    for step in range(60):
        try:
            b = next(it)
        except StopIteration:
            it = iter(data.train_dl)
            b = next(it)
        losses.append(float(learner.train1minibatch(b, 3e-3)))
    assert losses[-1] < losses[0] / 4, (losses[0], losses[-1])

    test_src = rng.integers(3, V, (8, L))
    toks = np.asarray(seq2seq_generate(model, learner.params, test_src,
                                       L, bos=BOS))
    acc = float((toks == test_src[:, ::-1]).mean())
    assert acc > 0.85, acc


def test_tensor_parallel_matches_dp():
    """dp8 and dp4×tp2 under seq2seq_param_rule produce the same Learner
    loss trajectory — the Megatron split of the encoder/decoder blocks and
    the cross-attention q/kv never changes numerics — and the sharding is
    real (qkv and cross-kv kernels are not fully replicated)."""
    from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
    from neuralnetworklibrary_tpu.learner import Learner
    from neuralnetworklibrary_tpu.nn.seq2seq import seq2seq_param_rule
    from neuralnetworklibrary_tpu.parallel.mesh import get_mesh, get_mesh_2d

    rng = np.random.default_rng(0)
    srcs = rng.integers(3, V, (128, 6))
    pairs = [(s.tolist(), s.tolist()[::-1]) for s in srcs]
    src, tin, tout = seq2seq_collate(pairs, PAD, BOS, EOS)
    ds = ArrayDataset(src, tin, tout)

    def train(mesh, rule):
        data = types.SimpleNamespace(
            target_type="lm", bs=32,
            train_dl=DataLoader(ds, 32, shuffle=False, prefetch=0),
            val_dl=DataLoader(ds, 32, prefetch=0), train_ds=ds, val_ds=ds)
        model = TransformerSeq2Seq(vocab_size=V, pad_token=PAD, d_model=32,
                                   n_heads=4, enc_layers=2, dec_layers=2,
                                   max_src_len=16, max_len=16, drop=0.0)
        learner = Learner("/tmp/test_s2s_tp", data, model, "Adam2",
                          loss_func=Seq2SeqCrossEntropyLoss(PAD),
                          mesh=mesh, seed=0, param_sharding=rule)
        it = iter(data.train_dl)
        return [float(learner.train1minibatch(next(it), 3e-3))
                for _ in range(4)], learner

    dp_losses, _ = train(get_mesh(8), None)
    mesh = get_mesh_2d(4, 2)
    tp_losses, learner = train(mesh, seq2seq_param_rule(mesh))
    np.testing.assert_allclose(tp_losses, dp_losses, rtol=2e-3, atol=1e-4)
    qkv = learner.params["enc_block_0"]["attn"]["qkv"]["kernel"]
    ckv = learner.params["dec_block_0"]["cross"]["kv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated
    assert not ckv.sharding.is_fully_replicated


def test_kv_quant_composes():
    """The decoder self-attn cache quantizes: generation runs, the cache
    leaves are int8 + scales, and logits track the exact path."""
    model, params = _model_and_params(seed=6)
    qmodel, _ = _model_and_params(seed=6, kv_quant=True)
    rng = np.random.default_rng(5)
    src = rng.integers(3, V, (1, 5))

    from neuralnetworklibrary_tpu.nn.seq2seq import init_seq2seq_cache
    cq = init_seq2seq_cache(qmodel, 1)
    kv = [x for x in jax.tree_util.tree_leaves(cq) if x.ndim == 4]
    assert kv and all(x.dtype == jnp.int8 for x in kv)

    te = np.asarray(seq2seq_generate(model, params, src, 5, bos=BOS))
    tq = np.asarray(seq2seq_generate(qmodel, params, src, 5, bos=BOS))
    assert te.shape == tq.shape == (1, 5)


def test_beam_search():
    """beam=1 equals greedy seq2seq_generate; wider beams never score
    worse than greedy under the model's own log-probs."""
    from neuralnetworklibrary_tpu.nn.seq2seq import seq2seq_beam_search

    model, params = _model_and_params(seed=8)
    rng = np.random.default_rng(7)
    src = rng.integers(3, V, (2, 6))
    greedy = np.asarray(seq2seq_generate(model, params, src, 5, bos=BOS))
    b1, s1 = seq2seq_beam_search(model, params, src, 5, bos=BOS, beam=1)
    np.testing.assert_array_equal(np.asarray(b1), greedy)
    _, s4 = seq2seq_beam_search(model, params, src, 5, bos=BOS, beam=4)
    assert (np.asarray(s4) >= np.asarray(s1) - 1e-5).all()


def test_t5_decoder_flash_matches_einsum():
    """TransformerSeq2Seq(pos_embedding='relative', flash_attention=True):
    the decoder's causal self-attention rides the flash kernel WITH the
    batch-shared relative bias (r4) and equals the einsum path."""
    from neuralnetworklibrary_tpu.nn.seq2seq import TransformerSeq2Seq

    V, T = 40, 128
    kw = dict(vocab_size=V, pad_token=0, d_model=32, n_heads=4,
              enc_layers=1, dec_layers=2, max_src_len=16, max_len=T,
              drop=0.0, pos_embedding="relative", norm="rmsnorm")
    me = TransformerSeq2Seq(**kw)
    mf = TransformerSeq2Seq(**kw, flash_attention=True)
    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.integers(1, V, (2, 12)), jnp.int32)
    tgt = jnp.asarray(rng.integers(1, V, (2, T)), jnp.int32)
    variables = me.init(jax.random.PRNGKey(0), src, tgt)
    le = me.apply(variables, src, tgt)[0]
    lf = mf.apply(variables, src, tgt)[0]
    np.testing.assert_allclose(np.asarray(lf), np.asarray(le),
                               rtol=3e-4, atol=3e-4)
