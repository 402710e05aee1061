"""Activation parity: a random-init HuggingFace T5 (torch, CPU) and the
converted TransformerSeq2Seq produce the same logits — the
pretrained-load proof for the encoder–decoder family (same pattern as
test_llama_parity.py: no weight downloads; what's validated is the
ARCHITECTURE — relative position biases, RMSNorm, unscaled attention via
the sqrt(hd)-folded q kernels, relu vs GEGLU MLPs, tied-logit scaling —
and the converter)."""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neuralnetworklibrary_tpu.nn.seq2seq import (  # noqa: E402
    Seq2SeqCrossEntropyLoss,
    TransformerSeq2Seq,
    seq2seq_collate,
    seq2seq_generate,
    t5_relative_bucket,
)
from neuralnetworklibrary_tpu.utils.t5_convert import load_t5  # noqa: E402

LE, LD, H, D, F, V = 2, 3, 4, 64, 96, 60
M = 48


def _hf_model(seed=0, gated=False, tie=True):
    cfg = transformers.T5Config(
        vocab_size=V, d_model=D, d_kv=D // H, d_ff=F, num_layers=LE,
        num_decoder_layers=LD, num_heads=H, dropout_rate=0.0,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=tie, decoder_start_token_id=0,
        pad_token_id=0, eos_token_id=1)
    torch.manual_seed(seed)
    m = transformers.T5ForConditionalGeneration(cfg)
    m.eval()
    return m


def _load(hf):
    return load_t5(hf.state_dict(), enc_layers=LE, dec_layers=LD,
                   n_heads=H, d_model=D, d_ff=F, vocab_size=V,
                   max_src_len=M, max_len=M)


def _hf_logits(hf, src, tgt, src_mask=None):
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(src, dtype=torch.long),
                 attention_mask=(None if src_mask is None else
                                 torch.tensor(src_mask, dtype=torch.long)),
                 decoder_input_ids=torch.tensor(tgt, dtype=torch.long))
    return out.logits.numpy()


def test_bucket_matches_hf():
    """The bucketing function is bit-identical to HF's
    _relative_position_bucket over a wide distance range, both ways."""
    hf_bucket = (transformers.models.t5.modeling_t5
                 .T5Attention._relative_position_bucket)
    rel = np.arange(-300, 301, dtype=np.int64)
    for bidir in (True, False):
        want = hf_bucket(torch.tensor(rel), bidirectional=bidir,
                         num_buckets=32, max_distance=128).numpy()
        got = np.asarray(t5_relative_bucket(rel, bidir, 32, 128))
        np.testing.assert_array_equal(got, want)


def test_t5_logits_parity():
    """T5 v1.0 flavor (relu MLP, tied embeddings + d_model^-0.5 logit
    scale): full teacher-forced logits match HF."""
    hf = _hf_model()
    model, params = _load(hf)
    assert model.tied_decoder and model.mlp_act == "relu"
    assert model.logit_scale == pytest.approx(D ** -0.5)
    rng = np.random.default_rng(0)
    src = rng.integers(2, V, (2, 13)).astype(np.int32)   # no pads
    tgt = rng.integers(2, V, (2, 9)).astype(np.int32)
    want = _hf_logits(hf, src, tgt)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(src),
                                 jnp.asarray(tgt))[0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flan_t5_logits_parity():
    """Flan/v1.1 flavor (GEGLU MLP, untied lm_head, no logit scale)."""
    hf = _hf_model(seed=3, gated=True, tie=False)
    model, params = _load(hf)
    assert not model.tied_decoder and "lm_head" in params
    assert model.gated_mlp and model.mlp_act == "gelu"
    assert model.logit_scale == 1.0
    rng = np.random.default_rng(1)
    src = rng.integers(2, V, (2, 17)).astype(np.int32)
    tgt = rng.integers(2, V, (2, 7)).astype(np.int32)
    want = _hf_logits(hf, src, tgt)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(src),
                                 jnp.asarray(tgt))[0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_t5_padded_source_parity():
    """Padded sources: our pad_token mask reproduces HF's attention_mask
    on the valid target rows."""
    hf = _hf_model(seed=5)
    model, params = _load(hf)
    rng = np.random.default_rng(2)
    src = rng.integers(2, V, (2, 12)).astype(np.int32)
    src[0, 8:] = 0
    src[1, 5:] = 0
    mask = (src != 0).astype(np.int64)
    tgt = rng.integers(2, V, (2, 6)).astype(np.int32)
    want = _hf_logits(hf, src, tgt, src_mask=mask)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(src),
                                 jnp.asarray(tgt))[0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_t5_greedy_generation_parity():
    """Greedy decode through OUR cached path (relative biases recomputed
    per offset against the cache strip) token-for-token equals an HF
    teacher-forced greedy loop (eos-free oracle — random-init models emit
    arbitrary ids)."""
    hf = _hf_model(seed=7)
    model, params = _load(hf)
    rng = np.random.default_rng(3)
    src = rng.integers(2, V, (2, 10)).astype(np.int32)
    n = 7
    dec = np.zeros((2, 1), np.int64)           # decoder_start_token_id = 0
    for _ in range(n):
        with torch.no_grad():
            lg = hf(input_ids=torch.tensor(src, dtype=torch.long),
                    decoder_input_ids=torch.tensor(dec)).logits
        dec = np.concatenate(
            [dec, lg[:, -1].argmax(-1, keepdim=True).numpy()], axis=1)
    want = dec[:, 1:]
    got = np.asarray(seq2seq_generate(model, params, src, n, bos=0, k=1))
    np.testing.assert_array_equal(got, want)


def test_t5_config_trains_reversal():
    """The T5-flavored seq2seq (relative positions + RMSNorm + GEGLU,
    untied) trains through the Learner on sequence reversal, and greedy
    generation regenerates the learned mapping — i.e. the cached decode
    path (per-offset relative biases against the cache strip) is
    consistent with the teacher-forced training path on TRAINED weights,
    not just at HF-init (the parity tests above).  Generation is scored on
    TRAINING sources: at this size the relative-bias model memorizes
    reversal rather than generalizing it (reversal needs absolute
    positions, which relative buckets only encode via the sequence
    boundary — held-out accuracy stays near chance however low the train
    loss; the absolute-position twin in test_seq2seq.py generalizes)."""
    from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
    from neuralnetworklibrary_tpu.learner import Learner

    rng = np.random.default_rng(0)
    L = 6
    srcs = rng.integers(3, 30, (384, L))
    pairs = [(s.tolist(), s.tolist()[::-1]) for s in srcs]
    src, tin, tout = seq2seq_collate(pairs, 0, 1, 2)
    ds = ArrayDataset(src, tin, tout)
    data = types.SimpleNamespace(
        target_type="lm", bs=64,
        train_dl=DataLoader(ds, 64, shuffle=True, prefetch=0),
        val_dl=DataLoader(ds, 64, prefetch=0), train_ds=ds, val_ds=ds)
    model = TransformerSeq2Seq(
        vocab_size=30, pad_token=0, d_model=64, n_heads=4, enc_layers=2,
        dec_layers=2, max_src_len=16, max_len=16, drop=0.0,
        pos_embedding="relative", norm="rmsnorm", gated_mlp=True,
        mlp_act="gelu", tied_decoder=False)
    learner = Learner("/tmp/test_t5_cfg", data, model, "Adam2",
                      loss_func=Seq2SeqCrossEntropyLoss(0), seed=0)
    it = iter(data.train_dl)
    losses = []
    for _ in range(300):
        try:
            b = next(it)
        except StopIteration:
            it = iter(data.train_dl)
            b = next(it)
        losses.append(float(learner.train1minibatch(b, 3e-3)))
    assert losses[-1] < losses[0] / 10, (losses[0], losses[-1])
    toks = np.asarray(seq2seq_generate(model, learner.params,
                                       src[:64, :L], L, bos=1))
    acc = float((toks == srcs[:64, ::-1]).mean())
    assert acc > 0.9, acc
