"""BERT family (nn/bert.py + utils/bert_convert.py): HF activation parity
(random-init torch oracle, no downloads), pad invariance, MLM pretraining
through the Learner, and classifier fine-tuning from the pretrained
backbone."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.nn.bert import (
    BertClassifier,
    BertMLM,
    BertModel,
    MLMAccuracy,
    MLMLoss,
    mlm_mask,
)

V, PAD, MASK = 50, 0, 3
CFG = dict(vocab_size=V, pad_token=PAD, d_model=32, n_heads=4, n_layers=2,
           max_len=32, drop=0.0)


def test_hf_activation_parity():
    """Converted random-init HF BertForMaskedLM reproduces our MLM logits
    and backbone outputs on padded, segmented batches."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertForMaskedLM

    from neuralnetworklibrary_tpu.utils.bert_convert import load_bert

    hf_cfg = BertConfig(
        vocab_size=V, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pad_token_id=PAD)
    torch.manual_seed(0)
    hf = BertForMaskedLM(hf_cfg).eval()
    model, params = load_bert(hf.state_dict(), n_layers=2, n_heads=4,
                              d_model=32, vocab_size=V, d_ff=64,
                              max_len=32, drop=0.0)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, V, (2, 9)).astype(np.int64)
    ids[0, 6:] = PAD                       # ragged padding
    tt = (rng.random((2, 9)) < 0.5).astype(np.int64)
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor((ids != PAD).astype(np.int64)),
                 token_type_ids=torch.tensor(tt))
    ours = model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                       jnp.asarray(tt, jnp.int32))
    got, want = np.asarray(ours[0]), out.logits.numpy()
    valid = ids != PAD                     # pad ROWS differ (HF masks pad
    np.testing.assert_allclose(            # queries too); parity on valid
        got[valid], want[valid], atol=2e-4)


def test_pad_invariance_and_pooler():
    model = BertModel(**CFG)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    rng = np.random.default_rng(1)
    ids = rng.integers(4, V, (2, 6)).astype(np.int32)
    h, pooled = model.apply({"params": params}, jnp.asarray(ids))
    padded = np.concatenate([ids, np.full((2, 5), PAD, np.int32)], axis=1)
    h2, pooled2 = model.apply({"params": params}, jnp.asarray(padded))
    np.testing.assert_allclose(np.asarray(h),
                               np.asarray(h2)[:, :6], atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled2),
                               atol=1e-5)


@pytest.fixture(scope="module")
def pretrained_mlm():
    """Train BertMLM on a recoverable synthetic task: every sequence
    repeats one token, so a masked position is predictable from any
    neighbor."""
    from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
    from neuralnetworklibrary_tpu.learner import Learner

    rng = np.random.default_rng(0)
    toks = rng.integers(4, V, 768)
    seqs = np.repeat(toks[:, None], 10, axis=1).astype(np.int64)
    masked, targets = mlm_mask(rng, seqs, V, MASK, p=0.25, special_tokens=4)
    ds = ArrayDataset(masked.astype(np.int32), targets.astype(np.int32))
    data = types.SimpleNamespace(
        target_type="lm", bs=64,
        train_dl=DataLoader(ds, 64, shuffle=True, prefetch=0),
        val_dl=DataLoader(ds, 64, prefetch=0), train_ds=ds, val_ds=ds)
    model = BertMLM(config=CFG)
    learner = Learner("/tmp/test_bert_mlm", data, model, "Adam2",
                      loss_func=MLMLoss(), seed=0)
    learner.fit_one_cycle(3e-3, 6)
    return model, learner


def test_mlm_pretraining_learns(pretrained_mlm):
    model, learner = pretrained_mlm
    res = learner.evaluate("val", metrics=[MLMAccuracy()])
    assert float(np.asarray(res[-1]).reshape(())) > 0.9, res


def test_classifier_finetunes_from_backbone(pretrained_mlm):
    """Graft the pretrained ``bert`` subtree into BertClassifier and learn
    token-identity classification (class = repeated token mod 4)."""
    from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
    from neuralnetworklibrary_tpu.learner import Learner

    _, mlm_learner = pretrained_mlm
    rng = np.random.default_rng(2)
    toks = rng.integers(4, V, 512)
    seqs = np.repeat(toks[:, None], 10, axis=1).astype(np.int32)
    ys = (toks % 4).astype(np.int32)
    ds = ArrayDataset(seqs, ys)
    data = types.SimpleNamespace(
        target_type="single_label", bs=64,
        train_dl=DataLoader(ds, 64, shuffle=True, prefetch=0),
        val_dl=DataLoader(ds, 64, prefetch=0), train_ds=ds, val_ds=ds)
    model = BertClassifier(num_classes=4, config=CFG)
    learner = Learner("/tmp/test_bert_clf", data, model, "Adam2", seed=0)
    # graft the pretrained backbone
    params = dict(learner.params)
    params["bert"] = mlm_learner.params["bert"]
    learner.set_params(params)
    learner.fit_one_cycle(3e-3, 4)
    res = learner.evaluate("val")
    assert float(res[-1]) > 0.9, res       # [loss, accuracy]


def test_mlm_mask_statistics():
    rng = np.random.default_rng(3)
    ids = rng.integers(4, V, (200, 20))
    masked, targets = mlm_mask(rng, ids, V, MASK, p=0.15, special_tokens=4)
    sel = targets >= 0
    frac = sel.mean()
    assert 0.10 < frac < 0.20, frac
    np.testing.assert_array_equal(targets[sel], ids[sel])
    np.testing.assert_array_equal(masked[~sel], ids[~sel])
    m = masked[sel]
    assert 0.7 < (m == MASK).mean() < 0.9          # ~80% [MASK]
    assert (m != ids[sel]).mean() > 0.8
