"""Text stack: tokenizer rules, numericalize, loaders, LSTM torch parity,
LM + classifier end-to-end training."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from neuralnetworklibrary_tpu.applications.text import (
    LanguageModelAccuracy,
    LanguageModelDataLoader,
    LanguageModelDataObj,
    LanguageModelNet,
    RegSeqCrossEntropyLoss,
    SeqCrossEntropyLoss,
    TextClassificationAccuracy,
    TextClassificationDataObj,
    TextClassificationNet,
    TextDataset,
    Tokenizer,
    WeightDropLSTM,
    numericalize,
    predict_from_string,
    tokenize,
)
from neuralnetworklibrary_tpu.learner import Learner


class TestTokenizer:
    def setup_method(self):
        self.tok = Tokenizer()

    def test_basic_split(self):
        assert self.tok.proc_text("Hello, world!") == ["hello", ",", "world", "!"]

    def test_char_rep_rule(self):
        # ≥4 repeated chars → 'tk_rep N c' (Text.py:46-50)
        out = self.tok.proc_text("sooooo good")
        assert out[:4] == ["s", "tk_rep", "5", "o"]

    def test_word_rep_rule(self):
        out = self.tok.proc_text("why why why why not")
        assert out[:3] == ["tk_wrep", "4", "why"]

    def test_caps_rule(self):
        # ALLCAPS len>2 → 't_up word' (Text.py:61-68)
        assert self.tok.proc_text("this is AMAZING") == ["this", "is", "t_up", "amazing"]
        assert self.tok.proc_text("OK then") == ["ok", "then"]  # len<=2 untouched

    def test_br_and_slash(self):
        assert "\n" not in " ".join(self.tok.proc_text("a<br/>b"))
        assert self.tok.proc_text("either/or") == ["either", "/", "or"]

    def test_contractions(self):
        assert self.tok.proc_text("don't") == ["do", "n't"]
        assert self.tok.proc_text("it's fine") == ["it", "'s", "fine"]


class TestNumericalize:
    def test_specials_and_unknown(self):
        ss = [["a", "b", "a"], ["b", "c", "a"]]
        nums, stoi = numericalize(ss, min_freq=2)
        assert stoi["_unk_"] == 0 and stoi["_pad_"] == 1
        assert stoi["_bos_"] == 2 and stoi["_eos_"] == 3
        # 'c' occurs once < min_freq → unk
        assert nums[1][1] == 0

    def test_stoi_reuse(self):
        _, stoi = numericalize([["x", "x", "y", "y"]], min_freq=1)
        nums, stoi2 = numericalize([["y", "z"]], stoi=stoi)
        assert stoi2 is stoi
        assert nums[0][1] == 0  # unseen 'z' → unk


def _lm_corpus(tmp_path, n_texts=60, length=40):
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [" ".join(words[j % len(words)] for j in range(length))
             for _ in range(n_texts)]
    path = str(tmp_path / "lm.csv")
    pd.DataFrame({"text": texts}).to_csv(path, index=False)
    return path


class TestLMLoader:
    def test_shapes_and_shift(self, tmp_path):
        path = _lm_corpus(tmp_path)
        data = LanguageModelDataObj.from_csv(bs=8, bptt=16, csv_train=path)
        for batch in data.val_dl:
            x, y = batch.xs[0], batch.y
            assert x.shape == (8, 16) and y.shape == (8, 16)
            np.testing.assert_array_equal(x[:, 1:], y[:, :-1])  # y = x shifted
        # non-random loader: offset 0, deterministic
        b1 = next(iter(data.val_dl))
        b2 = next(iter(data.val_dl))
        np.testing.assert_array_equal(b1.xs[0], b2.xs[0])

    def test_epoch_reshuffle(self, tmp_path):
        path = _lm_corpus(tmp_path)
        data = LanguageModelDataObj.from_csv(bs=8, bptt=16, csv_train=path)
        e0 = np.concatenate([b.xs[0] for b in data.train_dl], axis=1)
        e1 = np.concatenate([b.xs[0] for b in data.train_dl], axis=1)
        assert e0.shape[1] >= 16
        # offsets/text order change between epochs
        assert data.train_dl.epoch == 2


class TestClassifierLoader:
    def test_bucketing(self):
        texts = ["w " * n for n in (5, 6, 90, 100, 300, 310, 7, 95)]
        ds = TextDataset(list(texts), [0, 0, 1, 1, 1, 1, 0, 1], stoi=None)
        obj = TextClassificationDataObj(ds, ds, None, bs=4)
        widths = set()
        for batch in obj.val_dl:
            x = batch.xs[0]
            assert x.shape[0] == 4
            widths.add(x.shape[1])
            assert batch.mask.sum() == batch.n_valid
        assert widths <= {64, 128, 256, 512}  # static bucket shapes only


class TestLSTMTorchParity:
    def test_matches_torch_lstm(self):
        torch = pytest.importorskip("torch")
        B, T, I, H = 3, 7, 5, 11
        tl = torch.nn.LSTM(I, H, num_layers=1, batch_first=True)
        x = np.random.default_rng(0).standard_normal((B, T, I)).astype(np.float32)
        h0 = np.zeros((1, B, H), np.float32)
        with torch.no_grad():
            ref, (hT, cT) = tl(torch.from_numpy(x),
                               (torch.from_numpy(h0), torch.from_numpy(h0)))
        sd = tl.state_dict()
        params = {
            "w_ih": sd["weight_ih_l0"].numpy().T,
            "w_hh": sd["weight_hh_l0"].numpy().T,
            "b_ih": sd["bias_ih_l0"].numpy(),
            "b_hh": sd["bias_hh_l0"].numpy(),
        }
        model = WeightDropLSTM(H, 0.0)
        out, h, c = model.apply({"params": params}, jnp.asarray(x),
                                jnp.zeros((B, H)), jnp.zeros((B, H)), train=False)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(h), hT.numpy()[0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(c), cT.numpy()[0], atol=1e-5)


class TestRegLoss:
    def test_terms(self):
        B, T, V = 2, 4, 6
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
        enc = jnp.asarray(rng.standard_normal((B, T, 3)), jnp.float32)
        y = jnp.asarray(rng.integers(0, V, (B, T)))
        base = float(SeqCrossEntropyLoss()((logits, enc), y))
        reg = float(RegSeqCrossEntropyLoss(alpha=2.0, beta=1.0)((logits, enc), y))
        ar = 2.0 * float(jnp.mean(enc ** 2))
        tar = 1.0 * float(jnp.mean((enc[:, 1:] - enc[:, :-1]) ** 2))
        assert reg == pytest.approx(base + ar + tar, rel=1e-5)


def _small_lm(data):
    return LanguageModelNet(vocab_size=len(data.stoi), pad_token=data.stoi["_pad_"],
                            emb_dim=16, hidden_size=32, num_layers=2)


class TestLanguageModel:
    def test_training_learns_pattern(self, tmp_path):
        data = LanguageModelDataObj.from_csv(bs=8, bptt=16,
                                             csv_train=_lm_corpus(tmp_path))
        learner = Learner(str(tmp_path), data, _small_lm(data), optimizer="Adam",
                          loss_func=RegSeqCrossEntropyLoss(alpha=0.0, beta=0.0))
        assert list(learner.state.keys()) == ["carry"]
        assert learner.n_groups == 2
        v0 = learner.evaluate("val", metrics=[LanguageModelAccuracy()])
        # LSTMs take a few hundred steps to escape the unigram plateau
        learner.fit(1e-2, 30)
        v1 = learner.evaluate("val", metrics=[LanguageModelAccuracy()])
        assert v1[0] < 0.4 * v0[0]   # the corpus is fully periodic
        assert v1[1][0] > 0.8

    def test_generation(self, tmp_path):
        data = LanguageModelDataObj.from_csv(bs=8, bptt=16,
                                             csv_train=_lm_corpus(tmp_path))
        learner = Learner(str(tmp_path), data, _small_lm(data), optimizer="Adam",
                          loss_func=RegSeqCrossEntropyLoss(alpha=0.0, beta=0.0))
        learner.fit(1e-2, 30)
        s = predict_from_string(learner, "alpha beta", 5, k=1)
        toks = s.split()
        assert len(toks) == 7
        # greedy continuation follows the periodic pattern
        assert toks[2] == "gamma"


def _clf_corpus(n=96, seed=0):
    rng = np.random.default_rng(seed)
    pos_words = ["great", "wonderful", "excellent"]
    neg_words = ["terrible", "awful", "poor"]
    filler = ["the", "movie", "was", "very", "and", "plot"]
    texts, labels = [], []
    for i in range(n):
        lab = int(rng.integers(0, 2))
        pool = pos_words if lab else neg_words
        L = int(rng.integers(8, 20))
        words = [str(rng.choice(filler + pool)) for _ in range(L)] + [str(rng.choice(pool))]
        texts.append(" ".join(words))
        labels.append("pos" if lab else "neg")
    return texts, labels


class TestClassifier:
    def test_training(self, tmp_path):
        texts, labels = _clf_corpus()
        ds = TextDataset(texts, labels, stoi=None)
        train_ds, val_ds = ds.split_train_val(val_frac=0.25)
        data = TextClassificationDataObj(train_ds, val_ds, None, bs=8)
        model = TextClassificationNet(
            vocab_size=len(data.stoi), num_classes=2, pad_token=data.stoi["_pad_"],
            emb_dim=16, hidden_size=24, num_layers=2, attn_size=16,
            enc_drops=(0.0, 0.0, 0.0, 0.0), fc_drops=(0.0, 0.0))
        learner = Learner(str(tmp_path), data, model, optimizer="Adam",
                          loss_func=RegSeqCrossEntropyLoss(alpha=0.0, beta=0.0))
        assert learner.n_groups == 3
        learner.fit(5e-3, 10, metrics=[TextClassificationAccuracy()],
                    save_name="best", save_method="best")
        learner.load("best")
        res = learner.evaluate("val", metrics=[TextClassificationAccuracy()])
        assert res[-1][0] > 0.85

    def test_transfer_from_lm(self, tmp_path):
        data = LanguageModelDataObj.from_csv(bs=8, bptt=16,
                                             csv_train=_lm_corpus(tmp_path))
        lm_learner = Learner(str(tmp_path), data, _small_lm(data), optimizer="Adam",
                             loss_func=RegSeqCrossEntropyLoss(0.0, 0.0))
        model, transfer = TextClassificationNet.from_language_model(
            lm_learner, num_classes=2)
        # classifier structural params match LM encoder dims
        assert model.vocab_size == len(data.stoi)
        var = model.init(jax.random.PRNGKey(0),
                         jnp.zeros((2, 8), jnp.int32), train=False)
        new_params = transfer(var["params"])
        lmp = jax.device_get(lm_learner.params)
        np.testing.assert_array_equal(
            np.asarray(new_params["enc"]["lstm_0"]["w_ih"]),
            np.asarray(lmp["enc"]["lstm_0"]["w_ih"]))


# ------------------------------------------------- tokenizer golden parity

_GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures",
                       "tokenizer_golden.json")


def _golden_cases():
    import json

    with open(_GOLDEN) as f:
        return json.load(f)["cases"]


class TestTokenizerGolden:
    """Golden fixtures vs the reference pipeline (fastai pre-rules +
    spacy-'en' tokenization, Text.py:28-75), hand-derived from the spacy
    English rules.  Cases with an 'ours' field are documented residual
    divergences (spacy abbreviation exceptions, email/URL whole tokens)."""

    def test_golden_fixtures(self):
        tok = Tokenizer()
        failures = []
        for case in _golden_cases():
            expected = case.get("ours", case["tokens"])
            got = tok.proc_text(case["text"])
            if got != expected:
                failures.append(f"  {case['text']!r}\n    want {expected}\n    got  {got}")
        assert not failures, "tokenizer divergences:\n" + "\n".join(failures)

    def test_vocab_hit_rate_vs_spacy_tokens(self):
        """Build a wt103-style vocab from the SPACY-expected token stream and
        measure the fraction of our tokens that hit it — quantifies the
        pretrained-LM vocab-miss risk from residual tokenizer divergence."""
        tok = Tokenizer()
        spacy_stream, our_stream = [], []
        for case in _golden_cases():
            spacy_stream += case["tokens"]
            our_stream += tok.proc_text(case["text"])
        vocab = set(spacy_stream)
        hits = sum(t in vocab for t in our_stream)
        hit_rate = hits / len(our_stream)
        # residual divergences (p.m./e.g./etc./mr. trailing periods, emails)
        # cost a handful of tokens; anything below 97% means a new regression
        assert hit_rate >= 0.97, f"vocab hit rate {hit_rate:.4f}"


def test_lm_loader_constant_batch_count_across_epochs():
    """The random per-epoch offset must never change the number of batches
    (schedules are sized num_epochs * len(dl); a varying count crashed
    fit_one_cycle mid-training on corpora where seqlen % bptt < bptt-1)."""
    from neuralnetworklibrary_tpu.applications.text import (
        LanguageModelDataLoader,
    )

    class DS:
        def __init__(self, n_tokens):
            rng = np.random.default_rng(0)
            self.texts = [list(rng.integers(0, 50, n_tokens))]
            self.num_tokens = n_tokens

    # 64*(549+1) tokens -> seqlen 549, bptt 75: naive counts vary 6-7 with
    # the offset; the loader must pin them
    dl = LanguageModelDataLoader(DS(64 * 550), 64, 75, random=True, seed=3)
    n = len(dl)
    for _ in range(8):  # 8 epochs, 8 offset draws
        batches = list(dl)
        assert len(batches) == n
        for b in batches:
            assert b.xs[0].shape == (64, 75) and b.y.shape == (64, 75)
