"""NLP: tokenization, LM/classification data, AWD-LSTM models, losses.

Rebuild of Applications/Text.py.  TPU-native design decisions:

- **Tokenizer**: the reference wraps spacy (Cython) with fastai pre-rules
  (Text.py:28-75).  Here the pre-rules are ported exactly and the base
  tokenizer is a pure-Python rule tokenizer with spacy-like English splitting
  (punctuation, contractions); multiprocessing fan-out preserved
  (tokenize_mp, Text.py:85-93).  All host-side.
- **LM loader** (Text.py:231-290): the reference randomly jitters bptt per
  batch, which under XLA would compile ~85 programs.  Equivalent
  decorrelation with ONE static shape: fixed (bs, bptt) windows + a random
  start offset and text-order reshuffle per epoch.
- **AWD-LSTM** (Text.py:441-651): no cuDNN on TPU — the LSTM layer is a
  ``jax.lax.scan`` whose input projection ``x @ W_ih`` for ALL timesteps is
  hoisted out of the loop as one big MXU matmul; only the (B,H)x(H,4H)
  recurrent matmul runs per step.  DropConnect on W_hh samples one mask per
  forward (replacing the raw-parameter re-registration trick,
  Text.py:486-513); locked/embedding dropout are broadcast masks.  The
  carried (h, c) live in a flax 'carry' variable collection that the Learner
  threads through its jitted steps, detached between windows
  (Text.py:547-550) — truncated BPTT.
- Layout is batch-major (B, T, ...) throughout (reference is time-major).
"""

from __future__ import annotations

import collections
import os
import re
from concurrent.futures import ProcessPoolExecutor
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from neuralnetworklibrary_tpu.data.loader import Batch
from neuralnetworklibrary_tpu.data.split import SplitTrainVal
from neuralnetworklibrary_tpu.nn.layers import FullyConnectedNet, he_normal


def correct_foldername(p: str) -> str:
    return p if p.endswith("/") else p + "/"


# ---------------------------------------------------------------------------
# (1) Tokenization / numericalization (Text.py:28-122)
# ---------------------------------------------------------------------------

# spacy-compatible English splitting (the reference tokenizes with
# spacy.load('en').tokenizer, Text.py:34; spacy is unavailable here so the
# rules are reproduced: contractions split off, hyphens between letters are
# infixes, numbers keep internal [,.:-] punctuation, ellipsis is one token,
# letter.letter compounds stay joined with the trailing period split off).
# Golden fixtures: tests/fixtures/tokenizer_golden.json.
_CONTRACTION_RE = re.compile(r"(\w)(n't|'s|'m|'re|'ve|'ll|'d)\b")
# spacy tokenizer_exceptions that survive do_caps lowercasing and matter for
# wt103 vocab hits: multi-token special cases
_SPECIAL_CASES = {
    "cannot": ["can", "not"],
    "gonna": ["gon", "na"],
    "gotta": ["got", "ta"],
    "wanna": ["wan", "na"],
    "lemme": ["lem", "me"],
    "gimme": ["gim", "me"],
    "outta": ["out", "ta"],
}
# abbreviation exceptions that KEEP their trailing period, like spacy's
# English tokenizer_exceptions (r5, VERDICT r4 #9 — closes the largest
# measured divergence class).  Conservative subset: every entry is
# unambiguous after the pipeline's do_caps lowercasing (spacy sees the
# lowercased text too, so its lowercase exception forms are the spec);
# ambiguous-when-lowercased forms (st., no., min., month names) stay OUT —
# a false positive would corrupt ordinary words.
_ABBREV = r"(?:e\.g|i\.e|a\.m|p\.m|etc|mr|mrs|ms|dr|prof|vs|jr|sr|approx)"
_TOKEN_RE = re.compile(
    r"_[a-z]+_"                    # specials like _unk_, _bos_
    # emails as whole tokens (spacy like_email; r5).  URLs stay split: the
    # reference pads '/' BEFORE spacy runs, so spacy never sees one whole
    # — faithful quirk, not a divergence.
    r"|[\w.+\-]+@[\w\-]+(?:\.[\w\-]+)+"
    # pre-split contractions — guarded so 's in a quoted word ('single')
    # doesn't match; only the standalone post-split forms do
    r"|(?:n't|'s|'m|'re|'ve|'ll|'d)(?![a-z])"
    r"|\.\.\."                     # ellipsis (exactly 3 — 4+ became tk_rep)
    + r"|" + _ABBREV + r"\.(?!\w)"  # known abbreviations keep the period
    + r"|\d+(?:[,.:\-]\d+)*"       # numbers w/ internal punct (1,000 10:30 1914-1918)
    r"|\w+(?:\.\w+)+"              # period compounds (u.s a.b) — spacy keeps
    r"|\w+"                        # plain words (hyphens split off, as spacy infix)
    r"|[^\w\s]"                    # single punctuation marks
)


class Tokenizer:
    """fastai-style pre-rules + rule tokenizer (Text.py:28-75).

    Pre-rules (exact ports): <br/> → newline; char runs of ≥4 → 'tk_rep N c';
    word runs of ≥4 → 'tk_wrep N w'; ALLCAPS words → 't_up word'; '/' and '#'
    padded with spaces; whitespace squeezed.
    """

    re_br = re.compile(r"<\s*br\s*/?>", re.IGNORECASE)
    re_rep = re.compile(r"(\S)(\1{3,})")
    re_word_rep = re.compile(r"(\b\w+\W+)(\1{3,})")

    def sub_br(self, x):
        return self.re_br.sub("\n", x)

    @staticmethod
    def replace_rep(m):
        c, cc = m.groups()
        return f" tk_rep {len(cc) + 1} {c} "

    @staticmethod
    def replace_wrep(m):
        c, cc = m.groups()
        return f" tk_wrep {len(cc.split()) + 1} {c} "

    @staticmethod
    def do_caps(ss):
        res = []
        for s in re.findall(r"\w+|\W+", ss):
            res += ([" t_up ", s.lower()] if (s.isupper() and len(s) > 2) else [s.lower()])
        return "".join(res)

    def base_tok(self, x):
        x = _CONTRACTION_RE.sub(r"\1 \2", x)
        out = []
        for raw in _TOKEN_RE.findall(x):
            special = _SPECIAL_CASES.get(raw)
            if special is not None:
                out += special
            else:
                out.append(raw)
        return out

    def proc_text(self, s: str) -> list:
        s = self.re_rep.sub(Tokenizer.replace_rep, s)
        s = self.re_word_rep.sub(Tokenizer.replace_wrep, s)
        s = Tokenizer.do_caps(s)
        s = re.sub(r"([/#])", r" \1 ", s)
        s = re.sub(" {2,}", " ", s)
        return self.base_tok(self.sub_br(s))


def tokenize(ss: Sequence[str]) -> list:
    """Tokenize a list of texts (Text.py:77-83)."""
    tok = Tokenizer()
    return [tok.proc_text(s) for s in ss]


def tokenize_mp(ss: Sequence[str], ncpus: Optional[int] = None) -> list:
    """Multiprocess tokenization (Text.py:85-93)."""
    if ncpus is None:
        ncpus = max(1, (os.cpu_count() or 2) - 2)
    if ncpus <= 1 or len(ss) < 64:
        return tokenize(ss)
    n, m = len(ss), int(np.ceil(len(ss) / ncpus))
    chunks = [ss[i:min(i + m, n)] for i in range(0, n, m)]
    with ProcessPoolExecutor(ncpus) as ex:
        return sum(ex.map(tokenize, chunks), [])


def numericalize(ss, max_vocab=60000, min_freq=6, stoi=None):
    """Token lists → int lists + vocab (Text.py:95-122): cap at max_vocab by
    frequency, drop tokens rarer than min_freq, specials
    ['_unk_','_pad_','_bos_','_eos_'] at ids 0-3, unknown → 0."""
    if stoi is None:
        counts = collections.Counter(tok for s in ss for tok in s).most_common(max_vocab)
        tokens = [tok for tok, c in counts if c >= min_freq]
        stoi = {tok: i for i, tok in enumerate(["_unk_", "_pad_", "_bos_", "_eos_"] + tokens)}
    ss_numeric = [[stoi.get(tok, 0) for tok in s] for s in ss]
    return ss_numeric, stoi


# ---------------------------------------------------------------------------
# (2) Datasets and data objects (Text.py:127-438)
# ---------------------------------------------------------------------------

class TextDataset:
    """Tokenized+numericalized text dataset for LM and classification
    (Text.py:127-229)."""

    def __init__(self, texts, labels, stoi=None, reverse=False, ncpus=None):
        toks = tokenize_mp(list(texts), ncpus)
        self.texts, self.stoi = numericalize(toks, stoi=stoi)
        if reverse:
            self.texts = [list(reversed(t)) for t in self.texts]
        self.num_tokens = sum(len(t) for t in self.texts)
        unique_labels = sorted(set(labels))
        self.label_dict = {lab: i for i, lab in enumerate(unique_labels)}
        self.labels = [self.label_dict[lab] for lab in labels]

    def __len__(self):
        return len(self.texts)

    def __getitem__(self, idx):
        return self.texts[idx], self.labels[idx]

    def split_train_val(self, val_frac=0.2, seed=0):
        """Random split preserving vocab on both halves (Text.py:157-179)."""
        idxs = list(range(len(self.texts)))
        train_idxs, val_idxs = SplitTrainVal(idxs, val_frac=val_frac, seed=seed)
        val = object.__new__(TextDataset)
        val.stoi, val.label_dict = self.stoi, self.label_dict
        val.texts = [self.texts[i] for i in val_idxs]
        val.labels = [self.labels[i] for i in val_idxs]
        val.num_tokens = sum(len(t) for t in val.texts)
        self.texts = [self.texts[i] for i in train_idxs]
        self.labels = [self.labels[i] for i in train_idxs]
        self.num_tokens = sum(len(t) for t in self.texts)
        return self, val

    @classmethod
    def from_csv(cls, csv_file, text_col, label_col=None, stoi=None, reverse=False):
        """One text (and optional label) per csv row (Text.py:181-189)."""
        df = pd.read_csv(csv_file)
        labels = list(df[label_col]) if label_col else [0] * len(df)
        return cls(list(df[text_col]), labels, stoi, reverse)

    @classmethod
    def from_text_files(cls, folder, labels, stoi=None, reverse=False):
        """From .txt files, optionally in labeled subfolders (Text.py:191-229)."""
        folder = correct_foldername(folder)
        texts, texts_labels = [], []
        if labels is None:
            for fn in sorted(os.listdir(folder)):
                if fn.endswith(".txt"):
                    with open(folder + fn) as f:
                        texts.append(f.read())
            texts_labels = [0] * len(texts)
        else:
            if isinstance(labels, str):
                labels = os.listdir(folder)
            for lab in sorted(labels):
                for fn in sorted(os.listdir(folder + lab)):
                    if fn.endswith(".txt"):
                        with open(folder + lab + "/" + fn) as f:
                            texts.append(f.read())
                        texts_labels.append(lab)
        return cls(texts, texts_labels, stoi, reverse)


class LanguageModelDataLoader:
    """Concat-and-window LM loader (Text.py:231-290), static shapes.

    All texts concatenate into one stream, reshaped (bs, seqlen); windows of
    exactly (bs, bptt) are yielded with y = x shifted by one.  When
    ``random``: text order reshuffles AND the window start offset is drawn
    from [0, bptt) each epoch — the static-shape replacement for the
    reference's per-batch bptt jitter (Text.py:270-271), same decorrelation,
    one XLA program.
    """

    def __init__(self, ds, bs, bptt, random=True, seed=0):
        self.ds, self.bs, self.bptt, self.random = ds, bs, bptt, random
        self.seed = seed
        self.epoch = 0
        self.seqlen = ds.num_tokens // bs - 1
        if self.seqlen < bptt:
            raise ValueError("dataset too small for bs*bptt windows")
        self._concat(offset_epoch=0)

    def _concat(self, offset_epoch):
        rng = np.random.default_rng((self.seed, offset_epoch))
        idxs = np.arange(len(self.ds.texts))
        if self.random:
            rng.shuffle(idxs)
        ntoks = self.bs * (self.seqlen + 1)
        stream = np.fromiter(
            (tok for i in idxs for tok in self.ds.texts[int(i)]),
            dtype=np.int32, count=self.ds.num_tokens)[:ntoks]
        self.data = stream.reshape(self.bs, self.seqlen + 1)
        # the offset is bounded so EVERY epoch yields exactly len(self)
        # batches regardless of the draw — schedules are sized as
        # num_epochs * len(train_dl), so the per-epoch count must be constant
        hi = min(self.bptt, self.seqlen - len(self) * self.bptt + 1)
        self.offset = int(rng.integers(0, max(1, hi))) if self.random else 0

    def __len__(self):
        if self.random:
            return max(1, (self.seqlen - (self.bptt - 1)) // self.bptt)
        return self.seqlen // self.bptt

    def peek(self) -> Batch:
        x = self.data[:, :self.bptt]
        y = self.data[:, 1:self.bptt + 1]
        return Batch(xs=(x,), y=y, mask=np.ones(self.bs, np.float32), n_valid=self.bs)

    def __iter__(self):
        n = len(self)
        start = self.offset
        for b in range(n):
            s = start + b * self.bptt
            x = self.data[:, s:s + self.bptt]
            y = self.data[:, s + 1:s + self.bptt + 1]
            yield Batch(xs=(x,), y=y, mask=np.ones(self.bs, np.float32), n_valid=self.bs)
        self.epoch += 1
        if self.random:
            self._concat(self.epoch)


class LanguageModelDataObj:
    """LM datasets + loaders (Text.py:292-330)."""

    def __init__(self, train_ds, val_ds, test_ds, bs, bptt, seed=0):
        self.bs, self.bptt = bs, bptt
        self.stoi, self.target_type = train_ds.stoi, "lang_model"
        self.train_ds, self.val_ds, self.test_ds = train_ds, val_ds, test_ds
        self.train_dl = LanguageModelDataLoader(train_ds, bs, bptt, True, seed)
        self.val_dl = LanguageModelDataLoader(val_ds, bs, bptt, False)
        if test_ds:
            self.test_dl = LanguageModelDataLoader(test_ds, bs, bptt, False)

    @classmethod
    def from_csv(cls, bs, bptt, csv_train, csv_val=None, csv_test=None,
                 text_col="text", reverse=False, seed=0):
        train_ds = TextDataset.from_csv(csv_train, text_col, None, None, reverse)
        stoi = train_ds.stoi
        if csv_val:
            val_ds = TextDataset.from_csv(csv_val, text_col, None, stoi, reverse)
        else:
            train_ds, val_ds = train_ds.split_train_val(seed=seed)
        test_ds = TextDataset.from_csv(csv_test, text_col, None, stoi, reverse) if csv_test else None
        return cls(train_ds, val_ds, test_ds, bs, bptt, seed)

    @classmethod
    def from_folders(cls, bs, bptt, labels, train, val=None, test=None,
                     reverse=False, seed=0):
        train_ds = TextDataset.from_text_files(train, labels, None, reverse)
        stoi = train_ds.stoi
        if val:
            val_ds = TextDataset.from_text_files(val, labels, stoi, reverse)
        else:
            train_ds, val_ds = train_ds.split_train_val(seed=seed)
        test_ds = TextDataset.from_text_files(test, labels, stoi, reverse) if test else None
        return cls(train_ds, val_ds, test_ds, bs, bptt, seed)


def _bucket_len(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class TextClassificationDataLoader:
    """Length-bucketed classification loader (TextLengthSampler +
    TextLengthCollater, Text.py:334-389), static shapes.

    Texts sort by length descending; consecutive groups of bs*bpg form
    shuffleable 'groups' whose batches have near-uniform lengths; every batch
    pads to the smallest bucket length ≥ its longest text, so only
    ``len(buckets)`` XLA programs ever compile.  Short final batches pad rows
    (masked) to keep bs static.
    """

    def __init__(self, ds, bs, pad_token, bpg=10, random=False, seed=0,
                 buckets=(64, 128, 256, 512, 1024, 2048, 4096)):
        self.ds, self.bs, self.pad_token = ds, bs, pad_token
        self.random, self.seed = random, seed
        self.buckets = tuple(buckets)
        self.epoch = 0
        order = sorted(range(len(ds)), key=lambda i: len(ds.texts[i]), reverse=True)
        self.order = order
        group_sz = bs * bpg
        self.groups = [order[i:i + group_sz] for i in range(0, len(order), group_sz)]

    def __len__(self):
        return sum(int(np.ceil(len(g) / self.bs)) for g in self.groups)

    def _make_batch(self, idxs) -> Batch:
        n_valid = len(idxs)
        idxs = list(idxs) + [idxs[-1]] * (self.bs - n_valid)
        texts = [self.ds.texts[i] for i in idxs]
        labels = np.asarray([self.ds.labels[i] for i in idxs], np.int64)
        maxlen = max(1, max(len(t) for t in texts))
        L = _bucket_len(maxlen, self.buckets)
        x = np.full((self.bs, L), self.pad_token, np.int32)
        for r, t in enumerate(texts):
            t = t[:L]
            x[r, :len(t)] = t
        mask = np.zeros(self.bs, np.float32)
        mask[:n_valid] = 1.0
        return Batch(xs=(x,), y=labels, mask=mask, n_valid=n_valid)

    def peek(self) -> Batch:
        return self._make_batch(self.groups[0][:self.bs])

    def __iter__(self):
        rng = np.random.default_rng((self.seed, self.epoch))
        groups = [list(g) for g in self.groups]
        if self.random:
            rest = groups[1:]
            rng.shuffle(rest)
            groups = [groups[0]] + rest
            for g in groups:
                rng.shuffle(g)
        for g in groups:
            for i in range(0, len(g), self.bs):
                yield self._make_batch(g[i:i + self.bs])
        self.epoch += 1


class TextClassificationDataObj:
    """Classification datasets + bucketed loaders (Text.py:391-438)."""

    def __init__(self, train_ds, val_ds, test_ds, bs, bpg=10, seed=0):
        self.bs, self.stoi, self.target_type = bs, train_ds.stoi, "text_classify"
        self.train_ds, self.val_ds, self.test_ds = train_ds, val_ds, test_ds
        pad = self.stoi["_pad_"]
        self.train_dl = TextClassificationDataLoader(train_ds, bs, pad, bpg, True, seed)
        self.val_dl = TextClassificationDataLoader(val_ds, bs, pad, bpg, False)
        if test_ds:
            self.test_dl = TextClassificationDataLoader(test_ds, bs, pad, bpg, False)

    @classmethod
    def from_csv(cls, bs, csv_train, csv_val=None, csv_test=None, text_col="text",
                 label_col="label", reverse=False, stoi=None, seed=0):
        train_ds = TextDataset.from_csv(csv_train, text_col, label_col, stoi, reverse)
        stoi = train_ds.stoi
        if csv_val:
            val_ds = TextDataset.from_csv(csv_val, text_col, label_col, stoi, reverse)
        else:
            train_ds, val_ds = train_ds.split_train_val(seed=seed)
        test_ds = TextDataset.from_csv(csv_test, text_col, label_col, stoi, reverse) if csv_test else None
        return cls(train_ds, val_ds, test_ds, bs, seed=seed)

    @classmethod
    def from_folders(cls, bs, labels, train, val=None, test=None, reverse=False,
                     stoi=None, seed=0):
        train_ds = TextDataset.from_text_files(train, labels, stoi, reverse)
        stoi = train_ds.stoi
        if val:
            val_ds = TextDataset.from_text_files(val, labels, stoi, reverse)
        else:
            train_ds, val_ds = train_ds.split_train_val(seed=seed)
        test_ds = TextDataset.from_text_files(test, labels, stoi, reverse) if test else None
        return cls(train_ds, val_ds, test_ds, bs, seed=seed)


# ---------------------------------------------------------------------------
# (3) Models (Text.py:441-751)
# ---------------------------------------------------------------------------

def locked_dropout(x, rate, train, rng):
    """Variational dropout: one (B, 1, D) mask shared across time
    (LockedDropout, Text.py:443-452)."""
    if not train or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, (x.shape[0], 1, x.shape[2]))
    return x * keep.astype(x.dtype) / (1.0 - rate)


class WeightDropLSTM(nn.Module):
    """Single-layer LSTM with DropConnect on the recurrent weights
    (WeightDropLSTM1, Text.py:477-513), as a ``lax.scan``.

    torch-compatible params: w_ih (4H, I) ordering [i, f, g, o], w_hh (4H, H),
    b_ih/b_hh (4H,) — stored transposed for right-multiplication.  The input
    projection for all T steps is one (B*T, I)x(I, 4H) MXU matmul hoisted out
    of the scan.
    """

    hidden_size: int
    weight_drop: float = 0.0

    @nn.compact
    def __call__(self, x, h0, c0, train: bool = False):
        B, T, I = x.shape
        H = self.hidden_size
        k = 1.0 / np.sqrt(H)

        def init(key, shape, dtype=jnp.float32):  # torch LSTM U(-k, k)
            return jax.random.uniform(key, shape, dtype, -k, k)

        w_ih = self.param("w_ih", init, (I, 4 * H))
        w_hh = self.param("w_hh", init, (H, 4 * H))
        b_ih = self.param("b_ih", init, (4 * H,))
        b_hh = self.param("b_hh", init, (4 * H,))

        if train and self.weight_drop > 0.0:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.weight_drop, w_hh.shape)
            w_hh = w_hh * keep.astype(w_hh.dtype) / (1.0 - self.weight_drop)

        # hoisted input projection: (B, T, 4H)
        xp = jnp.einsum("bti,ih->bth", x, w_ih) + b_ih + b_hh

        from neuralnetworklibrary_tpu.ops.pallas_lstm import (
            lstm_scan,
            pallas_lstm_available,
        )

        if train and pallas_lstm_available():
            # Opt-in (NNL_PALLAS_LSTM=1) Pallas training kernel: w_hh/w_hhT
            # pinned in VMEM across the sequence, backward emits per-step
            # gate grads with the weight grad as one big matmul
            # (ops/pallas_lstm.py).  Off by default — XLA's scan is
            # currently faster inside the full train step on v5e.
            return lstm_scan(xp, w_hh, h0, c0)

        def step(carry, xp_t):
            h, c = carry
            gates = xp_t + h @ w_hh
            i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
            i_g = jax.nn.sigmoid(i_g)
            f_g = jax.nn.sigmoid(f_g)
            g_g = jnp.tanh(g_g)
            o_g = jax.nn.sigmoid(o_g)
            c = f_g * c + i_g * g_g
            h = o_g * jnp.tanh(c)
            return (h, c), h

        (hT, cT), ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(xp, 0, 1))
        return jnp.swapaxes(ys, 0, 1), hT, cT


class EmbeddingDropout(nn.Module):
    """Word embedding with whole-row dropout + locked output dropout
    (Text.py:454-475).  Pad row initialized to zero."""

    vocab_size: int
    emb_dim: int
    drop1: float
    drop2: float
    pad_token: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        def init(key, shape, dtype=jnp.float32):
            w = jax.random.uniform(key, shape, dtype, -0.1, 0.1)
            return w.at[self.pad_token].set(0.0)

        weight_raw = self.param("weight", init, (self.vocab_size, self.emb_dim))
        weight = weight_raw
        if train and self.drop1 > 0.0:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.drop1, (self.vocab_size, 1))
            weight = weight * keep.astype(weight.dtype) / (1.0 - self.drop1)
        out = jnp.take(weight, x, axis=0)  # (B, T, E)
        if train and self.drop2 > 0.0:
            out = locked_dropout(out, self.drop2, train, self.make_rng("dropout"))
        return out, weight_raw


class LSTM_Encoder(nn.Module):
    """Multi-layer weight-dropped LSTM encoder with carried state
    (Text.py:515-551).

    ``stateful=True`` keeps (h, c) in the 'carry' variable collection across
    windows (truncated BPTT, detached); ``stateful=False`` starts from zeros
    every call (the classifier's per-batch reset, Text.py:741).
    """

    vocab_size: int
    emb_dim: int = 400
    hidden_size: int = 1150
    num_layers: int = 3
    pad_token: int = 1
    drops: tuple = (0.05, 0.25, 0.2, 0.15)
    stateful: bool = True

    @property
    def sizes(self):
        return [self.emb_dim] + [self.hidden_size] * (self.num_layers - 1) + [self.emb_dim]

    @nn.compact
    def __call__(self, x, train: bool = False, return_embed_weight: bool = False):
        emb_drop1, emb_drop2, weight_drop, hidden_drop = self.drops
        B = x.shape[0]
        sizes = self.sizes
        x, emb_weight = EmbeddingDropout(self.vocab_size, self.emb_dim, emb_drop1,
                                         emb_drop2, self.pad_token,
                                         name="word_embed")(x, train=train)
        for i in range(self.num_layers):
            H = sizes[i + 1]
            if self.stateful:
                hv = self.variable("carry", f"h{i}", jnp.zeros, (B, H))
                cv = self.variable("carry", f"c{i}", jnp.zeros, (B, H))
                h0, c0 = hv.value, cv.value
            else:
                h0 = jnp.zeros((B, H), x.dtype)
                c0 = jnp.zeros((B, H), x.dtype)
            x, hT, cT = WeightDropLSTM(H, weight_drop, name=f"lstm_{i}")(
                x, h0, c0, train=train)
            if self.stateful:
                hv.value = jax.lax.stop_gradient(hT)  # detach (Text.py:547-550)
                cv.value = jax.lax.stop_gradient(cT)
            x = locked_dropout(x, hidden_drop, train,
                               self.make_rng("dropout") if train and hidden_drop else None)
        if return_embed_weight:
            return x, emb_weight
        return x


class LanguageModelDecoder(nn.Module):
    """Tied-weight linear decoder (Text.py:553-573): logits = drop(enc_out) @
    embeddingᵀ.  ``tied_weight`` is passed in at call time."""

    drop: float = 0.1

    @nn.compact
    def __call__(self, enc_out, tied_weight, train: bool = False,
                 return_hidden: bool = False):
        if train and self.drop > 0.0:
            enc_out = locked_dropout(enc_out, self.drop, train, self.make_rng("dropout"))
        if return_hidden:
            # fused-CE path: hand back the (dropped) decoder INPUT so the
            # loss can stream the vocab (ops/chunked_ce.py) instead of
            # materializing (B, T, V) logits.  Same rng stream as the
            # materialized path, so fused == unfused exactly.
            return enc_out
        return jnp.einsum("bte,ve->btv", enc_out, tied_weight)


class TextClassificationDecoder(nn.Module):
    """Attention-pooled classifier decoder (Text.py:575-609): softmax
    attention over time (pad positions masked out) then an MLP."""

    num_classes: int
    attn_size: int = 100
    fc_layer_sizes: tuple = (100,)
    fc_drops: tuple = (0.25, 0.25)
    emb_dim: int = 400
    pad_token: int = 1

    @nn.compact
    def __call__(self, enc_in, enc_out, train: bool = False, return_attn: bool = False):
        a = nn.relu(nn.Dense(self.attn_size, kernel_init=he_normal(), name="attn1")(enc_out))
        a = nn.Dense(1, kernel_init=he_normal(), name="attn2")(a)[..., 0]  # (B, T)
        a = jax.nn.softmax(a, axis=1)
        a = a * (enc_in != self.pad_token).astype(a.dtype)
        a = a / jnp.maximum(jnp.sum(a, axis=1, keepdims=True), 1e-12)
        combined = jnp.sum(a[..., None] * enc_out, axis=1)  # (B, E)
        sizes = (self.emb_dim,) + tuple(self.fc_layer_sizes) + (self.num_classes,)
        out = FullyConnectedNet(sizes, self.fc_drops, name="fc")(combined, train=train)
        if return_attn:
            return out, a
        return out


class LanguageModelNet(nn.Module):
    """LSTM encoder + tied linear decoder (Text.py:611-651).

    Returns (logits (B, T, V), enc_out) — the encoder output feeds the AR/TAR
    regularizers in RegSeqCrossEntropyLoss.  Layer groups: [lstms, decoder
    (=head, tied to the embedding)] (Text.py:645-647).
    """

    vocab_size: int
    pad_token: int = 1
    enc_drops: tuple = (0.05, 0.25, 0.2, 0.15)
    dec_drop: float = 0.1
    drop_scaling: float = 0.7
    emb_dim: int = 400
    hidden_size: int = 1150
    num_layers: int = 3
    fused_ce: bool = False  # return (h, tied, enc_out) for
                            # FusedRegSeqCrossEntropyLoss — no (B,T,V) logits

    head_prefixes = ("enc/word_embed",)  # tied decoder trains the embedding

    @property
    def layer_group_prefixes(self):
        lstms = tuple(f"enc/lstm_{i}" for i in range(self.num_layers))
        return (lstms, ("enc/word_embed",))

    @nn.compact
    def __call__(self, x, train: bool = False):
        drops = tuple(d * self.drop_scaling for d in self.enc_drops)
        enc = LSTM_Encoder(self.vocab_size, self.emb_dim, self.hidden_size,
                           self.num_layers, self.pad_token, drops, stateful=True,
                           name="enc")
        enc_out, tied = enc(x, train=train, return_embed_weight=True)
        dec = LanguageModelDecoder(self.dec_drop * self.drop_scaling, name="dec")
        if self.fused_ce:
            h = dec(enc_out, tied, train=train, return_hidden=True)
            return h, tied, enc_out
        return dec(enc_out, tied, train=train), enc_out

    @classmethod
    def from_dataobj(cls, data, enc_drops=(0.05, 0.25, 0.2, 0.15), dec_drop=0.1,
                     drop_scaling=0.7):
        return cls(vocab_size=len(data.stoi), pad_token=data.stoi["_pad_"],
                   enc_drops=tuple(enc_drops), dec_drop=dec_drop,
                   drop_scaling=drop_scaling)


class TextClassificationNet(nn.Module):
    """LSTM encoder + attention classifier head (Text.py:704-751).  The
    encoder resets to zero state every batch (stateful=False; Text.py:741).
    Layer groups: [lstms, word_embed, head] (Text.py:734-736)."""

    vocab_size: int
    num_classes: int
    pad_token: int = 1
    attn_size: int = 100
    enc_drops: tuple = (0.05, 0.25, 0.2, 0.15)
    drop_scaling: float = 0.7
    fc_layer_sizes: tuple = (100,)
    fc_drops: tuple = (0.25, 0.25)
    emb_dim: int = 400
    hidden_size: int = 1150
    num_layers: int = 3

    head_prefixes = ("dec",)

    @property
    def layer_group_prefixes(self):
        lstms = tuple(f"enc/lstm_{i}" for i in range(self.num_layers))
        return (lstms, ("enc/word_embed",), ("dec",))

    @nn.compact
    def __call__(self, x, train: bool = False, return_attn: bool = False):
        drops = tuple(d * self.drop_scaling for d in self.enc_drops)
        enc_out = LSTM_Encoder(self.vocab_size, self.emb_dim, self.hidden_size,
                               self.num_layers, self.pad_token, drops,
                               stateful=False, name="enc")(x, train=train)
        out = TextClassificationDecoder(
            self.num_classes, self.attn_size, tuple(self.fc_layer_sizes),
            tuple(self.fc_drops), self.emb_dim, self.pad_token, name="dec")(
            x, enc_out, train=train, return_attn=return_attn)
        if return_attn:
            return out[0], enc_out, out[1]
        return out, enc_out

    @classmethod
    def from_language_model(cls, learner, num_classes, **kw):
        """Build a classifier whose encoder starts from a trained LM's encoder
        params (Text.py:726-732).  Returns (model, init_params_fn)."""
        lm = learner.model
        model = cls(vocab_size=lm.vocab_size, pad_token=lm.pad_token,
                    num_classes=num_classes, enc_drops=lm.enc_drops,
                    emb_dim=lm.emb_dim, hidden_size=lm.hidden_size,
                    num_layers=lm.num_layers, **kw)

        def transfer(params, lm_params=jax.device_get(learner.params)):
            params = jax.device_get(params)
            new_enc = dict(params["enc"])
            for k in lm_params["enc"]:
                new_enc[k] = lm_params["enc"][k]
            return {**params, "enc": new_enc}

        return model, transfer


# ---------------------------------------------------------------------------
# (4) Losses and metrics (Text.py:754-808)
# ---------------------------------------------------------------------------

def _seq_ce(logits, target, mask=None):
    """Token-level softmax CE over (B, T, V) logits and (B, T) int targets."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32), axis=-1)[..., 0]
    if mask is not None:
        w = jnp.broadcast_to(mask[:, None].astype(nll.dtype), nll.shape)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(nll)


class RegSeqCrossEntropyLoss:
    """CE + AR/TAR activation regularizers on the encoder output
    (Text.py:756-777): alpha·mean(enc²) + beta·mean((Δ_t enc)²)."""

    def __init__(self, alpha=2.0, beta=1.0):
        self.alpha, self.beta = alpha, beta

    def __call__(self, outputs, target, mask=None):
        preds, enc_out = outputs[0], outputs[1]
        if preds.ndim == 3 and target.ndim == 2:
            loss = _seq_ce(preds, target, mask)
        else:
            logp = jax.nn.log_softmax(preds, axis=-1)
            nll = -jnp.take_along_axis(logp, target[:, None].astype(jnp.int32), axis=-1)[:, 0]
            if mask is not None:
                loss = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
            else:
                loss = jnp.mean(nll)
        if self.alpha > 0:
            loss = loss + self.alpha * jnp.mean(jnp.square(enc_out))
        if self.beta > 0:
            loss = loss + self.beta * jnp.mean(
                jnp.square(enc_out[:, 1:] - enc_out[:, :-1]))
        return loss


class FusedRegSeqCrossEntropyLoss:
    """RegSeqCrossEntropyLoss for ``LanguageModelNet(fused_ce=True)``:
    outputs are (h, tied_weight, enc_out) and the CE streams the vocabulary
    in ``chunk`` columns (ops/chunked_ce.py) — the (B, T, V) logits (576 MB
    at wt103 dims) are never materialized.  Numerically identical to the
    materialized loss (same rng stream, same masked-mean reduction)."""

    def __init__(self, alpha=2.0, beta=1.0, chunk: int = 8192):
        self.alpha, self.beta = alpha, beta
        self.chunk = chunk

    def __call__(self, outputs, target, mask=None):
        from neuralnetworklibrary_tpu.ops.chunked_ce import chunked_softmax_ce

        h, tied, enc_out = outputs
        if mask is None:
            tok_mask = jnp.ones(target.shape, jnp.float32)
        elif getattr(mask, "ndim", 0) == 1:
            tok_mask = jnp.broadcast_to(
                mask[:, None].astype(jnp.float32), target.shape)
        else:
            tok_mask = mask.astype(jnp.float32)
        loss = chunked_softmax_ce(h, tied, target.astype(jnp.int32),
                                  tok_mask, self.chunk)
        if self.alpha > 0:
            loss = loss + self.alpha * jnp.mean(jnp.square(enc_out))
        if self.beta > 0:
            loss = loss + self.beta * jnp.mean(
                jnp.square(enc_out[:, 1:] - enc_out[:, :-1]))
        return loss


class SeqCrossEntropyLoss:
    """Unregularized sequence CE (Text.py:779-788) — the quantity reported as
    val loss for LMs."""

    def __call__(self, outputs, target, mask=None):
        preds = outputs[0] if isinstance(outputs, tuple) else outputs
        if preds.ndim == 3 and target.ndim == 2:
            return _seq_ce(preds, target, mask)
        logp = jax.nn.log_softmax(preds, axis=-1)
        nll = -jnp.take_along_axis(logp, target[:, None].astype(jnp.int32), axis=-1)[:, 0]
        if mask is not None:
            return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return jnp.mean(nll)


class LanguageModelAccuracy:
    """Token accuracy ignoring the 4 special tokens (Text.py:791-799)."""

    def __call__(self, preds, target, mask=None):
        preds = preds[0] if isinstance(preds, tuple) else preds
        preds = preds.at[..., :4].set(-jnp.inf)
        correct = (jnp.argmax(preds, axis=-1) == target).astype(jnp.float32)
        if mask is not None:
            w = jnp.broadcast_to(mask[:, None].astype(jnp.float32), correct.shape)
            return jnp.sum(correct * w) / jnp.maximum(jnp.sum(w), 1.0)
        return jnp.mean(correct)


class TextClassificationAccuracy:
    """Class accuracy (Text.py:801-808)."""

    def __call__(self, preds, target, mask=None):
        preds = preds[0] if isinstance(preds, tuple) else preds
        correct = (jnp.argmax(preds, axis=-1) == target).astype(jnp.float32)
        if mask is not None:
            return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return jnp.mean(correct)


# ---------------------------------------------------------------------------
# (5) Generation + pretrained weight conversion
# ---------------------------------------------------------------------------

def predict_from_string(learner, s: str, n: int, k: int = 5, seed: int = 0):
    """Top-k sampled continuation of a prompt (Text.py:655-676): feed tokens
    one at a time with bs=1 carry threaded explicitly, sample the next token
    from the renormalized top-k (special tokens excluded)."""
    model, stoi = learner.model, learner.data.stoi
    itos = {i: t for t, i in stoi.items()}
    params = learner.params
    toks = numericalize(tokenize([s]), stoi=stoi)[0][0]

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1), jnp.int32),
                           train=False)
    carry = variables["carry"]
    rng = np.random.default_rng(seed)

    @jax.jit
    def step(params, carry, tok):
        (logits, _), mut = model.apply(
            {"params": params, "carry": carry}, tok, train=False, mutable=["carry"])
        return logits[0, -1], mut["carry"]

    logits = None
    for t in toks:
        logits, carry = step(params, carry, jnp.asarray([[t]], jnp.int32))
    out = list(toks)
    for _ in range(n):
        probs = np.array(jax.nn.softmax(logits))
        probs[:4] = 0  # special tokens
        top = np.argsort(probs)[-k:]
        p = probs[top] / probs[top].sum()
        nxt = int(rng.choice(top, p=p))
        out.append(nxt)
        logits, carry = step(params, carry, jnp.asarray([[nxt]], jnp.int32))
    return " ".join(itos[t] for t in out)


def load_torch_awd_lstm(params, lstm_state_dicts, emb_weight, itos, stoi_wt103):
    """Install wt103-pretrained torch AWD-LSTM weights into an
    LanguageModelNet param tree (Text.py:678-702).

    lstm_state_dicts: {'<i>.lstm.weight_ih_l0': (4H, I), ...} torch tensors;
    emb_weight: (V_wt103, 400); vocab rows remapped via itos/stoi_wt103 with
    the mean embedding for unseen tokens.
    """
    from neuralnetworklibrary_tpu.utils.torch_convert import _np

    params = jax.device_get(params)
    new = {k: dict(v) for k, v in params.items()}
    enc = {k: dict(v) if isinstance(v, dict) else v for k, v in new["enc"].items()}

    for i in range(3):
        pre = f"{i}.lstm."
        layer = dict(enc[f"lstm_{i}"])
        layer["w_ih"] = _np(lstm_state_dicts[pre + "weight_ih_l0"]).T
        layer["w_hh"] = _np(lstm_state_dicts[pre + "weight_hh_l0_raw"]).T
        layer["b_ih"] = _np(lstm_state_dicts[pre + "bias_ih_l0"])
        layer["b_hh"] = _np(lstm_state_dicts[pre + "bias_hh_l0"])
        enc[f"lstm_{i}"] = layer

    emb_weight = _np(emb_weight)
    mean = emb_weight.mean(axis=0)
    V = len(itos)
    w = np.tile(mean, (V, 1)).astype(np.float32)
    for i, s in itos.items():
        if s in stoi_wt103:
            w[i] = emb_weight[stoi_wt103[s]]
    we = dict(enc["word_embed"])
    we["weight"] = w
    enc["word_embed"] = we
    new["enc"] = enc
    return new
