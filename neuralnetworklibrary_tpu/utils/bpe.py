"""Byte-level BPE tokenizer (GPT-2 format): the text front-end for
pretrained-transformer serving.

Beyond reference parity (the reference tokenizes with spacy rules,
Applications/Text.py:55-101) — ``utils.gpt2_convert.load_gpt2`` maps GPT-2
checkpoints onto :class:`~neuralnetworklibrary_tpu.nn.transformer.
TransformerLM`, and this module supplies the matching tokenizer so real text
reaches those weights without any external dependency: load the standard
``vocab.json`` + ``merges.txt`` files that ship with every GPT-2-family
checkpoint and encode/decode byte-exactly.

Byte-level BPE (Radford et al. 2019): text splits on the GPT-2 regex into
pieces (contractions, letter runs, number runs, punctuation runs, trailing
spaces attach forward); each piece's UTF-8 BYTES map through a reversible
byte↔printable-unicode table (so the base alphabet is exactly 256 symbols
and no input can be out-of-vocabulary); the learned merge list then greedily
fuses the lowest-ranked adjacent pair until none remains.  Decode inverts
losslessly.  Differential-tested token-for-token against
``transformers.GPT2Tokenizer`` built from the same files
(tests/test_bpe.py).
"""

from __future__ import annotations

import json
from functools import lru_cache


@lru_cache()
def bytes_to_unicode():
    """The reversible byte → printable-unicode-char table byte-level BPE
    vocabularies are written in: visible latin ranges map to themselves,
    the other bytes to 256, 257, … in order (every byte gets a distinct
    single printable char, so vocab files stay human-readable)."""
    keep = (list(range(ord("!"), ord("~") + 1))
            + list(range(ord("¡"), ord("¬") + 1))
            + list(range(ord("®"), ord("ÿ") + 1)))
    mapping = {}
    extra = 0
    for b in range(256):
        if b in keep:
            mapping[b] = chr(b)
        else:
            mapping[b] = chr(256 + extra)
            extra += 1
    return mapping


# the GPT-2 piece pattern: contractions, " ?letters", " ?numbers",
# " ?punctuation-run", whitespace (a space before a word attaches forward)
_PAT = (r"'s|'t|'re|'ve|'m|'ll|'d"
        r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+")


class _NativeBPE:
    """ctypes wrapper around native/bpe.cpp — the merge loop on vocabulary
    ids.  ``build`` returns None (python fallback) if the library doesn't
    compile or any merge string is missing from the vocab."""

    def __init__(self, lib, handle, byte_ids):
        self._lib, self._handle = lib, handle
        self._byte_ids = byte_ids          # byte value -> base vocab id

    @classmethod
    def build(cls, encoder: dict, merges):
        import ctypes

        import numpy as np

        from neuralnetworklibrary_tpu.native.build import load_library

        lib = load_library("bpe")
        if lib is None:
            return None
        byte_enc = bytes_to_unicode()
        try:
            byte_ids = np.array([encoder[byte_enc[b]] for b in range(256)],
                                np.int32)
            triples = np.array(
                [(encoder[a], encoder[b], encoder[a + b])
                 for a, b in merges], np.int32).reshape(-1, 3)
        except KeyError:
            return None                    # exotic vocab: keep python path
        lib.bpe_new.restype = ctypes.c_void_p
        lib.bpe_new.argtypes = [ctypes.POINTER(ctypes.c_int32),
                                ctypes.c_int32]
        lib.bpe_free.argtypes = [ctypes.c_void_p]
        lib.bpe_encode.restype = ctypes.c_int64
        lib.bpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64)]
        handle = lib.bpe_new(
            np.ascontiguousarray(triples).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)), len(triples))
        return cls(lib, handle, byte_ids)

    def encode_pieces(self, pieces):
        """[bytes, ...] → [list of ids, ...] in one library call."""
        import ctypes

        import numpy as np

        offsets = np.zeros(len(pieces) + 1, np.int64)
        for i, p in enumerate(pieces):
            offsets[i + 1] = offsets[i] + len(p)
        symbols = self._byte_ids[
            np.frombuffer(b"".join(pieces), np.uint8)] \
            if offsets[-1] else np.zeros(0, np.int32)
        symbols = np.ascontiguousarray(symbols, np.int32)
        out = np.empty(max(1, int(offsets[-1])), np.int32)
        out_off = np.zeros(len(pieces) + 1, np.int64)
        self._lib.bpe_encode(
            self._handle,
            symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(pieces),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return [out[out_off[i]:out_off[i + 1]].tolist()
                for i in range(len(pieces))]

    def __del__(self):
        try:
            self._lib.bpe_free(self._handle)
        except Exception:
            pass


class GPT2BPE:
    """Encoder/decoder over a GPT-2-format (vocab.json, merges.txt) pair.

    vocab: token-string → id.  merges: list of (a, b) pairs in rank order.
    """

    def __init__(self, vocab: dict, merges, errors: str = "replace",
                 native: bool = True):
        import regex

        self.encoder = dict(vocab)
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.errors = errors
        self.byte_enc = bytes_to_unicode()
        self.byte_dec = {c: b for b, c in self.byte_enc.items()}
        self._pat = regex.compile(_PAT)
        self._cache: dict = {}
        # native merge kernel (native/bpe.cpp): the same greedy algorithm
        # over vocabulary IDS instead of strings (a bijection — outputs are
        # token-identical, differential-tested).  Falls back to the python
        # loop whenever the library doesn't build or a merge string is
        # missing from the vocab.
        self._native = None
        if native:
            self._native = _NativeBPE.build(self.encoder, merges)

    @classmethod
    def from_files(cls, vocab_file: str, merges_file: str, **kw):
        with open(vocab_file, encoding="utf-8") as f:
            vocab = json.load(f)
        merges = []
        with open(merges_file, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                a, b = line.split(" ")
                merges.append((a, b))
        return cls(vocab, merges, **kw)

    def __len__(self):
        return len(self.encoder)

    # ------------------------------------------------------------------ BPE

    def _bpe(self, piece: str) -> tuple:
        """Greedy lowest-rank merging of one pre-tokenized piece (a string of
        byte-level chars) into vocabulary tokens."""
        if piece in self._cache:
            return self._cache[piece]
        word = tuple(piece)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.ranks.get(p, float("inf")))
            if best not in self.ranks:
                break
            merged = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1
                        and (word[i], word[i + 1]) == best):
                    merged.append(word[i] + word[i + 1])
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        self._cache[piece] = word
        return word

    # ------------------------------------------------------------- text API

    def encode(self, text: str) -> list:
        """Text → token ids (byte-exact round-trip with :meth:`decode`)."""
        if self._native is not None:
            return self._encode_native(text)
        ids = []
        for piece in self._pat.findall(text):
            chars = "".join(self.byte_enc[b] for b in piece.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(chars))
        return ids

    def _encode_native(self, text: str) -> list:
        """One native call merges ALL uncached pieces of the text; the
        per-piece id lists are memoized exactly like the python path."""
        pieces = [p.encode("utf-8") for p in self._pat.findall(text)]
        fresh = [p for p in set(pieces) if p not in self._cache]
        if fresh:
            for p, ids in zip(fresh, self._native.encode_pieces(fresh)):
                self._cache[p] = ids
        out = []
        for p in pieces:
            out.extend(self._cache[p])
        return out

    def decode(self, ids) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        raw = bytes(self.byte_dec[c] for c in text)
        return raw.decode("utf-8", errors=self.errors)


def train_bpe(texts, n_merges: int, special_tokens=("<|endoftext|>",)):
    """Train a small byte-level BPE from scratch (GPT-2 semantics): count
    adjacent-pair frequencies over the regex pieces' byte-level symbol
    sequences, repeatedly fuse the most frequent pair.

    Returns (vocab, merges) consumable by :class:`GPT2BPE` — and writable to
    the standard files — so tests (and users without a checkpoint) can build
    a self-contained tokenizer.  Not a performance-tuned trainer; real
    checkpoints ship their own files.
    """
    import regex
    from collections import Counter

    pat = regex.compile(_PAT)
    byte_enc = bytes_to_unicode()
    words = Counter()
    for t in texts:
        for piece in pat.findall(t):
            words[tuple(byte_enc[b] for b in piece.encode("utf-8"))] += 1

    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, c in words.items():
            for i in range(len(w) - 1):
                pairs[(w[i], w[i + 1])] += c
        if not pairs:
            break
        # deterministic tie-break so retraining reproduces the same files
        best = max(pairs, key=lambda p: (pairs[p], p))
        merges.append(best)
        new_words = Counter()
        for w, c in words.items():
            merged = []
            i = 0
            while i < len(w):
                if i < len(w) - 1 and (w[i], w[i + 1]) == best:
                    merged.append(w[i] + w[i + 1])
                    i += 2
                else:
                    merged.append(w[i])
                    i += 1
            new_words[tuple(merged)] += c
        words = new_words

    vocab = {}
    for ch in bytes_to_unicode().values():   # base alphabet: all 256 bytes
        vocab[ch] = len(vocab)
    for a, b in merges:
        vocab[a + b] = len(vocab)
    for s in special_tokens:
        vocab[s] = len(vocab)
    return vocab, merges


def save_bpe(vocab: dict, merges, vocab_file: str, merges_file: str):
    """Write the standard GPT-2-format files (vocab.json + merges.txt)."""
    with open(vocab_file, "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(merges_file, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
