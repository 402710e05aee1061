"""Byte-level BPE: token-for-token differential parity with
transformers.GPT2Tokenizer built from the SAME vocab/merges files, byte-exact
round-trips, and trainer determinism."""

import numpy as np
import pytest

from neuralnetworklibrary_tpu.utils.bpe import (
    GPT2BPE,
    bytes_to_unicode,
    save_bpe,
    train_bpe,
)

CORPUS = [
    "The quick brown fox jumps over the lazy dog. " * 3,
    "It's a test -- isn't it? We're 100% sure they'll pass, we've seen it.",
    "def f(x):\n    return x ** 2  # comment\n\n\ttabbed line",
    "naïve café résumé — ünïcödé ÿ",
    "数字と漢字のミックス 123 abc",
    "emoji: 🙂🚀 end",
]

TRICKY = CORPUS + [
    "",
    " ",
    "   leading and trailing   ",
    "a\nb\r\nc\t d",
    "CamelCase snake_case kebab-case A1B2C3",
    "price: $1,234.56 (≈ €1.1k)!",
    "ﬁligature ß ẞ",
    "🙂 at start and end 🙂",
]


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe")
    vocab, merges = train_bpe(CORPUS, n_merges=120)
    vf, mf = str(d / "vocab.json"), str(d / "merges.txt")
    save_bpe(vocab, merges, vf, mf)
    return vf, mf


def test_byte_table_is_a_bijection():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256
    assert all(len(c) == 1 for c in m.values())


def test_matches_hf_gpt2_tokenizer(files):
    from transformers import GPT2Tokenizer

    vf, mf = files
    ours = GPT2BPE.from_files(vf, mf)
    hf = GPT2Tokenizer(vf, mf)
    for s in TRICKY:
        a = ours.encode(s)
        b = hf.encode(s)
        assert a == b, f"{s!r}: {a} != {b}"
        assert ours.decode(a) == hf.decode(b)


def test_round_trip_is_byte_exact(files):
    ours = GPT2BPE.from_files(*files)
    for s in TRICKY:
        assert ours.decode(ours.encode(s)) == s


def test_no_oov_possible(files):
    """The 256-byte base alphabet makes EVERY string encodable, even bytes
    never seen in training."""
    ours = GPT2BPE.from_files(*files)
    s = "Ω≈ç√∫˜µ≤ unseen 🌋 वर्णमाला"
    ids = ours.encode(s)
    assert ids and ours.decode(ids) == s
    assert max(ids) < len(ours)


def test_trainer_is_deterministic():
    v1, m1 = train_bpe(CORPUS, n_merges=50)
    v2, m2 = train_bpe(CORPUS, n_merges=50)
    assert v1 == v2 and m1 == m2
    assert len(m1) == 50
    # merges actually compress: encoding uses fewer tokens than raw bytes
    tok = GPT2BPE(v1, m1)
    s = CORPUS[0]
    assert len(tok.encode(s)) < len(s.encode("utf-8"))


def test_feeds_transformer_generate(files):
    """The tokenizer end of the serving path: ids round-trip through a
    TransformerLM generate call (weights random — only plumbing checked)."""
    import jax
    import jax.numpy as jnp

    from neuralnetworklibrary_tpu.nn.transformer import (
        TransformerLM,
        generate,
    )

    tok = GPT2BPE.from_files(*files)
    model = TransformerLM(vocab_size=len(tok), d_model=16, n_heads=2,
                          n_layers=1, max_len=64, drop=0.0)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 4), jnp.int32))["params"]
    prompt = jnp.asarray([tok.encode("The quick brown")], jnp.int32)
    out = generate(model, params, prompt, n=5, k=1)
    text = tok.decode(np.asarray(out)[0].tolist())
    assert isinstance(text, str)


def test_native_merge_kernel_matches_python(files):
    """native/bpe.cpp (id-space merge loop) is token-for-token the python
    string-space loop — on the tricky corpus AND randomized unicode."""
    vf, mf = files
    nat = GPT2BPE.from_files(vf, mf)
    py = GPT2BPE.from_files(vf, mf, native=False)
    if nat._native is None:
        pytest.skip("native bpe library unavailable")
    rng = np.random.default_rng(0)
    rand = ["".join(chr(int(c)) for c in rng.integers(32, 0x2FF, n))
            for n in (5, 40, 200)]
    for s in TRICKY + rand:
        assert nat.encode(s) == py.encode(s), s
    # memoization across calls stays consistent
    for s in TRICKY[:4]:
        assert nat.encode(s) == py.encode(s)
