"""Speculative decoding: greedy output is token-for-token the target's own
greedy decode; the acceptance rule's emitted distribution is exactly the
target distribution (Monte-Carlo); a perfect draft accepts everything."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.nn.speculative import (
    accept_window,
    speculative_generate,
)
from neuralnetworklibrary_tpu.nn.transformer import TransformerLM, generate

V = 30


def _models(**target_kw):
    target = TransformerLM(vocab_size=V, d_model=16, n_heads=4, n_layers=2,
                           max_len=64, drop=0.0, **target_kw)
    draft = TransformerLM(vocab_size=V, d_model=8, n_heads=2, n_layers=1,
                          max_len=64, drop=0.0, **target_kw)
    x = jnp.zeros((1, 4), jnp.int32)
    tp = target.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    dp = draft.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    return target, tp, draft, dp


@pytest.mark.parametrize("gamma", [1, 3, 5])
def test_greedy_matches_target_greedy(gamma):
    target, tp, draft, dp = _models()
    prompt = jnp.asarray([[3, 7, 11, 2]], jnp.int32)
    want = np.asarray(generate(target, tp, prompt, n=12, k=1))
    got = np.asarray(speculative_generate(target, tp, draft, dp, prompt,
                                          n=12, gamma=gamma))
    np.testing.assert_array_equal(got, want)


def test_greedy_modern_config():
    kw = dict(pos_embedding="rope", mlp="swiglu", norm="rmsnorm",
              n_kv_heads=2)
    target, tp, draft, dp = _models(**kw)
    prompt = jnp.asarray([[5, 1, 9]], jnp.int32)
    want = np.asarray(generate(target, tp, prompt, n=10, k=1))
    got = np.asarray(speculative_generate(target, tp, draft, dp, prompt,
                                          n=10, gamma=3))
    np.testing.assert_array_equal(got, want)


def test_perfect_draft_accepts_everything():
    """draft == target (greedy): every drafted token accepted, so n tokens
    take ceil((n-1)/(γ+1)) rounds."""
    target, tp, _, _ = _models()
    prompt = jnp.asarray([[4, 4, 4]], jnp.int32)
    n, gamma = 13, 3
    toks, stats = speculative_generate(target, tp, target, tp, prompt,
                                       n=n, gamma=gamma, return_stats=True)
    assert stats["accepted"] == stats["drafted"]
    assert stats["rounds"] == -(-(n - 1) // (gamma + 1))
    want = np.asarray(generate(target, tp, prompt, n=n, k=1))
    np.testing.assert_array_equal(np.asarray(toks), want)


def test_sampling_mode_runs_with_stats():
    target, tp, draft, dp = _models()
    prompt = jnp.asarray([[2, 3]], jnp.int32)
    toks, stats = speculative_generate(target, tp, draft, dp, prompt, n=16,
                                       gamma=4, temperature=1.0, seed=5,
                                       return_stats=True)
    toks = np.asarray(toks)
    assert toks.shape == (1, 16)
    assert toks.min() >= 0 and toks.max() < V
    assert 1 <= stats["rounds"] <= 16
    assert 0 <= stats["accepted"] <= stats["drafted"]


def test_accept_window_distribution_is_exact():
    """The Leviathan guarantee, Monte-Carlo: with drafts sampled from q, the
    emitted token at slot 0 is distributed exactly p0, and (conditioned on
    slot 0 accepting) slot 1 is exactly p1 — for an arbitrary (p, q) pair."""
    Vv, gamma, N = 10, 2, 200_000
    rng = np.random.default_rng(0)
    dlogs = jnp.asarray(rng.normal(0, 1.5, (gamma, Vv)), jnp.float32)
    L = jnp.asarray(rng.normal(0, 1.5, (gamma + 1, Vv)), jnp.float32)
    inv_t = 1.0

    def one(key):
        kq, kw = jax.random.split(key)
        dtoks = jax.random.categorical(
            kq, dlogs * inv_t, axis=-1).astype(jnp.int32)
        v, k_acc = accept_window(kw, dtoks, dlogs, L, inv_t)
        return v, k_acc

    keys = jax.random.split(jax.random.PRNGKey(42), N)
    vs, ks = jax.jit(jax.vmap(one))(keys)
    vs, ks = np.asarray(vs), np.asarray(ks)

    p0 = np.asarray(jax.nn.softmax(L[0] * inv_t))
    emp0 = np.bincount(vs[:, 0], minlength=Vv) / N
    # 4σ MC bound per bin (σ ≈ sqrt(p(1−p)/N) ≤ 0.5/√N ≈ 1.1e-3)
    np.testing.assert_allclose(emp0, p0, atol=4 * 0.5 / np.sqrt(N))

    sel = ks >= 1                      # slot 1 emitted
    assert sel.sum() > 10_000
    p1 = np.asarray(jax.nn.softmax(L[1] * inv_t))
    emp1 = np.bincount(vs[sel, 1], minlength=Vv) / sel.sum()
    np.testing.assert_allclose(emp1, p1, atol=4 * 0.5 / np.sqrt(sel.sum()))


def test_accept_window_greedy_is_argmax():
    rng = np.random.default_rng(1)
    dlogs = jnp.asarray(rng.normal(0, 1, (3, 8)), jnp.float32)
    L = jnp.asarray(rng.normal(0, 1, (4, 8)), jnp.float32)
    dtoks = jnp.asarray([2, 5, 1], jnp.int32)
    v, k = accept_window(jax.random.PRNGKey(0), dtoks, dlogs, L, 0.0)
    np.testing.assert_array_equal(np.asarray(v), np.argmax(np.asarray(L), -1))
    expect = 0
    am = np.argmax(np.asarray(L), -1)
    for i, d in enumerate([2, 5, 1]):
        if am[i] == d:
            expect += 1
        else:
            break
    assert int(k) == expect


def test_error_cases():
    target, tp, draft, dp = _models()
    two = jnp.zeros((2, 3), jnp.int32)
    with pytest.raises(ValueError, match="batch"):
        speculative_generate(target, tp, draft, dp, two, n=4)
    small_v = TransformerLM(vocab_size=V - 1, d_model=8, n_heads=2,
                            n_layers=1, max_len=64, drop=0.0)
    with pytest.raises(ValueError, match="vocab"):
        speculative_generate(target, tp, small_v, dp,
                             jnp.zeros((1, 3), jnp.int32), n=4)
    with pytest.raises(ValueError, match="max_len"):
        speculative_generate(target, tp, draft, dp,
                             jnp.zeros((1, 3), jnp.int32), n=60)
    with pytest.raises(ValueError, match="gamma"):
        speculative_generate(target, tp, draft, dp,
                             jnp.zeros((1, 3), jnp.int32), n=4, gamma=0)
