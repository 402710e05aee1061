"""Activation parity: a random-init HuggingFace GPT-2 (torch, CPU) and the
converted TransformerLM produce the same logits — the pretrained-load proof
for the transformer family (same pattern as test_torch_parity.py: no
weight downloads, the ARCHITECTURE + converter are what's validated)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neuralnetworklibrary_tpu.nn.transformer import generate  # noqa: E402
from neuralnetworklibrary_tpu.utils.gpt2_convert import load_gpt2  # noqa: E402

L, H, D, V, M = 3, 4, 64, 128, 96


def _hf_model(seed=0):
    cfg = transformers.GPT2Config(
        vocab_size=V, n_positions=M, n_embd=D, n_layer=L, n_head=H,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    torch.manual_seed(seed)
    m = transformers.GPT2LMHeadModel(cfg)
    m.eval()
    return m


def test_gpt2_logits_parity():
    hf = _hf_model()
    model, params = load_gpt2(hf.state_dict(), n_layers=L, n_heads=H,
                              d_model=D, vocab_size=V, max_len=M)
    rng = np.random.default_rng(0)
    x = rng.integers(0, V, (2, 17)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gpt2_cached_decode_and_generation_parity():
    """Greedy continuation through OUR KV-cached decode equals HF's greedy
    generate on the same converted weights."""
    hf = _hf_model(seed=3)
    model, params = load_gpt2(hf.state_dict(), n_layers=L, n_heads=H,
                              d_model=D, vocab_size=V, max_len=M)
    rng = np.random.default_rng(1)
    x = rng.integers(0, V, (1, 9)).astype(np.int32)
    n = 6
    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor(x, dtype=torch.long), max_new_tokens=n,
            do_sample=False, pad_token_id=0)
    want = hf_out.numpy()[:, x.shape[1]:]
    got = np.asarray(generate(model, params, jnp.asarray(x), n=n, k=1))
    np.testing.assert_array_equal(got, want)
