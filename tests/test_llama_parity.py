"""Activation parity: a random-init HuggingFace Llama (torch, CPU) and the
converted TransformerLM produce the same logits — the pretrained-load proof
for the Llama family (same pattern as test_gpt2_parity.py: no weight
downloads; the ARCHITECTURE — RoPE/RMSNorm/SwiGLU/GQA/untied head — and
the converter are what's validated)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neuralnetworklibrary_tpu.nn.transformer import generate  # noqa: E402
from neuralnetworklibrary_tpu.utils.llama_convert import (  # noqa: E402
    load_llama,
)

L, H, HKV, D, F, V, M = 3, 4, 2, 64, 88, 128, 96
THETA = 10000.0


def _hf_model(seed=0, tie=False, theta=THETA):
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=D, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=HKV, max_position_embeddings=M,
        rms_norm_eps=1e-5, rope_theta=theta, tie_word_embeddings=tie,
        attention_dropout=0.0)
    torch.manual_seed(seed)
    m = transformers.LlamaForCausalLM(cfg)
    m.eval()
    return m


def _load(hf, theta=THETA):
    return load_llama(hf.state_dict(), n_layers=L, n_heads=H,
                      n_kv_heads=HKV, d_model=D, d_ff=F, vocab_size=V,
                      max_len=M, rope_base=theta, norm_eps=1e-5)


def test_llama_logits_parity():
    hf = _hf_model()
    model, params = _load(hf)
    assert not model.tied_decoder
    rng = np.random.default_rng(0)
    x = rng.integers(0, V, (2, 17)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_llama_logits_parity_nondefault_theta():
    """rope_base is threaded through (Llama-3 ships theta=500000)."""
    hf = _hf_model(seed=5, theta=500000.0)
    model, params = _load(hf, theta=500000.0)
    rng = np.random.default_rng(2)
    x = rng.integers(0, V, (1, 31)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_llama_tied_variant():
    """tie_word_embeddings=True checkpoints (no lm_head.weight) convert to
    the default tied decoder."""
    hf = _hf_model(seed=7, tie=True)
    rng = np.random.default_rng(3)
    x = rng.integers(0, V, (2, 11)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    # torch state_dicts ALIAS lm_head.weight to the embedding when tied;
    # safetensors exports usually omit it — both must convert to tied
    sd_alias = hf.state_dict()
    assert "lm_head.weight" in sd_alias
    sd_omit = {k: v for k, v in sd_alias.items() if k != "lm_head.weight"}
    for sd in (sd_alias, sd_omit):
        model, params = load_llama(sd, n_layers=L, n_heads=H,
                                   n_kv_heads=HKV, d_model=D, d_ff=F,
                                   vocab_size=V, max_len=M,
                                   rope_base=THETA, norm_eps=1e-5)
        assert model.tied_decoder and "lm_head" not in params
        got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_llama_cached_decode_and_generation_parity():
    """Greedy continuation through OUR KV-cached decode (GQA cache,
    post-rotation K) equals HF's greedy generate on the same weights."""
    hf = _hf_model(seed=3)
    model, params = _load(hf)
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


def test_untied_head_learner_contract():
    """The untied model trains through the Learner: lm_head is its own
    layer group (freeze() leaves only it trainable) and the fused-CE path
    streams the untied decoder identically to materialized logits."""
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    model = TransformerLM(vocab_size=V, d_model=32, n_heads=2, n_layers=2,
                          max_len=64, drop=0.0, tied_decoder=False)
    assert model.head_prefixes == ("lm_head",)
    groups = model.layer_group_prefixes
    assert groups[-1] == ("lm_head",) and "word_embed" in groups[0]
    x = jnp.asarray(np.random.default_rng(0).integers(0, V, (2, 10)),
                    jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    assert params["lm_head"].shape == (V, 32)
    logits, _ = model.apply({"params": params}, x)
    fused = TransformerLM(vocab_size=V, d_model=32, n_heads=2, n_layers=2,
                          max_len=64, drop=0.0, tied_decoder=False,
                          fused_ce=True)
    h, head = fused.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("btd,vd->btv", h, head)), np.asarray(logits),
        rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- Mixtral

EM = 4  # experts (tiny)


def _hf_mixtral(seed=0, window=0):
    cfg = transformers.MixtralConfig(
        vocab_size=V, hidden_size=D, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=HKV, max_position_embeddings=M,
        num_local_experts=EM, num_experts_per_tok=2,
        rms_norm_eps=1e-5, rope_theta=THETA,
        sliding_window=window or None, tie_word_embeddings=False,
        attention_dropout=0.0, router_jitter_noise=0.0)
    torch.manual_seed(seed)
    m = transformers.MixtralForCausalLM(cfg)
    m.eval()
    return m


def _load_mixtral(hf, window=0):
    from neuralnetworklibrary_tpu.utils.llama_convert import load_mixtral

    return load_mixtral(hf.state_dict(), n_layers=L, n_heads=H,
                        n_kv_heads=HKV, d_model=D, d_ff=F, vocab_size=V,
                        n_experts=EM, moe_top_k=2, max_len=M,
                        rope_base=THETA, norm_eps=1e-5, window=window)


def test_mixtral_logits_parity():
    """Random-init HF Mixtral and the converted sparse-MoE TransformerLM
    (moe_eval_dense: exact dropless top-2 inference) agree on logits."""
    hf = _hf_mixtral()
    model, params = _load_mixtral(hf)
    assert model.n_experts == EM and model.moe_every == 1
    assert model.moe_eval_dense and model.mlp == "swiglu"
    rng = np.random.default_rng(0)
    x = rng.integers(0, V, (2, 17)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_mixtral_greedy_generation_parity():
    """KV-cached greedy decode through the MoE blocks equals HF generate."""
    hf = _hf_mixtral(seed=3)
    model, params = _load_mixtral(hf)
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


def test_moe_eval_dense_matches_ample_capacity():
    """The dropless dense-eval path equals the capacity path whenever
    capacity cannot bind (C >= N): same weights, same eval output."""
    from neuralnetworklibrary_tpu.nn.transformer import MoEMLP

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 16)),
                    jnp.float32)
    kw = dict(d_model=16, d_ff=32, n_experts=4, gated=True,
              capacity_factor=8.0)
    cap = MoEMLP(**kw)
    variables = cap.init(jax.random.PRNGKey(0), x)
    y_cap, _ = cap.apply(variables, x)
    y_dense, aux = MoEMLP(**kw, eval_dense=True).apply(variables, x)
    np.testing.assert_allclose(np.asarray(y_dense), np.asarray(y_cap),
                               rtol=1e-5, atol=1e-6)
    assert float(aux) == 0.0
    # training still routes through the capacity/dropping path
    y_tr, aux_tr = MoEMLP(**kw, eval_dense=True).apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(y_tr), np.asarray(y_cap),
                               rtol=1e-5, atol=1e-6)
    assert float(aux_tr) > 0.0


# ------------------------------------------------------- Mistral (window)


def test_mistral_sliding_window_parity():
    """A Mistral checkpoint with sliding_window=W converts with window=W
    and matches HF logits at T > W — pinning that both sides use the
    same (t-W, t] attention band."""
    W = 4
    cfg = transformers.MistralConfig(
        vocab_size=V, hidden_size=D, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=HKV, max_position_embeddings=M,
        rms_norm_eps=1e-5, rope_theta=THETA, sliding_window=W,
        tie_word_embeddings=False, attention_dropout=0.0)
    torch.manual_seed(11)
    hf = transformers.MistralForCausalLM(cfg)
    hf.eval()
    model, params = load_llama(hf.state_dict(), n_layers=L, n_heads=H,
                               n_kv_heads=HKV, d_model=D, d_ff=F,
                               vocab_size=V, max_len=M, rope_base=THETA,
                               norm_eps=1e-5, window=W)
    rng = np.random.default_rng(4)
    x = rng.integers(0, V, (2, 13)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # the window is load-bearing: the unwindowed model must differ
    full_model, full_params = load_llama(
        hf.state_dict(), n_layers=L, n_heads=H, n_kv_heads=HKV, d_model=D,
        d_ff=F, vocab_size=V, max_len=M, rope_base=THETA, norm_eps=1e-5)
    un = np.asarray(full_model.apply({"params": full_params},
                                     jnp.asarray(x))[0])
    assert np.abs(un - want).max() > 1e-3


def test_load_llama_dir_dispatches_mixtral(tmp_path):
    """A Mixtral HF snapshot directory (config.json + safetensors) loads
    through load_llama_dir with the MoE architecture auto-configured."""
    import json

    from neuralnetworklibrary_tpu.utils.llama_convert import load_llama_dir
    from neuralnetworklibrary_tpu.utils.safetensors_io import (
        save_safetensors)

    hf = _hf_mixtral(seed=9)
    cfg = dict(model_type="mixtral", num_hidden_layers=L,
               num_attention_heads=H, num_key_value_heads=HKV,
               hidden_size=D, intermediate_size=F, vocab_size=V,
               max_position_embeddings=M, rope_theta=THETA,
               rms_norm_eps=1e-5, num_local_experts=EM,
               num_experts_per_tok=2, sliding_window=None)
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    save_safetensors(sd, str(tmp_path / "model.safetensors"))
    model, params = load_llama_dir(str(tmp_path))
    assert model.n_experts == EM and model.moe_eval_dense
    rng = np.random.default_rng(6)
    x = rng.integers(0, V, (1, 12)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_qwen2_logits_and_generation_parity():
    """Qwen2 = the Llama layout plus q/k/v projection biases; the converter
    picks them up from the state_dict (zeros elsewhere stay exact)."""
    cfg = transformers.Qwen2Config(
        vocab_size=V, hidden_size=D, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=HKV, max_position_embeddings=M,
        rms_norm_eps=1e-5, rope_theta=THETA, tie_word_embeddings=False,
        attention_dropout=0.0)
    torch.manual_seed(13)
    hf = transformers.Qwen2ForCausalLM(cfg)
    hf.eval()
    # HF _init_weights zeroes Linear biases at random init — randomize the
    # q/k/v biases so the parity check actually exercises the bias path
    with torch.no_grad():
        for layer in hf.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj):
                proj.bias.normal_(0.0, 0.3)
    assert "model.layers.0.self_attn.q_proj.bias" in hf.state_dict()
    model, params = load_llama(hf.state_dict(), n_layers=L, n_heads=H,
                               n_kv_heads=HKV, d_model=D, d_ff=F,
                               vocab_size=V, max_len=M, rope_base=THETA,
                               norm_eps=1e-5)
    assert np.abs(params["block_0"]["attn"]["qkv"]["bias"]).max() > 0
    rng = np.random.default_rng(8)
    x = rng.integers(0, V, (2, 15)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    n = 5
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor(x[:1], dtype=torch.long),
                             max_new_tokens=n, do_sample=False,
                             pad_token_id=0)
    want_g = hf_out.numpy()[:, x.shape[1]:]
    got_g = np.asarray(generate(model, params, jnp.asarray(x[:1]), n=n,
                                k=1))
    np.testing.assert_array_equal(got_g, want_g)


def test_qwen3_logits_and_generation_parity():
    """Qwen3 = Llama + per-head q/k RMSNorms before RoPE (qk_norm) + a
    head_dim decoupled from hidden_size; the converter maps the HF
    q_norm/k_norm leaves and load_qwen3 configures both options."""
    from neuralnetworklibrary_tpu.utils.llama_convert import load_qwen3

    HD = 20                             # ≠ D // H = 16 on purpose
    cfg = transformers.Qwen3Config(
        vocab_size=V, hidden_size=D, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=HKV, head_dim=HD, max_position_embeddings=M,
        rms_norm_eps=1e-6, rope_theta=THETA, tie_word_embeddings=False,
        attention_dropout=0.0, use_sliding_window=False)
    torch.manual_seed(21)
    hf = transformers.Qwen3ForCausalLM(cfg)
    hf.eval()
    # make the q/k norm scales non-trivial so the parity check bites
    with torch.no_grad():
        for layer in hf.model.layers:
            layer.self_attn.q_norm.weight.normal_(1.0, 0.2)
            layer.self_attn.k_norm.weight.normal_(1.0, 0.2)
    model, params = load_qwen3(hf.state_dict(), n_layers=L, n_heads=H,
                               n_kv_heads=HKV, d_model=D, d_ff=F,
                               vocab_size=V, head_dim=HD, max_len=M,
                               rope_base=THETA, norm_eps=1e-6)
    assert model.qk_norm and model.head_dim == HD
    assert params["block_0"]["attn"]["q_norm"]["scale"].shape == (HD,)
    rng = np.random.default_rng(11)
    x = rng.integers(0, V, (2, 13)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    n = 5
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor(x[:1], dtype=torch.long),
                             max_new_tokens=n, do_sample=False,
                             pad_token_id=0)
    want_g = hf_out.numpy()[:, x.shape[1]:]
    got_g = np.asarray(generate(model, params, jnp.asarray(x[:1]), n=n,
                                k=1))
    np.testing.assert_array_equal(got_g, want_g)


def test_gemma_logits_and_generation_parity():
    """Gemma = sqrt(D)-scaled input embeddings, zero-centered RMSNorm
    weights (folded to 1+w at conversion), GEGLU MLP, decoupled head_dim,
    tied decoder."""
    from neuralnetworklibrary_tpu.utils.llama_convert import load_gemma

    HD = 24
    cfg = transformers.GemmaConfig(
        vocab_size=V, hidden_size=D, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=HKV, head_dim=HD, max_position_embeddings=M,
        rms_norm_eps=1e-6, rope_theta=THETA,
        hidden_activation="gelu_pytorch_tanh", attention_dropout=0.0)
    torch.manual_seed(17)
    hf = transformers.GemmaForCausalLM(cfg)
    hf.eval()
    # zero-centered norm weights are trivially 0 at HF init — randomize so
    # the 1+w fold is actually exercised
    with torch.no_grad():
        for layer in hf.model.layers:
            layer.input_layernorm.weight.normal_(0.0, 0.2)
            layer.post_attention_layernorm.weight.normal_(0.0, 0.2)
        hf.model.norm.weight.normal_(0.0, 0.2)
    model, params = load_gemma(hf.state_dict(), n_layers=L, n_heads=H,
                               n_kv_heads=HKV, d_model=D, d_ff=F,
                               vocab_size=V, head_dim=HD, max_len=M,
                               rope_base=THETA, norm_eps=1e-6)
    assert model.tied_decoder and model.mlp == "geglu"
    assert abs(model.embed_scale - D ** 0.5) < 1e-9
    rng = np.random.default_rng(12)
    x = rng.integers(0, V, (2, 11)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
    n = 5
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor(x[:1], dtype=torch.long),
                             max_new_tokens=n, do_sample=False,
                             pad_token_id=0)
    want_g = hf_out.numpy()[:, x.shape[1]:]
    got_g = np.asarray(generate(model, params, jnp.asarray(x[:1]), n=n,
                                k=1))
    np.testing.assert_array_equal(got_g, want_g)


def test_load_llama_dir_dispatches_qwen3_and_gemma(tmp_path):
    """config.json model_type qwen3/gemma route to their loaders with
    head_dim picked up; Qwen2-style use_sliding_window=False suppresses a
    carried sliding_window value."""
    import json

    from neuralnetworklibrary_tpu.utils.llama_convert import load_llama_dir
    from neuralnetworklibrary_tpu.utils.safetensors_io import (
        save_safetensors)

    HD = 20
    cfg = transformers.Qwen3Config(
        vocab_size=V, hidden_size=D, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=HKV, head_dim=HD, max_position_embeddings=M,
        rms_norm_eps=1e-6, rope_theta=THETA, tie_word_embeddings=False,
        attention_dropout=0.0, use_sliding_window=False)
    torch.manual_seed(23)
    hf = transformers.Qwen3ForCausalLM(cfg)
    hf.eval()
    d = tmp_path / "qwen3"
    d.mkdir()
    jc = dict(model_type="qwen3", num_hidden_layers=L,
              num_attention_heads=H, num_key_value_heads=HKV,
              hidden_size=D, intermediate_size=F, vocab_size=V,
              head_dim=HD, max_position_embeddings=M, rope_theta=THETA,
              rms_norm_eps=1e-6, sliding_window=4096,
              use_sliding_window=False)
    (d / "config.json").write_text(json.dumps(jc))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    save_safetensors(sd, str(d / "model.safetensors"))
    model, params = load_llama_dir(str(d))
    assert model.qk_norm and model.head_dim == HD and model.window == 0
    rng = np.random.default_rng(14)
    x = rng.integers(0, V, (1, 9)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _gemma2_hf(hd=24, window=8, seed=31):
    """Random-init Gemma2 with every Gemma2-specific knob NON-trivial:
    small softcaps (so the tanh actually bends random-init logits), a
    sliding window shorter than the test sequences (so local vs global
    layers differ), query_pre_attn_scalar != head_dim, and randomized
    zero-centered norm weights on all FOUR per-block norms."""
    cfg = transformers.Gemma2Config(
        vocab_size=V, hidden_size=D, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=HKV, head_dim=hd, max_position_embeddings=M,
        rms_norm_eps=1e-6, rope_theta=THETA,
        hidden_activation="gelu_pytorch_tanh", attention_dropout=0.0,
        query_pre_attn_scalar=13.0, attn_logit_softcapping=5.0,
        final_logit_softcapping=2.0, sliding_window=window)
    torch.manual_seed(seed)
    hf = transformers.Gemma2ForCausalLM(cfg)
    hf.eval()
    with torch.no_grad():
        for layer in hf.model.layers:
            layer.input_layernorm.weight.normal_(0.0, 0.2)
            layer.post_attention_layernorm.weight.normal_(0.0, 0.2)
            layer.pre_feedforward_layernorm.weight.normal_(0.0, 0.2)
            layer.post_feedforward_layernorm.weight.normal_(0.0, 0.2)
        hf.model.norm.weight.normal_(0.0, 0.2)
    return cfg, hf


def test_gemma2_logits_and_generation_parity():
    """Gemma2 = Gemma + sandwich post-norms, tanh attention/final logit
    soft-capping, alternating sliding/full layers, query_pre_attn_scalar
    attention scale (modeling_gemma2.py: eager_attention_forward softcap,
    layer_types sliding_attention alternation)."""
    from neuralnetworklibrary_tpu.utils.llama_convert import load_gemma2

    HD, W = 24, 8
    cfg, hf = _gemma2_hf(hd=HD, window=W)
    model, params = load_gemma2(hf.state_dict(), n_layers=L, n_heads=H,
                                n_kv_heads=HKV, d_model=D, d_ff=F,
                                vocab_size=V, head_dim=HD, max_len=M,
                                rope_base=THETA, norm_eps=1e-6,
                                query_pre_attn_scalar=13.0,
                                attn_softcap=5.0, logit_softcap=2.0,
                                sliding_window=W,
                                layer_types=cfg.layer_types)
    assert model.tied_decoder and model.post_norm
    assert model.window_pattern == tuple(
        W if t == "sliding_attention" else 0 for t in cfg.layer_types)
    assert any(w == 0 for w in model.window_pattern) and any(
        w == W for w in model.window_pattern)
    rng = np.random.default_rng(19)
    x = rng.integers(0, V, (2, 13)).astype(np.int32)   # T=13 > window=8
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
    # greedy generation crosses the sliding-window boundary mid-decode —
    # pins the per-layer-window KV-cached path against HF's cache
    n = 6
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor(x[:1], dtype=torch.long),
                             max_new_tokens=n, do_sample=False,
                             pad_token_id=0)
    want_g = hf_out.numpy()[:, x.shape[1]:]
    got_g = np.asarray(generate(model, params, jnp.asarray(x[:1]), n=n,
                                k=1))
    np.testing.assert_array_equal(got_g, want_g)


def test_load_llama_dir_dispatches_gemma2(tmp_path):
    """model_type gemma2 routes to load_gemma2 with the softcaps, scalar,
    and layer_types picked up from config.json — and the generic
    sliding_window→window fallback must NOT fire (the window rides
    window_pattern)."""
    import json

    from neuralnetworklibrary_tpu.utils.llama_convert import load_llama_dir
    from neuralnetworklibrary_tpu.utils.safetensors_io import (
        save_safetensors)

    HD, W = 24, 8
    cfg, hf = _gemma2_hf(hd=HD, window=W, seed=37)
    d = tmp_path / "gemma2"
    d.mkdir()
    jc = dict(model_type="gemma2", num_hidden_layers=L,
              num_attention_heads=H, num_key_value_heads=HKV,
              hidden_size=D, intermediate_size=F, vocab_size=V,
              head_dim=HD, max_position_embeddings=M, rope_theta=THETA,
              rms_norm_eps=1e-6, query_pre_attn_scalar=13.0,
              attn_logit_softcapping=5.0, final_logit_softcapping=2.0,
              sliding_window=W, layer_types=list(cfg.layer_types))
    (d / "config.json").write_text(json.dumps(jc))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    save_safetensors(sd, str(d / "model.safetensors"))
    model, params = load_llama_dir(str(d))
    assert model.window == 0 and model.post_norm
    assert model.attn_softcap == 5.0 and model.logit_softcap == 2.0
    rng = np.random.default_rng(21)
    x = rng.integers(0, V, (1, 12)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_phi3_logits_and_generation_parity():
    """Phi-3 = the Llama block with checkpoint-fused [q|k|v] qkv_proj and
    [gate|up] gate_up_proj (modeling_phi3.py:160,54) and a sliding window
    on every layer (mini-4k ships 2047) — window=8 here so the sequences
    actually cross it."""
    from neuralnetworklibrary_tpu.utils.llama_convert import load_phi3

    W = 8
    cfg = transformers.Phi3Config(
        vocab_size=V, hidden_size=D, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=HKV, max_position_embeddings=M,
        rms_norm_eps=1e-5, rope_theta=THETA, tie_word_embeddings=False,
        attention_dropout=0.0, resid_pdrop=0.0, embd_pdrop=0.0,
        sliding_window=W, pad_token_id=0, bos_token_id=1, eos_token_id=2)
    torch.manual_seed(41)
    hf = transformers.Phi3ForCausalLM(cfg)
    hf.eval()
    model, params = load_phi3(hf.state_dict(), n_layers=L, n_heads=H,
                              n_kv_heads=HKV, d_model=D, d_ff=F,
                              vocab_size=V, max_len=M, rope_base=THETA,
                              norm_eps=1e-5, window=W)
    assert not model.tied_decoder and model.window == W
    rng = np.random.default_rng(23)
    x = rng.integers(0, V, (2, 13)).astype(np.int32)    # T=13 > window=8
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    n = 6
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor(x[:1], dtype=torch.long),
                             max_new_tokens=n, do_sample=False,
                             pad_token_id=0)
    want_g = hf_out.numpy()[:, x.shape[1]:]
    got_g = np.asarray(generate(model, params, jnp.asarray(x[:1]), n=n,
                                k=1))
    np.testing.assert_array_equal(got_g, want_g)


def test_gpt_oss_logits_and_generation_parity():
    """GPT-OSS = attention sinks + alternating sliding/full layers +
    biased q/k/v/o + a biased top-k router whose weights are the softmax
    over the selected logits + clamped-GLU experts with interleaved
    [gate|up] columns (modeling_gpt_oss.py GptOssExperts/GptOssTopKRouter).
    top_k=3 of 4 experts exercises the general (k>2) eval_dense path;
    window=8 < T so sliding and full layers genuinely differ.
    rope_scaling=None (YaRN unsupported — random-init parity only needs
    plain rope)."""
    from neuralnetworklibrary_tpu.utils.llama_convert import load_gpt_oss

    HD, W, E, K = 24, 8, 4, 3
    cfg = transformers.GptOssConfig(
        vocab_size=V, hidden_size=D, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=HKV, head_dim=HD, max_position_embeddings=M,
        rms_norm_eps=1e-5, rope_theta=THETA, rope_scaling=None,
        tie_word_embeddings=False, attention_dropout=0.0,
        num_local_experts=E, num_experts_per_tok=K, sliding_window=W,
        pad_token_id=0)
    torch.manual_seed(47)
    hf = transformers.GptOssForCausalLM(cfg)
    hf.eval()
    model, params = load_gpt_oss(hf.state_dict(), n_layers=L, n_heads=H,
                                 n_kv_heads=HKV, d_model=D, d_ff=F,
                                 vocab_size=V, head_dim=HD, max_len=M,
                                 rope_base=THETA, norm_eps=1e-5,
                                 n_experts=E, moe_top_k=K,
                                 sliding_window=W,
                                 layer_types=cfg.layer_types)
    assert model.sinks and model.moe_gate_bias and model.moe_top_k == K
    assert model.window_pattern == (W, 0, W)
    rng = np.random.default_rng(29)
    x = rng.integers(0, V, (2, 13)).astype(np.int32)    # T=13 > window=8
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
    n = 6
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor(x[:1], dtype=torch.long),
                             max_new_tokens=n, do_sample=False,
                             pad_token_id=0)
    want_g = hf_out.numpy()[:, x.shape[1]:]
    got_g = np.asarray(generate(model, params, jnp.asarray(x[:1]), n=n,
                                k=1))
    np.testing.assert_array_equal(got_g, want_g)


# ------------------------------------------------- rope scaling (r4)


def _rs_tuple(rs, hd, base=THETA, max_len=M, orig=0):
    from neuralnetworklibrary_tpu.nn.transformer import rope_scaling_tuple

    return rope_scaling_tuple(rs, hd, base, max_len, original_max=orig)


def test_yarn_rope_scaling_parity():
    """Llama + YaRN rope_scaling (truncate default): logits parity at short
    AND beyond-original-window positions, and greedy generation."""
    rs = {"rope_type": "yarn", "factor": 4.0,
          "original_max_position_embeddings": 16}
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=D, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=HKV, max_position_embeddings=M,
        rms_norm_eps=1e-5, rope_theta=THETA, tie_word_embeddings=False,
        attention_dropout=0.0, rope_scaling=dict(rs))
    torch.manual_seed(51)
    hf = transformers.LlamaForCausalLM(cfg)
    hf.eval()
    model, params = load_llama(
        hf.state_dict(), n_layers=L, n_heads=H, n_kv_heads=HKV, d_model=D,
        d_ff=F, vocab_size=V, max_len=M, rope_base=THETA, norm_eps=1e-5,
        rope_scaling=_rs_tuple(rs, D // H))
    assert model.rope_scaling[0] == "yarn" and model.rope_scaling[6] is True
    rng = np.random.default_rng(31)
    for T in (12, 40):  # below and beyond the original 16-token window
        x = rng.integers(0, V, (2, T)).astype(np.int32)
        with torch.no_grad():
            want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
        got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    x = rng.integers(0, V, (1, 12)).astype(np.int32)
    n = 8  # crosses position 16 mid-generation
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor(x, dtype=torch.long),
                             max_new_tokens=n, do_sample=False,
                             pad_token_id=0)
    got_g = np.asarray(generate(model, params, jnp.asarray(x), n=n, k=1))
    np.testing.assert_array_equal(got_g, hf_out.numpy()[:, x.shape[1]:])


def test_llama3_rope_scaling_parity():
    """Llama-3.1's llama3 rope_scaling (banded wavelength rescale)."""
    rs = {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
          "high_freq_factor": 4.0, "original_max_position_embeddings": 32}
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=D, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=HKV, max_position_embeddings=M,
        rms_norm_eps=1e-5, rope_theta=THETA, tie_word_embeddings=False,
        attention_dropout=0.0, rope_scaling=dict(rs))
    torch.manual_seed(53)
    hf = transformers.LlamaForCausalLM(cfg)
    hf.eval()
    model, params = load_llama(
        hf.state_dict(), n_layers=L, n_heads=H, n_kv_heads=HKV, d_model=D,
        d_ff=F, vocab_size=V, max_len=M, rope_base=THETA, norm_eps=1e-5,
        rope_scaling=_rs_tuple(rs, D // H))
    rng = np.random.default_rng(37)
    for T in (12, 48):
        x = rng.integers(0, V, (1, T)).astype(np.int32)
        with torch.no_grad():
            want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
        got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gpt_oss_yarn_parity():
    """The released GPT-OSS rope_scaling shape: YaRN with truncate=False —
    the exact config load_gpt_oss used to reject."""
    from neuralnetworklibrary_tpu.utils.llama_convert import load_gpt_oss

    HD, W, E, K = 24, 8, 4, 4
    rs = {"rope_type": "yarn", "factor": 4.0, "beta_fast": 32.0,
          "beta_slow": 1.0, "original_max_position_embeddings": 16,
          "truncate": False}
    cfg = transformers.GptOssConfig(
        vocab_size=V, hidden_size=D, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=HKV, head_dim=HD, max_position_embeddings=M,
        rms_norm_eps=1e-5, rope_theta=THETA, rope_scaling=dict(rs),
        tie_word_embeddings=False, attention_dropout=0.0,
        num_local_experts=E, num_experts_per_tok=K, sliding_window=W,
        pad_token_id=0)
    torch.manual_seed(57)
    hf = transformers.GptOssForCausalLM(cfg)
    hf.eval()
    model, params = load_gpt_oss(
        hf.state_dict(), n_layers=L, n_heads=H, n_kv_heads=HKV, d_model=D,
        d_ff=F, vocab_size=V, head_dim=HD, max_len=M, rope_base=THETA,
        norm_eps=1e-5, n_experts=E, moe_top_k=K, sliding_window=W,
        layer_types=cfg.layer_types, rope_scaling=_rs_tuple(rs, HD))
    assert model.rope_scaling[6] is False  # truncate threads through
    rng = np.random.default_rng(41)
    for T in (13, 24):
        x = rng.integers(0, V, (1, T)).astype(np.int32)
        with torch.no_grad():
            want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
        got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_phi3_longrope_dir_parity(tmp_path):
    """Phi-3 128k-style longrope through the FULL load_llama_dir wiring
    (config.json normalization → rope_scaling_tuple → TransformerLM):
    short-context logits use short_factor, beyond-original logits switch
    to long_factor (HF's dynamic frequency update), greedy generation
    crosses the boundary mid-decode."""
    import json

    from neuralnetworklibrary_tpu.utils.llama_convert import load_llama_dir
    from neuralnetworklibrary_tpu.utils.safetensors_io import (
        save_safetensors)

    ORIG = 32
    hd2 = (D // H) // 2
    trng = np.random.default_rng(43)
    short = [1.0 + float(v) for v in trng.uniform(0, 0.5, hd2)]
    long = [2.0 + float(v) for v in trng.uniform(0, 2.0, hd2)]
    rs = {"type": "longrope", "short_factor": short, "long_factor": long}
    cfg = transformers.Phi3Config(
        vocab_size=V, hidden_size=D, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=HKV, max_position_embeddings=M,
        original_max_position_embeddings=ORIG,
        rms_norm_eps=1e-5, rope_theta=THETA, tie_word_embeddings=False,
        attention_dropout=0.0, resid_pdrop=0.0, embd_pdrop=0.0,
        sliding_window=None, rope_scaling=dict(rs),
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    torch.manual_seed(59)
    hf = transformers.Phi3ForCausalLM(cfg)
    hf.eval()

    dir_cfg = dict(model_type="phi3", num_hidden_layers=L,
                   num_attention_heads=H, num_key_value_heads=HKV,
                   hidden_size=D, intermediate_size=F, vocab_size=V,
                   max_position_embeddings=M,
                   original_max_position_embeddings=ORIG,
                   rope_theta=THETA, rms_norm_eps=1e-5,
                   rope_scaling=rs)
    (tmp_path / "config.json").write_text(json.dumps(dir_cfg))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    save_safetensors(sd, str(tmp_path / "model.safetensors"))
    model, params = load_llama_dir(str(tmp_path))
    assert model.rope_scaling[0] == "longrope"
    assert model.rope_scaling[1] == ORIG

    rng = np.random.default_rng(47)
    for T in (20, 48):  # short_factor regime / long_factor regime
        x = rng.integers(0, V, (1, T)).astype(np.int32)
        with torch.no_grad():
            want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
        got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    x = rng.integers(0, V, (1, 28)).astype(np.int32)
    n = 10  # decode crosses position 32 → the per-call select flips
    hf.generation_config.eos_token_id = None  # never stop early (greedy
    # argmax may legitimately emit token id 2; our generate has no eos)
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor(x, dtype=torch.long),
                             max_new_tokens=n, do_sample=False,
                             pad_token_id=0)
    got_g = np.asarray(generate(model, params, jnp.asarray(x), n=n, k=1))
    np.testing.assert_array_equal(got_g, hf_out.numpy()[:, x.shape[1]:])


def test_longrope_per_row_select_in_batched_decode():
    """Continuous-batching decode: each ROW picks its own short/long
    longrope regime (HF's seq_len is per sequence) — a slot past the
    original window must not flip a short slot's frequencies.  Pinned by
    comparing the mixed batch against each row decoded alone."""
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    ORIG, MAXLEN = 16, 64
    hd2 = (D // H) // 2
    trng = np.random.default_rng(61)
    rs = ("longrope", ORIG,
          tuple(1.0 + trng.uniform(0, 0.5, hd2)),
          tuple(2.0 + trng.uniform(0, 2.0, hd2)), 1.1)
    model = TransformerLM(vocab_size=V, d_model=D, n_heads=H,
                          n_kv_heads=HKV, n_layers=L, max_len=MAXLEN,
                          drop=0.0, pos_embedding="rope", rope_scaling=rs)
    x1 = jnp.zeros((1, 1), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x1)
    rng = np.random.default_rng(67)
    toks = jnp.asarray(rng.integers(0, V, (2, 1)), jnp.int32)
    offs = jnp.asarray([4, 40], jnp.int32)   # short regime / long regime

    batched, _ = model.apply(variables, toks, decode=True,
                             offsets=offs, mutable=["cache"])
    for i in range(2):
        solo, _ = model.apply(variables, toks[i:i + 1], decode=True,
                              offsets=offs[i:i + 1], mutable=["cache"])
        np.testing.assert_allclose(np.asarray(batched[0][i]),
                                   np.asarray(solo[0][0]),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"row {i} regime leaked")


def test_phi2_logits_and_generation_parity():
    """PhiForCausalLM (Phi-1/Phi-2): parallel residual (attn and MLP both
    read ln1), biased projections + LayerNorm + biased untied lm_head,
    partial rotary.  Logits AND greedy generation match HF."""
    from neuralnetworklibrary_tpu.utils.llama_convert import load_phi2

    cfg = transformers.PhiConfig(
        vocab_size=V, hidden_size=D, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=H, max_position_embeddings=M,
        layer_norm_eps=1e-5, rope_theta=THETA,
        partial_rotary_factor=0.5, hidden_act="gelu_new",
        tie_word_embeddings=False, attention_dropout=0.0,
        qk_layernorm=False)
    torch.manual_seed(41)
    hf = transformers.PhiForCausalLM(cfg)
    hf.eval()
    hd = D // H
    model, params = load_phi2(hf.state_dict(), n_layers=L, n_heads=H,
                              d_model=D, d_ff=F, vocab_size=V, max_len=M,
                              rope_base=THETA, rotary_dim=int(hd * 0.5),
                              norm_eps=1e-5)
    assert model.parallel_block and model.head_bias
    rng = np.random.default_rng(43)
    x = rng.integers(0, V, (2, 13)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
    n = 5
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor(x[:1], dtype=torch.long),
                             max_new_tokens=n, do_sample=False,
                             pad_token_id=0)
    want_g = hf_out.numpy()[:, x.shape[1]:]
    got_g = np.asarray(generate(model, params, jnp.asarray(x[:1]), n=n,
                                k=1))
    np.testing.assert_array_equal(got_g, want_g)


def test_load_llama_dir_dispatches_phi2(tmp_path):
    """model_type 'phi' + partial_rotary_factor flows through the dir
    loader into rotary_dim."""
    import json

    from neuralnetworklibrary_tpu.utils.llama_convert import load_llama_dir
    from neuralnetworklibrary_tpu.utils.safetensors_io import (
        save_safetensors,
    )

    cfg = transformers.PhiConfig(
        vocab_size=V, hidden_size=D, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=H, max_position_embeddings=M,
        layer_norm_eps=1e-5, rope_theta=THETA,
        partial_rotary_factor=0.5, hidden_act="gelu_new",
        tie_word_embeddings=False, attention_dropout=0.0,
        qk_layernorm=False)
    torch.manual_seed(47)
    hf = transformers.PhiForCausalLM(cfg)
    hf.eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    save_safetensors(sd, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(
        json.dumps({**cfg.to_dict(), "model_type": "phi"}))
    model, params = load_llama_dir(str(tmp_path))
    assert model.rotary_dim == int((D // H) * 0.5)
    rng = np.random.default_rng(48)
    x = rng.integers(0, V, (1, 9)).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(x, dtype=torch.long)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
