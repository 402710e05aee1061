"""utils/safetensors_io.py: differential parity with the reference
``safetensors`` library both directions, bf16 widening, and the
converter integration path (safetensors state_dict → load_llama)."""

import numpy as np
import pytest

from neuralnetworklibrary_tpu.utils.safetensors_io import (
    load_safetensors,
    save_safetensors,
)


def _tensors():
    rng = np.random.default_rng(0)
    return {
        "a.weight": rng.normal(size=(7, 5)).astype(np.float32),
        "a.bias": rng.normal(size=(7,)).astype(np.float32),
        "ids": rng.integers(-5, 5, (3, 2, 4)).astype(np.int64),
        "flags": rng.random((6,)) > 0.5,
        "half": rng.normal(size=(4, 4)).astype(np.float16),
        "scalar_ish": np.asarray(3.25, np.float32),
    }


def test_roundtrip_self(tmp_path):
    p = str(tmp_path / "t.safetensors")
    t = _tensors()
    save_safetensors(t, p, metadata={"format": "pt"})
    back = load_safetensors(p)
    assert set(back) == set(t)
    for k in t:
        assert back[k].dtype == t[k].dtype
        np.testing.assert_array_equal(back[k], t[k])


def test_reads_reference_library_files(tmp_path):
    st = pytest.importorskip("safetensors.numpy")
    p = str(tmp_path / "ref.safetensors")
    t = _tensors()
    st.save_file(t, p)
    back = load_safetensors(p)
    for k in t:
        np.testing.assert_array_equal(back[k], t[k])


def test_reference_library_reads_our_files(tmp_path):
    st = pytest.importorskip("safetensors.numpy")
    p = str(tmp_path / "ours.safetensors")
    t = _tensors()
    save_safetensors(t, p)
    back = st.load_file(p)
    for k in t:
        np.testing.assert_array_equal(back[k], t[k])


def test_bf16_widens_exactly(tmp_path):
    torch = pytest.importorskip("torch")
    st = pytest.importorskip("safetensors.torch")
    p = str(tmp_path / "bf16.safetensors")
    x = torch.randn(5, 3, dtype=torch.float32)
    st.save_file({"w": x.to(torch.bfloat16)}, p)
    back = load_safetensors(p)
    assert back["w"].dtype == np.float32
    np.testing.assert_array_equal(
        back["w"], x.to(torch.bfloat16).to(torch.float32).numpy())


def test_auto_loader_shapes(tmp_path):
    """load_safetensors_auto handles file / dir / HF index.json layouts."""
    import json

    from neuralnetworklibrary_tpu.utils.safetensors_io import (
        load_safetensors_auto)

    t = _tensors()
    names = sorted(t)
    half = len(names) // 2
    save_safetensors({k: t[k] for k in names[:half]},
                     str(tmp_path / "model-00001-of-00002.safetensors"))
    save_safetensors({k: t[k] for k in names[half:]},
                     str(tmp_path / "model-00002-of-00002.safetensors"))
    index = {"metadata": {}, "weight_map": {
        k: (f"model-0000{1 if i < half else 2}-of-00002.safetensors")
        for i, k in enumerate(names)}}
    ip = tmp_path / "model.safetensors.index.json"
    ip.write_text(json.dumps(index))

    for target in (str(tmp_path), str(ip)):     # dir resolves to the index
        back = load_safetensors_auto(target)
        assert set(back) == set(t)
        for k in t:
            np.testing.assert_array_equal(back[k], t[k])

    # single plain file, and a dir holding only plain shards (no index)
    single = tmp_path / "solo"
    single.mkdir()
    save_safetensors(t, str(single / "model.safetensors"))
    for target in (str(single / "model.safetensors"), str(single)):
        back = load_safetensors_auto(target)
        for k in t:
            np.testing.assert_array_equal(back[k], t[k])

    # index naming a tensor absent from every shard → clear error
    index["weight_map"]["ghost"] = "model-00001-of-00002.safetensors"
    ip.write_text(json.dumps(index))
    with pytest.raises(ValueError, match="ghost"):
        load_safetensors_auto(str(ip))


def test_load_llama_dir_sharded(tmp_path):
    """An HF save_pretrained snapshot (forced multi-shard safetensors +
    config.json) loads through load_llama_dir with exact logits parity vs
    the torch model's own state_dict path."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("safetensors.torch")
    import jax.numpy as jnp

    from neuralnetworklibrary_tpu.utils.llama_convert import (
        load_llama, load_llama_dir)

    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=48,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64,
                      rope_theta=10000.0, rms_norm_eps=1e-5,
                      tie_word_embeddings=False)
    torch.manual_seed(1)
    hf = LlamaForCausalLM(cfg).eval()
    d = tmp_path / "snap"
    hf.save_pretrained(str(d), safe_serialization=True,
                       max_shard_size="40KB")
    import os
    assert any(f.endswith(".index.json") for f in os.listdir(d)), \
        "shard size did not force a multi-file checkpoint"

    model, params = load_llama_dir(str(d))
    m1, p1 = load_llama(hf.state_dict(), n_layers=2, n_heads=4,
                        n_kv_heads=2, d_model=32, d_ff=48, vocab_size=64,
                        max_len=64)
    assert model.max_len == 64 and model.tied_decoder == m1.tied_decoder
    ids = np.random.default_rng(3).integers(0, 64, (2, 9))
    np.testing.assert_allclose(
        np.asarray(model.apply({"params": params}, jnp.asarray(ids))[0]),
        np.asarray(m1.apply({"params": p1}, jnp.asarray(ids))[0]),
        atol=1e-5)


def test_feeds_llama_converter(tmp_path):
    """A Llama state_dict written as safetensors loads through our parser
    into load_llama with logits equal to the torch-dict path."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from neuralnetworklibrary_tpu.utils.llama_convert import load_llama

    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=48,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(cfg).eval()
    sd = hf.state_dict()
    p = str(tmp_path / "llama.safetensors")
    save_safetensors({k: v.numpy() for k, v in sd.items()}, p)

    kw = dict(n_layers=2, n_heads=4, n_kv_heads=2, d_model=32, d_ff=48,
              vocab_size=64, max_len=64)
    m1, p1 = load_llama(sd, **kw)
    m2, p2 = load_llama(load_safetensors(p), **kw)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 7)),
                      jnp.int32)
    np.testing.assert_allclose(
        np.asarray(m1.apply({"params": p1}, ids)[0]),
        np.asarray(m2.apply({"params": p2}, ids)[0]), atol=1e-6)
