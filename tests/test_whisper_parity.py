"""Activation parity: a random-init HuggingFace Whisper (torch, CPU) and
the converted TransformerSeq2Seq(audio_frontend=True) produce the same
encoder memory, teacher-forced logits, and greedy continuations — the
pretrained-load proof for the speech-to-text family (same pattern as
test_t5_parity.py: no weight downloads; what's validated is the
ARCHITECTURE — the gelu conv frontend, sinusoidal-position load, fused
qkv with the bias-free k_proj, erf gelu, eps 1e-5 — and the converter)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neuralnetworklibrary_tpu.nn.seq2seq import (  # noqa: E402
    TransformerSeq2Seq,
    seq2seq_generate,
)
from neuralnetworklibrary_tpu.utils.whisper_convert import (  # noqa: E402
    load_whisper,
)

LE, LD, H, D, F, V = 2, 2, 4, 64, 96, 51
MELS, SRC_POS, TGT_POS = 16, 24, 32     # frames = 2*SRC_POS = 48
BOS = 50                                # decoder_start_token_id


def _hf_model(seed=0):
    cfg = transformers.WhisperConfig(
        vocab_size=V, num_mel_bins=MELS, d_model=D,
        encoder_layers=LE, encoder_attention_heads=H,
        decoder_layers=LD, decoder_attention_heads=H,
        encoder_ffn_dim=F, decoder_ffn_dim=F,
        max_source_positions=SRC_POS, max_target_positions=TGT_POS,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        activation_function="gelu", decoder_start_token_id=BOS,
        pad_token_id=V - 2, bos_token_id=BOS, eos_token_id=V - 3)
    torch.manual_seed(seed)
    m = transformers.WhisperForConditionalGeneration(cfg)
    m.eval()
    return m


def _load(hf):
    return load_whisper(hf.state_dict(), n_mels=MELS, d_model=D, n_heads=H,
                        enc_layers=LE, dec_layers=LD, vocab_size=V,
                        max_source_positions=SRC_POS,
                        max_target_positions=TGT_POS, d_ff=F)


def _features(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1, (n, MELS, 2 * SRC_POS)).astype(np.float32)


def test_encoder_parity():
    hf = _hf_model(0)
    model, params = _load(hf)
    feats = _features(3, 1)
    with torch.no_grad():
        want = hf.model.encoder(
            torch.tensor(feats)).last_hidden_state.numpy()
    got, mask = model.apply({"params": params}, jnp.asarray(feats),
                            method=TransformerSeq2Seq.encode)
    assert np.asarray(mask).all()
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_teacher_forced_logits_parity():
    hf = _hf_model(1)
    model, params = _load(hf)
    feats = _features(2, 2)
    rng = np.random.default_rng(3)
    tgt = np.concatenate(
        [np.full((2, 1), BOS), rng.integers(0, V - 3, (2, 7))],
        axis=1).astype(np.int64)
    with torch.no_grad():
        want = hf(input_features=torch.tensor(feats),
                  decoder_input_ids=torch.tensor(tgt)).logits.numpy()
    got, _ = model.apply({"params": params}, jnp.asarray(feats),
                         jnp.asarray(tgt, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


def test_greedy_generation_parity():
    """Our cached seq2seq_generate reproduces an HF greedy decode loop
    token-for-token from the BOS start."""
    hf = _hf_model(2)
    model, params = _load(hf)
    feats = _features(2, 4)
    n = 10
    ids = torch.full((2, 1), BOS, dtype=torch.long)
    with torch.no_grad():
        enc = hf.model.encoder(torch.tensor(feats)).last_hidden_state
        for _ in range(n):
            lg = hf(encoder_outputs=(enc,), decoder_input_ids=ids).logits
            ids = torch.cat([ids, lg[:, -1].argmax(-1, keepdim=True)], 1)
    want = ids[:, 1:].numpy()
    got = np.asarray(seq2seq_generate(model, params, jnp.asarray(feats),
                                      n, bos=BOS, k=1))
    np.testing.assert_array_equal(got, want)


def test_dir_loading(tmp_path):
    """config.json + model.safetensors round-trip through
    load_whisper_dir."""
    import json

    from neuralnetworklibrary_tpu.utils.safetensors_io import (
        save_safetensors,
    )
    from neuralnetworklibrary_tpu.utils.whisper_convert import (
        load_whisper_dir,
    )

    hf = _hf_model(3)
    cfg = dict(num_mel_bins=MELS, d_model=D, encoder_attention_heads=H,
               encoder_layers=LE, decoder_layers=LD, vocab_size=V,
               max_source_positions=SRC_POS, max_target_positions=TGT_POS,
               encoder_ffn_dim=F, model_type="whisper")
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    save_safetensors(sd, str(tmp_path / "model.safetensors"))
    model, params = load_whisper_dir(str(tmp_path))
    feats = _features(1, 5)
    with torch.no_grad():
        want = hf.model.encoder(
            torch.tensor(feats)).last_hidden_state.numpy()
    got, _ = model.apply({"params": params}, jnp.asarray(feats),
                         method=TransformerSeq2Seq.encode)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_audio_frontend_trains():
    """Beyond conversion: the audio seq2seq learns a toy mel→token task
    through plain jitted steps (distinguish which half of the mel bands
    carries energy)."""
    model = TransformerSeq2Seq(
        vocab_size=8, pad_token=0, d_model=32, n_heads=4, enc_layers=1,
        dec_layers=1, d_ff=64, max_src_len=8, max_len=8, drop=0.0,
        audio_frontend=True, n_mels=6, exact_gelu=True, norm_eps=1e-5)
    rng = np.random.default_rng(0)
    n = 64
    labels = rng.integers(0, 2, n)
    feats = rng.normal(0, 0.1, (n, 6, 16)).astype(np.float32)
    feats[np.arange(n), labels * 3] += 3.0       # band 0 or band 3 hot
    tgt_in = np.full((n, 2), 6, np.int32)        # [bos, first-pred] teacher
    tgt_in[:, 1] = labels + 1
    tgt_out = np.zeros((n, 2), np.int32)
    tgt_out[:, 0] = labels + 1
    tgt_out[:, 1] = 7                            # eos

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats[:2]),
                        jnp.asarray(tgt_in[:2]))["params"]

    @jax.jit
    def step(p, f, ti, to):
        def loss(p):
            lg, _ = model.apply({"params": p}, f, ti)
            lp = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
            return -jnp.take_along_axis(lp, to[..., None], -1).mean()

        l, g = jax.value_and_grad(loss)(p)
        return jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, p, g), l

    f, ti, to = (jnp.asarray(x) for x in (feats, tgt_in, tgt_out))
    for _ in range(60):
        params, l = step(params, f, ti, to)
    assert float(l) < 0.1, float(l)
    toks = np.asarray(seq2seq_generate(model, params, f, 2, bos=6, k=1))
    assert (toks[:, 0] == labels + 1).mean() > 0.95

def test_beam_search_accepts_features():
    """seq2seq_beam_search handles (B, n_mels, frames) sources; beam=1
    equals greedy."""
    from neuralnetworklibrary_tpu.nn.seq2seq import seq2seq_beam_search

    hf = _hf_model(4)
    model, params = _load(hf)
    feats = jnp.asarray(_features(2, 6))
    greedy = np.asarray(seq2seq_generate(model, params, feats, 6, bos=BOS,
                                         k=1))
    b1, _ = seq2seq_beam_search(model, params, feats, 6, bos=BOS, beam=1)
    np.testing.assert_array_equal(np.asarray(b1), greedy)


def test_log_mel_matches_whisper_feature_extractor():
    """utils.audio.log_mel_spectrogram == transformers'
    WhisperFeatureExtractor on random waveforms (short → padded, exactly
    30 s, long → trimmed, ragged length)."""
    from neuralnetworklibrary_tpu.utils.audio import (
        batch_features,
        log_mel_spectrogram,
    )

    fe = transformers.WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(0)
    for n in (16000, 480000, 520000, 123457):
        wav = rng.normal(0, 0.1, n).astype(np.float32)
        want = fe(wav, sampling_rate=16000,
                  return_tensors="np")["input_features"][0]
        got = log_mel_spectrogram(wav)
        assert got.shape == want.shape == (80, 3000)
        np.testing.assert_allclose(got, want, atol=1e-5)
    wavs = [rng.normal(0, 0.1, 16000 * k).astype(np.float32)
            for k in (1, 2)]
    batch = batch_features(wavs)
    assert batch.shape == (2, 80, 3000)
    np.testing.assert_allclose(batch[0], log_mel_spectrogram(wavs[0]),
                               atol=1e-7)
