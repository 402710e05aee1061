"""Log-mel spectrogram frontend — raw waveform → the (n_mels, frames)
features :class:`nn.seq2seq.TransformerSeq2Seq(audio_frontend=True)` eats.

Numerically matches HuggingFace's ``WhisperFeatureExtractor`` (itself the
reference implementation from openai/whisper): hann-windowed STFT (n_fft
400, hop 160), magnitude², slaney-scale mel filterbank (triangular filters
with slaney area normalization), log10 clamped to (max − 8), rescaled to
[−1, 1]-ish by (x + 4) / 4.  Differential-tested against the transformers
extractor in tests/test_whisper_parity.py (same waveforms, atol 1e-5).

Pure numpy on purpose: feature extraction is host-side data loading (the
reference framework's transform stage), runs once per utterance, and feeds
the device the (80, 3000) block — the TPU path starts at the conv
frontend.  Zero dependencies beyond numpy (no librosa/torchaudio in the
image).

Reference: beyond parity — the reference has no audio modality.
"""

from __future__ import annotations

import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30                    # seconds per padded window
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE


def _hertz_to_mel(freq):
    """Slaney scale: linear below 1 kHz, logarithmic above (librosa's
    htk=False, what Whisper uses)."""
    freq = np.asarray(freq, np.float64)
    mels = freq / (200.0 / 3)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3)
    logstep = np.log(6.4) / 27.0
    return np.where(freq >= min_log_hz,
                    min_log_mel + np.log(np.maximum(freq, 1e-10)
                                         / min_log_hz) / logstep, mels)


def _mel_to_hertz(mels):
    mels = np.asarray(mels, np.float64)
    freq = mels * (200.0 / 3)
    min_log_mel = 1000.0 / (200.0 / 3)
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel,
                    1000.0 * np.exp(logstep * (mels - min_log_mel)), freq)


def mel_filter_bank(n_freqs: int = N_FFT // 2 + 1, n_mels: int = 80,
                    sample_rate: int = SAMPLE_RATE, fmin: float = 0.0,
                    fmax: float = 8000.0) -> np.ndarray:
    """(n_freqs, n_mels) slaney-normalized triangular filterbank — the
    matrix WhisperFeatureExtractor builds (mel_scale='slaney',
    norm='slaney')."""
    fft_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(_hertz_to_mel(fmin), _hertz_to_mel(fmax),
                          n_mels + 2)
    hz_pts = _mel_to_hertz(mel_pts)                    # (n_mels + 2,)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[None, :] - fft_freqs[:, None]       # (n_freqs, m+2)
    lower = -ramps[:, :-2] / fdiff[None, :-1]
    upper = ramps[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    # slaney area normalization: each filter integrates to ~constant energy
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    return (fb * enorm[None, :]).astype(np.float64)


def log_mel_spectrogram(audio, n_mels: int = 80, padding: bool = True,
                        sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Waveform (T,) float in [-1, 1] → (n_mels, frames) float32 log-mel
    features (frames = 3000 with the standard 30 s padding).

    padding=True pads/trims to Whisper's fixed 30 s window (what the
    pretrained checkpoints expect — frames//2 must equal
    max_source_positions); padding=False keeps the natural length for
    from-scratch models.
    """
    audio = np.asarray(audio, np.float64).reshape(-1)
    if padding:
        n = CHUNK_LENGTH * sample_rate
        audio = (np.pad(audio, (0, n - len(audio)))
                 if len(audio) < n else audio[:n])
    window = np.hanning(N_FFT + 1)[:-1]                # periodic hann
    n_frames = 1 + len(audio) // HOP_LENGTH
    pad = N_FFT // 2
    padded = np.pad(audio, (pad, pad), mode="reflect")
    # strided frame matrix → one batched real FFT (vectorized host path)
    idx = (np.arange(n_frames)[:, None] * HOP_LENGTH
           + np.arange(N_FFT)[None, :])
    frames = padded[idx] * window[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2    # (frames, n_freqs)
    spec = spec[:-1]                                   # drop the tail frame
    mel = spec @ mel_filter_bank(n_mels=n_mels, sample_rate=sample_rate,
                                 fmax=sample_rate / 2.0 if sample_rate
                                 != SAMPLE_RATE else 8000.0)
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).T.astype(np.float32)


def batch_features(waveforms, n_mels: int = 80) -> np.ndarray:
    """List of waveforms → (B, n_mels, 3000) padded feature block (the
    WhisperFeatureExtractor batch contract)."""
    return np.stack([log_mel_spectrogram(w, n_mels=n_mels)
                     for w in waveforms])
