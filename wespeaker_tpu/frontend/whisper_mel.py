"""Whisper log-mel spectrogram on device.

Behavioral spec: the reference whisper frontend calls
``whisper.log_mel_spectrogram`` per utterance on unpadded audio
(wespeaker/frontend/whisper_encoder.py:307-317). That transform is:
hann-windowed STFT (n_fft 400, hop 160, center/reflect, last frame dropped)
-> power -> slaney-normalized mel filterbank -> log10 (floor 1e-10) ->
per-utterance dynamic-range clamp at max-8 -> (x+4)/4.

TPU-native: the window+DFT chain is folded into one strided conv (MXU), the
mel projection is one matmul, and the whole batch runs in a single fused
program (same design as fbank.py's fused path).
"""

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WhisperMelConfig:
    num_mel_bins: int = 80       # 128 for large-v3
    n_fft: int = 400
    hop_length: int = 160
    sample_rate: int = 16000


def _hz_to_mel_slaney(f):
    f = np.asarray(f, np.float64)
    mel = f / (200.0 / 3.0)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3.0)
    logstep = math.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz)
                    / logstep, mel)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    f = m * (200.0 / 3.0)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3.0)
    logstep = math.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


def make_whisper_mel_banks(cfg: WhisperMelConfig) -> np.ndarray:
    """librosa.filters.mel(sr, n_fft, n_mels, htk=False, norm='slaney'),
    shape (n_fft//2 + 1, num_mel_bins); float64 on host."""
    n_bins = cfg.n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, cfg.sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel_slaney(0.0),
                          _hz_to_mel_slaney(cfg.sample_rate / 2.0),
                          cfg.num_mel_bins + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)  # (M + 2,)
    lower = (fftfreqs[:, None] - hz_pts[None, :-2]) \
        / np.maximum(hz_pts[1:-1] - hz_pts[:-2], 1e-10)[None, :]
    upper = (hz_pts[None, 2:] - fftfreqs[:, None]) \
        / np.maximum(hz_pts[2:] - hz_pts[1:-1], 1e-10)[None, :]
    banks = np.maximum(0.0, np.minimum(lower, upper))
    banks *= (2.0 / (hz_pts[2:] - hz_pts[:-2]))[None, :]  # slaney area norm
    return banks


@functools.lru_cache(maxsize=4)
def _whisper_dft_kernel(cfg: WhisperMelConfig) -> np.ndarray:
    """hann window * real-DFT basis as one (n_fft, 2*(n_fft//2+1)) conv
    kernel (float64 on host, like fbank._fused_dft_kernel)."""
    n = np.arange(cfg.n_fft, dtype=np.float64)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / cfg.n_fft))  # periodic
    k = np.arange(cfg.n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n[:, None] * k / cfg.n_fft
    cos_b = np.cos(ang) * window[:, None]
    sin_b = -np.sin(ang) * window[:, None]
    return np.concatenate([cos_b, sin_b], axis=1).astype(np.float32)


def whisper_logmel(wav: jnp.ndarray,
                   cfg: WhisperMelConfig = WhisperMelConfig()) -> jnp.ndarray:
    """wav: (..., num_samples) float32 in [-1, 1] -> (..., T, num_mel_bins)
    with T = num_samples // hop_length. The max-8 clamp is per utterance
    (whisper audio.py semantics, matching the reference's per-utterance
    loop)."""
    kernel = jnp.asarray(_whisper_dft_kernel(cfg))
    banks = jnp.asarray(make_whisper_mel_banks(cfg).astype(np.float32))
    nbins = cfg.n_fft // 2 + 1
    squeeze = wav.ndim == 1
    x = wav.astype(jnp.float32)
    if squeeze:
        x = x[None]
    lead = x.shape[:-1]
    x = x.reshape((-1,) + x.shape[-1:])
    half = cfg.n_fft // 2
    x = jnp.pad(x, ((0, 0), (half, half)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        x[:, :, None], kernel[:, None, :],
        window_strides=(cfg.hop_length,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32)
    out = out[:, :-1]  # whisper drops the last (boundary) frame
    re, im = out[..., :nbins], out[..., nbins:]
    power = re * re + im * im
    mel = jnp.matmul(power, banks, preferred_element_type=jnp.float32)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    log_spec = log_spec.reshape(lead + log_spec.shape[1:])
    return log_spec[0] if squeeze else log_spec
