"""TF-style conv-DFT mel frontend (jnp), used by the ReDimNet2 recipes.

Behavioral spec: wespeaker/frontend/tfmel.py (get_filterbanks:31 — HTK mel
scale, PreEmphasis:61 with reflect pad, SpectralFeaturesTF:115 — windowed
cos/sin DFT as strided conv with padding=shift//2, power clip to
[eps, 1/eps], TFMelBanks:243 — +eps, log, per-bin time mean-norm,
FbankAug:76 train-time masks).

Everything is expressed as framing + two matmuls (MXU) followed by the mel
matmul; output layout is (B, T, n_mels).
"""

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hz2mel(hz):
    return 2595.0 * np.log10(1 + np.asarray(hz, np.float64) / 700.0)


def get_filterbanks(low_freq=20, high_freq=7600, nfilt=80, nfft=256,
                    samplerate=16000):
    """HTK-mel triangular filters over `nfft` spectrogram bins (the first
    row is zeros, matching tfmel.py:31-45)."""
    lowmel, highmel = hz2mel(low_freq), hz2mel(high_freq)
    pts = np.linspace(lowmel, highmel, nfilt + 2)
    lower = pts[:-2][None, :]
    center = pts[1:-1][None, :]
    upper = pts[2:][None, :]
    bins_mel = hz2mel(np.linspace(0, samplerate // 2, nfft))[1:][:, None]
    lo_slope = (bins_mel - lower) / (center - lower)
    up_slope = (upper - bins_mel) / (upper - center)
    weights = np.maximum(0.0, np.minimum(lo_slope, up_slope))
    return np.vstack([np.zeros((1, nfilt)), weights]).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class TFMelConfig:
    sample_rate: int = 16000
    n_fft: int = 512
    win_length: int = 400
    hop_length: int = 160
    f_min: float = 20.0
    f_max: float = 7600.0
    n_mels: int = 80
    window: str = "hamming"
    norm_signal: bool = False
    do_preemph: bool = True
    eps: float = 1e-8


def _window(cfg: TFMelConfig) -> np.ndarray:
    n = np.arange(cfg.win_length)
    if cfg.window == "hamming":
        from scipy.signal import windows
        return windows.hamming(cfg.win_length).astype(np.float32)
    if cfg.window in ("hann", "hanning"):
        return (0.5 - 0.5 * np.cos(2 * np.pi * n / (cfg.win_length - 1))
                ).astype(np.float32)
    return np.ones(cfg.win_length, np.float32)


@functools.lru_cache(maxsize=8)
def _kernels(cfg: TFMelConfig):
    nfft, length = cfg.n_fft, cfg.win_length
    grid = 2 * np.pi * np.outer(np.arange(length), np.arange(nfft // 2)) / nfft
    w = _window(cfg)[:, None]
    real = (np.cos(grid) * w).astype(np.float32)  # (L, nfft/2)
    imag = (np.sin(grid) * w).astype(np.float32)
    mel = get_filterbanks(cfg.f_min, cfg.f_max, cfg.n_mels, cfg.n_fft // 2,
                          cfg.sample_rate)  # (nfft/2, n_mels)
    return real, imag, mel


def preemphasis(x, coef=0.97):
    """Reflect-padded pre-emphasis (tfmel.py:61-72): y[0] = x[0]-c*x[1]."""
    prev = jnp.concatenate([x[..., 1:2], x[..., :-1]], axis=-1)
    return x - coef * prev


@functools.partial(jax.jit, static_argnames=("cfg", "train"))
def tfmel(wav, cfg: TFMelConfig = TFMelConfig(), *, train: bool = False,
          key=None, mask=None):
    """wav: (B, N) float -> (B, T, n_mels) log-mel with per-bin time CMN.
    T = floor((N + 2*(hop//2) - win) / hop) + 1 (conv padding=hop//2).

    mask: optional (B, T) frame-validity mask for padded bucket batches —
    signal norm and the time CMN then use masked statistics so padded eval
    approximates the reference's whole-utterance batch=1 path."""
    real_k, imag_k, mel_k = (jnp.asarray(a) for a in _kernels(cfg))
    x = wav.astype(jnp.float32)
    if cfg.norm_signal:
        if mask is None:
            mean = jnp.mean(x, axis=-1, keepdims=True)
            std = jnp.std(x, axis=-1, keepdims=True)
        else:
            n_valid = jnp.maximum(
                jnp.sum(mask, axis=-1, keepdims=True), 1.0) * cfg.hop_length
            n_valid = jnp.minimum(n_valid, x.shape[-1])
            smask = (jnp.arange(x.shape[-1])[None, :] < n_valid)
            mean = jnp.sum(x * smask, axis=-1, keepdims=True) / n_valid
            var = jnp.sum(((x - mean) * smask) ** 2, axis=-1,
                          keepdims=True) / n_valid
            std = jnp.sqrt(var)
        x = (x - mean) / (std + 1e-6)
    if cfg.do_preemph:
        x = preemphasis(x)
    pad = cfg.hop_length // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
    t = (x.shape[-1] - cfg.win_length) // cfg.hop_length + 1
    idx = (jnp.arange(t)[:, None] * cfg.hop_length
           + jnp.arange(cfg.win_length)[None, :])
    frames = x[..., idx]  # (B, T, L)
    real = frames @ real_k
    imag = frames @ imag_k
    power = jnp.clip(real ** 2 + imag ** 2, cfg.eps, 1.0 / cfg.eps)
    mel = jnp.clip(power @ mel_k, cfg.eps, 1.0 / cfg.eps)
    logmel = jnp.log(mel + cfg.eps)
    if mask is None:
        logmel = logmel - jnp.mean(logmel, axis=-2, keepdims=True)  # CMN
    else:
        m = mask[..., :logmel.shape[-2], None]
        denom = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
        cmn = jnp.sum(logmel * m, axis=-2, keepdims=True) / denom
        logmel = (logmel - cmn) * m  # zero padded frames for the convs
    if train and key is not None:
        logmel = fbank_aug(key, logmel)
    return logmel


def fbank_aug(key, feat, freq_mask_width: Tuple[int, int] = (0, 8),
              time_mask_width: Tuple[int, int] = (0, 10),
              freq_start_bin: int = 0):
    """Train-time time/freq masking (tfmel.py FbankAug:76-113); feat is
    (B, T, M)."""
    b, t, m = feat.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)

    def mask(axis_len, kl, kp, width_range, start_bin):
        length = jax.random.randint(kl, (b, 1), width_range[0],
                                    max(width_range[1], 1))
        pos = jax.random.randint(kp, (b, 1), start_bin,
                                 max(1, axis_len - width_range[1]))
        ar = jnp.arange(axis_len)[None, :]
        return (pos <= ar) & (ar < pos + length)  # (B, axis)

    tmask = mask(t, k1, k2, time_mask_width, 0)[:, :, None]
    fmask = mask(m, k3, k4, freq_mask_width, freq_start_bin)[:, None, :]
    return jnp.where(tmask | fmask, 0.0, feat)
