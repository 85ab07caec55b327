"""Independent numpy implementation of kaldi fbank used ONLY as a test oracle.

Written directly from the Kaldi feature-window/mel-computations spec
(cross-checked against runtime/core/frontend/fbank.h in the reference repo),
deliberately using different code structure (per-frame python loop, float64)
from the vectorized jnp implementation it validates.
"""

import math

import numpy as np


def hamming(m):
    return 0.54 - 0.46 * np.cos(2 * math.pi * np.arange(m) / (m - 1))


def povey(m):
    return (0.5 - 0.5 * np.cos(2 * math.pi * np.arange(m) / (m - 1))) ** 0.85


def mel(f):
    return 1127.0 * math.log(1.0 + f / 700.0)


def fbank_numpy(wav, sample_rate=16000, num_mel=80, frame_len_ms=25.0,
                frame_shift_ms=10.0, window="hamming", low_freq=20.0,
                high_freq=0.0, preemph=0.97, remove_dc=True):
    win = int(sample_rate * frame_len_ms / 1000)
    shift = int(sample_rate * frame_shift_ms / 1000)
    padded = 1
    while padded < win:
        padded *= 2
    nyq = sample_rate / 2.0
    hi = high_freq if high_freq > 0 else nyq + high_freq

    # mel filter centers
    mlo, mhi = mel(low_freq), mel(hi)
    delta = (mhi - mlo) / (num_mel + 1)
    nbins = padded // 2
    binw = sample_rate / padded
    filters = np.zeros((num_mel, nbins + 1))
    for j in range(num_mel):
        left, center, right = mlo + j * delta, mlo + (j + 1) * delta, mlo + (j + 2) * delta
        for i in range(nbins):
            m = mel(binw * i)
            if left < m < right:
                filters[j, i] = min((m - left) / (center - left),
                                    (right - m) / (right - center))

    wfunc = {"hamming": hamming, "povey": povey}[window](win)
    n_frames = 1 + (len(wav) - win) // shift if len(wav) >= win else 0
    out = np.zeros((n_frames, num_mel))
    for t in range(n_frames):
        frame = np.array(wav[t * shift:t * shift + win], dtype=np.float64)
        if remove_dc:
            frame = frame - frame.mean()
        if preemph:
            shifted = np.concatenate([[frame[0]], frame[:-1]])
            frame = frame - preemph * shifted
        frame = frame * wfunc
        spec = np.fft.rfft(frame, n=padded)
        power = np.abs(spec) ** 2
        melspec = filters @ power
        out[t] = np.log(np.maximum(melspec, 1.1920928955078125e-07))
    return out
