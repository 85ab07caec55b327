"""Offline diarization pipeline: SAD -> segment fbank -> sliding-window
embeddings -> clustering -> RTTM.

Behavioral spec: the voxconverse recipe stages (examples/voxconverse/v2/
run.sh:34-150) and the CLI one-shot path (wespeaker/cli/speaker.py:213-289).
Silero VAD is unavailable offline; `energy_vad` provides a simple system-SAD
fallback, and oracle SAD comes from rttm.oracle_sad.

TPU-native: all subsegments of a recording are embedded as one padded batch
through the jitted model instead of the reference's ONNX batch loop.
"""

from typing import Callable, List, Optional, Tuple

import numpy as np

from wespeaker_tpu.diar import rttm as rttm_mod
from wespeaker_tpu.diar import spectral_clusterer, umap_clusterer
from wespeaker_tpu.diar.subsegment import segment_id, subsegment
from wespeaker_tpu.frontend import FbankConfig, compute_fbank


def energy_vad(wav: np.ndarray, sr: int = 16000, frame_ms: int = 30,
               threshold_db: float = -40.0, min_speech_s: float = 0.25,
               min_gap_s: float = 0.3) -> List[Tuple[float, float]]:
    """Simple energy VAD: frames above `threshold_db` relative to peak are
    speech; segments are merged over short gaps and length-filtered."""
    hop = int(sr * frame_ms / 1000)
    n = len(wav) // hop
    if n == 0:
        return []
    frames = wav[:n * hop].reshape(n, hop)
    energy_db = 10 * np.log10(np.mean(frames ** 2, axis=1) + 1e-12)
    peak = np.max(energy_db)
    speech = energy_db > peak + threshold_db
    segs = []
    start = None
    for i, s in enumerate(speech):
        if s and start is None:
            start = i
        elif not s and start is not None:
            segs.append((start * hop / sr, i * hop / sr))
            start = None
    if start is not None:
        segs.append((start * hop / sr, n * hop / sr))
    merged = []
    for b, e in segs:
        if merged and b - merged[-1][1] < min_gap_s:
            merged[-1] = (merged[-1][0], e)
        else:
            merged.append((b, e))
    return [(b, e) for b, e in merged if e - b >= min_speech_s]


def diarize_wav(utt: str, wav: np.ndarray, sr: int, embed_batch_fn: Callable,
                sad_segments: Optional[List[Tuple[float, float]]] = None,
                fbank_cfg: FbankConfig = FbankConfig(),
                window_fs: int = 150, period_fs: int = 75,
                clusterer: str = "spectral", num_spks: Optional[int] = None,
                batch_size: int = 64, subseg_cmn: bool = True):
    """embed_batch_fn: (B, window_fs, F) fbank -> (B, D) embeddings.
    Returns (merged segments [(utt, begin, end, label)], subseg labels).
    subseg_cmn=True (the reference default, diar/make_fbank.py:74-88 +
    cli/speaker.py:108-112) mean-normalizes each sliding window; False
    normalizes once per SAD segment."""
    import jax.numpy as jnp

    if sad_segments is None:
        sad_segments = energy_vad(wav, sr)
    if not sad_segments:
        return [], {}

    frame_shift = int(fbank_cfg.frame_shift_ms)
    all_subsegs, all_banks = [], []
    for (b, e) in sad_segments:
        seg_wav = wav[int(b * sr):int(e * sr)]
        if len(seg_wav) < fbank_cfg.window_size:
            continue
        # pad to a power-of-2 seconds ladder so XLA compiles a bounded set
        # of fbank shapes (~log2(max_len) total, ever) — real recordings
        # have ~all-distinct segment lengths and each distinct shape is a
        # fresh compile; frames below num_frames(n) never read padded
        # samples, so the trim is exact
        n = len(seg_wav)
        padded_n = sr
        while padded_n < n:
            padded_n *= 2
        if padded_n != n:
            pw = np.zeros(padded_n, seg_wav.dtype)
            pw[:n] = seg_wav
            seg_wav = pw
        fbank = np.asarray(compute_fbank(
            jnp.asarray(seg_wav[None] * (1 << 15)),
            fbank_cfg))[0][:fbank_cfg.num_frames(n)]
        if not subseg_cmn:
            fbank = fbank - fbank.mean(axis=0)  # per-SAD-segment CMN
        sid = segment_id(utt, b, e)
        subsegs, banks = subsegment(fbank, sid, window_fs, period_fs,
                                    frame_shift)
        all_subsegs.extend(subsegs)
        all_banks.append(banks)
    if not all_subsegs:
        return [], {}

    banks = np.concatenate(all_banks)
    if subseg_cmn:
        banks = banks - banks.mean(axis=1, keepdims=True)
    embs = []
    for i in range(0, len(banks), batch_size):
        chunk = banks[i:i + batch_size]
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:],
                                                    chunk.dtype)])
        out = np.asarray(embed_batch_fn(chunk))
        embs.append(out[:len(banks[i:i + batch_size])])
    embeddings = np.concatenate(embs)

    if clusterer == "umap":
        labels = umap_clusterer.cluster(embeddings)
    else:
        labels = spectral_clusterer.cluster(embeddings, num_spks=num_spks)

    utt_to_subseg_labels = {
        utt: [rttm_label for rttm_label in _subseg_tuples(
            all_subsegs, labels, frame_shift)]
    }
    merged = rttm_mod.merge_segments(utt_to_subseg_labels)
    return merged, dict(zip(all_subsegs, labels))


def _subseg_tuples(subsegs, labels, frame_shift):
    for subseg, label in zip(subsegs, labels):
        utt, begin_ms, end_ms, bf, ef = subseg.rsplit("-", 4)
        begin = (int(begin_ms) + int(bf) * frame_shift) / 1000.0
        end = (int(begin_ms) + int(ef) * frame_shift) / 1000.0
        yield (begin, end, str(label))
