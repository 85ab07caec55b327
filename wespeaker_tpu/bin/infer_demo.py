"""Single-wav inference demo against an exported StableHLO artifact
(wespeaker/bin/infer_onnx.py equivalent)."""

import argparse

import jax.numpy as jnp
import numpy as np

from wespeaker_tpu.bin.export_model import load_exported
from wespeaker_tpu.data.wav_io import read_wav
from wespeaker_tpu.frontend import FbankConfig, compute_fbank


def infer(model_path, wav_path, feat_dim=80):
    fn = load_exported(model_path)
    wav, sr = read_wav(wav_path)
    if wav.ndim > 1:
        wav = wav[0]
    feats = np.asarray(compute_fbank(
        jnp.asarray(wav[None] * (1 << 15)),
        FbankConfig(num_mel_bins=feat_dim, sample_rate=sr)))
    feats = feats - feats.mean(axis=1, keepdims=True)
    emb = np.asarray(fn(jnp.asarray(feats)))[0]
    return emb


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--wav_path", required=True)
    ap.add_argument("--feat_dim", type=int, default=80)
    args = ap.parse_args()
    emb = infer(args.model_path, args.wav_path, args.feat_dim)
    print(" ".join(f"{v:.6f}" for v in emb))


if __name__ == "__main__":
    main()
