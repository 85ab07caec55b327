"""Offline diarization CLI: wav.scp (+ oracle SAD rttm) -> RTTM (+ DER).

The staged voxconverse recipe (examples/voxconverse/v2/run.sh stages 2-8)
collapsed into one device-batched pass per recording: SAD -> per-segment
fbank -> sliding-window embeddings -> clustering -> merged RTTM -> optional
DER against a reference RTTM.
"""

import argparse

import numpy as np

from wespeaker_tpu.bin.extract import load_model_for_eval
from wespeaker_tpu.data.wav_io import read_wav
from wespeaker_tpu.diar import rttm as rttm_mod
from wespeaker_tpu.diar.pipeline import diarize_wav
from wespeaker_tpu.frontend import FbankConfig
from wespeaker_tpu.utils.config import parse_config_or_kwargs


def diarize(config, checkpoint_path, wav_scp, out_rttm, sad_rttm=None,
            clusterer="spectral", num_spks=None, ref_rttm=None,
            batch_size=64, overrides=None, **kwargs):
    import jax
    import jax.numpy as jnp

    configs = parse_config_or_kwargs(config, overrides, **kwargs)
    built, variables = load_model_for_eval(configs, checkpoint_path)
    model = built.model
    feat_dim = configs["model_args"].get("feat_dim", 80)
    dataset_args = configs.get("dataset_args", {})
    fbank_args = dataset_args.get("fbank_args", {})
    rate = dataset_args.get("resample_rate", 16000)
    fbank_cfg = FbankConfig(
        num_mel_bins=fbank_args.get("num_mel_bins", feat_dim),
        frame_length_ms=fbank_args.get("frame_length", 25),
        frame_shift_ms=fbank_args.get("frame_shift", 10),
        sample_rate=rate, dither=0.0)
    fwd = jax.jit(lambda feats: model.apply(variables, feats, train=False))

    def embed_batch(banks):
        return np.asarray(fwd(jnp.asarray(banks)))

    oracle = rttm_mod.oracle_sad(sad_rttm) if sad_rttm else {}
    hyp = {}
    with open(out_rttm, "w") as fout:
        with open(wav_scp) as f:
            for line in f:
                utt, path = line.split()
                wav, sr = read_wav(path)
                if wav.ndim > 1:
                    wav = wav[0]
                if sr != rate:
                    from wespeaker_tpu.data.pipeline import resample_array
                    wav, sr = resample_array(wav, sr, rate), rate
                merged, _ = diarize_wav(
                    utt, wav, sr, embed_batch,
                    sad_segments=oracle.get(utt),
                    fbank_cfg=fbank_cfg, clusterer=clusterer,
                    num_spks=num_spks, batch_size=batch_size)
                rttm_mod.write_rttm(merged, fout)
                hyp[utt] = [(b, e, lab) for (_, b, e, lab) in merged]
    if ref_rttm:
        ref = rttm_mod.read_rttm(ref_rttm)
        der = rttm_mod.compute_der(ref, hyp)
        print(f"DER = {der * 100:.2f} %")
        return out_rttm, der
    return out_rttm, None


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--wav_scp", required=True)
    ap.add_argument("--out_rttm", required=True)
    ap.add_argument("--sad_rttm", default=None,
                    help="oracle SAD source rttm; energy VAD if omitted")
    ap.add_argument("--clusterer", default="spectral",
                    choices=["spectral", "umap"])
    ap.add_argument("--num_spks", type=int, default=None)
    ap.add_argument("--ref_rttm", default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    diarize(args.config, args.checkpoint, args.wav_scp, args.out_rttm,
            args.sad_rttm, args.clusterer, args.num_spks, args.ref_rttm,
            overrides=args.overrides)


if __name__ == "__main__":
    main()
