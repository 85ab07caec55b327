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
            batch_size=64, bf16=False, data_parallel=False,
            sad_model=None, sad_threshold=0.18,
            overrides=None, **kwargs):
    """bf16 casts weights+activations (~2x embedding throughput, cluster
    structure unchanged). data_parallel shards each subsegment batch over
    all local devices with replicated weights — long recordings produce
    thousands of subsegments, the TPU-native form of the reference's
    per-GPU file splits (tools/extract_embedding.sh:40-66)."""
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

    from wespeaker_tpu.utils.eval_device import prepare_eval_placement
    variables, compute_dtype, batch_sharding, batch_size = \
        prepare_eval_placement(variables, bf16, data_parallel, batch_size)

    fwd = jax.jit(lambda feats: model.apply(
        variables, feats.astype(compute_dtype),
        train=False).astype(jnp.float32))

    def embed_batch(banks):
        a = jnp.asarray(banks)
        if batch_sharding is not None:
            a = jax.device_put(a, batch_sharding)
        return np.asarray(fwd(a))

    oracle = rttm_mod.oracle_sad(sad_rttm) if sad_rttm else {}
    sad_prob_fn = None
    sad_window = int(rate * 0.032)  # silero chunk: 512 @ 16 kHz, 256 @ 8 kHz
    if sad_model:
        # load the torch.jit VAD once, not per recording
        from wespeaker_tpu.diar.vad import TorchJitVad
        sad_prob_fn = TorchJitVad(sad_model, sad_window).speech_probs
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
                sad = oracle.get(utt) if sad_rttm else None
                if sad is None and sad_prob_fn is not None:
                    # silero post-processing over a torch.jit prob model
                    # (make_system_sad.py:44-62, threshold 0.18)
                    from wespeaker_tpu.diar.vad import system_sad
                    sad = system_sad(wav, sr, prob_fn=sad_prob_fn,
                                     threshold=sad_threshold,
                                     window_samples=sad_window)
                merged, _ = diarize_wav(
                    utt, wav, sr, embed_batch,
                    sad_segments=sad,
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
    ap.add_argument("--sad_model", default=None,
                    help="silero-style torch.jit VAD model file for system "
                         "SAD (host CPU); energy VAD if omitted")
    ap.add_argument("--sad_threshold", type=float, default=0.18,
                    help="speech probability trigger (the reference "
                         "diarization recipe uses 0.18)")
    ap.add_argument("--clusterer", default="spectral",
                    choices=["spectral", "umap"])
    ap.add_argument("--num_spks", type=int, default=None)
    ap.add_argument("--ref_rttm", default=None)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 weights+activations (~2x embedding step)")
    ap.add_argument("--data_parallel", action="store_true",
                    help="shard subsegment batches over all local devices "
                         "in this one process (weights replicated)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    diarize(args.config, args.checkpoint, args.wav_scp, args.out_rttm,
            args.sad_rttm, args.clusterer, args.num_spks, args.ref_rttm,
            batch_size=args.batch_size, bf16=args.bf16,
            data_parallel=args.data_parallel, sad_model=args.sad_model,
            sad_threshold=args.sad_threshold, overrides=args.overrides)


if __name__ == "__main__":
    main()
