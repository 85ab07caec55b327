"""Product API: one-stop Speaker object + `wespeaker-tpu` console entry.

Behavioral spec: wespeaker/cli/speaker.py:39-301 — load_model() /
Speaker.{extract_embedding, extract_embedding_list, compute_similarity,
register, recognize, diarize, diarize_list} with kaldi-style outputs.

A model dir contains config.yaml + a .ckpt checkpoint (avg_model.ckpt by
convention); torch .pt checkpoints from the reference ecosystem load through
the structural converter.
"""

import argparse
import os
from typing import Dict, List, Tuple

import numpy as np

from wespeaker_tpu.data.wav_io import read_wav
from wespeaker_tpu.diar.pipeline import diarize_wav, energy_vad
from wespeaker_tpu.diar.rttm import RTTM_LINE
from wespeaker_tpu.frontend import FbankConfig, compute_fbank
from wespeaker_tpu.models import get_speaker_model
from wespeaker_tpu.utils import checkpoint as ckpt_utils
from wespeaker_tpu.utils.config import load_yaml


class Speaker:
    def __init__(self, model_dir: str):
        import jax
        import jax.numpy as jnp

        self._jax = jax
        self._jnp = jnp
        configs = load_yaml(os.path.join(model_dir, "config.yaml"))
        self.configs = configs
        self.model = get_speaker_model(configs["model"])(**configs["model_args"])
        feat_dim = configs["model_args"].get("feat_dim", 80)
        variables = self.model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 32, feat_dim)), train=False)
        ckpt_path = None
        for cand in ("avg_model.ckpt", "final_model.ckpt", "model.ckpt"):
            p = os.path.join(model_dir, cand)
            if os.path.exists(p):
                ckpt_path = p
                break
        if ckpt_path is not None:
            loaded = ckpt_utils.load_checkpoint(ckpt_path, {
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})})
            self.variables = {"params": loaded["params"],
                              "batch_stats": loaded.get("batch_stats", {})}
        else:
            pts = [f for f in os.listdir(model_dir) if f.endswith(".pt")]
            if not pts:
                raise FileNotFoundError(f"no checkpoint in {model_dir}")
            from wespeaker_tpu.utils.torch_compat import (
                load_torch_checkpoint, rules_for, torch_to_flax_variables)
            sd = load_torch_checkpoint(os.path.join(model_dir, pts[0]))
            self.variables = dict(torch_to_flax_variables(
                sd, variables, rules=rules_for(configs["model"]),
                strict=False))

        # keep weights on device: checkpoint restore yields numpy, and jit
        # would otherwise re-transfer the tree on every call
        self.variables = jax.device_put(self.variables)
        self.resample_rate = 16000
        self.apply_vad = False
        self.wavform_norm = False
        self.window_type = configs.get("window_type", "hamming")
        self.feat_dim = feat_dim
        self.table: Dict[str, np.ndarray] = {}
        self.diar_num_spks = None
        self.diar_min_num_spks = 1
        self.diar_max_num_spks = 20
        self.diar_min_duration = 0.255
        self.diar_window_secs = 1.5
        self.diar_period_secs = 0.75
        self.diar_frame_shift = 10
        self.diar_batch_size = 32
        self.diar_subseg_cmn = True

        self._embed_jit = jax.jit(self._embed)

    # ---- configuration (mirrors the reference setters) ----
    def set_wavform_norm(self, v: bool):
        self.wavform_norm = v

    def set_resample_rate(self, r: int):
        self.resample_rate = r

    def set_vad(self, v: bool):
        self.apply_vad = v

    def set_window_type(self, w: str):
        self.window_type = w
        self._embed_jit = self._jax.jit(self._embed)

    def set_diarization_params(self, num_spks=None, min_num_spks=1,
                               max_num_spks=20, min_duration: float = 0.255,
                               window_secs: float = 1.5,
                               period_secs: float = 0.75,
                               frame_shift: int = 10, batch_size: int = 32,
                               subseg_cmn: bool = True):
        """Superset of the reference cli/speaker.py:82-96 knobs."""
        self.diar_num_spks = num_spks
        self.diar_min_num_spks = min_num_spks
        self.diar_max_num_spks = max_num_spks
        self.diar_min_duration = min_duration
        self.diar_window_secs = window_secs
        self.diar_period_secs = period_secs
        self.diar_frame_shift = frame_shift
        self.diar_batch_size = batch_size
        self.diar_subseg_cmn = subseg_cmn

    # ---- core ----
    def _fbank_cfg(self):
        return FbankConfig(num_mel_bins=self.feat_dim,
                           window_type=self.window_type, dither=0.0,
                           sample_rate=self.resample_rate)

    def _embed(self, feats):
        emb = self.model.apply(self.variables, feats, train=False)
        return emb

    def compute_features(self, wavform, sample_rate=16000, cmn=True):
        jnp = self._jnp
        wav = np.asarray(wavform, np.float32)
        if not self.wavform_norm:
            wav = wav * (1 << 15)
        if sample_rate != self.resample_rate:
            from scipy.signal import resample_poly
            g = int(np.gcd(sample_rate, self.resample_rate))
            wav = resample_poly(wav, self.resample_rate // g,
                                sample_rate // g).astype(np.float32)
        feats = np.asarray(compute_fbank(jnp.asarray(wav[None]),
                                         self._fbank_cfg()))[0]
        if cmn:
            feats = feats - feats.mean(axis=0)
        return feats

    def extract_embedding_from_pcm(self, pcm: np.ndarray, sample_rate: int):
        wav = np.asarray(pcm, np.float32)
        if wav.ndim > 1:
            wav = wav[0]
        if self.apply_vad:
            segs = energy_vad(wav, sample_rate)
            if segs:
                wav = np.concatenate([
                    wav[int(b * sample_rate):int(e * sample_rate)]
                    for b, e in segs])
        feats = self.compute_features(wav, sample_rate)
        emb = np.asarray(self._embed_jit(self._jnp.asarray(feats[None])))[0]
        return emb

    def extract_embedding(self, audio_path: str) -> np.ndarray:
        wav, sr = read_wav(audio_path)
        if wav.ndim > 1:
            wav = wav[0]
        return self.extract_embedding_from_pcm(wav, sr)

    def extract_embedding_list(self, scp_path: str
                               ) -> Tuple[List[str], List[np.ndarray]]:
        names, embeddings = [], []
        with open(scp_path) as f:
            for line in f:
                name, path = line.split()
                names.append(name)
                embeddings.append(self.extract_embedding(path))
        return names, embeddings

    def cosine_similarity(self, e1, e2) -> float:
        s = np.dot(e1, e2) / (np.linalg.norm(e1) * np.linalg.norm(e2))
        return float((s + 1.0) / 2.0)  # [0, 1] like the reference

    def compute_similarity(self, audio_path1: str, audio_path2: str) -> float:
        return self.cosine_similarity(self.extract_embedding(audio_path1),
                                      self.extract_embedding(audio_path2))

    def extract_embedding_from_feats(self, fbanks, batch_size: int = None,
                                     subseg_cmn: bool = None):
        """Batched embeddings from precomputed fbank windows
        (cli/speaker.py:108-123): optional per-window CMN, fixed-size
        padded batches through the jitted forward."""
        jnp = self._jnp
        batch_size = batch_size or self.diar_batch_size
        if subseg_cmn is None:
            subseg_cmn = self.diar_subseg_cmn
        arr = np.stack([np.asarray(f, np.float32) for f in fbanks])
        if subseg_cmn:
            arr = arr - arr.mean(axis=1, keepdims=True)
        out = []
        for i in range(0, len(arr), batch_size):
            chunk = arr[i:i + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            out.append(np.asarray(
                self._embed_jit(jnp.asarray(chunk)))[:len(arr[i:i + batch_size])])
        return np.vstack(out)

    def register(self, name: str, audio_path: str):
        if name in self.table:
            raise ValueError(f"speaker {name} already registered")
        self.table[name] = self.extract_embedding(audio_path)

    def recognize(self, audio_path: str):
        emb = self.extract_embedding(audio_path)
        best_name, best_score = "", 0.0
        for name, e in self.table.items():
            score = self.cosine_similarity(emb, e)
            if score > best_score:
                best_name, best_score = name, score
        return {"name": best_name, "confidence": best_score}

    def diarize(self, audio_path: str, utt: str = "unk"):
        wav, sr = read_wav(audio_path)
        if wav.ndim > 1:
            wav = wav[0]
        if sr != self.resample_rate:
            from scipy.signal import resample_poly
            g = int(np.gcd(sr, self.resample_rate))
            wav = resample_poly(wav, self.resample_rate // g, sr // g)
            sr = self.resample_rate

        def embed_batch(banks):
            return np.asarray(self._embed_jit(self._jnp.asarray(banks)))

        import dataclasses
        fs = self.diar_frame_shift
        sad = [(b, e) for b, e in energy_vad(wav, sr)
               if e - b >= self.diar_min_duration]
        merged, _ = diarize_wav(
            utt, wav, sr, embed_batch, sad_segments=sad,
            fbank_cfg=dataclasses.replace(self._fbank_cfg(),
                                          frame_shift_ms=fs),
            window_fs=int(self.diar_window_secs * 1000 / fs),
            period_fs=int(self.diar_period_secs * 1000 / fs),
            clusterer="umap", num_spks=self.diar_num_spks,
            batch_size=self.diar_batch_size,
            subseg_cmn=self.diar_subseg_cmn)
        return merged

    def diarize_list(self, scp_path: str):
        out = []
        with open(scp_path) as f:
            for line in f:
                utt, path = line.split()
                out.append((utt, self.diarize(path, utt)))
        return out

    def make_rttm(self, merged_segment_to_labels, outfile):
        with open(outfile, "w") as f:
            for (utt, begin, end, label) in merged_segment_to_labels:
                f.write(RTTM_LINE.format(utt, 1, begin, end - begin, label)
                        + "\n")


def load_model_local(model_dir: str) -> Speaker:
    return Speaker(model_dir)


def load_model(model_name_or_path: str) -> Speaker:
    """A local model dir, or a hub name ('chinese', 'english', 'campplus',
    ... — cli/hub.py ASSETS) downloaded+cached on first use (needs network
    once; offline the URLError propagates with the failing URL)."""
    if os.path.isdir(model_name_or_path):
        return Speaker(model_name_or_path)
    from wespeaker_tpu.cli.hub import ASSETS, Hub
    if model_name_or_path in ASSETS:
        return Speaker(Hub.get_model(model_name_or_path))
    raise ValueError(
        f"'{model_name_or_path}' is neither a model directory nor a hub "
        f"model name (options: {sorted(ASSETS)})")


def main():
    parser = argparse.ArgumentParser(description="wespeaker-tpu CLI")
    parser.add_argument("-t", "--task", default="embedding",
                        choices=["embedding", "embedding_kaldi", "similarity",
                                 "diarization", "diarization_list"])
    parser.add_argument("-p", "--pretrain", default=None,
                        help="model directory (or omit and use --language "
                             "to download a published model)")
    parser.add_argument("-l", "--language", default="chinese",
                        choices=["chinese", "english"],
                        help="hub model when --pretrain is omitted "
                             "(needs network once)")
    parser.add_argument("--audio_file", default=None)
    parser.add_argument("--audio_file2", default=None)
    parser.add_argument("--wav_scp", default=None)
    parser.add_argument("--resample_rate", type=int, default=16000)
    parser.add_argument("--vad", action="store_true")
    parser.add_argument("--output_file", default=None)
    # diarization knobs (reference cli/utils.py:95-121 defaults)
    parser.add_argument("--diar_num_spks", type=int, default=None)
    parser.add_argument("--diar_min_duration", type=float, default=0.255)
    parser.add_argument("--diar_window_secs", type=float, default=1.5)
    parser.add_argument("--diar_period_secs", type=float, default=0.75)
    parser.add_argument("--diar_frame_shift", type=int, default=10)
    parser.add_argument("--diar_emb_bs", type=int, default=32)
    parser.add_argument("--diar_subseg_cmn", default=True,
                        type=lambda x: str(x).lower() == "true")
    args = parser.parse_args()

    model = load_model(args.pretrain or args.language)
    model.set_resample_rate(args.resample_rate)
    model.set_vad(args.vad)
    model.set_diarization_params(num_spks=args.diar_num_spks,
                                 min_duration=args.diar_min_duration,
                                 window_secs=args.diar_window_secs,
                                 period_secs=args.diar_period_secs,
                                 frame_shift=args.diar_frame_shift,
                                 batch_size=args.diar_emb_bs,
                                 subseg_cmn=args.diar_subseg_cmn)

    if args.task == "embedding":
        emb = model.extract_embedding(args.audio_file)
        out = args.output_file or "embedding.txt"
        np.savetxt(out, emb)
        print(f"embedding -> {out}")
    elif args.task == "embedding_kaldi":
        from wespeaker_tpu.utils.kaldi_io import write_vec_ark_scp
        names, embs = model.extract_embedding_list(args.wav_scp)
        prefix = args.output_file or "embedding"
        write_vec_ark_scp(prefix, zip(names, embs))
        print(f"embeddings -> {prefix}.ark/.scp")
    elif args.task == "similarity":
        print(model.compute_similarity(args.audio_file, args.audio_file2))
    elif args.task == "diarization":
        merged = model.diarize(args.audio_file)
        if args.output_file:
            model.make_rttm(merged, args.output_file)
        else:
            for (utt, b, e, lab) in merged:
                print(f"{utt} {b:.3f} {e:.3f} {lab}")
    elif args.task == "diarization_list":
        results = model.diarize_list(args.wav_scp)
        merged = [seg for _, segs in results for seg in segs]
        if args.output_file:
            model.make_rttm(merged, args.output_file)
        else:
            for (utt, b, e, lab) in merged:
                print(f"{utt} {b:.3f} {e:.3f} {lab}")


if __name__ == "__main__":
    main()
