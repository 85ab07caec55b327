"""Data preparation tools.

Equivalents of the reference's tools/: make_raw_list.py (jsonl lists),
make_shard_list.py (tar shards, process pool, resample+PCM16 transcode),
make_lmdb.py (-> packed audio store), wav2dur.py, and
generate_calibration_trial.py.
"""

import argparse
import io
import json
import multiprocessing
import os
import tarfile
import wave as wave_mod
from typing import Dict, List, Tuple

import numpy as np

from wespeaker_tpu.data.store import build_packed_store
from wespeaker_tpu.data.wav_io import read_wav


def read_scp(path: str) -> List[Tuple[str, str]]:
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                out.append((parts[0], parts[1]))
    return out


def read_utt2spk(path: str) -> Dict[str, str]:
    return dict(read_scp(path))


def make_raw_list(wav_scp, utt2spk, out_list, vad_file=None):
    """wav.scp + utt2spk (+ optional vad segments) -> jsonl raw list
    (tools/make_raw_list.py)."""
    u2s = read_utt2spk(utt2spk)
    vad = {}
    if vad_file:
        with open(vad_file) as f:
            for line in f:
                parts = line.split()
                # format: subseg_id utt begin end (tools convention)
                utt, b, e = parts[-3], float(parts[-2]), float(parts[-1])
                vad.setdefault(utt, []).append([b, e])
    n = 0
    with open(out_list, "w") as fout:
        for key, path in read_scp(wav_scp):
            if key not in u2s:
                continue
            obj = {"key": key, "wav": path, "spk": u2s[key]}
            if key in vad:
                obj["vad"] = vad[key]
            fout.write(json.dumps(obj) + "\n")
            n += 1
    return n


def _write_one_shard(args):
    shard_path, items, resample_rate = args
    from scipy.signal import resample_poly

    with tarfile.open(shard_path, "w") as tf:
        for key, spk, path in items:
            try:
                wav, sr = read_wav(path)
            except Exception:
                continue
            if wav.ndim > 1:
                wav = wav[0]
            if resample_rate and sr != resample_rate:
                g = int(np.gcd(sr, resample_rate))
                wav = resample_poly(wav, resample_rate // g, sr // g)
                sr = resample_rate
            pcm = (np.clip(wav, -1, 1) * 32767.0).round().astype(np.int16)
            buf = io.BytesIO()
            with wave_mod.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes(pcm.tobytes())
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{key}.wav")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            spk_bytes = spk.encode()
            info = tarfile.TarInfo(f"{key}.spk")
            info.size = len(spk_bytes)
            tf.addfile(info, io.BytesIO(spk_bytes))
    return shard_path


def make_shard_list(wav_scp, utt2spk, shards_dir, shards_list,
                    num_utts_per_shard=1000, num_threads=4,
                    resample_rate=16000, shuffle=True, seed=42):
    """wav.scp + utt2spk -> tar shards + shard list
    (tools/make_shard_list.py: pool of writers, PCM16 transcode)."""
    u2s = read_utt2spk(utt2spk)
    items = [(k, u2s[k], p) for k, p in read_scp(wav_scp) if k in u2s]
    if shuffle:
        np.random.default_rng(seed).shuffle(items)
    os.makedirs(shards_dir, exist_ok=True)
    tasks = []
    for i in range(0, len(items), num_utts_per_shard):
        shard_path = os.path.join(shards_dir,
                                  f"shards_{i // num_utts_per_shard:09d}.tar")
        tasks.append((shard_path, items[i:i + num_utts_per_shard],
                      resample_rate))
    if num_threads > 1 and len(tasks) > 1:
        with multiprocessing.Pool(num_threads) as pool:
            paths = pool.map(_write_one_shard, tasks)
    else:
        paths = [_write_one_shard(t) for t in tasks]
    with open(shards_list, "w") as f:
        for p in paths:
            f.write(p + "\n")
    return paths


def make_aug_store(wav_scp, out_prefix, sample_rate=16000,
                   max_duration_s=None):
    """MUSAN/RIR wav.scp -> packed random-access store (replaces
    tools/make_lmdb.py)."""
    return build_packed_store(read_scp(wav_scp), out_prefix, sample_rate,
                              max_duration_s)


def wav2dur(wav_scp, out_path):
    """Durations in seconds per utt (tools/wav2dur.py)."""
    total = 0.0
    with open(out_path, "w") as fout:
        for key, path in read_scp(wav_scp):
            wav, sr = read_wav(path)
            n = wav.shape[-1]
            dur = n / sr
            total += dur
            fout.write(f"{key} {dur:.3f}\n")
    return total


def vector_mean(spk2utt, xvector_scp, out_prefix):
    """Per-speaker mean of utterance embeddings (tools/vector_mean.py:25-53);
    used for CNCeleb multi-utterance enrollment (CNC-Eval-Avg)."""
    from wespeaker_tpu.utils.kaldi_io import (read_vec_scp_dict,
                                              write_vec_ark_scp)
    utt2emb = read_vec_scp_dict(xvector_scp)

    def items():
        with open(spk2utt) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                spk, utts = parts[0], parts[1:]
                vecs = [utt2emb[u] for u in utts if u in utt2emb]
                if vecs:
                    yield spk, np.mean(vecs, axis=0)

    return write_vec_ark_scp(out_prefix, items())


def generate_calibration_trial(utt2spk, out_trials, num_target=1000,
                               num_nontarget=1000, seed=0):
    """Same/different-speaker calibration trials
    (tools/generate_calibration_trial.py)."""
    rng = np.random.default_rng(seed)
    u2s = read_utt2spk(utt2spk)
    spk2utts: Dict[str, List[str]] = {}
    for u, s in u2s.items():
        spk2utts.setdefault(s, []).append(u)
    utts = list(u2s)
    spks = [s for s, us in spk2utts.items() if len(us) >= 2]
    with open(out_trials, "w") as f:
        for _ in range(num_target):
            s = spks[rng.integers(0, len(spks))]
            a, b = rng.choice(spk2utts[s], 2, replace=False)
            f.write(f"{a} {b} target\n")
        for _ in range(num_nontarget):
            while True:
                a, b = rng.choice(utts, 2, replace=False)
                if u2s[a] != u2s[b]:
                    break
            f.write(f"{a} {b} nontarget\n")
    return out_trials


def make_feat_list(feat_scp, utt2spk, out_list):
    """feats.scp + utt2spk -> validated feat list (tools/make_feat_list.py
    equivalent; our data_type='feat' consumes scp lines directly, so this
    just checks every key has a speaker and filters to the intersection)."""
    u2s = read_utt2spk(utt2spk)
    with open(out_list, "w") as fout:
        for key, path in read_scp(feat_scp):
            if key not in u2s:
                raise KeyError(f"{key} missing from utt2spk")
            fout.write(f"{key} {path}\n")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("raw")
    r.add_argument("--wav_scp", required=True)
    r.add_argument("--utt2spk", required=True)
    r.add_argument("--out_list", required=True)
    r.add_argument("--vad_file", default=None)
    s = sub.add_parser("shard")
    s.add_argument("--wav_scp", required=True)
    s.add_argument("--utt2spk", required=True)
    s.add_argument("--shards_dir", required=True)
    s.add_argument("--shards_list", required=True)
    s.add_argument("--num_utts_per_shard", type=int, default=1000)
    s.add_argument("--num_threads", type=int, default=4)
    a = sub.add_parser("aug_store")
    a.add_argument("--wav_scp", required=True)
    a.add_argument("--out_prefix", required=True)
    a.add_argument("--max_duration_s", type=float, default=None)
    d = sub.add_parser("wav2dur")
    d.add_argument("--wav_scp", required=True)
    d.add_argument("--out", required=True)
    t = sub.add_parser("calibration_trial")
    t.add_argument("--utt2spk", required=True)
    t.add_argument("--out_trials", required=True)
    fl = sub.add_parser("feat")
    fl.add_argument("--feat_scp", required=True)
    fl.add_argument("--utt2spk", required=True)
    fl.add_argument("--out_list", required=True)
    v = sub.add_parser("vector_mean")
    v.add_argument("--spk2utt", required=True)
    v.add_argument("--xvector_scp", required=True)
    v.add_argument("--out_prefix", required=True)
    args = ap.parse_args()
    if args.cmd == "raw":
        make_raw_list(args.wav_scp, args.utt2spk, args.out_list,
                      args.vad_file)
    elif args.cmd == "shard":
        make_shard_list(args.wav_scp, args.utt2spk, args.shards_dir,
                        args.shards_list, args.num_utts_per_shard,
                        args.num_threads)
    elif args.cmd == "aug_store":
        make_aug_store(args.wav_scp, args.out_prefix,
                       max_duration_s=args.max_duration_s)
    elif args.cmd == "wav2dur":
        wav2dur(args.wav_scp, args.out)
    elif args.cmd == "feat":
        make_feat_list(args.feat_scp, args.utt2spk, args.out_list)
    elif args.cmd == "vector_mean":
        vector_mean(args.spk2utt, args.xvector_scp, args.out_prefix)
    else:
        generate_calibration_trial(args.utt2spk, args.out_trials)


if __name__ == "__main__":
    main()
