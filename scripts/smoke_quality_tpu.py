"""End-to-end quality smoke on real hardware: the full product surface
(train -> extract -> score -> metrics CLIs) on a synthetic multi-speaker
corpus must reach a low EER on held-out trials (measured: 5.0 % EER /
minDCF 0.217 over 60 speakers after 24 short epochs, ~13 min on one chip
mostly tunnel compiles; chance is 50 %).

Speakers are distinguishable the way real voices are — a fixed formant
envelope and fundamental — while utterances vary in f0, amplitude
modulation and noise, so a briefly-trained encoder must actually learn
speaker structure (tests/test_recipe_e2e.py only asserts the pipeline
runs; this asserts it LEARNS).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/smoke_quality_tpu.py [workdir]
Prints one JSON line: {"eer": %, "minDCF": ..., "train_wall_s": ...}.
"""

import json
import os
import subprocess
import sys
import time
import wave

import numpy as np

N_SPK = 60
N_TRAIN_UTT = 8
N_EVAL_UTT = 2
SECONDS = 3.0
SR = 16000


def synth_utterance(rng, formants, bandwidths, f0_base, tilt):
    """Harmonic source with a speaker-specific formant envelope."""
    t = np.arange(int(SECONDS * SR)) / SR
    f0 = f0_base * (1.0 + 0.04 * rng.standard_normal()
                    + 0.02 * np.sin(2 * np.pi * rng.uniform(1, 4) * t))
    phase = 2 * np.pi * np.cumsum(f0) / SR
    sig = np.zeros_like(t)
    for h in range(1, 40):
        freq = h * f0_base
        if freq > SR / 2 - 200:
            break
        # formant envelope: sum of resonances
        gain = sum(b ** 2 / ((freq - fm) ** 2 + b ** 2)
                   for fm, b in zip(formants, bandwidths))
        gain *= (freq / 500.0) ** tilt  # speaker-specific spectral tilt
        sig += gain * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
    # syllabic amplitude modulation + breath noise
    am = 0.55 + 0.45 * np.clip(np.sin(
        2 * np.pi * rng.uniform(2, 5) * t + rng.uniform(0, 6)), 0, None)
    sig = sig * am / (np.max(np.abs(sig)) + 1e-9)
    sig = 0.3 * sig + 0.005 * rng.standard_normal(len(t))
    return sig.astype(np.float32)


def write_pcm16(path, sig):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((np.clip(sig, -1, 1) * 32767).astype("<i2").tobytes())


def make_corpus(root):
    rng = np.random.default_rng(0)
    wav_dir = os.path.join(root, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    train_lines, eval_lines, u2s = [], [], []
    for s in range(N_SPK):
        formants = np.sort(rng.uniform([250, 800, 1800, 2800],
                                       [750, 1700, 2700, 3600]))
        bandwidths = rng.uniform(60, 140, 4)
        f0_base = rng.uniform(80, 260)
        tilt = rng.uniform(-0.8, 0.8)
        for u in range(N_TRAIN_UTT + N_EVAL_UTT):
            key = f"spk{s:03d}_utt{u}"
            path = os.path.join(wav_dir, key + ".wav")
            write_pcm16(path, synth_utterance(rng, formants, bandwidths,
                                              f0_base, tilt))
            line = json.dumps({"key": key, "wav": path, "spk": f"spk{s:03d}"})
            if u < N_TRAIN_UTT:
                train_lines.append(line)
                u2s.append(f"{key} spk{s:03d}")
            else:
                eval_lines.append(line)
    with open(os.path.join(root, "train.list"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(os.path.join(root, "eval.list"), "w") as f:
        f.write("\n".join(eval_lines) + "\n")
    with open(os.path.join(root, "utt2spk"), "w") as f:
        f.write("\n".join(u2s) + "\n")

    # trials: all same-speaker eval pairs + 10x random cross pairs
    rng2 = np.random.default_rng(1)
    keys = [json.loads(ln)["key"] for ln in eval_lines]
    spk_of = {k: k.split("_")[0] for k in keys}
    trials = []
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            if spk_of[a] == spk_of[b]:
                trials.append(f"{a} {b} target")
    n_non = 10 * len(trials)
    while n_non > 0:
        a, b = rng2.choice(keys, 2, replace=False)
        if spk_of[a] != spk_of[b]:
            trials.append(f"{a} {b} nontarget")
            n_non -= 1
    with open(os.path.join(root, "trials"), "w") as f:
        f.write("\n".join(trials) + "\n")


CONFIG = """
exp_dir: {root}/exp
data_type: raw
train_data: {root}/train.list
utt2spk: {root}/utt2spk
num_epochs: 24
samples_per_epoch: 3840    # the 480-utt corpus repeats ~8x per epoch
log_batch_interval: 30
enable_amp: true
dataset_args:
  batch_size: 64
  num_frms: 200
  shuffle: true
  shuffle_args:
    shuffle_size: 512
  fbank_args:
    num_mel_bins: 80
    frame_shift: 10
    frame_length: 25
    dither: 1.0
  spec_aug: true
dataloader_args:
  num_workers: 2
model: ECAPA_TDNN
model_args:
  feat_dim: 80
  embed_dim: 128
  channels: 256
  pooling_func: ASTP
projection_args:
  project_type: arc_margin
  scale: 32.0
  easy_margin: false
optimizer: SGD
optimizer_args:
  momentum: 0.9
  nesterov: true
  weight_decay: 0.0001
scheduler: ExponentialDecrease
scheduler_args:
  initial_lr: 0.1
  final_lr: 0.001
  warm_up_epoch: 2
margin_scheduler_args:
  initial_margin: 0.0
  final_margin: 0.2
  increase_start_epoch: 6
  fix_start_epoch: 14
  increase_type: exp
"""


def run(cmd):
    print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)


def main():
    root = os.path.abspath(sys.argv[1] if len(sys.argv) > 1
                           else "/tmp/wespeaker_tpu_quality")
    os.makedirs(root, exist_ok=True)
    make_corpus(root)
    cfg = os.path.join(root, "train.yaml")
    with open(cfg, "w") as f:
        f.write(CONFIG.format(root=root))

    py = [sys.executable, "-m"]
    t0 = time.time()
    run(py + ["wespeaker_tpu.bin.train", "--config", cfg])
    train_s = time.time() - t0

    ckpt = os.path.join(root, "exp", "models", "final_model.ckpt")
    t0 = time.time()
    run(py + ["wespeaker_tpu.bin.extract",
              "--config", os.path.join(root, "exp", "config.yaml"),
              "--checkpoint", ckpt,
              "--data_list", os.path.join(root, "eval.list"),
              "--out_prefix", os.path.join(root, "eval_emb"),
              "--batch_size", "32", "--bf16"])
    extract_s = time.time() - t0

    run(py + ["wespeaker_tpu.bin.score",
              "--exp_dir", os.path.join(root, "exp"),
              "--eval_scp_path", os.path.join(root, "eval_emb.scp"),
              os.path.join(root, "trials")])
    score_file = os.path.join(root, "exp", "scores", "trials.score")
    out = subprocess.run(
        py + ["wespeaker_tpu.bin.compute_metrics", "--p_target", "0.01",
              score_file],
        check=True, capture_output=True, text=True).stdout
    print(out, file=sys.stderr)
    eer = mindcf = None
    for line in out.splitlines():
        if line.startswith("EER"):
            eer = float(line.split("=")[1].replace("%", ""))
        elif line.startswith("minDCF"):
            mindcf = float(line.split("=")[1])
    print(json.dumps({"eer_percent": eer, "minDCF": mindcf,
                      "n_speakers": N_SPK,
                      "train_wall_s": round(train_s, 1),
                      "extract_wall_s": round(extract_s, 1)}))


if __name__ == "__main__":
    main()
