"""SSL quality smoke on real hardware: DINO pretraining (no labels) on the
same synthetic corpus as scripts/smoke_quality_tpu.py must produce
discriminative embeddings — EER well below the 50 % chance line, and
comparable to the supervised smoke's 5.0 %. Unit tests (tests/test_ssl.py)
pin the loss/EMA pieces; this asserts the ASSEMBLED system (EMA + centering
+ multi-crop + temp/lr/momentum schedules interacting) actually LEARNS,
which is the reference's headline SSL deliverable
(reference examples/voxceleb/v3/dino/README.md:8-11 — DINO 2.627 % EER on
VoxCeleb, vs supervised 1.069 % with the same backbone).

The run mirrors the reference recipe shape (conf/ecapa_dino.yaml: multi-crop
2 global + 4 local, BN head, teacher-temp warmup, EMA cosine, SGD lr
0.2*batch/256 cosine) scaled to the 3 s synthetic utterances (2 s global /
1 s local crops) and a ~2.4k-step budget.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/smoke_ssl_quality_tpu.py [workdir] [--method dino|moco|simclr]
Prints one JSON line: {"method", "eer_percent", "minDCF", "train_wall_s"}.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from smoke_quality_tpu import make_corpus  # noqa: E402  same corpus/trials

DINO_CONFIG = """
exp_dir: {root}/exp_dino
seed: 42
data_type: raw
train_data: {root}/train8x.list
utt2spk: {root}/utt2spk
num_epochs: 80
log_batch_interval: 20
enable_amp: true
dataset_args:
  batch_size: 64
  shuffle: true
  shuffle_args:
    shuffle_size: 512
  speed_perturb: false
  aug_prob: 0.0
  fbank_args:
    num_mel_bins: 80
    frame_shift: 10
    frame_length: 25
    dither: 1.0
  filter_args:
    min_num_frames: 100
    max_num_frames: 400
model: ECAPA_TDNN_GLOB_c512
model_args:
  feat_dim: 80
  embed_dim: 128
  pooling_func: ASTP
dino_args:
  head_out_dim: 8192
  head_hidden_dim: 1024
  bottleneck_dim: 128
  head_use_bn: true
  global_chunk_num: 2
  local_chunk_num: 4
  global_chunk_sec: 2.0
  local_chunk_sec: 1.0
  base_lr: 0.2
  final_lr: 0.00005
  warmup_epochs: 8
  warmup_teacher_temp: 0.04
  teacher_temp: 0.07
  momentum_teacher: 0.996
  clip_grad: 3.0
  freeze_last_layer_epochs: 1
"""

CONTRASTIVE_CONFIG = """
exp_dir: {root}/exp_{method}
seed: 42
ssl_method: {method}
data_type: raw
train_data: {root}/train8x.list
utt2spk: {root}/utt2spk
num_epochs: 80
log_batch_interval: 20
enable_amp: true
dataset_args:
  batch_size: 64
  shuffle: true
  shuffle_args:
    shuffle_size: 512
  speed_perturb: false
  aug_prob: 0.0
  fbank_args:
    num_mel_bins: 80
    frame_shift: 10
    frame_length: 25
    dither: 1.0
  filter_args:
    min_num_frames: 100
    max_num_frames: 400
model: ECAPA_TDNN_GLOB_c512
model_args:
  feat_dim: 80
  embed_dim: 128
  pooling_func: ASTP
ssl_args:
  chunk_sec: 2.0
  queue_size: 4096
  temperature: 0.07
  base_lr: 0.1
"""


def run(cmd):
    print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/wespeaker_ssl_quality")
    ap.add_argument("--method", default="dino",
                    choices=["dino", "moco", "simclr"])
    ap.add_argument("--avg_num", type=int, default=2)
    ap.add_argument("--epochs_per_proc", type=int, default=26,
                    help="segment DINO training into fresh processes every "
                         "N epochs (tunnel host-RAM leak workaround); 0 = "
                         "single process")
    args = ap.parse_args()
    root = os.path.abspath(args.workdir)
    os.makedirs(root, exist_ok=True)
    make_corpus(root)

    # epoch_iter in the SSL trainers is len(train_data)//batch; repeat the
    # 480-utt list 8x so one epoch is 60 steps (matching the supervised
    # smoke's samples_per_epoch: 3840) -> 40 epochs = 2400 DINO steps
    with open(os.path.join(root, "train.list")) as f:
        lines = f.read().strip().splitlines()
    with open(os.path.join(root, "train8x.list"), "w") as f:
        for rep in range(8):
            f.write("\n".join(lines) + "\n")

    exp = os.path.join(root, f"exp_{args.method}")
    cfg_text = (DINO_CONFIG.format(root=root) if args.method == "dino"
                else CONTRASTIVE_CONFIG.format(root=root,
                                               method=args.method))
    if args.method == "dino":
        exp = os.path.join(root, "exp_dino")
    cfg = os.path.join(root, f"{args.method}.yaml")
    with open(cfg, "w") as f:
        f.write(cfg_text)

    py = [sys.executable, "-m"]
    trainer = ("wespeaker_tpu.bin.train_dino" if args.method == "dino"
               else "wespeaker_tpu.bin.train_contrastive")
    t0 = time.time()
    if args.method == "dino" and args.epochs_per_proc:
        # the tunnel leaks host RAM per transfer (docs/PERF.md round-5 env
        # note): segment the run into fresh processes via the trainer's
        # resume/stop_epoch support so long smokes fit the box
        import re
        total = int(re.search(r"num_epochs: (\d+)", cfg_text).group(1))
        end = args.epochs_per_proc
        while True:
            run(py + [trainer, "--config", cfg, "resume=true",
                      f"stop_epoch={min(end, total)}"])
            if end >= total:
                break
            end += args.epochs_per_proc
    else:
        run(py + [trainer, "--config", cfg])
    train_s = time.time() - t0

    # recipe stage 3 (examples/voxceleb/v3/*/run.sh): average the last
    # teacher checkpoints, extract with the trainer-dumped config
    model_dir = os.path.join(exp, "models")
    avg = os.path.join(model_dir, "avg_model.ckpt")
    run(py + ["wespeaker_tpu.bin.average_model", "--dst_model", avg,
              "--src_path", model_dir, "--num", str(args.avg_num)])
    run(py + ["wespeaker_tpu.bin.extract",
              "--config", os.path.join(exp, "config.yaml"),
              "--checkpoint", avg,
              "--data_list", os.path.join(root, "eval.list"),
              "--out_prefix", os.path.join(root, f"eval_emb_{args.method}"),
              "--batch_size", "32", "--bf16"])
    run(py + ["wespeaker_tpu.bin.score",
              "--exp_dir", exp,
              "--eval_scp_path",
              os.path.join(root, f"eval_emb_{args.method}.scp"),
              os.path.join(root, "trials")])
    score_file = os.path.join(exp, "scores", "trials.score")
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
    print(json.dumps({"method": args.method, "eer_percent": eer,
                      "minDCF": mindcf,
                      "train_wall_s": round(train_s, 1)}))


if __name__ == "__main__":
    main()
