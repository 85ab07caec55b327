"""Convergence parity: our trainer vs the reference torch trainer on the
SAME synthetic corpus and matched config (VERDICT r2 item 2).

Round-2 validated every *piece* (fbank goldens, model parity, schedule
parity, single-step numerics); this validates the assembled system: the
reference's wespeaker/bin/train.py:39-266 + utils/executor.py:23-96 run on
CPU over the identical 60-speaker formant corpus and matched
ECAPA-c256/ArcMargin/SGD/ExponentialDecrease config, and the final-epoch
EER on held-out trials is compared with ours. A subtle dynamics bug (BN
momentum, margin-ramp interaction, aug drift) shows up here and nowhere
else.

The reference's third-party deps missing from this env are stubbed:
fire/tableprint/torchnet (logging/CLI only), lmdb/kaldiio (unused: no
reverb/noise, raw data), and torchaudio — whose `load` is backed by the
stdlib wave module and `compliance.kaldi.fbank` by
tests/kaldi_fbank_numpy.py, itself golden-tested against recorded
torchaudio outputs (tests/test_fbank.py), so the reference trainer sees
bit-faithful kaldi features. CUDA/NCCL calls are mapped to CPU/gloo
(1 process). Matched-config choices: dither 0 (the numpy fbank is
dither-free), speed_perturb off (the stub has no sox), amp off; spec-aug
on for both (reference masks per-batch, ours per-utterance — documented
semantic difference).

Usage:
  scrubbed CPU env:  python scripts/convergence_parity.py torch [workdir]
  TPU/ambient env:   python scripts/convergence_parity.py ours  [workdir]
Each prints one JSON line {"side", "eer_percent", "minDCF", "wall_s"}.
Run `torch` first or in parallel; record both in docs/PERF.md.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WORKDIR_DEFAULT = "/tmp/wespeaker_convergence"
# env overrides let a smoke run validate the harness cheaply
NUM_EPOCHS = int(os.environ.get("CONV_EPOCHS", 24))
SAMPLES_PER_EPOCH = int(os.environ.get("CONV_SAMPLES", 3840))
BATCH = 64
# VERDICT r3 item 3: single-seed "ours beat torch once" is weak evidence of
# matched dynamics; CONV_SEED varies the training seed (corpus stays fixed —
# make_corpus uses its own rng(0)) so each side reports a distribution.
SEED = int(os.environ.get("CONV_SEED", 42))

COMMON = dict(
    num_frms=200, feat_dim=80, embed_dim=128, channels=256,
    initial_lr=0.1, final_lr=0.001, warm_up_epoch=2,
    initial_margin=0.0, final_margin=0.2,
    increase_start_epoch=6, fix_start_epoch=14,
)

OURS_CONFIG = """
exp_dir: {root}/exp_ours
data_type: raw
train_data: {root}/train.list
utt2spk: {root}/utt2spk
num_epochs: {num_epochs}
samples_per_epoch: {samples_per_epoch}
log_batch_interval: 30
enable_amp: false
seed: {seed}
dataset_args:
  batch_size: {batch}
  num_frms: {num_frms}
  shuffle: true
  shuffle_args:
    shuffle_size: 512
  speed_perturb: false
  aug_prob: 0.0
  fbank_args:
    num_mel_bins: {feat_dim}
    frame_shift: 10
    frame_length: 25
    dither: 0.0
  spec_aug: true
  spec_aug_args:
    num_t_mask: 1
    num_f_mask: 1
    max_t: 10
    max_f: 8
    spec_aug_prob: 0.6
dataloader_args:
  num_workers: 2
model: ECAPA_TDNN
model_args:
  feat_dim: {feat_dim}
  embed_dim: {embed_dim}
  channels: {channels}
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
  initial_lr: {initial_lr}
  final_lr: {final_lr}
  warm_up_epoch: {warm_up_epoch}
margin_scheduler_args:
  initial_margin: {initial_margin}
  final_margin: {final_margin}
  increase_start_epoch: {increase_start_epoch}
  fix_start_epoch: {fix_start_epoch}
  increase_type: exp
"""

TORCH_CONFIG = """
exp_dir: {root}/exp_torch
data_type: raw
train_data: {root}/train.list
train_label: {root}/utt2spk
num_epochs: {num_epochs}
log_batch_interval: 30
enable_amp: false
seed: {seed}
gpus: [0]
model_init: null
save_epoch_interval: 100
num_avg: 1
loss: CrossEntropyLoss
loss_args: {{}}
dataset_args:
  sample_num_per_epoch: {samples_per_epoch}
  num_frms: {num_frms}
  shuffle: true
  shuffle_args:
    shuffle_size: 512
  speed_perturb: false
  aug_prob: 0.0
  fbank_args:
    num_mel_bins: {feat_dim}
    frame_shift: 10
    frame_length: 25
    dither: 0.0
  filter: true
  filter_args:
    min_num_frames: 50
    max_num_frames: 400
  resample_rate: 16000
  spec_aug: true
  spec_aug_args:
    num_t_mask: 1
    num_f_mask: 1
    max_t: 10
    max_f: 8
    prob: 0.6
dataloader_args:
  batch_size: {batch}
  num_workers: 0
  drop_last: true
model: ECAPA_TDNN
model_args:
  feat_dim: {feat_dim}
  embed_dim: {embed_dim}
  channels: {channels}
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
  initial_lr: {initial_lr}
  final_lr: {final_lr}
  warm_up_epoch: {warm_up_epoch}
margin_scheduler: MarginScheduler
margin_update:
  initial_margin: {initial_margin}
  final_margin: {final_margin}
  increase_start_epoch: {increase_start_epoch}
  fix_start_epoch: {fix_start_epoch}
  update_margin: true
  increase_type: exp
"""


def _fmt(tpl, root):
    return tpl.format(root=root, num_epochs=NUM_EPOCHS, batch=BATCH,
                      samples_per_epoch=SAMPLES_PER_EPOCH, seed=SEED,
                      **COMMON)


# ---------------------------------------------------------------- stubs

def install_reference_stubs():
    """Make /root/reference/wespeaker importable + runnable on CPU torch."""
    import types
    import wave

    import torch

    sys.path.insert(0, "/root/reference")
    from tests.kaldi_fbank_numpy import fbank_numpy

    # Synthesize wespeaker package skeletons so the heavyweight package
    # __init__ (CLI + silero_vad deps) never executes (tests/torch_ref.py
    # pattern).
    for pkg in ("wespeaker", "wespeaker.bin", "wespeaker.utils",
                "wespeaker.utils.plda", "wespeaker.dataset",
                "wespeaker.models", "wespeaker.frontend"):
        path = "/root/reference/" + pkg.replace(".", "/")
        m = types.ModuleType(pkg)
        m.__path__ = [path]
        sys.modules[pkg] = m

    def _module(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        parent, _, child = name.rpartition(".")
        if parent and parent in sys.modules:
            setattr(sys.modules[parent], child, m)
        return m

    # fire: only used as CLI wrapper
    _module("fire", Fire=lambda *a, **k: None)

    # tableprint: grid log rows
    _module("tableprint",
            header=lambda cols, width=10, style=None: " | ".join(
                str(c) for c in cols),
            row=lambda vals, width=10, style=None: " | ".join(
                f"{v:.4f}" if isinstance(v, float) else str(v)
                for v in vals),
            bottom=lambda n, width=10, style=None: "-" * (n * 10))

    # torchnet meters
    class _AvgMeter:
        def __init__(self):
            self.vals = []

        def add(self, v):
            self.vals.append(float(v))

        def value(self):
            return (float(np.mean(self.vals)) if self.vals else 0.0, 0.0)

    class _AccMeter:
        def __init__(self, accuracy=True):
            self.hit = 0
            self.n = 0

        def add(self, outputs, targets):
            self.hit += int((np.argmax(outputs, axis=1) == targets).sum())
            self.n += len(targets)

        def value(self):
            return (100.0 * self.hit / max(self.n, 1),)

    tnt = _module("torchnet")
    _module("torchnet.meter", AverageValueMeter=_AvgMeter,
            ClassErrorMeter=_AccMeter)
    tnt.meter = sys.modules["torchnet.meter"]

    _module("kaldiio")
    _module("lmdb")

    # torchaudio: load via the wave module; kaldi fbank via the
    # golden-tested numpy implementation (dither must be 0)
    def ta_load(path):
        with wave.open(path, "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            data = np.frombuffer(w.readframes(n), dtype="<i2")
        wavt = torch.from_numpy(
            (data.astype(np.float32) / 32768.0)[None, :])
        return wavt, sr

    def ta_fbank(waveform, num_mel_bins=80, frame_length=25, frame_shift=10,
                 dither=0.0, sample_frequency=16000, window_type="hamming",
                 use_energy=False, **_kw):
        assert dither == 0.0, "numpy fbank stub is dither-free"
        wav = waveform.numpy()[0].astype(np.float64)
        mat = fbank_numpy(wav, sample_rate=int(sample_frequency),
                          num_mel=num_mel_bins, frame_len_ms=frame_length,
                          frame_shift_ms=frame_shift, window=window_type)
        return torch.from_numpy(mat.astype(np.float32))

    ta = _module("torchaudio", load=ta_load)
    _module("torchaudio.compliance")
    _module("torchaudio.compliance.kaldi", fbank=ta_fbank)
    ta.compliance = sys.modules["torchaudio.compliance"]

    # CPU mappings for the trainer's hardcoded CUDA/NCCL calls
    import torch.distributed as dist
    torch.cuda.set_device = lambda *a, **k: None
    real_init = dist.init_process_group
    dist.init_process_group = (
        lambda backend=None, **kw: real_init(backend="gloo", **kw))
    real_barrier = dist.barrier
    dist.barrier = lambda device_ids=None, **kw: real_barrier(**kw)
    torch.nn.Module.cuda = lambda self, *a, **k: self
    # torch.device("cuda") constructs fine on CPU-only torch; only moving
    # tensors there fails — shadow Tensor.to to remap cuda->cpu.
    # (Replacing torch.device itself breaks `str | torch.device` type
    # annotations inside torch._dynamo.)
    real_to = torch.Tensor.to

    def _to(self, *args, **kwargs):
        args = tuple(
            torch.device("cpu") if isinstance(a, torch.device)
            and a.type == "cuda" else a for a in args)
        if isinstance(kwargs.get("device"), torch.device) \
                and kwargs["device"].type == "cuda":
            kwargs["device"] = torch.device("cpu")
        return real_to(self, *args, **kwargs)

    torch.Tensor.to = _to
    os.environ.setdefault("RANK", "0")
    os.environ.setdefault("LOCAL_RANK", "0")
    os.environ.setdefault("WORLD_SIZE", "1")
    os.environ.setdefault("MASTER_ADDR", "127.0.0.1")
    os.environ.setdefault("MASTER_PORT", "29517")


# ------------------------------------------------------------- scoring

def eer_from_embeddings(embs, trials_path):
    from wespeaker_tpu.backend.metrics import compute_metrics
    scores, labels = [], []
    with open(trials_path) as f:
        for line in f:
            a, b, lab = line.split()
            ea, eb = embs[a], embs[b]
            scores.append(float(np.dot(ea, eb) /
                                (np.linalg.norm(ea) * np.linalg.norm(eb)
                                 + 1e-12)))
            labels.append(1 if lab == "target" else 0)
    eer_pct, _thr, mindcf = compute_metrics(np.asarray(scores),
                                            np.asarray(labels))
    return eer_pct, mindcf


def run_torch_side(root):
    install_reference_stubs()
    import torch
    from wespeaker.bin.train import train as ref_train

    cfg_path = os.path.join(root, "torch.yaml")
    with open(cfg_path, "w") as f:
        f.write(_fmt(TORCH_CONFIG, root))
    t0 = time.time()
    ref_train(config=cfg_path)
    wall = time.time() - t0

    # evaluate: whole-utterance fbank (dither 0) + CMN -> reference model
    from wespeaker.models.speaker_model import get_speaker_model
    from wespeaker.utils.checkpoint import load_checkpoint
    model = get_speaker_model("ECAPA_TDNN")(
        feat_dim=COMMON["feat_dim"], embed_dim=COMMON["embed_dim"],
        channels=COMMON["channels"], pooling_func="ASTP")
    load_checkpoint(model, os.path.join(root, "exp_torch", "models",
                                        f"model_{NUM_EPOCHS}.pt"))
    model.eval()
    import torchaudio
    import torchaudio.compliance.kaldi as kaldi
    embs = {}
    with open(os.path.join(root, "eval.list")) as f:
        for line in f:
            obj = json.loads(line)
            wav, sr = torchaudio.load(obj["wav"])
            feat = kaldi.fbank(wav * (1 << 15),
                               num_mel_bins=COMMON["feat_dim"],
                               dither=0.0, sample_frequency=sr)
            feat = feat - feat.mean(dim=0, keepdim=True)
            with torch.no_grad():
                out = model(feat[None])
            emb = out[-1] if isinstance(out, tuple) else out
            embs[obj["key"]] = emb.numpy()[0]
    eer, mindcf = eer_from_embeddings(embs, os.path.join(root, "trials"))
    return {"side": "torch_reference", "seed": SEED,
            "eer_percent": round(eer, 2),
            "minDCF": round(mindcf, 3), "wall_s": round(wall, 1)}


def run_ours_side(root):
    from wespeaker_tpu.utils.kaldi_io import read_vec_scp_dict

    cfg_path = os.path.join(root, "ours.yaml")
    with open(cfg_path, "w") as f:
        f.write(_fmt(OURS_CONFIG, root))
    py = [sys.executable, "-m"]
    t0 = time.time()
    subprocess.run(py + ["wespeaker_tpu.bin.train", "--config", cfg_path],
                   check=True)
    wall = time.time() - t0
    subprocess.run(py + [
        "wespeaker_tpu.bin.extract",
        "--config", os.path.join(root, "exp_ours", "config.yaml"),
        "--checkpoint", os.path.join(root, "exp_ours", "models",
                                     "final_model.ckpt"),
        "--data_list", os.path.join(root, "eval.list"),
        "--out_prefix", os.path.join(root, "eval_emb_ours"),
        "--batch_size", "32"], check=True)
    embs = read_vec_scp_dict(os.path.join(root, "eval_emb_ours.scp"))
    eer, mindcf = eer_from_embeddings(embs, os.path.join(root, "trials"))
    return {"side": "ours", "seed": SEED, "eer_percent": round(eer, 2),
            "minDCF": round(mindcf, 3), "wall_s": round(wall, 1)}


def main():
    side = sys.argv[1] if len(sys.argv) > 1 else "torch"
    root = os.path.abspath(sys.argv[2] if len(sys.argv) > 2
                           else WORKDIR_DEFAULT)
    os.makedirs(root, exist_ok=True)
    if not os.path.exists(os.path.join(root, "trials")):
        from scripts.smoke_quality_tpu import make_corpus
        make_corpus(root)
    out = run_torch_side(root) if side == "torch" else run_ours_side(root)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
