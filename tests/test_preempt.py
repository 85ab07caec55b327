"""Preemption-safe training: SIGTERM mid-epoch saves a resumable
checkpoint and exits cleanly (no reference analogue — TPU maintenance
events deliver SIGTERM; the reference only restarts at epoch boundaries,
wespeaker/bin/train.py:168-175)."""

import glob
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

pytest.importorskip("jax")

from wespeaker_tpu.utils.checkpoint import parse_start_epoch  # noqa: E402

from .test_recipe_e2e import _make_corpus  # noqa: E402

CONFIG = """\
exp_dir: {exp}
model: ECAPA_TDNN
model_args: {{feat_dim: 40, embed_dim: 32, channels: 32}}
projection_args: {{project_type: arc_margin, scale: 32.0}}
data_type: raw
dataset_args:
  batch_size: 4
  num_frms: 100
  shuffle: false
  speed_perturb: false
  spec_aug: false
  resample_rate: 16000
  fbank_args: {{num_mel_bins: 40, dither: 0.0}}
num_epochs: 1000
log_batch_interval: 1
seed: 7
"""


def test_parse_start_epoch_preempt():
    assert parse_start_epoch("exp/models/model_4.ckpt") == 5
    assert parse_start_epoch("exp/models/preempt_model_4.ckpt") == 4


@pytest.mark.slow
def test_sigterm_saves_resumable_checkpoint(tmp_path):
    entries = _make_corpus(tmp_path, n_spk=3, n_utt=4, seconds=1.5)
    raw_list = tmp_path / "raw.list"
    with open(raw_list, "w") as f:
        for key, spk, path in entries:
            f.write(json.dumps({"key": key, "spk": spk, "wav": path}) + "\n")
    utt2spk = tmp_path / "utt2spk"
    with open(utt2spk, "w") as f:
        for key, spk, _ in entries:
            f.write(f"{key} {spk}\n")
    exp = tmp_path / "exp"
    cfg = tmp_path / "train.yaml"
    cfg.write_text(CONFIG.format(exp=exp))

    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-m", "wespeaker_tpu.bin.train",
           "--config", str(cfg),
           f"train_data={raw_list}", f"utt2spk={utt2spk}"]
    proc = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    try:
        # wait until at least one training step has logged, then preempt
        log = exp / "train.log"
        deadline = time.time() + 240
        while time.time() < deadline:
            if log.exists() and " it " in log.read_text():
                break
            time.sleep(0.5)
        else:
            pytest.fail("trainer never logged a step:\n"
                        + (log.read_text() if log.exists() else "<no log>"))
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out

    ckpts = glob.glob(str(exp / "models" / "preempt_model_*.ckpt"))
    assert len(ckpts) == 1, (out, ckpts)
    epoch = parse_start_epoch(ckpts[0])

    # resume: must restart the interrupted epoch with the saved weights
    out2 = subprocess.run(
        cmd + [f"checkpoint={ckpts[0]}", f"num_epochs={epoch + 1}"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=420)
    assert out2.returncode == 0, out2.stdout
    assert f"resumed from {ckpts[0]} at epoch {epoch}" in out2.stdout
    assert (exp / "models" / f"model_{epoch}.ckpt").exists()
    # resumed weights are real: loss should not be at cold-start scale
    final = np.any([f"epoch {epoch} done" in ln for ln in
                    out2.stdout.splitlines()])
    assert final, out2.stdout
