"""Smoke test: DINO trainer CLI on the synthetic corpus."""

import json

import numpy as np
import pytest
import yaml

jax = pytest.importorskip("jax")

from tests.test_recipe_e2e import _make_corpus
from wespeaker_tpu.bin.train_dino import train_dino


@pytest.mark.slow
def test_train_dino_runs(tmp_path):
    entries = _make_corpus(tmp_path, n_spk=3, n_utt=3, seconds=2.5)
    raw_list = tmp_path / "raw.list"
    with open(raw_list, "w") as f:
        for key, spk, path in entries:
            f.write(json.dumps({"key": key, "spk": spk, "wav": path}) + "\n")
    utt2spk = tmp_path / "utt2spk"
    with open(utt2spk, "w") as f:
        for key, spk, _ in entries:
            f.write(f"{key} {spk}\n")

    config = {
        "exp_dir": str(tmp_path / "exp"),
        "data_type": "raw",
        "train_data": str(raw_list),
        "utt2spk": str(utt2spk),
        "num_epochs": 1,
        "log_batch_interval": 1,
        "model": "ECAPA_TDNN",
        "model_args": {"feat_dim": 40, "embed_dim": 48, "channels": 32},
        "dino_args": {
            "head_out_dim": 128, "head_hidden_dim": 64,
            "bottleneck_dim": 32, "global_chunk_num": 2,
            "local_chunk_num": 2, "global_chunk_sec": 1.0,
            "local_chunk_sec": 0.5, "warmup_epochs": 0,
            "freeze_last_layer_epochs": 0,
        },
        "dataset_args": {
            "batch_size": 1,
            "shuffle": True,
            "shuffle_args": {"shuffle_size": 4},
            "aug_prob": 0.0,
            "fbank_args": {"num_mel_bins": 40, "dither": 0.0},
            "filter_args": {"min_num_frames": 50, "max_num_frames": 400},
        },
        "seed": 3,
    }
    cfg = tmp_path / "dino.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump(config, f)
    from wespeaker_tpu.ops import grouped_conv as gc
    try:
        state = train_dino(str(cfg))
        # under the default pure-DP mesh (no model axis) the trainer must
        # have selected the fast native grouped-conv kernel gradient, like
        # bin/train.py (docs/PERF.md round 4: safe path is ~9x for depthwise)
        assert gc.kernel_grad_mode() == "native"
    finally:
        gc.set_kernel_grad_mode("safe")  # process-global; restore default
    assert int(state.step) >= 1
    import os
    assert os.path.exists(tmp_path / "exp" / "models" / "model_0.ckpt")

    # recipe stage 3 (examples/voxceleb/v3/dino/run.sh): average the teacher
    # checkpoints and extract with the trainer-dumped $exp/config.yaml
    assert os.path.exists(tmp_path / "exp" / "config.yaml")
    from wespeaker_tpu.bin.average_model import average_model
    from wespeaker_tpu.bin.extract import extract
    avg = tmp_path / "exp" / "models" / "avg_model.ckpt"
    average_model(str(tmp_path / "exp" / "models"), str(avg), num=1)
    out_prefix = str(tmp_path / "exp" / "embeddings" / "train")
    extract(str(tmp_path / "exp" / "config.yaml"), str(avg),
            str(raw_list), out_prefix, batch_size=4)
    from wespeaker_tpu.utils.kaldi_io import read_vec_scp_dict
    embs = read_vec_scp_dict(out_prefix + ".scp")
    assert len(embs) == len(entries)
    for v in embs.values():
        assert v.shape == (48,) and np.isfinite(v).all()


@pytest.mark.slow
def test_train_dino_segmented_resume(tmp_path):
    """resume=true + stop_epoch: the full DINOState (student/teacher/opt/
    center/step) round-trips across processes, so segmented runs continue
    the same schedules — the supported way to run long pretrains through
    the leaky tunnel (docs/PERF.md round-5 env note)."""
    # global batch = batch_size x 8 virtual devices = 8; 16 utts -> 2
    # iters/epoch (a global batch larger than one epoch's utterances would
    # starve the view-major batcher, which drops partial buffers)
    entries = _make_corpus(tmp_path, n_spk=2, n_utt=8, seconds=2.5)
    raw_list = tmp_path / "raw.list"
    with open(raw_list, "w") as f:
        for key, spk, path in entries:
            f.write(json.dumps({"key": key, "spk": spk, "wav": path}) + "\n")
    utt2spk = tmp_path / "utt2spk"
    with open(utt2spk, "w") as f:
        for key, spk, _ in entries:
            f.write(f"{key} {spk}\n")
    config = {
        "exp_dir": str(tmp_path / "exp"),
        "data_type": "raw",
        "train_data": str(raw_list),
        "utt2spk": str(utt2spk),
        "num_epochs": 2,
        "log_batch_interval": 1,
        "model": "ECAPA_TDNN",
        "model_args": {"feat_dim": 40, "embed_dim": 32, "channels": 32},
        "dino_args": {
            "head_out_dim": 64, "head_hidden_dim": 48,
            "bottleneck_dim": 16, "global_chunk_num": 2,
            "local_chunk_num": 2, "global_chunk_sec": 1.0,
            "local_chunk_sec": 0.5, "warmup_epochs": 0,
            "freeze_last_layer_epochs": 0,
        },
        "dataset_args": {
            "batch_size": 1, "shuffle": False, "aug_prob": 0.0,
            "fbank_args": {"num_mel_bins": 40, "dither": 0.0},
            "filter_args": {"min_num_frames": 50, "max_num_frames": 400},
        },
        "seed": 7,
    }
    cfg = tmp_path / "dino.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump(config, f)
    import os

    from wespeaker_tpu.ops import grouped_conv as gc
    try:
        s1 = train_dino(str(cfg), ["resume=true", "stop_epoch=1"])
        assert int(s1.step) == 2  # 16 utts / global batch 8 = 2 iters/epoch
        assert os.path.exists(tmp_path / "exp" / "models"
                              / "trainer_state.ckpt")
        s2 = train_dino(str(cfg), ["resume=true"])  # continues to epoch 2
        assert int(s2.step) == 4  # resumed at step 2, not restarted
        np.testing.assert_array_equal(
            np.asarray(s2.center).shape, np.asarray(s1.center).shape)
        assert os.path.exists(tmp_path / "exp" / "models" / "model_1.ckpt")
    finally:
        gc.set_kernel_grad_mode("safe")


@pytest.mark.slow
@pytest.mark.parametrize("method", ["moco", "simclr"])
def test_train_contrastive_runs(tmp_path, method):
    from wespeaker_tpu.bin.train_contrastive import train_contrastive

    entries = _make_corpus(tmp_path, n_spk=2, n_utt=4, seconds=2.2)
    raw_list = tmp_path / "raw.list"
    with open(raw_list, "w") as f:
        for key, spk, path in entries:
            f.write(json.dumps({"key": key, "spk": spk, "wav": path}) + "\n")
    utt2spk = tmp_path / "utt2spk"
    with open(utt2spk, "w") as f:
        for key, spk, _ in entries:
            f.write(f"{key} {spk}\n")
    config = {
        "exp_dir": str(tmp_path / f"exp_{method}"),
        "ssl_method": method,
        "data_type": "raw",
        "train_data": str(raw_list),
        "utt2spk": str(utt2spk),
        "num_epochs": 1,
        "log_batch_interval": 1,
        "model": "ECAPA_TDNN",
        "model_args": {"feat_dim": 40, "embed_dim": 32, "channels": 32},
        "ssl_args": {"queue_size": 16, "chunk_sec": 1.0},
        "dataset_args": {
            "batch_size": 1,
            "shuffle": True,
            "shuffle_args": {"shuffle_size": 4},
            "aug_prob": 0.0,
            "fbank_args": {"num_mel_bins": 40, "dither": 0.0},
            "filter_args": {"min_num_frames": 50, "max_num_frames": 400},
        },
        "seed": 5,
    }
    cfg = tmp_path / f"{method}.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump(config, f)
    from wespeaker_tpu.ops import grouped_conv as gc
    try:
        state = train_contrastive(str(cfg))
        assert gc.kernel_grad_mode() == "native"  # pure-DP mesh, as train.py
    finally:
        gc.set_kernel_grad_mode("safe")  # process-global; restore default
    assert int(state.step) >= 1
