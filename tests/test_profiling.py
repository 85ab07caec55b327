"""Profiling utility smoke tests (CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wespeaker_tpu.utils.profiling import cost_analysis, sol_report


def test_cost_analysis_counts_matmul_flops():
    a = jnp.ones((128, 256), jnp.float32)
    b = jnp.ones((256, 128), jnp.float32)
    costs = cost_analysis(lambda x, y: x @ y, a, b)
    # 2*M*N*K = 8.4M flops
    assert costs["flops"] >= 2 * 128 * 128 * 256 * 0.9


def test_sol_report_runs():
    a = jnp.ones((64, 64), jnp.float32)
    rep = sol_report(lambda x: x @ x, a, iters=3)
    assert rep["seconds_per_call"] > 0
    assert np.isfinite(rep["achieved_tflops"])


def test_trainer_profile_args_capture_trace(tmp_path):
    """profile_args in the train config captures an XProf trace of the
    requested step window."""
    import glob
    import json
    import os

    import yaml

    from tests.test_recipe_e2e import _make_corpus
    from wespeaker_tpu.bin.train import train as bin_train

    entries = _make_corpus(tmp_path, n_spk=2, n_utt=2, seconds=1.5)
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
        "model_args": {"feat_dim": 40, "embed_dim": 32, "channels": 32},
        "profile_args": {"start_step": 0, "num_steps": 1},
        "dataset_args": {
            "batch_size": 2,
            "num_frms": 100,
            "shuffle": False,
            "speed_perturb": False,
            "aug_prob": 0.0,
            "spec_aug": False,
            "fbank_args": {"num_mel_bins": 40, "dither": 0.0},
            "filter_args": {"min_num_frames": 50, "max_num_frames": 400},
        },
        "seed": 0,
    }
    cfg = tmp_path / "c.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump(config, f)
    bin_train(str(cfg))
    traces = glob.glob(os.path.join(str(tmp_path / "exp"), "profile",
                                    "**", "*.xplane.pb"), recursive=True)
    assert traces, "no profiler trace written"
