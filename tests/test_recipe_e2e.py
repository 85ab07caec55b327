"""End-to-end mini recipe on a synthetic corpus — the integration-test
equivalent of the reference's staged run.sh (SURVEY.md §4.6): train a tiny
ECAPA for a few steps, extract embeddings to kaldi ark/scp, cosine-score a
trial list, AS-Norm, QMF-calibrate, compute EER, and run the PLDA path."""

import json
import os

import numpy as np
import pytest
import yaml

jax = pytest.importorskip("jax")

from wespeaker_tpu.bin import extract as bin_extract
from wespeaker_tpu.bin import plda_tools
from wespeaker_tpu.bin import score as bin_score
from wespeaker_tpu.bin import score_calibration as bin_cal
from wespeaker_tpu.bin import score_norm as bin_norm
from wespeaker_tpu.bin.average_model import average_model
from wespeaker_tpu.bin.compute_metrics import metrics_for_file
from wespeaker_tpu.bin.train import train as bin_train
from wespeaker_tpu.data.wav_io import write_wav


def _make_corpus(tmp_path, n_spk=4, n_utt=6, seconds=2.5, sr=16000, seed=0):
    """Speakers are sinusoid mixtures at speaker-specific frequencies + noise
    so that even a briefly-trained model separates them."""
    rng = np.random.default_rng(seed)
    wav_dir = tmp_path / "wav"
    wav_dir.mkdir(exist_ok=True)
    entries = []
    t = np.arange(int(seconds * sr)) / sr
    for spk in range(n_spk):
        freqs = 200 + 150 * spk + rng.uniform(-5, 5, 3)
        for utt in range(n_utt):
            sig = sum(np.sin(2 * np.pi * (f + rng.uniform(-2, 2)) * t)
                      for f in freqs)
            sig = 0.2 * sig / np.max(np.abs(sig))
            sig = sig + rng.normal(0, 0.01, len(t))
            key = f"spk{spk}_utt{utt}"
            path = wav_dir / f"{key}.wav"
            write_wav(path, sig.astype(np.float32), sr)
            entries.append((key, f"spk{spk}", str(path)))
    return entries


@pytest.mark.slow
def test_full_recipe(tmp_path):
    entries = _make_corpus(tmp_path)
    raw_list = tmp_path / "raw.list"
    with open(raw_list, "w") as f:
        for key, spk, path in entries:
            f.write(json.dumps({"key": key, "spk": spk, "wav": path}) + "\n")
    utt2spk = tmp_path / "utt2spk"
    with open(utt2spk, "w") as f:
        for key, spk, _ in entries:
            f.write(f"{key} {spk}\n")

    exp_dir = tmp_path / "exp"
    config = {
        "exp_dir": str(exp_dir),
        "data_type": "raw",
        "train_data": str(raw_list),
        "utt2spk": str(utt2spk),
        "num_epochs": 2,
        "log_batch_interval": 5,
        "model": "ECAPA_TDNN",
        "model_args": {"feat_dim": 40, "embed_dim": 64, "channels": 64,
                       "pooling_func": "ASTP"},
        "projection_args": {"project_type": "arc_margin", "scale": 32.0},
        "optimizer": "SGD",
        "optimizer_args": {"weight_decay": 1e-4, "momentum": 0.9},
        "scheduler": "ExponentialDecrease",
        "scheduler_args": {"initial_lr": 0.05, "final_lr": 0.01,
                           "warm_up_epoch": 1},
        "margin_scheduler_args": {"increase_start_epoch": 1,
                                  "fix_start_epoch": 2,
                                  "initial_margin": 0.0,
                                  "final_margin": 0.1},
        "dataset_args": {
            "batch_size": 2,
            "num_frms": 150,
            "shuffle": True,
            "shuffle_args": {"shuffle_size": 8},
            "speed_perturb": True,
            "aug_prob": 0.0,
            "spec_aug": False,
            "fbank_args": {"num_mel_bins": 40, "frame_shift": 10,
                           "frame_length": 25, "dither": 0.0},
            "filter_args": {"min_num_frames": 50, "max_num_frames": 400},
        },
        "seed": 7,
    }
    config_path = tmp_path / "config.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    # --- stage 3: train ---
    bin_train(str(config_path))
    model_dir = exp_dir / "models"
    ckpts = sorted(os.listdir(model_dir))
    assert "model_0.ckpt" in ckpts and "model_1.ckpt" in ckpts

    # --- model averaging ---
    avg = average_model(str(model_dir), str(model_dir / "avg_model.ckpt"),
                        num=2)

    # --- stage 4: extract ---
    emb_prefix = str(tmp_path / "xvector")
    scp = bin_extract.extract(str(config_path), avg, str(raw_list),
                              emb_prefix, batch_size=4)
    from wespeaker_tpu.utils.kaldi_io import read_vec_scp_dict
    embs = read_vec_scp_dict(scp)
    assert len(embs) == len(entries)
    assert next(iter(embs.values())).shape == (64,)

    # --- stage 5: trials + cosine scoring ---
    keys = [k for k, _, _ in entries]
    rng = np.random.default_rng(0)
    trials_path = tmp_path / "trials"
    with open(trials_path, "w") as f:
        for a in keys[::2]:
            for b in keys[1::2]:
                lab = "target" if a.split("_")[0] == b.split("_")[0] \
                    else "nontarget"
                f.write(f"{a} {b} {lab}\n")
    cal_mean_dir = tmp_path / "mean"
    cal_mean_dir.mkdir()
    import shutil
    shutil.copy(scp, cal_mean_dir / "xvector.scp")
    score_files = bin_score.score(str(exp_dir), scp, str(cal_mean_dir),
                                  [str(trials_path)])
    e, thr, dcf = metrics_for_file(score_files[0])
    assert 0.0 <= e <= 100.0

    # --- stage 6: AS-Norm (cohort = training embeddings themselves) ---
    norm_file = str(tmp_path / "trials.asnorm")
    bin_norm.score_norm("asnorm", 8, score_files[0], norm_file, scp, scp,
                        str(cal_mean_dir / "mean_vec.npy"))
    with open(norm_file) as f:
        assert len(f.readlines()) > 0

    # --- stage 7: QMF calibration ---
    qmf_model = str(tmp_path / "qmf.npz")
    bin_cal.train_qmf(norm_file, qmf_model)
    cal_scores = bin_cal.infer_qmf(norm_file, qmf_model,
                                   str(tmp_path / "trials.cal"))
    metrics_for_file(cal_scores)

    # --- PLDA path ---
    plda_model = str(tmp_path / "plda.h5")
    plda_tools.train_plda(scp, str(utt2spk), plda_model, embed_dim=64,
                          num_iters=3)
    # vox-style trials: both sides are utterances -> identity enroll map
    utt2utt = tmp_path / "utt2utt"
    with open(utt2utt, "w") as f:
        for key, _, _ in entries:
            f.write(f"{key} {key}\n")
    plda_scores = plda_tools.eval_plda(scp, str(utt2utt), scp,
                                       str(trials_path),
                                       str(tmp_path / "plda.score"),
                                       plda_model)
    metrics_for_file(plda_scores)


def test_sre_v3_embd_proc_chain_stages(tmp_path):
    """examples/sre/v3/run.sh stages 5-8 on synthetic embeddings: estimate
    a mean-subtract|length-norm|lda|length-norm chain, apply via the CLI
    module, then PLDA train/adapt/eval on the processed vectors."""
    from wespeaker_tpu.bin import embd_proc
    from wespeaker_tpu.utils.kaldi_io import (read_vec_scp_dict,
                                              write_vec_ark_scp)

    rng = np.random.default_rng(0)
    dim, n_spk, n_utt = 32, 8, 12
    centers = rng.normal(size=(n_spk, dim)) * 3
    items, utt2spk_lines = [], []
    for s in range(n_spk):
        for u in range(n_utt):
            key = f"s{s}_u{u}"
            items.append((key, (centers[s] + rng.normal(size=dim))
                          .astype(np.float32)))
            utt2spk_lines.append(f"{key} s{s}")
    train_prefix = str(tmp_path / "train")
    write_vec_ark_scp(train_prefix, items)
    utt2spk = tmp_path / "utt2spk"
    utt2spk.write_text("\n".join(utt2spk_lines) + "\n")

    chain = (f"mean-subtract --scp {train_prefix}.scp | length-norm | "
             f"lda --scp {train_prefix}.scp --utt2spk {utt2spk} --dim 16 | "
             "length-norm")
    proc_pkl = str(tmp_path / "proc.pkl")
    embd_proc.prep(chain, proc_pkl)
    embd_proc.apply(proc_pkl, f"{train_prefix}.scp",
                    str(tmp_path / "train_proc"))
    proc = read_vec_scp_dict(str(tmp_path / "train_proc.scp"))
    assert len(proc) == n_spk * n_utt
    first = next(iter(proc.values()))
    assert first.shape == (16,)
    np.testing.assert_allclose(np.linalg.norm(first), 1.0, rtol=1e-5)

    plda_model = str(tmp_path / "plda.h5")
    plda_tools.train_plda(str(tmp_path / "train_proc.scp"), str(utt2spk),
                          plda_model, embed_dim=16, num_iters=5)
    plda_tools.adapt_plda(plda_model, str(tmp_path / "train_proc.scp"),
                          str(tmp_path / "plda_adapt.h5"))

    utt2utt = tmp_path / "utt2utt"
    utt2utt.write_text("\n".join(f"{k} {k}" for k, _ in items) + "\n")
    trials = tmp_path / "trials"
    lines = []
    keys = [k for k, _ in items]
    for i in range(0, len(keys) - 1, 7):
        a, b = keys[i], keys[i + 1]
        lab = ("target" if a.split("_")[0] == b.split("_")[0]
               else "nontarget")
        lines.append(f"{a} {b} {lab}")
    trials.write_text("\n".join(lines) + "\n")
    scores = plda_tools.eval_plda(
        str(tmp_path / "train_proc.scp"), str(utt2utt),
        str(tmp_path / "train_proc.scp"), str(trials),
        str(tmp_path / "plda_adapt.score"), str(tmp_path / "plda_adapt.h5"))
    with open(scores) as f:
        assert len(f.readlines()) == len(lines)


def test_8k_rate_plumbing(tmp_path):
    """An 8 kHz model (sre recipes): resample_rate must reach the device
    fbank (frame geometry) in train AND extract, and 16 kHz eval wavs must
    be resampled down — embeddings from a 16 kHz file must match the same
    audio delivered at 8 kHz."""
    from wespeaker_tpu.bin.extract import extract as bin_extract
    from wespeaker_tpu.data.pipeline import resample_array
    from wespeaker_tpu.data.wav_io import write_wav
    from wespeaker_tpu.utils.kaldi_io import read_vec_scp_dict

    rng = np.random.default_rng(0)
    wav16 = rng.uniform(-0.3, 0.3, 16000 * 2).astype(np.float32)
    wav8 = resample_array(wav16, 16000, 8000)
    write_wav(tmp_path / "a16.wav", wav16, 16000)
    write_wav(tmp_path / "a8.wav", wav8, 8000)
    raw_list = tmp_path / "raw.list"
    with open(raw_list, "w") as f:
        f.write(json.dumps({"key": "u16", "spk": "s0",
                            "wav": str(tmp_path / "a16.wav")}) + "\n")
        f.write(json.dumps({"key": "u8", "spk": "s0",
                            "wav": str(tmp_path / "a8.wav")}) + "\n")
    utt2spk = tmp_path / "utt2spk"
    utt2spk.write_text("u16 s0\nu8 s0\n")

    exp_dir = tmp_path / "exp"
    config = {
        "exp_dir": str(exp_dir), "data_type": "raw",
        "train_data": str(raw_list), "utt2spk": str(utt2spk),
        "num_epochs": 1, "log_batch_interval": 5,
        "model": "ECAPA_TDNN",
        "model_args": {"feat_dim": 40, "embed_dim": 32, "channels": 32},
        "projection_args": {"project_type": "softmax"},
        "optimizer": "SGD", "optimizer_args": {"momentum": 0.9},
        "scheduler_args": {"initial_lr": 0.01, "final_lr": 0.01,
                           "warm_up_epoch": 1},
        "dataset_args": {
            "batch_size": 2, "num_frms": 100, "shuffle": False,
            "speed_perturb": False, "aug_prob": 0.0, "spec_aug": False,
            "resample_rate": 8000,
            "fbank_args": {"num_mel_bins": 40, "dither": 0.0},
            "filter_args": {"min_num_frames": 50, "max_num_frames": 400},
        },
        "seed": 7,
    }
    config_path = tmp_path / "config.yaml"
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)
    bin_train(str(config_path))

    scp = bin_extract(str(exp_dir / "config.yaml"),
                      str(exp_dir / "models" / "model_0.ckpt"),
                      str(raw_list), str(tmp_path / "emb"))
    embs = read_vec_scp_dict(scp)
    e16, e8 = embs["u16"], embs["u8"]
    cos = float(np.dot(e16, e8)
                / (np.linalg.norm(e16) * np.linalg.norm(e8)))
    assert cos > 0.999, cos  # same audio through either delivery rate


def test_do_lm_keeps_3x_classifier_rows(tmp_path):
    """Large-margin fine-tune (do_lm): speed perturb is disabled but the
    margin head keeps the 3x rows from the speed-perturbed base run so its
    checkpoint loads without truncation (reference train.py:140-148)."""
    from flax import serialization

    entries = _make_corpus(tmp_path, n_spk=3, n_utt=2, seconds=1.5)
    raw_list = tmp_path / "raw.list"
    with open(raw_list, "w") as f:
        for key, spk, path in entries:
            f.write(json.dumps({"key": key, "spk": spk, "wav": path}) + "\n")
    utt2spk = tmp_path / "utt2spk"
    utt2spk.write_text("".join(f"{k} {s}\n" for k, s, _ in entries))

    base = {
        "data_type": "raw", "train_data": str(raw_list),
        "utt2spk": str(utt2spk), "num_epochs": 1, "log_batch_interval": 5,
        "model": "ECAPA_TDNN",
        "model_args": {"feat_dim": 40, "embed_dim": 32, "channels": 32},
        "projection_args": {"project_type": "arc_margin", "scale": 32.0},
        "optimizer": "SGD", "optimizer_args": {"momentum": 0.9},
        "scheduler_args": {"initial_lr": 0.01, "final_lr": 0.01,
                           "warm_up_epoch": 1},
        "dataset_args": {
            "batch_size": 2, "num_frms": 100, "shuffle": False,
            "speed_perturb": True, "aug_prob": 0.0, "spec_aug": False,
            "fbank_args": {"num_mel_bins": 40, "dither": 0.0},
            "filter_args": {"min_num_frames": 50, "max_num_frames": 200},
        },
        "seed": 7,
    }
    cfg1 = dict(base, exp_dir=str(tmp_path / "exp_base"))
    with open(tmp_path / "c1.yaml", "w") as f:
        yaml.safe_dump(cfg1, f)
    bin_train(str(tmp_path / "c1.yaml"))
    ckpt = tmp_path / "exp_base" / "models" / "model_0.ckpt"
    with open(ckpt, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    assert tree["projection"]["weight"].shape[0] == 9  # 3 spk x 3 speeds

    cfg2 = dict(base, exp_dir=str(tmp_path / "exp_lm"), do_lm=True,
                model_init=str(ckpt),
                margin_scheduler_args={"initial_margin": 0.5,
                                       "final_margin": 0.5,
                                       "increase_start_epoch": 1,
                                       "fix_start_epoch": 1})
    with open(tmp_path / "c2.yaml", "w") as f:
        yaml.safe_dump(cfg2, f)
    state = bin_train(str(tmp_path / "c2.yaml"))
    # classifier kept the 3x rows even though speed perturb was disabled
    assert state.params["projection"]["weight"].shape[0] == 9


@pytest.mark.slow
def test_recipe_lm_chain_and_export(tmp_path):
    """examples/voxceleb/v2/run.sh stages 8-9 off the recipe path
    (reference run.sh:139-163): base train with speed perturb -> average ->
    large-margin fine-tune resuming from the *averaged* checkpoint with a
    ramped-up margin -> export the best model and round-trip the artifact."""
    from flax import serialization

    from wespeaker_tpu.bin.export_model import (export_stablehlo,
                                                load_exported)

    entries = _make_corpus(tmp_path, n_spk=3, n_utt=3, seconds=1.5)
    raw_list = tmp_path / "raw.list"
    with open(raw_list, "w") as f:
        for key, spk, path in entries:
            f.write(json.dumps({"key": key, "spk": spk, "wav": path}) + "\n")
    utt2spk = tmp_path / "utt2spk"
    utt2spk.write_text("".join(f"{k} {s}\n" for k, s, _ in entries))

    base = {
        "data_type": "raw", "train_data": str(raw_list),
        "utt2spk": str(utt2spk), "num_epochs": 2, "log_batch_interval": 5,
        "model": "ECAPA_TDNN",
        "model_args": {"feat_dim": 40, "embed_dim": 32, "channels": 32},
        "projection_args": {"project_type": "arc_margin", "scale": 32.0},
        "optimizer": "SGD", "optimizer_args": {"momentum": 0.9},
        "scheduler_args": {"initial_lr": 0.01, "final_lr": 0.01,
                           "warm_up_epoch": 1},
        "margin_scheduler_args": {"increase_start_epoch": 1,
                                  "fix_start_epoch": 2,
                                  "initial_margin": 0.0,
                                  "final_margin": 0.2},
        "dataset_args": {
            "batch_size": 2, "num_frms": 100, "shuffle": False,
            "speed_perturb": True, "aug_prob": 0.0, "spec_aug": False,
            "fbank_args": {"num_mel_bins": 40, "dither": 0.0},
            "filter_args": {"min_num_frames": 50, "max_num_frames": 200},
        },
        "seed": 7,
    }
    base_exp = tmp_path / "exp_base"
    with open(tmp_path / "base.yaml", "w") as f:
        yaml.safe_dump(dict(base, exp_dir=str(base_exp)), f)
    bin_train(str(tmp_path / "base.yaml"))

    # stage-4 equivalent: average the last two epochs
    avg = average_model(str(base_exp / "models"),
                        str(base_exp / "models" / "avg_model.ckpt"), num=2)

    # stage 9: LM fine-tune resumes from the avg model via `checkpoint=`
    # (avg_model.ckpt carries no epoch number -> start_epoch 0) with the
    # reference's LM margin (0.5 from the start)
    lm_exp = tmp_path / "exp_lm"
    lm_cfg = dict(base, exp_dir=str(lm_exp), do_lm=True, checkpoint=avg,
                  num_epochs=1,
                  margin_scheduler_args={"initial_margin": 0.5,
                                         "final_margin": 0.5,
                                         "increase_start_epoch": 1,
                                         "fix_start_epoch": 1})
    with open(tmp_path / "lm.yaml", "w") as f:
        yaml.safe_dump(lm_cfg, f)
    state = bin_train(str(tmp_path / "lm.yaml"))
    # rows survived the resume (3 spk x 3 speeds), and the LM run actually
    # started from the averaged weights: epoch-0 model exists
    assert state.params["projection"]["weight"].shape[0] == 9
    assert (lm_exp / "models" / "model_0.ckpt").exists()
    with open(avg, "rb") as f:
        avg_tree = serialization.msgpack_restore(f.read())
    # the embedding kernels moved from their initialization (training ran)
    moved = np.abs(
        np.asarray(state.params["model"]["layer1"]["conv"]["kernel"])
        - avg_tree["params"]["layer1"]["conv"]["kernel"]).max()
    assert moved > 0

    # stage 8: export the LM model off the recipe path and round-trip it
    out = export_stablehlo(str(lm_exp / "config.yaml"),
                           str(lm_exp / "models" / "model_0.ckpt"),
                           str(lm_exp / "models" / "final.stablehlo"))
    fn = load_exported(out)
    feats = np.random.default_rng(0).normal(size=(2, 120, 40)) \
        .astype(np.float32)
    emb = np.asarray(fn(feats))
    assert emb.shape == (2, 32)
    assert np.isfinite(emb).all()
