"""Data-prep tools and StableHLO export tests."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import yaml  # noqa: E402

from wespeaker_tpu.bin import prep_data
from wespeaker_tpu.data.wav_io import write_wav


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.default_rng(0)
    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    wav_scp, utt2spk = [], []
    for spk in range(3):
        for utt in range(3):
            key = f"s{spk}u{utt}"
            p = wav_dir / f"{key}.wav"
            write_wav(p, rng.uniform(-0.3, 0.3, 16000).astype(np.float32),
                      16000)
            wav_scp.append(f"{key} {p}")
            utt2spk.append(f"{key} spk{spk}")
    (tmp_path / "wav.scp").write_text("\n".join(wav_scp) + "\n")
    (tmp_path / "utt2spk").write_text("\n".join(utt2spk) + "\n")
    return tmp_path


def test_make_raw_list(corpus):
    out = corpus / "raw.list"
    n = prep_data.make_raw_list(str(corpus / "wav.scp"),
                                str(corpus / "utt2spk"), str(out))
    assert n == 9
    import json
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert lines[0]["spk"] == "spk0"


def test_make_shard_list_and_dataset(corpus):
    shards_list = corpus / "shards.list"
    paths = prep_data.make_shard_list(
        str(corpus / "wav.scp"), str(corpus / "utt2spk"),
        str(corpus / "shards"), str(shards_list), num_utts_per_shard=4,
        num_threads=1)
    assert len(paths) == 3
    from wespeaker_tpu.data.pipeline import parse_shard, read_lists
    samples = list(parse_shard(read_lists(str(shards_list))))
    assert len(samples) == 9
    assert samples[0]["wav"].shape == (16000,)


def test_wav2dur_and_calibration_trials(corpus):
    total = prep_data.wav2dur(str(corpus / "wav.scp"), str(corpus / "dur"))
    assert total == pytest.approx(9.0, rel=1e-3)
    trials = prep_data.generate_calibration_trial(
        str(corpus / "utt2spk"), str(corpus / "trials"), 20, 20)
    lines = open(trials).read().splitlines()
    assert len(lines) == 40
    assert sum(1 for l in lines if l.endswith(" target")) == 20


def test_stablehlo_export_roundtrip(tmp_path):
    from wespeaker_tpu.bin.export_model import export_stablehlo, load_exported
    from wespeaker_tpu.models import get_speaker_model
    from wespeaker_tpu.utils.checkpoint import save_checkpoint

    configs = {"model": "ECAPA_TDNN",
               "model_args": {"feat_dim": 40, "embed_dim": 32,
                              "channels": 32}}
    model = get_speaker_model("ECAPA_TDNN")(**configs["model_args"])
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 40)))
    ckpt = tmp_path / "m.ckpt"
    save_checkpoint(str(ckpt), {"params": variables["params"],
                                "batch_stats": variables["batch_stats"]})
    cfg_path = tmp_path / "c.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(configs, f)

    out = tmp_path / "model.stablehlo"
    export_stablehlo(str(cfg_path), str(ckpt), str(out))
    assert os.path.getsize(out) > 1000

    fn = load_exported(str(out))
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(3, 77, 40)).astype(np.float32))
    emb = np.asarray(fn(x))
    want = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(emb, want, atol=1e-5)
    # dynamic shapes: different B and T work with the same artifact
    x2 = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 123, 40)).astype(np.float32))
    assert np.asarray(fn(x2)).shape == (1, 32)


def test_mnn_export_handoff(tmp_path, capsys):
    """--format mnn: emits the ONNX input and drives MNNConvert when
    present (reference wespeaker/bin/export_mnn.py:66-77); in this
    toolchain (no MNN) it must still write the ONNX artifact and print
    the exact conversion command."""
    from wespeaker_tpu.bin.export_model import export_mnn
    from wespeaker_tpu.export import onnx_numpy
    from wespeaker_tpu.models import get_speaker_model
    from wespeaker_tpu.utils.checkpoint import save_checkpoint

    configs = {"model": "ECAPA_TDNN",
               "model_args": {"feat_dim": 40, "embed_dim": 32,
                              "channels": 32}}
    model = get_speaker_model("ECAPA_TDNN")(**configs["model_args"])
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 40)))
    ckpt = tmp_path / "m.ckpt"
    save_checkpoint(str(ckpt), {"params": variables["params"],
                                "batch_stats": variables["batch_stats"]})
    cfg_path = tmp_path / "c.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(configs, f)

    out = tmp_path / "model.mnn"
    res, cmd = export_mnn(str(cfg_path), str(ckpt), str(out),
                          num_frames=200)
    onnx_path = tmp_path / "model.onnx"
    assert onnx_path.exists()
    assert cmd[:4] == ["MNNConvert", "-f", "ONNX", "--modelFile"]
    assert "--saveStaticModel" in cmd  # num_frames > 0, reference :68-70
    # the emitted ONNX input actually runs
    feats = np.random.default_rng(0).normal(size=(1, 50, 40)) \
        .astype(np.float32)
    got = onnx_numpy.run(onnx_path.read_bytes(), {"feats": feats})["embs"]
    want = np.asarray(model.apply(variables, jnp.asarray(feats),
                                  train=False))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
