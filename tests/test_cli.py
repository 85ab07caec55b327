"""CLI product-API test: train a tiny model dir, then exercise Speaker."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import yaml  # noqa: E402

from wespeaker_tpu.cli.speaker import Speaker
from wespeaker_tpu.data.wav_io import write_wav
from wespeaker_tpu.models import get_speaker_model
from wespeaker_tpu.utils.checkpoint import save_checkpoint


@pytest.fixture()
def model_dir(tmp_path):
    configs = {
        "model": "ECAPA_TDNN",
        "model_args": {"feat_dim": 40, "embed_dim": 64, "channels": 64},
    }
    model = get_speaker_model("ECAPA_TDNN")(**configs["model_args"])
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 40)))
    d = tmp_path / "model"
    d.mkdir()
    with open(d / "config.yaml", "w") as f:
        yaml.safe_dump(configs, f)
    save_checkpoint(str(d / "avg_model.ckpt"),
                    {"params": variables["params"],
                     "batch_stats": variables.get("batch_stats", {})})
    return str(d)


def _tone(path, freq, seconds=2.0, sr=16000):
    t = np.arange(int(sr * seconds)) / sr
    sig = 0.3 * np.sin(2 * np.pi * freq * t) * (
        0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
    write_wav(path, sig.astype(np.float32), sr)
    return str(path)


def test_speaker_api(model_dir, tmp_path):
    spk = Speaker(model_dir)
    a = _tone(tmp_path / "a.wav", 300)
    b = _tone(tmp_path / "b.wav", 310)
    c = _tone(tmp_path / "c.wav", 1200)

    emb = spk.extract_embedding(a)
    assert emb.shape == (64,)

    sim_ab = spk.compute_similarity(a, b)
    sim_ac = spk.compute_similarity(a, c)
    assert 0.0 <= sim_ac <= 1.0 and 0.0 <= sim_ab <= 1.0

    spk.register("alice", a)
    spk.register("carol", c)
    result = spk.recognize(b)
    assert result["name"] in ("alice", "carol")
    assert result["confidence"] > 0

    scp = tmp_path / "wav.scp"
    scp.write_text(f"utt_a {a}\nutt_c {c}\n")
    names, embs = spk.extract_embedding_list(str(scp))
    assert names == ["utt_a", "utt_c"]
    assert embs[0].shape == (64,)

    merged = spk.diarize(a, utt="rec1")
    assert isinstance(merged, list)

    # batched embeddings from precomputed fbank windows; padding path
    fb = [np.random.default_rng(i).normal(size=(150, 40)).astype(np.float32)
          for i in range(5)]
    embs5 = spk.extract_embedding_from_feats(fb, batch_size=2)
    assert embs5.shape == (5, 64)
    one = spk.extract_embedding_from_feats(fb[:1], batch_size=2)
    np.testing.assert_allclose(one[0], embs5[0], atol=1e-5)


def test_diarize_data_parallel_matches_single(model_dir, tmp_path):
    """diarize --data_parallel shards subsegment batches over the 8 virtual
    devices and must produce the same RTTM as the single-device run."""
    from wespeaker_tpu.bin.diarize import diarize

    assert len(jax.devices()) == 8
    wav = tmp_path / "rec.wav"
    t = np.arange(16000 * 12) / 16000.0
    seg = (t // 3).astype(int) % 2
    sig = 0.3 * np.sin(2 * np.pi * np.where(seg == 0, 220, 900) * t)
    write_wav(wav, sig.astype(np.float32), 16000)
    scp = tmp_path / "wav.scp"
    scp.write_text(f"rec {wav}\n")

    out1, _ = diarize(model_dir + "/config.yaml",
                      model_dir + "/avg_model.ckpt", str(scp),
                      str(tmp_path / "a.rttm"), batch_size=8)
    out2, _ = diarize(model_dir + "/config.yaml",
                      model_dir + "/avg_model.ckpt", str(scp),
                      str(tmp_path / "b.rttm"), batch_size=8,
                      data_parallel=True)
    def parse(path):
        segs, mapping = [], {}
        for ln in open(path):
            p = ln.split()
            lab = mapping.setdefault(p[7], len(mapping))  # canonical ids
            segs.append((p[1], p[3], p[4], lab))
        return segs

    # k-means label ids are not deterministic; compare boundaries and
    # labels up to permutation (first-appearance canonical order)
    assert parse(out1) == parse(out2)
    assert open(out1).read().startswith("SPEAKER rec")


def test_extract_data_parallel_matches_single(model_dir, tmp_path):
    """--data_parallel shards eval batches over the 8 virtual devices and
    must reproduce the single-device embeddings (incl. the replicated-row
    padding path when the last bucket isn't divisible by n_devices)."""
    import json

    from wespeaker_tpu.bin.extract import extract
    from wespeaker_tpu.utils.kaldi_io import read_vec_scp_dict

    assert len(jax.devices()) == 8  # conftest virtual CPU mesh
    raw = tmp_path / "raw.list"
    with open(raw, "w") as f:
        for i in range(11):  # 11 % 8 != 0 -> exercises batch padding
            p = _tone(tmp_path / f"u{i}.wav", 200 + 40 * i,
                      seconds=1.5 + 0.1 * i)
            f.write(json.dumps({"key": f"u{i}", "wav": p,
                                "spk": f"s{i % 3}"}) + "\n")

    common = dict(config=os.path.join(model_dir, "config.yaml"),
                  checkpoint_path=os.path.join(model_dir, "avg_model.ckpt"),
                  data_list=str(raw), batch_size=16)
    one = read_vec_scp_dict(extract(
        out_prefix=str(tmp_path / "emb_one"), **common))
    dp = read_vec_scp_dict(extract(
        out_prefix=str(tmp_path / "emb_dp"), data_parallel=True, **common))
    assert one.keys() == dp.keys() and len(one) == 11
    for k in one:
        np.testing.assert_allclose(dp[k], one[k], atol=2e-5, rtol=1e-5)
