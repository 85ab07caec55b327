"""bin/precompute_feats.py: the supported path for s3prl upstreams with no
native TPU port (reference wespeaker/frontend/s3prl.py:23-93 accepts any
upstream; frontend/ssl_frontends.py documents the native matrix). A
scripted torch.jit stand-in frontend runs through the CLI, and the emitted
kaldi 'FM' feats must round-trip through the training pipeline's
data_type=feat reader bit-exactly."""

import json
import os
import wave

import numpy as np
import pytest

torch = pytest.importorskip("torch")

SR = 16000


class FrameEnergyFrontend(torch.nn.Module):
    """wav (1, N) -> (1, T, 4): per-160-sample frame [mean, abs-mean,
    square-mean, max] — deterministic nontrivial features."""

    def forward(self, x):
        n = x.shape[1] // 160
        f = x[:, :n * 160].reshape(1, n, 160)
        return torch.stack([f.mean(-1), f.abs().mean(-1),
                            (f * f).mean(-1), f.max(-1).values], dim=-1)


def _write_wav(path, sig):
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((np.clip(sig, -1, 1) * 32767).astype(
            np.int16).tobytes())


@pytest.fixture
def corpus(tmp_path):
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        sig = (0.3 * rng.standard_normal(SR + i * 800)).astype(np.float32)
        p = str(tmp_path / f"u{i}.wav")
        _write_wav(p, sig)
        lines.append(json.dumps({"key": f"u{i}", "wav": p,
                                 "spk": f"s{i % 2}"}))
    lst = str(tmp_path / "raw.list")
    with open(lst, "w") as f:
        f.write("\n".join(lines) + "\n")
    return lst


def test_torchjit_backend_roundtrips_through_feat_pipeline(corpus,
                                                           tmp_path):
    from wespeaker_tpu.bin.precompute_feats import precompute
    from wespeaker_tpu.data.pipeline import parse_feat

    m = torch.jit.script(FrameEnergyFrontend())
    mp = str(tmp_path / "frontend.pt")
    m.save(mp)
    prefix = str(tmp_path / "feats")
    ark, scp = precompute(corpus, prefix, "torchjit", mp)
    assert os.path.exists(ark) and os.path.exists(scp)

    # the training pipeline's feat reader sees exactly the module output
    utt2spk = {f"u{i}": f"s{i % 2}" for i in range(4)}
    with open(scp) as f:
        got = {s["key"]: s["feat"] for s in parse_feat(f, utt2spk)}
    assert set(got) == set(utt2spk)
    with open(corpus) as f:
        for line in f:
            obj = json.loads(line)
            with wave.open(obj["wav"], "rb") as w:
                wav = (np.frombuffer(w.readframes(w.getnframes()),
                                     dtype="<i2").astype(np.float32)
                       / 32768.0)
            want = m(torch.from_numpy(wav[None])).numpy()[0]
            np.testing.assert_array_equal(got[obj["key"]], want)
            assert want.shape[1] == 4 and want.shape[0] == len(wav) // 160


def test_layer_selection_and_bad_backend(tmp_path):
    from wespeaker_tpu.bin.precompute_feats import _to_tf, make_frontend_fn

    # hidden-states container: last / avg / index / all
    class Out:
        hidden_states = [torch.ones(1, 5, 3) * i for i in range(4)]

    assert _to_tf(Out(), "last").mean() == 3.0
    assert _to_tf(Out(), "avg").mean() == 1.5
    assert _to_tf(Out(), "1").mean() == 1.0
    stacked = _to_tf(Out(), "all")
    assert stacked.shape == (5, 12)  # (T, L*D) feature-axis concat
    np.testing.assert_array_equal(stacked[:, 3:6], np.ones((5, 3)))
    with pytest.raises(SystemExit):
        make_frontend_fn("nope", "x")


class MultiLayerFrontend(torch.nn.Module):
    """wav (1, N) -> list of 3 hidden states (1, T, 4): the frame-energy
    features at three deterministic per-layer scalings."""

    def forward(self, x):
        n = x.shape[1] // 160
        f = x[:, :n * 160].reshape(1, n, 160)
        base = torch.stack([f.mean(-1), f.abs().mean(-1),
                            (f * f).mean(-1), f.max(-1).values], dim=-1)
        return [base, base * 2.0, base - 1.0]


def test_feat_stack_trains_layer_weights_and_extracts(corpus, tmp_path):
    """--layer all + frontend=feat_stack: the Featurizer layer weights
    train jointly with the speaker model (the reference's in-loop s3prl
    weighting, frontend/s3prl.py:50-66) and extraction runs from the same
    precomputed feats."""
    from wespeaker_tpu.bin.precompute_feats import precompute

    m = torch.jit.script(MultiLayerFrontend())
    mp = str(tmp_path / "frontend.pt")
    m.save(mp)
    prefix = str(tmp_path / "feats_all")
    ark, scp = precompute(corpus, prefix, "torchjit", mp, layer="all")

    utt2spk_path = str(tmp_path / "utt2spk")
    with open(utt2spk_path, "w") as f:
        for i in range(4):
            f.write(f"u{i} s{i % 2}\n")

    import yaml
    config = {
        "exp_dir": str(tmp_path / "exp"),
        "data_type": "feat",
        "train_data": scp,
        "utt2spk": utt2spk_path,
        "num_epochs": 1,
        "samples_per_epoch": 8,
        "log_batch_interval": 1,
        "model": "ECAPA_TDNN",
        "model_args": {"feat_dim": 4, "embed_dim": 16, "channels": 16},
        "projection_args": {"project_type": "arc_margin", "scale": 32.0},
        "dataset_args": {
            "batch_size": 4,
            "num_frms": 40,
            "shuffle": False,
            "frontend": "feat_stack",
            "feat_stack_args": {"num_layers": 3},
            "filter_args": {"min_num_frames": 10, "max_num_frames": 1000},
        },
    }
    cfg = str(tmp_path / "train.yaml")
    with open(cfg, "w") as f:
        yaml.safe_dump(config, f)

    from wespeaker_tpu.bin.train import train
    train(cfg)

    from wespeaker_tpu.utils.checkpoint import load_checkpoint
    ckpt_path = str(tmp_path / "exp" / "models" / "final_model.ckpt")
    loaded = load_checkpoint(ckpt_path, None)
    flat = {"/".join(str(k) for k in path): v for path, v
            in _tree_leaves_with_path(loaded["params"])}
    wkeys = [k for k in flat if "featurizer" in k and "weights" in k]
    assert wkeys, sorted(flat)[:20]
    w = np.asarray(flat[wkeys[0]])
    assert w.shape == (3,)
    assert np.abs(w).max() > 0  # zeros-init weights actually trained

    # extraction consumes the SAME precomputed feat scp
    from wespeaker_tpu.bin.extract import extract
    out_prefix = str(tmp_path / "emb")
    extract(str(tmp_path / "exp" / "config.yaml"), ckpt_path, scp,
            out_prefix, batch_size=4)
    from wespeaker_tpu.utils.kaldi_io import read_vec_scp_dict
    embs = read_vec_scp_dict(out_prefix + ".scp")
    assert set(embs) == {f"u{i}" for i in range(4)}
    for v in embs.values():
        assert v.shape == (16,) and np.isfinite(v).all()


def _tree_leaves_with_path(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_leaves_with_path(v, prefix + (k,))
    else:
        yield prefix, tree
