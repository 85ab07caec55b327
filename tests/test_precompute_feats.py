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

    # hidden-states container: last / avg / index
    class Out:
        hidden_states = [torch.ones(1, 5, 3) * i for i in range(4)]

    assert _to_tf(Out(), "last").mean() == 3.0
    assert _to_tf(Out(), "avg").mean() == 1.5
    assert _to_tf(Out(), "1").mean() == 1.0
    with pytest.raises(SystemExit):
        make_frontend_fn("nope", "x")
