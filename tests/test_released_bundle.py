"""Released-checkpoint fidelity (BASELINE north star: cos >= 0.999 vs the
reference's published .pt bundles, full wav -> fbank -> model path).

The published bundles (wespeaker/cli/hub.py:87-126) are directories of
config.yaml + avg_model.pt, where avg_model.pt is the *training*
state_dict: model keys PLUS the margin head's `projection.*` rows
(wespeaker/cli/speaker.py:306-335 loads it with strict=False). No network
exists here, so these tests synthesize bundles with that exact layout
around reference torch models and drive them through the real product path
(`load_model_local` -> `Speaker.extract_embedding` on a wav file),
asserting cosine >= 0.999 against the reference torch forward of the same
weights with reference fbank semantics (tests/kaldi_fbank_numpy oracle =
torchaudio.compliance.kaldi.fbank, dither 0)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import yaml  # noqa: E402

from tests.conftest import reference_available
from tests.kaldi_fbank_numpy import fbank_numpy
from tests.torch_ref import build_reference_model, reference_embedding
from wespeaker_tpu.cli.speaker import load_model_local
from wespeaker_tpu.data.wav_io import write_wav

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def _make_wav(tmp_path, seconds=2.0, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    sig = sum(0.2 * np.sin(2 * np.pi * f * t)
              for f in (220.0, 462.5, 991.0))
    sig = sig + rng.normal(0, 0.01, len(t))
    sig = np.clip(sig, -0.99, 0.99).astype(np.float32)
    path = tmp_path / "utt.wav"
    write_wav(path, sig, sr)
    # int16 scale as torchaudio.load(normalize=False) would deliver
    pcm = np.round(sig * (1 << 15)).astype(np.int16).astype(np.float32)
    return str(path), pcm


def _make_bundle(tmp_path, model_name, model_args, ref_model,
                 num_class=17, extras=None):
    """Write a bundle dir with the exact released layout: config.yaml in
    the reference training schema (extra training keys present) and
    avg_model.pt = torch state_dict incl. projection.* rows."""
    sd = {k: v.clone() for k, v in ref_model.state_dict().items()}
    gen = torch.Generator().manual_seed(99)
    emb_dim = model_args["embed_dim"]
    # the margin head rows that training checkpoints carry
    sd["projection.weight"] = torch.randn((num_class, emb_dim),
                                          generator=gen)
    bundle = tmp_path / f"bundle_{model_name}"
    bundle.mkdir()
    torch.save(sd, bundle / "avg_model.pt")
    config = {
        "model": model_name,
        "model_args": dict(model_args),
        # training-config keys the CLI must ignore gracefully
        "projection_args": {"project_type": "arc_margin", "scale": 32.0},
        "margin_update": {"initial_margin": 0.0, "final_margin": 0.2},
        "num_epochs": 150,
        "dataset_args": {"num_frms": 200, "resample_rate": 16000,
                         "speed_perturb": True,
                         "fbank_args": {"num_mel_bins":
                                        model_args["feat_dim"]}},
    }
    config.update(extras or {})
    with open(bundle / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)
    return str(bundle)


def _golden(ref_model, pcm, window_type, wavform_norm, feat_dim):
    wav = pcm / (1 << 15) if wavform_norm else pcm
    feat = fbank_numpy(wav, num_mel=feat_dim, window=window_type)
    feat = feat - feat.mean(axis=0, keepdims=True)
    return reference_embedding(ref_model, feat[None])[0]


def _cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_resnet34_bundle_roundtrip(tmp_path):
    """The 'chinese' asset layout (cnceleb_resnet34.tar.gz): ResNet34,
    hamming window, int16-scale waveform."""
    args = {"feat_dim": 40, "embed_dim": 32}
    ref = build_reference_model("ResNet34", seed=3, **args)
    bundle = _make_bundle(tmp_path, "ResNet34", args, ref)
    wav_path, pcm = _make_wav(tmp_path)

    sp = load_model_local(bundle)
    emb = np.asarray(sp.extract_embedding(wav_path))
    want = _golden(ref, pcm, "hamming", False, 40)
    c = _cos(emb, want)
    assert c >= 0.999, c


def test_campplus_bundle_roundtrip(tmp_path):
    """The 'campplus' asset layout: CAM++ with waveform normalization and
    the povey window (reference cli main(): set_wavform_norm(True),
    set_window_type('povey'))."""
    args = {"feat_dim": 40, "embed_dim": 32}
    ref = build_reference_model("CAMPPlus", seed=5, **args)
    bundle = _make_bundle(tmp_path, "CAMPPlus", args, ref)
    wav_path, pcm = _make_wav(tmp_path, seed=1)

    sp = load_model_local(bundle)
    sp.set_wavform_norm(True)
    sp.set_window_type("povey")
    emb = np.asarray(sp.extract_embedding(wav_path))
    want = _golden(ref, pcm, "povey", True, 40)
    c = _cos(emb, want)
    assert c >= 0.999, c


def test_hub_unpacks_released_archive_layouts(tmp_path, monkeypatch):
    """Released archives nest files one directory deep (hub.py:55-66);
    the downloader must flatten tar.gz AND zip bundles so config.yaml and
    avg_model.pt land directly in the cache dir."""
    import io
    import tarfile
    import zipfile

    from wespeaker_tpu.cli import hub

    # tar.gz with nested dir
    tar_path = tmp_path / "cnceleb_resnet34.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tf:
        for fname, payload in (("config.yaml", b"model: ResNet34\n"),
                               ("avg_model.pt", b"\x00weights")):
            info = tarfile.TarInfo(f"cnceleb_resnet34/{fname}")
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    dest = tmp_path / "cache_tar"
    monkeypatch.setattr(
        hub.urllib.request, "urlretrieve",
        lambda url, target: __import__("shutil").copy(tar_path, target))
    hub.download("http://host/models/cnceleb_resnet34.tar.gz", str(dest))
    assert (dest / "config.yaml").read_text() == "model: ResNet34\n"
    assert (dest / "avg_model.pt").exists()

    # zip (the voxblink2 samresnet assets)
    zip_path = tmp_path / "voxblink2_samresnet34.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.writestr("voxblink2_samresnet34/config.yaml", "model: X\n")
        zf.writestr("voxblink2_samresnet34/avg_model.pt", "w")
    dest2 = tmp_path / "cache_zip"
    monkeypatch.setattr(
        hub.urllib.request, "urlretrieve",
        lambda url, target: __import__("shutil").copy(zip_path, target))
    hub.download("http://host/models/voxblink2_samresnet34.zip", str(dest2))
    assert (dest2 / "config.yaml").read_text() == "model: X\n"
    assert (dest2 / "avg_model.pt").exists()

    # the asset table mirrors the reference's (hub.py:87-95)
    assert set(hub.ASSETS) == {"chinese", "english", "campplus", "eres2net",
                               "vblinkp", "vblinkf", "w2vbert2_mfa"}


def test_bundle_drives_product_surface(tmp_path):
    """The loaded bundle drives the full product surface (similarity,
    register/recognize). Random-init weights aren't discriminative, so
    this asserts the contract shape, not speaker separation (that's the
    quality smoke's job)."""
    args = {"feat_dim": 40, "embed_dim": 32}
    ref = build_reference_model("ResNet34", seed=7, **args)
    bundle = _make_bundle(tmp_path, "ResNet34", args, ref)
    sp = load_model_local(bundle)

    sr = 16000
    t = np.arange(sr * 2) / sr

    def tone(path, f0):
        sig = (0.3 * np.sin(2 * np.pi * f0 * t)
               + 0.1 * np.sin(2 * np.pi * 2.1 * f0 * t)).astype(np.float32)
        write_wav(path, sig, sr)
        return str(path)

    a = tone(tmp_path / "a.wav", 300)
    c = tone(tmp_path / "c.wav", 1400)
    sim = sp.compute_similarity(a, c)
    assert 0.0 <= sim <= 1.0  # reference normalizes cosine to [0, 1]
    sp.register("spk_a", a)
    sp.register("spk_c", c)
    result = sp.recognize(a)
    assert result["name"] in ("spk_a", "spk_c")
    assert 0.0 <= result["confidence"] <= 1.0
