"""C++ deployment runtime tests: build via cmake, then validate the native
fbank against the jnp implementation and exercise the engine (chunking +
CMN + callback backend + cosine)."""

import shutil
import subprocess

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wespeaker_tpu.frontend import FbankConfig, compute_fbank

cmake = shutil.which("cmake")
pytestmark = pytest.mark.skipif(cmake is None, reason="cmake not available")


@pytest.fixture(scope="module")
def lib():
    from wespeaker_tpu import runtime_binding as rb
    try:
        rb.build_runtime()
    except subprocess.CalledProcessError as e:
        pytest.fail(f"runtime build failed: {e.stderr}")
    return rb


def test_native_fbank_matches_jnp(lib):
    rng = np.random.default_rng(0)
    wav = (rng.uniform(-0.5, 0.5, 32240) * (1 << 15)).astype(np.float32)
    native = lib.NativeFbank(num_bins=80)(wav)
    ref = np.asarray(compute_fbank(jnp.asarray(wav), FbankConfig()))
    assert native.shape == ref.shape
    np.testing.assert_allclose(native, ref, atol=2e-3, rtol=1e-3)


def test_native_fbank_povey_window(lib):
    rng = np.random.default_rng(1)
    wav = (rng.uniform(-0.5, 0.5, 16000) * (1 << 15)).astype(np.float32)
    native = lib.NativeFbank(num_bins=40, window_type="povey")(wav)
    ref = np.asarray(compute_fbank(
        jnp.asarray(wav), FbankConfig(num_mel_bins=40, window_type="povey")))
    np.testing.assert_allclose(native, ref, atol=2e-3, rtol=1e-3)


def test_engine_chunking_and_cosine(lib):
    rng = np.random.default_rng(2)
    # 3.3s -> 328 frames = 1 full 198 chunk + head-padded remainder
    wav = (rng.uniform(-0.5, 0.5, 16000 * 3 + 4800) * (1 << 15)).astype(
        np.float32)
    engine = lib.NativeEngine(feat_dim=40)
    emb = engine.extract(wav)
    assert emb.shape == (40,)
    assert np.isfinite(emb).all()
    sim_self = engine.cosine(emb, emb)
    assert sim_self == pytest.approx(1.0, abs=1e-5)
    other = engine.extract(
        (rng.uniform(-0.5, 0.5, 16000 * 2) * (1 << 15)).astype(np.float32))
    assert 0.0 <= engine.cosine(emb, other) <= 1.0


def test_engine_callback_backend_bridges_jax_model(lib):
    """The production path: C++ engine DSP + jitted flax model backend."""
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN

    model = ECAPA_TDNN(channels=32, feat_dim=40, embed_dim=32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 40)))
    fwd = jax.jit(lambda feats: model.apply(variables, feats, train=False))

    def embed_fn(feats):
        return np.asarray(fwd(jnp.asarray(feats[None])))[0]

    engine = lib.NativeEngine(feat_dim=40, embed_fn=embed_fn, embed_dim=32)
    rng = np.random.default_rng(3)
    wav = (rng.uniform(-0.5, 0.5, 32240) * (1 << 15)).astype(np.float32)
    emb = engine.extract(wav)
    assert emb.shape == (32,)
    assert np.isfinite(emb).all()
    assert np.abs(emb).sum() > 0


def test_extract_emb_binary(lib, tmp_path):
    import os
    from wespeaker_tpu.data.wav_io import write_wav

    exe = os.path.join(lib.BUILD_DIR, "extract_emb_main")
    assert os.path.exists(exe)
    rng = np.random.default_rng(0)
    scp = tmp_path / "wav.scp"
    lines = []
    for i in range(3):
        p = tmp_path / f"u{i}.wav"
        write_wav(p, rng.uniform(-0.5, 0.5, 16000 * 2).astype(np.float32),
                  16000)
        lines.append(f"u{i} {p}")
    scp.write_text("\n".join(lines) + "\n")
    out = tmp_path / "emb.txt"
    res = subprocess.run([exe, str(scp), str(out), "40", "16000", "198", "2"],
                         capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    assert "RTF" in res.stderr
    got = out.read_text().strip().splitlines()
    assert len(got) == 3
    assert len(got[0].split()) == 41  # key + 40 dims


def test_streaming_feature_pipeline(lib):
    """Chunked streaming must equal one-shot fbank."""
    rng = np.random.default_rng(4)
    wav = (rng.uniform(-0.5, 0.5, 16000) * (1 << 15)).astype(np.float32)
    one_shot = lib.NativeFbank(num_bins=40)(wav)

    pipe = lib.NativePipeline(num_bins=40)
    for i in range(0, len(wav), 1000):  # odd chunking vs frame shift
        pipe.accept(wav[i:i + 1000])
    pipe.finish()
    frames = pipe.read(one_shot.shape[0])
    assert frames.shape == one_shot.shape
    np.testing.assert_allclose(frames, one_shot, atol=1e-4)
    # drained + finished -> short read
    assert pipe.read(5).shape[0] == 0


def test_asv_main_binary(lib, tmp_path):
    """enroll/test wav -> score + ACCEPT/REJECT (reference asv_main.cc)."""
    import os

    from wespeaker_tpu.data.wav_io import write_wav

    rng = np.random.default_rng(4)
    a = rng.uniform(-0.5, 0.5, 32000).astype(np.float32)
    write_wav(tmp_path / "a.wav", a, 16000)
    write_wav(tmp_path / "b.wav", rng.uniform(-0.5, 0.5, 32000)
              .astype(np.float32), 16000)
    binary = os.path.join(lib.BUILD_DIR, "asv_main")
    # same wav: score ~1.0 -> ACCEPT (exit 0)
    r = subprocess.run([binary, str(tmp_path / "a.wav"),
                        str(tmp_path / "a.wav"), "0.9", "40"],
                       capture_output=True, text=True)
    assert r.returncode == 0 and "ACCEPT" in r.stdout, r.stdout
    # impossible threshold -> REJECT (exit 2)
    r = subprocess.run([binary, str(tmp_path / "a.wav"),
                        str(tmp_path / "b.wav"), "1.1", "40"],
                       capture_output=True, text=True)
    assert r.returncode == 2 and "REJECT" in r.stdout, r.stdout
