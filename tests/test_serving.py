"""Serving daemon tests: dynamic batching correctness + HTTP surface.

Role parity target: runtime/server (Triton ensemble) — here the collator
must produce embeddings identical to the direct masked-eval path for
concurrent, different-length requests.
"""

import concurrent.futures
import json
import urllib.request

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wespeaker_tpu.frontend import FbankConfig
from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
from wespeaker_tpu.serving import DynamicBatcher, EmbeddingServer
from wespeaker_tpu.train import make_eval_embed_fn


@pytest.fixture(scope="module")
def embed_setup():
    model = ECAPA_TDNN(channels=32, feat_dim=40, embed_dim=32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 40)),
                           train=False)
    fn = jax.jit(make_eval_embed_fn(model, FbankConfig(num_mel_bins=40,
                                                       dither=0.0)))

    def embed(wavs, mask):
        return fn(variables, {"wav": wavs, "mask": mask})

    return embed


def test_batcher_matches_direct(embed_setup):
    """Concurrent different-length requests through the batcher must equal
    the single-utterance masked path."""
    batcher = DynamicBatcher(embed_setup, max_batch=8, max_wait_ms=30,
                             quantum_samples=8000)
    rng = np.random.default_rng(0)
    wavs = [rng.uniform(-0.5, 0.5, n).astype(np.float32)
            for n in (12000, 17000, 23000, 31000)]
    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        got = list(ex.map(batcher.embed, wavs))
    batcher.close()

    for wav, emb in zip(wavs, got):
        padded = -(-len(wav) // 8000) * 8000
        w = np.zeros((1, padded), np.float32)
        m = np.zeros((1, padded), np.float32)
        w[0, :len(wav)] = wav
        m[0, :len(wav)] = 1.0
        want = np.asarray(embed_setup(w, m))[0]
        cos = np.dot(emb, want) / (np.linalg.norm(emb)
                                   * np.linalg.norm(want))
        assert cos > 0.9999, cos


def test_http_endpoints(embed_setup, tmp_path):
    from wespeaker_tpu.data.wav_io import write_wav

    server = EmbeddingServer({}, "", port=0, embed_fn=embed_setup,
                             max_wait_ms=2).start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        with urllib.request.urlopen(f"{base}/health") as r:
            assert json.load(r)["status"] == "ok"

        rng = np.random.default_rng(1)
        wav = rng.uniform(-0.5, 0.5, 16000).astype(np.float32)
        # JSON body
        req = urllib.request.Request(
            f"{base}/embed",
            data=json.dumps({"wav": wav.tolist(),
                             "sample_rate": 16000}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            emb_json = np.asarray(json.load(r)["embedding"])
        assert emb_json.shape == (32,)

        # RIFF wav body -> same embedding (up to PCM16 quantization)
        write_wav(tmp_path / "a.wav", wav, 16000)
        req = urllib.request.Request(
            f"{base}/embed", data=(tmp_path / "a.wav").read_bytes(),
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req) as r:
            emb_wav = np.asarray(json.load(r)["embedding"])
        cos = np.dot(emb_json, emb_wav) / (
            np.linalg.norm(emb_json) * np.linalg.norm(emb_wav))
        assert cos > 0.999

        # similarity of an utterance with itself ~ 1.0 (engine scale [0,1])
        req = urllib.request.Request(
            f"{base}/similarity",
            data=json.dumps({"wav1": wav.tolist(),
                             "wav2": wav.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            assert json.load(r)["similarity"] == pytest.approx(1.0,
                                                               abs=1e-4)
    finally:
        server.close()


def test_http_diarize_endpoint(embed_setup):
    """/diarize returns speaker segments via a feats->embedding diarizer;
    servers without one return 501."""
    from wespeaker_tpu.diar.pipeline import diarize_wav
    from wespeaker_tpu.frontend import FbankConfig

    model = ECAPA_TDNN(channels=32, feat_dim=40, embed_dim=32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 40)),
                           train=False)
    feats_fwd = jax.jit(lambda f: model.apply(variables, f, train=False))

    def diarize_fn(wav, sr):
        def embed_batch(banks):
            return np.asarray(feats_fwd(jnp.asarray(banks)))
        merged, _ = diarize_wav(
            "utt", wav, sr, embed_batch,
            fbank_cfg=FbankConfig(num_mel_bins=40, dither=0.0),
            clusterer="spectral", num_spks=2)
        return merged

    server = EmbeddingServer({}, "", port=0, embed_fn=embed_setup,
                             diarize_fn=diarize_fn, max_wait_ms=2).start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        rng = np.random.default_rng(3)
        t = np.arange(4 * 16000) / 16000.0
        wav = np.where(t < 2.0,
                       0.3 * np.sin(2 * np.pi * 220 * t),
                       0.3 * np.sin(2 * np.pi * 880 * t))
        wav = (wav + rng.normal(0, 0.01, len(t))).astype(np.float32)
        req = urllib.request.Request(
            f"{base}/diarize",
            data=json.dumps({"wav": wav.tolist(),
                             "sample_rate": 16000}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            segs = json.load(r)["segments"]
        assert segs, "no segments returned"
        for s in segs:
            assert 0.0 <= s["begin"] < s["end"] <= 4.1
    finally:
        server.close()

    # no diarizer -> 501
    server = EmbeddingServer({}, "", port=0, embed_fn=embed_setup,
                             max_wait_ms=2).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/diarize",
            data=json.dumps({"wav": [0.0] * 1600,
                             "sample_rate": 16000}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 501
    finally:
        server.close()


def test_server_resamples_to_model_rate():
    """A model trained at 8 kHz (sre recipes) must receive 8 kHz audio:
    the server resamples request audio to dataset_args.resample_rate."""
    seen = {}

    def capture_embed(wavs, mask):
        seen["n"] = int(mask[0].sum())
        return np.ones((wavs.shape[0], 8), np.float32)

    cfg = {"dataset_args": {"resample_rate": 8000}}
    server = EmbeddingServer(cfg, "", port=0, embed_fn=capture_embed,
                             max_wait_ms=2).start()
    try:
        wav = np.random.default_rng(0).uniform(
            -0.5, 0.5, 16000).astype(np.float32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/embed",
            data=json.dumps({"wav": wav.tolist(),
                             "sample_rate": 16000}).encode(),
            headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req, timeout=30).read()
        assert abs(seen["n"] - 8000) <= 16, seen  # 1 s at the model rate
    finally:
        server.close()


def test_batcher_close_unblocks_and_rejects():
    """close() must fail queued waiters and later embed() calls instead of
    hanging them."""
    import time as _time

    def slow_embed(wavs, mask):
        _time.sleep(0.2)
        return np.zeros((wavs.shape[0], 4), np.float32)

    b = DynamicBatcher(slow_embed, max_batch=2, max_wait_ms=1,
                       quantum_samples=800)
    with concurrent.futures.ThreadPoolExecutor(3) as ex:
        futs = [ex.submit(b.embed, np.zeros(800, np.float32))
                for _ in range(3)]
        _time.sleep(0.05)
        b.close()
        done = sum(1 for f in futs if not isinstance(
            f.exception(timeout=10), type(None)) or f.result() is not None)
    assert done == 3  # every request either answered or errored, none hung
    with pytest.raises(RuntimeError):
        b.embed(np.zeros(800, np.float32))


def test_listen_backlog_survives_connect_burst():
    """socketserver's default listen backlog of 5 dropped SYNs under a
    16-client connect burst (measured 3-4 s p99 retransmit tails,
    docs/PERF.md round 4); make_server must raise it."""
    from wespeaker_tpu.serving import DynamicBatcher, make_server

    b = DynamicBatcher(
        lambda wavs, mask: np.zeros((wavs.shape[0], 4), np.float32),
        max_batch=4, max_wait_ms=1, quantum_samples=800)
    srv = make_server(b, port=0)
    try:
        assert srv.request_queue_size >= 64, srv.request_queue_size
    finally:
        srv.server_close()
        b.close()
