"""Serving-daemon latency/throughput bench (TPU tunnel).

Starts EmbeddingServer in-process with a random-init ECAPA-GLOB-c512, then
drives concurrent POST /embed requests (2 s wavs) from a thread pool and
reports p50/p95/p99 latency and requests/s. One model per invocation (tunnel
compile cost); run under the ambient env.

Usage: PYTHONPATH=. python scripts/bench_serving.py [concurrency] [n_req]
"""

import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    conc = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    import jax
    import jax.numpy as jnp

    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
    from wespeaker_tpu.serving import EmbeddingServer
    from wespeaker_tpu.utils import checkpoint as ckpt

    model = ECAPA_TDNN(channels=512, feat_dim=80, embed_dim=192,
                       global_context_att=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 80)),
                           train=False)
    tmp = tempfile.mkdtemp()
    ckpt_path = os.path.join(tmp, "model.ckpt")
    ckpt.save_checkpoint(ckpt_path, {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {})})
    configs = {
        "model": "ECAPA_TDNN_GLOB_c512",
        "model_args": {"feat_dim": 80, "embed_dim": 192,
                       "pooling_func": "ASTP"},
        "dataset_args": {"resample_rate": 16000,
                         "fbank_args": {"num_mel_bins": 80}},
    }
    server = EmbeddingServer(configs, ckpt_path, host="127.0.0.1", port=0,
                             max_batch=16, max_wait_ms=5.0)
    t = threading.Thread(target=server.httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.port}/embed"

    import io
    import wave

    rng = np.random.default_rng(0)
    wav = rng.uniform(-0.4, 0.4, 32000).astype(np.float32)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((wav * 32767).astype(np.int16).tobytes())
    body = buf.getvalue()

    def one():
        req = urllib.request.Request(url, data=body,
                                     headers={"Content-Type": "audio/wav"})
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=300) as resp:
            json.loads(resp.read())
        return time.perf_counter() - t0

    def run_phase(count):
        lat = []
        lock = threading.Lock()
        work = list(range(count))

        def worker():
            while True:
                with lock:
                    if not work:
                        return
                    work.pop()
                dt = one()
                with lock:
                    lat.append(dt)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=worker) for _ in range(conc)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        return lat, time.perf_counter() - t0

    # warmup at full concurrency: compiles every power-of-two batch shape
    # the collator can form (tunnel compiles are ~30-60 s each)
    run_phase(max(conc * 4, 32))
    lat, wall = run_phase(n_req)
    lat_ms = np.sort(np.asarray(lat) * 1000)
    print(json.dumps({
        "concurrency": conc, "requests": n_req,
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
        "req_per_s": round(n_req / wall, 1),
        "audio_s_per_s": round(n_req * 2.0 / wall, 1),
    }))
    server.close()


if __name__ == "__main__":
    main()
