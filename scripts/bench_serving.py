"""Serving-daemon latency/throughput bench (TPU tunnel).

Starts EmbeddingServer in-process with a random-init ECAPA-GLOB-c512, then
drives concurrent POST /embed requests (2 s wavs) from a thread pool and
reports p50/p95/p99 latency and requests/s. One model per invocation (tunnel
compile cost); run under the ambient env.

Usage: PYTHONPATH=. python scripts/bench_serving.py [concurrency] [n_req] [keepalive 0|1]

keepalive=1 reuses one HTTP/1.1 connection per client thread (the server
speaks HTTP/1.1 with Content-Length replies); keepalive=0 opens a fresh
TCP connection per request (the pre-round-5 client behavior). Sweeping
concurrency x keepalive separates the per-request TCP cost from the
2-CPU GIL cost: ThreadingHTTPServer is thread-per-CONNECTION, so with
keep-alive the handler-thread count equals the client count.
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
    keepalive = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False

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

    def one_http():
        req = urllib.request.Request(url, data=body,
                                     headers={"Content-Type": "audio/wav"})
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=300) as resp:
            json.loads(resp.read())
        return time.perf_counter() - t0

    _conn_local = threading.local()

    def one_http_keepalive():
        # one persistent HTTP/1.1 connection per client thread
        import http.client
        conn = getattr(_conn_local, "conn", None)
        if conn is None:
            conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                              timeout=300)
            conn.connect()
            # client-side Nagle delays the body send (headers and body
            # are separate send()s) until the server's delayed ACK —
            # same pathology as the server side (serving.py Handler)
            import socket as _socket
            conn.sock.setsockopt(_socket.IPPROTO_TCP,
                                 _socket.TCP_NODELAY, 1)
            _conn_local.conn = conn
        t0 = time.perf_counter()
        try:
            conn.request("POST", "/embed", body=body,
                         headers={"Content-Type": "audio/wav"})
            json.loads(conn.getresponse().read())
        except (http.client.HTTPException, OSError):
            _conn_local.conn = None  # reconnect next call
            raise
        return time.perf_counter() - t0

    if keepalive:
        one_http = one_http_keepalive

    def one_direct():
        # the batcher without HTTP: same dynamic batching + model dispatch
        t0 = time.perf_counter()
        server.batcher.embed(wav)
        return time.perf_counter() - t0

    def run_phase(count, one):
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

    def pcts(lat):
        ms = np.sort(np.asarray(lat) * 1000)
        return {p: round(float(np.percentile(ms, p)), 1)
                for p in (50, 95, 99)}

    # warmup at full concurrency: compiles every power-of-two batch shape
    # the collator can form (tunnel compiles are ~30-60 s each)
    run_phase(max(conc * 4, 32), one_http)

    # Three-way decomposition (VERDICT r3 item 6): session-level transport
    # swings made absolute HTTP latency unstable round-over-round, so the
    # stable per-session metrics are the SUBTRACTIONS measured in one run:
    #   raw dispatch  = trivial-program round trip (pure transport floor)
    #   direct p50    = batcher.embed() thread-pool latency (batching +
    #                   model compute + dispatch, no HTTP)
    #   http p50      = the full daemon path
    # http - direct = daemon-attributable overhead; direct - dispatch
    # isolates batching+compute from the tunnel.
    import jax
    import jax.numpy as jnp
    tiny = jax.jit(lambda x: x + 1.0)
    z = jax.device_put(jnp.zeros(()))
    _ = float(tiny(z))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = float(tiny(z))
    dispatch_ms = (time.perf_counter() - t0) / 10 * 1e3

    lat_d, wall_d = run_phase(n_req, one_direct)
    lat_h, wall_h = run_phase(n_req, one_http)
    p_d, p_h = pcts(lat_d), pcts(lat_h)
    print(json.dumps({
        "concurrency": conc, "requests": n_req, "keepalive": keepalive,
        "dispatch_floor_ms": round(dispatch_ms, 1),
        "direct_p50_ms": p_d[50], "direct_p95_ms": p_d[95],
        "direct_req_per_s": round(n_req / wall_d, 1),
        "http_p50_ms": p_h[50], "http_p95_ms": p_h[95],
        "http_p99_ms": p_h[99],
        "http_req_per_s": round(n_req / wall_h, 1),
        "daemon_overhead_p50_ms": round(p_h[50] - p_d[50], 1),
        "audio_s_per_s": round(n_req * 2.0 / wall_h, 1),
    }))
    server.close()


if __name__ == "__main__":
    main()
