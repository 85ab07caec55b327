"""Serving CLI: config + checkpoint -> HTTP embedding daemon.

Role parity: runtime/server Triton deployment (feature_extractor +
speaker_model ensemble) — here one TPU process with dynamic batching
(wespeaker_tpu/serving.py).
"""

import argparse
import logging

from wespeaker_tpu.serving import EmbeddingServer
from wespeaker_tpu.utils.config import parse_config_or_kwargs


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8086)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)
    configs = parse_config_or_kwargs(args.config, args.overrides)
    server = EmbeddingServer(configs, args.checkpoint, host=args.host,
                             port=args.port, max_batch=args.max_batch,
                             max_wait_ms=args.max_wait_ms)
    logging.info("serving on %s:%d (POST /embed, /similarity; GET /health)",
                 args.host, server.port)
    try:
        server.httpd.serve_forever()
    except KeyboardInterrupt:
        server.close()


if __name__ == "__main__":
    main()
