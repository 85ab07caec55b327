"""Probe the tunnel chip: device kind, achievable bf16 matmul TFLOP/s, and
HBM stream bandwidth — anchors for every speed-of-light claim in
docs/PERF.md. Uses the dispatch-floor-proof loop timer."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from wespeaker_tpu.utils.bench_timing import time_fn_on_device
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()

    dev = jax.devices()[0]
    info = {"platform": dev.platform, "device_kind": dev.device_kind}
    try:
        info["memory_stats_bytes_limit"] = dev.memory_stats().get(
            "bytes_limit")
    except Exception:
        pass

    n = 4096
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    mm = jax.jit(lambda d: {"a": jax.lax.dot(
        d["a"], b, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)})
    dt = time_fn_on_device(mm, {"a": a}, iters=50)
    info["bf16_matmul_tflops"] = round(2 * n ** 3 / dt / 1e12, 1)

    if "--big" in sys.argv:
        n2 = 8192
        a2 = jnp.asarray(rng.normal(size=(n2, n2)).astype(np.float32)
                         ).astype(jnp.bfloat16)
        b2 = jnp.asarray(rng.normal(size=(n2, n2)).astype(np.float32)
                         ).astype(jnp.bfloat16)
        mm2 = jax.jit(lambda d: {"a": jax.lax.dot(
            d["a"], b2, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)})
        dt = time_fn_on_device(mm2, {"a": a2}, iters=30)
        info["bf16_matmul8192_tflops"] = round(2 * n2 ** 3 / dt / 1e12, 1)

    if "--mfa" in sys.argv:
        # the exact MFA conv shape at B=512: (B*T, 1536) @ (1536, 1536)
        am = jnp.asarray(rng.normal(size=(102400, 1536)).astype(np.float32)
                         ).astype(jnp.bfloat16)
        bm_ = jnp.asarray(rng.normal(size=(1536, 1536)).astype(np.float32)
                          ).astype(jnp.bfloat16)
        mmm = jax.jit(lambda d: {"a": jax.lax.dot(
            d["a"], bm_, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)})
        dt = time_fn_on_device(mmm, {"a": am}, iters=30)
        info["bf16_mfa_shape_ms"] = round(dt * 1e3, 3)
        info["bf16_mfa_shape_tflops"] = round(
            2 * 102400 * 1536 * 1536 / dt / 1e12, 1)

    m = jnp.ones((64, 1024, 1024), jnp.float32)  # 256 MB
    stream = jax.jit(lambda d: {"x": d["x"] * 1.0000001 + 1e-9})
    dt = time_fn_on_device(stream, {"x": m}, iters=30)
    info["hbm_stream_gbps"] = round(2 * m.size * 4 / dt / 1e9, 1)

    print(json.dumps(info))


if __name__ == "__main__":
    main()
