"""Large SSL-frontend extraction throughput (single v5e chip, bf16).

Whisper-PMFA (whisper-large-v2 encoder, ~638M) and WavLM-base+ECAPA —
the models whose GPU story in the reference is multi-GPU file splits;
here one chip in bf16. Random-init weights (throughput only).

Usage: python scripts/bench_frontends.py [whisper_pmfa|wavlm_ecapa] ...
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = {
    "whisper_pmfa": {
        "model": "whisper_PMFA_large_v2",
        "model_args": {"feat_dim": 1280, "embed_dim": 256},
        "dataset_args": {
            "frontend": "whisper_encoder",
            "whisper_encoder_args": {"num_blocks": 32, "layer_st": 16,
                                     "layer_ed": 23},
        },
        "batch": 32,
        "seconds": 2.0,
    },
    "wavlm_ecapa": {
        "model": "ECAPA_TDNN_GLOB_c512",
        "model_args": {"feat_dim": 768, "embed_dim": 192},
        "dataset_args": {
            "frontend": "wavlm",
            "wavlm_args": {"size": "base"},
        },
        "batch": 64,
        "seconds": 2.0,
    },
}


def bench(name, iters=5):
    from wespeaker_tpu.train import make_eval_embed_fn
    from wespeaker_tpu.train.composite import build_model

    cfg = CONFIGS[name]
    built = build_model(cfg)
    b = cfg["batch"]
    n = int(16000 * cfg["seconds"])
    variables = built.model.init(jax.random.PRNGKey(0), built.init_example,
                                 train=False)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)
    embed_fn = jax.jit(make_eval_embed_fn(
        built.model, None, compute_dtype=jnp.bfloat16,
        featurize_fn=built.featurize_eval))
    wav = jnp.asarray(np.random.default_rng(0).uniform(
        -0.5, 0.5, (b, n)).astype(np.float32))
    # on-device loop timing: immune to the tunnel dispatch floor, which
    # inflated the round-1 enqueue-loop numbers for sub-floor programs
    from wespeaker_tpu.utils.bench_timing import time_fn_on_device
    dt = time_fn_on_device(lambda d: embed_fn(variables, d),
                           {"wav": wav}, iters=2 * iters)
    params = sum(int(np.prod(p.shape))
                 for p in jax.tree_util.tree_leaves(variables))
    print(f"{name:14s} b={b:3d} {dt*1e3:8.2f} ms  "
          f"{b*cfg['seconds']/dt:9,.0f} audio-s/s  ({params/1e6:.0f}M)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for n in (sys.argv[1:] or list(CONFIGS)):
        bench(n)
