"""SSL-frontend composite TRAIN-step throughput (single chip, bf16 AMP).

The reference's two best published results ride these steps
(examples/voxceleb/v2/README.md:103-126: WavLM-Large+ECAPA 0.415 % EER,
w2v-bert adapter-MFA 0.250 %): stage-1 trains the head on a frozen
frontend, stage-2+ fine-tunes jointly. Round 4 benched only their
*extraction*; this is the full jitted TRAIN step exactly as bin/train.py
assembles it (device featurize + composite fwd/bwd + ArcMargin-17982 +
SGD, frozen-frontend optimizer masking included), with the same
kernel-grad-mode selection as the trainers (native under pure DP).

Presets mirror the recipe confs (examples/voxceleb/v2/conf/):
  wavlm_frozen   ecapa_wavlm_frozen.yaml  — WavLM-Large frozen, B=256, 3 s
  wavlm_joint    ecapa_wavlm_joint_ft.yaml — WavLM-Large joint,  B=64, 3 s
  w2vbert_joint  w2vbert_s2_ft.yaml — w2v-bert-2.0 adapter-MFA,  B=64, 3 s

Prints step ms (floor-proof scalar-fetch loop), audio-s/s/chip, and the
device HBM in use after the step (feasibility: what fits on one chip).

Usage: python scripts/bench_ssl_train_step.py <preset> [batch_override]
One preset per invocation — these compiles are the big ones (1-4 min).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wespeaker_tpu.frontend import FbankConfig
from wespeaker_tpu.train import init_train_state, make_train_step
from wespeaker_tpu.train.train_step import AugConfig
from wespeaker_tpu.utils.schedulers import ExponentialDecrease, MarginScheduler

NUM_CLASS = 17982
SECONDS = 3.0

PRESETS = {
    "wavlm_frozen": {
        "model": "ECAPA_TDNN_GLOB_c512",
        "model_args": {"feat_dim": 1024, "embed_dim": 192},
        "dataset_args": {"frontend": "wavlm",
                         "wavlm_args": {"size": "large", "frozen": True}},
        "batch": 256,
    },
    "wavlm_joint": {
        "model": "ECAPA_TDNN_GLOB_c512",
        "model_args": {"feat_dim": 1024, "embed_dim": 192},
        "dataset_args": {"frontend": "wavlm",
                         "wavlm_args": {"size": "large", "frozen": False}},
        "batch": 64,
    },
    "w2vbert_joint": {
        "model": "W2VBert_Adapter_MFA",
        "model_args": {"feat_dim": 1024, "embed_dim": 192},
        "dataset_args": {"frontend": "w2vbert",
                         "w2vbert_args": {"frozen": False}},
        "batch": 64,
    },
}


def main():
    preset = sys.argv[1]
    cfg = dict(PRESETS[preset])
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else cfg["batch"]
    from wespeaker_tpu.ops.grouped_conv import set_kernel_grad_mode
    set_kernel_grad_mode(os.environ.get("WESPEAKER_GROUPED_GRAD", "native"))
    from wespeaker_tpu.bin.train import (_frontend_frozen_mask,
                                         build_from_config)
    from wespeaker_tpu.train.optim import make_optimizer

    configs = {**cfg, "enable_amp": True,
               "optimizer": "SGD",
               "optimizer_args": {"momentum": 0.9, "nesterov": True,
                                  "weight_decay": 1e-4}}
    built, projection = build_from_config(configs, NUM_CLASS)
    model = built.model
    tx = make_optimizer(
        configs,
        _frontend_frozen_mask
        if getattr(model, "frozen_frontend", False) else None)
    epoch_iter = 1092009 // batch
    step_fn = make_train_step(
        model, projection, tx,
        ExponentialDecrease(150, epoch_iter, 0.1, 5e-5, warm_up_epoch=6),
        MarginScheduler(epoch_iter, 20, 40, 0.0, 0.2),
        fbank_cfg=FbankConfig(dither=1.0),
        aug=AugConfig(spec_aug=False),  # SSL confs run spec_aug off
        compute_dtype=jnp.bfloat16,
        featurize_fn=built.featurize_train)
    state = init_train_state(model, projection, tx, jax.random.PRNGKey(0),
                             feat_dim=built.init_feat_dim,
                             embed_dim=configs["model_args"]["embed_dim"],
                             example=built.init_example)
    state = jax.device_put(state)

    rng = np.random.default_rng(0)
    n = int(16000 * SECONDS)
    batch_data = {
        "wav": jnp.asarray(rng.uniform(-0.5, 0.5, (batch, n))
                           .astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, NUM_CLASS, batch)
                             .astype(np.int32)),
    }
    step_jit = jax.jit(step_fn, donate_argnums=(0,))

    t0 = time.perf_counter()
    state, metrics = step_jit(state, batch_data)
    _ = float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    mem = {}
    try:
        ms = jax.devices()[0].memory_stats()
        mem = {"hbm_in_use_gb": round(ms["bytes_in_use"] / 2**30, 2),
               "hbm_limit_gb": round(ms["bytes_limit"] / 2**30, 2)}
    except Exception:
        pass
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_jit(state, batch_data)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "preset": preset, "batch": batch, "step_ms": round(dt * 1e3, 2),
        "audio_s_per_s_per_chip": round(batch * SECONDS / dt, 1),
        "compile_s": round(compile_s, 1), **mem}))


if __name__ == "__main__":
    main()
