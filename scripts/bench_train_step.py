"""Single-chip training-step throughput (audio-seconds/s/chip).

Full jitted step: device fbank (waveform dither) + CMVN + spec-aug +
model fwd/bwd + ArcMargin over VoxCeleb2-sized classes + SGD update —
the executor hot loop (reference wespeaker/utils/executor.py:23-96) as one
XLA program. Run ONE (batch, amp) point per invocation; tunnel compiles
are ~30-60 s each.

Usage: python scripts/bench_train_step.py [batch] [amp 0|1] [model]
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
from wespeaker_tpu.models import get_speaker_model
from wespeaker_tpu.models.projections import ArcMarginProduct
from wespeaker_tpu.train import init_train_state, make_train_step
from wespeaker_tpu.train.train_step import AugConfig
from wespeaker_tpu.utils.schedulers import ExponentialDecrease, MarginScheduler

CHUNK_SECONDS = 2.0
CHUNK_SAMPLES = int((200 - 1) * 160 + 400)
NUM_CLASS = 17982  # 5994 voxceleb2 speakers x 3 speed-perturb classes


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    amp = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    model_name = sys.argv[3] if len(sys.argv) > 3 else "ECAPA_TDNN_GLOB_c512"
    iters = 20
    # single-chip bench = pure DP: the native grouped-conv backward is
    # valid and what bin/train.py selects (WESPEAKER_GROUPED_GRAD=safe
    # re-measures the GSPMD-safe path)
    from wespeaker_tpu.ops.grouped_conv import set_kernel_grad_mode
    set_kernel_grad_mode(os.environ.get("WESPEAKER_GROUPED_GRAD", "native"))
    # tap-packed dW counterfactual (ops/conv_dw_pack.py — measured LOSS
    # vs XLA's conv-backprop-filter, kept opt-in for re-measurement:
    # WESPEAKER_CONV_DW=packed)
    from wespeaker_tpu.ops.conv_dw_pack import set_conv_dw_mode
    set_conv_dw_mode(os.environ.get("WESPEAKER_CONV_DW", "native"))

    model = get_speaker_model(model_name)(feat_dim=80, embed_dim=192)
    projection = ArcMarginProduct(192, NUM_CLASS)
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=0.1, momentum=0.9)
    epoch_iter = 1092009 // batch
    step_fn = make_train_step(
        model, projection, tx,
        ExponentialDecrease(150, epoch_iter, 0.1, 5e-5, warm_up_epoch=6),
        MarginScheduler(epoch_iter, 20, 40, 0.0, 0.2),
        fbank_cfg=FbankConfig(dither=1.0),
        aug=AugConfig(spec_aug=True),
        compute_dtype=jnp.bfloat16 if amp else jnp.float32)
    state = init_train_state(model, projection, tx, jax.random.PRNGKey(0))
    state = jax.device_put(state)

    rng = np.random.default_rng(0)
    batch_data = {
        "wav": jnp.asarray(rng.uniform(
            -0.5, 0.5, (batch, CHUNK_SAMPLES)).astype(np.float32)),
        "label": jnp.asarray(
            rng.integers(0, NUM_CLASS, batch).astype(np.int32)),
    }
    step_jit = jax.jit(step_fn, donate_argnums=(0,))

    state, metrics = step_jit(state, batch_data)
    _ = float(metrics["loss"])  # fetch a scalar: true step boundary
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_jit(state, batch_data)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    audio_s = batch * CHUNK_SECONDS / dt
    print(json.dumps({
        "model": model_name, "batch": batch, "amp": amp,
        "step_ms": round(dt * 1e3, 2),
        "audio_s_per_s_per_chip": round(audio_s, 1)}))


if __name__ == "__main__":
    main()
