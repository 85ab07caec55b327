"""A/B: differentiable fused MFA+ASTP tail vs standard XLA tail in the
full AMP train step, same process (cancels session drift).

Usage: python scripts/perf_tail_train.py [batch]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wespeaker_tpu.frontend import FbankConfig
from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
from wespeaker_tpu.models.projections import ArcMarginProduct
from wespeaker_tpu.train import init_train_state, make_train_step
from wespeaker_tpu.train.train_step import AugConfig
from wespeaker_tpu.utils.schedulers import ExponentialDecrease, MarginScheduler
from scripts.bench_train_ablation import time_state_loop

CHUNK_SAMPLES = int((200 - 1) * 160 + 400)
NUM_CLASS = 17982


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    rng = np.random.default_rng(0)
    data = {
        "wav": jnp.asarray(rng.uniform(
            -0.5, 0.5, (batch, CHUNK_SAMPLES)).astype(np.float32)),
        "label": jnp.asarray(
            rng.integers(0, NUM_CLASS, batch).astype(np.int32)),
    }
    out = {}
    for name, fused in (("std_tail", False), ("fused_tail", True)):
        model = ECAPA_TDNN(channels=512, feat_dim=80, embed_dim=192,
                           global_context_att=True, fused_tail=fused)
        projection = ArcMarginProduct(192, NUM_CLASS)
        tx = optax.inject_hyperparams(optax.sgd)(learning_rate=0.1,
                                                 momentum=0.9)
        epoch_iter = 1092009 // batch
        step_fn = make_train_step(
            model, projection, tx,
            ExponentialDecrease(150, epoch_iter, 0.1, 5e-5, warm_up_epoch=6),
            MarginScheduler(epoch_iter, 20, 40, 0.0, 0.2),
            fbank_cfg=FbankConfig(dither=1.0),
            aug=AugConfig(spec_aug=True),
            compute_dtype=jnp.bfloat16)
        state = jax.device_put(
            init_train_state(model, projection, tx, jax.random.PRNGKey(0)))
        dt = time_state_loop(step_fn, state, data, 20)
        out[name] = {"ms": round(dt * 1e3, 2),
                     "audio_s_per_s": round(batch * 2.0 / dt, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
