"""Train-step wall-time breakdown via component ablation (round-3 MXU
occupancy attack, VERDICT item 1).

Times the flagship AMP train step (bench.py `bench_train_step` settings:
device fbank + spec-aug + ECAPA-GLOB-c512 fwd/bwd + ArcMargin-17982 + SGD,
B=256 bf16) with individual components knocked out — numerics change, this
is a *timing* ladder. Reference framing: the train loop is the reference's
hot path (wespeaker/utils/executor.py:23-96).

Usage: python scripts/bench_train_ablation.py [batch] [variant]
  variant in:
    full        the bench.py train step
    nofbank     train on precomputed (B,T,80) features (no fbank/dither)
    nospecaug   spec-aug off
    linearhead  plain Linear head instead of ArcMargin
    nochain     Res2 chains removed (AblatedECAPA)
    notail      MFA conv + ASTP replaced by mean-pool (AblatedECAPA)
    evalbn      BN uses running stats inside the grad (no batch stats)
    noopt       value_and_grad only — no optax update / state write
    fwdtrain    train-mode forward + loss only (no grad)
    fwdeval     eval-mode embedding forward only (extraction baseline)
Run ONE variant per invocation (tunnel compiles are ~30-60 s each).
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

import flax.linen as nn

from wespeaker_tpu.frontend import FbankConfig
from wespeaker_tpu.models.projections import ArcMarginProduct
from wespeaker_tpu.train import init_train_state, make_train_step
from wespeaker_tpu.train.train_step import AugConfig
from wespeaker_tpu.utils.schedulers import ExponentialDecrease, MarginScheduler

CHUNK_SECONDS = 2.0
CHUNK_SAMPLES = int((200 - 1) * 160 + 400)
NUM_CLASS = 17982


class PlainHead(nn.Module):
    """Margin-free Dense head — isolates the arc-margin trig/one-hot cost
    (the class-matmul itself is identical)."""
    out_features: int

    @nn.compact
    def __call__(self, embed, label=None, margin=0.0):
        return nn.Dense(self.out_features, name="weight")(embed)


def make_model(variant):
    if variant in ("nochain", "notail"):
        from scripts.bench_ecapa_ablation import AblatedECAPA
        return AblatedECAPA(use_chain=variant != "nochain",
                            use_astp=variant != "notail",
                            use_mfa=variant != "notail")
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
    # evalbn differentiates the eval forward, whose inference-only fused
    # kernels have no vjp — force the standard path for that variant
    fused = {} if variant != "evalbn" else dict(fused_block=False,
                                                fused_tail=False)
    return ECAPA_TDNN(channels=512, feat_dim=80, embed_dim=192,
                      global_context_att=True, **fused)


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    variant = sys.argv[2] if len(sys.argv) > 2 else "full"
    iters = 20

    model = make_model(variant)
    projection = (PlainHead(NUM_CLASS) if variant == "linearhead"
                  else ArcMarginProduct(192, NUM_CLASS))
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=0.1, momentum=0.9)
    epoch_iter = 1092009 // batch
    lr_fn = ExponentialDecrease(150, epoch_iter, 0.1, 5e-5, warm_up_epoch=6)
    margin_fn = MarginScheduler(epoch_iter, 20, 40, 0.0, 0.2)
    fbank_cfg = FbankConfig(dither=0.0 if variant == "nofbank" else 1.0)
    aug = AugConfig(spec_aug=variant != "nospecaug")
    state = jax.device_put(
        init_train_state(model, projection, tx, jax.random.PRNGKey(0)))

    rng = np.random.default_rng(0)
    data = {"label": jnp.asarray(
        rng.integers(0, NUM_CLASS, batch).astype(np.int32))}
    if variant == "nofbank":
        data["feat"] = jnp.asarray(
            rng.normal(size=(batch, 200, 80)).astype(np.float32))
    else:
        data["wav"] = jnp.asarray(rng.uniform(
            -0.5, 0.5, (batch, CHUNK_SAMPLES)).astype(np.float32))

    if variant in ("fwdtrain", "fwdeval", "noopt", "evalbn"):
        dt = time_fwd_style(variant, model, projection, state, data,
                            fbank_cfg, aug, iters)
    else:
        step_fn = make_train_step(model, projection, tx, lr_fn, margin_fn,
                                  fbank_cfg=fbank_cfg, aug=aug,
                                  compute_dtype=jnp.bfloat16)
        dt = time_state_loop(step_fn, state, data, iters)
    print(json.dumps({"variant": variant, "batch": batch,
                      "ms": round(dt * 1e3, 2),
                      "audio_s_per_s": round(batch * CHUNK_SECONDS / dt, 1)}))


def time_state_loop(step_fn, state, data, iters):
    def body(_, st):
        st2, _m = step_fn(st, data)
        return st2

    loop = jax.jit(lambda st, n: jax.lax.fori_loop(0, n, body, st))

    def run(n):
        t0 = time.perf_counter()
        st = loop(state, n)
        _ = float(st.step)
        return time.perf_counter() - t0

    run(2)
    lo = min(run(3) for _ in range(2))
    hi = min(run(3 + iters) for _ in range(2))
    return max(hi - lo, 1e-9) / iters


def time_fwd_style(variant, model, projection, state, data, fbank_cfg, aug,
                   iters):
    """Loss/grad as a pure fn of the batch (params captured) so the
    input-perturbation loop serializes it — fwd-only and no-update
    variants have no state carry."""
    from wespeaker_tpu.train.train_step import (amp_cast,
                                                features_from_batch)
    from wespeaker_tpu.utils.bench_timing import time_fn_on_device

    params, batch_stats = state.params, state.batch_stats
    key = jax.random.PRNGKey(1)

    def loss_fn(mparams, batch):
        feat = features_from_batch(batch, fbank_cfg, aug, key, train=True)
        feat = feat.astype(jnp.bfloat16)
        variables = {"params": amp_cast(mparams["model"], jnp.bfloat16),
                     "batch_stats": batch_stats}
        if variant == "evalbn":
            embed = model.apply(variables, feat, train=False)
        else:
            embed, _ = model.apply(variables, feat, train=True,
                                   mutable=["batch_stats"])
        embed = embed.astype(jnp.float32)
        logits = projection.apply({"params": mparams["projection"]}, embed,
                                  batch["label"], 0.1)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["label"]).mean()

    if variant == "fwdeval":
        from wespeaker_tpu.train import make_eval_embed_fn
        v16 = amp_cast({"params": params["model"],
                        "batch_stats": batch_stats}, jnp.bfloat16)
        embed_fn = make_eval_embed_fn(model, FbankConfig(),
                                      compute_dtype=jnp.bfloat16)
        fn = lambda b: embed_fn(v16, b)  # noqa: E731
    elif variant == "fwdtrain":
        fn = lambda b: loss_fn(params, b)  # noqa: E731
    else:  # noopt / evalbn: full grad, no update
        fn = lambda b: jax.grad(loss_fn)(params, b)["model"]  # noqa: E731
    return time_fn_on_device(jax.jit(fn), data, iters=iters,
                             perturb_key="wav" if "wav" in data else "feat")


if __name__ == "__main__":
    main()
