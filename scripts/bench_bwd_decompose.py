"""Train-step backward decomposition for a speaker model (round-5 study).

The round-4 zoo measured 2D-conv families at 4.5-6.6x their forward per
train step vs the ~3x structural fwd+bwd ratio, with the excess only
ASSERTED as "transposed-conv relayout cost". This script measures it, by
exploiting autodiff structure: the VJP wrt the INPUT alone runs fwd + the
full dX chain but computes no filter gradients, so

    fwdtrain                      = fwd (train mode, incl. BN batch stats)
    grad_input - fwdtrain         = the dX chain (transposed convs + BN bwd)
    grad_params - grad_input      = the dW computations (filter gradients)

All timings are floor-proof on-device fori_loop slopes on the backbone
alone, feats in (B, 200, feat_dim), sum-of-embedding loss — the round-4
ablation showed fbank/projection/optimizer are <4% of the step.

Usage: python scripts/bench_bwd_decompose.py <model> <variant> [batch] [amp]
  variant in: fwdtrain | grad_input | grad_params
One variant per invocation (tunnel compiles are ~30-60 s each).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wespeaker_tpu.models import get_speaker_model
from wespeaker_tpu.utils.bench_timing import time_fn_on_device

CHUNK_SECONDS = 2.0
T = 200


def main():
    model_name = sys.argv[1]
    variant = sys.argv[2]
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    amp = bool(int(sys.argv[4])) if len(sys.argv) > 4 else True
    from wespeaker_tpu.ops.grouped_conv import set_kernel_grad_mode
    set_kernel_grad_mode(os.environ.get("WESPEAKER_GROUPED_GRAD", "native"))

    compute_dtype = jnp.bfloat16 if amp else jnp.float32
    model = get_speaker_model(model_name)(feat_dim=80, embed_dim=192)
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(batch, T, 80)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feat[:2], train=True)
    params, stats = variables["params"], variables.get("batch_stats", {})

    def loss(p, x):
        # the bin/train.py AMP recipe: params cast to compute dtype inside
        # the loss, f32 master weights outside (train/train_step.py)
        pc = jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if a.dtype == jnp.float32 else a, p)
        out = model.apply({"params": pc, "batch_stats": stats},
                          x.astype(compute_dtype), train=True,
                          mutable=["batch_stats"])
        emb = out[0][0] if isinstance(out[0], tuple) else out[0]
        return jnp.sum(emb.astype(jnp.float32))

    if variant == "fwdtrain":
        fn = lambda d: loss(params, d["feat"])
    elif variant == "grad_input":
        fn = lambda d: jax.grad(loss, 1)(params, d["feat"])
    elif variant == "grad_params":
        fn = lambda d: jax.grad(loss, 0)(params, d["feat"])
    else:
        raise SystemExit(f"unknown variant {variant}")

    dt = time_fn_on_device(fn, {"feat": feat}, iters=10, perturb_key="feat")
    print(json.dumps({
        "model": model_name, "variant": variant, "batch": batch,
        "amp": amp, "ms": round(dt * 1e3, 2),
        "audio_s_per_s": round(batch * CHUNK_SECONDS / dt, 1)}))


if __name__ == "__main__":
    main()
