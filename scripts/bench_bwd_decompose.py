"""Train-step backward decomposition for a speaker model (round-5 study).

The round-4 zoo measured 2D-conv families at 4.5-6.6x their forward per
train step vs the ~3x structural fwd+bwd ratio, with the excess only
ASSERTED as "transposed-conv relayout cost". This script measures it, by
exploiting autodiff structure: the VJP wrt the INPUT alone runs fwd + the
full dX chain but computes no filter gradients, so

    fwdtrain                      = fwd (train mode, incl. BN batch stats)
    grad_input - fwdtrain         = the dX chain (transposed convs + BN bwd)
    grad_params - grad_input      = the dW computations (filter gradients)

and the eval-BN counterfactuals (train=False: BN backward through frozen
running stats is just a per-channel scale — no batch-stat reductions in
either direction; everything else identical, fused inference kernels are
opt-in and stay off):

    fwdeval                       = fwd minus BN batch-stat computation
    gradin_evalbn  vs grad_input  = the BN-train machinery in the dX chain
    gradparams_evalbn             = full backward minus BN-train machinery

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

    def loss(p, x, train=True):
        # the bin/train.py AMP recipe: params cast to compute dtype inside
        # the loss, f32 master weights outside (train/train_step.py)
        pc = jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if a.dtype == jnp.float32 else a, p)
        out = model.apply({"params": pc, "batch_stats": stats},
                          x.astype(compute_dtype), train=train,
                          mutable=["batch_stats"] if train else False)
        if train:
            out = out[0]
        emb = out[0] if isinstance(out, tuple) else out
        return jnp.sum(emb.astype(jnp.float32))

    loss_eval = lambda p, x: loss(p, x, train=False)
    variants = {
        "fwdtrain": lambda d: loss(params, d["feat"]),
        "grad_input": lambda d: jax.grad(loss, 1)(params, d["feat"]),
        "grad_params": lambda d: jax.grad(loss, 0)(params, d["feat"]),
        "fwdeval": lambda d: loss_eval(params, d["feat"]),
        "gradin_evalbn": lambda d: jax.grad(loss_eval, 1)(params, d["feat"]),
        "gradparams_evalbn":
            lambda d: jax.grad(loss_eval, 0)(params, d["feat"]),
    }
    if variant not in variants:
        raise SystemExit(f"unknown variant {variant}")
    fn = variants[variant]

    dt = time_fn_on_device(fn, {"feat": feat}, iters=10, perturb_key="feat")
    print(json.dumps({
        "model": model_name, "variant": variant, "batch": batch,
        "amp": amp, "ms": round(dt * 1e3, 2),
        "audio_s_per_s": round(batch * CHUNK_SECONDS / dt, 1)}))


if __name__ == "__main__":
    main()
