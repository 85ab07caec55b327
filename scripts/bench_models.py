"""Multi-model extraction-throughput table (PERF.md source of truth).

Runs on the ambient (TPU tunnel) backend: wav -> device fbank -> CMVN ->
model -> embedding, bf16 weights+activations, 2-second chunks.

Usage: python scripts/bench_models.py [model ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = (200 - 1) * 160 + 400

SPECS = {
    # name -> (registry model name, model_args, batch)
    "ECAPA_TDNN_GLOB_c512": ("ECAPA_TDNN_GLOB_c512",
                             {"feat_dim": 80, "embed_dim": 192}, 1024),
    "ECAPA_TDNN_GLOB_c1024": ("ECAPA_TDNN_GLOB_c1024",
                              {"feat_dim": 80, "embed_dim": 192}, 512),
    "CAMPPlus": ("CAMPPlus", {"feat_dim": 80, "embed_dim": 192}, 512),
    "CAMPPlus_fused": ("CAMPPlus", {"feat_dim": 80, "embed_dim": 192,
                                    "fused_blocks": True}, 512),
    "ResNet34": ("ResNet34", {"feat_dim": 80, "embed_dim": 256}, 512),
    "ResNet152": ("ResNet152", {"feat_dim": 80, "embed_dim": 256}, 256),
    "ResNet293": ("ResNet293", {"feat_dim": 80, "embed_dim": 256}, 128),
    "ERes2Net34_Base": ("ERes2Net34_Base",
                        {"feat_dim": 80, "embed_dim": 192}, 512),
    "Gemini_DF_ResNet60": ("Gemini_DF_ResNet60",
                           {"feat_dim": 80, "embed_dim": 256}, 512),
    "ReDimNetB2": ("ReDimNetB2", {"feat_dim": 72, "embed_dim": 192}, 512),
    "RepVGG_A0": ("REPVGG_A0", {"feat_dim": 80, "embed_dim": 256}, 512),
    "RepVGG_A0_deploy": ("REPVGG_A0",
                         {"feat_dim": 80, "embed_dim": 256,
                          "deploy": True}, 512),
}


def bench_one(name, iters=10):
    from wespeaker_tpu.frontend import FbankConfig
    from wespeaker_tpu.models import get_speaker_model
    from wespeaker_tpu.train import make_eval_embed_fn

    reg_name, args, batch = SPECS[name]
    model = get_speaker_model(reg_name)(**args)
    feat_dim = args["feat_dim"]
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, feat_dim)), train=False)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)
    embed_fn = make_eval_embed_fn(
        model, FbankConfig(num_mel_bins=feat_dim),
        compute_dtype=jnp.bfloat16)
    fn = jax.jit(lambda b: embed_fn(variables, b))
    data = {"wav": jnp.asarray(np.random.default_rng(0).uniform(
        -0.5, 0.5, (batch, CHUNK)).astype(np.float32))}
    # on-device loop timing — immune to the tunnel dispatch floor
    # (utils/bench_timing.py; round-1 enqueue-loop numbers were inflated
    # for any program cheaper than the floor)
    from wespeaker_tpu.utils.bench_timing import time_fn_on_device
    dt = time_fn_on_device(fn, data, iters=2 * iters)
    asps = batch * 2.0 / dt
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(variables))
    # occupancy accounting: XLA's own FLOP count for the whole program
    # (fbank + model), against the chip's measured bf16 matmul peak
    # (scripts/probe_chip.py: 190 TFLOP/s on this v5e)
    try:
        # lowered-module analysis is free; this backend sometimes returns
        # no flops there, then pay the standalone compile for the count
        lowered = fn.lower(data)
        ca = lowered.cost_analysis() or {}
        gflop = float(ca.get("flops", 0.0)) / 1e9
        if not gflop:
            ca = lowered.compile().cost_analysis()
            gflop = float(ca.get("flops", 0.0)) / 1e9
    except Exception:
        gflop = 0.0
    tfs = gflop / dt / 1e3 if gflop else 0.0
    pct = 100.0 * tfs / 190.0 if tfs else 0.0
    print(f"{name:24s} b={batch:4d} {dt*1e3:8.2f} ms  {asps:10,.0f} a-s/s"
          f"  ({n_params/1e6:.2f}M params, {gflop:,.0f} GFLOP,"
          f" {tfs:.0f} TF/s = {pct:.0f}% peak)")
    return asps


if __name__ == "__main__":
    names = sys.argv[1:] or list(SPECS)
    print("devices:", jax.devices())
    for n in names:
        bench_one(n)
