"""Perf: fused SE-Res2 block kernel (ops/se_block_pallas.py) vs the XLA
path, end-to-end ECAPA-GLOB-c512 bf16 extraction on the ambient (TPU
tunnel) backend.

Timing runs inside one jitted fori_loop, serialized by the input
perturbation trick in utils/bench_timing.py (optimization_barrier is
value-transparent and gets DCE'd), so the tunnel's per-dispatch floor
cancels.

Usage: python scripts/perf_se_block.py [batch] [block01] [tail01]
Run ONE configuration per invocation (tunnel compiles are slow).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CHUNK_SAMPLES = int((200 - 1) * 160 + 400)


def main():
    from wespeaker_tpu.frontend import FbankConfig
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
    from wespeaker_tpu.train import make_eval_embed_fn
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    fused = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    tail = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
    iters = 20

    model = ECAPA_TDNN(channels=512, feat_dim=80, embed_dim=192,
                       global_context_att=True, fused_block=fused,
                       fused_tail=tail)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 80)),
                           train=False)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)
    embed_fn = make_eval_embed_fn(model, FbankConfig(),
                                  compute_dtype=jnp.bfloat16)
    fn = jax.jit(lambda b: embed_fn(variables, b))

    rng = np.random.default_rng(0)
    data = {"wav": jnp.asarray(rng.uniform(
        -0.5, 0.5, (batch, CHUNK_SAMPLES)).astype(np.float32))}

    from wespeaker_tpu.utils.bench_timing import time_fn_on_device
    dt = time_fn_on_device(fn, data, iters=iters)
    print(json.dumps({"fused_block": fused, "fused_tail": tail,
                  "batch": batch,
                      "ms": round(dt * 1e3, 2),
                      "audio_s_per_s": round(batch * 2.0 / dt, 1)}))


if __name__ == "__main__":
    main()
