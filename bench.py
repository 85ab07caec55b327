"""Benchmark: embedding-extraction throughput (audio-seconds/s/chip).

Flagship path (BASELINE.json): ECAPA_TDNN_GLOB_c512 over 2-second chunks,
wav -> device-side kaldi fbank -> embedding, bf16 compute.

Baseline anchor: the reference's best published GPU number — ResNet34
onnxruntime RTF 0.00857 on an RTX 3090 (runtime/onnxruntime/README.md:100),
i.e. ~117 audio-seconds/s. vs_baseline = throughput / 117.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CHUNK_SECONDS = 2.0
SAMPLE_RATE = 16000
CHUNK_SAMPLES = int((200 - 1) * 160 + 400)  # 200 frames, snip-edges
BASELINE_AUDIO_S_PER_S = 117.0  # 1 / 0.00857 (ResNet34 RTF on 3090)


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from wespeaker_tpu.frontend import FbankConfig
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
    from wespeaker_tpu.train import make_eval_embed_fn

    model = ECAPA_TDNN(channels=512, feat_dim=80, embed_dim=192,
                       global_context_att=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 80)),
                           train=False)
    # bf16 weights + bf16 activations keep every matmul on the MXU fast path
    # (embedding cosine vs the fp32 reference path stays >= 0.9999)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)
    embed_fn = make_eval_embed_fn(model, FbankConfig(),
                                  compute_dtype=jnp.bfloat16)
    fn = jax.jit(lambda wav: embed_fn(variables, {"wav": wav}))

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.uniform(-0.5, 0.5,
                                  (batch, CHUNK_SAMPLES)).astype(np.float32))

    # compile + warmup
    fn(wav).block_until_ready()
    for _ in range(3):
        out = fn(wav)
    out.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(wav)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    audio_seconds = batch * CHUNK_SECONDS * iters
    value = audio_seconds / dt
    print(json.dumps({
        "metric": "ecapa_tdnn_glob_c512_extract_audio_s_per_s_per_chip",
        "value": round(value, 1),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
