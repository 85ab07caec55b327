"""Benchmark: embedding-extraction throughput (audio-seconds/s/chip).

Flagship path (BASELINE.json): ECAPA_TDNN_GLOB_c512 over 2-second chunks,
wav -> device-side kaldi fbank -> embedding, bf16 compute.

Baseline anchor: the reference's best published GPU number — ResNet34
onnxruntime RTF 0.00857 on an RTX 3090 (runtime/onnxruntime/README.md:100),
i.e. ~117 audio-seconds/s. vs_baseline = throughput / 117.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"extra" records the full train-step throughput (fwd+bwd+ArcMargin-17982+
SGD, bf16 AMP, batch 256) so training regressions are visible per round,
not just extraction (the reference publishes no train-throughput number,
so vs_baseline stays anchored to extraction).
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
    # B=512 measures faster per-sample than 2048 on this chip (85k vs 78k
    # a-s/s unfused; the fused kernels widen the gap) — see docs/PERF.md
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from wespeaker_tpu.frontend import FbankConfig
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
    from wespeaker_tpu.train import make_eval_embed_fn

    model = ECAPA_TDNN(channels=512, feat_dim=80, embed_dim=192,
                       global_context_att=True, fused_block=True,
                       fused_tail=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 80)),
                           train=False)
    # bf16 weights + bf16 activations keep every matmul on the MXU fast path
    # (embedding cosine vs the fp32 reference path stays >= 0.9999)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)
    embed_fn = make_eval_embed_fn(model, FbankConfig(),
                                  compute_dtype=jnp.bfloat16,
                                  fbank_conv_dtype=jnp.bfloat16)
    fn = jax.jit(lambda b: embed_fn(variables, b))

    rng = np.random.default_rng(0)
    data = {"wav": jnp.asarray(rng.uniform(
        -0.5, 0.5, (batch, CHUNK_SAMPLES)).astype(np.float32))}

    # On-device loop timing: the tunnel's per-dispatch floor (~40 ms some
    # sessions) makes enqueue-loop timing report max(compute, floor) —
    # see utils/bench_timing.py. Best-of-3 independent slope measurements
    # bound run-to-run variance (VERDICT r2: 6.7% inter-session drift);
    # the spread is recorded so a real regression is distinguishable from
    # noise.
    from wespeaker_tpu.utils.bench_timing import make_serial_loop, time_loop
    loop = make_serial_loop(fn)
    dts = [time_loop(loop, data, iters=iters) for _ in range(3)]
    value = batch * CHUNK_SECONDS / min(dts)
    spread = (max(dts) - min(dts)) / min(dts)

    train_value, train_spread = bench_train_step()
    # DINO runs as a CHILD PROCESS with a hard wall-clock timeout: a cold
    # compile hung inside the tunnel's native RPC call cannot be interrupted
    # by SIGALRM in-process (the handler only fires between Python
    # bytecodes), but subprocess.run(timeout=...) kills the child
    # unconditionally, so the one-line driver contract genuinely always
    # prints. Default on; WESPEAKER_BENCH_DINO=0 opts out.
    # scripts/bench_dino_step.py reproduces the numbers standalone.
    import os as _os
    dino_value, dino_extra = None, {}
    if _os.environ.get("WESPEAKER_BENCH_DINO", "1") != "0":
        dino_value, dino_extra = bench_dino_subprocess()
    print(json.dumps({
        "metric": "ecapa_tdnn_glob_c512_extract_audio_s_per_s_per_chip",
        "value": round(value, 1),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 2),
        "extra": {
            "extract_spread_pct": round(spread * 100, 1),
            "train_step_audio_s_per_s_per_chip": round(train_value, 1),
            "train_spread_pct": round(train_spread * 100, 1),
            "train_config": "ECAPA_GLOB_c512 b256 bf16 arcmargin17982 sgd",
            "dino_crop_audio_s_per_s_per_chip": dino_value,
            "dino_config": "ECAPA_GLOB_c512 b64 2x3s+4x2s head65536 bf16",
            **dino_extra,
        },
    }))


def bench_train_step(batch=256, iters=20):
    """Full jitted train step (device fbank + spec-aug + fwd/bwd +
    ArcMargin over 3x-voxceleb2 classes + SGD), bf16 AMP — the executor
    hot loop as one XLA program (scripts/bench_train_step.py settings)."""
    import optax

    from wespeaker_tpu.frontend import FbankConfig
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
    from wespeaker_tpu.models.projections import ArcMarginProduct
    from wespeaker_tpu.train import init_train_state, make_train_step
    from wespeaker_tpu.train.train_step import AugConfig
    from wespeaker_tpu.utils.schedulers import (ExponentialDecrease,
                                                MarginScheduler)

    num_class = 17982  # 5994 voxceleb2 speakers x 3 speed-perturb classes
    model = ECAPA_TDNN(channels=512, feat_dim=80, embed_dim=192,
                       global_context_att=True)
    projection = ArcMarginProduct(192, num_class)
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
    rng = np.random.default_rng(0)
    data = {
        "wav": jnp.asarray(rng.uniform(
            -0.5, 0.5, (batch, CHUNK_SAMPLES)).astype(np.float32)),
        "label": jnp.asarray(
            rng.integers(0, num_class, batch).astype(np.int32)),
    }
    # On-device loop: the state dependency serializes iterations naturally;
    # the slope between two trip counts cancels the tunnel dispatch floor.
    def body(_, st):
        st2, _metrics = step_fn(st, data)
        return st2

    loop = jax.jit(lambda st, n: jax.lax.fori_loop(0, n, body, st))

    def run(n):
        t0 = time.perf_counter()
        st = loop(state, n)
        _ = float(st.step)  # scalar fetch: real completion
        return time.perf_counter() - t0

    def slope():
        lo = min(run(3) for _ in range(2))
        hi = min(run(3 + iters) for _ in range(2))
        # clamp: timing noise must not yield a negative/absurd slope
        return max(hi - lo, 1e-9) / iters

    run(2)  # compile + warm
    dts = [slope() for _ in range(3)]  # best-of-3, as for extraction
    spread = (max(dts) - min(dts)) / min(dts)
    return batch * CHUNK_SECONDS / min(dts), spread


def bench_dino_subprocess(timeout_s=540):
    """DINO multi-crop pretraining step (reference voxceleb/v3/dino crop
    config), measured floor-proof by scripts/bench_dino_step.py (on-device
    fori_loop slope + recorded in-session dispatch floor + enqueue
    cross-check). Runs as a child so a hung tunnel compile is killed at
    the wall-clock deadline; returns (crop_audio_s_per_s|None, extra)."""
    import os
    import subprocess
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "bench_dino_step.py")
    proc = None
    try:
        proc = subprocess.run([sys.executable, script], timeout=timeout_s,
                              capture_output=True, text=True)
        out = json.loads(proc.stdout.strip().splitlines()[-1])
        return out["crop_audio_s_per_s_per_chip"], {
            "dino_step_ms": out["step_ms"],
            "dino_dispatch_floor_ms": out["dispatch_floor_ms"],
            "dino_enqueue_step_ms": out["enqueue_step_ms"],
        }
    except Exception as e:
        # never break the one-line driver contract (stdout stays the JSON
        # line), but surface the child's failure on stderr for debugging
        tail = ""
        if proc is not None and getattr(proc, "stderr", None):
            tail = proc.stderr[-2000:]
        print(f"bench_dino_subprocess failed: {e!r}\n--- child stderr tail"
              f" ---\n{tail}", file=sys.stderr)
        return None, {}


if __name__ == "__main__":
    main()
