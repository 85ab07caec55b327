"""CAM++ fused-kernel multi-bucket extraction (VERDICT r3 item 4).

The fused Pallas dense-block kernel costs ~minutes of Mosaic compile per
(T, C) shape, which ruled it out for variable-length extraction under the
linear 1-second bucket grid (one compile per distinct second). With
`--pow2_buckets` the bucket ladder is geometric, so distinct compiled
shapes are <= log2(max_len) ever — this script measures exactly that on a
synthetic variable-length corpus: bucket-shape count, cold wall (includes
Mosaic compiles), warm wall (persistent cache), fused vs standard, and
embedding agreement between the two paths.

CAM++ is the reference's best-RTF production model
(runtime/onnxruntime/README.md:88), so multi-bucket extraction is its
production path, not a corner case.

Usage (ambient TPU env):
  PYTHONPATH=.:/root/.axon_site python scripts/bench_campplus_buckets.py [mode]
mode: fused | standard | both (default both; each mode = one extract run
      per pass, two passes to split cold/warm)
"""

import json
import os
import sys
import time
import wave

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = "/tmp/campplus_buckets"
N_UTT = 96
SR = 16000
SECONDS = (1.2, 7.8)  # uniform range -> 4 pow2 buckets (2/4/8s)


def make_corpus():
    os.makedirs(os.path.join(ROOT, "wav"), exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(N_UTT):
        sec = rng.uniform(*SECONDS)
        sig = (0.3 * rng.standard_normal(int(sec * SR))).astype(np.float32)
        path = os.path.join(ROOT, "wav", f"u{i:03d}.wav")
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SR)
            w.writeframes((np.clip(sig, -1, 1) * 32767).astype(
                np.int16).tobytes())
        lines.append(json.dumps({"key": f"u{i:03d}", "wav": path,
                                 "spk": "s0"}))
    with open(os.path.join(ROOT, "eval.list"), "w") as f:
        f.write("\n".join(lines) + "\n")


def make_ckpt():
    import jax
    import jax.numpy as jnp

    from wespeaker_tpu.models.campplus import CAMPPlus
    from wespeaker_tpu.utils import checkpoint as ckpt

    model = CAMPPlus(feat_dim=80, embed_dim=512)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 80)),
                           train=False)
    path = os.path.join(ROOT, "model.ckpt")
    ckpt.save_checkpoint(path, {"params": variables["params"],
                                "batch_stats": variables.get("batch_stats",
                                                             {})})
    return path


def run_extract(ckpt_path, fused: bool, tag: str):
    import yaml

    from wespeaker_tpu.bin.extract import extract
    cfg = {
        "model": "CAMPPlus",
        "model_args": {"feat_dim": 80, "embed_dim": 512,
                       "pooling_func": "TSTP",
                       "fused_blocks": bool(fused)},
        "dataset_args": {"resample_rate": SR,
                         "fbank_args": {"num_mel_bins": 80}},
    }
    cfg_path = os.path.join(ROOT, f"cfg_{tag}.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    t0 = time.perf_counter()
    extract(cfg_path, ckpt_path, os.path.join(ROOT, "eval.list"),
            os.path.join(ROOT, f"emb_{tag}"), batch_size=24,
            bf16=True, pow2_buckets=True)
    return time.perf_counter() - t0


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    make_corpus()
    ckpt_path = make_ckpt()

    from wespeaker_tpu.data.dataset import eval_batches

    # count the distinct padded shapes the ladder produces
    def corpus_wavs():
        with open(os.path.join(ROOT, "eval.list")) as f:
            for line in f:
                obj = json.loads(line)
                with wave.open(obj["wav"], "rb") as w:
                    data = np.frombuffer(w.readframes(w.getnframes()),
                                         dtype="<i2")
                yield obj["key"], data.astype(np.float32) / 32768.0

    shapes = sorted({b["wav"].shape[1]
                     for b in eval_batches(corpus_wavs(), batch_size=24,
                                           quantum_samples=SR,
                                           pow2_buckets=True)})
    out = {"n_utts": N_UTT, "bucket_samples": shapes,
           "n_bucket_shapes": len(shapes)}

    if mode in ("standard", "both"):
        out["standard_cold_s"] = round(run_extract(ckpt_path, False,
                                                   "std"), 1)
        out["standard_warm_s"] = round(run_extract(ckpt_path, False,
                                                   "std"), 1)
    if mode in ("fused", "both"):
        out["fused_cold_s"] = round(run_extract(ckpt_path, True,
                                                "fused"), 1)
        out["fused_warm_s"] = round(run_extract(ckpt_path, True,
                                                "fused"), 1)

    if mode == "both":
        from wespeaker_tpu.utils.kaldi_io import read_vec_scp_dict
        a = read_vec_scp_dict(os.path.join(ROOT, "emb_std.scp"))
        b = read_vec_scp_dict(os.path.join(ROOT, "emb_fused.scp"))
        cos = [float(np.dot(a[k], b[k]) /
                     (np.linalg.norm(a[k]) * np.linalg.norm(b[k]) + 1e-12))
               for k in a]
        out["min_cosine_fused_vs_standard"] = round(min(cos), 5)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
