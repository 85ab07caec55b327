"""Embedding extraction CLI: raw list -> kaldi ark/scp embeddings.

Behavioral spec: wespeaker/bin/extract.py:33-143 (test-mode dataset: no aug,
dither=0, whole utterances; kaldi ark/scp output).

TPU-native: variable-length utterances are length-sorted into padded
static-shape buckets with validity masks (masked CMVN + masked pooling), so
the whole batch runs jit-compiled instead of the reference's batch=1 loop.
"""

import argparse
import json
import logging

import jax
import jax.numpy as jnp
import numpy as np

from wespeaker_tpu.data.dataset import eval_batches
from wespeaker_tpu.frontend import FbankConfig
from wespeaker_tpu.train import make_eval_embed_fn
from wespeaker_tpu.train.composite import build_model
from wespeaker_tpu.utils import checkpoint as ckpt
from wespeaker_tpu.utils.config import parse_config_or_kwargs
from wespeaker_tpu.utils.kaldi_io import write_vec_ark_scp


def load_model_for_eval(configs, checkpoint_path):
    import flax.linen as nn

    built = build_model(configs)
    variables = nn.meta.unbox(
        built.model.init(jax.random.PRNGKey(0), built.init_example,
                         train=False))
    loaded = ckpt.load_checkpoint(checkpoint_path, {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {})})
    # checkpoint restore yields host numpy arrays; without an explicit
    # device_put every jit call re-transfers the full weight tree
    # (~25 MB/call through the TPU tunnel — dominated serving latency)
    variables = jax.device_put(
        {"params": loaded["params"],
         "batch_stats": loaded.get("batch_stats", {})})
    return built, variables


def _load_entry(obj, target_rate):
    from wespeaker_tpu.data.pipeline import read_audio_any, resample_array
    wav, sr = read_audio_any(obj["wav"])
    if wav.ndim > 1:
        wav = wav[0]
    if "vad" in obj and obj["vad"]:
        segs = [wav[int(s * sr):int(e * sr)] for s, e in obj["vad"]]
        wav = np.concatenate(segs) if segs else wav
    if sr != target_rate:
        wav = resample_array(wav, sr, target_rate)
    return obj["key"], wav


def _threaded_map(fn, items, num_threads, depth=64):
    """Ordered map with a bounded read-ahead thread pool — wav reading /
    resampling is IO-bound and overlaps the device forward."""
    if num_threads <= 1:
        for it in items:
            yield fn(it)
        return
    import collections
    import concurrent.futures

    with concurrent.futures.ThreadPoolExecutor(num_threads) as ex:
        pending = collections.deque()
        it = iter(items)
        exhausted = False
        while True:
            while not exhausted and len(pending) < depth:
                try:
                    pending.append(ex.submit(fn, next(it)))
                except StopIteration:
                    exhausted = True
            if not pending:
                return
            yield pending.popleft().result()


def iter_wavs_from_list(data_list, target_rate=16000, num_splits=1,
                        split_index=0, read_threads=4):
    """Stream (key, wav) from a jsonl list; the num_splits/split_index
    stripe is applied on list lines BEFORE any audio is read, so each split
    only touches its own files."""
    import functools

    def entries():
        with open(data_list) as f:
            for i, line in enumerate(f):
                if i % num_splits == split_index:
                    yield json.loads(line)

    yield from _threaded_map(functools.partial(_load_entry,
                                               target_rate=target_rate),
                             entries(), read_threads)


def iter_feats_from_list(data_list, num_splits=1, split_index=0):
    """Stream (key, (T, F) feat) from a feat list: kaldi scp lines
    ('key ark:offset') or jsonl ({'key', 'feat': 'ark:offset'}) — the same
    formats the data_type=feat training pipeline consumes."""
    from wespeaker_tpu.data.pipeline import read_vec_scp_iterlines

    def scp_lines():
        with open(data_list) as f:
            for i, line in enumerate(f):
                line = line.strip()
                if not line or i % num_splits != split_index:
                    continue
                if line.startswith("{"):
                    obj = json.loads(line)
                    yield f"{obj['key']} {obj['feat']}"
                else:
                    yield line

    yield from read_vec_scp_iterlines(scp_lines())


def extract(config, checkpoint_path, data_list, out_prefix, batch_size=8,
            overrides=None, num_splits=1, split_index=0, bf16=False,
            read_threads=4, precision="default", data_parallel=False,
            pow2_buckets=False, **kwargs):
    """num_splits/split_index stripe the data list across independent
    processes/hosts (tools/extract_embedding.sh:40-75 equivalent).
    bf16=True casts weights+activations to bfloat16 for ~2x throughput
    (embedding cosine vs fp32 stays >= 0.9999). read_threads overlaps host
    wav IO with the device forward.

    precision: XLA matmul/conv precision for fp32 tensors. On TPU the
    'default' lowering computes fp32 contractions at bfloat16 MXU precision;
    pass 'high' (bf16x3 passes, ~fp32 accuracy) or 'float32' (exact, ~2x
    slower convs) for strict-parity runs against the reference CPU/GPU
    numerics. No effect on CPU or on --bf16 runs."""
    configs = parse_config_or_kwargs(config, overrides, **kwargs)
    import contextlib
    prec_ctx = (contextlib.nullcontext() if precision == "default"
                else jax.default_matmul_precision(
                    {"high": "high", "float32": "float32"}[precision]))
    with prec_ctx:
        return _extract_inner(configs, checkpoint_path, data_list,
                              out_prefix, batch_size, num_splits,
                              split_index, bf16, read_threads,
                              data_parallel=data_parallel,
                              pow2_buckets=pow2_buckets)


def _extract_inner(configs, checkpoint_path, data_list, out_prefix,
                   batch_size, num_splits, split_index, bf16, read_threads,
                   data_parallel=False, pow2_buckets=False):
    built, variables = load_model_for_eval(configs, checkpoint_path)
    # --num_splits still stripes across hosts on a multi-host pod
    from wespeaker_tpu.utils.eval_device import prepare_eval_placement
    variables, compute_dtype, batch_sharding, batch_size = \
        prepare_eval_placement(variables, bf16, data_parallel, batch_size)
    n_dev = len(jax.devices()) if data_parallel else 1

    dataset_args = configs.get("dataset_args", {})
    fbank_args = dataset_args.get("fbank_args", {})
    rate = dataset_args.get("resample_rate", 16000)
    fbank_cfg = FbankConfig(
        num_mel_bins=fbank_args.get("num_mel_bins",
                                    configs["model_args"].get("feat_dim", 80)),
        frame_length_ms=fbank_args.get("frame_length", 25),
        frame_shift_ms=fbank_args.get("frame_shift", 10),
        sample_rate=rate,
        dither=0.0)
    # feat mode: the list carries precomputed (T, F) matrices instead of
    # wavs — the deprecated feats-IO path, and the feat_stack trainable
    # layer-mix path (precompute_feats --layer all)
    feat_mode = (built.frontend_type == "feat_stack"
                 or configs.get("data_type") == "feat")
    embed_fn = jax.jit(make_eval_embed_fn(
        built.model, fbank_cfg, featurize_fn=built.featurize_eval,
        compute_dtype=compute_dtype, from_wav=not feat_mode))

    if feat_mode:
        from wespeaker_tpu.data.dataset import eval_feat_batches
        feats = iter_feats_from_list(data_list, num_splits, split_index)
        batches = eval_feat_batches(feats, batch_size=batch_size,
                                    pow2_buckets=pow2_buckets)
        data_key = "feat"
    else:
        wavs = iter_wavs_from_list(data_list, rate, num_splits, split_index,
                                   read_threads)
        batches = eval_batches(wavs, batch_size=batch_size,
                               quantum_samples=rate,
                               pow2_buckets=pow2_buckets)
        data_key = "wav"

    def items():
        for batch in batches:
            x, mask, n_real = batch[data_key], batch["mask"], \
                len(batch["key"])
            if n_dev > 1 and n_real % n_dev:
                # pad the batch dim to the device count by replicating the
                # last row (real data, so masked pooling stays well-defined;
                # the extra outputs are dropped below)
                pad = n_dev - n_real % n_dev
                x = np.concatenate([x, np.repeat(x[-1:], pad, 0)])
                mask = np.concatenate([mask, np.repeat(mask[-1:], pad, 0)])
            x, mask = jnp.asarray(x), jnp.asarray(mask)
            if batch_sharding is not None:
                x = jax.device_put(x, batch_sharding)
                mask = jax.device_put(mask, batch_sharding)
            emb = np.asarray(embed_fn(variables,
                                      {data_key: x, "mask": mask}))[:n_real]
            for key, vec in zip(batch["key"], emb):
                yield key, vec

    ark, scp = write_vec_ark_scp(out_prefix, items())
    logging.info(f"wrote {ark} / {scp}")
    return scp


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data_list", required=True)
    ap.add_argument("--out_prefix", required=True)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--num_splits", type=int, default=1)
    ap.add_argument("--split_index", type=int, default=0)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 weights+activations (~2x, cosine >= 0.9999)")
    ap.add_argument("--data_parallel", action="store_true",
                    help="shard eval batches over all local devices in this "
                         "one process (weights replicated); combine with "
                         "--num_splits to stripe across hosts")
    ap.add_argument("--precision", choices=["default", "high", "float32"],
                    default="default",
                    help="fp32 contraction precision on TPU: default="
                         "bf16 MXU passes, high=bf16x3 (~fp32), float32="
                         "exact strict-parity (slowest)")
    ap.add_argument("--read_threads", type=int, default=4,
                    help="wav-reading threads overlapping the device fwd")
    ap.add_argument("--pow2_buckets", action="store_true",
                    help="geometric (power-of-2) length buckets instead of "
                         "the linear 1s grid: bounds distinct compiled "
                         "shapes to ~log2(max_len) — use with Pallas fused "
                         "kernels (CAMPPlus fused_blocks) whose per-shape "
                         "Mosaic compile is minutes")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    extract(args.config, args.checkpoint, args.data_list, args.out_prefix,
            args.batch_size, args.overrides, args.num_splits,
            args.split_index, bf16=args.bf16, read_threads=args.read_threads,
            precision=args.precision, data_parallel=args.data_parallel,
            pow2_buckets=args.pow2_buckets)


if __name__ == "__main__":
    main()
