"""MoCo / SimCLR contrastive SSL trainer CLI.

Behavioral spec: wespeaker/ssl/bin/train_contrastive.py — two augmented
views per utterance; MoCo keeps a momentum key encoder + negative queue,
SimCLR trains InfoNCE over both views.
"""

import argparse
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wespeaker_tpu.data.dataset import Prefetcher, SpeakerDataset
from wespeaker_tpu.data.pipeline import (get_random_chunk, make_crop_aug,
                                          spk2id_from_utt2spk)
from wespeaker_tpu.frontend import FbankConfig
from wespeaker_tpu.ssl.featurize import make_ssl_featurize
from wespeaker_tpu.models import get_speaker_model
from wespeaker_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from wespeaker_tpu.ssl import contrastive as C
from wespeaker_tpu.ssl.dino import cosine_scheduler
from wespeaker_tpu.utils import checkpoint as ckpt
from wespeaker_tpu.utils.config import parse_config_or_kwargs


def _two_view_batches(dataset, batch, chunk_len, seed, aug_fn=None):
    """Two independently chunked (and augmented) views per utterance
    (reference ssl/dataset/processor.py: per-view aug)."""
    rng = np.random.default_rng(seed)
    epoch = 0
    while True:
        buf = []
        for sample in dataset._epoch_iter(epoch):
            q = get_random_chunk(sample["wav"], chunk_len, rng)
            k = get_random_chunk(sample["wav"], chunk_len, rng)
            if aug_fn is not None:
                q, k = aug_fn(q, rng), aug_fn(k, rng)
            buf.append((q, k))
            if len(buf) == batch:
                yield {
                    "q": np.stack([b[0] for b in buf]).astype(np.float32),
                    "k": np.stack([b[1] for b in buf]).astype(np.float32),
                }
                buf = []
        epoch += 1


def train_contrastive(config: str, overrides=None, **kwargs):
    configs = parse_config_or_kwargs(config, overrides, **kwargs)
    method = configs.get("ssl_method", "moco")
    exp_dir = configs["exp_dir"]
    model_dir = os.path.join(exp_dir, "models")
    os.makedirs(model_dir, exist_ok=True)
    logging.basicConfig(level=logging.INFO)

    dist_args = configs.get("distributed_args", {})
    if dist_args:
        from wespeaker_tpu.parallel.mesh import init_distributed
        init_distributed(dist_args.get("coordinator"),
                         dist_args.get("num_processes"),
                         dist_args.get("process_id"))
    rank = jax.process_index()
    if rank == 0:
        # later stages (extract with $exp/config.yaml) read it back —
        # reference ssl/bin/train_contrastive.py:180-185
        from wespeaker_tpu.utils.config import dump_yaml
        dump_yaml(configs, os.path.join(exp_dir, "config.yaml"))
    mesh = make_mesh()
    # same selection as bin/train.py: XLA's native grouped-conv kernel
    # gradient is correct (and up to 9x faster for depthwise stages) under
    # pure DP; the GSPMD-safe path is only needed with a model axis
    from wespeaker_tpu.ops.grouped_conv import set_kernel_grad_mode
    set_kernel_grad_mode(
        "native" if mesh.shape.get("model", 1) == 1 else "safe")
    from wespeaker_tpu.parallel.mesh import process_data_stripe
    stripe, batch_factor = process_data_stripe(mesh)
    n_dev = mesh.devices.size
    feat_dim = configs["model_args"].get("feat_dim", 80)
    embed_dim = configs["model_args"]["embed_dim"]
    backbone = get_speaker_model(configs["model"])(**configs["model_args"])
    variables = backbone.init(jax.random.PRNGKey(configs.get("seed", 42)),
                              jnp.zeros((2, 32, feat_dim)))

    def encode_fn(params, stats, feats, train):
        v = {"params": params, "batch_stats": stats}
        if train:
            emb, mut = backbone.apply(v, feats, train=True,
                                      mutable=["batch_stats"])
            return emb, mut["batch_stats"]
        return backbone.apply(v, feats, train=False), stats

    batch = configs["dataset_args"].get("batch_size", 32) * n_dev
    num_epochs = configs.get("num_epochs", 10)
    with open(configs["train_data"]) as f:
        num_samples = sum(1 for _ in f)
    epoch_iter = max(num_samples // batch, 1)
    ssl_args = configs.get("ssl_args", {})
    compute_dtype = (jnp.bfloat16 if configs.get("enable_amp")
                     else jnp.float32)
    lr_fn = cosine_scheduler(ssl_args.get("base_lr", 0.06) * batch / 256,
                             ssl_args.get("final_lr", 1e-5), num_epochs,
                             epoch_iter,
                             warmup_epochs=ssl_args.get("warmup_epochs", 0))
    tx = optax.inject_hyperparams(optax.sgd)(
        learning_rate=0.0, momentum=0.9)

    if method == "moco":
        K = ssl_args.get("queue_size", 4096)
        assert K % batch == 0, "queue size must be divisible by batch"
        state = C.MoCoState(
            step=jnp.zeros((), jnp.int32),
            query_params=variables["params"],
            key_params=jax.tree_util.tree_map(jnp.array,
                                              variables["params"]),
            batch_stats=variables.get("batch_stats", {}),
            key_stats=jax.tree_util.tree_map(
                jnp.array, variables.get("batch_stats", {})),
            queue=C.l2norm(jax.random.normal(
                jax.random.PRNGKey(1), (K, embed_dim))),
            queue_ptr=jnp.zeros((), jnp.int32),
            opt_state=tx.init(variables["params"]),
            rng=jax.random.PRNGKey(2))
        step_fn = C.make_moco_train_step(
            encode_fn, tx, lr_fn, m=ssl_args.get("momentum", 0.999),
            T=ssl_args.get("temperature", 0.07),
            compute_dtype=compute_dtype)
    else:
        state = C.SimCLRState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            rng=jax.random.PRNGKey(2))
        step_fn = C.make_simclr_train_step(
            encode_fn, tx, lr_fn, n_views=2,
            T=ssl_args.get("temperature", 0.07),
            compute_dtype=compute_dtype)

    spk2id = spk2id_from_utt2spk(configs["utt2spk"])
    ds_args = dict(configs["dataset_args"])
    ds_args["speed_perturb"] = False
    # views are chunked from the whole utterance and augmented per view
    ds_args["defer_chunk_aug"] = True
    dataset = SpeakerDataset(configs["data_type"], configs["train_data"],
                             ds_args, spk2id,
                             noise_store_prefix=configs.get("noise_data"),
                             reverb_store_prefix=configs.get("reverb_data"),
                             rank=stripe, world_size=batch_factor,
                             seed=configs.get("seed", 42))
    crop_aug = make_crop_aug(dataset.reverb, dataset.noise,
                             ds_args.get("aug_prob", 0.6))
    sr = ds_args.get("resample_rate", 16000)
    chunk_len = int(ssl_args.get("chunk_sec", 2.0) * sr)

    fbank_cfg = FbankConfig(num_mel_bins=feat_dim, dither=0.0)
    featurize = make_ssl_featurize(fbank_cfg, configs["dataset_args"],
                                   configs.get("seed", 42))

    rep = replicated(mesh)
    state = jax.device_put(state, rep)
    step_jit = jax.jit(step_fn, out_shardings=(rep, rep))
    log_interval = configs.get("log_batch_interval", 50)
    # per-process rows; shard_batch assembles the global array
    batches = iter(Prefetcher(_two_view_batches(
        dataset, batch // batch_factor, chunk_len, configs.get("seed", 42),
        crop_aug)))

    it = 0
    for epoch in range(num_epochs):
        t0 = time.time()
        for _ in range(epoch_iter):
            b = next(batches)
            if method == "moco":
                db = {"q_feat": featurize(jnp.asarray(b["q"])),
                      "k_feat": featurize(jnp.asarray(b["k"]))}
            else:
                both = featurize(jnp.asarray(
                    np.concatenate([b["q"], b["k"]])))
                db = {"feat": both}
            db = shard_batch(mesh, db)
            state, m = step_jit(state, db)
            if it % log_interval == 0:
                logging.info(f"epoch {epoch} it {it} "
                             f"loss {float(m['loss']):.4f} "
                             f"lr {float(m['lr']):.5f}")
            it += 1
        logging.info(f"epoch {epoch} done in {time.time() - t0:.1f}s")
        if rank == 0:
            params = (state.query_params if method == "moco"
                      else state.params)
            stats = state.batch_stats
            ckpt.save_checkpoint(
                os.path.join(model_dir, f"model_{epoch}.ckpt"),
                jax.device_get({"params": params, "batch_stats": stats}))
    return state


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    train_contrastive(args.config, args.overrides)


if __name__ == "__main__":
    main()
