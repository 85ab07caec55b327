"""DINO SSL trainer CLI.

Behavioral spec: wespeaker/ssl/bin/train_dino.py:43-255 — multi-crop
dataset, student/teacher with EMA, cosine lr/wd/momentum schedules, teacher
temperature warmup, last-layer freeze. TPU-native: one jitted step over the
data mesh; fbank computed on device per crop.
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
from wespeaker_tpu.data.pipeline import make_crop_aug, spk2id_from_utt2spk
from wespeaker_tpu.frontend import FbankConfig
from wespeaker_tpu.ssl.featurize import make_ssl_featurize
from wespeaker_tpu.models import get_speaker_model
from wespeaker_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from wespeaker_tpu.ssl import dataset as ssl_data
from wespeaker_tpu.ssl import dino as D
from wespeaker_tpu.utils import checkpoint as ckpt
from wespeaker_tpu.utils.config import parse_config_or_kwargs


def train_dino(config: str, overrides=None, **kwargs):
    configs = parse_config_or_kwargs(config, overrides, **kwargs)
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
        # reference ssl/bin/train_dino.py:205-210
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
    dino_args = configs.get("dino_args", {})
    n_global = dino_args.get("global_chunk_num", 2)
    n_local = dino_args.get("local_chunk_num", 4)
    feat_dim = configs["model_args"].get("feat_dim", 80)
    embed_dim = configs["model_args"]["embed_dim"]

    backbone = get_speaker_model(configs["model"])(**configs["model_args"])
    head = D.DINOHead(out_dim=dino_args.get("head_out_dim", 65536),
                      hidden_dim=dino_args.get("head_hidden_dim", 2048),
                      bottleneck_dim=dino_args.get("bottleneck_dim", 256),
                      use_bn=dino_args.get("head_use_bn", False))

    batch = configs["dataset_args"].get("batch_size", 32) * n_dev
    num_epochs = configs.get("num_epochs", 10)
    with open(configs["train_data"]) as f:
        num_samples = sum(1 for _ in f)
    epoch_iter = max(num_samples // batch, 1)

    lr_fn = D.cosine_scheduler(
        dino_args.get("base_lr", 0.2) * batch / 256,
        dino_args.get("final_lr", 1e-5), num_epochs, epoch_iter,
        warmup_epochs=dino_args.get("warmup_epochs", 2))
    mom_fn = D.cosine_scheduler(dino_args.get("momentum_teacher", 0.996),
                                1.0, num_epochs, epoch_iter)
    temp_fn = D.teacher_temp_schedule(
        dino_args.get("warmup_teacher_temp", 0.04),
        dino_args.get("teacher_temp", 0.07), num_epochs, epoch_iter)

    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=0.0, momentum=0.9)
    cfg = D.DINOConfig(
        out_dim=head.out_dim, n_global=n_global, n_local=n_local,
        freeze_last_layer_iters=dino_args.get("freeze_last_layer_epochs", 1)
        * epoch_iter,
        clip_grad=dino_args.get("clip_grad", 3.0))
    apply_fn = D.make_apply_fn(backbone, head)
    step_fn = D.make_dino_train_step(
        apply_fn, tx, lr_fn, mom_fn, temp_fn, cfg,
        compute_dtype=jnp.bfloat16 if configs.get("enable_amp")
        else jnp.float32)
    state = D.init_dino_state(backbone, head, tx,
                              jax.random.PRNGKey(configs.get("seed", 42)),
                              feat_dim=feat_dim, embed_dim=embed_dim)

    fbank_cfg = FbankConfig(num_mel_bins=feat_dim, dither=0.0)
    featurize = make_ssl_featurize(fbank_cfg, configs["dataset_args"],
                                   configs.get("seed", 42))

    spk2id = spk2id_from_utt2spk(configs["utt2spk"])
    ds_args = dict(configs["dataset_args"])
    ds_args["speed_perturb"] = False
    # crops are taken from the WHOLE utterance and each view is augmented
    # independently (reference ssl/dataset/processor.py:49-216) — the
    # dataset must not pre-chunk or pre-augment
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
    g_len = int(dino_args.get("global_chunk_sec", 2.0) * sr)
    l_len = int(dino_args.get("local_chunk_sec", 1.0) * sr)

    # full-trainer-state resume (student+teacher+opt+center+step): the
    # reference restarts SSL runs from model weights only; here the whole
    # DINOState round-trips so schedules/EMA/centering continue exactly —
    # also the recommended way to run long smokes through the tunnel,
    # whose per-transfer host leak bounds single-process step counts
    # (docs/PERF.md round-5 env note)
    start_epoch = 0
    trainer_ckpt = os.path.join(model_dir, "trainer_state.ckpt")
    if configs.get("resume") and os.path.exists(trainer_ckpt):
        import flax.serialization as fser
        with open(trainer_ckpt, "rb") as f:
            blob = fser.msgpack_restore(f.read())
        state = fser.from_state_dict(state, blob["state"])
        start_epoch = int(blob["epoch"])
        logging.info(f"resumed trainer state at epoch {start_epoch} "
                     f"(step {int(state.step)})")

    def crops():
        rng = np.random.default_rng(configs.get("seed", 42)
                                    + 7717 * start_epoch)
        epoch = start_epoch
        while True:
            data = dataset._epoch_iter(epoch)
            data = ssl_data.multi_crop(data, g_len, l_len, n_global, n_local,
                                       aug_fn=crop_aug, rng=rng)
            # per-process rows; shard_batch assembles the global array
            yield from ssl_data.dino_batch(data, batch // batch_factor)
            epoch += 1

    rep = replicated(mesh)
    state = jax.device_put(state, rep)
    step_jit = jax.jit(step_fn, out_shardings=(rep, rep))
    log_interval = configs.get("log_batch_interval", 50)

    # stop_epoch (exclusive) ends this PROCESS early without compressing
    # the schedules (which are built from num_epochs): segmented runs pass
    # resume=true stop_epoch=K, then relaunch — each segment continues the
    # same cosine schedules from the restored state.step
    stop_epoch = min(num_epochs, configs.get("stop_epoch") or num_epochs)
    it = start_epoch * epoch_iter
    batches = iter(Prefetcher(crops()))
    for epoch in range(start_epoch, stop_epoch):
        t0 = time.time()
        for _ in range(epoch_iter):
            b = next(batches)
            gfeat = featurize(jnp.asarray(b["global_wav"]))
            lfeat = featurize(jnp.asarray(b["local_wav"]))
            device_batch = shard_batch(mesh, {"global_feat": gfeat,
                                              "local_feat": lfeat})
            state, m = step_jit(state, device_batch)
            if it % log_interval == 0:
                logging.info(
                    f"epoch {epoch} it {it} loss {float(m['loss']):.4f} "
                    f"lr {float(m['lr']):.5f} m {float(m['momentum']):.4f} "
                    f"temp {float(m['teacher_temp']):.3f}")
            it += 1
        logging.info(f"epoch {epoch} done in {time.time() - t0:.1f}s")
        if rank == 0:
            variables = jax.device_get({
                "params": state.teacher["backbone"],
                "batch_stats": state.teacher_stats["backbone"],
                "student_params": state.student,
                "student_stats": state.student_stats,
            })
            ckpt.save_checkpoint(
                os.path.join(model_dir, f"model_{epoch}.ckpt"), variables)
            import flax.serialization as fser
            host_state = jax.device_get(state)
            with open(trainer_ckpt, "wb") as f:
                f.write(fser.msgpack_serialize(jax.tree_util.tree_map(
                    np.asarray,
                    {"epoch": epoch + 1,
                     "state": fser.to_state_dict(host_state)})))
    return state


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    train_dino(args.config, args.overrides)


if __name__ == "__main__":
    main()
