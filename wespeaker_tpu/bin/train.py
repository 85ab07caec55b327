"""Supervised trainer CLI.

Behavioral spec: wespeaker/bin/train.py:39-266 — config-driven: spk2id from
utt2spk, dataset, model+projection (num_class x3 under speed perturb),
iteration-granular LR/margin schedules with scale_ratio = world*batch/64,
per-epoch checkpoint save, filename-based resume.

TPU-native: one jitted train step over a ('data',) mesh (XLA grad psum = DDP
all-reduce), device-side fbank/cmvn/spec-aug, host pipeline prefetch.

Usage: python -m wespeaker_tpu.bin.train --config conf.yaml [k=v ...]
"""

import argparse
import logging
import os
import signal
import threading
import time

import jax
import jax.numpy as jnp

from wespeaker_tpu.data.dataset import (MPPrefetcher, Prefetcher,
                                        SpeakerDataset)
from wespeaker_tpu.data.pipeline import spk2id_from_utt2spk
from wespeaker_tpu.frontend import FbankConfig
from wespeaker_tpu.models.projections import get_projection
from wespeaker_tpu.train.composite import build_model
from wespeaker_tpu.parallel.mesh import (init_distributed, make_mesh,
                                         process_data_stripe,
                                         replicated, shard_batch)
from wespeaker_tpu.train import (AugConfig, init_train_state, make_train_step)
from wespeaker_tpu.train.optim import lr_scale_ratio, make_optimizer
from wespeaker_tpu.utils import checkpoint as ckpt
from wespeaker_tpu.utils.config import dump_yaml, parse_config_or_kwargs
from wespeaker_tpu.utils.schedulers import MarginScheduler, get_lr_scheduler


def setup_logger(exp_dir):
    os.makedirs(exp_dir, exist_ok=True)
    logger = logging.getLogger("wespeaker_tpu")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        for h in (logging.StreamHandler(),
                  logging.FileHandler(os.path.join(exp_dir, "train.log"))):
            h.setFormatter(fmt)
            logger.addHandler(h)
    return logger


def build_from_config(configs, num_class):
    built = build_model(configs)  # attaches non-fbank frontends
    proj_conf = dict(configs.get("projection_args", {}))
    proj_conf.setdefault("project_type", "arc_margin")
    proj_conf["embed_dim"] = configs["model_args"]["embed_dim"]
    proj_conf["num_class"] = num_class
    proj_conf.setdefault("scale", 32.0)
    proj_conf.setdefault("easy_margin", False)
    proj_conf.setdefault("do_lm", configs.get("do_lm", False))
    projection = get_projection(proj_conf)
    return built, projection


def _frontend_frozen_mask(params):
    """True for trainable leaves; False under the composite's frozen
    'frontend' child (torch requires_grad=False equivalent)."""
    def trainable(path, _):
        return not any(getattr(k, "key", None) == "frontend" for k in path)
    return jax.tree_util.tree_map_with_path(trainable, params)


def train(config: str, overrides=None, **kwargs):
    configs = parse_config_or_kwargs(config, overrides, **kwargs)
    exp_dir = configs["exp_dir"]
    model_dir = os.path.join(exp_dir, "models")
    os.makedirs(model_dir, exist_ok=True)
    logger = setup_logger(exp_dir)

    dist_args = configs.get("distributed_args", {})
    if dist_args:
        init_distributed(dist_args.get("coordinator"),
                         dist_args.get("num_processes"),
                         dist_args.get("process_id"))
    rank = jax.process_index()
    world = jax.process_count()
    mesh = make_mesh(
        model=configs.get("parallel_args", {}).get("model", 1))
    n_dev = mesh.devices.size
    # grouped/depthwise conv kernel gradient: XLA's native backward is
    # correct under pure DP (batch sharded over every axis) and ~9x
    # faster for depthwise stages; the hand-rolled GSPMD-safe path is
    # only needed when a model axis replicates the batch
    # (ops/grouped_conv.py module docstring).
    from wespeaker_tpu.ops.grouped_conv import set_kernel_grad_mode
    set_kernel_grad_mode(
        "native" if mesh.shape["model"] == 1 else "safe")
    # tap-packed dW for small-channel 3x3 convs (ops/conv_dw_pack.py):
    # a measured counterfactual that LOSES to XLA's conv-backprop-filter
    # on v5e (docs/PERF.md round-5 backward study) — default stays
    # native; conv_dw_mode: packed in the config re-enables it for
    # re-measurement on other hardware (single-device only: the Pallas
    # kernel has no GSPMD partitioning rule).
    from wespeaker_tpu.ops.conv_dw_pack import set_conv_dw_mode
    set_conv_dw_mode(configs.get("conv_dw_mode", "native"))

    spk2id = spk2id_from_utt2spk(configs["spk2id"]
                                 if "spk2id" in configs
                                 else configs["utt2spk"])
    dataset_args = configs["dataset_args"]
    lm_keep_3x = False
    if configs.get("do_lm") and configs["data_type"] != "feat" \
            and dataset_args.get("speed_perturb", True):
        # large-margin fine-tune resumes from a speed-perturbed checkpoint:
        # keep the 3x classifier rows so the margin head loads, but train
        # without speed perturb (reference train.py:140-148)
        logger.info("do_lm: speed perturb disabled, classifier keeps 3x rows")
        dataset_args = {**dataset_args, "speed_perturb": False}
        lm_keep_3x = True
    if configs["data_type"] == "feat":
        # the feat parser joins scp rows to speakers itself
        # (data/dataset.py::_epoch_iter feat branch)
        dataset_args = {**dataset_args, "utt2spk": configs["utt2spk"]}
    ds_args = (configs["data_type"], configs["train_data"], dataset_args,
               spk2id)
    stripe, num_stripes = process_data_stripe(mesh)
    ds_kwargs = dict(reverb_store_prefix=configs.get("reverb_data"),
                     noise_store_prefix=configs.get("noise_data"),
                     rank=stripe, world_size=num_stripes,
                     seed=configs.get("seed", 42))
    dataset = SpeakerDataset(*ds_args, **ds_kwargs)
    num_class = dataset.num_classes() * (3 if lm_keep_3x else 1)
    model_axis = mesh.shape["model"]
    if model_axis > 1 and num_class % model_axis:
        # pad the classifier to a multiple of the model axis so its rows
        # shard evenly; padded rows are never targets and just train as
        # always-negative classes
        num_class = -(-num_class // model_axis) * model_axis
    logger.info(f"speakers: {len(spk2id)} classes: {num_class} "
                f"devices: {n_dev} hosts: {world}")

    built, projection = build_from_config(configs, num_class)
    model, feat_dim = built.model, built.init_feat_dim
    tx = make_optimizer(
        configs,
        _frontend_frozen_mask
        if getattr(model, "frozen_frontend", False) else None)

    # our configs put batch_size in dataset_args; reference YAMLs put it in
    # dataloader_args (reference train.py:99) — accept both
    batch_size = dataset_args.get(
        "batch_size", configs.get("dataloader_args", {}).get("batch_size",
                                                             64))
    # batch is sharded over the 'data' axis only; with a model axis the
    # per-device batch rides each model group
    global_batch = batch_size * mesh.shape["data"]
    num_epochs = configs.get("num_epochs", 10)
    # explicit samples_per_epoch always wins (the pipeline repeats
    # indefinitely, so an epoch is just an accounting unit); otherwise one
    # epoch = one pass over the list (raw/feat: utterances per line; shard:
    # ~1000 utts per tar line)
    num_samples = configs.get("samples_per_epoch")
    if num_samples is None:
        with open(configs["train_data"]) as f:
            num_samples = sum(1 for _ in f)
        if configs["data_type"] == "shard":
            num_samples *= 1000
    epoch_iter = max(num_samples // (global_batch), 1)

    sched_args = dict(configs.get("scheduler_args", {}))
    sched_args.setdefault("initial_lr", 0.1)
    sched_args.setdefault("final_lr", 5e-5)
    sched_args.setdefault("warm_up_epoch", 6)
    sched_args["num_epochs"] = num_epochs
    sched_args["epoch_iter"] = epoch_iter
    sched_args["scale_ratio"] = lr_scale_ratio(1, global_batch)
    lr_fn = get_lr_scheduler(configs.get("scheduler", "ExponentialDecrease"),
                             **sched_args)
    margin_args = dict(configs.get("margin_scheduler_args",
                                   configs.get("margin_update", {})))
    margin_fn = MarginScheduler(
        epoch_iter=epoch_iter,
        increase_start_epoch=margin_args.get("increase_start_epoch", 20),
        fix_start_epoch=margin_args.get("fix_start_epoch", 40),
        initial_margin=margin_args.get("initial_margin", 0.0),
        final_margin=margin_args.get("final_margin", 0.2),
        increase_type=margin_args.get("increase_type", "exp"))

    fbank_args = dataset_args.get("fbank_args", {})
    fbank_cfg = FbankConfig(
        num_mel_bins=fbank_args.get("num_mel_bins", feat_dim),
        frame_length_ms=fbank_args.get("frame_length", 25),
        frame_shift_ms=fbank_args.get("frame_shift", 10),
        sample_rate=dataset_args.get("resample_rate", 16000),
        dither=fbank_args.get("dither", 1.0))
    aug = AugConfig.from_spec_aug_args(
        dataset_args.get("spec_aug_args", {}),
        enabled=dataset_args.get("spec_aug", True))

    step_fn = make_train_step(
        model, projection, tx, lr_fn, margin_fn, fbank_cfg, aug,
        compute_dtype=jnp.bfloat16 if configs.get("enable_amp") else
        jnp.float32,
        featurize_fn=built.featurize_train,
        data_blocks=num_stripes)
    state = init_train_state(model, projection, tx,
                             jax.random.PRNGKey(configs.get("seed", 42)),
                             feat_dim=feat_dim,
                             embed_dim=configs["model_args"]["embed_dim"],
                             example=built.init_example)

    start_epoch = 0
    if configs.get("model_init"):
        # weights-only init (no epoch resume, fresh projection): the SSL
        # fine-tuning entry point (reference train.py:130-133) — e.g.
        # cnceleb/v3_finetune starting from a DINO-pretrained backbone.
        variables = {"params": state.params["model"],
                     "batch_stats": state.batch_stats}
        loaded = ckpt.load_checkpoint(configs["model_init"], variables)
        state = state.replace(
            params={"model": loaded["params"],
                    "projection": state.params["projection"]},
            batch_stats=loaded["batch_stats"])
        logger.info(f"initialized model from {configs['model_init']}")
    if configs.get("checkpoint"):
        # tolerant load: projection rows are truncated / re-initialized when
        # the class count changed (speed-perturb -> LM transitions), like the
        # reference's strict=False load (utils/checkpoint.py:33-67)
        variables = {"params": state.params["model"],
                     "batch_stats": state.batch_stats,
                     "projection": state.params["projection"],
                     "projection_batch_stats": state.proj_stats}
        loaded = ckpt.load_checkpoint(configs["checkpoint"], variables)
        state = state.replace(
            params={"model": loaded["params"],
                    "projection": loaded.get("projection",
                                             state.params["projection"])},
            batch_stats=loaded["batch_stats"],
            proj_stats=loaded.get("projection_batch_stats",
                                  state.proj_stats))
        start_epoch = ckpt.parse_start_epoch(configs["checkpoint"])
        logger.info(f"resumed from {configs['checkpoint']} "
                    f"at epoch {start_epoch}")

    rep = replicated(mesh)
    if mesh.shape["model"] > 1:
        # tensor-parallel margin head: the (num_class, embed) weight is the
        # largest training matrix at VoxBlink-scale class counts; shard its
        # rows over 'model' and let GSPMD insert the logits all-gather
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard_w = NamedSharding(mesh, P("model", None))

        def place(path, leaf):
            names = [str(getattr(p, "key", getattr(p, "name", "")))
                     for p in path]
            if "projection" in names and "weight" in names:
                return jax.device_put(leaf, shard_w)
            return jax.device_put(leaf, rep)

        state = jax.tree_util.tree_map_with_path(place, state)
        step_jit = jax.jit(step_fn)
    else:
        state = jax.device_put(state, rep)
        step_jit = jax.jit(step_fn, out_shardings=(rep, rep))

    if rank == 0:
        dump_yaml({**configs, "num_class": num_class,
                   "epoch_iter": epoch_iter}, os.path.join(exp_dir,
                                                           "config.yaml"))

    log_interval = configs.get("log_batch_interval", 100)
    save_interval = configs.get("save_epoch_interval", 1)
    num_avg = configs.get("num_avg", 1)
    num_workers = configs.get("dataloader_args", {}).get("num_workers", 0)
    # each process loads only its rank-striped share of the global batch
    # (the dataset already strides utterances by rank); shard_batch
    # assembles the global array from the per-process rows
    assert global_batch % num_stripes == 0, (global_batch, num_stripes)
    local_batch = global_batch // num_stripes
    if num_workers > 0:
        prefetch = MPPrefetcher(
            ds_args, ds_kwargs, local_batch, num_workers=num_workers,
            depth=configs.get("dataloader_args", {}).get("prefetch", 4))
    else:
        prefetch = Prefetcher(dataset.batches(local_batch))
    def save_state(path):
        """Collective on every rank (the TP projection weight can span
        hosts, making its shards non-addressable from rank 0 — device_get
        alone would raise); only rank 0 writes."""
        variables = {"params": state.params["model"],
                     "batch_stats": state.batch_stats,
                     "projection": state.params["projection"]}
        if state.proj_stats:
            variables["projection_batch_stats"] = state.proj_stats
        if any(isinstance(leaf, jax.Array) and not leaf.is_fully_addressable
               for leaf in jax.tree_util.tree_leaves(variables)):
            # re-jit to a replicated sharding: GSPMD inserts the
            # all-gather over ICI and every host gets addressable copies
            variables = jax.jit(lambda t: t, out_shardings=rep)(variables)
        if rank == 0:
            ckpt.save_checkpoint(path, jax.device_get(variables))

    # preemption safety: maintenance events / pod reschedules deliver
    # SIGTERM; finish the in-flight step, save preempt_model_<epoch>.ckpt
    # and exit 0 so the restarted job resumes with
    # checkpoint=.../preempt_model_<epoch>.ckpt (restarts that epoch —
    # parse_start_epoch). The reference has only epoch-level restart
    # (train.py:168-175); dataset state is intentionally not checkpointed
    # (infinite repeat + per-epoch reshuffle, dataset.py:114-133).
    preempted = threading.Event()
    if threading.current_thread() is threading.main_thread():
        signal.signal(signal.SIGTERM, lambda s, f: preempted.set())

    # profile_args: {start_step, num_steps, log_dir} captures a
    # jax.profiler timeline of global steps [start, start+num) to
    # exp_dir/profile (view in XProf/TensorBoard) — the SURVEY §5
    # observability deliverable; the reference has no profiling hooks.
    prof = configs.get("profile_args") or {}
    prof_start = prof.get("start_step")
    prof_stop = (prof_start + prof.get("num_steps", 5)
                 if prof_start is not None else None)
    prof_dir = prof.get("log_dir", os.path.join(exp_dir, "profile"))
    prof_active = False
    gstep = 0

    batches = iter(prefetch)
    for epoch in range(start_epoch, num_epochs):
        t0 = time.time()
        for it in range(epoch_iter):
            if rank == 0 and gstep == prof_start and not prof_active:
                jax.block_until_ready(state.params)
                jax.profiler.start_trace(prof_dir)
                prof_active = True
            batch = next(batches)
            device_batch = shard_batch(
                mesh, {k: v for k, v in batch.items() if k != "key"})
            state, metrics = step_jit(state, device_batch)
            gstep += 1
            if prof_active and gstep >= prof_stop:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                prof_active = False
                logger.info(f"profiler trace of steps [{prof_start}, "
                            f"{prof_stop}) written to {prof_dir}")
            if it % log_interval == 0:
                m = jax.device_get(metrics)
                logger.info(
                    f"epoch {epoch} it {it}/{epoch_iter} "
                    f"loss {float(m['loss']):.4f} acc {float(m['acc']):.4f} "
                    f"lr {float(m['lr']):.6f} margin "
                    f"{float(m['margin']):.3f}")
            if preempted.is_set():
                if prof_active:
                    jax.profiler.stop_trace()
                    prof_active = False
                jax.block_until_ready(state.params)
                path = os.path.join(model_dir, f"preempt_model_{epoch}.ckpt")
                save_state(path)  # collective: every rank participates
                logger.info(f"SIGTERM: saved {path} at epoch {epoch} it "
                            f"{it}; resume with checkpoint={path}")
                if hasattr(prefetch, "close"):
                    prefetch.close()
                return state
        logger.info(f"epoch {epoch} done in {time.time() - t0:.1f}s")
        # save every save_epoch_interval epochs plus the last num_avg epochs
        # (averaging window), reference train.py:252-257; the reference
        # counts epochs from 1, ours from 0, hence epoch + 1
        # all ranks evaluate the (deterministic) condition and join the
        # collective inside save_state; rank 0 writes
        if ((epoch + 1) % save_interval == 0
                or epoch + 1 > num_epochs - num_avg):
            save_state(os.path.join(model_dir, f"model_{epoch}.ckpt"))
    if prof_active:  # profile window extended past the last step
        jax.profiler.stop_trace()
    last = os.path.join(model_dir, f"model_{num_epochs - 1}.ckpt")
    if rank == 0 and num_epochs > start_epoch and os.path.exists(last):
        # reference symlinks final_model.pt to the last epoch (train.py:259)
        final = os.path.join(model_dir, "final_model.ckpt")
        if os.path.lexists(final):
            os.remove(final)
        os.symlink(os.path.basename(last), final)
    if hasattr(prefetch, "close"):
        prefetch.close()
    return state


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    train(args.config, args.overrides)


if __name__ == "__main__":
    main()
