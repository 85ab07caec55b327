"""The jit-compiled supervised training step.

Replaces the reference's host-driven epoch loop body
(wespeaker/utils/executor.py:23-96 + bin/train.py AMP/DDP machinery) with a
single pure function compiled once per shape:

    wav chunk -> fbank (device DSP) -> CMVN -> spec-aug -> speaker model
    -> margin projection -> CE loss -> grads -> optax update

TPU-native properties:
  - LR and margin schedules are evaluated *inside* the step on the traced
    iteration counter — ramping never triggers recompilation and there are no
    per-step host->device transfers of hyperparameters.
  - Under jit over a ('data',) mesh, gradients and BatchNorm batch statistics
    are reduced globally by XLA collectives (the DDP all-reduce equivalent;
    BN is effectively sync-BN, strictly stronger than the reference).
  - bf16 compute (configurable) keeps the MXU fed; master params stay fp32.
"""

import dataclasses
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from wespeaker_tpu.frontend.fbank import FbankConfig, apply_cmvn, compute_fbank


@dataclasses.dataclass(frozen=True)
class AugConfig:
    """Device-side spec-aug (wespeaker/dataset/processor.py:550-587)."""
    spec_aug: bool = True
    spec_aug_prob: float = 0.6
    num_t_mask: int = 1
    num_f_mask: int = 1
    max_t: int = 10
    max_f: int = 8

    @classmethod
    def from_spec_aug_args(cls, args, enabled: bool = True) -> "AugConfig":
        """Build from a config dict, accepting the reference YAML key
        `prob` (processor.py:550 spec_aug) for spec_aug_prob. Unknown keys
        raise rather than silently falling back to defaults."""
        args = dict(args or {})
        if "prob" in args:
            args["spec_aug_prob"] = args.pop("prob")
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = sorted(set(args) - known)
        if unknown:
            raise ValueError(f"unknown spec_aug_args keys {unknown}; "
                             f"supported: {sorted(known)}")
        return cls(spec_aug=enabled, **args)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray
    # batch_stats of the projection head — non-empty only for heads that
    # carry BatchNorm (the plain softmax head, reference projections.py:559)
    proj_stats: Any = flax.struct.field(default_factory=dict)


def amp_cast(tree, compute_dtype):
    """Compute-dtype view of an f32 param tree (f32 master weights stay in
    the optimizer; the astype transpose returns f32 grads). Identity for
    f32."""
    if compute_dtype == jnp.float32:
        return tree
    return jax.tree_util.tree_map(
        lambda a: (a.astype(compute_dtype)
                   if a.dtype == jnp.float32 else a), tree)


def spec_aug_batch(key, feat, cfg: AugConfig):
    """Random time/freq masking, vectorized over the batch. Mirrors the
    per-utterance reference semantics: start ~ U[0, dim-1], width ~ U[1, max],
    applied with probability spec_aug_prob per utterance."""
    b, t, f = feat.shape
    keys = jax.random.split(key, 3)
    apply = (jax.random.uniform(keys[0], (b, 1, 1)) < cfg.spec_aug_prob)

    def mask_axis(subkey, dim, max_w, count):
        k1, k2 = jax.random.split(subkey)
        start = jax.random.randint(k1, (b, count, 1), 0, dim)
        width = jax.random.randint(k2, (b, count, 1), 1, max_w + 1)
        pos = jnp.arange(dim)[None, None, :]
        hit = (pos >= start) & (pos < start + width)  # (b, count, dim)
        return ~jnp.any(hit, axis=1)  # (b, dim) True=keep

    tmask = mask_axis(keys[1], t, cfg.max_t, cfg.num_t_mask)[:, :, None]
    fmask = mask_axis(keys[2], f, cfg.max_f, cfg.num_f_mask)[:, None, :]
    keep = tmask & fmask
    return jnp.where(apply & ~keep, 0.0, feat)


def features_from_batch(batch, fbank_cfg: FbankConfig, aug: Optional[AugConfig],
                        key, train: bool, data_blocks: int = 1,
                        fbank_conv_dtype=None):
    """batch: {'wav': (B, N)} or {'feat': (B, T, F)} -> normalized features.
    data_blocks = process count whose front-packed local batches were
    concatenated into this global batch (device-aug packing contract)."""
    if "feat" in batch:
        feat = batch["feat"]
    else:
        wav = batch["wav"]
        if train and "aug_mode" in batch:
            # device-side reverb/noise aug (host only picked the samples)
            from wespeaker_tpu.train.device_aug import device_augment
            wav = device_augment(wav, batch["aug_mode"], batch["aug_rir"],
                                 batch["aug_noise"], batch["aug_snr"],
                                 blocks=data_blocks)
        wav = wav * (1 << 15)
        if train and fbank_cfg.dither != 0.0:
            # waveform-level dither so the fused-conv fbank fast path stays
            # usable in training (kaldi dithers per frame; overlapping
            # windows then see independent noise — the correlation
            # difference is irrelevant for a regularizer, and eval always
            # runs dither=0)
            key, sub = jax.random.split(key)
            wav = wav + fbank_cfg.dither * jax.random.normal(
                sub, wav.shape, dtype=wav.dtype)
            fbank_cfg = dataclasses.replace(fbank_cfg, dither=0.0)
        feat = compute_fbank(wav, fbank_cfg, key=None,
                             conv_dtype=fbank_conv_dtype)
    feat = apply_cmvn(feat)
    if train and aug is not None and aug.spec_aug:
        key, sub = jax.random.split(key)
        feat = spec_aug_batch(sub, feat, aug)
    return feat


def make_train_step(model, projection, tx: optax.GradientTransformation,
                    lr_fn: Callable, margin_fn: Callable,
                    fbank_cfg: FbankConfig = FbankConfig(dither=1.0),
                    aug: AugConfig = AugConfig(),
                    compute_dtype=jnp.float32,
                    featurize_fn: Optional[Callable] = None,
                    data_blocks: int = 1):
    """Build the pure train-step function. `tx` must be built with
    optax.inject_hyperparams so `lr_fn(step)` can be written into
    opt_state.hyperparams['learning_rate'] inside the trace.
    data_blocks: jax.process_count() — the device-aug fields are
    front-packed per process-local block (see device_augment).

    featurize_fn(batch, key) overrides the default wav->fbank->cmvn->spec-aug
    chain — the hook for neural/DSP frontends whose model input is not kaldi
    fbank (whisper log-mel, TFMel; reference executor.py:42-48)."""

    def loss_fn(params, batch_stats, proj_stats, batch, margin, key):
        if featurize_fn is None:
            # NOTE: fbank stays f32 even under bf16 AMP — the reference
            # computes features outside the autocast region, and bf16
            # quantization of the DFT (~0.4% rel) is ~100x the dither
            # noise; a convergence test measurably slowed when tried.
            feat = features_from_batch(batch, fbank_cfg, aug, key,
                                       train=True, data_blocks=data_blocks)
        else:
            feat = featurize_fn(batch, key)
        feat = feat.astype(compute_dtype)
        # true AMP: master params stay f32 in the optimizer; the forward
        # sees compute_dtype params so matmuls hit the bf16 MXU path (grad
        # of astype casts grads back to f32). Without this, f32 params
        # promote every matmul back to f32 and the feature cast is a
        # no-op. TPU reductions accumulate in f32, so BN batch stats stay
        # accurate; stored running stats remain f32 via the EMA's dtype
        # promotion.
        mparams = amp_cast(params["model"], compute_dtype)
        variables = {"params": mparams, "batch_stats": batch_stats}
        embed, mutated = model.apply(
            variables, feat, train=True, mutable=["batch_stats"])
        embed = embed.astype(jnp.float32)
        if proj_stats:
            # the plain softmax head carries a BatchNorm on the embedding
            # (reference projections.py:559-573): run it in train mode and
            # carry its running stats alongside the model's
            out, pmut = projection.apply(
                {"params": params["projection"], "batch_stats": proj_stats},
                embed, batch["label"], margin, train=True,
                mutable=["batch_stats"])
            new_proj_stats = pmut["batch_stats"]
        else:
            out = projection.apply({"params": params["projection"]}, embed,
                                   batch["label"], margin)
            new_proj_stats = proj_stats
        if isinstance(out, tuple):
            logits, loss = out
        else:
            logits = out
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]).mean()
        acc = jnp.mean(
            (jnp.argmax(logits, axis=-1) == batch["label"]).astype(jnp.float32))
        return loss, (mutated["batch_stats"], new_proj_stats, acc)

    def train_step(state: TrainState, batch):
        step = state.step
        lr = lr_fn(step)
        margin = margin_fn(step)
        key = jax.random.fold_in(state.rng, step)

        (loss, (new_bs, new_ps, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   state.proj_stats, batch, margin, key)

        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=step + 1, params=new_params,
                                  batch_stats=new_bs, proj_stats=new_ps,
                                  opt_state=new_opt_state)
        metrics = {"loss": loss, "acc": acc, "lr": lr, "margin": margin}
        return new_state, metrics

    return train_step


def make_eval_embed_fn(model, fbank_cfg: FbankConfig = FbankConfig(),
                       compute_dtype=jnp.float32, from_wav: bool = True,
                       featurize_fn: Optional[Callable] = None,
                       fbank_conv_dtype=None):
    """Embedding-extraction forward: wav/feat (+ optional frame mask) ->
    (B, D) embeddings, mirroring wespeaker/bin/extract.py:112-135 (no aug,
    no dither, CMVN on).

    featurize_fn(batch) -> (feat, frame_mask) overrides the fbank+CMVN
    default for non-fbank frontends (the composite model then normalizes
    the frontend output itself)."""

    def embed_fn(variables, batch):
        if featurize_fn is not None:
            feat, fmask = featurize_fn(batch)
            feat = feat.astype(compute_dtype)
            emb = model.apply(variables, feat, mask=fmask, train=False)
            return emb.astype(jnp.float32)
        if from_wav:
            wav = batch["wav"] * (1 << 15)
            feat = compute_fbank(wav, fbank_cfg, key=None,
                                 conv_dtype=fbank_conv_dtype)
            mask = batch.get("mask")
            if mask is not None:
                from wespeaker_tpu.train.composite import (
                    _sample_to_frame_mask)
                fmask = _sample_to_frame_mask(
                    mask, feat.shape[-2], fbank_cfg.window_shift,
                    fbank_cfg.window_size).astype(feat.dtype)
            else:
                fmask = None
        else:
            feat, fmask = batch["feat"], batch.get("mask")
        feat = apply_cmvn(feat, mask=fmask)
        feat = feat.astype(compute_dtype)
        emb = model.apply(variables, feat, mask=fmask, train=False)
        return emb.astype(jnp.float32)

    return embed_fn


def init_train_state(model, projection, tx, rng, feat_dim=80,
                     embed_dim=192, example=None) -> TrainState:
    """`example` overrides the (2, 32, feat_dim) feature dummy for models
    whose input is not a feature map (wav-native composites)."""
    import flax.linen as nn

    k1, k2, k3 = jax.random.split(rng, 3)
    if example is None:
        example = jnp.zeros((2, 32, feat_dim))
    mvars = model.init(k1, example, train=False)
    # strip logical-partitioning boxes (whisper frontend annotates its
    # matmuls for model-axis sharding); the trainer shards via device_put
    mvars = nn.meta.unbox(mvars)
    pvars = projection.init(k2, jnp.zeros((2, embed_dim)),
                            jnp.zeros((2,), jnp.int32))
    params = {"model": mvars["params"], "projection": pvars["params"]}
    batch_stats = mvars.get("batch_stats", {})
    proj_stats = pvars.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state, rng=k3,
                      proj_stats=proj_stats)
