"""Config-driven frontend attach for the trainer/extractor CLIs.

Behavioral spec: wespeaker/bin/train.py:110-124 — `dataset_args.frontend`
selects a non-fbank frontend, `<name>_args` configures it, the speaker
model's feat_dim is overridden with the frontend output size, and the
frontend runs inside the train loop. Here the neural frontends are flax
modules fused into one jitted program with the speaker model
(models/with_frontend.py), and the DSP part (whisper log-mel / TFMel) is a
`featurize` function evaluated inside the same jit.
"""

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

from wespeaker_tpu.frontend.tfmel import TFMelConfig, tfmel
from wespeaker_tpu.frontend.whisper_mel import WhisperMelConfig, whisper_logmel
from wespeaker_tpu.models import get_speaker_model


@dataclasses.dataclass
class BuiltModel:
    model: Any                      # flax module: feat (+mask,train) -> emb
    featurize_train: Optional[Callable]  # (batch, key) -> feat; None=fbank
    featurize_eval: Optional[Callable]   # (batch) -> (feat, mask); None=fbank
    init_feat_dim: int              # feature dim for model.init dummy input
    frontend_type: str

    @property
    def init_example(self):
        """Dummy input for model.init: waveform for wav-native frontends
        (wavlm/s3prl/hubert/wav2vec2), (B, T, F) features otherwise."""
        if self.frontend_type in ("wavlm", "s3prl", "hubert", "wav2vec2"):
            return jnp.zeros((1, self.init_feat_dim))
        return jnp.zeros((1, 32, self.init_feat_dim))


def _sample_to_frame_mask(mask, num_frames, hop, win):
    """(B, N) sample-validity mask -> (B, T) frame mask: frame t is valid
    iff its window lies within the valid samples."""
    valid = jnp.sum(mask, axis=-1, keepdims=True)
    idx = jnp.arange(num_frames)[None, :] * hop
    return (idx + win <= valid + 1e-3).astype(mask.dtype)


def build_model(configs: Dict[str, Any]) -> BuiltModel:
    dataset_args = configs.get("dataset_args", {})
    frontend_type = dataset_args.get("frontend", "fbank")
    model_args = dict(configs["model_args"])

    if frontend_type == "fbank":
        model = get_speaker_model(configs["model"])(**model_args)
        return BuiltModel(model, None, None,
                          model_args.get("feat_dim", 80), frontend_type)

    if frontend_type == "whisper_encoder":
        from wespeaker_tpu.frontend.whisper_encoder import (
            WhisperEncoderFrontend)
        from wespeaker_tpu.models.with_frontend import FrontendSpeakerModel

        fe_args = dict(dataset_args.get("whisper_encoder_args", {}))
        fe_args.pop("model_path", None)  # weights come from checkpoints
        frozen = fe_args.pop("frozen", False)
        frontend = WhisperEncoderFrontend(**fe_args)
        # feat_dim of the head = concat of the selected encoder layers
        # (reference train.py:118-121 via frontend.output_size())
        model_args["feat_dim"] = frontend.output_size * (
            frontend.layer_ed - frontend.layer_st + 1)
        head = get_speaker_model(configs["model"])(**model_args)
        model = FrontendSpeakerModel(
            frontend, head, frozen_frontend=frozen,
            normalize=dataset_args.get("cmvn", True))
        mel_cfg = WhisperMelConfig(num_mel_bins=frontend.n_mels)

        def featurize_train(batch, key):
            return whisper_logmel(batch["wav"], mel_cfg)

        def featurize_eval(batch):
            feat = whisper_logmel(batch["wav"], mel_cfg)
            mask = batch.get("mask")
            if mask is not None:
                mask = _sample_to_frame_mask(
                    mask, feat.shape[-2], mel_cfg.hop_length,
                    mel_cfg.hop_length)
            return feat, mask

        return BuiltModel(model, featurize_train, featurize_eval,
                          frontend.n_mels, frontend_type)

    if frontend_type in ("wavlm", "s3prl", "hubert", "wav2vec2"):
        # TPU-native replacement for the s3prl upstreams: flax WavLM /
        # HuBERT / wav2vec2 (parity-tested vs HF torch; hubert/wav2vec2 are
        # the same stack with use_rel_pos_bias=False) + learned-layer-weight
        # Featurizer
        from wespeaker_tpu.frontend.wavlm import (WavLMConfig,
                                                  WavLMWithFeaturizer)
        from wespeaker_tpu.models.with_frontend import FrontendSpeakerModel

        fe_args = dict(dataset_args.get(
            f"{frontend_type}_args", dataset_args.get("s3prl_args", {})))
        # reference s3prl configs carry the model choice in
        # upstream_args.name (s3prl.py:23-93) and knobs with no meaning
        # here: download_dir (weights load via the checkpoint converter),
        # multilayer_feature/layer (the Featurizer always learns layer
        # weights), frame_length. frame_shift must be the stack's 20 ms.
        upstream = dict(fe_args.pop("upstream_args", None) or {})
        name = str(upstream.get("name", ""))
        for k in ("download_dir", "multilayer_feature", "layer",
                  "frame_length"):
            fe_args.pop(k, None)
        fs = fe_args.pop("frame_shift", None)
        if fs not in (None, 20):
            raise ValueError("wavlm-family frontends produce 20 ms frames; "
                             f"s3prl frame_shift={fs} is unsupported")
        frozen = fe_args.pop("frozen", False)
        normalize_input = fe_args.pop("normalize_input", "large" in name)
        size = fe_args.pop("size", "large" if "large" in name else "base")
        if frontend_type in ("hubert", "wav2vec2"):
            cfg = (WavLMConfig.hubert_large() if size == "large"
                   else WavLMConfig.hubert_base())
        else:
            cfg = (WavLMConfig.large() if size == "large"
                   else WavLMConfig.base())
        if fe_args:
            known = {f.name for f in dataclasses.fields(WavLMConfig)}
            unknown = sorted(set(fe_args) - known)
            if unknown:
                raise ValueError(f"unknown {frontend_type}_args keys "
                                 f"{unknown}")
            cfg = dataclasses.replace(cfg, **fe_args)
        frontend = WavLMWithFeaturizer(cfg, frozen=frozen,
                                       normalize_input=normalize_input)
        model_args["feat_dim"] = cfg.hidden_size
        head = get_speaker_model(configs["model"])(**model_args)
        model = FrontendSpeakerModel(
            frontend, head, frozen_frontend=frozen,
            normalize=dataset_args.get("cmvn", True))
        # model input IS the waveform; masks stay sample-level and the
        # composite downsamples them with exact conv-length arithmetic
        min_wav = 4000  # init-example samples (> one conv receptive field)

        def featurize_train(batch, key):
            return batch["wav"]

        def featurize_eval(batch):
            return batch["wav"], batch.get("mask")

        return BuiltModel(model, featurize_train, featurize_eval,
                          min_wav, frontend_type)

    if frontend_type == "feat_stack":
        # trainable layer weighting over bin/precompute_feats --layer all
        # output: data_type=feat rows are (T, L*D) stacked hidden states;
        # the Featurizer learns the layer mix jointly with the head,
        # closing the reference's in-loop s3prl weighting
        # (frontend/s3prl.py:50-66) for upstreams with no native port
        from wespeaker_tpu.frontend.ssl_frontends import StackedFeatFrontend
        from wespeaker_tpu.models.with_frontend import FrontendSpeakerModel

        fe_args = dict(dataset_args.get("feat_stack_args", {}))
        num_layers = int(fe_args.pop("num_layers"))
        if fe_args:
            raise ValueError(f"unknown feat_stack_args keys "
                             f"{sorted(fe_args)}")
        layer_dim = model_args.get("feat_dim", 80)  # per-layer D, head input
        frontend = StackedFeatFrontend(num_layers=num_layers)
        head = get_speaker_model(configs["model"])(**model_args)
        # CMVN on the mixed output, like the native frontends
        # (reference utils/executor.py:50-54)
        model = FrontendSpeakerModel(
            frontend, head, normalize=dataset_args.get("cmvn", True))

        def featurize_train(batch, key):
            return batch["feat"]  # mixing + CMVN happen inside the model

        def featurize_eval(batch):
            return batch["feat"], batch.get("mask")

        return BuiltModel(model, featurize_train, featurize_eval,
                          num_layers * layer_dim, frontend_type)

    if frontend_type == "w2vbert":
        # flax w2v-bert 2.0 port (parity-tested vs HF torch); pairs with the
        # adapter-MFA head taking all hidden states (reference w2vbert
        # recipes). DSP: SeamlessM4T stacked-fbank features on device.
        from wespeaker_tpu.frontend.w2vbert import (W2VBertConfig,
                                                    W2VBertFrontend,
                                                    w2vbert_features)
        from wespeaker_tpu.models.with_frontend import FrontendSpeakerModel

        fe_args = dict(dataset_args.get("w2vbert_args", {}))
        for k in ("model_path", "use_lora", "lora_config_args",
                  "bnb_config_args"):
            fe_args.pop(k, None)
        frozen = fe_args.pop("frozen", False)
        cfg = W2VBertConfig(**fe_args)
        frontend = W2VBertFrontend(cfg, frozen=frozen)
        model_args["feat_dim"] = cfg.hidden_size
        feed_all = configs["model"].startswith("W2VBert")
        if feed_all:
            model_args.setdefault("num_frontend_hidden_layers",
                                  cfg.num_hidden_layers)
        head = get_speaker_model(configs["model"])(**model_args)
        model = FrontendSpeakerModel(
            frontend, head, frozen_frontend=frozen,
            feed_all_hidden=feed_all,
            normalize=dataset_args.get("cmvn", False))
        n_mels = cfg.feature_projection_input_dim // 2

        def featurize_train(batch, key):
            feat, _ = w2vbert_features(batch["wav"], num_mel_bins=n_mels)
            return feat

        def featurize_eval(batch):
            return w2vbert_features(batch["wav"], batch.get("mask"),
                                    num_mel_bins=n_mels)

        return BuiltModel(model, featurize_train, featurize_eval,
                          cfg.feature_projection_input_dim, frontend_type)

    if frontend_type == "tfmel":
        # DSP frontend: the features replace fbank, the model is unchanged
        # (reference frontend/tfmel.py: normalization happens inside)
        fe_args = dict(dataset_args.get("tfmel_args", {}))
        cfg = TFMelConfig(**fe_args)
        model_args["feat_dim"] = cfg.n_mels
        model = get_speaker_model(configs["model"])(**model_args)

        def featurize_train(batch, key):
            return tfmel(batch["wav"], cfg, train=True, key=key)

        def featurize_eval(batch):
            mask = batch.get("mask")
            n = batch["wav"].shape[-1]
            t = (n + 2 * (cfg.hop_length // 2)
                 - cfg.win_length) // cfg.hop_length + 1
            if mask is not None:
                mask = _sample_to_frame_mask(
                    mask, t, cfg.hop_length,
                    cfg.win_length - cfg.hop_length)
            feat = tfmel(batch["wav"], cfg, train=False, mask=mask)
            return feat, mask

        return BuiltModel(model, featurize_train, featurize_eval,
                          cfg.n_mels, frontend_type)

    raise KeyError(
        f"unknown frontend {frontend_type}; supported: fbank, tfmel, wavlm "
        "(also hubert/wav2vec2 modes), w2vbert, whisper_encoder, feat_stack "
        "(precomputed multi-layer feats) — see the "
        "supported-upstream matrix in frontend/ssl_frontends.py and "
        "docs/MIGRATING.md")