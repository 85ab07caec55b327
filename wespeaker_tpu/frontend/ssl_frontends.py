"""Neural SSL frontends (WavLM / wav2vec2 / w2v-bert family).

Reference surface: wespeaker/frontend/s3prl.py (S3PRL upstream + learned
layer-weighted sum) and wespeaker/frontend/w2vbert.py (HF w2v-bert-2.0
returning (all_hidden_states, last_hidden)).

Supported-upstream matrix (see docs/MIGRATING.md for the full table):

- WavLM (base/base+/large)  -> native flax port, torch-parity-tested:
  `frontend/wavlm.py::WavLMWithFeaturizer` (`dataset_args.frontend: wavlm`).
- HuBERT / wav2vec2         -> `frontend/wavlm.py` mode flags (the three
  share the conv-extractor + transformer trunk) or `Wav2Vec2Frontend`
  below (HF Flax wrapper).
- w2v-bert 2.0              -> native flax conformer, torch-parity-tested:
  `frontend/w2vbert.py::W2VBertFrontend` (`dataset_args.frontend: w2vbert`).
- Whisper encoder           -> `frontend/whisper_encoder.py`
  (`dataset_args.frontend: whisper_encoder`).
- Other s3prl upstream names (the reference's S3prlFrontend accepts any,
  s3prl.py:23-93) have no TPU path; `bin/precompute_feats.py` runs any
  torch.jit / local-HF / s3prl upstream on the host CPU once, writes
  kaldi 'FM' feats, and training consumes them with `data_type: feat`
  (tests/test_precompute_feats.py pins the round trip).

This module keeps the pieces shared across those frontends: the learned
layer-weighting `Featurizer` and the generic HF-Flax wav2vec2 wrapper.

Model-axis sharding: the native ports carry flax logical axis names
('embed'/'heads'/'mlp'); map them over the ('model',) mesh axis with
nn.logical_to_mesh_sharding (tests/test_whisper_sharding.py shows the
recipe).
"""



import flax.linen as nn
import jax.numpy as jnp


class Featurizer(nn.Module):
    """Learned softmax-weighted sum over frontend hidden states
    (the s3prl Featurizer role, s3prl.py:23-93)."""
    num_layers: int

    @nn.compact
    def __call__(self, hidden_states):
        w = self.param("weights", nn.initializers.zeros, (self.num_layers,))
        ws = nn.softmax(w)
        stacked = jnp.stack(hidden_states, axis=0)  # (L, B, T, D)
        return jnp.tensordot(ws, stacked, axes=1)


class StackedFeatFrontend(nn.Module):
    """Trainable layer mixing over HOST-precomputed hidden states.

    Closes the reference's in-loop s3prl layer-weighting for upstreams with
    no native flax port (reference frontend/s3prl.py:50-66 learns the layer
    mix during training): `bin/precompute_feats --layer all` writes every
    hidden layer concatenated on the feature axis, (T, L*D); this module
    splits the stack back into L layers and applies the same learned
    softmax Featurizer the native WavLM path uses — so the layer weights
    still train jointly with the speaker model, only the (frozen) upstream
    forward happens offline.

    Input (B, T, L*D) -> (B, T, D). Frame-rate preserving (time_stride 1),
    so padded-bucket frame masks pass through unchanged.
    """
    num_layers: int
    time_stride: int = 1

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        ld = x.shape[-1]
        assert ld % self.num_layers == 0, (ld, self.num_layers)
        d = ld // self.num_layers
        layers = [x[..., i * d:(i + 1) * d] for i in range(self.num_layers)]
        return Featurizer(self.num_layers, name="featurizer")(layers)


class Wav2Vec2Frontend:
    """Flax wav2vec2-family encoder as a speaker frontend.

    frontend(wav (B, N) float32 in [-1, 1]) ->
        (tuple of hidden states [(B, T, D)], last_hidden (B, T, D))
    """

    def __init__(self, model_name_or_config=None, frozen: bool = False,
                 dtype=jnp.float32):
        from transformers import FlaxWav2Vec2Model, Wav2Vec2Config

        self.frozen = frozen
        if model_name_or_config is None:
            model_name_or_config = "facebook/wav2vec2-large-lv60"
        if isinstance(model_name_or_config, str):
            self.model = FlaxWav2Vec2Model.from_pretrained(
                model_name_or_config, dtype=dtype)
        else:
            cfg = model_name_or_config
            if isinstance(cfg, dict):
                cfg = Wav2Vec2Config(**cfg)
            self.model = FlaxWav2Vec2Model(cfg, dtype=dtype)
        self.config = self.model.config
        self.output_size = self.config.hidden_size
        self.num_hidden_layers = self.config.num_hidden_layers

    @property
    def params(self):
        return self.model.params

    def __call__(self, wav, params=None):
        import jax

        out = self.model(wav, params=params or self.model.params,
                         output_hidden_states=True)
        hidden = tuple(out.hidden_states)
        last = out.last_hidden_state
        if self.frozen:
            hidden = tuple(jax.lax.stop_gradient(h) for h in hidden)
            last = jax.lax.stop_gradient(last)
        return hidden, last

    @staticmethod
    def tiny_test_config(hidden_size=32, num_layers=2):
        """Small random config for tests (no network needed)."""
        return dict(hidden_size=hidden_size, num_hidden_layers=num_layers,
                    num_attention_heads=2, intermediate_size=hidden_size * 2,
                    conv_dim=(16,) * 7, num_feat_extract_layers=7,
                    do_stable_layer_norm=True, feat_extract_norm="layer",
                    output_hidden_states=True)


def s3prl_frontend(*args, **kwargs):
    """The torch s3prl upstream zoo is not TPU-native. The WavLM upstream —
    the one the reference recipes actually use (run_wavlm.sh) — has a native
    flax port with torch parity: frontend/wavlm.py::WavLMWithFeaturizer
    (config `dataset_args.frontend: wavlm`). Other upstreams: use
    Wav2Vec2Frontend (flax) or precompute features (data_type='feat')."""
    from wespeaker_tpu.frontend.wavlm import WavLMWithFeaturizer

    return WavLMWithFeaturizer(*args, **kwargs)


def w2vbert_frontend(*args, **kwargs):
    """w2v-bert 2.0 now has a native flax port with torch parity:
    frontend/w2vbert.py::W2VBertFrontend (config
    `dataset_args.frontend: w2vbert`)."""
    from wespeaker_tpu.frontend.w2vbert import W2VBertFrontend

    return W2VBertFrontend(*args, **kwargs)
