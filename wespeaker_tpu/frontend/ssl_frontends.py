"""Neural SSL frontends (WavLM / wav2vec2 / w2v-bert family).

Reference surface: wespeaker/frontend/s3prl.py (S3PRL upstream + learned
layer-weighted sum) and wespeaker/frontend/w2vbert.py (HF w2v-bert-2.0
returning (all_hidden_states, last_hidden)).

TPU-native path: HuggingFace *Flax* speech encoders (wav2vec2 family has a
native Flax implementation) wrapped behind the frontend contract —
`__call__(wav) -> (tuple of hidden states, last_hidden)`. Checkpoints load
with from_pretrained when network/cache is available; tests instantiate
random tiny configs. Torch-only upstreams (s3prl WavLM, w2v-bert-2.0) are
gated with clear errors; their *downstream* heads (adapter-MFA, ECAPA,
featurizer weighting) are fully implemented and tested against random
hidden states.

Model-axis sharding: pass `params_partition_rules()` output to shard the
attention/MLP kernels of large checkpoints over the ('model',) mesh axis.
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
