"""Flax SSL frontend + adapter-MFA end-to-end (tiny random config)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

transformers = pytest.importorskip("transformers")

from wespeaker_tpu.frontend.ssl_frontends import Featurizer, Wav2Vec2Frontend
from wespeaker_tpu.models.w2vbert_adapter_mfa import W2VBert_Adapter_MFA


def test_wav2vec2_frontend_and_adapter_mfa():
    fe = Wav2Vec2Frontend(Wav2Vec2Frontend.tiny_test_config())
    wav = jnp.asarray(np.random.default_rng(0).uniform(
        -0.5, 0.5, (2, 8000)).astype(np.float32))
    hidden, last = fe(wav)
    assert len(hidden) == fe.num_hidden_layers + 1
    assert last.shape[-1] == fe.output_size

    head = W2VBert_Adapter_MFA(feat_dim=fe.output_size, embed_dim=32,
                               n_mfa_layers=2, adapter_dim=16,
                               num_frontend_hidden_layers=fe.num_hidden_layers)
    variables = head.init(jax.random.PRNGKey(0), hidden)
    emb = head.apply(variables, hidden)
    assert emb.shape == (2, 32)
    assert np.isfinite(np.asarray(emb)).all()


def test_featurizer_weighted_sum():
    states = [jnp.full((2, 5, 4), float(i)) for i in range(3)]
    f = Featurizer(num_layers=3)
    variables = f.init(jax.random.PRNGKey(0), states)
    out = f.apply(variables, states)
    # zero-init weights -> uniform average = 1.0
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_frontend_speaker_model_composite():
    """Tiny whisper encoder + PMFA head end-to-end (the Whisper-PMFA
    composite the trainer attaches)."""
    from wespeaker_tpu.frontend.whisper_encoder import AudioEncoder
    from wespeaker_tpu.models.whisper_PMFA import whisper_PMFA
    from wespeaker_tpu.models.with_frontend import FrontendSpeakerModel

    enc = AudioEncoder(n_mels=24, n_ctx=50, n_state=32, n_head=4, n_layer=2,
                       layer_st=0, layer_ed=1)
    head = whisper_PMFA(output_size=64, embedding_dim=32)
    model = FrontendSpeakerModel(enc, head, frozen_frontend=True)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 100, 24)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    emb = model.apply(variables, x)
    assert emb.shape == (2, 32)
    assert np.isfinite(np.asarray(emb)).all()
