"""Flax w2v-bert 2.0 vs HF torch Wav2Vec2BertModel + SeamlessM4T feature
extractor parity (the reference frontend, wespeaker/frontend/w2vbert.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from wespeaker_tpu.frontend.w2vbert import (W2VBertConfig, W2VBertFrontend,
                                            w2vbert_features)
from wespeaker_tpu.utils.torch_compat import (rules_for,
                                              torch_to_flax_variables)

TINY = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, feature_projection_input_dim=24,
            left_max_position_embeddings=8, right_max_position_embeddings=2,
            conv_depthwise_kernel_size=7)


def test_w2vbert_features_match_seamless_extractor():
    from transformers import SeamlessM4TFeatureExtractor

    fe = SeamlessM4TFeatureExtractor(feature_size=160)
    rng = np.random.default_rng(0)
    wav = rng.uniform(-0.5, 0.5, 16000 * 2 + 240).astype(np.float32)
    want = fe(wav, sampling_rate=16000, return_tensors="np",
              padding="do_not_pad")["input_features"][0]
    got, _ = w2vbert_features(jnp.asarray(wav)[None])
    got = np.asarray(got)[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-4)


def test_w2vbert_encoder_matches_torch():
    tcfg = transformers.Wav2Vec2BertConfig(
        **TINY, position_embeddings_type="relative_key", layerdrop=0.0,
        hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, conformer_conv_dropout=0.0, add_adapter=False)
    torch.manual_seed(0)
    ref = transformers.Wav2Vec2BertModel(tcfg).eval()

    rng = np.random.default_rng(1)
    feats = rng.normal(size=(2, 50, 24)).astype(np.float32)
    with torch.no_grad():
        out = ref(torch.from_numpy(feats), output_hidden_states=True)
    want_last = out.last_hidden_state.numpy()
    want_hidden = [h.numpy() for h in out.hidden_states]

    model = W2VBertFrontend(W2VBertConfig(**TINY))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 24)))
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = torch_to_flax_variables(sd, variables,
                                        rules=rules_for("Wav2Vec2Bert"))
    hidden, last = model.apply(variables, jnp.asarray(feats))
    assert len(hidden) == len(want_hidden)
    np.testing.assert_allclose(np.asarray(last), want_last,
                               atol=2e-4, rtol=1e-3)
    for got, want in zip(hidden, want_hidden):
        np.testing.assert_allclose(np.asarray(got), want,
                                   atol=2e-4, rtol=1e-3)


def test_w2vbert_masked_batch_matches_solo():
    cfg = W2VBertConfig(**TINY)
    model = W2VBertFrontend(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 24)))
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(2, 40, 24)).astype(np.float32)
    tv = 25
    feats[1, tv:] = 0.0
    mask = np.ones((2, 40), np.float32)
    mask[1, tv:] = 0.0
    _, last = model.apply(variables, jnp.asarray(feats),
                          mask=jnp.asarray(mask))
    _, solo = model.apply(variables, jnp.asarray(feats[1:2, :tv]))
    np.testing.assert_allclose(np.asarray(last)[1, :tv], np.asarray(solo)[0],
                               atol=2e-5)


def test_w2vbert_config_build_masked_eval():
    """Config-driven w2vbert frontend + adapter-MFA head: padded bucket
    embeddings track unpadded whole-utterance embeddings."""
    from wespeaker_tpu.train.composite import build_model

    configs = {
        "model": "W2VBert_Adapter_MFA",
        "model_args": {"embed_dim": 16, "n_mfa_layers": 2,
                       "adapter_dim": 8},
        "dataset_args": {
            "frontend": "w2vbert",
            "w2vbert_args": dict(TINY, frozen=True,
                                 feature_projection_input_dim=24),
        },
    }
    built = build_model(configs)
    variables = built.model.init(jax.random.PRNGKey(0), built.init_example,
                                 train=False)
    rng = np.random.default_rng(4)
    n1, n2 = 16000, 11200
    wavs = np.zeros((2, n1), np.float32)
    wavs[0] = rng.uniform(-0.5, 0.5, n1)
    wavs[1, :n2] = rng.uniform(-0.5, 0.5, n2)
    mask = np.zeros((2, n1), np.float32)
    mask[0], mask[1, :n2] = 1.0, 1.0

    x, m = built.featurize_eval({"wav": jnp.asarray(wavs),
                                 "mask": jnp.asarray(mask)})
    padded = np.asarray(built.model.apply(variables, x, mask=m, train=False))
    for i, n in enumerate((n1, n2)):
        x, m = built.featurize_eval({"wav": jnp.asarray(wavs[i:i + 1, :n])})
        solo = np.asarray(built.model.apply(variables, x, mask=m,
                                            train=False))[0]
        cos = np.dot(padded[i], solo) / (
            np.linalg.norm(padded[i]) * np.linalg.norm(solo))
        assert cos > 0.999, (i, cos)


def test_w2vbert_adapter_mfa_composite():
    """w2vbert frontend + adapter-MFA head through FrontendSpeakerModel
    (the reference W2VBert recipes' pairing)."""
    from wespeaker_tpu.models.w2vbert_adapter_mfa import W2VBert_Adapter_MFA
    from wespeaker_tpu.models.with_frontend import FrontendSpeakerModel

    cfg = W2VBertConfig(**TINY)
    frontend = W2VBertFrontend(cfg, frozen=True)
    head = W2VBert_Adapter_MFA(feat_dim=cfg.hidden_size, embed_dim=16,
                               n_mfa_layers=2, adapter_dim=8,
                               num_frontend_hidden_layers=cfg.num_hidden_layers)
    model = FrontendSpeakerModel(frontend, head, frozen_frontend=True,
                                 feed_all_hidden=True, normalize=False)
    rng = np.random.default_rng(3)
    wav = rng.uniform(-0.5, 0.5, (2, 16000)).astype(np.float32)
    feats, fmask = w2vbert_features(jnp.asarray(wav), num_mel_bins=12)
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    emb = model.apply(variables, feats, train=False)
    assert emb.shape == (2, 16)
    assert np.isfinite(np.asarray(emb)).all()