"""Flax WavLM vs HF torch WavLMModel (random tiny configs, converted
weights) — the s3prl-upstream replacement (s3prl.py:23-93)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from wespeaker_tpu.frontend.wavlm import (Featurizer, WavLMConfig,
                                          WavLMFrontend,
                                          fold_wavlm_weight_norm)
from wespeaker_tpu.utils.torch_compat import (rules_for,
                                              torch_to_flax_variables)


def _tiny_cfg(stable: bool):
    return dict(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16,) * 7,
        conv_kernel=(10, 3, 3, 3, 3, 2, 2), conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_bias=stable,
        feat_extract_norm="layer" if stable else "group",
        do_stable_layer_norm=stable,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=40, max_bucket_distance=100,
    )


@pytest.mark.parametrize("stable", [False, True],
                         ids=["base-postln", "large-stableln"])
def test_wavlm_matches_torch(stable):
    kw = _tiny_cfg(stable)
    tcfg = transformers.WavLMConfig(
        **kw, num_feat_extract_layers=7, layerdrop=0.0, hidden_dropout=0.0,
        activation_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0)
    torch.manual_seed(0)
    ref = transformers.WavLMModel(tcfg).eval()

    rng = np.random.default_rng(0)
    wav = rng.uniform(-0.5, 0.5, (2, 8000)).astype(np.float32)
    with torch.no_grad():
        out = ref(torch.from_numpy(wav), output_hidden_states=True)
    want_last = out.last_hidden_state.numpy()
    want_hidden = [h.numpy() for h in out.hidden_states]

    cfg = WavLMConfig(**{k: v for k, v in kw.items()})
    model = WavLMFrontend(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4000)))
    sd = fold_wavlm_weight_norm(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    variables = torch_to_flax_variables(sd, variables,
                                        rules=rules_for("WavLM"))
    hidden, last = model.apply(variables, jnp.asarray(wav))

    assert len(hidden) == len(want_hidden)
    np.testing.assert_allclose(np.asarray(last), want_last,
                               atol=2e-4, rtol=1e-3)
    for got, want in zip(hidden, want_hidden):
        np.testing.assert_allclose(np.asarray(got), want,
                                   atol=2e-4, rtol=1e-3)


def test_wavlm_masked_batch_matches_solo():
    """Padded-batch forward with a sample mask == unpadded forward on the
    valid prefix (the multi-utterance bucket-eval contract)."""
    cfg = WavLMConfig(**_tiny_cfg(True))
    model = WavLMFrontend(cfg, normalize_input=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4000)))

    rng = np.random.default_rng(1)
    n1, n2 = 8000, 5120
    wavs = np.zeros((2, n1), np.float32)
    wavs[0] = rng.uniform(-0.5, 0.5, n1)
    wavs[1, :n2] = rng.uniform(-0.5, 0.5, n2)
    mask = np.zeros((2, n1), np.float32)
    mask[0], mask[1, :n2] = 1.0, 1.0

    _, last = model.apply(variables, jnp.asarray(wavs),
                          mask=jnp.asarray(mask))
    _, solo = model.apply(variables, jnp.asarray(wavs[1:2, :n2]))
    t_valid = cfg.feat_extract_output_lengths(n2)
    np.testing.assert_allclose(np.asarray(last)[1, :t_valid],
                               np.asarray(solo)[0], atol=1e-4)


def test_wavlm_config_build_masked_eval():
    """Config-driven wavlm frontend (train/composite.py): padded bucket
    embeddings equal unpadded whole-utterance embeddings."""
    from wespeaker_tpu.train.composite import build_model

    configs = {
        "model": "ECAPA_TDNN",
        "model_args": {"embed_dim": 16, "channels": 16},
        "dataset_args": {
            "frontend": "wavlm",
            "wavlm_args": dict(_tiny_cfg(False), normalize_input=True),
        },
    }
    built = build_model(configs)
    variables = built.model.init(jax.random.PRNGKey(0), built.init_example,
                                 train=False)
    rng = np.random.default_rng(5)
    n1, n2 = 8000, 5120
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
        # same tolerance as the fbank+ECAPA masked-eval test: the ECAPA
        # head's boundary frames account for the residual
        assert cos > 0.999, (i, cos)


def test_wavlm_featurizer_composite_with_ecapa():
    """Frontend contract end-to-end: WavLM + Featurizer + ECAPA head via
    FrontendSpeakerModel (the run_wavlm.sh pairing)."""
    from wespeaker_tpu.frontend.wavlm import WavLMWithFeaturizer
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
    from wespeaker_tpu.models.with_frontend import FrontendSpeakerModel

    cfg = WavLMConfig(**_tiny_cfg(False))
    frontend = WavLMWithFeaturizer(cfg, frozen=True)
    head = ECAPA_TDNN(channels=16, feat_dim=cfg.hidden_size, embed_dim=24)
    model = FrontendSpeakerModel(frontend, head, frozen_frontend=True)
    wav = jnp.asarray(np.random.default_rng(2).uniform(
        -0.5, 0.5, (2, 8000)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), wav, train=False)
    emb = model.apply(variables, wav, train=False)
    assert emb.shape == (2, 24)
    assert np.isfinite(np.asarray(emb)).all()
    # zero-init featurizer weights -> uniform layer average
    f = Featurizer(num_layers=3)
    fv = f.init(jax.random.PRNGKey(0), [jnp.ones((1, 2, 2))] * 3)
    np.testing.assert_allclose(
        np.asarray(f.apply(fv, [jnp.full((1, 2, 2), float(i))
                                for i in range(3)])), 1.0, atol=1e-6)

@pytest.mark.parametrize("family", ["hubert", "wav2vec2"])
def test_hubert_wav2vec2_match_torch(family):
    """use_rel_pos_bias=False turns the WavLM stack into the HuBERT /
    wav2vec 2.0 architecture (plain MHA) — parity vs the HF torch models
    (the other s3prl upstreams, s3prl.py:23-93)."""
    kw = _tiny_cfg(stable=False)
    kw.pop("num_buckets")
    kw.pop("max_bucket_distance")
    tkw = dict(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16,) * 7,
        conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_bias=False, feat_extract_norm="group",
        do_stable_layer_norm=False, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, num_feat_extract_layers=7,
        layerdrop=0.0, hidden_dropout=0.0, activation_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0)
    torch.manual_seed(0)
    if family == "hubert":
        ref = transformers.HubertModel(
            transformers.HubertConfig(**tkw)).eval()
    else:
        ref = transformers.Wav2Vec2Model(
            transformers.Wav2Vec2Config(**tkw)).eval()

    rng = np.random.default_rng(0)
    wav = rng.uniform(-0.5, 0.5, (2, 8000)).astype(np.float32)
    with torch.no_grad():
        out = ref(torch.from_numpy(wav), output_hidden_states=True)
    want_last = out.last_hidden_state.numpy()

    cfg = WavLMConfig(use_rel_pos_bias=False,
                      **{k: v for k, v in kw.items()})
    model = WavLMFrontend(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4000)))
    sd = fold_wavlm_weight_norm(
        {k: v.numpy() for k, v in ref.state_dict().items()
         if "masked_spec_embed" not in k})
    variables = torch_to_flax_variables(sd, variables,
                                        rules=rules_for("WavLM"))
    hidden, last = model.apply(variables, jnp.asarray(wav))
    np.testing.assert_allclose(np.asarray(last), want_last,
                               atol=2e-4, rtol=1e-3)
