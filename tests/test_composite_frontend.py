"""Neural/DSP frontend attach: whisper log-mel parity, composite masked
eval, frozen-frontend optimizer semantics, config-driven build."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wespeaker_tpu.frontend.whisper_mel import (WhisperMelConfig,
                                                whisper_logmel)
from wespeaker_tpu.train.composite import build_model


def test_whisper_logmel_matches_hf_feature_extractor():
    """Golden: transformers' WhisperFeatureExtractor implements the same
    transform as whisper.log_mel_spectrogram (the reference's frontend DSP,
    whisper_encoder.py:307-317)."""
    transformers = pytest.importorskip("transformers")
    fe = transformers.WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(0)
    wav = rng.uniform(-0.5, 0.5, 16000 * 2 + 37).astype(np.float32)
    want = fe(wav, sampling_rate=16000, padding="do_not_pad",
              return_tensors="np")["input_features"][0].T  # (T, 80)
    got = np.asarray(whisper_logmel(jnp.asarray(wav)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_whisper_logmel_batched_equals_single():
    rng = np.random.default_rng(1)
    wavs = rng.uniform(-0.5, 0.5, (3, 16000)).astype(np.float32)
    batched = np.asarray(whisper_logmel(jnp.asarray(wavs)))
    for i in range(3):
        single = np.asarray(whisper_logmel(jnp.asarray(wavs[i])))
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def _tiny_whisper_configs(frozen=False):
    return {
        "model": "whisper_PMFA_large_v2",
        "model_args": {"embed_dim": 16},
        "dataset_args": {
            "frontend": "whisper_encoder",
            "whisper_encoder_args": {
                "frozen": frozen, "n_mels": 16, "num_blocks": 2,
                "output_size": 32, "n_head": 4, "layer_st": 0,
                "layer_ed": 1, "n_ctx": 128,
            },
        },
    }


def test_whisper_composite_masked_eval_matches_unpadded():
    """Padded bucket extraction == whole-utterance forward through the
    attention-masked whisper encoder (cosine ~1)."""
    built = build_model(_tiny_whisper_configs())
    rng = np.random.default_rng(2)
    cfg = WhisperMelConfig(num_mel_bins=16)
    n1, n2 = 16000, 12800  # second utt padded by 3200 samples
    wavs = np.zeros((2, n1), np.float32)
    wavs[0] = rng.uniform(-0.5, 0.5, n1)
    wavs[1, :n2] = rng.uniform(-0.5, 0.5, n2)
    mask = np.zeros((2, n1), np.float32)
    mask[0], mask[1, :n2] = 1.0, 1.0

    feat = whisper_logmel(jnp.asarray(wavs), cfg)
    variables = built.model.init(jax.random.PRNGKey(0), feat[:, :32],
                                 train=False)

    pfeat, pmask = built.featurize_eval(
        {"wav": jnp.asarray(wavs), "mask": jnp.asarray(mask)})
    padded = np.asarray(built.model.apply(variables, pfeat, mask=pmask,
                                          train=False))

    for i, n in enumerate((n1, n2)):
        f, m = built.featurize_eval({"wav": jnp.asarray(wavs[i:i + 1, :n])})
        solo = np.asarray(built.model.apply(variables, f, mask=m,
                                            train=False))[0]
        cos = np.dot(padded[i], solo) / (
            np.linalg.norm(padded[i]) * np.linalg.norm(solo))
        # boundary STFT frames see zeros instead of batch=1's reflect pad;
        # everything else is exact
        assert cos > 0.9999, (i, cos)


@pytest.mark.slow
def test_frozen_frontend_params_do_not_move():
    """One SGD step (with weight decay) must leave the frozen frontend
    untouched — stop_gradient zeroes grads and optax.masked skips decay."""
    import optax

    from wespeaker_tpu.bin.train import _frontend_frozen_mask
    from wespeaker_tpu.models.projections import ArcMarginProduct
    from wespeaker_tpu.train import init_train_state, make_train_step
    from wespeaker_tpu.train.optim import make_optimizer
    from wespeaker_tpu.utils.schedulers import (ExponentialDecrease,
                                                MarginScheduler)

    built = build_model(_tiny_whisper_configs(frozen=True))
    projection = ArcMarginProduct(16, 8)
    tx = make_optimizer({"optimizer": "SGD",
                         "optimizer_args": {"weight_decay": 0.1}},
                        _frontend_frozen_mask)
    step_fn = make_train_step(
        built.model, projection, tx,
        ExponentialDecrease(1, 4, 0.1, 0.01, warm_up_epoch=0),
        MarginScheduler(4, 0, 1, 0.1, 0.1),
        featurize_fn=built.featurize_train)
    state = init_train_state(built.model, projection, tx,
                             jax.random.PRNGKey(0),
                             feat_dim=built.init_feat_dim, embed_dim=16)
    rng = np.random.default_rng(3)
    batch = {"wav": jnp.asarray(rng.uniform(-0.5, 0.5, (4, 8000))
                                .astype(np.float32)),
             "label": jnp.asarray(rng.integers(0, 8, 4).astype(np.int32))}
    new_state, metrics = jax.jit(step_fn)(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    before = state.params["model"]["frontend"]
    after = new_state.params["model"]["frontend"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        before, after)
    head_before = state.params["model"]["speaker_model"]
    head_after = new_state.params["model"]["speaker_model"]
    moved = jax.tree_util.tree_reduce(
        lambda acc, pair: acc or pair,
        jax.tree_util.tree_map(
            lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
            head_before, head_after), False)
    assert moved


def test_tfmel_build_and_masked_eval():
    """Config-driven TFMel frontend: featurizers + masked eval equivalence
    (reference ReDimNet2+TFMel pairing)."""
    configs = {
        "model": "ECAPA_TDNN",
        "model_args": {"embed_dim": 16, "channels": 16, "feat_dim": 0},
        "dataset_args": {
            "frontend": "tfmel",
            "tfmel_args": {"n_mels": 24, "norm_signal": True},
        },
    }
    built = build_model(configs)
    assert built.init_feat_dim == 24
    rng = np.random.default_rng(4)
    n1, n2 = 16000, 12800
    wavs = np.zeros((2, n1), np.float32)
    wavs[0] = rng.uniform(-0.5, 0.5, n1)
    wavs[1, :n2] = rng.uniform(-0.5, 0.5, n2)
    mask = np.zeros((2, n1), np.float32)
    mask[0], mask[1, :n2] = 1.0, 1.0

    feat, _ = built.featurize_eval({"wav": jnp.asarray(wavs)})
    variables = built.model.init(jax.random.PRNGKey(0), feat[:, :32],
                                 train=False)
    pfeat, pmask = built.featurize_eval(
        {"wav": jnp.asarray(wavs), "mask": jnp.asarray(mask)})
    padded = np.asarray(built.model.apply(variables, pfeat, mask=pmask,
                                          train=False))
    for i, n in enumerate((n1, n2)):
        f, m = built.featurize_eval({"wav": jnp.asarray(wavs[i:i + 1, :n])})
        solo = np.asarray(built.model.apply(variables, f, mask=m,
                                            train=False))[0]
        cos = np.dot(padded[i], solo) / (
            np.linalg.norm(padded[i]) * np.linalg.norm(solo))
        assert cos > 0.999, (i, cos)

def test_hubert_composite_builds_and_runs():
    """frontend: hubert (plain-MHA upstream) builds a wav-native composite
    and produces embeddings (s3prl multi-upstream parity)."""
    configs = {
        "model": "ECAPA_TDNN",
        "model_args": {"embed_dim": 16, "channels": 16, "feat_dim": 0},
        "dataset_args": {
            "frontend": "hubert",
            "hubert_args": {"hidden_size": 32, "num_hidden_layers": 2,
                            "num_attention_heads": 4,
                            "intermediate_size": 64,
                            "conv_dim": (8,) * 7,
                            "num_conv_pos_embeddings": 16,
                            "num_conv_pos_embedding_groups": 4},
        },
    }
    built = build_model(configs)
    assert built.frontend_type == "hubert"
    variables = built.model.init(jax.random.PRNGKey(0), built.init_example,
                                 train=False)
    params = jax.tree_util.tree_map(lambda a: a, variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = "".join(str(p) for p, _ in flat)
    assert "rel_attn_embed" not in names  # plain MHA, no WavLM bias
    wav = jnp.asarray(np.random.default_rng(0).uniform(
        -0.5, 0.5, (2, 8000)).astype(np.float32))
    emb = built.model.apply(variables, wav, train=False)
    assert emb.shape == (2, 16)
    assert np.isfinite(np.asarray(emb)).all()
