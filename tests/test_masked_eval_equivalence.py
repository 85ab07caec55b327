"""The variable-length eval trap (SURVEY.md §7 hard part 3): padded
static-shape batches with masks must reproduce the reference's unpadded
batch=1 whole-utterance embeddings."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wespeaker_tpu.frontend import FbankConfig
from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
from wespeaker_tpu.models.resnet import ResNet34
from wespeaker_tpu.train import make_eval_embed_fn


def _cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


@pytest.mark.parametrize("model_fn,kw", [
    (ECAPA_TDNN, dict(channels=64, feat_dim=40, embed_dim=64,
                      global_context_att=True)),
    (ResNet34, dict()),
])
def test_padded_masked_equals_unpadded(model_fn, kw):
    if model_fn is ResNet34:
        model = model_fn(40, 64)
    else:
        model = model_fn(**kw)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 40)),
                           train=False)
    embed_fn = make_eval_embed_fn(model, FbankConfig(num_mel_bins=40))

    rng = np.random.default_rng(0)
    n = 16000 * 2 + 1234  # odd length
    wav = rng.uniform(-0.5, 0.5, n).astype(np.float32)

    exact = np.asarray(embed_fn(variables, {"wav": jnp.asarray(wav[None])}))[0]

    pad = 16000  # a full second of zero padding
    wav_padded = np.zeros((1, n + pad), np.float32)
    wav_padded[0, :n] = wav
    mask = np.zeros((1, n + pad), np.float32)
    mask[0, :n] = 1.0
    padded = np.asarray(embed_fn(variables, {
        "wav": jnp.asarray(wav_padded), "mask": jnp.asarray(mask)}))[0]

    cos = _cos(exact, padded)
    # boundary frames inside the conv receptive field see pad zeros; the
    # pooled embedding must still match to well beyond the 0.999 target
    assert cos > 0.9995, cos
    # and without the mask, padding corrupts the embedding (sanity that the
    # mask is actually doing the work)
    unmasked = np.asarray(embed_fn(variables, {
        "wav": jnp.asarray(wav_padded)}))[0]
    assert _cos(exact, unmasked) < cos
