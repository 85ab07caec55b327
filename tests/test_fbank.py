import numpy as np
import jax.numpy as jnp
import pytest

from wespeaker_tpu.frontend import FbankConfig, apply_cmvn, compute_fbank
from tests.kaldi_fbank_numpy import fbank_numpy


def _wav(n=16000 * 2 + 137, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.uniform(-1, 1, n) * (1 << 15)).astype(np.float32)


@pytest.mark.parametrize("window", ["hamming", "povey"])
@pytest.mark.parametrize("num_mel", [80, 40])
def test_fbank_matches_numpy_oracle(window, num_mel):
    wav = _wav()
    cfg = FbankConfig(num_mel_bins=num_mel, window_type=window, dither=0.0)
    got = np.asarray(compute_fbank(jnp.asarray(wav), cfg))
    want = fbank_numpy(wav, num_mel=num_mel, window=window)
    assert got.shape == want.shape
    # fused-conv path: tiny absolute slack at near-floor mel bins
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_frame_count_snip_edges():
    cfg = FbankConfig()
    assert cfg.num_frames(400) == 1
    assert cfg.num_frames(559) == 1
    assert cfg.num_frames(560) == 2
    # the reference 2s train chunk: 200 frames
    assert cfg.num_frames((200 - 1) * 160 + 400) == 200


def test_fbank_batched_matches_single():
    wavs = np.stack([_wav(seed=i) for i in range(3)])
    cfg = FbankConfig()
    batched = np.asarray(compute_fbank(jnp.asarray(wavs), cfg))
    for i in range(3):
        single = np.asarray(compute_fbank(jnp.asarray(wavs[i]), cfg))
        np.testing.assert_allclose(batched[i], single, rtol=1e-6, atol=1e-6)


def test_cmvn():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 50, 8)))
    y = np.asarray(apply_cmvn(x))
    np.testing.assert_allclose(y.mean(axis=1), 0.0, atol=1e-6)
    # masked variant agrees with dense on a fully-valid mask
    ym = np.asarray(apply_cmvn(x, mask=jnp.ones((2, 50))))
    np.testing.assert_allclose(y, ym, atol=1e-6)
    # masked variant ignores pad frames
    xpad = jnp.concatenate([x, 100.0 + jnp.zeros((2, 10, 8))], axis=1)
    mask = jnp.concatenate([jnp.ones((2, 50)), jnp.zeros((2, 10))], axis=1)
    ypad = np.asarray(apply_cmvn(xpad, mask=mask))
    np.testing.assert_allclose(ypad[:, :50], y, atol=1e-6)


def test_fbank_bf16_conv_close_to_f32():
    """The bf16-conv fast path (conv_dtype=bfloat16, f32 accumulation) must
    track the f32 parity path to bf16 input quantization level — it feeds
    only the bf16 extraction fast path, never parity runs."""
    wav = jnp.asarray(np.stack([_wav(seed=i) for i in range(2)]))
    cfg = FbankConfig()
    want = np.asarray(compute_fbank(wav, cfg))
    got = np.asarray(compute_fbank(wav, cfg, conv_dtype=jnp.bfloat16))
    assert got.dtype == np.float32
    # log-mel absolute error ~ bf16 relative quantization of the DFT
    assert np.max(np.abs(got - want)) < 0.15
    assert np.mean(np.abs(got - want)) < 0.02
