"""Device-side reverb/noise augmentation: numerics vs the host path, and the
dataset -> train-step plumbing (dataset_args.device_aug)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wespeaker_tpu.train.device_aug import device_augment  # noqa: E402


def test_reverb_matches_host_fftconvolve():
    from scipy.signal import fftconvolve

    rng = np.random.default_rng(0)
    n, r = 32240, 8000
    wav = rng.uniform(-0.5, 0.5, (2, n)).astype(np.float32)
    rir = rng.uniform(-0.1, 0.1, (2, r)).astype(np.float32)

    out = np.asarray(device_augment(
        jnp.asarray(wav), jnp.asarray([1, 1], np.int32), jnp.asarray(rir),
        jnp.zeros((2, n), jnp.float32), jnp.zeros((2,), jnp.float32)))

    for i in range(2):
        rn = rir[i] / np.sqrt(np.sum(rir[i] ** 2) + 1e-12)
        ref = fftconvolve(wav[i], rn, mode="full")[:n]
        ref = ref / (np.max(np.abs(ref)) + 1e-4)
        np.testing.assert_allclose(out[i], ref, atol=2e-4)


def test_noise_matches_host_formula():
    rng = np.random.default_rng(1)
    n = 16000
    wav = rng.uniform(-0.5, 0.5, (1, n)).astype(np.float32)
    noise = rng.uniform(-0.3, 0.3, (1, n)).astype(np.float32)
    snr = np.asarray([7.5], np.float32)

    out = np.asarray(device_augment(
        jnp.asarray(wav), jnp.asarray([2], np.int32),
        jnp.zeros((1, 100), jnp.float32), jnp.asarray(noise),
        jnp.asarray(snr)))

    audio_db = 10 * np.log10(np.mean(wav[0] ** 2) + 1e-4)
    noise_db = 10 * np.log10(np.mean(noise[0] ** 2) + 1e-4)
    scaled = np.sqrt(10 ** ((audio_db - noise_db - snr[0]) / 10)) * noise[0]
    ref = wav[0] + scaled
    ref = ref / (np.max(np.abs(ref)) + 1e-4)
    np.testing.assert_allclose(out[0], ref, atol=1e-5)


def test_mode0_is_identity():
    rng = np.random.default_rng(2)
    wav = rng.uniform(-0.5, 0.5, (3, 4000)).astype(np.float32)
    out = np.asarray(device_augment(
        jnp.asarray(wav), jnp.zeros((3,), jnp.int32),
        jnp.ones((3, 100), jnp.float32),
        jnp.ones((3, 4000), jnp.float32), jnp.full((3,), 5.0, jnp.float32)))
    np.testing.assert_array_equal(out, wav)


def test_dataset_device_aug_fields_and_train_step(tmp_path):
    """dataset_args.device_aug attaches per-sample aug fields, the batcher
    stacks them, and the train step consumes them under jit."""
    import json
    import optax

    from wespeaker_tpu.data.dataset import SpeakerDataset
    from wespeaker_tpu.data.store import build_packed_store
    from wespeaker_tpu.data.wav_io import write_wav
    from wespeaker_tpu.frontend import FbankConfig
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
    from wespeaker_tpu.models.projections import ArcMarginProduct
    from wespeaker_tpu.train import (AugConfig, init_train_state,
                                     make_train_step)

    rng = np.random.default_rng(0)
    entries = []
    for i in range(4):
        key, spk = f"u{i}", f"s{i % 2}"
        path = tmp_path / f"{key}.wav"
        write_wav(path, rng.uniform(-0.4, 0.4, 32000).astype(np.float32),
                  16000)
        entries.append((key, spk, str(path)))
    raw_list = tmp_path / "raw.list"
    with open(raw_list, "w") as f:
        for key, spk, path in entries:
            f.write(json.dumps({"key": key, "spk": spk, "wav": path}) + "\n")
    build_packed_store([("noise_a", entries[0][2])],
                       str(tmp_path / "noise"), 16000)
    build_packed_store([("rir_a", entries[1][2])],
                       str(tmp_path / "rir"), 16000)

    cfg = {"shuffle": False, "speed_perturb": False, "num_frms": 100,
           "aug_prob": 1.0, "device_aug": True,
           "device_aug_rir_samples": 4000,
           "fbank_args": {"num_mel_bins": 40, "dither": 0.0},
           "filter_args": {"min_num_frames": 50, "max_num_frames": 400}}
    ds = SpeakerDataset("raw", str(raw_list), cfg,
                        {"s0": 0, "s1": 1},
                        reverb_store_prefix=str(tmp_path / "rir"),
                        noise_store_prefix=str(tmp_path / "noise"))
    batch = next(ds.batches(4, max_epochs=1))
    assert batch["aug_mode"].shape == (4,)
    # reverb rows are packed first; only the capacity slice ships RIRs
    assert batch["aug_rir"].shape == (2, 4000)
    assert batch["aug_rir"].dtype == np.int16
    assert batch["aug_noise"].shape == batch["wav"].shape
    assert set(np.unique(batch["aug_mode"])) <= {0, 1, 2}
    assert batch["aug_mode"].max() > 0  # aug_prob=1.0
    reverb_rows = np.nonzero(batch["aug_mode"] == 1)[0]
    assert all(i < 2 for i in reverb_rows)

    model = ECAPA_TDNN(channels=32, feat_dim=40, embed_dim=32)
    projection = ArcMarginProduct(32, 2)
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=0.01)
    step = jax.jit(make_train_step(
        model, projection, tx, lambda s: 0.01, lambda s: 0.0,
        fbank_cfg=FbankConfig(num_mel_bins=40, dither=0.0),
        aug=AugConfig(spec_aug=False)))
    state = init_train_state(model, projection, tx, jax.random.PRNGKey(0),
                             feat_dim=40, embed_dim=32)
    device_batch = {k: jnp.asarray(v) for k, v in batch.items()
                    if k != "key"}
    state, metrics = step(state, device_batch)
    assert np.isfinite(float(metrics["loss"]))


def test_blocked_packing_matches_per_block_single():
    """Multi-host contract: the global batch concatenates per-process
    front-packed blocks; device_augment(blocks=k) must equal running each
    block independently (the bug it guards: treating the whole batch as
    one front-packed block zeroes later hosts' reverb rows)."""
    from wespeaker_tpu.train.device_aug import device_augment

    rng = np.random.default_rng(0)
    n, r, lb, lcap = 800, 200, 4, 2
    blocks = []
    for _ in range(2):
        blocks.append(dict(
            wav=rng.uniform(-0.5, 0.5, (lb, n)).astype(np.float32),
            mode=np.array([1, 1, 2, 0], np.int32),
            rir=rng.uniform(-1, 1, (lcap, r)).astype(np.float32),
            noise=rng.uniform(-0.1, 0.1, (lb, n)).astype(np.float32),
            snr=rng.uniform(0, 15, lb).astype(np.float32)))

    want = np.concatenate([
        np.asarray(device_augment(jnp.asarray(b["wav"]),
                                  jnp.asarray(b["mode"]),
                                  jnp.asarray(b["rir"]),
                                  jnp.asarray(b["noise"]),
                                  jnp.asarray(b["snr"])))
        for b in blocks])
    got = np.asarray(device_augment(
        jnp.asarray(np.concatenate([b["wav"] for b in blocks])),
        jnp.asarray(np.concatenate([b["mode"] for b in blocks])),
        jnp.asarray(np.concatenate([b["rir"] for b in blocks])),
        jnp.asarray(np.concatenate([b["noise"] for b in blocks])),
        jnp.asarray(np.concatenate([b["snr"] for b in blocks])),
        blocks=2))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # every reverb-mode row is non-zero (the old bug zeroed block 1's)
    mode = np.concatenate([b["mode"] for b in blocks])
    assert np.all(np.abs(got[mode == 1]).max(axis=1) > 1e-3)


def test_aug_config_accepts_reference_prob_key():
    from wespeaker_tpu.train.train_step import AugConfig
    cfg = AugConfig.from_spec_aug_args(
        {"prob": 0.8, "num_t_mask": 2, "max_t": 5})
    assert cfg.spec_aug_prob == 0.8 and cfg.num_t_mask == 2
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown"):
        AugConfig.from_spec_aug_args({"bogus": 1})
