"""Data pipeline tests over a synthetic mini-corpus."""

import json
import os
import tarfile

import numpy as np
import pytest

from wespeaker_tpu.data import pipeline as P
from wespeaker_tpu.data.dataset import Prefetcher, SpeakerDataset
from wespeaker_tpu.data.store import PackedAudioStore, build_packed_store
from wespeaker_tpu.data.wav_io import read_wav, write_wav


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.default_rng(0)
    sr = 16000
    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    entries = []
    for spk in range(3):
        for utt in range(4):
            key = f"spk{spk}_utt{utt}"
            wav = rng.uniform(-0.3, 0.3, sr * 3).astype(np.float32)
            path = wav_dir / f"{key}.wav"
            write_wav(path, wav, sr)
            entries.append((key, f"spk{spk}", str(path)))

    raw_list = tmp_path / "raw.list"
    with open(raw_list, "w") as f:
        for key, spk, path in entries:
            f.write(json.dumps({"key": key, "spk": spk, "wav": path}) + "\n")

    shard_path = tmp_path / "shard_0.tar"
    with tarfile.open(shard_path, "w") as tf:
        for key, spk, path in entries:
            tf.add(path, arcname=f"{key}.wav")
            spk_file = tmp_path / f"{key}.spk"
            spk_file.write_text(spk)
            tf.add(spk_file, arcname=f"{key}.spk")
    shard_list = tmp_path / "shard.list"
    shard_list.write_text(str(shard_path) + "\n")

    noise_list = [(f"noise_{i}", str(wav_dir / f"spk0_utt{i}.wav"))
                  for i in range(2)]
    build_packed_store(noise_list, str(tmp_path / "noise"), sr)

    spk2id = {f"spk{i}": i for i in range(3)}
    return dict(tmp_path=tmp_path, raw_list=str(raw_list),
                shard_list=str(shard_list),
                noise_prefix=str(tmp_path / "noise"), spk2id=spk2id)


def test_wav_io_roundtrip(tmp_path):
    wav = np.random.default_rng(0).uniform(-0.5, 0.5, 16000).astype(np.float32)
    write_wav(tmp_path / "a.wav", wav, 16000)
    got, sr = read_wav(str(tmp_path / "a.wav"))
    assert sr == 16000
    np.testing.assert_allclose(got, wav, atol=1 / 16384.0)


def test_packed_store(corpus):
    store = PackedAudioStore(corpus["noise_prefix"])
    assert len(store) == 2
    key, wav = store.random_one(np.random.default_rng(0))
    assert key.startswith("noise_")
    assert wav.ndim == 1 and len(wav) == 48000


CFG = {
    "resample_rate": 16000,
    "shuffle": True,
    "shuffle_args": {"shuffle_size": 8},
    "speed_perturb": True,
    "num_frms": 200,
    "aug_prob": 0.6,
    "fbank_args": {"frame_shift": 10, "frame_length": 25},
    "filter_args": {"min_num_frames": 100, "max_num_frames": 800},
}


@pytest.mark.parametrize("data_type", ["raw", "shard"])
def test_dataset_batches(corpus, data_type):
    ds = SpeakerDataset(data_type, corpus[f"{data_type}_list"], CFG,
                        corpus["spk2id"],
                        noise_store_prefix=corpus["noise_prefix"])
    batches = list(Prefetcher(ds.batches(4, max_epochs=1)))
    assert batches, "no batches produced"
    for b in batches:
        assert b["wav"].shape == (4, 32240)  # 200-frame chunks
        assert b["wav"].dtype == np.float32
        assert b["label"].shape == (4,)
        assert (0 <= b["label"]).all() and (b["label"] < 9).all()  # 3 spk x 3
    assert ds.num_classes() == 9


def test_speed_perturb_labels_and_length():
    sr = 16000
    wav = np.random.default_rng(0).uniform(-0.3, 0.3, sr).astype(np.float32)
    samples = [{"key": "k", "wav": wav, "sample_rate": sr, "label": 2}]
    out = list(P.speed_perturb_expand(iter(samples), num_spks=5))
    assert [s["label"] for s in out] == [2, 7, 12]
    assert len(out[1]["wav"]) == pytest.approx(sr / 0.9, rel=1e-3)
    assert len(out[2]["wav"]) == pytest.approx(sr / 1.1, rel=1e-3)


def test_distributed_striding_partitions():
    lists = [f"f{i}" for i in range(100)]
    parts = [P.distributed_shard(lists, epoch=3, rank=r, world_size=4)
             for r in range(4)]
    everything = sorted(sum(parts, []))
    assert everything == sorted(lists)
    assert all(len(p) == 25 for p in parts)
    # same epoch -> same global order across ranks
    parts_again = P.distributed_shard(lists, epoch=3, rank=1, world_size=4)
    assert parts[1] == parts_again


def test_chunk_repeat_pad():
    rng = np.random.default_rng(0)
    short = np.arange(10, dtype=np.float32)
    out = P.get_random_chunk(short, 25, rng)
    assert out.shape == (25,)
    np.testing.assert_array_equal(out[:10], short)
    np.testing.assert_array_equal(out[10:20], short)


def test_whole_utt_eval_mode(corpus):
    ds = SpeakerDataset("raw", corpus["raw_list"], {**CFG, "shuffle": False},
                        corpus["spk2id"], train=False, repeat=False)
    batches = list(ds.batches(1, max_epochs=1))
    assert len(batches) == 12
    assert batches[0]["wav"].shape == (1, 48000)  # whole 3s utterance


def test_worker_striding_partitions(corpus):
    """Workers see disjoint stripes of the rank shard that union to the
    full epoch (reference dataset.py:94-100)."""
    full = SpeakerDataset("raw", corpus["raw_list"],
                          {**CFG, "shuffle": False, "speed_perturb": False,
                           "aug_prob": 0.0},
                          corpus["spk2id"], repeat=False)
    want = sorted(k for b in full.batches(1, max_epochs=1)
                  for k in b["key"])
    got = []
    for w in range(3):
        ds = SpeakerDataset("raw", corpus["raw_list"],
                            {**CFG, "shuffle": False,
                             "speed_perturb": False, "aug_prob": 0.0},
                            corpus["spk2id"], repeat=False,
                            worker_id=w, num_workers=3)
        got += [k for b in ds.batches(1, max_epochs=1) for k in b["key"]]
    assert sorted(got) == want


def test_mp_prefetcher_matches_single_process(corpus):
    from wespeaker_tpu.data.dataset import MPPrefetcher

    cfg = {**CFG, "shuffle": False, "speed_perturb": False, "aug_prob": 0.0}
    ds_args = ("raw", corpus["raw_list"], cfg, corpus["spk2id"])
    ds_kwargs = dict(repeat=False)
    single = SpeakerDataset(*ds_args, **ds_kwargs)
    want = sorted(k for b in single.batches(2, max_epochs=1)
                  for k in b["key"])
    pf = MPPrefetcher(ds_args, ds_kwargs, batch_size=2, num_workers=2,
                      max_epochs=1)
    batches = list(pf)
    got = sorted(k for b in batches for k in b["key"])
    assert got == want
    for b in batches:
        assert b["wav"].shape == (2, 32240)
        assert b["wav"].dtype == np.float32


def test_small_worker_stripe_still_fills_batches(corpus):
    """A worker stripe smaller than the batch must fill batches across
    epoch boundaries instead of dropping the partial batch every epoch
    (which would produce nothing forever)."""
    cfg = {**CFG, "shuffle": False, "speed_perturb": False, "aug_prob": 0.0}
    ds = SpeakerDataset("raw", corpus["raw_list"], cfg, corpus["spk2id"],
                        worker_id=0, num_workers=6)  # stripe of 2 utts
    it = ds.batches(8)  # batch > stripe; repeat=True spans epochs
    batch = next(it)
    assert batch["wav"].shape[0] == 8


def test_parse_raw_pipe_command(corpus, tmp_path):
    """kaldi-style 'cmd |' wav entries (sre GSM-codec recipes) stream the
    command's stdout as a RIFF wav (reference parse_raw:129-136)."""
    import wespeaker_tpu.data.pipeline as P

    path = json.loads(open(corpus["raw_list"]).readline())["wav"]
    lines = [
        json.dumps({"key": "piped", "spk": "spk0", "wav": f"cat {path} |"}),
        json.dumps({"key": "direct", "spk": "spk0", "wav": path}),
    ]
    piped, direct = list(P.parse_raw(lines))
    assert piped["key"] == "piped"
    np.testing.assert_array_equal(piped["wav"], direct["wav"])
    assert piped["sample_rate"] == direct["sample_rate"]


def test_parse_raw_vad_crop(corpus):
    """'vad': [[s,e],...] crops to the concatenated voiced parts in seconds
    (reference parse_raw apply_vad, processor.py:138-145)."""
    import wespeaker_tpu.data.pipeline as P

    path = json.loads(open(corpus["raw_list"]).readline())["wav"]
    lines = [
        json.dumps({"key": "crop", "spk": "spk0", "wav": path,
                    "vad": [[0.1, 0.3], [0.5, 0.6]]}),
        json.dumps({"key": "full", "spk": "spk0", "wav": path}),
    ]
    crop, full = list(P.parse_raw(lines))
    sr = full["sample_rate"]
    want = np.concatenate([
        full["wav"][int(0.1 * sr):int(0.3 * sr)],
        full["wav"][int(0.5 * sr):int(0.6 * sr)],
    ])
    np.testing.assert_array_equal(crop["wav"], want)


def test_eval_batches_windowed_sort():
    """eval_batches sorts within bounded windows (streaming memory) and
    every utterance appears exactly once with its exact samples masked in."""
    from wespeaker_tpu.data.dataset import eval_batches

    rng = np.random.default_rng(0)
    lens = rng.integers(4000, 64000, 100)
    items = [(f"u{i}", rng.uniform(-1, 1, n).astype(np.float32))
             for i, n in enumerate(lens)]
    seen = {}
    for batch in eval_batches(iter(items), batch_size=8,
                              quantum_samples=16000, sort_window=16):
        assert batch["wav"].shape[1] % 16000 == 0
        for j, key in enumerate(batch["key"]):
            n = int(batch["mask"][j].sum())
            seen[key] = batch["wav"][j, :n]
    assert len(seen) == 100
    for key, wav in items:
        np.testing.assert_array_equal(seen[key], wav)


def test_eval_batches_pow2_buckets():
    """pow2_buckets=True rounds bucket lengths up the geometric ladder —
    distinct padded shapes stay ~log2(max_len/quantum) so Pallas fused
    kernels (minutes of Mosaic compile per shape) are usable for
    variable-length extraction; contents/masks are unchanged."""
    from wespeaker_tpu.data.dataset import eval_batches

    rng = np.random.default_rng(1)
    lens = rng.integers(4000, 130000, 120)
    items = [(f"u{i}", rng.uniform(-1, 1, n).astype(np.float32))
             for i, n in enumerate(lens)]
    seen, shapes = {}, set()
    for batch in eval_batches(iter(items), batch_size=8,
                              quantum_samples=16000, sort_window=16,
                              pow2_buckets=True):
        padded = batch["wav"].shape[1]
        shapes.add(padded)
        # power-of-2 multiple of the quantum
        assert padded % 16000 == 0 and (padded // 16000) & (
            padded // 16000 - 1) == 0
        for j, key in enumerate(batch["key"]):
            n = int(batch["mask"][j].sum())
            seen[key] = batch["wav"][j, :n]
    # 4k..130k samples -> at most 1s/2s/4s/8s/16s buckets
    assert len(shapes) <= 5, shapes
    assert len(seen) == 120
    for key, wav in items:
        np.testing.assert_array_equal(seen[key], wav)


def test_eval_batches_pow2_buckets_respects_max_samples():
    """max_samples must bound the VALID samples even when the pow2 ladder
    rounds padded_len past it — otherwise the cap stops limiting
    per-utterance length and masked numerics diverge from linear mode."""
    from wespeaker_tpu.data.dataset import eval_batches

    rng = np.random.default_rng(7)
    items = [("long", rng.uniform(-1, 1, 50000).astype(np.float32)),
             ("short", rng.uniform(-1, 1, 9000).astype(np.float32))]
    cap = 20000
    for batch in eval_batches(iter(items), batch_size=2,
                              quantum_samples=16000, max_samples=cap,
                              pow2_buckets=True):
        for j, key in enumerate(batch["key"]):
            n = int(batch["mask"][j].sum())
            assert n <= cap, (key, n)
            if key == "long":
                assert n == cap  # truncated at the cap, not at padded_len
                np.testing.assert_array_equal(batch["wav"][j, :n],
                                              items[0][1][:cap])
                assert not batch["wav"][j, n:].any()  # zero past the mask


def test_defer_chunk_aug_yields_whole_utterances(corpus):
    """SSL mode (defer_chunk_aug): the dataset must not pre-chunk or
    pre-augment — crops are taken from the whole utterance and each view is
    augmented independently downstream (reference ssl processor)."""
    cfg = {**CFG, "defer_chunk_aug": True, "speed_perturb": False}
    ds = SpeakerDataset("raw", corpus["raw_list"], cfg, corpus["spk2id"],
                        noise_store_prefix=corpus["noise_prefix"])
    samples = list(ds._epoch_iter(0))
    assert samples
    # corpus utterances are 3 s at 16 kHz; num_frms=200 chunking would have
    # cut them to 2 s
    assert all(len(s["wav"]) == 48000 for s in samples)
