"""Dataset composition + background prefetch.

Behavioral spec: wespeaker/dataset/dataset.py:136-273 — the Dataset() factory
wiring the processor chain, with infinite repeat + per-epoch reshuffle for
training. The reference uses torch DataLoader workers; here a thread-pool
prefetcher feeds fixed-shape numpy batches to the jitted train step (device
fbank), which is plenty because the heavy DSP (fbank) moved on-device.
"""

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from wespeaker_tpu.data import pipeline as P
from wespeaker_tpu.data.store import PackedAudioStore


class SpeakerDataset:
    """Iterable over fixed-shape training batches."""

    def __init__(self, data_type: str, data_list_file: str, configs: Dict,
                 spk2id: Dict[str, int], reverb_store_prefix: str = None,
                 noise_store_prefix: str = None, train: bool = True,
                 rank: int = 0, world_size: int = 1, seed: int = 42,
                 repeat: bool = True, worker_id: int = 0,
                 num_workers: int = 1):
        assert data_type in ("shard", "raw", "feat")
        self.data_type = data_type
        self.lists = P.read_lists(data_list_file)
        self.configs = configs
        self.spk2id = spk2id
        self.train = train
        self.rank = rank
        self.world_size = world_size
        self.seed = seed
        self.repeat = repeat
        self.worker_id = worker_id
        self.num_workers = num_workers
        self.reverb = (PackedAudioStore(reverb_store_prefix)
                       if reverb_store_prefix else None)
        self.noise = (PackedAudioStore(noise_store_prefix)
                      if noise_store_prefix else None)

    def _epoch_iter(self, epoch: int) -> Iterator[dict]:
        cfg = self.configs
        rng = np.random.default_rng(self.seed + 1000 * epoch + self.rank
                                    + 7919 * self.worker_id)
        lists = P.distributed_shard(self.lists, epoch=epoch,
                                    shuffle=cfg.get("shuffle", self.train),
                                    seed=self.seed, rank=self.rank,
                                    world_size=self.world_size)
        if self.num_workers > 1:
            # worker striding on top of the rank stripe (dataset.py:94-100)
            lists = lists[self.worker_id::self.num_workers]
        feat_mode = self.data_type == "feat"
        if self.data_type == "shard":
            data = P.parse_shard(lists)
        elif self.data_type == "raw":
            data = P.parse_raw(lists)
        else:
            utt2spk = {}
            with open(cfg["utt2spk"]) as f:
                for line in f:
                    u, s = line.split()
                    utt2spk[u] = s
            data = P.parse_feat(lists, utt2spk)

        if self.train and cfg.get("filter", True):
            # reference order: filter right after parse (dataset.py:60-68),
            # before speed perturb — thresholds scale with the sample's own
            # rate so running pre-resample is equivalent
            fbank_args = cfg.get("fbank_args", {})
            data = P.filter_and_cap(
                data, cfg.get("filter_args", {}).get("min_num_frames", 100),
                cfg.get("filter_args", {}).get("max_num_frames", 800),
                fbank_args.get("frame_shift", 10), rng, feat_mode)
        if not feat_mode:
            data = P.resample(data, cfg.get("resample_rate", 16000))
        if self.train and cfg.get("shuffle", True):
            data = P.local_shuffle(
                data, cfg.get("shuffle_args", {}).get("shuffle_size", 2500),
                rng)
        data = P.spk_to_id(data, self.spk2id)

        if self.train:
            num_spks = len(self.spk2id)
            if not feat_mode and cfg.get("speed_perturb", True):
                if cfg.get("speed_perturb_mode", "random") == "expanded":
                    data = P.speed_perturb_expand(data, num_spks)
                else:
                    data = P.speed_perturb(data, num_spks, rng)
            if cfg.get("defer_chunk_aug", False):
                # SSL multi-crop mode: the trainer crops N views per
                # utterance and augments each independently downstream
                # (ssl/dataset.py::multi_crop, reference
                # ssl/dataset/processor.py:49-216) — no chunking or aug here
                return data
            fbank_args = cfg.get("fbank_args", {})
            frame_shift = fbank_args.get("frame_shift", 10)
            frame_length = fbank_args.get("frame_length", 25)
            num_frms = cfg.get("num_frms", 200)
            if feat_mode:
                chunk_len = num_frms
            else:
                sr = cfg.get("resample_rate", 16000)
                chunk_len = ((num_frms - 1) * frame_shift
                             + frame_length) * sr // 1000
            data = P.random_chunk(data, chunk_len, rng, feat_mode)
            if not feat_mode and cfg.get("aug_prob", 0.6) > 0 and (
                    self.reverb or self.noise):
                if cfg.get("device_aug", False):
                    # host picks samples; convolution/mixing run on device
                    # inside the train step (train/device_aug.py)
                    data = P.attach_device_aug(
                        data, self.reverb, self.noise,
                        cfg.get("aug_prob", 0.6),
                        cfg.get("device_aug_rir_samples", 16000), rng)
                else:
                    data = P.add_reverb_noise(data, self.reverb, self.noise,
                                              cfg.get("aug_prob", 0.6), rng)
        return data

    def batches(self, batch_size: int, max_epochs: Optional[int] = None
                ) -> Iterator[dict]:
        """Batches are drawn from one continuous sample stream spanning
        epochs, so a partial batch at an epoch boundary carries over
        instead of being dropped — critical for worker stripes smaller
        than the batch (a per-epoch drop would yield nothing forever)."""
        feat_mode = self.data_type == "feat"

        def stream():
            epoch = 0
            while True:
                yield from self._epoch_iter(epoch)
                epoch += 1
                if not self.repeat or (max_epochs and epoch >= max_epochs):
                    return

        yield from P.batch_samples(stream(), batch_size, feat_mode)

    def num_classes(self) -> int:
        n = len(self.spk2id)
        if self.train and self.configs.get("speed_perturb", True) \
                and self.data_type != "feat":
            return n * 3  # perturbed speeds are new classes (train.py:141-148)
        return n


def eval_batches(utt_wavs, batch_size: int = 8, quantum_samples: int = 16000,
                 max_samples: Optional[int] = None,
                 sort_window: Optional[int] = 4096,
                 pow2_buckets: bool = False) -> Iterator[dict]:
    """Static-shape eval batching for variable-length utterances: sort by
    length, group, right-pad to the bucket max rounded up to `quantum`, and
    emit a per-sample validity mask so masked pooling reproduces the
    reference's unpadded batch=1 extraction (extract.py:112-135).

    utt_wavs: iterable of (key, float32 wav). Sorting bounds the number of
    distinct padded shapes -> bounded XLA recompiles. Sorting happens in
    windows of `sort_window` utterances so memory stays bounded on
    million-utterance lists (bucketing quality is per-window; numerics are
    identical regardless of grouping thanks to the masks). `sort_window=None`
    sorts the full list.

    pow2_buckets=True rounds each bucket up the diar-style geometric ladder
    (quantum, 2*quantum, 4*quantum, ...) instead of the linear quantum
    grid, bounding distinct compiled shapes to ~log2(max_len/quantum) —
    required when the model uses Pallas fused kernels whose Mosaic compile
    is minutes per (T, C) shape (CAMPPlus fused_blocks; docs/PERF.md), at
    the cost of more padded FLOPs per batch (masks keep numerics exact)."""

    def emit(items):
        items.sort(key=lambda kv: len(kv[1]))
        for i in range(0, len(items), batch_size):
            group = items[i:i + batch_size]
            longest = max(len(w) for _, w in group)
            if max_samples is not None:
                longest = min(longest, max_samples)
            padded_len = -(-longest // quantum_samples) * quantum_samples
            if pow2_buckets:
                p = quantum_samples
                while p < longest:
                    p *= 2
                padded_len = p
            wavs = np.zeros((len(group), padded_len), np.float32)
            mask = np.zeros((len(group), padded_len), np.float32)
            keys = []
            for j, (key, wav) in enumerate(group):
                # max_samples bounds the VALID samples even when the pow2
                # ladder rounds padded_len past it — otherwise the cap would
                # stop bounding per-utterance length and masked numerics
                # would diverge from linear-quantum mode
                wav = wav[:min(padded_len, longest)]
                wavs[j, :len(wav)] = wav
                mask[j, :len(wav)] = 1.0
                keys.append(key)
            yield {"wav": wavs, "mask": mask, "key": keys}

    window = []
    for item in utt_wavs:
        window.append(item)
        if sort_window is not None and len(window) >= sort_window:
            yield from emit(window)
            window = []
    if window:
        yield from emit(window)


def eval_feat_batches(utt_feats, batch_size: int = 8,
                      quantum_frames: int = 100,
                      max_frames: Optional[int] = None,
                      sort_window: Optional[int] = 4096,
                      pow2_buckets: bool = False) -> Iterator[dict]:
    """eval_batches for PRECOMPUTED (T, F) feature matrices (data_type=feat
    extraction, incl. the feat_stack trainable-layer-mix path): sort by
    frame count, right-pad each bucket to a multiple of `quantum_frames`
    (default 100 = 1 s at 10 ms hop), and emit a (B, T) frame-validity mask
    so masked CMVN/pooling match the unpadded batch=1 path."""

    def emit(items):
        items.sort(key=lambda kv: kv[1].shape[0])
        for i in range(0, len(items), batch_size):
            group = items[i:i + batch_size]
            longest = max(m.shape[0] for _, m in group)
            if max_frames is not None:
                longest = min(longest, max_frames)
            padded = -(-longest // quantum_frames) * quantum_frames
            if pow2_buckets:
                p = quantum_frames
                while p < longest:
                    p *= 2
                padded = p
            dim = group[0][1].shape[1]
            feats = np.zeros((len(group), padded, dim), np.float32)
            mask = np.zeros((len(group), padded), np.float32)
            keys = []
            for j, (key, mat) in enumerate(group):
                mat = mat[:min(padded, longest)]
                feats[j, :mat.shape[0]] = mat
                mask[j, :mat.shape[0]] = 1.0
                keys.append(key)
            yield {"feat": feats, "mask": mask, "key": keys}

    window = []
    for item in utt_feats:
        window.append(item)
        if sort_window is not None and len(window) >= sort_window:
            yield from emit(window)
            window = []
    if window:
        yield from emit(window)


def _mp_worker(q, ds_args, ds_kwargs, batch_size, max_epochs):
    """Spawned worker: runs the numpy pipeline on its list stripe and ships
    finished batches. Imports stay JAX-free (data/ modules are numpy-only),
    so workers never touch the device or its compiler."""
    try:
        ds = SpeakerDataset(*ds_args, **ds_kwargs)
        for b in ds.batches(batch_size, max_epochs):
            q.put(("batch", b))
    except BaseException:
        import traceback
        q.put(("error", traceback.format_exc()))
    q.put(("done", None))


class MPPrefetcher:
    """Multiprocess batch prefetch: N spawned workers each run the full host
    pipeline (parse -> resample -> speed-perturb -> chunk -> reverb/noise)
    on worker stripe `lists[worker_id::num_workers]` of the rank's shard —
    the reference's DataLoader-worker striding (dataset.py:94-100). Workers
    emit whole fixed-shape batches; arrival order across workers is
    unordered, which is fine for shuffled training.

    Construct with the SpeakerDataset constructor args rather than a live
    dataset so each worker builds its own stores/file handles."""

    def __init__(self, ds_args, ds_kwargs, batch_size, num_workers: int = 4,
                 depth: int = 4, max_epochs=None):
        import multiprocessing as mp
        ctx = mp.get_context("spawn")
        self.q = ctx.Queue(maxsize=max(2, depth) * num_workers)
        self.procs = []
        for w in range(num_workers):
            kw = dict(ds_kwargs, worker_id=w, num_workers=num_workers)
            p = ctx.Process(target=_mp_worker,
                            args=(self.q, ds_args, kw, batch_size,
                                  max_epochs),
                            daemon=True)
            p.start()
            self.procs.append(p)

    def __iter__(self):
        live = len(self.procs)
        while live:
            try:
                kind, payload = self.q.get(timeout=60)
            except queue.Empty:
                # a worker killed by the OS (OOM) never posts 'done';
                # fail loudly instead of blocking the train loop forever
                dead = [p.exitcode for p in self.procs
                        if not p.is_alive() and p.exitcode != 0]
                if dead and self.q.empty():
                    self.close()
                    raise RuntimeError(
                        f"data worker(s) died with exit codes {dead}")
                continue
            if kind == "done":
                live -= 1
            elif kind == "error":
                self.close()
                raise RuntimeError(f"data worker failed:\n{payload}")
            else:
                yield payload
        self.close()

    def close(self):
        for p in self.procs:
            if p.is_alive():
                p.terminate()
        for p in self.procs:
            p.join(timeout=5)


class Prefetcher:
    """Background-thread batch prefetch with bounded queue."""

    def __init__(self, iterator, depth: int = 4):
        self.q = queue.Queue(maxsize=depth)
        self._done = object()
        self._err = None

        def worker():
            try:
                for item in iterator:
                    self.q.put(item)
            except BaseException as e:  # propagate to consumer
                self._err = e
            finally:
                self.q.put(self._done)

        self.thread = threading.Thread(target=worker, daemon=True)
        self.thread.start()

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is self._done:
                if self._err is not None:
                    raise self._err
                return
            yield item
