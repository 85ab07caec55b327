"""Host data-pipeline throughput: single-thread vs multiprocess workers.

Builds a synthetic shard corpus (+reverb/noise stores) in a temp dir, then
measures training batches/s with the full aug chain (speed perturb, chunk,
reverb conv + SNR noise). The target is to outrun the device train step
(ECAPA-c512 b=256 ~42 ms/step => ~24 batches/s).

Usage: python scripts/bench_datapipe.py [num_utts] [batch_size]
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wespeaker_tpu.data.dataset import MPPrefetcher, SpeakerDataset  # noqa
from wespeaker_tpu.data.store import build_packed_store  # noqa
from wespeaker_tpu.data.wav_io import write_wav  # noqa

CFG = {
    "resample_rate": 16000,
    "shuffle": True,
    "shuffle_args": {"shuffle_size": 1000},
    "speed_perturb": True,
    "num_frms": 200,
    "aug_prob": 0.6,
    "fbank_args": {"frame_shift": 10, "frame_length": 25},
    "filter_args": {"min_num_frames": 100, "max_num_frames": 800},
}


def build_corpus(root, n_spk=16, n_utt=16, seconds=4.0):
    rng = np.random.default_rng(0)
    sr = 16000
    wav_dir = os.path.join(root, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    entries = []
    for s in range(n_spk):
        for u in range(n_utt):
            key = f"s{s}_u{u}"
            path = os.path.join(wav_dir, key + ".wav")
            write_wav(path, rng.uniform(-0.3, 0.3, int(sr * seconds))
                      .astype(np.float32), sr)
            entries.append((key, f"s{s}", path))
    raw = os.path.join(root, "raw.list")
    with open(raw, "w") as f:
        for k, s, p in entries:
            f.write(json.dumps({"key": k, "spk": s, "wav": p}) + "\n")
    noise = [(f"n{i}", entries[i][2]) for i in range(8)]
    build_packed_store(noise, os.path.join(root, "noise"), sr)
    rir = [(f"r{i}", entries[i][2]) for i in range(4)]
    build_packed_store(rir, os.path.join(root, "rir"), sr)
    spk2id = {f"s{i}": i for i in range(n_spk)}
    return raw, spk2id


def run(root, raw, spk2id, batch_size, num_workers, n_batches=40,
        device_aug=False):
    cfg = {**CFG, "device_aug": device_aug}
    ds_args = ("raw", raw, cfg, spk2id)
    ds_kwargs = dict(reverb_store_prefix=os.path.join(root, "rir"),
                     noise_store_prefix=os.path.join(root, "noise"))
    got = 0
    pf = None
    if num_workers == 0:
        it = SpeakerDataset(*ds_args, **ds_kwargs).batches(batch_size)
    else:
        pf = MPPrefetcher(ds_args, ds_kwargs, batch_size,
                          num_workers=num_workers)
        it = iter(pf)
    next(it)  # steady state: exclude worker spawn + first-buffer fill
    t0 = time.perf_counter()
    for _ in it:
        got += 1
        if got >= n_batches:
            break
    dt = time.perf_counter() - t0
    if pf is not None:
        pf.close()
    bps = got / dt
    tag = " device_aug" if device_aug else ""
    print(f"workers={num_workers}{tag}: {bps:6.1f} batches/s "
          f"({bps * batch_size:7,.0f} utts/s, "
          f"{bps * batch_size * 2:8,.0f} audio-s/s of 2s chunks)")
    return bps


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    workers = ([int(w) for w in sys.argv[4].split(",")]
               if len(sys.argv) > 4 else [0, 2, os.cpu_count()])
    print(f"host cpus: {os.cpu_count()} (workers scale with host cores; "
          "a pod host has many more than a dev box)")
    with tempfile.TemporaryDirectory() as root:
        side = max(4, int(np.sqrt(n)))
        raw, spk2id = build_corpus(root, n_spk=side, n_utt=side)
        for w in workers:
            run(root, raw, spk2id, batch, w, n_batches)
        for w in workers:
            run(root, raw, spk2id, batch, w, n_batches, device_aug=True)
