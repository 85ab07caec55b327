"""SSL multi-crop data stages.

Behavioral spec: wespeaker/ssl/dataset/processor.py
(random_chunk_for_dino:48 — N global + M local random chunks per utterance,
each independently augmented) and dino_collate_fn:27 (stack crops
view-major: all crop-0s, then all crop-1s, ...).
"""

from typing import Iterator, Optional

import numpy as np

from wespeaker_tpu.data.pipeline import get_random_chunk


def multi_crop(data, global_len: int, local_len: int, n_global: int = 2,
               n_local: int = 4, aug_fn=None,
               rng: Optional[np.random.Generator] = None) -> Iterator[dict]:
    """Each sample gains 'global_wavs' (n_global, Lg) and 'local_wavs'
    (n_local, Ll), independently chunked (and optionally augmented)."""
    rng = rng or np.random.default_rng()
    for sample in data:
        wav = sample["wav"]
        crops_g, crops_l = [], []
        for _ in range(n_global):
            c = get_random_chunk(wav, global_len, rng)
            if aug_fn is not None:
                c = aug_fn(c, rng)
            crops_g.append(c)
        for _ in range(n_local):
            c = get_random_chunk(wav, local_len, rng)
            if aug_fn is not None:
                c = aug_fn(c, rng)
            crops_l.append(c)
        sample["global_wavs"] = np.stack(crops_g)
        sample["local_wavs"] = np.stack(crops_l)
        yield sample


def dino_batch(data, batch_size: int) -> Iterator[dict]:
    """Stack view-major: output global_wav (n_global*B, Lg), local_wav
    (n_local*B, Ll) so that jnp.split(out, n_views) recovers per-view
    blocks (dino_collate_fn semantics)."""
    buf = []
    for sample in data:
        buf.append(sample)
        if len(buf) == batch_size:
            g = np.stack([s["global_wavs"] for s in buf])  # (B, ng, L)
            l = np.stack([s["local_wavs"] for s in buf])
            yield {
                "global_wav": np.concatenate(
                    [g[:, i] for i in range(g.shape[1])]).astype(np.float32),
                "local_wav": np.concatenate(
                    [l[:, i] for i in range(l.shape[1])]).astype(np.float32),
                "key": [s["key"] for s in buf],
            }
            buf = []
