"""Checkpoint save/load/average for flax variable trees.

Behavioral spec: wespeaker/utils/checkpoint.py:20-95 (tolerant load with
projection-row truncation for speed-perturb -> LM transitions),
wespeaker/bin/average_model.py:48-76 (average last-N epoch checkpoints),
plus torch-checkpoint import via utils/torch_compat.py.

Format: msgpack via flax.serialization — a single file holding
{'params', 'batch_stats'} (and optionally opt_state/step for full resume).
"""

import glob
import os
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict


def save_checkpoint(path: str, variables: Dict[str, Any]):
    from flax.linen import meta
    variables = meta.unbox(variables)
    tree = jax.tree_util.tree_map(np.asarray, variables)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, tree)))


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None,
                    strict: bool = False) -> Dict[str, Any]:
    """Load a checkpoint; when `target` is given, leaves are matched by path.
    Mismatched projection rows are truncated/kept-as-init (the reference's
    strict=False + row-truncation behavior for margin heads whose class count
    changed across speed-perturb/LM phases, checkpoint.py:33-67)."""
    with open(path, "rb") as f:
        loaded = serialization.msgpack_restore(f.read())
    if target is None:
        return loaded
    flat_t = flatten_dict(target)
    flat_l = flatten_dict(loaded)
    out = {}
    for k, tv in flat_t.items():
        if k not in flat_l:
            if strict:
                raise KeyError(f"missing checkpoint leaf {k}")
            out[k] = tv
            continue
        lv = np.asarray(flat_l[k])
        tshape = np.shape(tv)
        if lv.shape != tshape:
            if all(ls >= ts for ls, ts in zip(lv.shape, tshape)):
                lv = lv[tuple(slice(0, ts) for ts in tshape)]
            elif strict:
                raise ValueError(f"shape mismatch at {k}: {lv.shape} vs "
                                 f"{tshape}")
            else:
                out[k] = tv
                continue
        out[k] = lv.astype(np.asarray(tv).dtype)
    return unflatten_dict(out)


def average_checkpoints(paths: List[str]) -> Dict[str, Any]:
    """Uniform parameter averaging of the last-N epoch checkpoints."""
    assert paths
    acc = None
    for p in paths:
        with open(p, "rb") as f:
            tree = serialization.msgpack_restore(f.read())
        flat = flatten_dict(tree)
        if acc is None:
            acc = {k: np.asarray(v, np.float64) for k, v in flat.items()}
        else:
            for k in acc:
                acc[k] = acc[k] + np.asarray(flat[k], np.float64)
    n = len(paths)
    out = {k: (v / n).astype(np.float32) for k, v in acc.items()}
    return unflatten_dict(out)


def find_epoch_checkpoints(model_dir: str) -> List[str]:
    """model_N.ckpt files sorted by epoch, excluding avg/final/convert
    (average_model.py:56-63)."""
    paths = glob.glob(os.path.join(model_dir, "model_*.ckpt"))
    out = []
    for p in paths:
        m = re.search(r"model_(\d+)\.ckpt$", p)
        if m:
            out.append((int(m.group(1)), p))
    return [p for _, p in sorted(out)]


def parse_start_epoch(checkpoint_path: str) -> int:
    """Resume epoch from the checkpoint filename (train.py:168-175).

    `model_N.ckpt` is a completed epoch N -> resume at N+1;
    `preempt_model_N.ckpt` was saved mid-epoch N on SIGTERM -> restart
    epoch N (the data pipeline reshuffles per epoch, so replaying the
    epoch is the reference's own restart semantics)."""
    base = os.path.basename(checkpoint_path)
    m = re.search(r"preempt_model_(\d+)\.ckpt$", base)
    if m:
        return int(m.group(1))
    m = re.search(r"model_(\d+)\.ckpt$", base)
    return int(m.group(1)) + 1 if m else 0
