"""Trial scoring: cosine + AS-Norm/S-Norm, device-batched.

Behavioral spec: wespeaker/bin/score.py:38-95 (per-trial sklearn cosine with
optional train-set mean subtraction) and wespeaker/bin/score_norm.py:26-116
(L2-norm, emb @ cohort.T, top-N z-norm averaged over both sides, plus
magnitude / cohort-mean quality factors for QMF).

TPU design: the reference loops trials on host CPU; here the whole trial
list is one gather + batched dot on device, and the cohort statistics are a
single (N, D) x (D, C) matmul + top_k. All functions also run fine on CPU
for small jobs.
"""

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def l2norm(x, axis=-1, eps=0.0):
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return x / n


@jax.jit
def cosine_scores(emb: jnp.ndarray, enroll_idx: jnp.ndarray,
                  test_idx: jnp.ndarray) -> jnp.ndarray:
    """emb: (N, D) (already mean-subtracted); index arrays (T,) -> (T,)
    cosine similarity per trial."""
    e = l2norm(emb[enroll_idx])
    t = l2norm(emb[test_idx])
    return jnp.sum(e * t, axis=-1)


@functools.partial(jax.jit, static_argnames=("top_n",))
def _cohort_stats(emb, cohort, top_n: int):
    scores = l2norm(emb) @ l2norm(cohort).T  # (N, C)
    top, _ = jax.lax.top_k(scores, top_n)
    mean = jnp.mean(top, axis=1)
    std = jnp.std(top, axis=1)
    return mean, std


def cohort_mean_std(emb, cohort, top_n: int):
    """Top-N cohort score statistics per embedding
    (score_norm.py:26-36). std is population (ddof=0) like np.std."""
    top_n = min(int(top_n), cohort.shape[0])
    return _cohort_stats(jnp.asarray(emb), jnp.asarray(cohort), top_n)


def asnorm_scores(raw_scores, enroll_mean, enroll_std, test_mean, test_std,
                  enroll_idx, test_idx):
    """0.5 * (z-norm wrt enroll cohort + z-norm wrt test cohort)
    (score_norm.py:104-107)."""
    raw = jnp.asarray(raw_scores)
    em = jnp.asarray(enroll_mean)[enroll_idx]
    es = jnp.asarray(enroll_std)[enroll_idx]
    tm = jnp.asarray(test_mean)[test_idx]
    ts = jnp.asarray(test_std)[test_idx]
    return 0.5 * ((raw - em) / es + (raw - tm) / ts)


class TrialScorer:
    """In-memory trial scorer over a dict of embeddings.

    Usage mirrors the reference CLI pipeline: cosine -> (optional) AS-Norm,
    emitting the same per-line fields (score, label, magnitudes, cohort
    means) the QMF calibration stage consumes.
    """

    def __init__(self, emb_dict: Dict[str, np.ndarray],
                 mean_vec: np.ndarray = None):
        self.keys = list(emb_dict.keys())
        self.idx = {k: i for i, k in enumerate(self.keys)}
        emb = np.stack([np.asarray(emb_dict[k], np.float32)
                        for k in self.keys])
        if mean_vec is not None:
            emb = emb - np.asarray(mean_vec, np.float32)
        self.emb = jnp.asarray(emb)

    def score_trials(self, trials: Sequence[Tuple[str, str]]) -> np.ndarray:
        ei = jnp.asarray([self.idx[a] for a, b in trials])
        ti = jnp.asarray([self.idx[b] for a, b in trials])
        return np.asarray(cosine_scores(self.emb, ei, ti))

    def asnorm(self, trials: Sequence[Tuple[str, str]],
               raw_scores: np.ndarray, cohort: np.ndarray,
               top_n: int = 300) -> Dict[str, np.ndarray]:
        """Returns normalized scores plus QMF quality factors."""
        ei = np.asarray([self.idx[a] for a, b in trials])
        ti = np.asarray([self.idx[b] for a, b in trials])
        mean, std = cohort_mean_std(self.emb, cohort, top_n)
        normed = asnorm_scores(raw_scores, mean, std, mean, std, ei, ti)
        mags = np.asarray(jnp.linalg.norm(self.emb, axis=1))
        return {
            "score": np.asarray(normed),
            "enroll_mag": mags[ei],
            "test_mag": mags[ti],
            "enroll_cohort_mean": np.asarray(mean)[ei],
            "test_cohort_mean": np.asarray(mean)[ti],
        }


def compute_mean_vec(emb_iter) -> np.ndarray:
    """Mean embedding over a (cohort) set — score.py:25-35."""
    total, n = None, 0
    for _, vec in emb_iter:
        total = vec.astype(np.float64) if total is None else total + vec
        n += 1
    return (total / n).astype(np.float32)


def read_trials(path: str) -> Tuple[List[Tuple[str, str]], List[str]]:
    """Trial file: `enroll test [target|nontarget]` per line."""
    pairs, labels = [], []
    with open(path) as f:
        for line in f:
            seg = line.split()
            if not seg:
                continue
            pairs.append((seg[0], seg[1]))
            labels.append(seg[2] if len(seg) > 2 else "")
    return pairs, labels
