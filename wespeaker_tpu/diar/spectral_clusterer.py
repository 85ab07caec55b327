"""Spectral clustering of subsegment embeddings.

Behavioral spec: wespeaker/diar/spectral_clusterer.py:33-90 — cosine affinity
0.5(1+cos), p-pruning to a binary-ish matrix, unnormalized Laplacian,
eigengap speaker-count estimate (max 20), k-means on the first-k
eigenvectors.

TPU note: the affinity matmul and eigh can run on device for long recordings
(thousands of subsegments); this implementation keeps numpy semantics and
uses jnp for the O(n^2 d) affinity when n is large.
"""

from typing import List, Optional

import numpy as np
import scipy.linalg


def cosine_affinity(emb: np.ndarray) -> np.ndarray:
    if emb.shape[0] >= 2048:  # device matmul pays off for big recordings
        import jax.numpy as jnp
        e = jnp.asarray(emb / np.linalg.norm(emb, axis=1, keepdims=True))
        return np.asarray(0.5 * (1.0 + e @ e.T))
    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    return 0.5 * (1.0 + e @ e.T)


def prune(sim: np.ndarray, p: float) -> np.ndarray:
    """Row-wise: keep the top (m-n) entries as 1, zero the rest, then
    symmetrize by averaging."""
    m = sim.shape[0]
    n = max(m - 10, 2) if m < 1000 else int((1.0 - p) * m)
    order = np.argsort(sim, axis=1)
    out = sim.copy()
    rows = np.arange(m)[:, None]
    out[rows, order[:, :n]] = 0.0
    out[rows, order[:, n:]] = 1.0
    return 0.5 * (out + out.T)


def unnormalized_laplacian(m: np.ndarray) -> np.ndarray:
    a = m.copy()
    np.fill_diagonal(a, 0.0)
    return np.diag(np.sum(np.abs(a), axis=1)) - a


def cluster(embeddings, p: float = 0.01, num_spks: Optional[int] = None,
            min_num_spks: int = 1, max_num_spks: int = 20) -> List[int]:
    embeddings = np.asarray(embeddings)
    if len(embeddings) <= 2:
        return [0] * len(embeddings)

    lap = unnormalized_laplacian(prune(cosine_affinity(embeddings), p))
    eig_values, eig_vectors = scipy.linalg.eigh(lap)
    if num_spks is None:
        num_spks = int(np.argmax(np.diff(eig_values[:max_num_spks + 1])) + 1)
    num_spks = max(num_spks, min_num_spks)
    spectral_embeddings = eig_vectors[:, :num_spks]

    from sklearn.cluster import k_means
    _, labels, _ = k_means(spectral_embeddings, num_spks, random_state=None,
                           n_init=10)
    return list(labels)
