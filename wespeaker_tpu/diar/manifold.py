"""Native UMAP for subsegment-embedding dimensionality reduction.

Replaces the third-party `umap-learn` dependency of the reference's
UMAP+HDBSCAN diarization backend (wespeaker/diar/umap_clusterer.py:227-230):
exact kNN fuzzy-simplicial-set construction (McInnes et al.) on the host,
spectral initialization, and the stochastic cross-entropy layout optimizer
as ONE jitted program (`lax.fori_loop` over epochs, scatter-add updates) —
the per-edge Python SGD loop of the reference library becomes a handful of
device launches instead of millions of interpreter steps.

Deviation from umap-learn (documented, DER-level parity is the contract):
edge updates within an epoch are applied synchronously (batched scatter-add)
rather than asynchronously in sample order, and edges fire with probability
w/max_w per epoch rather than on a deterministic epochs_per_sample schedule.
Point/edge counts are padded to power-of-2 buckets so repeated recordings
reuse a bounded set of compiled programs.
"""

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from wespeaker_tpu.diar.density import pairwise_dist


def smooth_knn_weights(knn_dist: np.ndarray, n_iter: int = 64,
                       bandwidth_target: Optional[float] = None):
    """Per-point (rho, sigma) calibration: rho = nearest-neighbor distance,
    sigma solves sum_j exp(-(d_ij - rho)/sigma) = log2(k) by bisection.
    Returns membership weights exp(-max(0, d - rho)/sigma), shape of
    knn_dist (n, k)."""
    n, k = knn_dist.shape
    target = (np.log2(k) if bandwidth_target is None else bandwidth_target)
    rho = knn_dist[:, 0].copy()
    lo = np.zeros(n)
    hi = np.full(n, np.inf)
    mid = np.ones(n)
    shifted = np.maximum(knn_dist - rho[:, None], 0.0)
    for _ in range(n_iter):
        val = np.exp(-shifted / mid[:, None]).sum(axis=1)
        too_high = val > target
        hi = np.where(too_high, mid, hi)
        lo = np.where(too_high, lo, mid)
        mid = np.where(np.isinf(hi), lo * 2.0, 0.5 * (lo + hi))
    # umap floors sigma at a fraction of the mean knn distance
    mean_d = knn_dist.mean()
    mid = np.maximum(mid, 1e-3 * np.maximum(mean_d, 1e-12))
    return np.exp(-shifted / mid[:, None])


def fuzzy_graph(x: np.ndarray, n_neighbors: int,
                metric: str = "cosine") -> np.ndarray:
    """Symmetrized fuzzy simplicial set as a dense (n, n) weight matrix:
    W + W^T - W*W^T (probabilistic t-conorm)."""
    n = len(x)
    k = min(n_neighbors, n - 1)
    dist = pairwise_dist(x, metric)
    # exclude self by index, not by sort position: exact-duplicate rows
    # would otherwise keep themselves as a neighbor (self-loop edge)
    np.fill_diagonal(dist, np.inf)
    order = np.argsort(dist, axis=1)[:, :k]
    knn_d = np.take_along_axis(dist, order, axis=1)
    np.fill_diagonal(dist, 0.0)
    w = smooth_knn_weights(knn_d)
    mat = np.zeros((n, n))
    np.put_along_axis(mat, order, w, axis=1)
    return mat + mat.T - mat * mat.T


def spectral_init(graph: np.ndarray, dim: int,
                  seed: int = 2023) -> np.ndarray:
    """Normalized-Laplacian eigenvector initialization scaled to [-10, 10]
    plus a small jitter (umap's 'spectral' init). Only dim+1 bottom
    eigenvectors are needed: large recordings (thousands of subsegments)
    use sparse shift-invert Lanczos on the kNN graph instead of a dense
    O(n^3) eigendecomposition."""
    n = graph.shape[0]
    deg = np.maximum(graph.sum(axis=1), 1e-12)
    inv_sqrt = 1.0 / np.sqrt(deg)
    k = min(dim + 1, n)
    if n > 1024 and k < n - 1:
        import scipy.sparse
        import scipy.sparse.linalg
        norm_graph = scipy.sparse.csr_matrix(
            inv_sqrt[:, None] * graph * inv_sqrt[None, :])
        lap = (scipy.sparse.identity(n, format="csr") - norm_graph
               + 1e-6 * scipy.sparse.identity(n, format="csr"))
        _, vec = scipy.sparse.linalg.eigsh(lap, k=k, sigma=0.0, which="LM")
    else:
        import scipy.linalg
        lap = np.eye(n) - inv_sqrt[:, None] * graph * inv_sqrt[None, :]
        _, vec = scipy.linalg.eigh(lap, subset_by_index=(0, k - 1))
    emb = vec[:, 1:dim + 1]
    if emb.shape[1] < dim:  # degenerate tiny inputs: pad with zeros
        emb = np.pad(emb, ((0, 0), (0, dim - emb.shape[1])))
    scale = 10.0 / max(np.abs(emb).max(), 1e-12)
    rng = np.random.default_rng(seed)
    return (emb * scale
            + rng.normal(scale=1e-4, size=emb.shape)).astype(np.float32)


@functools.lru_cache(maxsize=32)
def fit_ab(min_dist: float, spread: float = 1.0):
    """Fit the differentiable low-dim kernel 1/(1+a d^{2b}) to the desired
    membership curve (umap.umap_.find_ab_params)."""
    from scipy.optimize import curve_fit
    xv = np.linspace(0.0, spread * 3.0, 300)
    yv = np.where(xv < min_dist, 1.0,
                  np.exp(-(xv - min_dist) / spread))
    (a, b), _ = curve_fit(lambda x, a, b: 1.0 / (1.0 + a * x ** (2.0 * b)),
                          xv, yv)
    return float(a), float(b)


@functools.partial(jax.jit,
                   static_argnames=("n_epochs", "neg_rate"))
def _optimize_layout(y0, heads, tails, edge_p, n_real, key, a, b,
                     n_epochs: int, neg_rate: int):
    """Batched UMAP cross-entropy SGD: per epoch, each edge fires with its
    probability; attraction moves both endpoints, `neg_rate` uniformly
    sampled negatives repel the head. Per-dimension gradient clip 4.0 and
    linear learning-rate decay follow umap-learn."""

    def epoch(ep, carry):
        y, key = carry
        key, k_fire, k_neg = jax.random.split(key, 3)
        alpha = 1.0 - ep / n_epochs
        active = (jax.random.uniform(k_fire, edge_p.shape) < edge_p)
        yh = y[heads]
        yt = y[tails]
        diff = yh - yt
        d2 = jnp.sum(diff * diff, axis=1)
        att = jnp.where(
            d2 > 0.0,
            (-2.0 * a * b * d2 ** (b - 1.0)) / (1.0 + a * d2 ** b),
            0.0)
        g_att = jnp.clip(att[:, None] * diff, -4.0, 4.0)
        g_att = jnp.where(active[:, None], g_att, 0.0)
        upd = jnp.zeros_like(y)
        upd = upd.at[heads].add(g_att)
        upd = upd.at[tails].add(-g_att)

        negs = jax.random.randint(k_neg, (heads.shape[0], neg_rate),
                                  0, n_real)
        diffn = yh[:, None, :] - y[negs]
        d2n = jnp.sum(diffn * diffn, axis=2)
        rep = (2.0 * b) / ((0.001 + d2n) * (1.0 + a * d2n ** b))
        g_rep = jnp.clip(rep[..., None] * diffn, -4.0, 4.0)
        g_rep = jnp.where(active[:, None, None], g_rep, 0.0)
        upd = upd.at[heads].add(jnp.sum(g_rep, axis=1))
        return y + alpha * upd, key

    y, _ = jax.lax.fori_loop(0, n_epochs, epoch, (y0, key))
    return y


def _next_pow2(n: int, floor: int) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


def umap_embed(x, n_components: int = 32, n_neighbors: int = 16,
               min_dist: float = 0.05, metric: str = "cosine",
               n_epochs: Optional[int] = None, seed: int = 2023,
               negative_sample_rate: int = 5) -> np.ndarray:
    """UMAP embedding of (n, d) -> (n, n_components) float32."""
    x = np.asarray(x, np.float64)
    n = len(x)
    if n <= 2 or n_components >= n:
        # passthrough keeps the (n, n_components) shape contract
        out = np.zeros((n, n_components), np.float32)
        d = min(x.shape[1], n_components)
        out[:, :d] = x[:, :d]
        return out
    if n_epochs is None:
        n_epochs = 500 if n <= 10000 else 200

    graph = fuzzy_graph(x, n_neighbors, metric)
    y0 = spectral_init(graph, n_components, seed)
    a, b = fit_ab(min_dist)

    rows, cols = np.nonzero(graph)
    w = graph[rows, cols]
    edge_p = (w / w.max()).astype(np.float32)

    # pad to pow2 buckets: bounded compile count across recordings
    n_pad = _next_pow2(n, 64)
    e_pad = _next_pow2(len(rows), 1024)
    y_pad = np.zeros((n_pad, n_components), np.float32)
    y_pad[:n] = y0
    heads = np.full(e_pad, n_pad - 1, np.int32)
    tails = np.full(e_pad, n_pad - 1, np.int32)
    probs = np.zeros(e_pad, np.float32)
    heads[:len(rows)] = rows
    tails[:len(rows)] = cols
    probs[:len(rows)] = edge_p

    y = _optimize_layout(jnp.asarray(y_pad), jnp.asarray(heads),
                         jnp.asarray(tails), jnp.asarray(probs),
                         jnp.int32(n), jax.random.PRNGKey(seed),
                         jnp.float32(a), jnp.float32(b),
                         n_epochs, negative_sample_rate)
    return np.asarray(y[:n])
