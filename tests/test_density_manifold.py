"""Native HDBSCAN (diar/density.py) and UMAP (diar/manifold.py) tests —
the self-contained replacements for the reference's umap-learn/hdbscan
dependencies (wespeaker/diar/umap_clusterer.py:227-243)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from wespeaker_tpu.diar.density import (condense_tree, hdbscan_labels,
                                        mst_edges, mutual_reachability,
                                        single_linkage_tree)
from wespeaker_tpu.diar.manifold import fit_ab, fuzzy_graph, umap_embed


def _blobs(n_per=50, k=3, dim=8, spread=0.3, seed=0):
    rng = np.random.default_rng(seed)
    x = np.vstack([rng.normal(5.0 * i, spread, (n_per, dim))
                   for i in range(k)])
    return x, np.repeat(np.arange(k), n_per)


# ---------------------------------------------------------------- HDBSCAN

def test_mutual_reachability_and_mst():
    x = np.array([[0.0], [1.0], [10.0], [11.0]])
    d = np.abs(x - x.T)
    mr = mutual_reachability(d, min_samples=1)
    # core distance of each point = distance to its 1st neighbor
    assert mr[0, 1] == 1.0
    assert mr[0, 2] == 10.0  # raw distance dominates the cores
    edges = mst_edges(mr)
    assert edges.shape == (3, 3)
    # the MST must contain both cheap intra-pair edges and one bridge
    weights = sorted(edges[:, 2])
    assert weights == [1.0, 1.0, 9.0]


def test_single_linkage_tree_shape():
    x, _ = _blobs(n_per=10, k=2)
    d = np.sqrt(((x[:, None] - x[None]) ** 2).sum(-1))
    mr = mutual_reachability(d, 3)
    np.fill_diagonal(mr, 0.0)
    tree = single_linkage_tree(mst_edges(mr), len(x))
    assert tree.shape == (len(x) - 1, 4)
    assert tree[-1, 3] == len(x)  # final merge spans all points
    assert np.all(np.diff(tree[:, 2]) >= 0)  # distances non-decreasing


def test_condense_tree_accounts_every_point():
    x, _ = _blobs(n_per=20, k=2)
    d = np.sqrt(((x[:, None] - x[None]) ** 2).sum(-1))
    mr = mutual_reachability(d, 4)
    np.fill_diagonal(mr, 0.0)
    tree = single_linkage_tree(mst_edges(mr), len(x))
    cond = condense_tree(tree, len(x), min_cluster_size=4)
    points = sorted(int(c) for c in cond[cond[:, 1] < len(x), 1])
    assert points == list(range(len(x)))  # every point falls out once


def test_hdbscan_recovers_blobs_and_noise():
    x, want = _blobs()
    rng = np.random.default_rng(1)
    noise = rng.uniform(-4, 14, (12, x.shape[1]))
    labels = np.array(hdbscan_labels(np.vstack([x, noise]),
                                     min_cluster_size=4))
    assert set(labels[:len(x)]) == {0, 1, 2}
    for i in range(3):
        seg = labels[:len(x)][want == i]
        assert len(set(seg.tolist())) == 1  # each blob is one pure cluster
    assert (labels[len(x):] == -1).mean() > 0.5  # most noise flagged


def test_hdbscan_single_cluster_flag():
    x = np.random.default_rng(0).normal(0, 0.3, (40, 8))
    assert set(hdbscan_labels(x, 4, allow_single_cluster=True)) == {0}
    # without the flag the root is not a candidate: all noise
    assert set(hdbscan_labels(x, 4, allow_single_cluster=False)) == {-1}


def test_hdbscan_min_cluster_size_suppresses_tiny_groups():
    x, _ = _blobs(n_per=30, k=2)
    tiny = np.random.default_rng(2).normal(20.0, 0.1, (3, x.shape[1]))
    labels = np.array(hdbscan_labels(np.vstack([x, tiny]),
                                     min_cluster_size=4))
    assert set(labels[-3:].tolist()) == {-1}  # 3 < min_cluster_size
    assert set(labels[:60]) == {0, 1}


def test_hdbscan_cosine_metric():
    rng = np.random.default_rng(3)
    c = rng.normal(size=(2, 16))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    x = np.vstack([c[i] + 0.05 * rng.normal(size=(25, 16))
                   for i in range(2)])
    labels = np.array(hdbscan_labels(x, 4, metric="cosine"))
    assert len(set(labels[:25].tolist())) == 1
    assert len(set(labels[25:].tolist())) == 1
    assert labels[0] != labels[-1]


# ------------------------------------------------------------------- UMAP

def test_fit_ab_matches_published_defaults():
    # umap-learn's find_ab_params(1.0, 0.1) ~ (1.577, 0.895)
    a, b = fit_ab(0.1)
    assert abs(a - 1.577) < 0.02
    assert abs(b - 0.895) < 0.01


def test_fuzzy_graph_properties():
    # euclidean metric: blob 0 sits at the origin, where cosine distances
    # between its own points are large (random directions)
    x, _ = _blobs(n_per=20, k=2)
    g = fuzzy_graph(x, n_neighbors=8, metric="euclidean")
    assert g.shape == (40, 40)
    np.testing.assert_allclose(g, g.T, atol=1e-12)  # symmetric
    assert g.min() >= 0.0 and g.max() <= 1.0 + 1e-12
    assert np.all(np.diag(g) == 0.0)
    # within-blob connectivity dominates cross-blob
    assert g[:20, :20].sum() > 50 * g[:20, 20:].sum()


def test_umap_embed_preserves_structure_and_is_deterministic():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(3, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = np.vstack([c + 0.15 * rng.normal(size=(40, 64)) for c in centers])
    want = np.repeat(np.arange(3), 40)

    y = umap_embed(x, n_components=8, n_epochs=200)
    assert y.shape == (120, 8) and y.dtype == np.float32

    d = ((y[:, None] - y[None]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    assert (want[d.argmin(1)] == want).mean() > 0.9  # NN purity

    y2 = umap_embed(x, n_components=8, n_epochs=200)
    np.testing.assert_array_equal(y, y2)  # seeded + jitted: bit-identical


def test_umap_embed_tiny_input_passthrough():
    x = np.random.default_rng(0).normal(size=(2, 16))
    y = umap_embed(x, n_components=8)
    assert y.shape == (2, 8)
    # shape contract holds even when input dim < n_components
    y2 = umap_embed(np.zeros((2, 4)), n_components=8)
    assert y2.shape == (2, 8)


def test_fuzzy_graph_duplicate_rows_have_no_self_loop():
    x, _ = _blobs(n_per=20, k=2)
    x[7] = x[3]  # exact duplicate (e.g. identical padded silence segments)
    g = fuzzy_graph(x, n_neighbors=8, metric="euclidean")
    assert np.all(np.diag(g) == 0.0)
    assert g[3, 7] > 0.99  # duplicates are each other's strongest neighbor


def test_metric_and_impl_validation():
    x = np.random.default_rng(0).normal(size=(20, 4))
    with pytest.raises(ValueError, match="metric"):
        hdbscan_labels(x, 4, metric="manhattan")
    with pytest.raises(ValueError, match="min_cluster_size"):
        hdbscan_labels(x, 1)
    from wespeaker_tpu.diar.umap_clusterer import cluster
    with pytest.raises(ValueError, match="impl"):
        cluster(x, impl="ref")


def test_hdbscan_tiny_input_noise_semantics():
    x = np.random.default_rng(0).normal(size=(2, 4))
    assert hdbscan_labels(x, 4, allow_single_cluster=False) == [-1, -1]
    assert hdbscan_labels(x, 4, allow_single_cluster=True) == [-1, -1]
    assert hdbscan_labels(x, 2, allow_single_cluster=True) == [0, 0]


def test_spectral_init_sparse_path_matches_dense():
    """>1024 points routes through sparse Lanczos; the subspace it finds
    must match the dense eigendecomposition (up to per-vector sign)."""
    from wespeaker_tpu.diar.manifold import spectral_init
    rng = np.random.default_rng(0)
    x = np.vstack([rng.normal(5.0 * i, 0.5, (400, 4)) for i in range(3)])
    g = fuzzy_graph(x, n_neighbors=8, metric="euclidean")
    y_sparse = spectral_init(g, 4, seed=1)          # n=1200 -> sparse
    import scipy.linalg
    deg = np.maximum(g.sum(axis=1), 1e-12)
    inv = 1.0 / np.sqrt(deg)
    lap = np.eye(len(g)) - inv[:, None] * g * inv[None, :]
    _, vec = scipy.linalg.eigh(lap, subset_by_index=(0, 4))
    dense = vec[:, 1:5]
    dense *= 10.0 / max(np.abs(dense).max(), 1e-12)
    # compare column spans (eigenvectors are sign/rotation ambiguous in
    # degenerate blocks): project one basis onto the other
    q_s, _ = np.linalg.qr(y_sparse.astype(np.float64))
    q_d, _ = np.linalg.qr(dense)
    overlap = np.linalg.svd(q_s.T @ q_d, compute_uv=False)
    assert overlap.min() > 0.99
