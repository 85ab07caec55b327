"""Cross-chip collective helpers on the 8-device virtual mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wespeaker_tpu.parallel.collect import (all_gather_embeddings,
                                            sharded_affinity,
                                            sharded_cohort_stats)
from wespeaker_tpu.parallel.mesh import batch_sharding, make_mesh


def test_all_gather_embeddings():
    mesh = make_mesh()
    emb = np.random.default_rng(0).normal(size=(32, 16)).astype(np.float32)
    sharded = jax.device_put(jnp.asarray(emb), batch_sharding(mesh))
    out = all_gather_embeddings(sharded, mesh)
    np.testing.assert_allclose(np.asarray(out), emb, atol=1e-6)


def test_sharded_cohort_stats_matches_single_device():
    from wespeaker_tpu.backend.scoring import cohort_mean_std
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(16, 24)).astype(np.float32)
    cohort = rng.normal(size=(50, 24)).astype(np.float32)
    mean, std = sharded_cohort_stats(jnp.asarray(emb), jnp.asarray(cohort),
                                     mesh, top_n=10)
    want_mean, want_std = cohort_mean_std(emb, cohort, 10)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(want_mean),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(std), np.asarray(want_std),
                               atol=1e-5)


def test_sharded_affinity_matches_numpy():
    mesh = make_mesh()
    rng = np.random.default_rng(2)
    emb = rng.normal(size=(24, 8)).astype(np.float32)
    aff = np.asarray(sharded_affinity(jnp.asarray(emb), mesh))
    n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    want = 0.5 * (1 + n @ n.T)
    np.testing.assert_allclose(aff, want, atol=1e-5)
