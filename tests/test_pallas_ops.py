"""Pallas pooling kernels vs jnp references (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wespeaker_tpu.ops.pooling_pallas import (fused_masked_stats,
                                              fused_softmax_stats)


def test_fused_softmax_stats_matches_reference():
    rng = np.random.default_rng(0)
    b, t, d = 3, 50, 256
    logits = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    mean, std = fused_softmax_stats(logits, x, interpret=True)

    w = jax.nn.softmax(logits, axis=1)
    want_mean = jnp.sum(w * x, axis=1)
    want_var = jnp.sum(w * x**2, axis=1) - want_mean**2
    want_std = jnp.sqrt(jnp.clip(want_var, min=1e-7))
    np.testing.assert_allclose(np.asarray(mean), np.asarray(want_mean),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(std), np.asarray(want_std),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_masked_stats_matches_reference(with_mask):
    rng = np.random.default_rng(1)
    b, t, d = 2, 40, 128
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    mask = None
    if with_mask:
        m = np.ones((b, t), np.float32)
        m[0, 25:] = 0.0
        m[1, 33:] = 0.0
        mask = jnp.asarray(m)
    mean, std = fused_masked_stats(x, mask, ddof=1, interpret=True)

    from wespeaker_tpu.models.pooling_layers import _std
    want_mean, want_std = _std(x, mask, ddof=1)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(want_mean),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(std), np.asarray(want_std),
                               atol=1e-5, rtol=1e-5)


def test_fused_res2_module_matches_standard():
    """ECAPA with fused_res2=True (Pallas, interpret on CPU) must equal the
    standard flax path on identical variables."""
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN

    std = ECAPA_TDNN(channels=64, feat_dim=24, embed_dim=32)
    fused = ECAPA_TDNN(channels=64, feat_dim=24, embed_dim=32,
                       fused_res2=True)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(3, 60, 24)).astype(np.float32))
    variables = std.init(jax.random.PRNGKey(0), x)
    # randomize BN stats so folding is actually exercised
    import jax as _j
    bs = jax.tree_util.tree_map(
        lambda a: a + 0.1 * _j.random.normal(_j.random.PRNGKey(1), a.shape),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    want = np.asarray(std.apply(variables, x))
    got = np.asarray(fused.apply(variables, x))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
