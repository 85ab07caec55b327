"""Profiling utility smoke tests (CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wespeaker_tpu.utils.profiling import cost_analysis, sol_report


def test_cost_analysis_counts_matmul_flops():
    a = jnp.ones((128, 256), jnp.float32)
    b = jnp.ones((256, 128), jnp.float32)
    costs = cost_analysis(lambda x, y: x @ y, a, b)
    # 2*M*N*K = 8.4M flops
    assert costs["flops"] >= 2 * 128 * 128 * 256 * 0.9


def test_sol_report_runs():
    a = jnp.ones((64, 64), jnp.float32)
    rep = sol_report(lambda x: x @ x, a, iters=3)
    assert rep["seconds_per_call"] > 0
    assert np.isfinite(rep["achieved_tflops"])
