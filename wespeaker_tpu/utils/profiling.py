"""Profiling / speed-of-light accounting.

The reference only measures wall-clock RTF in the C++ runtime
(runtime/core/bin/extract_emb_main.cc:57-61). TPU-native observability
(SURVEY.md §5): jax.profiler traces for timeline capture plus XLA cost
analysis for FLOP/byte counts, reported against device peak as a
speed-of-light fraction.
"""

import contextlib
import time
from typing import Callable, Dict, Optional

import jax

# rough per-chip peaks for SOL accounting (bf16 FLOP/s, HBM bytes/s)
DEVICE_PEAKS = {
    "v5e": (197e12, 820e9),
    "v5litepod": (197e12, 820e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1200e9),
}


def detect_peaks() -> Optional[tuple]:
    kind = jax.devices()[0].device_kind.lower().replace(" ", "")
    for name, peaks in DEVICE_PEAKS.items():
        if name in kind:
            return peaks
    if "tpu" in kind or "lite" in kind:
        return DEVICE_PEAKS["v5e"]
    return None


def cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """Static FLOP/byte estimate of a jitted function via XLA."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0]
    return {"flops": float(costs.get("flops", 0.0)),
            "bytes_accessed": float(costs.get("bytes accessed", 0.0))}


def sol_report(fn: Callable, *args, iters: int = 20) -> Dict[str, float]:
    """Measure a jitted function and report achieved FLOP/s + bandwidth and
    the speed-of-light fractions on this device."""
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    # fetch a scalar: through remote-tunnel platforms block_until_ready on
    # the final buffer can return before the chain completes
    jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters

    costs = cost_analysis(fn, *args)
    report = {"seconds_per_call": dt,
              "achieved_tflops": costs["flops"] / dt / 1e12,
              "achieved_gbps": costs["bytes_accessed"] / dt / 1e9}
    peaks = detect_peaks()
    if peaks:
        report["sol_compute_fraction"] = costs["flops"] / dt / peaks[0]
        report["sol_memory_fraction"] = costs["bytes_accessed"] / dt / peaks[1]
    return report


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler timeline capture (view in TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
