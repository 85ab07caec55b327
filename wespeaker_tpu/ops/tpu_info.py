"""Device-derived VMEM budget for the fused Pallas kernels.

The fused SE-Res2 / MFA+ASTP kernels were tuned on a "TPU v5 lite" chip
where a 100 MB ``vmem_limit_bytes`` compiles and wins (docs/PERF.md).
Generations with the small (~16 MB) classic VMEM would pass a hardcoded
100 MB fit check and then fail or regress under Mosaic, so the budget is
derived from the attached device:

- the measured generation family (v5e/v5p/v6) keeps the validated 100 MB;
- unknown or older TPU kinds drop to a conservative 16 MB, which routes
  oversized tiles to the jnp fallback instead of a compile failure;
- non-TPU backends (CPU tests, jax.export tracing) keep the measured
  envelope — the kernels only run there in interpret mode, where no real
  VMEM constraint exists, and the fit checks must behave like the chip.

``WESPEAKER_VMEM_BUDGET`` (bytes) overrides everything for tuning on new
hardware; scripts/check_fused_tpu.py remains the required on-chip gate.
"""

import functools
import os

MEASURED_BUDGET = 100 * 1024 * 1024
CONSERVATIVE_BUDGET = 16 * 1024 * 1024

# device_kind substrings of the generation family the 100 MB budget was
# validated on (v5e reports "TPU v5 lite"); v5p/v6e carry at least as much
# VMEM per core as v5e.
_MEASURED_FAMILY = ("v5 lite", "v5e", "v5p", "v6 lite", "v6e", "v6")


@functools.lru_cache(maxsize=None)
def vmem_budget_bytes() -> int:
    env = os.environ.get("WESPEAKER_VMEM_BUDGET")
    if env:
        return int(env)
    try:
        import jax
        dev = jax.devices()[0]
    except Exception:
        return MEASURED_BUDGET
    if dev.platform != "tpu":
        return MEASURED_BUDGET
    kind = getattr(dev, "device_kind", "").lower()
    if any(f in kind for f in _MEASURED_FAMILY):
        return MEASURED_BUDGET
    return CONSERVATIVE_BUDGET
