"""Test configuration: run everything on a virtual 8-device CPU backend so
multi-chip sharding logic is exercised without TPU hardware (the driver
separately dry-runs the real multi-chip path via __graft_entry__)."""

import os
import sys

# Force CPU: the ambient environment points JAX_PLATFORMS at the remote TPU
# tunnel ('axon'), which would make every unit test a slow remote call — the
# axon plugin also routes *compilation* through the tunnel
# (PALLAS_AXON_REMOTE_COMPILE), so its env must be cleared entirely, not just
# the platform name, or CPU compiles still take ~0.4s of network latency each.
os.environ["JAX_PLATFORMS"] = "cpu"
for _k in list(os.environ):
    if "AXON" in _k or _k in ("PJRT_LIBRARY_PATH", "TPU_LIBRARY_PATH"):
        del os.environ[_k]

# A pytest plugin may already have imported jax (baking in the env-derived
# platform list), so set the config knob explicitly as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"

if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "wespeaker"))


def add_reference_to_path():
    """Make the public reference repo importable (torch models only) so tests
    can generate golden outputs for numerical parity checks."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
