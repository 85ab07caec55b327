"""Data-parallel scaling of the jitted train step over a device mesh.

Runs the FULL train step (device fbank -> CMVN -> spec-aug -> ECAPA fwd/bwd
-> ArcMargin -> SGD, grads psum'd over the 'data' axis) at a fixed
per-device batch for each device count, and reports weak-scaling step time
and efficiency, plus a determinism check: the loss must be identical (to
f32 reduction tolerance) across device counts for the same global batch.

On real hardware the same harness reports 1 chip / 1 host / N hosts; here
it runs on the virtual CPU mesh (xla_force_host_platform_device_count), so
absolute times are host-bound and efficiency is pessimistic when device
count exceeds physical cores — the point is exercising the collectives and
the measurement machinery, not CPU throughput.

Usage: python scripts/bench_scaling.py [per_device_batch] [max_devices]
"""

import json
import os
import sys

# CPU virtual mesh: scrub the TPU-tunnel env (see tests/conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"
for _k in list(os.environ):
    if "AXON" in _k or _k in ("PJRT_LIBRARY_PATH", "TPU_LIBRARY_PATH"):
        del os.environ[_k]
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import optax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from wespeaker_tpu.frontend import FbankConfig  # noqa: E402
from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN  # noqa: E402
from wespeaker_tpu.models.projections import ArcMarginProduct  # noqa: E402
from wespeaker_tpu.parallel.mesh import make_mesh  # noqa: E402
from wespeaker_tpu.train import init_train_state, make_train_step  # noqa: E402
from wespeaker_tpu.utils.schedulers import (ExponentialDecrease,  # noqa: E402
                                            MarginScheduler)


def build_step(feat_dim=64, embed_dim=128, num_class=256):
    model = ECAPA_TDNN(channels=128, feat_dim=feat_dim, embed_dim=embed_dim)
    projection = ArcMarginProduct(embed_dim, num_class)
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=0.1, momentum=0.9)
    step_fn = make_train_step(
        model, projection, tx,
        ExponentialDecrease(2, 100, 0.1, 0.01, warm_up_epoch=1),
        MarginScheduler(100, 1, 2, 0.0, 0.2),
        fbank_cfg=FbankConfig(num_mel_bins=feat_dim, dither=0.0))
    state = init_train_state(model, projection, tx, jax.random.PRNGKey(0),
                             feat_dim=feat_dim, embed_dim=embed_dim)
    return step_fn, state


def run_one(n_dev, per_dev_batch, step_fn, state, wav, label, iters=8):
    mesh = make_mesh(devices=jax.devices("cpu")[:n_dev])
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    b = per_dev_batch * n_dev
    batch = {"wav": jax.device_put(wav[:b], data),
             "label": jax.device_put(label[:b], data)}
    st = jax.device_put(state, rep)
    step = jax.jit(step_fn, out_shardings=(rep, rep))
    st, metrics = step(st, batch)
    first_loss = float(metrics["loss"])  # fetch = sync
    t0 = time.perf_counter()
    for _ in range(iters):
        st, metrics = step(st, batch)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    return dt, first_loss


def main():
    per_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    max_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    step_fn, state = build_step()
    rng = np.random.default_rng(0)
    wav = rng.uniform(-0.5, 0.5, (per_dev * max_dev, 32240)).astype(np.float32)
    label = rng.integers(0, 256, per_dev * max_dev).astype(np.int32)

    counts = [n for n in (1, 2, 4, 8) if n <= max_dev]
    rows, t1 = [], None
    for n in counts:
        dt, loss = run_one(n, per_dev, step_fn, state, wav, label)
        t1 = t1 or dt
        rows.append({"devices": n, "global_batch": per_dev * n,
                     "step_ms": round(dt * 1e3, 2),
                     "weak_scaling_eff": round(t1 / dt, 3),
                     "loss": round(loss, 6)})
        print(json.dumps(rows[-1]))

    # same GLOBAL batch on 1 vs max devices must produce the same loss:
    # psum-of-partial-means == full-batch mean (DP == DDP semantics)
    b = per_dev * counts[-1]
    _, l1 = run_one(1, b, step_fn, state, wav, label, iters=1)
    _, ln = run_one(counts[-1], per_dev, step_fn, state, wav, label, iters=1)
    agree = abs(l1 - ln) < 1e-4 * max(1.0, abs(l1))
    print(json.dumps({"dp_loss_1dev": l1, "dp_loss_ndev": ln,
                      "agree": bool(agree)}))
    assert agree, (l1, ln)


if __name__ == "__main__":
    main()
