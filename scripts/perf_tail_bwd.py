"""Standalone MFA+ASTP tail fwd+bwd timings (round-3 occupancy attack).

Compares, in one process at flagship train shapes (B=256, T=200, C=512,
bf16), the tail's value+grad cost under:
  autodiff   jax.grad through the jnp reference (what the std path pays)
  custom     the custom_vjp (Pallas fwd + structured jnp bwd)

Usage: python scripts/perf_tail_bwd.py [batch]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wespeaker_tpu.ops.mfa_astp_vjp import (mfa_astp_train,
                                            mfa_astp_train_reference)
from wespeaker_tpu.utils.bench_timing import time_fn_on_device


def main():
    from wespeaker_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    t, c, a = 200, 512, 128
    d = 3 * c
    rng = np.random.default_rng(0)

    def mk(*s, dt=jnp.bfloat16):
        return jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3,
                           dtype=dt)

    data = {"x2": mk(batch, t, c), "x3": mk(batch, t, c),
            "x4": mk(batch, t, c), "wm": mk(3 * c, d),
            "bm": mk(d, dt=jnp.float32), "k1": mk(3 * d, a),
            "b1": mk(a, dt=jnp.float32), "k2": mk(a, d),
            "b2": mk(d, dt=jnp.float32)}
    gw = mk(batch, 2 * d, dt=jnp.float32)
    order = ["x2", "x3", "x4", "wm", "bm", "k1", "b1", "k2", "b2"]

    out = {}
    for name, op in (("autodiff",
                      lambda *A: mfa_astp_train_reference(*A, glob=True)),
                     ("custom",
                      lambda *A: mfa_astp_train(*A, True, False))):
        def loss(b_):
            return jax.grad(
                lambda dd: jnp.sum(op(*[dd[k] for k in order]) * gw))(b_)
        dt_s = time_fn_on_device(jax.jit(loss), data, iters=15,
                                 perturb_key="x2")
        out[name] = {"ms": round(dt_s * 1e3, 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
