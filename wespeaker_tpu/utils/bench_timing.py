"""On-device loop timing for benchmarks through high-latency dispatch paths.

The TPU tunnel imposes a large per-dispatch floor (measured ~40 ms per
Python->device round trip in some sessions), so the usual
enqueue-N-then-block loop can't resolve programs cheaper than the floor —
it reports max(compute, floor). These helpers run the iterations inside ONE
jitted fori_loop and time the slope between two trip counts, so both the
dispatch floor and the loop-entry cost cancel.

Serialization: jax.lax.optimization_barrier is value-transparent (XLA still
knows output==input and dead-code-eliminates a repeated pure body), so each
iteration instead perturbs one input element by tanh(sum(outputs)) * 1e-38
— numerically invisible, but impossible to constant-fold, forcing every
iteration to execute in sequence.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def make_serial_loop(fn, perturb_key=None):
    """fn: pytree batch -> pytree/array output. Returns loop(data, n) that
    runs fn n times sequentially on device. data must be a dict; the
    perturbed leaf (perturb_key or the first key) must be a float array."""

    def body(_, carry):
        out = fn(carry)
        s = sum(jnp.sum(leaf.astype(jnp.float32))
                for leaf in jax.tree_util.tree_leaves(out))
        key = perturb_key or next(iter(carry))
        leaf = carry[key]
        eps = (jnp.tanh(s) * 1e-38).astype(leaf.dtype)
        carry = dict(carry)
        carry[key] = leaf.at[(0,) * leaf.ndim].add(eps)
        return carry

    return jax.jit(lambda d, n: jax.lax.fori_loop(0, n, body, d))


def time_loop(loop, data, iters=20, base=5, reps=2):
    """Per-iteration seconds of loop(data, n) via the (base, base+iters)
    slope; min over reps to shed scheduling noise."""

    def run(n):
        t0 = time.perf_counter()
        out = loop(data, n)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])  # scalar fetch: real completion
        return time.perf_counter() - t0

    run(2)  # compile + warm
    lo = min(run(base) for _ in range(reps))
    hi = min(run(base + iters) for _ in range(reps))
    return max(hi - lo, 1e-9) / iters


def time_fn_on_device(fn, data, iters=20, perturb_key=None):
    """Convenience: per-iteration seconds of fn(data) on device."""
    return time_loop(make_serial_loop(fn, perturb_key), data, iters=iters)
