"""Pallas TPU kernels for statistics pooling.

The pooling reductions are the bandwidth-bound tail of every speaker model:
ASTP materializes softmax(alpha) (B, T, D) and reads x three times
(wespeaker pooling semantics). These kernels fuse softmax + weighted
mean/var (and masked mean/std for TSTP) into a single pass over the time
axis held in VMEM — one HBM read of each operand, no intermediate writes.

Grid: (B // BLOCK_B, D // BLOCK_D); each program reduces a
(BLOCK_B, T, BLOCK_D) tile (TPU tiling wants the output's second-to-last
block dim divisible by 8, hence the batch tile). Numerics match the jnp
reference to fp32 tolerance; tests run in interpret mode on CPU and the
perf harness validates real mode on TPU.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_B = 8
BLOCK_D = 128


def _softmax_stats_kernel(logits_ref, x_ref, mean_ref, std_ref):
    logits = logits_ref[...].astype(jnp.float32)  # (BB, T, BD)
    x = x_ref[...].astype(jnp.float32)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=1, keepdims=True)
    mean = jnp.sum(w * x, axis=1)
    var = jnp.sum(w * x * x, axis=1) - mean * mean
    mean_ref[...] = mean
    std_ref[...] = jnp.sqrt(jnp.clip(var, min=1e-7))


def _pad_batch(arrs, b):
    pad = (-b) % BLOCK_B
    if pad == 0:
        return arrs, b
    return [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in arrs], b + pad


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_softmax_stats(logits, x, interpret: bool = False):
    """softmax over time + attentive mean/std in one fused pass.

    logits, x: (B, T, D) -> (mean (B, D), std (B, D)); the ASTP tail
    (pooling_layers.ASTP after linear2) without materializing the softmax.
    """
    b0, t, d = x.shape
    assert d % BLOCK_D == 0, d
    (logits, x), b = _pad_batch([logits, x], b0)
    grid = (b // BLOCK_B, d // BLOCK_D)
    spec_in = pl.BlockSpec((BLOCK_B, t, BLOCK_D), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((BLOCK_B, BLOCK_D), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    mean, std = pl.pallas_call(
        _softmax_stats_kernel,
        grid=grid,
        in_specs=[spec_in, spec_in],
        out_specs=(spec_out, spec_out),
        out_shape=(jax.ShapeDtypeStruct((b, d), jnp.float32),
                   jax.ShapeDtypeStruct((b, d), jnp.float32)),
        interpret=interpret,
    )(logits, x)
    return mean[:b0], std[:b0]


def softmax_stats_fits(t, d, itemsize: int = 4) -> bool:
    """Envelope where the fused softmax-stats kernel applies: lane-aligned
    feature dim and a (BLOCK_B, T, BLOCK_D) tile pair (+f32 casts) within
    VMEM (~16 MB/core). Symbolic t (jax.export) routes to the jnp path."""
    if not isinstance(t, int) or not isinstance(d, int):
        return False
    tile = BLOCK_B * t * BLOCK_D * itemsize
    return d % BLOCK_D == 0 and tile * 4 <= 16 * 1024 * 1024


def _masked_stats_kernel(x_ref, mask_ref, mean_ref, std_ref, *, ddof):
    x = x_ref[...].astype(jnp.float32)     # (BB, T, BD)
    m = mask_ref[...].astype(jnp.float32)  # (BB, T, 1)
    count = jnp.sum(m, axis=1)
    mean = jnp.sum(x * m, axis=1) / jnp.maximum(count, 1.0)
    centered = (x - mean[:, None, :]) * m
    var = jnp.sum(centered * centered, axis=1) / jnp.maximum(count - ddof,
                                                             1.0)
    mean_ref[...] = mean
    std_ref[...] = jnp.sqrt(var + 1e-7)


@functools.partial(jax.jit, static_argnames=("ddof", "interpret"))
def fused_masked_stats(x, mask=None, ddof: int = 1, interpret: bool = False):
    """Masked mean + (ddof-adjusted) std over time in one pass — the TSTP /
    global-context reduction. x: (B, T, D); mask: (B, T) or None."""
    b0, t, d = x.shape
    assert d % BLOCK_D == 0, d
    if mask is None:
        mask = jnp.ones((b0, t), jnp.float32)
    mask3 = mask[:, :, None].astype(jnp.float32)
    (x, mask3), b = _pad_batch([x, mask3], b0)
    grid = (b // BLOCK_B, d // BLOCK_D)
    spec_x = pl.BlockSpec((BLOCK_B, t, BLOCK_D), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((BLOCK_B, t, 1), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((BLOCK_B, BLOCK_D), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    mean, std = pl.pallas_call(
        functools.partial(_masked_stats_kernel, ddof=ddof),
        grid=grid,
        in_specs=[spec_x, spec_m],
        out_specs=(spec_out, spec_out),
        out_shape=(jax.ShapeDtypeStruct((b, d), jnp.float32),
                   jax.ShapeDtypeStruct((b, d), jnp.float32)),
        interpret=interpret,
    )(x, mask3)
    return mean[:b0], std[:b0]
