"""Fused ECAPA MFA-conv + ASTP tail as a single Pallas TPU kernel.

The model tail — concat(out2,out3,out4) -> conv1536 -> relu -> attentive
statistics pooling (wespeaker/models/ecapa_tdnn.py:205-213 equivalent,
pooling_layers.py ASTP) — carries the model's largest activations
(B, T, 1536) through ~8 HBM round trips: the concat, the MFA matmul, the
attention conv pair, the softmax, and the weighted-stats reductions. At
flagship shapes that is several GB of traffic for ~60% of the model FLOPs.

This kernel reads the three block outputs once, computes the MFA matmul as
three sliced products (the concat never materializes), and keeps the
(T, 1536) hidden map, attention logits, softmax, and both weighted-stats
reductions VMEM-resident. Output is the pooled (B, 2*D) stats vector —
a ~1000x reduction in bytes written.

Inference-only; masked padded buckets supported (mask gates the context
stats, the softmax, and nothing else — exactly the standard path).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wespeaker_tpu.ops.tpu_info import vmem_budget_bytes

# Batch-tile size: BLOCK_B=1 measured 17.9 ms end-to-end at B=512 (vs
# 11.99 XLA) — ~30 us of per-grid-step overhead x 512 programs swamps the
# fusion win. Larger tiles amortize it; needs the raised vmem limit.
BLOCK_B = int(os.environ.get("WESPEAKER_TAIL_BLOCK_B", "8"))
_NEG_INF = -1e30


def _tail_math(parts, mask, wm, bm, k1x, k1m, k1s, b1, k2, b2, *,
               glob: bool, t: int, io_dtype):
    """Shared forward math on values: parts = [x2, x3, x4] (NB, T, C) each;
    mask (NB, T) f32 or None. Returns (NB, 2*D) pooled stats."""
    c = parts[0].shape[-1]
    dn = (((2,), (0,)), ((), ()))

    def dot(a, w):
        return jax.lax.dot_general(a, w.astype(a.dtype), dn,
                                   preferred_element_type=jnp.float32)

    acc = bm.astype(jnp.float32)
    for i, p in enumerate(parts):
        acc = acc + dot(p, wm[i * c:(i + 1) * c])
    h = jnp.maximum(acc, 0.0).astype(io_dtype)  # (NB, T, D) post-relu

    hf = h.astype(jnp.float32)
    if mask is not None:
        m3 = mask[..., None]
        cnt = jnp.maximum(jnp.sum(m3, axis=1, keepdims=True), 1.0)
    if glob:
        # unbiased context stats over valid frames (pooling_layers._std)
        if mask is not None:
            cmean = jnp.sum(hf * m3, axis=1, keepdims=True) / cnt
            sq = ((hf - cmean) ** 2) * m3
            cvar = jnp.sum(sq, axis=1) / jnp.maximum(
                jnp.squeeze(cnt, 1) - 1.0, 1.0)
        else:
            cmean = jnp.mean(hf, axis=1, keepdims=True)
            cvar = jnp.sum((hf - cmean) ** 2, axis=1) / max(t - 1, 1)
        cstd = jnp.sqrt(cvar + 1e-7)
        dn2 = (((1,), (0,)), ((), ()))
        ctx = (jax.lax.dot_general(
                   jnp.squeeze(cmean, 1).astype(io_dtype),
                   k1m.astype(io_dtype), dn2,
                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(
                   cstd.astype(io_dtype), k1s.astype(io_dtype), dn2,
                   preferred_element_type=jnp.float32)
               + b1)  # (NB, A)
        alpha = jnp.tanh(dot(h, k1x) + ctx[:, None, :])
    else:
        alpha = jnp.tanh(dot(h, k1x) + b1)
    alpha = dot(alpha.astype(io_dtype), k2) + b2  # (NB, T, D) f32 logits
    if mask is not None:
        alpha = jnp.where(m3 > 0, alpha, _NEG_INF)
    alpha = alpha - jnp.max(alpha, axis=1, keepdims=True)
    e = jnp.exp(alpha)
    w = e / jnp.sum(e, axis=1, keepdims=True)  # softmax over T
    mean = jnp.sum(w * hf, axis=1)
    var = jnp.sum(w * hf * hf, axis=1) - mean * mean
    std = jnp.sqrt(jnp.clip(var, min=1e-7))
    return jnp.concatenate([mean, std], axis=-1)


def _tail_kernel(*refs, glob: bool, masked: bool, t: int):
    if masked:
        (x2_ref, x3_ref, x4_ref, mask_ref, wm_ref, bm_ref, k1x_ref, k1m_ref,
         k1s_ref, b1_ref, k2_ref, b2_ref, o_ref) = refs
        # mask ships as (NB, 1, T) for Mosaic's block-shape rules
        mask = jnp.swapaxes(mask_ref[...], 1, 2)[..., 0]
    else:
        (x2_ref, x3_ref, x4_ref, wm_ref, bm_ref, k1x_ref, k1m_ref, k1s_ref,
         b1_ref, k2_ref, b2_ref, o_ref) = refs
        mask = None
    io_dtype = x2_ref.dtype
    out = _tail_math([x2_ref[...], x3_ref[...], x4_ref[...]], mask,
                     wm_ref[...], bm_ref[...], k1x_ref[...], k1m_ref[...],
                     k1s_ref[...], b1_ref[...], k2_ref[...], b2_ref[...],
                     glob=glob, t=t, io_dtype=io_dtype)
    o_ref[...] = out[:, None, :].astype(jnp.float32)


def mfa_astp_reference(x2, x3, x4, wm, bm, k1, b1, k2, b2, mask=None,
                       glob: bool = True):
    """Plain-jnp fallback with the same contract as fused_mfa_astp."""
    c = x2.shape[-1]
    d = wm.shape[-1]
    k1x, k1m, k1s = k1[:d], k1[d:2 * d], k1[2 * d:]
    if not glob:
        k1x, k1m, k1s = k1, None, None
    m = None if mask is None else mask.astype(jnp.float32)
    return _tail_math(
        [x2, x3, x4], m, wm, bm.astype(jnp.float32), k1x, k1m, k1s,
        b1.astype(jnp.float32), k2, b2.astype(jnp.float32),
        glob=glob, t=x2.shape[1], io_dtype=x2.dtype)


def tail_kernel_fits(t, c: int, itemsize: int = 2, d=None) -> bool:
    """VMEM model: double-buffered input tiles + resident weights + the
    (t, d) hidden map and ~3 f32-sized temporaries (logits, softmax,
    stats products). c is the per-block channel count, d the MFA output
    width (the reference fixes d=1536 for every ECAPA size). Symbolic t
    (jax.export) routes to the fallback, as does a sublane-misaligned t
    (t % 8 != 0, e.g. the 99-frame WavLM composite or 198-frame 2 s
    buckets): Mosaic rejects those with "unsupported shape cast". The
    budget is device-derived (ops/tpu_info.py): small-VMEM TPU
    generations take the fallback."""
    if not isinstance(t, int) or t % 8:
        return False
    d = d or 3 * c
    vmem = (2 * 3 * BLOCK_B * t * c * itemsize   # pipelined x2/x3/x4 tiles
            + 3 * c * d * itemsize               # MFA weights (resident)
            + 4 * d * 128 * itemsize             # attention kernels
            + BLOCK_B * t * d * itemsize         # h
            + 3 * BLOCK_B * t * d * 4)           # f32 logits/softmax/temps
    return vmem <= vmem_budget_bytes() // 2


@functools.partial(jax.jit, static_argnames=("glob", "interpret"))
def fused_mfa_astp(x2, x3, x4, wm, bm, k1, b1, k2, b2, mask=None,
                   glob: bool = True, interpret: bool = False):
    """x2/x3/x4: (B, T, C) SE-Res2 block outputs. wm: (3C, D) MFA conv
    weight (D = 3C for ECAPA), bm: (D,). k1: ASTP linear1 kernel —
    (3D, A) when glob (slices [x, ctx_mean, ctx_std]) else (D, A);
    b1: (A,). k2: (A, D), b2: (D,). mask: optional (B, T) frame validity.
    Returns (B, 2D) f32 pooled [mean | std] — the input to the post-pool
    BatchNorm of the model."""
    b0, t, c = x2.shape
    d = wm.shape[-1]
    a = k1.shape[-1]
    assert wm.shape[0] == 3 * c
    pad = (-b0) % BLOCK_B
    if pad:
        x2, x3, x4 = (jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
                      for v in (x2, x3, x4))
        if mask is not None:
            mask = jnp.pad(mask, ((0, pad), (0, 0)))
    b = b0 + pad
    io_dtype = x2.dtype
    masked = mask is not None

    if glob:
        k1x, k1m, k1s = k1[:d], k1[d:2 * d], k1[2 * d:]
    else:
        k1x = k1
        k1m = k1s = jnp.zeros((1, a), k1.dtype)

    tile = pl.BlockSpec((BLOCK_B, t, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    args = [x2, x3, x4]
    in_specs = [tile, tile, tile]
    if masked:
        # (B, 1, T) layout keeps the block's last-two dims equal to the
        # array's (Mosaic block-shape divisibility rule)
        args.append(mask.astype(jnp.float32)[:, None, :])
        in_specs.append(pl.BlockSpec((BLOCK_B, 1, t), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    args += [wm.astype(io_dtype), bm.reshape(1, 1, d).astype(jnp.float32),
             k1x.astype(io_dtype), k1m.astype(io_dtype),
             k1s.astype(io_dtype), b1.reshape(1, a).astype(jnp.float32),
             k2.astype(io_dtype), b2.reshape(1, 1, d).astype(jnp.float32)]
    in_specs += [vec] * 8
    out = pl.pallas_call(
        functools.partial(_tail_kernel, glob=glob, masked=masked, t=t),
        grid=(b // BLOCK_B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BLOCK_B, 1, 2 * d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, 2 * d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_budget_bytes()),
        interpret=interpret,
    )(*args)
    return out[:b0, 0]
