"""Fused ECAPA SE-Res2 block as a single Pallas TPU kernel.

The reference block (wespeaker/models/ecapa_tdnn.py:133-158) is
conv1x1-relu-BN -> Res2 chain -> conv1x1-relu-BN -> SE gate -> residual.
XLA executes it as ~25 separate HBM-round-trip ops; at flagship shapes
(B=2048, T=200, C=512) the activation traffic of the three blocks is ~6 GB
per forward — comparable to the whole model's MXU time — and the width-64
Res2 chain alone is 21 small matmuls each paying an HBM read+write.

This kernel holds one (BLOCK_B, T, C) tile in VMEM and runs the block
start-to-finish: one HBM read of x, one write of the result. The pointwise
convs run as full-width (C=512) MXU matmuls with f32 accumulation; the
chain follows ops/res2_pallas.py's concatenated-tap formulation; the SE
squeeze (per-utterance mean), excitation MLP, gate, and residual add all
stay on-chip.

Inference-only (BN folded to affine, no mask); training and masked padded
buckets use the standard flax path. See docs/PERF.md for the end-to-end
numbers.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wespeaker_tpu.ops.res2_pallas import _tap

from wespeaker_tpu.ops.tpu_info import vmem_budget_bytes

# Batch-tile size. Larger tiles amortize the per-grid-step overhead
# (~tens of us of DMA/sequencing per program measured through this chip)
# against VMEM pressure; 16 needs the raised vmem limit.
BLOCK_B = int(os.environ.get("WESPEAKER_SE_BLOCK_B", "16"))


def _chain(h1, cw, cb, cs, ch, *, nums, width, dilation, t, io_dtype):
    """Res2 chain on a VMEM-resident value; returns the concatenated
    (groups + passthrough) activation. cw indexing: [step, tap] with taps
    ordered [t-d, t, t+d]."""
    dn = (((2,), (0,)), ((), ()))

    def dot(a, w):
        return jax.lax.dot_general(a, w, dn,
                                   preferred_element_type=jnp.float32)

    sp = h1[..., 0:width]
    groups = []
    for i in range(nums):
        if i >= 1:
            sp = sp + h1[..., i * width:(i + 1) * width]
        acc = (dot(_tap(sp, -dilation, t), cw[i, 0])
               + dot(sp, cw[i, 1])
               + dot(_tap(sp, dilation, t), cw[i, 2])) + cb[i, 0]
        sp = (jnp.maximum(acc, 0.0) * cs[i, 0] + ch[i, 0]).astype(io_dtype)
        groups.append(sp)
    groups.append(h1[..., nums * width:])
    return jnp.concatenate(groups, axis=-1)


def _block_kernel(*refs, nums: int, width: int, dilation: int, t: int,
                  masked: bool):
    if masked:
        (x_ref, mask_ref, w1_ref, a1_ref, cw_ref, cb_ref, cs_ref, ch_ref,
         w2_ref, a2_ref, sw1_ref, sb1_ref, sw2_ref, sb2_ref, o_ref) = refs
    else:
        (x_ref, w1_ref, a1_ref, cw_ref, cb_ref, cs_ref, ch_ref,
         w2_ref, a2_ref, sw1_ref, sb1_ref, sw2_ref, sb2_ref, o_ref) = refs
    io_dtype = x_ref.dtype
    dn = (((2,), (0,)), ((), ()))

    def pw(h, w, aff):
        # pointwise conv + relu + folded BN: aff rows are [bias, scale, shift]
        acc = jax.lax.dot_general(h, w, dn,
                                  preferred_element_type=jnp.float32)
        acc = acc + aff[0]
        return (jnp.maximum(acc, 0.0) * aff[1] + aff[2]).astype(io_dtype)

    x = x_ref[...]
    h1 = pw(x, w1_ref[...], a1_ref[...])
    y = _chain(h1, cw_ref, cb_ref, cs_ref, ch_ref, nums=nums, width=width,
               dilation=dilation, t=t, io_dtype=io_dtype)
    h2 = pw(y, w2_ref[...], a2_ref[...])

    # SE: squeeze (mean over valid T) -> bottleneck MLP -> sigmoid gate.
    # Pad frames flow through the convs exactly as in the standard masked
    # path (which also leaves them unmasked); only the squeeze counts them
    # out — this is what makes padded buckets equal the batch=1 reference.
    if masked:
        m = mask_ref[...].astype(jnp.float32)[..., None]  # (NB, T, 1)
        cnt = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        mean = jnp.sum(h2.astype(jnp.float32) * m, axis=1) / cnt
    else:
        mean = jnp.mean(h2.astype(jnp.float32), axis=1)  # (NB, C)
    dn2 = (((1,), (0,)), ((), ()))
    z = jnp.maximum(jax.lax.dot_general(
        mean.astype(io_dtype), sw1_ref[...], dn2,
        preferred_element_type=jnp.float32) + sb1_ref[...], 0.0)
    g = jax.nn.sigmoid(jax.lax.dot_general(
        z.astype(io_dtype), sw2_ref[...], dn2,
        preferred_element_type=jnp.float32) + sb2_ref[...])

    o_ref[...] = (x.astype(jnp.float32)
                  + h2.astype(jnp.float32) * g[:, None, :]).astype(io_dtype)


def se_res2_block_reference(x, w1, b1, s1, h1, cw, cb, cs, ch,
                            w2, b2, s2, h2, sw1, sb1, sw2, sb2,
                            dilation: int, mask=None):
    """Plain-jnp folded-BN SE-Res2 block with the same argument contract as
    fused_se_res2_block — the fallback when shapes don't suit the kernel."""
    t = x.shape[1]
    nums, _, width, _ = cw.shape
    io_dtype = x.dtype

    def pw(h, w, bias, scale, shift):
        acc = jnp.matmul(h, w.astype(h.dtype),
                         preferred_element_type=jnp.float32) + bias
        return (jnp.maximum(acc, 0.0) * scale + shift).astype(io_dtype)

    h1v = pw(x, w1, b1, s1, h1)
    yv = _chain(h1v, cw.astype(io_dtype), cb[:, None, None],
                cs[:, None, None], ch[:, None, None], nums=nums, width=width,
                dilation=dilation, t=t, io_dtype=io_dtype)
    h2v = pw(yv, w2, b2, s2, h2)
    if mask is not None:
        mm = mask.astype(jnp.float32)[..., None]
        cnt = jnp.maximum(jnp.sum(mm, axis=1), 1.0)
        m = jnp.sum(h2v.astype(jnp.float32) * mm, axis=1) / cnt
    else:
        m = jnp.mean(h2v.astype(jnp.float32), axis=1)
    z = jnp.maximum(jnp.matmul(m.astype(io_dtype), sw1.astype(io_dtype),
                               preferred_element_type=jnp.float32) + sb1, 0.0)
    g = jax.nn.sigmoid(
        jnp.matmul(z.astype(io_dtype), sw2.astype(io_dtype),
                   preferred_element_type=jnp.float32) + sb2)
    return (x.astype(jnp.float32)
            + h2v.astype(jnp.float32) * g[:, None, :]).astype(io_dtype)


def block_kernel_fits(t, c: int, scale: int, itemsize: int = 2) -> bool:
    """VMEM envelope: one (BLOCK_B, t, c) tile plus two temporaries of the
    same size, an f32 accumulator, and the (c, c) weights. The budget is
    device-derived (ops/tpu_info.py): small-VMEM TPU generations take the
    fallback. Symbolic t (jax.export) and sublane-misaligned t (t % 8,
    Mosaic "unsupported shape cast") route to the fallback."""
    if not isinstance(t, int) or t % 8:
        return False
    width = c // scale
    tile = BLOCK_B * t * c * itemsize
    weights = 2 * c * c * itemsize
    return width >= 64 and (6 * tile + 2 * weights) <= vmem_budget_bytes() // 3


@functools.partial(jax.jit, static_argnames=("dilation", "interpret"))
def fused_se_res2_block(x, w1, b1, s1, h1, cw, cb, cs, ch,
                        w2, b2, s2, h2, sw1, sb1, sw2, sb2,
                        dilation: int, mask=None, interpret: bool = False):
    """x: (B, T, C). w1/w2: (C, C) pointwise-conv weights; b*/s*/h* are the
    conv bias and the eval-mode BN folded to (scale, shift), all (C,).
    cw: (nums, 3, width, width) chain kernels tap-major [t-d, t, t+d];
    cb/cs/ch: (nums, width). sw1: (C, Cb), sb1: (Cb,), sw2: (Cb, C),
    sb2: (C,) SE excitation weights. mask: optional (B, T) frame-validity
    mask (padded eval buckets) — affects only the SE squeeze, like the
    standard masked path. Returns x + se_gate * block(x), the SE_Res2Block
    forward with eval BN. Compute dtype follows x.dtype (bf16 or f32),
    with f32 matmul accumulation either way."""
    b0, t, c = x.shape
    nums, k, width, _ = cw.shape
    assert k == 3 and nums * width + width == c, (cw.shape, c)
    pad = (-b0) % BLOCK_B
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0))) if pad else x
    b = b0 + pad
    io_dtype = x.dtype
    masked = mask is not None

    def aff(bias, scale, shift):
        return jnp.stack([bias, scale, shift]).reshape(
            3, 1, 1, c).astype(jnp.float32)

    tile = pl.BlockSpec((BLOCK_B, t, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    args = [xp]
    in_specs = [tile]
    if masked:
        mp = (jnp.pad(mask, ((0, pad), (0, 0))) if pad else mask)
        args.append(mp.astype(jnp.float32))
        in_specs.append(pl.BlockSpec((BLOCK_B, t), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
    args += [
        w1.astype(io_dtype), aff(b1, s1, h1),
        cw.astype(io_dtype),
        cb.reshape(nums, 1, 1, width).astype(jnp.float32),
        cs.reshape(nums, 1, 1, width).astype(jnp.float32),
        ch.reshape(nums, 1, 1, width).astype(jnp.float32),
        w2.astype(io_dtype), aff(b2, s2, h2),
        sw1.astype(io_dtype), sb1.reshape(1, -1).astype(jnp.float32),
        sw2.astype(io_dtype), sb2.reshape(1, -1).astype(jnp.float32)]
    in_specs += [vec] * 12
    out = pl.pallas_call(
        functools.partial(_block_kernel, nums=nums, width=width,
                          dilation=dilation, t=t, masked=masked),
        grid=(b // BLOCK_B,),
        in_specs=in_specs,
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((b, t, c), io_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_budget_bytes()),
        interpret=interpret,
    )(*args)
    return out[:b0]
