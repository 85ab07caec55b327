"""Fused CAM++ dense block as a single Pallas TPU kernel (inference).

The reference block (wespeaker/models/campplus.py CAMDenseTDNNBlock) runs
L in {12, 24, 16} densely-connected layers, each
bn-relu -> 1x1 bottleneck -> bn-relu -> k3 dilated conv -> CAM gate
(global + 100-frame segment context), then concatenates 32 new channels.
XLA executes ~10 HBM-round-trip ops per layer on the ever-growing
(B, T, C) map — the measured model sits at ~29% of the chip's matmul peak
(docs/PERF.md round-3 zoo table), bounded by that traffic plus the N=32
quarter-lane growth convs.

This kernel holds one (BLOCK_B, T, C_end) batch tile VMEM-resident and
runs the whole block start-to-finish: one HBM read of the block input,
one write of the concatenated output. Per-layer weights arrive stacked
with the (growing) input width zero-padded to C_end; the kernel slices
the live prefix statically, so no padded FLOPs are paid. The CAM context
(global mean + non-overlapping segment means) is computed on the resident
tile — masked padded buckets supported exactly like the standard path
(mask gates the two context means only).

Inference-only (BN folded to scale/shift); training keeps the flax path.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wespeaker_tpu.ops.res2_pallas import _tap
from wespeaker_tpu.ops.tpu_info import vmem_budget_bytes

BLOCK_B = int(os.environ.get("WESPEAKER_CAM_BLOCK_B", "16"))


def _layer_math(xc, i, ci, s1, t1, w1, s2, t2, w2, wc1, bc1, wc2, bc2,
                mask, *, dilation, seg_len, t, io_dtype):
    """One dense layer on values; xc: (NB, t, ci) — ci may be the padded
    full width (s1/t1/w1 rows beyond the live prefix are zero, so padded
    channels contribute exactly nothing). Returns (NB, t, 32)."""
    dn = (((2,), (0,)), ((), ()))

    def dot(a, w):
        return jax.lax.dot_general(a, w.astype(a.dtype), dn,
                                   preferred_element_type=jnp.float32)

    h = jnp.maximum(
        xc.astype(jnp.float32) * s1[i, :ci] + t1[i, :ci], 0.0
    ).astype(io_dtype)
    h = dot(h, w1[i, :ci])                                 # (NB, t, 128)
    h = jnp.maximum(h * s2[i] + t2[i], 0.0).astype(io_dtype)

    y = (dot(_tap(h, -dilation, t), w2[i, 0])
         + dot(h, w2[i, 1])
         + dot(_tap(h, dilation, t), w2[i, 2]))            # (NB, t, 32)

    hf = h.astype(jnp.float32)
    if mask is None:
        gmean = jnp.mean(hf, axis=1, keepdims=True)
    else:
        m3 = mask[..., None]
        gmean = (jnp.sum(hf * m3, axis=1, keepdims=True)
                 / jnp.maximum(jnp.sum(m3, axis=1, keepdims=True), 1.0))
    segs = []
    for j in range(-(-t // seg_len)):
        lo, hi = j * seg_len, min(t, (j + 1) * seg_len)
        hs = jax.lax.slice_in_dim(hf, lo, hi, axis=1)
        if mask is None:
            sm = jnp.mean(hs, axis=1, keepdims=True)
        else:
            # explicit slice+expand: mixed slice/None indexing lowers
            # through gather, which Mosaic rejects in-kernel
            ms = jnp.expand_dims(
                jax.lax.slice_in_dim(mask, lo, hi, axis=1), -1)
            sm = (jnp.sum(hs * ms, axis=1, keepdims=True)
                  / jnp.maximum(jnp.sum(ms, axis=1, keepdims=True), 1.0))
        segs.append(jnp.broadcast_to(sm, (hs.shape[0], hi - lo,
                                          hs.shape[2])))
    ctx = (gmean + jnp.concatenate(segs, axis=1)).astype(io_dtype)
    g = jnp.maximum(dot(ctx, wc1[i]) + bc1[i], 0.0).astype(io_dtype)
    gate = jax.nn.sigmoid(dot(g, wc2[i]) + bc2[i])
    return (y * gate).astype(io_dtype)


def _block_kernel(*refs, num_layers: int, c0: int, dilation: int,
                  seg_len: int, t: int, t_real: int, masked: bool):
    """The output ref doubles as the dense accumulation buffer: uniform
    full-width (padded) shapes every layer — Mosaic compiles this in
    seconds, where a growing-concat formulation (12-24 distinct widths)
    did not terminate. t is sublane-aligned (multiple of 16): an
    unaligned time dim made Mosaic's compile superlinear in the layer
    count (t=100: 199 s for 6 layers; t=96: 5 s). Frames >= t_real are
    alignment padding: their y is zeroed (the standard path's implicit
    conv zero-padding at the sequence boundary) and they are masked out
    of the context means."""
    if masked:
        (x_ref, mask_ref, s1_ref, t1_ref, w1_ref, s2_ref, t2_ref, w2_ref,
         wc1_ref, bc1_ref, wc2_ref, bc2_ref, o_ref) = refs
        mask = jnp.swapaxes(mask_ref[...], 1, 2)[..., 0].astype(jnp.float32)
    else:
        (x_ref, s1_ref, t1_ref, w1_ref, s2_ref, t2_ref, w2_ref,
         wc1_ref, bc1_ref, wc2_ref, bc2_ref, o_ref) = refs
        mask = None
    io_dtype = x_ref.dtype
    cend = o_ref.shape[-1]
    if t_real < t:
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, t, 1), 1)
        tkeep = (pos < t_real).astype(jnp.float32)
        if mask is None:
            mask = tkeep[..., 0]  # context means over real frames only
    else:
        tkeep = None
    o_ref[..., :c0] = x_ref[...]
    o_ref[..., c0:] = jnp.zeros(
        (x_ref.shape[0], t, cend - c0), io_dtype)
    for i in range(num_layers):
        y = _layer_math(o_ref[...], i, cend, s1_ref[...], t1_ref[...],
                        w1_ref, s2_ref[...], t2_ref[...], w2_ref,
                        wc1_ref, bc1_ref[...], wc2_ref, bc2_ref[...],
                        mask, dilation=dilation, seg_len=seg_len, t=t,
                        io_dtype=io_dtype)
        if tkeep is not None:
            y = y * tkeep.astype(io_dtype)
        o_ref[..., c0 + 32 * i:c0 + 32 * (i + 1)] = y


def cam_dense_block_reference(x, s1, t1, w1, s2, t2, w2, wc1, bc1, wc2,
                              bc2, dilation: int, seg_len: int = 100,
                              mask=None):
    """Plain-jnp fallback with the identical argument contract."""
    t = x.shape[1]
    num_layers = w1.shape[0]
    c0 = x.shape[-1]
    io_dtype = x.dtype
    m = None if mask is None else mask.astype(jnp.float32)
    xc = x
    for i in range(num_layers):
        y = _layer_math(xc, i, c0 + 32 * i, s1, t1, w1, s2, t2, w2,
                        wc1, bc1, wc2, bc2, m, dilation=dilation,
                        seg_len=seg_len, t=t, io_dtype=io_dtype)
        xc = jnp.concatenate([xc, y], axis=-1)
    return xc


def cam_block_fits(t, c0: int, num_layers: int, growth: int = 32,
                   itemsize: int = 2) -> bool:
    """VMEM envelope: double-buffered input/output tiles at the final
    width, the resident padded W1 stack, and ~4 working maps."""
    if not isinstance(t, int):
        return False
    cend = c0 + growth * num_layers
    tile = BLOCK_B * t * cend * itemsize
    w1 = num_layers * cend * 128 * itemsize
    work = 4 * BLOCK_B * t * 128 * 4
    return (4 * tile + w1 + work) <= vmem_budget_bytes()


@functools.partial(jax.jit,
                   static_argnames=("dilation", "seg_len", "interpret"))
def fused_cam_dense_block(x, s1, t1, w1, s2, t2, w2, wc1, bc1, wc2, bc2,
                          dilation: int, seg_len: int = 100, mask=None,
                          interpret: bool = False):
    """x: (B, T, C0). Stacked per-layer weights, input width zero-padded
    to C_end = C0 + 32L where ragged:
      s1/t1 (L, C_end)   folded bn1 scale/shift
      w1    (L, C_end, 128)  1x1 bottleneck (no bias)
      s2/t2 (L, 128)     folded bn2
      w2    (L, 3, 128, 32)  k3 taps [t-d, t, t+d] (no bias)
      wc1 (L, 128, 64), bc1 (L, 64), wc2 (L, 64, 32), bc2 (L, 32)  CAM gate
    mask: optional (B, T) frame validity. Returns (B, T, C_end) — the
    dense-concatenated block output."""
    b0, t_real, c0 = x.shape
    num_layers = w1.shape[0]
    cend = c0 + 32 * num_layers
    io_dtype = x.dtype
    pad = (-b0) % BLOCK_B
    # sublane-align the time dim (see _block_kernel docstring); pad frames
    # are excluded from context means and their y zeroed in-kernel
    tpad = (-t_real) % 16
    t = t_real + tpad
    xp = jnp.pad(x, ((0, pad), (0, tpad), (0, 0))) if (pad or tpad) else x
    b = b0 + pad
    masked = mask is not None

    tile_in = pl.BlockSpec((BLOCK_B, t, c0), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    args = [xp]
    in_specs = [tile_in]
    if masked:
        mp = jnp.pad(mask, ((0, pad), (0, tpad))) if (pad or tpad) \
            else mask
        args.append(mp.astype(jnp.float32)[:, None, :])
        in_specs.append(pl.BlockSpec((BLOCK_B, 1, t), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    args += [s1.astype(jnp.float32), t1.astype(jnp.float32),
             w1.astype(io_dtype), s2.astype(jnp.float32),
             t2.astype(jnp.float32), w2.astype(io_dtype),
             wc1.astype(io_dtype), bc1.astype(jnp.float32),
             wc2.astype(io_dtype), bc2.astype(jnp.float32)]
    in_specs += [vec] * 10
    out = pl.pallas_call(
        functools.partial(_block_kernel, num_layers=num_layers, c0=c0,
                          dilation=dilation, seg_len=seg_len, t=t,
                          t_real=t_real, masked=masked),
        grid=(b // BLOCK_B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BLOCK_B, t, cend), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, cend), io_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_budget_bytes()),
        interpret=interpret,
    )(*args)
    return out[:b0, :t_real]
