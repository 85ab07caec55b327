"""Tap-packed filter-gradient (dW) kernel for small-channel 3x3 convs.

Why: the round-5 backward study (docs/PERF.md) measured the train-step dW
of the 2D families' early stages at the MXU's skinny-output reduction
bound — a 3x3 conv with cin=cout=32 has a (32, 32)-output contraction per
tap, covering 32/128 of the MXU lanes, and XLA's conv-backprop-filter
measures 46 TF/s at the ResNet34 layer1 shape (vs 114 TF/s forward; the
bare one-tap reduction einsum is 4x worse still, so XLA is already at
that formulation's bound — scripts/bench_conv2d_grad.py).

The fix is a different PACKING, not a different schedule: substitute
h' = h + kh - 1 in

    dW[kh,kw,i,o] = sum_{b,h,w} x[b, h+kh-1, w+kw-1, i] * dy[b, h, w, o]

to get

    dW[kh,kw,i,o] = sum_{b,h',w} dy[b, h'-kh+1, w, o] * x[b, h', w+kw-1, i]

i.e. the kh shift rides on dy (h axis) and the kw shift on x (w axis),
INDEPENDENTLY. Stacking the three h-shifted dy copies along channels to
A:(K, 3*cout) and the three w-shifted x copies to B:(K, 3*cin) with
K=(b,h',w) makes ALL NINE taps one matmul  A^T B : (3*cout, 3*cin) —
for cout=cin=32 a 96x96 output (9x the lane coverage) with zero wasted
MACs (96*96 == 9*32*32). The shifted copies would triple HBM traffic if
materialized (the reason a pure-XLA version of this packing loses), so
the kernel builds them in VMEM per batch tile: x and dy are each read
from HBM exactly once, and the (3*cout, 3*cin) f32 accumulator lives in
the output block across the sequential batch grid.

Scope: k=3, stride=1, per-side padding 1 (torch Conv2d(k=3, padding=1) ==
SAME), dilation 1, groups 1, NHWC/HWIO — the exact shape of every 2D-family
body conv where the lane bound bites (reference models:
wespeaker/models/resnet.py:110-260 BasicBlock, eres2net.py, campplus FCM).
Out-of-scope shapes fall back to the native XLA backward in the
custom-vjp wrapper (conv2d_packed_dw below).

MEASURED VERDICT (round 5, v5e, scripts/bench_conv2d_grad.py only=dw,
dw_pack): the kernel LOSES — at the ResNet34 layer2 shape
(256,40,100,64,64) it runs 1.32 ms / 57 TF/s vs the native backward's
0.80 ms / 94 TF/s, and at the layer1 shape (256,80,200,32,32) Mosaic's
scoped-VMEM allocator needs 29.6 MB for the one-batch-element block
(inputs + the 3x shifted A/B builds + padded dot operands, none fused)
against the 16 MB core limit, so it does not run at all. The per-step
grid work (two ~3 MB VPU concat builds serialized with a K=4000 dot)
eats the lane-coverage gain; XLA's conv-backprop-filter is closer to
the achievable bound than the 9x-lane-packing model predicts. Kept as
an opt-in counterfactual (set_conv_dw_mode("packed"), correctness
pinned by tests/test_conv_dw_pack.py) so the experiment is repeatable
on hardware with different VMEM/MXU ratios; every default stays
"native".
"""

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

logger = logging.getLogger(__name__)

# VMEM budget for one grid step: x + dy + A + B (+ acc). A/B are 3x their
# sources, so per batch element the kernel holds ~8x the input bytes.
_VMEM_TILE_BUDGET = 8 * 2**20


def _dw_pack_kernel(x_ref, dy_ref, out_ref):
    """One batch tile: out (3*cout, 3*cin) f32 += A^T B (see module doc)."""
    first = pl.program_id(0) == 0
    x = x_ref[...]          # (BB, H, W, Ci)
    dy = dy_ref[...]        # (BB, H, W, Co)
    bb, h, w, ci = x.shape
    co = dy.shape[-1]
    zrow = jnp.zeros((bb, 1, w, co), dy.dtype)
    # A[b, h', w, kh*Co + o] = dy[b, h' - kh + 1, w, o]  (zero out of range)
    a = jnp.concatenate([
        jnp.concatenate([dy[:, 1:], zrow], axis=1),    # kh=0 -> dy[h'+1]
        dy,                                            # kh=1
        jnp.concatenate([zrow, dy[:, :-1]], axis=1),   # kh=2 -> dy[h'-1]
    ], axis=-1)
    zcol = jnp.zeros((bb, h, 1, ci), x.dtype)
    # B[b, h', w, kw*Ci + i] = x[b, h', w + kw - 1, i]
    b = jnp.concatenate([
        jnp.concatenate([zcol, x[:, :, :-1]], axis=2),  # kw=0 -> x[w-1]
        x,                                              # kw=1
        jnp.concatenate([x[:, :, 1:], zcol], axis=2),   # kw=2 -> x[w+1]
    ], axis=-1)
    a2 = a.reshape(bb * h * w, 3 * co)
    b2 = b.reshape(bb * h * w, 3 * ci)
    part = lax.dot_general(a2, b2, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)

    @pl.when(first)
    def _():
        out_ref[...] = part

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[...] = out_ref[...] + part


@functools.partial(jax.jit, static_argnames=("interpret",))
def dw_pack(x, dy, interpret=False):
    """Filter gradient of conv2d(k=3, stride=1, pad=1, NHWC/HWIO).

    x: (B, H, W, Cin), dy: (B, H, W, Cout) -> dW (3, 3, Cin, Cout) f32.
    """
    bsz, h, w, ci = x.shape
    co = dy.shape[-1]
    itemsize = jnp.dtype(x.dtype).itemsize
    per_elem = h * w * (ci + co) * itemsize * 4  # x+dy plus 3x copies
    bb = max(1, min(bsz, _VMEM_TILE_BUDGET // max(per_elem, 1)))
    while bsz % bb:
        bb -= 1
    packed = pl.pallas_call(
        _dw_pack_kernel,
        grid=(bsz // bb,),
        in_specs=[
            pl.BlockSpec((bb, h, w, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, h, w, co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # every grid step maps to the SAME output block: f32 accumulator
        out_specs=pl.BlockSpec((3 * co, 3 * ci), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * co, 3 * ci), jnp.float32),
        interpret=interpret,
    )(x, dy)
    # packed[kh*Co + o, kw*Ci + i] -> dW[kh, kw, i, o]
    return packed.reshape(3, co, 3, ci).transpose(0, 2, 3, 1)


# Process-global trace-time switch, mirroring grouped_conv's kernel-grad
# mode (and its caveat: jit caches baked before a set_ call keep the old
# mode — the trace-time log line in _bwd makes a stale cache observable).
# "packed" is OPT-IN: the Pallas dW kernel is written for the single-chip
# schedule; under a multi-device mesh the pallas_call has no GSPMD
# partitioning rule, so trainers only auto-enable it when exactly one
# device is visible (bin/train.py).
_CONV_DW_MODE = "native"


def set_conv_dw_mode(mode: str):
    if mode not in ("native", "packed"):
        raise ValueError(f"conv dw mode must be native|packed, got {mode}")
    global _CONV_DW_MODE
    _CONV_DW_MODE = mode


def conv_dw_mode() -> str:
    return _CONV_DW_MODE


def _eligible(x_shape, kernel_shape, strides, padding, dilation, groups):
    return (len(kernel_shape) == 4
            and kernel_shape[0] == 3 and kernel_shape[1] == 3
            and tuple(strides) == (1, 1)
            and tuple(padding) == ((1, 1), (1, 1))
            and tuple(dilation) == (1, 1)
            and groups == 1
            # the packing pays where the per-tap output tile underfills the
            # 128-lane MXU; at C >= 128 the native backward is already at
            # full lane coverage (measured: 217 TF/s at C=128)
            and x_shape[-1] <= 64 and kernel_shape[3] <= 64)


def _native_conv(x, kernel, strides, padding, dilation):
    return lax.conv_general_dilated(
        x, kernel, window_strides=strides, padding=padding,
        rhs_dilation=dilation, dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv2d_packed_dw(x, kernel, strides, padding, dilation):
    """conv2d whose backward computes dW with the tap-packed kernel (dX
    stays on XLA's native transposed conv — measured at forward speed).
    Forward and gradients are numerically equivalent to the native conv
    (tests/test_conv_dw_pack.py); only the dW schedule changes."""
    return _native_conv(x, kernel, strides, padding, dilation)


def _fwd(x, kernel, strides, padding, dilation):
    return _native_conv(x, kernel, strides, padding, dilation), (x, kernel)


def _bwd(strides, padding, dilation, res, dy):
    x, kernel = res
    # differentiate wrt x ONLY (kernel closed over) so the native dW is
    # never built — dx is XLA's transposed conv, measured at fwd speed
    _, native_vjp = jax.vjp(
        lambda x_: _native_conv(x_, kernel, strides, padding, dilation), x)
    (dx,) = native_vjp(dy)
    logger.info("conv2d_packed_dw backward traced: packed dW for %s -> %s",
                x.shape, kernel.shape)
    interpret = jax.devices()[0].platform != "tpu"  # in-repo convention
    dw = dw_pack(x, dy, interpret=interpret).astype(kernel.dtype)
    return dx, dw


conv2d_packed_dw.defvjp(_fwd, _bwd)


__all__ = ["dw_pack", "conv2d_packed_dw", "_eligible"]
