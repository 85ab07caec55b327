"""Fused Gemini-DF-ResNet stage as a single Pallas TPU kernel (inference).

One Gemini stage (wespeaker/models/gemini_dfresnet.py:30-49) runs L
inverted bottlenecks: 1x1 expand dim->4dim, depthwise 3x3 at 4dim, 1x1
project 4dim->dim, residual + relu, BN around each conv. The round-4
knock-out study (scripts/bench_gemini_ablation.py, docs/PERF.md) measured
the stages at ~55 of the model's 60 ms with the depthwise convs >= 37 ms,
and the shift-add counterfactual ran at 0.8 TF/s — i.e. the stage is
HBM-traffic-bound: XLA round-trips the 4x-expanded (B, F, T, 4C) map to
HBM ~3 times per block (~14 dim-width tensors of traffic per block).

This kernel holds one (BLOCK_B, F, T, C) batch tile VMEM-resident and
runs the WHOLE stage: one HBM read of the stage input, one write of the
stage output, with the 4C expansion, the depthwise 3x3 (9 shifted
broadcast-MACs on the resident tile — VPU work with zero HBM cost), and
both matmuls in VMEM. Per-block weights arrive stacked on a leading L
axis. Traffic drops from ~14L dim-tensors to 2.

Inference-only (BN folded to scale/shift); training keeps the flax path.
Equivalence vs the standard path: tests/test_pallas_ops.py.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wespeaker_tpu.ops.tpu_info import vmem_budget_bytes

BLOCK_B = int(os.environ.get("WESPEAKER_INVBN_BLOCK_B", "0"))  # 0 = auto


def _vmem_need(block_b: int, f: int, t16: int, c: int,
               itemsize: int) -> int:
    """x + out tiles at C, h/g maps at 4C, f32 y accumulator at 4C."""
    tile_c = block_b * f * t16 * c * itemsize
    tile_4c = block_b * f * t16 * 4 * c
    return 3 * tile_c + tile_4c * (2 * itemsize + 2 * 4)


def _pick_block_b(f: int, t16: int, c: int, itemsize: int) -> int:
    """Largest batch tile that fits: deep stages (small F*T) take far
    bigger tiles than stage 1, amortizing per-grid-step overheads."""
    if BLOCK_B:
        return BLOCK_B
    for bb in (64, 32, 16, 8):
        if _vmem_need(bb, f, t16, c, itemsize) <= vmem_budget_bytes():
            return bb
    return 8


def _ROLL_ENV():
    return os.environ.get("WESPEAKER_INVBN_ROLL")


def _shift2d(h, df, dt):
    """Shift (NB, F, T, C) by (df, dt) over the two spatial dims with zero
    fill (SAME conv semantics): out[f, t] = h[f + df, t + dt]. Static
    concatenate+slice only — the Mosaic-safe idiom (res2_pallas._tap)."""
    if df:
        zeros = jnp.zeros(h.shape[:1] + (abs(df),) + h.shape[2:], h.dtype)
        if df > 0:
            h = jnp.concatenate([h, zeros], axis=1)[:, abs(df):]
        else:
            h = jnp.concatenate([zeros, h], axis=1)[:, :h.shape[1]]
    if dt:
        zeros = jnp.zeros(h.shape[:2] + (abs(dt),) + h.shape[3:], h.dtype)
        if dt > 0:
            h = jnp.concatenate([h, zeros], axis=2)[:, :, abs(dt):]
        else:
            h = jnp.concatenate([zeros, h], axis=2)[:, :, :h.shape[2]]
    return h


def _tap_roll(h, df, dt):
    """Tap shift with the TPU roll primitive on the sublane (T) axis +
    wrap mask; the F axis (an untiled major dim, where Mosaic rejects
    dynamic_rotate) keeps the concat+slice idiom. TPU real mode only;
    interpret/reference keep _shift2d."""
    # f32 before the rotate: this Mosaic build rejects non-32-bit data in
    # tpu.dynamic_rotate (and the accumulation is f32 regardless)
    x = _shift2d(h, df, 0).astype(jnp.float32)
    t_dim = h.shape[2]
    if dt:
        x = pltpu.roll(x, (-dt) % t_dim, 2)  # roll wants shift >= 0
        tpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t_dim, 1), 2)
        valid = (tpos + dt >= 0) & (tpos + dt < t_dim)
        x = x * valid.astype(x.dtype)
    return x


def _stage_kernel(x_ref, w1_ref, s1_ref, t1_ref, wdw_ref, s2_ref, t2_ref,
                  w2_ref, s3_ref, t3_ref, o_ref, *, num_blocks: int,
                  t: int, t_real: int, use_roll: bool = False):
    """x_ref/o_ref: (BLOCK_B, F, T, C). Stacked weights:
    w1 (L, C, 4C), s1/t1 (L, 4C), wdw (L, 3, 3, 4C), s2/t2 (L, 4C),
    w2 (L, 4C, C), s3/t3 (L, C). t is sublane-aligned; frames >= t_real
    are alignment padding whose h is zeroed so depthwise taps at the real
    boundary read zeros, exactly like the standard path's conv padding."""
    io_dtype = x_ref.dtype
    dn = (((3,), (0,)), ((), ()))

    def dot(a, w):
        return jax.lax.dot_general(a, w.astype(a.dtype), dn,
                                   preferred_element_type=jnp.float32)

    if t_real < t:
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t, 1), 2)
        tkeep = (pos < t_real).astype(jnp.float32)
    else:
        tkeep = None

    x = x_ref[...]
    for i in range(num_blocks):
        h = dot(x, w1_ref[i])                       # (NB, F, T, 4C) f32
        h = jnp.maximum(h * s1_ref[i] + t1_ref[i], 0.0)
        if tkeep is not None:
            h = h * tkeep
        h = h.astype(io_dtype)
        y = jnp.zeros(h.shape, jnp.float32)
        shift = _tap_roll if use_roll else _shift2d
        for df in (-1, 0, 1):
            for dt_ in (-1, 0, 1):
                tap = wdw_ref[i, df + 1, dt_ + 1].astype(jnp.float32)
                y = y + shift(h, df, dt_).astype(jnp.float32) * tap
        g = jnp.maximum(y * s2_ref[i] + t2_ref[i], 0.0).astype(io_dtype)
        p = dot(g, w2_ref[i]) * s3_ref[i] + t3_ref[i]
        x = jnp.maximum(p + x.astype(jnp.float32), 0.0).astype(io_dtype)
    o_ref[...] = x


def inv_stage_fits(f: int, t, c: int, itemsize: int = 2) -> bool:
    """True when the smallest batch tile fits the VMEM envelope."""
    if not isinstance(t, int):
        return False
    t16 = -(-t // 16) * 16
    return _vmem_need(8, f, t16, c, itemsize) <= vmem_budget_bytes()


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_inv_bottleneck_stage(x, w1, s1, t1, wdw, s2, t2, w2, s3, t3,
                               interpret: bool = False):
    """x: (B, F, T, C) -> (B, F, T, C), the full stacked-weight stage."""
    b0, f, t_real, c = x.shape
    num_blocks = w1.shape[0]
    io_dtype = x.dtype
    tpad = (-t_real) % 16  # sublane alignment (cam_block_pallas lesson)
    t = t_real + tpad
    block_b = _pick_block_b(f, t, c, x.dtype.itemsize)
    pad = (-b0) % block_b
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, tpad), (0, 0))) \
        if (pad or tpad) else x
    b = b0 + pad

    tile = pl.BlockSpec((block_b, f, t, c), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    args = [xp,
            w1.astype(io_dtype), s1.astype(jnp.float32),
            t1.astype(jnp.float32), wdw.astype(io_dtype),
            s2.astype(jnp.float32), t2.astype(jnp.float32),
            w2.astype(io_dtype), s3.astype(jnp.float32),
            t3.astype(jnp.float32)]
    out = pl.pallas_call(
        functools.partial(_stage_kernel, num_blocks=num_blocks, t=t,
                          t_real=t_real,
                          # default: roll on real TPU, shift2d interpreted.
                          # WESPEAKER_INVBN_ROLL=0 is the bisection escape
                          # hatch; =1 forces roll even in interpret mode so
                          # CI can exercise the production tap logic
                          # (tests/test_pallas_ops.py)
                          use_roll=(_ROLL_ENV() == "1") if _ROLL_ENV()
                          is not None else not interpret),
        grid=(b // block_b,),
        in_specs=[tile] + [vec] * 9,
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((b, f, t, c), io_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_budget_bytes()),
        interpret=interpret,
    )(*args)
    return out[:b0, :, :t_real]


def inv_bottleneck_stage_reference(x, w1, s1, t1, wdw, s2, t2, w2, s3, t3):
    """Plain-jnp fallback with the identical argument contract."""
    io_dtype = x.dtype
    for i in range(w1.shape[0]):
        h = jnp.einsum("bftc,cd->bftd", x.astype(jnp.float32),
                       w1[i].astype(jnp.float32))
        h = jnp.maximum(h * s1[i] + t1[i], 0.0).astype(io_dtype)
        y = jnp.zeros(h.shape, jnp.float32)
        for df in (-1, 0, 1):
            for dt_ in (-1, 0, 1):
                y = y + _shift2d(h, df, dt_).astype(jnp.float32) \
                    * wdw[i, df + 1, dt_ + 1].astype(jnp.float32)
        g = jnp.maximum(y * s2[i] + t2[i], 0.0).astype(io_dtype)
        p = jnp.einsum("bftd,dc->bftc", g.astype(jnp.float32),
                       w2[i].astype(jnp.float32)) * s3[i] + t3[i]
        x = jnp.maximum(p + x.astype(jnp.float32), 0.0).astype(io_dtype)
    return x
