"""Differentiable fused ECAPA MFA+ASTP tail (training path).

Round-2 fused the inference tail (ops/mfa_astp_pallas.py). Training kept
XLA's schedule, whose backward materializes the (B, T, 3C) concat
transpose, the (B, T, D) attention temporaries, and the softmax/stats
chains — several GB of HBM traffic per step at flagship shapes and the
main reason the train step ran at ~37% of peak while extraction reached
69% (VERDICT r2 item 1).

This module makes the tail differentiable:
- forward: the Pallas tail kernel extended to also emit the post-relu
  hidden map `h`, the tanh attention activations `att`, and the context
  stats — one extra HBM write each, far cheaper than recomputing the MFA
  matmul in the backward;
- backward: a structured jnp pass with the same algebra autodiff would
  produce, but hand-scheduled: the concat never materializes (dx_i are
  three sliced matmuls of d_acc, exactly mirroring the forward's split
  trick), the softmax is recomputed from `att` (20 GFLOP vs a 314 MB f32
  residual), and every large matmul runs in the compute dtype with f32
  accumulation (the AMP transpose semantics).

The tail carries no BatchNorm, so unlike the SE-Res2 block kernel it is
exact in training. Training uses fixed chunks, so only the unmasked path
is provided; masked eval keeps the inference kernel.

Behavioral spec: wespeaker/models/ecapa_tdnn.py:205-213 +
pooling_layers.py ASTP; backward validated against jax.grad of the jnp
reference (tests/test_pallas_ops.py).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wespeaker_tpu.ops.mfa_astp_pallas import (BLOCK_B, _tail_math,
                                               tail_kernel_fits)
from wespeaker_tpu.ops.tpu_info import vmem_budget_bytes

__all__ = ["mfa_astp_train", "tail_train_fits", "mfa_astp_train_reference"]

# Backward-kernel batch tile. The backward holds more live f32 temporaries
# than the forward (softmax recompute + three grad chains): 4 fits the
# flagship (T=200, D=1536) shapes in the 100 MB budget where 8 does not,
# and measured within 4% of 2 (scripts/perf_tail_bwd.py).
BWD_BLOCK_B = int(os.environ.get("WESPEAKER_TAIL_BWD_BLOCK_B", "4"))


def _tail_math_aux(parts, wm, bm, k1x, k1m, k1s, b1, k2, b2, *, glob, t,
                   io_dtype):
    """Forward math returning (pooled, h, att, cmean, cstd) — the shared
    value-level body for the train kernel and its interpret fallback.
    Mirrors ops/mfa_astp_pallas._tail_math (unmasked)."""
    c = parts[0].shape[-1]
    dn = (((2,), (0,)), ((), ()))

    def dot(a, w):
        return jax.lax.dot_general(a, w.astype(a.dtype), dn,
                                   preferred_element_type=jnp.float32)

    acc = bm.astype(jnp.float32)
    for i, p in enumerate(parts):
        acc = acc + dot(p, wm[i * c:(i + 1) * c])
    h = jnp.maximum(acc, 0.0).astype(io_dtype)
    hf = h.astype(jnp.float32)

    if glob:
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
               + b1)
        att = jnp.tanh(dot(h, k1x) + ctx[:, None, :])
        cm = jnp.squeeze(cmean, 1)
    else:
        att = jnp.tanh(dot(h, k1x) + b1)
        cm = jnp.zeros((h.shape[0], h.shape[-1]), jnp.float32)
        cstd = cm
    att = att.astype(io_dtype)
    logits = dot(att, k2) + b2
    logits = logits - jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits)
    w = e / jnp.sum(e, axis=1, keepdims=True)
    mean = jnp.sum(w * hf, axis=1)
    var = jnp.sum(w * hf * hf, axis=1) - mean * mean
    std = jnp.sqrt(jnp.clip(var, min=1e-7))
    pooled = jnp.concatenate([mean, std], axis=-1)
    return pooled, h, att, cm, cstd


def _train_kernel(x2_ref, x3_ref, x4_ref, wm_ref, bm_ref, k1x_ref, k1m_ref,
                  k1s_ref, b1_ref, k2_ref, b2_ref, o_ref, h_ref, att_ref,
                  cs_ref, *, glob: bool, t: int):
    io_dtype = x2_ref.dtype
    pooled, h, att, cm, cstd = _tail_math_aux(
        [x2_ref[...], x3_ref[...], x4_ref[...]], wm_ref[...], bm_ref[...],
        k1x_ref[...], k1m_ref[...], k1s_ref[...], b1_ref[...], k2_ref[...],
        b2_ref[...], glob=glob, t=t, io_dtype=io_dtype)
    o_ref[...] = pooled[:, None, :].astype(jnp.float32)
    h_ref[...] = h
    att_ref[...] = att
    cs_ref[...] = jnp.concatenate([cm, cstd], axis=-1)[:, None, :]


def tail_train_fits(t, c: int, itemsize: int = 2, d=None) -> bool:
    """Same envelope as the inference kernel plus the aux outputs'
    pipelined tiles (h and att)."""
    if not isinstance(t, int):
        return False
    d = d or 3 * c
    if not tail_kernel_fits(t, c, itemsize, d=d):
        return False
    aux = 2 * BLOCK_B * t * (d + 128) * itemsize
    return aux <= vmem_budget_bytes() // 4


def _split_k1(k1, d, glob):
    if glob:
        return k1[:d], k1[d:2 * d], k1[2 * d:]
    return k1, jnp.zeros((1, k1.shape[-1]), k1.dtype), \
        jnp.zeros((1, k1.shape[-1]), k1.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def mfa_astp_train(x2, x3, x4, wm, bm, k1, b1, k2, b2, glob=True,
                   interpret=False):
    """Differentiable fused tail: same contract as
    ops/mfa_astp_pallas.fused_mfa_astp (unmasked). Returns (B, 2D) f32
    pooled [mean | std]."""
    out, _ = _fwd(x2, x3, x4, wm, bm, k1, b1, k2, b2, glob, interpret)
    return out


def _fwd_values(x2, x3, x4, wm, bm, k1, b1, k2, b2, glob, interpret):
    b0, t, c = x2.shape
    d = wm.shape[-1]
    a = k1.shape[-1]
    io_dtype = x2.dtype
    k1x, k1m, k1s = _split_k1(k1, d, glob)

    pad = (-b0) % BLOCK_B
    if pad:
        x2, x3, x4 = (jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
                      for v in (x2, x3, x4))
    b = b0 + pad

    tile = pl.BlockSpec((BLOCK_B, t, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    args = [x2, x3, x4, wm.astype(io_dtype),
            bm.reshape(1, 1, d).astype(jnp.float32),
            k1x.astype(io_dtype), k1m.astype(io_dtype),
            k1s.astype(io_dtype), b1.reshape(1, a).astype(jnp.float32),
            k2.astype(io_dtype), b2.reshape(1, 1, d).astype(jnp.float32)]
    in_specs = [tile, tile, tile] + [vec] * 8
    pooled, h, att, cstats = pl.pallas_call(
        functools.partial(_train_kernel, glob=glob, t=t),
        grid=(b // BLOCK_B,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((BLOCK_B, 1, 2 * d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, t, a), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, 1, 2 * d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, 2 * d), jnp.float32),
            jax.ShapeDtypeStruct((b, t, d), io_dtype),
            jax.ShapeDtypeStruct((b, t, a), io_dtype),
            jax.ShapeDtypeStruct((b, 1, 2 * d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_budget_bytes()),
        interpret=interpret,
    )(*args)
    return (pooled[:b0, 0], h[:b0], att[:b0], cstats[:b0, 0])


def _fwd(x2, x3, x4, wm, bm, k1, b1, k2, b2, glob, interpret):
    pooled, h, att, cstats = _fwd_values(x2, x3, x4, wm, bm, k1, b1, k2, b2,
                                         glob, interpret)
    res = (x2, x3, x4, wm, k1, b2, k2, pooled, h, att, cstats)
    return pooled, res


def _fwd_rule(x2, x3, x4, wm, bm, k1, b1, k2, b2, glob, interpret):
    # (custom_vjp: the fwd rule keeps the primal signature; only the bwd
    # rule gets the nondiff args prepended)
    return _fwd(x2, x3, x4, wm, bm, k1, b1, k2, b2, glob, interpret)


def _bwd_kernel(x2_ref, x3_ref, x4_ref, h_ref, att_ref, pl_ref, cs_ref,
                g_ref, wm_ref, k1x_ref, k1m_ref, k1s_ref, k2_ref, b2_ref,
                dx2_ref, dx3_ref, dx4_ref, dwm_ref, dbm_ref, dk1x_ref,
                dctx_ref, dk2_ref,
                *, glob: bool, t: int):
    """One batch tile of the tail backward; weight grads accumulate across
    the (sequential) grid. See _bwd_jnp for the math derivation."""
    io_dtype = x2_ref.dtype
    nb = x2_ref.shape[0]
    c = x2_ref.shape[-1]
    d = h_ref.shape[-1]
    first = pl.program_id(0) == 0

    h = h_ref[...]
    hf = h.astype(jnp.float32)
    att = att_ref[...]
    pooled = pl_ref[...][:, 0]          # (NB, 2D) f32
    g = g_ref[...][:, 0]
    mean, std = pooled[:, :d], pooled[:, d:]
    gm, gs = g[:, :d], g[:, d:]
    dn_cd = (((2,), (0,)), ((), ()))    # (NB,T,K)x(K,N)->(NB,T,N)
    dn_cl = (((2,), (1,)), ((), ()))    # contract last dims

    def dot(a_, w_, dn=dn_cd):
        return jax.lax.dot_general(a_, w_, dn,
                                   preferred_element_type=jnp.float32)

    def acc_out(ref, val):
        @pl.when(first)
        def _():
            ref[...] = val

        @pl.when(jnp.logical_not(first))
        def _():
            ref[...] = ref[...] + val

    # softmax weights recomputed on-chip from att
    logits = dot(att, k2_ref[...]) + b2_ref[...]
    logits = logits - jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits)
    w = e / jnp.sum(e, axis=1, keepdims=True)

    var = std * std
    gv = jnp.where(var > 1e-7, gs * 0.5 / jnp.maximum(std, 1e-12), 0.0)
    gm_eff = gm - 2.0 * gv * mean
    dw = gm_eff[:, None, :] * hf + gv[:, None, :] * hf * hf
    dlogits = w * (dw - jnp.sum(w * dw, axis=1, keepdims=True))
    dhf_pool = w * (gm_eff[:, None, :] + 2.0 * gv[:, None, :] * hf)

    dl16 = dlogits.astype(io_dtype)
    datt = dot(dl16, k2_ref[...], dn_cl)                      # (NB,T,A)
    a_dim = att.shape[-1]
    acc_out(dk2_ref, jax.lax.dot_general(
        att.reshape(nb * t, a_dim), dl16.reshape(nb * t, d),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    attf = att.astype(jnp.float32)
    dpre = datt * (1.0 - attf * attf)
    dp16 = dpre.astype(io_dtype)
    acc_out(dk1x_ref, jax.lax.dot_general(
        h.reshape(nb * t, d), dp16.reshape(nb * t, a_dim),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    dh_att = dot(dp16, k1x_ref[...], dn_cl)                   # (NB,T,D)
    dctx = jnp.sum(dpre, axis=1)                              # (NB,A)
    # the tiny ctx-weight grads (dk1m/dk1s/db1, outer products over NB)
    # are computed outside from this per-row output — dim-0 (sublane)
    # contractions of NB-sized operands hit Mosaic relayout limits
    dctx_ref[...] = dctx[:, None, :]

    if glob:
        cstats = cs_ref[...][:, 0]
        cmean, cstd = cstats[:, :d], cstats[:, d:]
        dc16 = dctx.astype(io_dtype)
        dn_b = (((1,), (1,)), ((), ()))
        dcmean = jax.lax.dot_general(dc16, k1m_ref[...], dn_b,
                                     preferred_element_type=jnp.float32)
        dcstd = jax.lax.dot_general(dc16, k1s_ref[...], dn_b,
                                    preferred_element_type=jnp.float32)
        dcvar = dcstd * 0.5 / cstd
        dhf_ctx = (2.0 / max(t - 1, 1)) * (hf - cmean[:, None, :]) \
            * dcvar[:, None, :] + dcmean[:, None, :] / t
        dh = dh_att + dhf_pool + dhf_ctx
    else:
        dh = dh_att + dhf_pool

    dacc = jnp.where(hf > 0, dh, 0.0)
    da16 = dacc.astype(io_dtype)
    acc_out(dbm_ref, jnp.sum(dacc, axis=(0, 1), keepdims=True))
    wm = wm_ref[...]
    dwm_parts = []
    for i, (xr, dxr) in enumerate(((x2_ref, dx2_ref), (x3_ref, dx3_ref),
                                   (x4_ref, dx4_ref))):
        dxr[...] = dot(da16, wm[i * c:(i + 1) * c], dn_cl).astype(io_dtype)
        dwm_parts.append(jax.lax.dot_general(
            xr[...].reshape(nb * t, c), da16.reshape(nb * t, d),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    acc_out(dwm_ref, jnp.concatenate(dwm_parts, axis=0))


def _bwd_pallas(glob, interpret, res, g):
    x2, x3, x4, wm, k1, b2, k2, pooled, h, att, cstats = res
    b0, t, c = x2.shape
    d = wm.shape[-1]
    a = k1.shape[-1]
    io_dtype = x2.dtype
    k1x, k1m, k1s = _split_k1(k1, d, glob)

    pad = (-b0) % BWD_BLOCK_B
    if pad:
        x2, x3, x4, h, att = (jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
                              for v in (x2, x3, x4, h, att))
        gp = jnp.pad(g, ((0, pad), (0, 0)))
        # pad stats rows with ones: keeps every division finite and all
        # pad-row grad contributions exactly zero (g rows are zero)
        pooled = jnp.pad(pooled, ((0, pad), (0, 0)), constant_values=1.0)
        cstats = jnp.pad(cstats, ((0, pad), (0, 0)), constant_values=1.0)
    else:
        gp = g
    b = b0 + pad

    tile_c = pl.BlockSpec((BWD_BLOCK_B, t, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    tile_d = pl.BlockSpec((BWD_BLOCK_B, t, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    tile_a = pl.BlockSpec((BWD_BLOCK_B, t, a), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    row2d = pl.BlockSpec((BWD_BLOCK_B, 1, 2 * d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def wacc(shape):
        # weight-grad accumulators: whole array resident, same block for
        # every grid step
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    args = [x2, x3, x4, h, att,
            pooled[:, None, :], cstats[:, None, :], gp[:, None, :],
            wm.astype(io_dtype), k1x.astype(io_dtype),
            k1m.astype(io_dtype), k1s.astype(io_dtype),
            k2.astype(io_dtype), b2.reshape(1, 1, d).astype(jnp.float32)]
    in_specs = [tile_c, tile_c, tile_c, tile_d, tile_a, row2d, row2d,
                row2d] + [vec] * 6
    rowa = pl.BlockSpec((BWD_BLOCK_B, 1, a), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, glob=glob, t=t),
        grid=(b // BWD_BLOCK_B,),
        in_specs=in_specs,
        out_specs=(tile_c, tile_c, tile_c,
                   wacc((3 * c, d)), wacc((1, 1, d)), wacc((d, a)),
                   rowa, wacc((a, d))),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, c), io_dtype),
            jax.ShapeDtypeStruct((b, t, c), io_dtype),
            jax.ShapeDtypeStruct((b, t, c), io_dtype),
            jax.ShapeDtypeStruct((3 * c, d), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, a), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, a), jnp.float32),
            jax.ShapeDtypeStruct((a, d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_budget_bytes()),
        interpret=interpret,
    )(*args)
    (dx2, dx3, dx4, dwm, dbm, dk1x, dctx, dk2) = outs
    dctx = dctx[:b0, 0]  # (B, A) f32
    db1 = jnp.sum(dctx, axis=0)
    if glob:
        cmean, cstd = cstats[:b0, :d], cstats[:b0, d:]
        dk1m = jnp.einsum("bd,ba->da", cmean, dctx,
                          preferred_element_type=jnp.float32)
        dk1s = jnp.einsum("bd,ba->da", cstd, dctx,
                          preferred_element_type=jnp.float32)
        dk1 = jnp.concatenate([dk1x, dk1m, dk1s], axis=0)
    else:
        dk1 = dk1x
    return (dx2[:b0], dx3[:b0], dx4[:b0], dwm.astype(wm.dtype),
            dbm[0, 0], dk1.astype(k1.dtype), db1,
            dk2.astype(k2.dtype), jnp.zeros_like(b2, dtype=jnp.float32))


def _bwd_rule(glob, interpret, res, g):
    if _bwd_kernel_fits(res):
        return _bwd_pallas(glob, interpret, res, g)
    return _bwd_jnp(glob, interpret, res, g)


def _bwd_kernel_fits(res):
    x2, _x3, _x4, wm, _k1, _b2, _k2, _pl, _h, _att, _cs = res
    t = x2.shape[1]
    if not isinstance(t, int) or t % 8:
        return False
    c = x2.shape[-1]
    d = wm.shape[-1]
    itemsize = x2.dtype.itemsize
    # tiles (pipelined x2/x3/x4/h/att + dx outputs) + ~5 f32 (NB,T,D)
    # temporaries (w, dw, dlogits, dh, dacc) + resident weights and
    # accumulators
    nb = BWD_BLOCK_B
    vmem = (2 * (6 * nb * t * c + nb * t * (d + 128)) * itemsize
            + 5 * nb * t * d * 4
            + 2 * (3 * c * d) * itemsize + 2 * (3 * c * d) * 4)
    return vmem <= vmem_budget_bytes()


def _bwd_jnp(glob, interpret, res, g):
    x2, x3, x4, wm, k1, b2, k2, pooled, h, att, cstats = res
    b, t, c = x2.shape
    d = wm.shape[-1]
    io_dtype = x2.dtype
    gf = g.astype(jnp.float32)
    gm, gs = gf[:, :d], gf[:, d:]
    mean, std = pooled[:, :d], pooled[:, d:]
    cmean, cstd = cstats[:, :d], cstats[:, d:]
    hf = h.astype(jnp.float32)

    def dot(a_, w_, prec=jnp.float32):
        return jax.lax.dot_general(a_, w_, (((2,), (0,)), ((), ())),
                                   preferred_element_type=prec)

    # softmax weights recomputed from att (cheap vs a (B,T,D) f32 residual)
    logits = dot(att, k2.astype(io_dtype))
    logits = logits + b2.astype(jnp.float32)
    logits = logits - jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits)
    w = e / jnp.sum(e, axis=1, keepdims=True)  # (B, T, D) f32

    # stats-pooling backward
    var = std * std
    gv = jnp.where(var > 1e-7, gs * 0.5 / std, 0.0)          # d/d var
    gm_eff = gm - 2.0 * gv * mean                            # d/d mean
    dw = gm_eff[:, None, :] * hf + gv[:, None, :] * hf * hf  # d/d w
    dlogits = w * (dw - jnp.sum(w * dw, axis=1, keepdims=True))
    dhf_pool = w * (gm_eff[:, None, :] + 2.0 * gv[:, None, :] * hf)

    # attention backward
    dl16 = dlogits.astype(io_dtype)
    datt = dot(dl16, jnp.swapaxes(k2, 0, 1).astype(io_dtype))  # (B,T,A)
    dk2 = jnp.einsum("bta,btd->ad", att, dl16,
                     preferred_element_type=jnp.float32)
    # b2 shifts every T entry of a (b, d) softmax column equally, so the
    # softmax — and the whole output — is invariant to it: db2 = 0 exactly
    # (autodiff yields the same up to f32 noise).
    db2 = jnp.zeros_like(b2, dtype=jnp.float32)
    attf = att.astype(jnp.float32)
    dpre = (datt * (1.0 - attf * attf)).astype(io_dtype)
    dk1x = jnp.einsum("btd,bta->da", h, dpre,
                      preferred_element_type=jnp.float32)
    dh_att = dot(dpre, jnp.swapaxes(k1[:d] if glob else k1, 0, 1)
                 .astype(io_dtype))
    dctx = jnp.sum(dpre.astype(jnp.float32), axis=1)  # (B, A)
    db1 = jnp.sum(dctx, axis=0)

    if glob:
        k1m, k1s = k1[d:2 * d], k1[2 * d:]
        dc16 = dctx.astype(io_dtype)
        dn2 = (((1,), (1,)), ((), ()))
        dcmean = jax.lax.dot_general(dc16, k1m.astype(io_dtype), dn2,
                                     preferred_element_type=jnp.float32)
        dcstd = jax.lax.dot_general(dc16, k1s.astype(io_dtype), dn2,
                                    preferred_element_type=jnp.float32)
        dk1m = jnp.einsum("bd,ba->da", cmean.astype(io_dtype), dc16,
                          preferred_element_type=jnp.float32)
        dk1s = jnp.einsum("bd,ba->da", cstd.astype(io_dtype), dc16,
                          preferred_element_type=jnp.float32)
        dcvar = dcstd * 0.5 / cstd
        # (the cmean-through-cvar term is identically zero: sum_T(hf-cmean)=0)
        dhf_ctx = (2.0 / max(t - 1, 1)) * (hf - cmean[:, None, :]) \
            * dcvar[:, None, :] + dcmean[:, None, :] / t
        dk1 = jnp.concatenate([dk1x, dk1m, dk1s], axis=0).astype(k1.dtype)
    else:
        dhf_ctx = 0.0
        dk1 = dk1x.astype(k1.dtype)

    dh = dh_att + dhf_pool + dhf_ctx
    dacc = (jnp.where(hf > 0, dh, 0.0)).astype(io_dtype)  # relu transpose

    # MFA backward — sliced matmuls; the (B,T,3C) concat never exists
    dbm = jnp.sum(dacc.astype(jnp.float32), axis=(0, 1))
    wmT = jnp.swapaxes(wm, 0, 1).astype(io_dtype)  # (D, 3C)
    dxs, dwms = [], []
    for i, xi in enumerate((x2, x3, x4)):
        dxs.append(dot(dacc, wmT[:, i * c:(i + 1) * c],
                       prec=jnp.float32).astype(io_dtype))
        dwms.append(jnp.einsum("btc,btd->cd", xi, dacc,
                               preferred_element_type=jnp.float32))
    dwm = jnp.concatenate(dwms, axis=0).astype(wm.dtype)

    return (dxs[0], dxs[1], dxs[2], dwm, dbm.astype(jnp.float32),
            dk1, db1.astype(jnp.float32), dk2.astype(k2.dtype),
            db2.astype(jnp.float32))


mfa_astp_train.defvjp(_fwd_rule, _bwd_rule)


def mfa_astp_train_reference(x2, x3, x4, wm, bm, k1, b1, k2, b2,
                             glob: bool = True):
    """Plain-jnp autodiff path with the same contract — the numerical
    oracle for the custom_vjp (and the CPU fallback)."""
    d = wm.shape[-1]
    k1x, k1m, k1s = _split_k1(k1, d, glob)
    return _tail_math([x2, x3, x4], None, wm, bm.astype(jnp.float32), k1x,
                      k1m, k1s, b1.astype(jnp.float32), k2,
                      b2.astype(jnp.float32), glob=glob, t=x2.shape[1],
                      io_dtype=x2.dtype)
