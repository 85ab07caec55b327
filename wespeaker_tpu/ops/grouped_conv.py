"""GSPMD-safe grouped convolution.

XLA's SPMD partitioner mis-partitions the *kernel gradient* of a grouped
convolution (feature_group_count > 1, including depthwise) whenever the
batch is replicated over part of the mesh — the canonical tensor-parallel
layout, where the batch is sharded over 'data' and replicated over 'model'.
The kernel cotangent comes back multiplied by the replication factor (the
partial per-replica products are summed where one replica's value should be
taken). Ungrouped convolutions and the *input* gradient are unaffected.
Repro (jax 0.9.0, 8-device CPU mesh): grad of a feature_group_count=16 conv
w.r.t. its replicated kernel, input sharded P('data') on a ('data','model')
mesh, is exactly 4x the single-device gradient for model=4.

This silently corrupts training of any model with grouped convs on a mesh
with a model axis — e.g. the WavLM frontend (grouped positional conv) with
the tensor-parallel margin head or model-sharded SSL layouts.

Fix: `grouped_conv` keeps the native lax op for the forward pass and the
input gradient (both correct, and the forward stays a single fused op on
TPU), but computes the kernel gradient itself as one batched matmul per
kernel tap:

    dk[w, i, o] = sum_{b, p} xpad[b, p*s + w*d, g(o)*Cg + i] * dy[b, p, o]

i.e. for each spatial tap w, slice the padded input at stride s, fold the
group axis out of the channel dim, and contract batch+positions:
einsum('b...gi,b...go->gio'). Same FLOPs as the native backward (MXU
matmuls batched over groups), no grouped-conv gradient op for GSPMD to
mis-partition.

Used by models/layers.py::conv1d/conv2d (groups > 1) and the WavLM /
w2v-bert frontends' positional/depthwise convs.
"""

import functools
import itertools
import logging

import jax
import jax.numpy as jnp
from jax import lax


def _dimension_numbers(spatial_rank):
    """Channels-last conv dimension numbers (NWC / NHWC)."""
    if spatial_rank == 1:
        return ("NWC", "WIO", "NWC")
    if spatial_rank == 2:
        return ("NHWC", "HWIO", "NHWC")
    raise ValueError(f"unsupported spatial rank {spatial_rank}")


def _native(x, kernel, strides, padding, dilation, groups):
    return lax.conv_general_dilated(
        x, kernel, window_strides=strides, padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=_dimension_numbers(x.ndim - 2),
        feature_group_count=groups)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def grouped_conv(x, kernel, strides, padding, dilation, groups):
    """Grouped conv on channels-last input.

    x: (B, *spatial, C_in); kernel: (*kernel_spatial, C_in // groups, C_out);
    strides/dilation: tuples per spatial dim; padding: tuple of (lo, hi).
    """
    return _native(x, kernel, strides, padding, dilation, groups)


def _fwd(x, kernel, strides, padding, dilation, groups):
    out = _native(x, kernel, strides, padding, dilation, groups)
    return out, (x, kernel)


# Kernel-gradient mode. "safe" computes the kernel cotangent by hand (the
# module-docstring einsum-per-tap) so GSPMD cannot mis-partition it — but
# each tap SLICES the padded input into a fresh (positions, groups, cin_g)
# array, which for depthwise convs at CNN stage-1 shapes materializes
# gigabytes per backward: the round-4 train-step zoo measured
# Gemini-DF-ResNet60 at 9.4x its forward (283 ms vs the ~3x structural
# fwd+bwd ratio) with this path. "native" uses XLA's own grouped-conv
# backward — correct on a single device and under pure data parallelism
# (batch sharded over every mesh axis); WRONG only when the batch is
# replicated over part of the mesh (a model axis) with a replicated
# kernel. bin/train.py selects: native when the mesh has no model axis,
# safe otherwise. Default stays safe.
_KERNEL_GRAD_MODE = "safe"


def set_kernel_grad_mode(mode: str):
    """'safe' (GSPMD-proof, slow for depthwise) or 'native' (XLA backward;
    only valid without model-axis batch replication). Takes effect at the
    next trace (call before jit/compile)."""
    global _KERNEL_GRAD_MODE
    assert mode in ("safe", "native"), mode
    _KERNEL_GRAD_MODE = mode


def kernel_grad_mode() -> str:
    return _KERNEL_GRAD_MODE


def _bwd(strides, padding, dilation, groups, res, dy):
    x, kernel = res
    # trace-time breadcrumb: _KERNEL_GRAD_MODE is process-global and baked
    # in at trace time, so a backward jit-cached before set_kernel_grad_mode
    # keeps the old mode — log which one this trace uses so a stale-cache
    # mismatch is observable in train logs
    logging.getLogger(__name__).info(
        "grouped_conv backward traced: kernel_grad_mode=%s "
        "(groups=%d, kernel=%s)", _KERNEL_GRAD_MODE, groups,
        tuple(kernel.shape))

    # input gradient: the native transposed grouped conv partitions fine
    _, x_vjp = jax.vjp(
        lambda x_: _native(x_, kernel, strides, padding, dilation, groups), x)
    dx = x_vjp(dy)[0]

    if _KERNEL_GRAD_MODE == "native":
        _, k_vjp = jax.vjp(
            lambda k_: _native(x, k_, strides, padding, dilation, groups),
            kernel)
        return dx, k_vjp(dy)[0]

    # kernel gradient: one einsum per kernel tap (see module docstring)
    spatial = kernel.shape[:-2]
    cin_g, cout = kernel.shape[-2], kernel.shape[-1]
    cout_g = cout // groups
    b = x.shape[0]
    out_spatial = dy.shape[1:-1]
    xpad = jnp.pad(x, ((0, 0),) + tuple(padding) + ((0, 0),))
    npos = b
    for d in out_spatial:
        npos *= d
    dy_g = dy.reshape(npos, groups, cout_g)

    taps = []
    for w in itertools.product(*(range(k) for k in spatial)):
        limits = tuple(w[i] * dilation[i] + (out_spatial[i] - 1) * strides[i]
                       + 1 for i in range(len(spatial)))
        xs = lax.slice(
            xpad,
            (0,) + tuple(w[i] * dilation[i] for i in range(len(spatial)))
            + (0,),
            (b,) + limits + (x.shape[-1],),
            (1,) + tuple(strides) + (1,))
        xs = xs.reshape(npos, groups, cin_g)
        # contract batch + all output positions; keep (group, in, out)
        tap = jnp.einsum("ngi,ngo->gio", xs, dy_g,
                         preferred_element_type=jnp.float32)
        taps.append(tap)
    dk = jnp.stack(taps).reshape(spatial + (groups, cin_g, cout_g))
    # (..., g, i, og) -> (..., i, g, og) -> (..., i, cout): out channels are
    # group-major in the native kernel layout
    nsp = len(spatial)
    dk = jnp.moveaxis(dk, nsp, nsp + 1).reshape(spatial + (cin_g, cout))
    return dx, dk.astype(kernel.dtype)


grouped_conv.defvjp(_fwd, _bwd)
