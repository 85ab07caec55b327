"""ECAPA-TDNN speaker encoder, TPU-native flax implementation.

Behavioral spec: wespeaker/models/ecapa_tdnn.py (Res2Conv1dReluBn:29,
SE_Connect:113, SE_Res2Block:133, ECAPA_TDNN:160, constructors :237-274).

Design notes (vs the torch reference):
- Activations are (B, T, C) channels-last; every conv lowers to an MXU matmul
  with the channel dim on lanes. The reference's (B, C, T) permutes disappear.
- The Res2 split-conv chain is an inherently sequential scan over `scale-1`
  width-128 groups; it is expressed with static python loops (unrolled in the
  jit trace) so XLA can pipeline the small matmuls.
- Optional frame mask makes padded-batch extraction equivalent to the
  reference's batch=1 whole-utterance path (masked SE squeeze + masked ASTP).
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from wespeaker_tpu.models.layers import conv1d, masked_mean
from wespeaker_tpu.models.pooling_layers import get_pooling, pooling_out_dim


class Conv1dReluBn(nn.Module):
    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1d(self.out_channels, self.kernel_size, stride=self.stride,
                   padding=self.padding, dilation=self.dilation,
                   name="conv")(x)
        x = nn.relu(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class Res2Conv1dReluBn(nn.Module):
    """Res2Net-style hierarchical split conv: channels split into `scale`
    groups; group i is convolved after accumulating group i-1's output."""
    channels: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    scale: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.channels % self.scale == 0
        width = self.channels // self.scale
        nums = self.scale if self.scale == 1 else self.scale - 1
        splits = [x[..., i * width:(i + 1) * width]
                  for i in range(self.scale)]
        out = []
        sp = splits[0]
        for i in range(nums):
            if i >= 1:
                sp = sp + splits[i]
            sp = conv1d(width, self.kernel_size, stride=self.stride,
                        padding=self.padding, dilation=self.dilation,
                        name=f"convs_{i}")(sp)
            # reference order: conv -> relu -> bn
            sp = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, name=f"bns_{i}")(nn.relu(sp))
            out.append(sp)
        if self.scale != 1:
            out.append(splits[nums])
        return jnp.concatenate(out, axis=-1)


class _ConvParams(nn.Module):
    """Parameter holder matching conv1d's tree (kernel/bias) without the
    compute — lets the fused kernel reuse standard checkpoints."""
    width: int
    kernel_size: int

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.width, self.width))
        self.bias = self.param("bias", nn.initializers.zeros, (self.width,))

    def __call__(self):
        return self.kernel, self.bias


class _BNParams(nn.Module):
    """Parameter holder matching nn.BatchNorm's tree."""
    width: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.width,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.width,))
        self.mean = self.variable("batch_stats", "mean",
                                  lambda: jnp.zeros((self.width,)))
        self.var = self.variable("batch_stats", "var",
                                 lambda: jnp.ones((self.width,)))

    def __call__(self):
        return self.scale, self.bias, self.mean.value, self.var.value


class FusedRes2Conv1dReluBn(nn.Module):
    """Inference-only Res2 chain backed by the fused Pallas kernel
    (ops/res2_pallas.py). Identical parameter tree to Res2Conv1dReluBn, so
    checkpoints are interchangeable; ~2x faster than the XLA chain on TPU."""
    channels: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    scale: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not train, "fused Res2 path is inference-only"
        import jax as _jax

        from wespeaker_tpu.ops.res2_pallas import (fused_res2_chain,
                                                   kernel_fits,
                                                   res2_chain_reference)

        width = self.channels // self.scale
        nums = self.scale - 1
        kernels, biases, scales, shifts = [], [], [], []
        for i in range(nums):
            k, b = _ConvParams(width, self.kernel_size,
                               name=f"convs_{i}")()
            gamma, beta, mean, var = _BNParams(width, name=f"bns_{i}")()
            s = gamma / jnp.sqrt(var + 1e-5)
            kernels.append(k)
            biases.append(b)
            scales.append(s)
            shifts.append(beta - mean * s)
        args = (x, jnp.stack(kernels), jnp.stack(biases), jnp.stack(scales),
                jnp.stack(shifts), self.dilation)
        if not kernel_fits(x.shape[1], self.channels, self.scale,
                           x.dtype.itemsize):
            return res2_chain_reference(*args)
        interpret = _jax.devices()[0].platform != "tpu"
        return fused_res2_chain(*args, interpret=interpret)


class _DenseParams(nn.Module):
    """Parameter holder matching nn.Dense's tree (kernel/bias)."""
    in_dim: int
    out_dim: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_dim, self.out_dim))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.out_dim,))

    def __call__(self):
        return self.kernel, self.bias


class _ConvBnParams(nn.Module):
    """Parameter tree of Conv1dReluBn (conv + bn children) without the
    compute; returns the BN-folded (weight, bias, scale, shift)."""
    channels: int
    kernel_size: int = 1

    def setup(self):
        self.conv = _ConvParams(self.channels, self.kernel_size,
                                name="conv")
        self.bn = _BNParams(self.channels, name="bn")

    def __call__(self):
        k, b = self.conv()
        gamma, beta, mean, var = self.bn()
        s = gamma / jnp.sqrt(var + 1e-5)
        return k, b, s, beta - mean * s


class SE_Connect(nn.Module):
    channels: int
    se_bottleneck_dim: int = 128

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        s = masked_mean(x, None if mask is None else mask[..., None], axis=1)
        s = nn.relu(nn.Dense(self.se_bottleneck_dim, name="linear1")(s))
        s = nn.sigmoid(nn.Dense(self.channels, name="linear2")(s))
        return x * s[:, None, :]


class _SEParams(nn.Module):
    """Parameter tree of SE_Connect (linear1/linear2 Dense children)."""
    channels: int
    se_bottleneck_dim: int = 128

    def setup(self):
        self.linear1 = _DenseParams(self.channels, self.se_bottleneck_dim,
                                    name="linear1")
        self.linear2 = _DenseParams(self.se_bottleneck_dim, self.channels,
                                    name="linear2")

    def __call__(self):
        return (*self.linear1(), *self.linear2())


class _Res2ChainParams(nn.Module):
    """Parameter tree of Res2Conv1dReluBn (convs_i/bns_i children);
    returns the chain arrays stacked for the fused kernels."""
    channels: int
    kernel_size: int
    scale: int

    def setup(self):
        width = self.channels // self.scale
        nums = self.scale - 1
        self.convs = [_ConvParams(width, self.kernel_size,
                                  name=f"convs_{i}") for i in range(nums)]
        self.bns = [_BNParams(width, name=f"bns_{i}") for i in range(nums)]

    def __call__(self):
        kernels, biases, scales, shifts = [], [], [], []
        for conv, bn in zip(self.convs, self.bns):
            k, b = conv()
            gamma, beta, mean, var = bn()
            s = gamma / jnp.sqrt(var + 1e-5)
            kernels.append(k)
            biases.append(b)
            scales.append(s)
            shifts.append(beta - mean * s)
        return (jnp.stack(kernels), jnp.stack(biases), jnp.stack(scales),
                jnp.stack(shifts))


class SE_Res2Block(nn.Module):
    channels: int
    kernel_size: int
    stride: int
    padding: int
    dilation: int
    scale: int
    fused_res2: bool = False
    fused_block: bool = False  # whole-block Pallas kernel (inference only)

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        if self.fused_block and not train:
            from wespeaker_tpu.ops.se_block_pallas import (
                block_kernel_fits, fused_se_res2_block)
            if block_kernel_fits(x.shape[1], self.channels, self.scale,
                                 x.dtype.itemsize):
                import jax as _jax
                w1, b1, s1, h1 = _ConvBnParams(self.channels, 1,
                                               name="block_0")()
                cw, cb, cs, ch = _Res2ChainParams(
                    self.channels, self.kernel_size, self.scale,
                    name="block_1")()
                w2, b2, s2, h2 = _ConvBnParams(self.channels, 1,
                                               name="block_2")()
                sw1, sb1, sw2, sb2 = _SEParams(self.channels,
                                               name="block_3")()
                interpret = _jax.devices()[0].platform != "tpu"
                return fused_se_res2_block(
                    x, w1[0], b1, s1, h1, cw, cb, cs, ch, w2[0], b2, s2,
                    h2, sw1, sb1, sw2, sb2, self.dilation, mask=mask,
                    interpret=interpret)
        out = Conv1dReluBn(self.channels, 1, name="block_0")(x, train)
        res2_cls = (FusedRes2Conv1dReluBn
                    if self.fused_res2 and not train else Res2Conv1dReluBn)
        out = res2_cls(self.channels, self.kernel_size, self.stride,
                       self.padding, self.dilation, self.scale,
                       name="block_1")(out, train)
        out = Conv1dReluBn(self.channels, 1, name="block_2")(out, train)
        out = SE_Connect(self.channels, name="block_3")(out, mask)
        return x + out


class _ASTPParams(nn.Module):
    """Parameter tree of pooling_layers.ASTP (linear1/linear2) without the
    compute, for the fused MFA+ASTP tail kernel."""
    in_dim: int
    bottleneck_dim: int = 128
    global_context_att: bool = False

    def setup(self):
        from wespeaker_tpu.models.pooling_layers import _K1ConvParams
        k_in = 3 * self.in_dim if self.global_context_att else self.in_dim
        self.linear1 = _K1ConvParams(k_in, self.bottleneck_dim,
                                     name="linear1")
        self.linear2 = _K1ConvParams(self.bottleneck_dim, self.in_dim,
                                     name="linear2")

    def __call__(self):
        return (*self.linear1(), *self.linear2())


class ECAPA_TDNN(nn.Module):
    channels: int = 512
    feat_dim: int = 80
    embed_dim: int = 192
    pooling_func: str = "ASTP"
    global_context_att: bool = False
    emb_bn: bool = False
    # Fused Pallas kernels. None = auto: enabled on TPU backends for
    # inference, off elsewhere (interpret mode on CPU is correct but
    # slow). Guards fall back to the standard path whenever shapes don't
    # fit; parameter trees are identical either way. fused_tail=True
    # additionally enables the differentiable tail (ops/mfa_astp_vjp.py)
    # in training — measured at parity with XLA's schedule in the full
    # step, so it is opt-in (docs/PERF.md round-3 analysis).
    fused_res2: bool = False  # Pallas Res2 chain (inference only)
    fused_block: Optional[bool] = None  # whole-SE-Res2-block kernel
    fused_tail: Optional[bool] = None  # MFA-conv+ASTP kernel

    def _fused_enabled(self, flag):
        if flag is not None:
            return flag
        import jax as _jax
        return _jax.devices()[0].platform == "tpu"

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False, return_frame_feat: bool = False):
        """x: (B, T, F) fbank features. Returns (B, embed_dim) embedding."""
        fr = self.fused_res2
        fb = self._fused_enabled(self.fused_block)
        out1 = Conv1dReluBn(self.channels, 5, padding=2, name="layer1")(x, train)
        out2 = SE_Res2Block(self.channels, 3, 1, 2, 2, 8, fr, fb,
                            name="layer2")(out1, mask, train)
        out3 = SE_Res2Block(self.channels, 3, 1, 3, 3, 8, fr, fb,
                            name="layer3")(out2, mask, train)
        out4 = SE_Res2Block(self.channels, 3, 1, 4, 4, 8, fr, fb,
                            name="layer4")(out3, mask, train)

        pooled = None
        # eval: auto-enabled on TPU (None -> on). train: explicit opt-in
        # only — the differentiable tail's jnp backward currently measures
        # slightly behind XLA's autodiff schedule (scripts/perf_tail_train
        # A/B); revisit the default when the Pallas backward lands.
        tail_on = (self.fused_tail is True if train
                   else self._fused_enabled(self.fused_tail))
        if (tail_on and not return_frame_feat
                and self.pooling_func == "ASTP"
                and (not train or mask is None)):
            from wespeaker_tpu.ops.mfa_astp_pallas import (fused_mfa_astp,
                                                           tail_kernel_fits)
            from wespeaker_tpu.ops.mfa_astp_vjp import (mfa_astp_train,
                                                        tail_train_fits)
            fits = (tail_train_fits if train else tail_kernel_fits)(
                out2.shape[1], self.channels, out2.dtype.itemsize,
                d=512 * 3)
            if fits:
                import jax as _jax
                from wespeaker_tpu.models.pooling_layers import \
                    _K1ConvParams
                # MFA conv maps channels*3 -> 512*3 (non-square for c1024,
                # reference ecapa_tdnn.py:194-196)
                wm, bm = _K1ConvParams(self.channels * 3, 512 * 3,
                                       name="conv")()
                k1, b1, k2, b2 = _ASTPParams(
                    512 * 3, global_context_att=self.global_context_att,
                    name="pool")()
                interpret = _jax.devices()[0].platform != "tpu"
                if train:
                    # differentiable fused tail (ops/mfa_astp_vjp.py):
                    # exact in training — the tail carries no BatchNorm
                    pooled = mfa_astp_train(
                        out2, out3, out4, wm[0], bm, k1[0], b1, k2[0], b2,
                        self.global_context_att,
                        interpret).astype(x.dtype)
                else:
                    pooled = fused_mfa_astp(
                        out2, out3, out4, wm[0], bm, k1[0], b1, k2[0], b2,
                        mask=mask, glob=self.global_context_att,
                        interpret=interpret).astype(x.dtype)
        if pooled is None:
            out = jnp.concatenate([out2, out3, out4], axis=-1)
            out = conv1d(512 * 3, 1, name="conv")(out)
            if return_frame_feat:
                return out
            out = nn.relu(out)
            pool_in_dim = 512 * 3
            pooled = get_pooling(self.pooling_func, pool_in_dim,
                                 global_context_att=self.global_context_att,
                                 name="pool")(out, mask, train)
        pooled = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, name="bn")(pooled)
        emb = nn.Dense(self.embed_dim, name="linear")(pooled)
        if self.emb_bn:
            emb = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, name="bn2")(emb)
        return emb

    @property
    def pool_out_dim(self):
        return pooling_out_dim(self.pooling_func, 512 * 3)


def ECAPA_TDNN_c1024(feat_dim, embed_dim, pooling_func="ASTP", emb_bn=False,
                     **fused):
    return ECAPA_TDNN(channels=1024, feat_dim=feat_dim, embed_dim=embed_dim,
                      pooling_func=pooling_func, emb_bn=emb_bn, **fused)


def ECAPA_TDNN_GLOB_c1024(feat_dim, embed_dim, pooling_func="ASTP",
                          emb_bn=False, **fused):
    return ECAPA_TDNN(channels=1024, feat_dim=feat_dim, embed_dim=embed_dim,
                      pooling_func=pooling_func, global_context_att=True,
                      emb_bn=emb_bn, **fused)


def ECAPA_TDNN_c512(feat_dim, embed_dim, pooling_func="ASTP", emb_bn=False,
                    **fused):
    return ECAPA_TDNN(channels=512, feat_dim=feat_dim, embed_dim=embed_dim,
                      pooling_func=pooling_func, emb_bn=emb_bn, **fused)


def ECAPA_TDNN_GLOB_c512(feat_dim, embed_dim, pooling_func="ASTP",
                         emb_bn=False, **fused):
    return ECAPA_TDNN(channels=512, feat_dim=feat_dim, embed_dim=embed_dim,
                      pooling_func=pooling_func, global_context_att=True,
                      emb_bn=emb_bn, **fused)
