"""Temporal pooling layers: frame-level features -> utterance-level stats.

Behavioral spec: wespeaker/models/pooling_layers.py (TAP:27, TSDP:47, TSTP:67,
ASTP:92, ASP:151, MHASTP:207, MQMHASTP:281, XI:344). Differences by design:

- Layout is (B, T, D) (time-major, channels-last). ResNet callers flatten
  their (B, F, T, C) maps to (B, T, C*F) with index d = c*F + f, matching the
  reference's (B, C*F, T) ordering.
- Every pooling takes an optional frame-validity mask (B, T) so padded
  static-shape eval batches pool identically to the reference's unpadded
  batch=1 path (the main XLA/variable-length behavioral trap — SURVEY.md §7).
- torch.var's unbiased (ddof=1) default is reproduced where the reference
  relies on it (TSDP/TSTP/ASTP global context).
"""

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from wespeaker_tpu.models.layers import conv1d, masked_mean

_NEG_INF = -1e30


def _mask3(mask):
    return None if mask is None else mask[..., None]


def _std(x, mask, ddof):
    m = _mask3(mask)
    mean = masked_mean(x, m, axis=1, keepdims=True)
    sq = (x - mean) ** 2
    if m is not None:
        sq = sq * m
        count = jnp.sum(m, axis=1)
    else:
        count = jnp.asarray(x.shape[1], x.dtype)
    var = jnp.sum(sq, axis=1) / jnp.maximum(count - ddof, 1.0)
    return jnp.squeeze(mean, 1), jnp.sqrt(var + 1e-7)


class TAP(nn.Module):
    """Temporal average pooling."""
    in_dim: int = 0

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False):
        return masked_mean(x, _mask3(mask), axis=1)

    @property
    def out_dim(self):
        return self.in_dim


class TSDP(nn.Module):
    """Temporal standard-deviation pooling (unbiased, like torch.var)."""
    in_dim: int = 0

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False):
        return _std(x, mask, ddof=1)[1]

    @property
    def out_dim(self):
        return self.in_dim


class TSTP(nn.Module):
    """Temporal statistics pooling: concat(mean, std) — x-vector default."""
    in_dim: int = 0

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False):
        mean, std = _std(x, mask, ddof=1)
        return jnp.concatenate([mean, std], axis=-1)

    @property
    def out_dim(self):
        return self.in_dim * 2


class _K1ConvParams(nn.Module):
    """Parameter holder with nn.Conv's k=1 tree (kernel/bias) but no compute
    — same pattern as models/ecapa_tdnn._ConvParams; init matches nn.Conv
    (lecun_normal fan-in = in_dim)."""
    in_dim: int
    out_dim: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (1, self.in_dim, self.out_dim))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.out_dim,))

    def __call__(self):
        return self.kernel, self.bias


class ASTP(nn.Module):
    """Attentive statistics pooling (ECAPA-TDNN), optional global context."""
    in_dim: int
    bottleneck_dim: int = 128
    global_context_att: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False):
        if self.global_context_att:
            ctx_mean, ctx_std = _std(x, mask, ddof=1)
            # linear1 over concat([x, mean*1, std*1]) WITHOUT materializing
            # the (B, T, 3C) concat (1.9 GB at flagship shapes): split the
            # k=1 conv kernel over its input slices — the context rows
            # reduce to a per-utterance bias broadcast over T. Parameter
            # tree is identical to the conv, so checkpoints are unchanged.
            c = x.shape[-1]
            kernel, bias = _K1ConvParams(3 * c, self.bottleneck_dim,
                                         name="linear1")()
            k = kernel[0].astype(x.dtype)
            ctx = (ctx_mean.astype(x.dtype) @ k[c:2 * c]
                   + ctx_std.astype(x.dtype) @ k[2 * c:]
                   + bias.astype(x.dtype))
            alpha = jnp.tanh(x @ k[:c] + ctx[:, None, :])
        else:
            # conv1d(k=1) == position-wise linear; names match torch modules.
            alpha = jnp.tanh(conv1d(self.bottleneck_dim, 1,
                                    name="linear1")(x))
        alpha = conv1d(self.in_dim, 1, name="linear2")(alpha)
        if mask is not None:
            alpha = jnp.where(mask[..., None] > 0, alpha, _NEG_INF)
        # NOTE: ops/pooling_pallas.fused_softmax_stats fuses this tail into
        # one VMEM pass and wins standalone (4.0 vs 5.1 ms at 1024x200x1536),
        # but loses end-to-end: XLA overlaps the jnp tail with the MFA conv,
        # which a monolithic pallas call prevents — so the model path stays
        # jnp (same finding as the fused Res2 chain, docs/PERF.md).
        alpha = nn.softmax(alpha, axis=1)
        mean = jnp.sum(alpha * x, axis=1)
        var = jnp.sum(alpha * x**2, axis=1) - mean**2
        std = jnp.sqrt(jnp.clip(var, min=1e-7))
        return jnp.concatenate([mean, std], axis=-1)

    @property
    def out_dim(self):
        return self.in_dim * 2


class ASP(nn.Module):
    """Attentive statistics pooling, WavLM/W2V-compatible flavor
    (conv-relu-bn-conv attention stack, 1e-5 variance clamp)."""
    in_dim: int
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, train: bool = False):
        h = conv1d(self.hidden_dim, 1, name="att_conv1")(x)
        h = nn.relu(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="att_bn")(h)
        w = conv1d(self.in_dim, 1, name="att_conv2")(h)
        if mask is not None:
            w = jnp.where(mask[..., None] > 0, w, _NEG_INF)
        w = nn.softmax(w, axis=1)
        mu = jnp.sum(x * w, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum(x**2 * w, axis=1) - mu**2, min=1e-5))
        return jnp.concatenate([mu, sg], axis=-1)

    @property
    def out_dim(self):
        return self.in_dim * 2


class _MHASTPHead(nn.Module):
    """One head's attention stack: (layer_num-1) conv+tanh, then conv to d_s."""
    d_model: int
    layer_num: int
    d_s: int
    bottleneck_dim: int

    @nn.compact
    def __call__(self, chunk, mask):
        dims = [self.bottleneck_dim] * (self.layer_num + 1)
        dims[0], dims[-1] = self.d_model, self.d_s
        h = chunk
        for i in range(self.layer_num - 1):
            h = jnp.tanh(conv1d(dims[i + 1], 1, name=f"att_{i}")(h))
        score = conv1d(dims[self.layer_num], 1,
                       name=f"att_{self.layer_num - 1}")(h)
        if mask is not None:
            score = jnp.where(mask[..., None] > 0, score, _NEG_INF)
        alpha = nn.softmax(score, axis=1)
        mean = jnp.sum(alpha * chunk, axis=1)
        var = jnp.sum(alpha * chunk**2, axis=1) - mean**2
        std = jnp.sqrt(jnp.clip(var, min=1e-7))
        return jnp.concatenate([mean, std], axis=-1)


class MHASTP(nn.Module):
    """Multi-head attentive statistics pooling (arXiv:1906.09890)."""
    in_dim: int
    layer_num: int = 2
    head_num: int = 2
    d_s: int = 1
    bottleneck_dim: int = 64

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False):
        assert self.in_dim % self.head_num == 0
        d_model = self.in_dim // self.head_num
        d_s = d_model if self.d_s > 1 else 1
        outs = []
        for i in range(self.head_num):
            chunk = x[..., i * d_model:(i + 1) * d_model]
            outs.append(_MHASTPHead(d_model, self.layer_num, d_s,
                                    self.bottleneck_dim,
                                    name=f"heads_att_trans_{i}")(chunk, mask))
        return jnp.concatenate(outs, axis=-1)

    @property
    def out_dim(self):
        return self.in_dim * 2


class MQMHASTP(nn.Module):
    """Multi-query multi-head attentive statistics pooling (arXiv:2110.05042)."""
    in_dim: int
    layer_num: int = 2
    query_num: int = 2
    head_num: int = 8
    d_s: int = 2
    bottleneck_dim: int = 64

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False):
        outs = [
            MHASTP(self.in_dim, layer_num=self.layer_num,
                   head_num=self.head_num, d_s=self.d_s,
                   bottleneck_dim=self.bottleneck_dim,
                   name=f"n_query_{i}")(x, mask)
            for i in range(self.query_num)
        ]
        return jnp.concatenate(outs, axis=-1)

    @property
    def out_dim(self):
        return self.in_dim * 2 * self.query_num


class XI(nn.Module):
    """Xi-vector Gaussian posterior-inference pooling
    (wespeaker/models/pooling_layers.py:344-416)."""
    in_dim: int
    hidden_size: int = 256
    stddev: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, train: bool = False):
        prior_mean = self.param("prior_mean", nn.initializers.zeros,
                                (1, self.in_dim))
        prior_logprec = self.param("prior_logprec", nn.initializers.zeros,
                                   (1, self.in_dim))
        h = conv1d(self.hidden_size, 1, name="lin1")(x)
        h = nn.relu(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="lin1_bn")(h)
        logprec = nn.softplus(conv1d(self.in_dim, 1, name="lin2")(h))
        logprec = jnp.clip(2.0 * jnp.log(logprec), -15.0, 15.0)
        if mask is not None:
            logprec = jnp.where(mask[..., None] > 0, logprec, _NEG_INF)
        b = x.shape[0]
        prior_lp = jnp.broadcast_to(prior_logprec[None, :, :],
                                    (b, 1, self.in_dim))
        lp_all = jnp.concatenate([logprec, prior_lp], axis=1)  # (B, T+1, D)
        attn = nn.softmax(lp_all, axis=1)
        feat_all = jnp.concatenate(
            [x, jnp.broadcast_to(prior_mean[None, :, :], (b, 1, self.in_dim))],
            axis=1)
        phi = jnp.sum(feat_all * attn, axis=1)
        if self.stddev:
            sigma2 = jnp.sum(feat_all**2 * attn, axis=1)
            sigma = jnp.sqrt(jnp.clip(sigma2 - phi**2, min=1e-12))
            return jnp.concatenate([phi, sigma], axis=-1)
        return phi

    @property
    def out_dim(self):
        return self.in_dim * 2 if self.stddev else self.in_dim


POOLING_LAYERS = {
    "TAP": TAP, "TSDP": TSDP, "TSTP": TSTP, "ASTP": ASTP, "ASP": ASP,
    "MHASTP": MHASTP, "MQMHASTP": MQMHASTP, "XI": XI,
}


def get_pooling(pool_type: str, in_dim: int, **kwargs) -> nn.Module:
    cls = POOLING_LAYERS[pool_type]
    name = kwargs.pop("name", None)
    fields = {f.name for f in dataclasses.fields(cls)}
    kwargs = {k: v for k, v in kwargs.items() if k in fields}
    return cls(in_dim=in_dim, name=name, **kwargs)


def pooling_out_dim(pool_type: str, in_dim: int, **kwargs) -> int:
    if pool_type in ("TAP", "TSDP"):
        return in_dim
    if pool_type == "MQMHASTP":
        return in_dim * 2 * kwargs.get("query_num", 2)
    if pool_type == "XI":
        return in_dim * 2 if kwargs.get("stddev", False) else in_dim
    return in_dim * 2
