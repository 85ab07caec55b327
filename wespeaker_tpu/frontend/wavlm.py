"""WavLM encoder (flax) — the TPU-native replacement for the reference's
s3prl WavLM upstream (wespeaker/frontend/s3prl.py: S3PRLUpstream +
layer-weighted Featurizer; recipes run_wavlm.sh pair it with ECAPA heads).

Architecture follows microsoft/unilm WavLM as published in HF transformers
(models/wavlm/modeling_wavlm.py): conv feature encoder (7 layers,
group-norm or per-layer layer-norm), feature projection, weight-normed
grouped positional conv, transformer layers with **gated relative position
bias** (T5-style bucketed bias computed in layer 0, re-gated per layer from
the query heads), pre-LN ("stable") or post-LN variants.

Inference/fine-tune oriented: dropout and layerdrop are omitted (eval-exact;
they are train-time regularizers). Attention and MLP kernels carry logical
sharding axes so large checkpoints shard over the ('model',) mesh axis.

Weight conversion from torch releases: utils/torch_compat with
`fold_wavlm_weight_norm` + rules_for("WavLM").
"""

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"   # 'group' (Base) | 'layer' (Large)
    do_stable_layer_norm: bool = False  # True for Large
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    layer_norm_eps: float = 1e-5
    # False -> plain scaled-dot attention: the HuBERT / wav2vec 2.0
    # architecture (HF HubertModel/Wav2Vec2Model), which is WavLM without
    # the gated relative-position bias
    use_rel_pos_bias: bool = True

    @classmethod
    def base(cls):
        return cls()

    @classmethod
    def hubert_base(cls):
        return cls(use_rel_pos_bias=False)

    @classmethod
    def hubert_large(cls):
        return cls(hidden_size=1024, num_hidden_layers=24,
                   num_attention_heads=16, intermediate_size=4096,
                   feat_extract_norm="layer", do_stable_layer_norm=True,
                   conv_bias=True, use_rel_pos_bias=False)

    @classmethod
    def large(cls):
        return cls(hidden_size=1024, num_hidden_layers=24,
                   num_attention_heads=16, intermediate_size=4096,
                   feat_extract_norm="layer", do_stable_layer_norm=True,
                   conv_bias=True)

    def feat_extract_output_lengths(self, input_length):
        for k, s in zip(self.conv_kernel, self.conv_stride):
            input_length = (input_length - k) // s + 1
        return input_length


def _dense(features, name, shard_axes=None, use_bias=True):
    kwargs = {}
    if shard_axes is not None:
        kwargs["kernel_init"] = nn.with_logical_partitioning(
            nn.initializers.lecun_normal(), shard_axes)
    return nn.Dense(features, use_bias=use_bias, name=name, **kwargs)


def relative_position_buckets(q_len: int, k_len: int, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """T5-style bidirectional bucketing (modeling_wavlm.py:253-271);
    computed on host — positions are static under jit."""
    ctx = np.arange(q_len)[:, None]
    mem = np.arange(k_len)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
    large = large / math.log(max_distance / max_exact) * (nb - max_exact)
    large = np.minimum(max_exact + large.astype(np.int64), nb - 1)
    return buckets + np.where(is_small, rel, large)


class WavLMAttention(nn.Module):
    cfg: WavLMConfig
    has_relative_position_bias: bool

    @nn.compact
    def __call__(self, x, position_bias=None, mask=None):
        c = self.cfg
        h, d = c.num_attention_heads, c.hidden_size // c.num_attention_heads
        b, t, _ = x.shape

        if c.use_rel_pos_bias:
            if position_bias is None:
                rel = nn.Embed(c.num_buckets, h, name="rel_attn_embed")
                buckets = jnp.asarray(relative_position_buckets(
                    t, t, c.num_buckets, c.max_bucket_distance))
                position_bias = rel(buckets).transpose(2, 0, 1)  # (H, T, T)

            # gated relative position bias (modeling_wavlm.py:165-180): the
            # per-layer gate is computed from the *un-projected* query heads
            gate_in = x.reshape(b, t, h, d).transpose(0, 2, 1, 3)
            proj = _dense(8, "gru_rel_pos_linear")(gate_in)
            proj = proj.reshape(b, h, t, 2, 4).sum(-1)  # (B,H,T,2)
            gates = nn.sigmoid(proj)
            gate_a, gate_b = gates[..., 0:1], gates[..., 1:2]  # (B,H,T,1)
            const = self.param("gru_rel_pos_const", nn.initializers.ones,
                               (1, h, 1, 1))
            gate = gate_a * (gate_b * const - 1.0) + 2.0  # (B,H,T,1)
            gated_bias = gate * position_bias[None]  # (B,H,T,T)
        else:
            gated_bias = jnp.zeros((), x.dtype)  # HuBERT/wav2vec2: plain MHA

        q = _dense(c.hidden_size, "q_proj", ("embed", "heads"))(x)
        k = _dense(c.hidden_size, "k_proj", ("embed", "heads"))(x)
        v = _dense(c.hidden_size, "v_proj", ("embed", "heads"))(x)
        q = q.reshape(b, t, h, d).transpose(0, 2, 1, 3) * (d ** -0.5)
        k = k.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        logits = (q @ k.transpose(0, 1, 3, 2)
                  + gated_bias).astype(jnp.float32)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :] > 0, logits, -1e30)
        w = nn.softmax(logits, axis=-1).astype(v.dtype)
        out = (w @ v).transpose(0, 2, 1, 3).reshape(b, t, c.hidden_size)
        out = _dense(c.hidden_size, "out_proj", ("heads", "embed"))(out)
        return out, position_bias


class WavLMFeedForward(nn.Module):
    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x):
        h = _dense(self.cfg.intermediate_size, "intermediate_dense",
                   ("embed", "mlp"))(x)
        h = nn.gelu(h, approximate=False)
        return _dense(self.cfg.hidden_size, "output_dense",
                      ("mlp", "embed"))(h)


class WavLMEncoderLayer(nn.Module):
    cfg: WavLMConfig
    has_relative_position_bias: bool

    @nn.compact
    def __call__(self, x, position_bias=None, mask=None):
        c = self.cfg
        eps = c.layer_norm_eps
        if c.do_stable_layer_norm:  # pre-LN (Large)
            h = nn.LayerNorm(epsilon=eps, name="layer_norm")(x)
            a, position_bias = WavLMAttention(
                c, self.has_relative_position_bias, name="attention")(
                    h, position_bias, mask)
            x = x + a
            x = x + WavLMFeedForward(c, name="feed_forward")(
                nn.LayerNorm(epsilon=eps, name="final_layer_norm")(x))
        else:  # post-LN (Base)
            a, position_bias = WavLMAttention(
                c, self.has_relative_position_bias, name="attention")(
                    x, position_bias, mask)
            x = nn.LayerNorm(epsilon=eps, name="layer_norm")(x + a)
            x = x + WavLMFeedForward(c, name="feed_forward")(x)
            x = nn.LayerNorm(epsilon=eps, name="final_layer_norm")(x)
        return x, position_bias


class MaskedChannelNorm(nn.Module):
    """GroupNorm(num_groups=C) == per-channel instance norm over time, with
    optional masked statistics so padded bucket batches match the
    whole-utterance path (torch GroupNorm has no mask)."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None):  # x (B, T, C); mask (B, T)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        if mask is None:
            mu = jnp.mean(x, axis=-2, keepdims=True)
            var = jnp.var(x, axis=-2, keepdims=True)
        else:
            m = mask[..., None]
            n = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
            mu = jnp.sum(x * m, axis=-2, keepdims=True) / n
            var = jnp.sum(((x - mu) * m) ** 2, axis=-2, keepdims=True) / n
        return (x - mu) / jnp.sqrt(var + self.eps) * scale + bias


class WavLMFeatureEncoder(nn.Module):
    cfg: WavLMConfig

    @nn.compact
    def __call__(self, wav, mask=None):
        c = self.cfg
        x = wav[..., None]  # (B, N, 1)
        n_valid = jnp.sum(mask, axis=-1, keepdims=True) \
            if mask is not None else None
        for i, (dim, kern, stride) in enumerate(
                zip(c.conv_dim, c.conv_kernel, c.conv_stride)):
            x = nn.Conv(dim, (kern,), strides=(stride,), padding="VALID",
                        use_bias=c.conv_bias,
                        name=f"conv_layers_{i}_conv")(x)
            if n_valid is not None:
                n_valid = (n_valid - kern) // stride + 1
            if c.feat_extract_norm == "group" and i == 0:
                lmask = None
                if n_valid is not None:
                    lmask = (jnp.arange(x.shape[1])[None, :]
                             < n_valid).astype(x.dtype)
                x = MaskedChannelNorm(
                    name=f"conv_layers_{i}_layer_norm")(x, lmask)
            elif c.feat_extract_norm == "layer":
                x = nn.LayerNorm(epsilon=1e-5,
                                 name=f"conv_layers_{i}_layer_norm")(x)
            x = nn.gelu(x, approximate=False)
        return x


class WavLMFrontend(nn.Module):
    """wav (B, N) float32 [-1, 1] (+ optional sample mask) ->
    (tuple of hidden states [(B, T, D)], last_hidden) — the reference
    frontend contract (s3prl.py / w2vbert.py)."""
    cfg: WavLMConfig = WavLMConfig()
    frozen: bool = False
    normalize_input: bool = False  # zero-mean unit-var (Large checkpoints)

    def downsample_mask(self, mask, t_out):
        """Sample mask (B, N) -> exact conv-stack frame mask (B, t_out)."""
        n_valid = jnp.sum(mask, axis=-1, keepdims=True)
        t_valid = self.cfg.feat_extract_output_lengths(n_valid)
        return (jnp.arange(t_out)[None, :] < t_valid).astype(mask.dtype)

    @nn.compact
    def __call__(self, wav, mask=None, train: bool = False):
        c = self.cfg
        if self.normalize_input:
            if mask is None:
                mu = jnp.mean(wav, axis=-1, keepdims=True)
                var = jnp.var(wav, axis=-1, keepdims=True)
            else:
                n = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1.0)
                mu = jnp.sum(wav * mask, axis=-1, keepdims=True) / n
                var = jnp.sum(((wav - mu) * mask) ** 2, axis=-1,
                              keepdims=True) / n
            wav = (wav - mu) / jnp.sqrt(var + 1e-7)
            if mask is not None:
                wav = wav * mask

        x = WavLMFeatureEncoder(c, name="feature_extractor")(wav, mask)

        fmask = None
        if mask is not None:
            n_valid = jnp.sum(mask, axis=-1, keepdims=True)
            t_valid = c.feat_extract_output_lengths(n_valid)
            fmask = (jnp.arange(x.shape[1])[None, :]
                     < t_valid).astype(x.dtype)
            x = x * fmask[..., None]

        ln = nn.LayerNorm(epsilon=c.layer_norm_eps,
                          name="feature_projection_layer_norm")(x)
        h = _dense(c.hidden_size, "feature_projection_projection")(ln)
        if fmask is not None:
            h = h * fmask[..., None]

        # weight-normed grouped positional conv (folded kernel), even-kernel
        # trailing output removed (WavLMSamePadLayer)
        pad = c.num_conv_pos_embeddings // 2
        from wespeaker_tpu.models.layers import GroupedConv
        pos = GroupedConv(c.hidden_size, (c.num_conv_pos_embeddings,),
                          strides=(1,), padding=((pad, pad),),
                          kernel_dilation=(1,),
                          feature_group_count=c.num_conv_pos_embedding_groups,
                          name="pos_conv_embed_conv")(h)
        if c.num_conv_pos_embeddings % 2 == 0:
            pos = pos[:, :-1]
        h = h + nn.gelu(pos, approximate=False)
        if not c.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=c.layer_norm_eps,
                             name="encoder_layer_norm")(h)

        hidden_states = [h]
        position_bias = None
        for i in range(c.num_hidden_layers):
            h, position_bias = WavLMEncoderLayer(
                c, has_relative_position_bias=(i == 0),
                name=f"layers_{i}")(h, position_bias, fmask)
            hidden_states.append(h)
        if c.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=c.layer_norm_eps,
                             name="encoder_layer_norm")(h)
            hidden_states[-1] = h

        if self.frozen:
            import jax
            hidden_states = [jax.lax.stop_gradient(s) for s in hidden_states]
            h = hidden_states[-1]
        return tuple(hidden_states), h


class Featurizer(nn.Module):
    """Learned softmax-weighted sum over hidden states (the s3prl
    Featurizer role, s3prl.py:23-93)."""
    num_layers: int

    @nn.compact
    def __call__(self, hidden_states):
        w = self.param("weights", nn.initializers.zeros, (self.num_layers,))
        ws = nn.softmax(w)
        stacked = jnp.stack(hidden_states, axis=0)
        return jnp.tensordot(ws, stacked, axes=1)


class WavLMWithFeaturizer(nn.Module):
    """The s3prl-style frontend: WavLM hidden states -> weighted sum.
    output features (B, T, hidden_size); attach to a speaker model via
    FrontendSpeakerModel."""
    cfg: WavLMConfig = WavLMConfig()
    frozen: bool = False
    normalize_input: bool = False

    def downsample_mask(self, mask, t_out):
        n_valid = jnp.sum(mask, axis=-1, keepdims=True)
        t_valid = self.cfg.feat_extract_output_lengths(n_valid)
        return (jnp.arange(t_out)[None, :] < t_valid).astype(mask.dtype)

    @nn.compact
    def __call__(self, wav, mask=None, train: bool = False):
        hidden, _ = WavLMFrontend(self.cfg, self.frozen,
                                  self.normalize_input,
                                  name="upstream")(wav, mask, train)
        return Featurizer(len(hidden), name="featurizer")(hidden)


def fold_wavlm_weight_norm(state_dict):
    """Fold the positional conv's torch weight_norm parametrization
    (original0=g, original1=v, dim=2) into a plain conv weight so the
    structural converter can map it."""
    sd = dict(state_dict)
    for base in ("encoder.pos_conv_embed.conv",):
        g_keys = (f"{base}.parametrizations.weight.original0",
                  f"{base}.weight_g")
        v_keys = (f"{base}.parametrizations.weight.original1",
                  f"{base}.weight_v")
        g = next((sd.pop(k) for k in g_keys if k in sd), None)
        v = next((sd.pop(k) for k in v_keys if k in sd), None)
        if g is None or v is None:
            continue
        g = np.asarray(g, np.float64)
        v = np.asarray(v, np.float64)
        norm = np.sqrt(np.sum(v * v, axis=(0, 1), keepdims=True))
        sd[f"{base}.weight"] = (g * v / np.maximum(norm, 1e-12)).astype(
            np.float32)
    return sd