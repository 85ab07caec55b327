"""w2v-bert 2.0 encoder (flax) — TPU-native replacement for the reference's
HF torch Wav2Vec2BertModel wrapper (wespeaker/frontend/w2vbert.py:78-198).

Architecture per HF transformers (models/wav2vec2_bert/modeling_wav2vec2_bert
.py): feature projection over 160-dim stacked-fbank inputs, then conformer
blocks — half-step FFN, self-attention with *relative_key* position
embeddings (clamped distance embedding, left 64 / right 8), causal
depthwise-conv module with GLU, half-step FFN, final LN.

The input features are the SeamlessM4T extractor's: kaldi povey fbank
(== frontend/fbank.py with window_type='povey'), per-utterance per-mel-bin
normalization (ddof=1), and stride-2 frame stacking to 160 dims —
implemented here on device as `w2vbert_features`.

Inference/fine-tune oriented: dropout/layerdrop omitted. Attention and MLP
kernels carry logical sharding axes for ('model',) mesh sharding (the 580M
checkpoint is the main sharding target, SURVEY.md §2.10). bnb 4-bit
quantization is intentionally dropped; LoRA lives in utils/lora.py.
"""

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from wespeaker_tpu.frontend.fbank import FbankConfig, compute_fbank


@dataclasses.dataclass(frozen=True)
class W2VBertConfig:
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    feature_projection_input_dim: int = 160
    left_max_position_embeddings: int = 64
    right_max_position_embeddings: int = 8
    conv_depthwise_kernel_size: int = 31
    layer_norm_eps: float = 1e-5

    @property
    def head_size(self):
        return self.hidden_size // self.num_attention_heads


_W2VBERT_FBANK = FbankConfig(window_type="povey", dither=0.0)


def w2vbert_features(wav, mask=None, num_mel_bins: int = 80,
                     stride: int = 2):
    """wav (B, N) float32 [-1, 1] -> (features (B, T//2, 160), frame mask or
    None). Mirrors SeamlessM4TFeatureExtractor: kaldi povey fbank on
    x * 2^15, per-bin zero-mean unit-var (ddof=1) over valid frames,
    stride-2 stacking."""
    cfg = dataclasses.replace(_W2VBERT_FBANK, num_mel_bins=num_mel_bins)
    feat = compute_fbank(wav * (1 << 15), cfg)
    t = feat.shape[-2]
    if mask is not None:
        n_valid = jnp.sum(mask, axis=-1, keepdims=True)
        t_valid = 1 + (n_valid - cfg.window_size) // cfg.window_shift
        fmask = (jnp.arange(t)[None, :] < t_valid).astype(feat.dtype)
        m = fmask[..., None]
        n = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 2.0)
        mean = jnp.sum(feat * m, axis=-2, keepdims=True) / n
        var = jnp.sum(((feat - mean) * m) ** 2, axis=-2,
                      keepdims=True) / (n - 1.0)
        feat = (feat - mean) / jnp.sqrt(var + 1e-7) * m
    else:
        mean = jnp.mean(feat, axis=-2, keepdims=True)
        var = jnp.var(feat, axis=-2, keepdims=True, ddof=1)
        feat = (feat - mean) / jnp.sqrt(var + 1e-7)
        fmask = None
    t2 = (t // stride) * stride
    feat = feat[..., :t2, :].reshape(feat.shape[:-2] + (t2 // stride, -1))
    if fmask is None:
        return feat, None
    # stacked frame valid iff its second source frame is (extractor keeps
    # attention_mask rows where index % stride == 1)
    out_mask = fmask[..., :t2][..., 1::stride]
    return feat, out_mask


class W2VBertSelfAttention(nn.Module):
    cfg: W2VBertConfig

    @nn.compact
    def __call__(self, x, mask=None):
        c = self.cfg
        h, d = c.num_attention_heads, c.head_size
        b, t, _ = x.shape

        def dense(name, shard):
            kw = {"kernel_init": nn.with_logical_partitioning(
                nn.initializers.lecun_normal(), shard)}
            return nn.Dense(c.hidden_size, name=name, **kw)

        q = dense("linear_q", ("embed", "heads"))(x)
        k = dense("linear_k", ("embed", "heads"))(x)
        v = dense("linear_v", ("embed", "heads"))(x)
        q = q.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        scores = q @ k.transpose(0, 1, 3, 2)

        # relative_key position bias (modeling_wav2vec2_bert.py:308-320)
        left = c.left_max_position_embeddings
        right = c.right_max_position_embeddings
        dist = np.clip(np.arange(t)[None, :] - np.arange(t)[:, None],
                       -left, right)
        emb = nn.Embed(left + right + 1, d, name="distance_embedding")
        pos = emb(jnp.asarray(dist + left))  # (T, T, d)
        rel = jnp.einsum("bhld,lrd->bhlr", q, pos.astype(q.dtype))
        scores = (scores + rel) / jnp.sqrt(jnp.asarray(d, scores.dtype))

        scores = scores.astype(jnp.float32)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :] > 0, scores, -1e30)
        w = nn.softmax(scores, axis=-1).astype(v.dtype)
        out = (w @ v).transpose(0, 2, 1, 3).reshape(b, t, c.hidden_size)
        return dense("linear_out", ("heads", "embed"))(out)


class W2VBertFeedForward(nn.Module):
    cfg: W2VBertConfig

    @nn.compact
    def __call__(self, x):
        def dense(feats, name, shard):
            return nn.Dense(feats, name=name,
                            kernel_init=nn.with_logical_partitioning(
                                nn.initializers.lecun_normal(), shard))
        h = dense(self.cfg.intermediate_size, "intermediate_dense",
                  ("embed", "mlp"))(x)
        h = nn.silu(h)  # 'swish'
        return dense(self.cfg.hidden_size, "output_dense",
                     ("mlp", "embed"))(h)


class W2VBertConvModule(nn.Module):
    cfg: W2VBertConfig

    @nn.compact
    def __call__(self, x, mask=None):
        c = self.cfg
        eps = c.layer_norm_eps
        h = nn.LayerNorm(epsilon=eps, name="layer_norm")(x)
        if mask is not None:
            h = h * mask[..., None]
        h = nn.Conv(2 * c.hidden_size, (1,), use_bias=False,
                    name="pointwise_conv1")(h)
        a, g = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(g)  # GLU over channel dim
        # causal depthwise conv: pad (k-1) on the left
        from wespeaker_tpu.models.layers import GroupedConv
        k = c.conv_depthwise_kernel_size
        h = GroupedConv(c.hidden_size, (k,), strides=(1,),
                        padding=((k - 1, 0),), kernel_dilation=(1,),
                        feature_group_count=c.hidden_size, use_bias=False,
                        name="depthwise_conv")(h)
        h = nn.LayerNorm(epsilon=eps, name="depthwise_layer_norm")(h)
        h = nn.silu(h)
        return nn.Conv(c.hidden_size, (1,), use_bias=False,
                       name="pointwise_conv2")(h)


class W2VBertEncoderLayer(nn.Module):
    """Conformer block (modeling_wav2vec2_bert.py:398-461)."""
    cfg: W2VBertConfig

    @nn.compact
    def __call__(self, x, mask=None):
        c = self.cfg
        eps = c.layer_norm_eps
        h = nn.LayerNorm(epsilon=eps, name="ffn1_layer_norm")(x)
        x = x + 0.5 * W2VBertFeedForward(c, name="ffn1")(h)
        h = nn.LayerNorm(epsilon=eps, name="self_attn_layer_norm")(x)
        x = x + W2VBertSelfAttention(c, name="self_attn")(h, mask)
        x = x + W2VBertConvModule(c, name="conv_module")(x, mask)
        h = nn.LayerNorm(epsilon=eps, name="ffn2_layer_norm")(x)
        x = x + 0.5 * W2VBertFeedForward(c, name="ffn2")(h)
        return nn.LayerNorm(epsilon=eps, name="final_layer_norm")(x)


class W2VBertFrontend(nn.Module):
    """features (B, T, 160) (+ optional frame mask) ->
    (tuple of hidden states, last_hidden) — the reference frontend contract
    (w2vbert.py:150-198 returns (all_hidden_states, last_hidden))."""
    cfg: W2VBertConfig = W2VBertConfig()
    frozen: bool = False

    @nn.compact
    def __call__(self, feats, mask=None, train: bool = False):
        c = self.cfg
        ln = nn.LayerNorm(epsilon=c.layer_norm_eps,
                          name="feature_projection_layer_norm")(feats)
        h = nn.Dense(c.hidden_size,
                     name="feature_projection_projection")(ln)
        if mask is not None:
            h = h * mask[..., None]

        hidden_states = [h]
        for i in range(c.num_hidden_layers):
            h = W2VBertEncoderLayer(c, name=f"layers_{i}")(h, mask)
            hidden_states.append(h)

        if self.frozen:
            import jax
            hidden_states = [jax.lax.stop_gradient(s) for s in hidden_states]
            h = hidden_states[-1]
        return tuple(hidden_states), h