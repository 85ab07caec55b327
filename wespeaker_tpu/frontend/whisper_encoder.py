"""Whisper audio encoder (flax) for the Whisper-PMFA recipe.

Behavioral spec: wespeaker/frontend/whisper_encoder.py (MultiHeadAttention:64,
ResidualAttentionBlock:119, AudioEncoder:153 with positional-embedding
truncation for short inputs :196-207 and partial-layer concat :209-218).

This is the large SSL frontend of the framework (whisper-large-v2 encoder is
~638M params): attention/MLP matmuls carry logical sharding annotations so
the ('model',) mesh axis can shard them when a checkpoint exceeds one chip's
HBM (SURVEY.md §2.10).
"""

import math
import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0):
    assert channels % 2 == 0
    log_inc = math.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def _dense(features, name, use_bias=True, shard_axes=None):
    kwargs = {}
    if shard_axes is not None:
        kwargs["kernel_init"] = nn.with_logical_partitioning(
            nn.initializers.lecun_normal(), shard_axes)
    return nn.Dense(features, use_bias=use_bias, name=name, **kwargs)


class MultiHeadAttention(nn.Module):
    n_state: int
    n_head: int

    @nn.compact
    def __call__(self, x, mask=None):
        d = self.n_state // self.n_head
        q = _dense(self.n_state, "query",
                   shard_axes=("embed", "heads"))(x)
        k = _dense(self.n_state, "key", use_bias=False,
                   shard_axes=("embed", "heads"))(x)
        v = _dense(self.n_state, "value",
                   shard_axes=("embed", "heads"))(x)
        b, t, _ = x.shape
        q = q.reshape(b, t, self.n_head, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, self.n_head, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, self.n_head, d).transpose(0, 2, 1, 3)
        scale = d ** -0.25
        logits = (q * scale) @ (k * scale).transpose(0, 1, 3, 2)
        logits = logits.astype(jnp.float32)
        if mask is not None:
            # exclude padded key positions so bucketed batch eval matches
            # the reference's whole-utterance batch=1 path
            logits = jnp.where(mask[:, None, None, :] > 0, logits, -1e30)
        w = nn.softmax(logits, axis=-1).astype(q.dtype)
        out = (w @ v).transpose(0, 2, 1, 3).reshape(b, t, self.n_state)
        return _dense(self.n_state, "out", shard_axes=("heads", "embed"))(out)


class ResidualAttentionBlock(nn.Module):
    n_state: int
    n_head: int

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(name="attn_ln")(x)
        x = x + MultiHeadAttention(self.n_state, self.n_head,
                                   name="attn")(h, mask)
        h = nn.LayerNorm(name="mlp_ln")(x)
        h = _dense(self.n_state * 4, "mlp_0", shard_axes=("embed", "mlp"))(h)
        h = nn.gelu(h, approximate=False)
        h = _dense(self.n_state, "mlp_2", shard_axes=("mlp", "embed"))(h)
        return x + h


class AudioEncoder(nn.Module):
    """Input (B, T_mel, n_mels) -> concatenated hidden states of layers
    [layer_st, layer_ed], shape (B, T_mel//2, n_state*(ed-st+1))."""
    n_mels: int
    n_ctx: int
    n_state: int
    n_head: int
    n_layer: int
    layer_st: int
    layer_ed: int

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        # torch path takes (B, n_mels, T); ours is (B, T, n_mels) natively
        if mask is not None:
            # zero padded mel frames so the strided convs see the same zero
            # padding a whole-utterance batch=1 forward would
            x = x * mask[..., None]
        h = nn.Conv(self.n_state, (3,), padding=[(1, 1)], name="conv1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.n_state, (3,), strides=(2,), padding=[(1, 1)],
                    name="conv2")(h)
        h = nn.gelu(h, approximate=False)

        pos = jnp.asarray(sinusoids(self.n_ctx, self.n_state))
        t = h.shape[1]
        if self.n_ctx >= t:
            pos_t = pos[:t]
        else:
            h = h[:, :self.n_ctx]
            pos_t = pos
        h = h + pos_t

        out_mask = None
        if mask is not None:
            out_mask = mask[:, ::2][:, :h.shape[1]]

        outs = []
        for i in range(self.n_layer):
            h = ResidualAttentionBlock(self.n_state, self.n_head,
                                       name=f"blocks_{i}")(h, out_mask)
            if self.layer_st <= i <= self.layer_ed:
                outs.append(h)
        hs = jnp.concatenate(outs, axis=-1)
        return nn.LayerNorm(name="ln_post2")(hs)


class WhisperEncoderFrontend(nn.Module):
    """Registry-facing frontend (frontend_class_dict['whisper_encoder']):
    mel features in, PMFA-ready concatenated hidden states out."""
    n_mels: int = 80
    num_blocks: int = 24
    output_size: int = 1280
    n_head: int = 20
    layer_st: int = 16
    layer_ed: int = 23
    n_ctx: int = 1500
    frozen: bool = False

    # conv2 halves the time axis: the composite wrapper downsamples frame
    # masks by this stride before CMVN/pooling
    time_stride = 2

    @nn.compact
    def __call__(self, feats, mask=None, train: bool = False):
        out = AudioEncoder(self.n_mels, self.n_ctx, self.output_size,
                           self.n_head, self.num_blocks, self.layer_st,
                           self.layer_ed, name="encoder")(feats, mask, train)
        if self.frozen:
            out = jnp.asarray(out)
            out = jax_stop_gradient(out)
        return out


def jax_stop_gradient(x):
    import jax
    return jax.lax.stop_gradient(x)
