"""W2VBert adapter-MFA head: per-layer adapters on the last N frontend
hidden states, concat -> ASP -> bottleneck.

Behavioral spec: wespeaker/models/w2vbert_adapter_mfa.py:21-124. The torch
DDP dummy-loss trick (:119-121) is unnecessary under jit.
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from wespeaker_tpu.models.pooling_layers import get_pooling


class Adapter(nn.Module):
    adapter_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.adapter_dim, name="0")(x)
        h = nn.LayerNorm(name="1")(h)
        h = nn.relu(h)
        return nn.Dense(self.adapter_dim, name="3")(h)


class W2VBert_Adapter_MFA(nn.Module):
    feat_dim: int
    embed_dim: int = 256
    pooling_func: str = "ASP"
    n_mfa_layers: int = -1
    adapter_dim: int = 128
    num_frontend_hidden_layers: int = 24

    @nn.compact
    def __call__(self, all_hidden_states: Sequence[jnp.ndarray],
                 mask: Optional[jnp.ndarray] = None, train: bool = False):
        """all_hidden_states: sequence of (B, T, feat_dim) frontend states
        (input embedding + N layers). Returns (B, embed_dim)."""
        n_avail = self.num_frontend_hidden_layers + 1
        n = n_avail if self.n_mfa_layers == -1 else self.n_mfa_layers
        states = list(all_hidden_states)[-n:]
        outs = [Adapter(self.adapter_dim, name=f"adapter_layers_{i}")(s)
                for i, s in enumerate(states)]
        combined = jnp.concatenate(outs, axis=-1)  # (B, T, n*adapter)
        pooled = get_pooling(self.pooling_func, self.adapter_dim * n,
                             hidden_dim=self.adapter_dim,
                             name="pooling")(combined, mask, train)
        return nn.Dense(self.embed_dim, name="bottleneck")(pooled)
