"""Whisper-PMFA head: ASTP(global context) + BN + FC over whisper encoder
features. Behavioral spec: wespeaker/models/whisper_PMFA.py:112-139."""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from wespeaker_tpu.models.pooling_layers import get_pooling


class whisper_PMFA(nn.Module):
    output_size: int = 1280
    embedding_dim: int = 192
    pooling_func: str = "ASTP"
    global_context_att: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False):
        """x: (B, T, output_size) whisper features -> (B, embedding_dim)."""
        pooled = get_pooling(self.pooling_func, self.output_size,
                             global_context_att=self.global_context_att,
                             name="pooling")(x, mask, train)
        pooled = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, name="bn_norm")(pooled)
        return nn.Dense(self.embedding_dim, name="fc")(pooled)


def whisper_PMFA_large_v2(feat_dim, embed_dim):
    return whisper_PMFA(output_size=feat_dim, embedding_dim=embed_dim)
