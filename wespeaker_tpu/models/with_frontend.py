"""Composite neural-frontend + speaker-model module.

The reference attaches non-fbank frontends to the model and runs them inside
the train loop (wespeaker/bin/train.py:116-124, utils/executor.py:42-48).
Here the composite is itself a flax module so the whole thing jits and
shards as one program; `frozen` stops gradients into the frontend (stage-1
of the 3-phase SSL recipes).
"""

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrontendSpeakerModel(nn.Module):
    """frontend: flax module wav/feats -> frame features (or a tuple whose
    last element is used, or a tuple of hidden states for MFA heads);
    speaker_model: frame features -> embedding."""
    frontend: Any
    speaker_model: Any
    frozen_frontend: bool = False
    feed_all_hidden: bool = False  # adapter-MFA heads take all states

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False):
        feats = self.frontend(x, train=train and not self.frozen_frontend)
        if self.frozen_frontend:
            feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)
        if self.feed_all_hidden:
            return self.speaker_model(feats, mask=mask, train=train)
        if isinstance(feats, (tuple, list)):
            feats = feats[-1]
        return self.speaker_model(feats, mask=mask, train=train)
