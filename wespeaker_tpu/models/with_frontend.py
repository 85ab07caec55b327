"""Composite neural-frontend + speaker-model module.

The reference attaches non-fbank frontends to the model and runs them inside
the train loop (wespeaker/bin/train.py:116-124, utils/executor.py:42-48),
then applies CMVN to the frontend *output* (executor.py:50-54). Here the
composite is itself a flax module so the whole thing jits and shards as one
program; `frozen` stops gradients into the frontend (stage-1 of the 3-phase
SSL recipes).

Masked eval: when a frame-validity `mask` is given (padded bucket batches),
the input is zeroed on padded frames, the frontend masks its attention, and
the mask — downsampled by the frontend's `time_stride` — flows into CMVN and
pooling, reproducing the reference's whole-utterance batch=1 extraction.
"""

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from wespeaker_tpu.frontend.fbank import apply_cmvn


class FrontendSpeakerModel(nn.Module):
    """frontend: flax module wav/feats -> frame features (or a tuple whose
    last element is used, or a tuple of hidden states for MFA heads);
    speaker_model: frame features -> embedding."""
    frontend: Any
    speaker_model: Any
    frozen_frontend: bool = False
    feed_all_hidden: bool = False  # adapter-MFA heads take all states
    normalize: bool = True  # CMVN on frontend output (executor.py:50-54)

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False):
        f_train = train and not self.frozen_frontend
        if mask is not None:
            feats = self.frontend(x, mask=mask, train=f_train)
            ref = feats[-1] if isinstance(feats, (tuple, list)) else feats
            if hasattr(self.frontend, "downsample_mask"):
                # exact conv-stack length arithmetic (e.g. WavLM's 7-conv
                # 320x downsampling, where ::stride would overcount)
                out_mask = self.frontend.downsample_mask(mask, ref.shape[1])
            else:
                stride = getattr(self.frontend, "time_stride", 1)
                out_mask = mask[:, ::stride] if stride > 1 else mask
        else:
            feats = self.frontend(x, train=f_train)
            out_mask = None
        if self.frozen_frontend:
            feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)
        if self.feed_all_hidden:
            # frontends returning (hidden_states_tuple, last): the MFA head
            # consumes the hidden-state tuple (w2vbert.py:150-198 contract)
            if (isinstance(feats, tuple) and len(feats) == 2
                    and isinstance(feats[0], (tuple, list))):
                feats = feats[0]
            if out_mask is not None and len(feats):
                out_mask = out_mask[:, :feats[0].shape[1]]
            return self.speaker_model(feats, mask=out_mask, train=train)
        if isinstance(feats, (tuple, list)):
            feats = feats[-1]
        if out_mask is not None:
            out_mask = out_mask[:, :feats.shape[1]]
        if self.normalize:
            feats = apply_cmvn(feats, mask=out_mask)
        return self.speaker_model(feats, mask=out_mask, train=train)