"""Per-view featurization for the SSL trainers: device fbank + CMVN +
optional spec-aug (reference ssl/dataset/dataset.py:140-163 applies
fbank -> cmvn -> spec_aug per crop on the host; here the whole chain runs
jit-compiled on device)."""

import jax

from wespeaker_tpu.frontend import apply_cmvn, compute_fbank
from wespeaker_tpu.train.train_step import AugConfig, spec_aug_batch


def make_ssl_featurize(fbank_cfg, dataset_args, seed: int):
    """(B, N) wav -> (B, T, F) features; spec-aug keys advance per call."""
    aug = None
    if dataset_args.get("spec_aug", False):
        aug = AugConfig.from_spec_aug_args(
            dataset_args.get("spec_aug_args", {}))

    def feats(w):
        return apply_cmvn(compute_fbank(w * (1 << 15), fbank_cfg))

    if aug is None:
        return jax.jit(feats)

    fn = jax.jit(lambda w, key: spec_aug_batch(key, feats(w), aug))
    state = {"key": jax.random.PRNGKey(seed ^ 0x5EED)}

    def featurize(w):
        state["key"], sub = jax.random.split(state["key"])
        return fn(w, sub)

    return featurize
