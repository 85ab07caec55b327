"""Feature frontends.

Registry mirrors the reference frontend_class_dict
(wespeaker/frontend/__init__.py:21-27): 'fbank' is the host/device DSP path;
neural frontends (s3prl/whisper_encoder/w2vbert/tfmel) are flax modules
attached to the speaker model and run on device inside the train loop.
"""

from wespeaker_tpu.frontend.fbank import (  # noqa: F401
    EPSILON,
    FbankConfig,
    apply_cmvn,
    compute_fbank,
    make_mel_banks,
    make_window,
)
from wespeaker_tpu.frontend.tfmel import TFMelConfig, tfmel  # noqa: F401


def get_frontend(name: str):
    """DSP frontends by name; neural frontends (whisper_encoder, ...) are
    flax modules imported from their own submodules."""
    if name == "fbank":
        return compute_fbank
    if name == "tfmel":
        return tfmel
    if name == "whisper_encoder":
        from wespeaker_tpu.frontend.whisper_encoder import (
            WhisperEncoderFrontend)
        return WhisperEncoderFrontend
    if name in ("wavlm", "s3prl"):
        from wespeaker_tpu.frontend.wavlm import WavLMWithFeaturizer
        return WavLMWithFeaturizer
    if name == "w2vbert":
        from wespeaker_tpu.frontend.w2vbert import W2VBertFrontend
        return W2VBertFrontend
    raise KeyError(f"unknown frontend {name}")
