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
