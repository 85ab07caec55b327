"""Speaker-model registry.

Mirrors the name-prefix dispatch of the reference
(wespeaker/models/speaker_model.py:31-62): `get_speaker_model(name)` returns a
constructor `f(feat_dim=..., embed_dim=..., **kwargs) -> flax.linen.Module`.
"""

from wespeaker_tpu.models import ecapa_tdnn

_MODULES = [ecapa_tdnn]


def _register_extra():
    global _MODULES
    # Imported lazily so partially-built model families don't break the core.
    from wespeaker_tpu.models import (  # noqa: F401
        campplus,
        eres2net,
        gemini_dfresnet,
        redimnet,
        redimnet2,
        repvgg,
        res2net,
        resnet,
        samresnet,
        tdnn,
        w2vbert_adapter_mfa,
        whisper_PMFA,
        xi_vector,
    )
    _MODULES = [ecapa_tdnn, resnet, tdnn, campplus, eres2net, res2net,
                gemini_dfresnet, samresnet, xi_vector, repvgg,
                whisper_PMFA, redimnet2, redimnet, w2vbert_adapter_mfa]


def get_speaker_model(model_name: str):
    try:
        _register_extra()
    except ImportError:
        pass
    for mod in _MODULES:
        fn = getattr(mod, model_name, None)
        if fn is not None:
            return fn
    raise KeyError(f"unknown speaker model: {model_name}")
