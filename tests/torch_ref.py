"""Helpers for golden-parity tests against the public reference torch models.

We import the reference repo (read-only, torch-only modules) purely to
generate golden outputs; nothing from it is copied into wespeaker_tpu.
"""

import numpy as np

from tests.conftest import add_reference_to_path


def import_reference_module(module_name, max_stubs=20):
    """Import a reference module, stubbing unavailable third-party modules
    (silero_vad, torchaudio, kaldiio, kaldi_io, ...) that the reference
    package __init__ drags in but the target module never really uses."""
    import importlib
    import sys
    import types

    add_reference_to_path()
    # Synthesize the wespeaker package skeletons so the heavyweight
    # package __init__ (CLI + silero/kaldiio deps) never executes.
    for pkg, path in (("wespeaker", "/root/reference/wespeaker"),
                      ("wespeaker.models", "/root/reference/wespeaker/models"),
                      ("wespeaker.frontend",
                       "/root/reference/wespeaker/frontend"),
                      ("wespeaker.utils", "/root/reference/wespeaker/utils")):
        if pkg not in sys.modules or not getattr(
                sys.modules[pkg], "__synthetic__", False):
            m = types.ModuleType(pkg)
            m.__path__ = [path]
            m.__synthetic__ = True
            sys.modules[pkg] = m
    for _ in range(max_stubs):
        before = set(sys.modules)
        try:
            return importlib.import_module(module_name)
        except ModuleNotFoundError as e:
            name = e.name
            if name is None or name.startswith("wespeaker"):
                raise
            # roll back modules left partially initialized by the failed
            # attempt (e.g. torch's deep import chain), then stub and retry
            for mod in set(sys.modules) - before:
                del sys.modules[mod]
            stub = types.ModuleType(name)
            stub.__path__ = []  # make it a package so submodule imports work

            def _stub_getattr(attr):  # PEP 562
                if attr.startswith("__"):  # keep introspection honest
                    raise AttributeError(attr)
                return types.SimpleNamespace()

            stub.__getattr__ = _stub_getattr
            sys.modules[name] = stub
            parent = name.rsplit(".", 1)
            if len(parent) == 2 and parent[0] in sys.modules:
                setattr(sys.modules[parent[0]], parent[1], stub)
        except (ImportError, AttributeError) as e:
            raise RuntimeError(f"cannot import reference models: {e}")
    raise RuntimeError("too many stub modules required")


def import_reference_get_speaker_model():
    return import_reference_module(
        "wespeaker.models.speaker_model").get_speaker_model


def build_reference_model(model_name, seed=0, randomize_bn_stats=True,
                          **kwargs):
    """Instantiate a reference torch model with randomized params (and
    randomized BN running stats so that eval-mode parity actually exercises
    the running-stat conversion path). Returns (model.eval(), state_dict)."""
    add_reference_to_path()
    import torch
    get_speaker_model = import_reference_get_speaker_model()

    torch.manual_seed(seed)
    model = get_speaker_model(model_name)(**kwargs)
    gen = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        if randomize_bn_stats:
            for m in model.modules():
                if hasattr(m, "running_mean") and m.running_mean is not None:
                    m.running_mean.copy_(
                        torch.randn(m.running_mean.shape, generator=gen) * 0.1)
                    m.running_var.copy_(
                        1.0 + 0.5 * torch.rand(m.running_var.shape, generator=gen))
    model.eval()
    return model


def reference_embedding(model, x_btf):
    """Run the reference model; per the framework contract the last element
    of a tuple output is the embedding (wespeaker/utils/executor.py:60-61)."""
    import torch

    with torch.no_grad():
        out = model(torch.from_numpy(np.asarray(x_btf, np.float32)))
    if isinstance(out, (tuple, list)):
        out = out[-1]
    return out.numpy()
