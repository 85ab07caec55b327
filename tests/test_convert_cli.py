"""End-to-end reference-checkpoint conversion: a torch wespeaker model's
saved .pt goes through bin/convert_torch_ckpt and must reproduce the torch
embeddings through our extract path — the "switch from the reference"
migration test."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

from tests.conftest import reference_available
from wespeaker_tpu.bin.convert_torch_ckpt import convert
from wespeaker_tpu.bin.extract import load_model_for_eval


@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_convert_torch_checkpoint_end_to_end(tmp_path):
    from tests.torch_ref import import_reference_module

    rmod = import_reference_module("wespeaker.models.ecapa_tdnn")
    torch.manual_seed(0)
    ref = rmod.ECAPA_TDNN_GLOB_c512(feat_dim=40, embed_dim=64).eval()
    # randomize BN running stats so eval-mode conversion is non-trivial
    for m in ref.modules():
        if hasattr(m, "running_mean") and m.running_mean is not None:
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.6, 1.4)
    pt = tmp_path / "avg_model.pt"
    torch.save(ref.state_dict(), pt)

    configs = {
        "model": "ECAPA_TDNN_GLOB_c512",
        "model_args": {"feat_dim": 40, "embed_dim": 64},
    }
    import yaml
    cfg_path = tmp_path / "conf.yaml"
    cfg_path.write_text(yaml.safe_dump(configs))
    out = tmp_path / "model.ckpt"
    convert(str(cfg_path), str(pt), str(out))

    built, variables = load_model_for_eval(configs, str(out))
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(3, 120, 40)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(feats))
        want = (want[-1] if isinstance(want, tuple) else want).numpy()
    got = np.asarray(built.model.apply(variables, jnp.asarray(feats),
                                       train=False))
    for w, g in zip(want, got):
        cos = np.dot(w, g) / (np.linalg.norm(w) * np.linalg.norm(g))
        assert cos > 0.9999, cos
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
