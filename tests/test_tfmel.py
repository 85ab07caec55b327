"""TFMel frontend parity vs the reference torch implementation."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.conftest import reference_available
from wespeaker_tpu.frontend.tfmel import TFMelConfig, tfmel

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


@pytest.mark.parametrize("preemph", [True, False])
def test_tfmel_matches_reference(preemph):
    import torch
    from tests.torch_ref import import_reference_module
    rmod = import_reference_module("wespeaker.frontend.tfmel")

    ref = rmod.TFMelBanks(do_spec_aug=False, norm_signal=False,
                          do_preemph=preemph).eval()
    rng = np.random.default_rng(0)
    wav = rng.uniform(-0.5, 0.5, (2, 32000)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(wav)).numpy()  # (B, M, T)

    got = np.asarray(tfmel(jnp.asarray(wav),
                           TFMelConfig(do_preemph=preemph)))  # (B, T, M)
    got = got.transpose(0, 2, 1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_tfmel_norm_signal_and_aug_shapes():
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 16000)).astype(np.float32))
    out = tfmel(wav, TFMelConfig(norm_signal=True))
    assert out.shape[0] == 3 and out.shape[2] == 80
    # per-bin time mean removed
    np.testing.assert_allclose(np.asarray(out).mean(axis=1), 0.0, atol=1e-4)
    aug = tfmel(wav, TFMelConfig(), train=True, key=jax.random.PRNGKey(0))
    assert aug.shape == out.shape
    assert (np.asarray(aug) == 0).sum() > 0  # some masked cells
