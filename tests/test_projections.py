"""Parity of margin projection heads and schedulers vs the reference."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.conftest import reference_available
from tests.torch_ref import import_reference_module  # noqa: F401
from wespeaker_tpu.models import projections as proj
from wespeaker_tpu.utils import schedulers as sched

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def _ref_projections():
    return import_reference_module("wespeaker.models.projections")


def _run_parity(ref_head, jax_head, margin, B=16, D=100, C=200, seed=0,
                returns_loss=False):
    import torch
    rng = np.random.default_rng(seed)
    embed = rng.normal(size=(B, D)).astype(np.float32)
    label = rng.integers(0, C, size=(B,))

    if hasattr(ref_head, "update"):
        ref_head.update(margin)
    with torch.no_grad():
        out = ref_head(torch.from_numpy(embed), torch.from_numpy(label))
    if returns_loss:
        want_logits, want_loss = out[0].numpy(), float(out[1])
    else:
        want_logits = out.numpy()

    variables = jax_head.init(jax.random.PRNGKey(0), jnp.zeros((2, D)),
                              jnp.zeros((2,), jnp.int32))
    sd = {k: v.detach().numpy() for k, v in ref_head.state_dict().items()}
    from wespeaker_tpu.utils.torch_compat import torch_to_flax_variables
    variables = torch_to_flax_variables(sd, variables)
    got = jax_head.apply(variables, jnp.asarray(embed), jnp.asarray(label),
                         margin)
    if returns_loss:
        got_logits, got_loss = np.asarray(got[0]), float(got[1])
        np.testing.assert_allclose(got_loss, want_loss, rtol=1e-4)
    else:
        got_logits = np.asarray(got)
    np.testing.assert_allclose(got_logits, want_logits, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("margin", [0.0, 0.2])
@pytest.mark.parametrize("easy", [False, True])
def test_arc_margin(margin, easy):
    rp = _ref_projections()
    ref = rp.ArcMarginProduct(100, 200, scale=32.0, margin=0.0,
                              easy_margin=easy).eval()
    _run_parity(ref, proj.ArcMarginProduct(100, 200, scale=32.0,
                                           easy_margin=easy), margin)


@pytest.mark.parametrize("margin", [0.0, 0.2])
def test_add_margin(margin):
    rp = _ref_projections()
    ref = rp.AddMarginProduct(100, 200, scale=32.0, margin=0.0).eval()
    _run_parity(ref, proj.AddMarginProduct(100, 200, scale=32.0), margin)


@pytest.mark.parametrize("do_lm", [False, True])
def test_arc_margin_intertopk_subcenter(do_lm):
    rp = _ref_projections()
    ref = rp.ArcMarginProduct_intertopk_subcenter(
        100, 200, scale=32.0, margin=0.0, easy_margin=False, K=3, mp=0.06,
        k_top=5, do_lm=do_lm).eval()
    _run_parity(ref, proj.ArcMarginIntertopkSubcenter(
        100, 200, scale=32.0, K=3, mp=0.06, k_top=5, do_lm=do_lm), 0.2)


def test_sphereface2():
    rp = _ref_projections()
    ref = rp.SphereFace2(100, 200, scale=32.0, margin=0.0).eval()
    _run_parity(ref, proj.SphereFace2(100, 200, scale=32.0), 0.2,
                returns_loss=True)


def test_lr_schedulers_match_reference():
    rs = import_reference_module("wespeaker.utils.schedulers")

    ref = rs.ExponentialDecrease(None, 6, 500, 0.6, 0.1, warm_up_epoch=2,
                                 scale_ratio=4)
    mine = sched.ExponentialDecrease(6, 500, 0.6, 0.1, warm_up_epoch=2,
                                     scale_ratio=4)
    for it in [0, 100, 999, 1500, 2999]:
        want = ref.step_return_lr(it)
        np.testing.assert_allclose(float(mine(it)), want, rtol=1e-5)

    ref = rs.TriAngular2(None, 6, 500, 0.6, 0.1, warm_up_epoch=2,
                         scale_ratio=4, cycle_step=2,
                         reduce_lr_diff_ratio=0.5)
    mine = sched.TriAngular2(6, 500, 0.6, 0.1, warm_up_epoch=2, scale_ratio=4,
                             cycle_step=2, reduce_lr_diff_ratio=0.5)
    # note: the reference mutates self.max_lr across calls; evaluate in
    # increasing-iteration order exactly as the training loop does
    for it in [0, 100, 600, 1200, 2400, 2999]:
        want = ref.step_return_lr(it)
        np.testing.assert_allclose(float(mine(it)), want, rtol=1e-5)


def test_margin_scheduler_matches_reference():
    import types
    rs = import_reference_module("wespeaker.utils.schedulers")

    class _Proj:
        margin = 0.0

        def update(self, margin):
            self.margin = margin

    model = types.SimpleNamespace(projection=_Proj())
    ref = rs.MarginScheduler(model, epoch_iter=100, increase_start_epoch=2,
                             fix_start_epoch=5, initial_margin=0.0,
                             final_margin=0.2, update_margin=True,
                             increase_type="exp")
    mine = sched.MarginScheduler(epoch_iter=100, increase_start_epoch=2,
                                 fix_start_epoch=5, initial_margin=0.0,
                                 final_margin=0.2, increase_type="exp")
    for it in range(0, 600, 7):
        ref.step(it)
        np.testing.assert_allclose(float(mine(it)), ref.get_margin(),
                                   atol=1e-6)
