"""Train-step behavior: loss decreases, schedules ramp, and the step runs
sharded over an 8-device ('data','model') mesh with identical numerics."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from wespeaker_tpu.frontend import FbankConfig
from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
from wespeaker_tpu.models.projections import ArcMarginProduct
from wespeaker_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from wespeaker_tpu.train import init_train_state, make_train_step
from wespeaker_tpu.utils.schedulers import ExponentialDecrease, MarginScheduler


def _setup(feat_dim=40, embed_dim=64, num_class=8, channels=64):
    model = ECAPA_TDNN(channels=channels, feat_dim=feat_dim,
                       embed_dim=embed_dim)
    projection = ArcMarginProduct(embed_dim, num_class, scale=32.0)
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=0.1, momentum=0.9)
    lr_fn = ExponentialDecrease(2, 50, 0.1, 0.01, warm_up_epoch=1)
    margin_fn = MarginScheduler(50, 1, 2, 0.0, 0.2)
    step_fn = make_train_step(model, projection, tx, lr_fn, margin_fn,
                              fbank_cfg=FbankConfig(num_mel_bins=feat_dim,
                                                    dither=0.0))
    state = init_train_state(model, projection, tx, jax.random.PRNGKey(0),
                             feat_dim=feat_dim, embed_dim=embed_dim)
    return step_fn, state


def _batch(b=8, n=16000, num_class=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "wav": jnp.asarray(rng.uniform(-0.5, 0.5, (b, n)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, num_class, b, dtype=np.int32)),
    }


def test_loss_decreases_and_schedules_ramp():
    step_fn, state = _setup()
    step_jit = jax.jit(step_fn)
    batch = _batch()
    losses, lrs, margins = [], [], []
    for _ in range(8):
        state, m = step_jit(state, batch)
        losses.append(float(m["loss"]))
        lrs.append(float(m["lr"]))
        margins.append(float(m["margin"]))
    assert losses[-1] < losses[0]
    assert lrs[1] != lrs[0]  # iteration-granular schedule
    assert int(state.step) == 8
    assert np.isfinite(losses).all()


def test_sharded_step_matches_single_device():
    step_fn, state = _setup()
    batch = _batch(b=8)

    single = jax.jit(step_fn, device=jax.devices("cpu")[0])
    s1, m1 = single(state, batch)

    mesh = make_mesh()  # 8 virtual CPU devices on the data axis
    rep = replicated(mesh)
    state_sharded = jax.device_put(state, rep)
    batch_sharded = shard_batch(mesh, batch)
    sharded = jax.jit(step_fn, out_shardings=(rep, rep))
    s2, m2 = sharded(state_sharded, batch_sharded)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    mesh2 = make_mesh(model=2)
    assert mesh2.devices.shape == (4, 2)


def test_amp_bf16_step_converges_with_f32_master_weights():
    """True AMP: forward sees bf16 params (MXU path) but the optimizer
    keeps f32 master weights and f32 batch stats; loss must track the
    f32 step closely and still decrease."""
    model = ECAPA_TDNN(channels=64, feat_dim=40, embed_dim=64)
    projection = ArcMarginProduct(64, 8, scale=32.0)
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=0.1, momentum=0.9)
    lr_fn = ExponentialDecrease(2, 50, 0.1, 0.01, warm_up_epoch=1)
    margin_fn = MarginScheduler(50, 1, 2, 0.0, 0.2)
    fb = FbankConfig(num_mel_bins=40, dither=0.0)
    batch = _batch()

    losses = {}
    for name, dt in [("f32", jnp.float32), ("amp", jnp.bfloat16)]:
        step_fn = make_train_step(model, projection, tx, lr_fn, margin_fn,
                                  fbank_cfg=fb, compute_dtype=dt)
        state = init_train_state(model, projection, tx, jax.random.PRNGKey(0),
                                 feat_dim=40, embed_dim=64)
        step_jit = jax.jit(step_fn)
        ls = []
        for _ in range(6):
            state, m = step_jit(state, batch)
            ls.append(float(m["loss"]))
        losses[name] = ls
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(state.batch_stats):
            assert leaf.dtype == jnp.float32

    # first step identical up to bf16 rounding; later steps drift as the
    # toy task collapses toward zero loss, so only require convergence
    np.testing.assert_allclose(losses["amp"][0], losses["f32"][0], rtol=0.02)
    np.testing.assert_allclose(losses["amp"][1], losses["f32"][1], rtol=0.1)
    assert losses["amp"][-1] < 0.5 * losses["amp"][0]
