"""SSL subsystem tests: DINO loss/centering/EMA behavior, MoCo queue +
training step, SimCLR loss, multi-crop batching."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN
from wespeaker_tpu.ssl import contrastive as C
from wespeaker_tpu.ssl import dino as D
from wespeaker_tpu.ssl.dataset import dino_batch, multi_crop


def test_cosine_scheduler_shape():
    fn = D.cosine_scheduler(1.0, 0.1, epochs=10, iters_per_epoch=10,
                            warmup_epochs=2)
    assert float(fn(0)) == pytest.approx(0.0)
    assert float(fn(20)) == pytest.approx(1.0, abs=1e-5)
    assert float(fn(99)) == pytest.approx(0.1, abs=0.01)


def test_dino_loss_prefers_matching_distributions():
    rng = np.random.default_rng(0)
    k, b = 16, 4
    block = rng.normal(size=(b, k)).astype(np.float32)
    s_match = jnp.asarray(np.concatenate([block, block, block]))  # 3 crops
    t = jnp.asarray(np.concatenate([block, block]) * 5)  # 2 teacher crops
    center = jnp.zeros((1, k))
    loss_match = D.dino_loss(s_match, t, center, 0.04, 3, 2)
    s_rand = jnp.asarray(rng.normal(size=(3 * b, k)).astype(np.float32))
    loss_rand = D.dino_loss(s_rand, t, center, 0.04, 3, 2)
    assert float(loss_match) < float(loss_rand)


def test_dino_train_step_runs_and_ema_tracks():
    feat_dim, embed_dim, out_dim = 24, 32, 64
    backbone = ECAPA_TDNN(channels=32, feat_dim=feat_dim, embed_dim=embed_dim)
    head = D.DINOHead(out_dim=out_dim, hidden_dim=64, bottleneck_dim=16)
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=0.1, momentum=0.9)
    state = D.init_dino_state(backbone, head, tx, jax.random.PRNGKey(0),
                              feat_dim=feat_dim, embed_dim=embed_dim)
    apply_fn = D.make_apply_fn(backbone, head)
    cfg = D.DINOConfig(out_dim=out_dim, n_global=2, n_local=2,
                       freeze_last_layer_iters=1)
    step = jax.jit(D.make_dino_train_step(
        apply_fn, tx,
        D.cosine_scheduler(0.1, 0.01, 2, 5, 1),
        lambda s: 0.99,
        D.teacher_temp_schedule(0.04, 0.07, 2, 5), cfg))

    rng = np.random.default_rng(0)
    batch = {
        "global_feat": jnp.asarray(
            rng.normal(size=(2 * 4, 50, feat_dim)).astype(np.float32)),
        "local_feat": jnp.asarray(
            rng.normal(size=(2 * 4, 20, feat_dim)).astype(np.float32)),
    }
    s0_student = state.student
    losses = []
    for _ in range(3):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert float(jnp.abs(state.center).sum()) > 0  # center updated
    # teacher moved toward student but isn't equal to init
    d_teacher = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.abs(l).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, state.teacher,
                               s0_student), 0.0)
    assert d_teacher > 0
    # frozen last layer at step 0: teacher last_layer_v must follow only
    # via EMA of an unchanged-then-changed student; just check finite
    assert int(state.step) == 3


def test_moco_step_and_queue():
    feat_dim, embed_dim = 16, 24
    backbone = ECAPA_TDNN(channels=32, feat_dim=feat_dim, embed_dim=embed_dim)
    variables = backbone.init(jax.random.PRNGKey(0),
                              jnp.zeros((2, 20, feat_dim)))

    def encode_fn(params, stats, feats, train):
        if train:
            emb, mut = backbone.apply({"params": params,
                                       "batch_stats": stats}, feats,
                                      train=True, mutable=["batch_stats"])
            return emb, mut["batch_stats"]
        emb = backbone.apply({"params": params, "batch_stats": stats}, feats,
                             train=False)
        return emb, stats

    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=0.05, momentum=0.9)
    K = 32
    state = C.MoCoState(
        step=jnp.zeros((), jnp.int32),
        query_params=variables["params"],
        key_params=jax.tree_util.tree_map(jnp.array, variables["params"]),
        batch_stats=variables["batch_stats"],
        key_stats=jax.tree_util.tree_map(jnp.array,
                                         variables["batch_stats"]),
        queue=C.l2norm(jax.random.normal(jax.random.PRNGKey(1),
                                         (K, embed_dim))),
        queue_ptr=jnp.zeros((), jnp.int32),
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(2))
    step = jax.jit(C.make_moco_train_step(encode_fn, tx, lambda s: 0.05))
    rng = np.random.default_rng(0)
    batch = {
        "q_feat": jnp.asarray(rng.normal(size=(8, 40, feat_dim)).astype(
            np.float32)),
        "k_feat": jnp.asarray(rng.normal(size=(8, 40, feat_dim)).astype(
            np.float32)),
    }
    q0 = np.asarray(state.queue).copy()
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert int(state.queue_ptr) == 8
    assert not np.allclose(np.asarray(state.queue)[:8], q0[:8])
    np.testing.assert_allclose(np.asarray(state.queue)[8:], q0[8:], atol=1e-6)


def test_simclr_loss_separates():
    rng = np.random.default_rng(0)
    b, d = 8, 16
    base = rng.normal(size=(b, d)).astype(np.float32)
    views_aligned = jnp.asarray(np.concatenate([base, base + 0.01]))
    views_random = jnp.asarray(rng.normal(size=(2 * b, d)).astype(np.float32))
    assert float(C.simclr_loss(views_aligned)) < \
        float(C.simclr_loss(views_random))


def test_multi_crop_batching():
    rng = np.random.default_rng(0)
    samples = [{"key": f"u{i}",
                "wav": rng.normal(size=8000).astype(np.float32)}
               for i in range(4)]
    crops = multi_crop(iter(samples), global_len=3200, local_len=1600,
                       n_global=2, n_local=3, rng=rng)
    batches = list(dino_batch(crops, batch_size=4))
    assert len(batches) == 1
    assert batches[0]["global_wav"].shape == (8, 3200)
    assert batches[0]["local_wav"].shape == (12, 1600)


def test_dino_train_step_amp_bf16():
    """AMP DINO step: compute_dtype=bf16 runs, loss tracks f32 step on the
    first iteration, state dtypes stay f32."""
    feat_dim, embed_dim, out_dim = 24, 32, 64
    backbone = ECAPA_TDNN(channels=32, feat_dim=feat_dim, embed_dim=embed_dim)
    head = D.DINOHead(out_dim=out_dim, hidden_dim=64, bottleneck_dim=16)
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=0.1, momentum=0.9)
    apply_fn = D.make_apply_fn(backbone, head)
    cfg = D.DINOConfig(out_dim=out_dim, n_global=2, n_local=2,
                       freeze_last_layer_iters=0)
    rng = np.random.default_rng(1)
    batch = {
        "global_feat": jnp.asarray(
            rng.normal(size=(2 * 4, 50, feat_dim)).astype(np.float32)),
        "local_feat": jnp.asarray(
            rng.normal(size=(2 * 4, 20, feat_dim)).astype(np.float32)),
    }
    losses = {}
    for name, dt in [("f32", jnp.float32), ("amp", jnp.bfloat16)]:
        state = D.init_dino_state(backbone, head, tx, jax.random.PRNGKey(0),
                                  feat_dim=feat_dim, embed_dim=embed_dim)
        step = jax.jit(D.make_dino_train_step(
            apply_fn, tx, D.cosine_scheduler(0.1, 0.01, 2, 5, 1),
            lambda s: 0.99, D.teacher_temp_schedule(0.04, 0.07, 2, 5), cfg,
            compute_dtype=dt))
        state, m = step(state, batch)
        losses[name] = float(m["loss"])
        for leaf in jax.tree_util.tree_leaves(state.student):
            assert leaf.dtype == jnp.float32
    np.testing.assert_allclose(losses["amp"], losses["f32"], rtol=0.02)


def test_ssl_featurize_spec_aug():
    """make_ssl_featurize honors dataset_args.spec_aug (reference
    ssl/dataset/dataset.py:160-163) with the reference's `prob` key; keys
    advance per call so views get independent masks."""
    import numpy as np

    from wespeaker_tpu.frontend import FbankConfig
    from wespeaker_tpu.ssl.featurize import make_ssl_featurize

    w = np.random.default_rng(0).uniform(
        -0.5, 0.5, (2, 16000)).astype(np.float32)
    cfg = FbankConfig(num_mel_bins=40, dither=0.0)
    plain = make_ssl_featurize(cfg, {"spec_aug": False}, 0)
    auged = make_ssl_featurize(
        cfg, {"spec_aug": True,
              "spec_aug_args": {"prob": 1.0, "num_t_mask": 2,
                                "num_f_mask": 2, "max_t": 10, "max_f": 8}}, 0)
    base = np.asarray(plain(w))
    a1, a2 = np.asarray(auged(w)), np.asarray(auged(w))
    assert base.shape == a1.shape
    assert (a1 == 0).sum() > 0  # masks applied (prob=1)
    assert not np.array_equal(a1, a2)  # per-call keys advance
