"""Pallas pooling kernels vs jnp references (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wespeaker_tpu.ops.pooling_pallas import (fused_masked_stats,
                                              fused_softmax_stats)


def test_fused_softmax_stats_matches_reference():
    rng = np.random.default_rng(0)
    b, t, d = 3, 50, 256
    logits = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    mean, std = fused_softmax_stats(logits, x, interpret=True)

    w = jax.nn.softmax(logits, axis=1)
    want_mean = jnp.sum(w * x, axis=1)
    want_var = jnp.sum(w * x**2, axis=1) - want_mean**2
    want_std = jnp.sqrt(jnp.clip(want_var, min=1e-7))
    np.testing.assert_allclose(np.asarray(mean), np.asarray(want_mean),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(std), np.asarray(want_std),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_masked_stats_matches_reference(with_mask):
    rng = np.random.default_rng(1)
    b, t, d = 2, 40, 128
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    mask = None
    if with_mask:
        m = np.ones((b, t), np.float32)
        m[0, 25:] = 0.0
        m[1, 33:] = 0.0
        mask = jnp.asarray(m)
    mean, std = fused_masked_stats(x, mask, ddof=1, interpret=True)

    from wespeaker_tpu.models.pooling_layers import _std
    want_mean, want_std = _std(x, mask, ddof=1)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(want_mean),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(std), np.asarray(want_std),
                               atol=1e-5, rtol=1e-5)


def test_fused_res2_module_matches_standard():
    """ECAPA with fused_res2=True (Pallas, interpret on CPU) must equal the
    standard flax path on identical variables."""
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN

    std = ECAPA_TDNN(channels=64, feat_dim=24, embed_dim=32)
    fused = ECAPA_TDNN(channels=64, feat_dim=24, embed_dim=32,
                       fused_res2=True)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(3, 60, 24)).astype(np.float32))
    variables = std.init(jax.random.PRNGKey(0), x)
    # randomize BN stats so folding is actually exercised
    import jax as _j
    bs = jax.tree_util.tree_map(
        lambda a: a + 0.1 * _j.random.normal(_j.random.PRNGKey(1), a.shape),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    want = np.asarray(std.apply(variables, x))
    got = np.asarray(fused.apply(variables, x))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_fused_res2_chain_bf16_close_to_f32():
    """bf16 kernel path (one concatenated-tap matmul per step) must track
    the exact fp32 kernel within bf16 tolerance."""
    from wespeaker_tpu.ops.res2_pallas import fused_res2_chain

    rng = np.random.default_rng(2)
    b, t, c, scale = 3, 40, 64, 8
    width = c // scale
    nums = scale - 1
    x = rng.normal(size=(b, t, c)).astype(np.float32)
    kernels = (rng.normal(size=(nums, 3, width, width)) * 0.2).astype(
        np.float32)
    biases = rng.normal(size=(nums, width)).astype(np.float32) * 0.1
    bn_scale = 1.0 + 0.1 * rng.normal(size=(nums, width)).astype(np.float32)
    bn_shift = 0.1 * rng.normal(size=(nums, width)).astype(np.float32)

    want = np.asarray(fused_res2_chain(
        jnp.asarray(x), jnp.asarray(kernels), jnp.asarray(biases),
        jnp.asarray(bn_scale), jnp.asarray(bn_shift), 2, interpret=True))
    got = np.asarray(fused_res2_chain(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(kernels, jnp.bfloat16),
        jnp.asarray(biases), jnp.asarray(bn_scale), jnp.asarray(bn_shift),
        2, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.15)
    # means should agree much tighter than per-element bf16 noise
    assert abs(got.mean() - want.mean()) < 2e-3


def test_fused_se_block_module_matches_standard():
    """ECAPA with fused_block=True (whole-SE-Res2-block Pallas kernel,
    interpret on CPU) must equal the standard flax path on identical
    variables — the parameter trees are interchangeable by construction."""
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN

    std = ECAPA_TDNN(channels=512, feat_dim=24, embed_dim=32,
                     global_context_att=True)
    fused = ECAPA_TDNN(channels=512, feat_dim=24, embed_dim=32,
                       global_context_att=True, fused_block=True)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 40, 24)).astype(np.float32))
    variables = std.init(jax.random.PRNGKey(0), x)
    import jax as _j
    bs = jax.tree_util.tree_map(
        lambda a: a + 0.1 * _j.random.normal(_j.random.PRNGKey(1), a.shape),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    want = np.asarray(std.apply(variables, x))
    got = np.asarray(fused.apply(variables, x))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
    # masked (padded-bucket) call: fused kernel counts pad frames out of
    # the SE squeeze exactly like the standard masked path
    m = np.ones((2, 40), np.float32)
    m[0, 25:] = 0.0
    mask = jnp.asarray(m)
    want_m = np.asarray(std.apply(variables, x, mask=mask))
    got_m = np.asarray(fused.apply(variables, x, mask=mask))
    np.testing.assert_allclose(got_m, want_m, atol=5e-5, rtol=1e-4)


def test_fused_se_block_kernel_matches_reference():
    """Direct kernel (interpret) vs the jnp fallback, f32 and bf16."""
    from wespeaker_tpu.ops.se_block_pallas import (block_kernel_fits,
                                                   fused_se_res2_block,
                                                   se_res2_block_reference)

    assert block_kernel_fits(200, 512, 8)
    assert not block_kernel_fits(200, 64, 8)       # width 8: fallback
    assert not block_kernel_fits(12000, 512, 8)    # long bucket: fallback
    assert not block_kernel_fits(None, 512, 8)     # symbolic t: fallback

    rng = np.random.default_rng(4)
    b, t, c, scale = 3, 30, 512, 8
    width = c // scale
    nums = scale - 1
    args = dict(
        x=rng.normal(size=(b, t, c)).astype(np.float32),
        w1=(rng.normal(size=(c, c)) * 0.04).astype(np.float32),
        b1=0.1 * rng.normal(size=(c,)).astype(np.float32),
        s1=(1 + 0.1 * rng.normal(size=(c,))).astype(np.float32),
        h1=0.1 * rng.normal(size=(c,)).astype(np.float32),
        cw=(rng.normal(size=(nums, 3, width, width)) * 0.1
            ).astype(np.float32),
        cb=0.1 * rng.normal(size=(nums, width)).astype(np.float32),
        cs=(1 + 0.1 * rng.normal(size=(nums, width))).astype(np.float32),
        ch=0.1 * rng.normal(size=(nums, width)).astype(np.float32),
        w2=(rng.normal(size=(c, c)) * 0.04).astype(np.float32),
        b2=0.1 * rng.normal(size=(c,)).astype(np.float32),
        s2=(1 + 0.1 * rng.normal(size=(c,))).astype(np.float32),
        h2=0.1 * rng.normal(size=(c,)).astype(np.float32),
        sw1=(rng.normal(size=(c, 128)) * 0.08).astype(np.float32),
        sb1=0.1 * rng.normal(size=(128,)).astype(np.float32),
        sw2=(rng.normal(size=(128, c)) * 0.08).astype(np.float32),
        sb2=0.1 * rng.normal(size=(c,)).astype(np.float32),
    )
    jargs = {k: jnp.asarray(v) for k, v in args.items()}
    want = np.asarray(se_res2_block_reference(**jargs, dilation=3))
    got = np.asarray(fused_se_res2_block(**jargs, dilation=3,
                                         interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    bargs = {k: (jnp.asarray(v, jnp.bfloat16) if k == "x" else jnp.asarray(v))
             for k, v in args.items()}
    got16 = np.asarray(fused_se_res2_block(**bargs, dilation=3,
                                           interpret=True)
                       ).astype(np.float32)
    # bf16 per-element noise, but the residual structure keeps it bounded
    np.testing.assert_allclose(got16, want, atol=0.25, rtol=0.25)
    assert abs(got16.mean() - want.mean()) < 5e-3


@pytest.mark.parametrize("glob,with_mask,channels",
                         [(True, False, 512), (True, True, 512),
                          (False, False, 512), (True, False, 1024)])
def test_fused_mfa_astp_module_matches_standard(glob, with_mask, channels):
    """ECAPA with fused_tail=True (MFA+ASTP Pallas kernel, interpret on
    CPU) must equal the standard flax tail on identical variables.
    channels=1024 exercises the non-square MFA conv (3072 -> 1536)."""
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN

    std = ECAPA_TDNN(channels=channels, feat_dim=24, embed_dim=32,
                     global_context_att=glob)
    fused = ECAPA_TDNN(channels=channels, feat_dim=24, embed_dim=32,
                       global_context_att=glob, fused_tail=True)
    x = jnp.asarray(np.random.default_rng(5).normal(
        size=(2, 40, 24)).astype(np.float32))
    variables = std.init(jax.random.PRNGKey(0), x)
    import jax as _j
    bs = jax.tree_util.tree_map(
        lambda a: a + 0.1 * _j.random.normal(_j.random.PRNGKey(1), a.shape),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    mask = None
    if with_mask:
        m = np.ones((2, 40), np.float32)
        m[0, 25:] = 0.0
        mask = jnp.asarray(m)
    want = np.asarray(std.apply(variables, x, mask=mask))
    got = np.asarray(fused.apply(variables, x, mask=mask))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    # frame-feat path must bypass the fused tail on the same tree
    ff_std = np.asarray(std.apply(variables, x, return_frame_feat=True))
    ff_fused = np.asarray(fused.apply(variables, x, return_frame_feat=True))
    np.testing.assert_allclose(ff_fused, ff_std, atol=1e-6)


def test_fused_res2_kernel_matches_reference_chain():
    """Direct kernel (interpret) vs the jnp fallback at an MXU-friendly
    width — the shapes the guard routes to the kernel on TPU."""
    from wespeaker_tpu.ops.res2_pallas import (fused_res2_chain, kernel_fits,
                                               res2_chain_reference)

    assert kernel_fits(200, 512, 8)
    assert not kernel_fits(200, 64, 8)      # width 8: fallback
    assert not kernel_fits(12000, 512, 8)   # long bucket: fallback

    rng = np.random.default_rng(3)
    b, t, c, scale = 2, 30, 512, 8
    width = c // scale
    nums = scale - 1
    x = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    kernels = jnp.asarray((rng.normal(size=(nums, 3, width, width)) * 0.1
                           ).astype(np.float32))
    biases = jnp.asarray(0.1 * rng.normal(size=(nums, width)
                                          ).astype(np.float32))
    s = jnp.asarray(1 + 0.1 * rng.normal(size=(nums, width)
                                         ).astype(np.float32))
    h = jnp.asarray(0.1 * rng.normal(size=(nums, width)).astype(np.float32))
    want = np.asarray(res2_chain_reference(x, kernels, biases, s, h, 3))
    got = np.asarray(fused_res2_chain(x, kernels, biases, s, h, 3,
                                      interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("glob", [True, False])
def test_mfa_astp_train_vjp_matches_autodiff(glob):
    """Differentiable fused tail: Pallas forward (interpret) + structured
    backward must match value and jax.grad of the jnp reference."""
    from wespeaker_tpu.ops.mfa_astp_vjp import (mfa_astp_train,
                                                mfa_astp_train_reference)

    rng = np.random.default_rng(7)
    b, t, c, a = 5, 30, 128, 128
    d = 3 * c

    def mk(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.3)

    x2, x3, x4 = mk(b, t, c), mk(b, t, c), mk(b, t, c)
    wm, bm = mk(3 * c, d), mk(d)
    k1 = mk(3 * d if glob else d, a)
    b1, k2, b2 = mk(a), mk(a, d), mk(d)
    args = (x2, x3, x4, wm, bm, k1, b1, k2, b2)

    out = mfa_astp_train(*args, glob, True)
    want = mfa_astp_train_reference(*args, glob=glob)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-4, rtol=2e-4)

    # scalar loss mixing both halves so mean and std grads are exercised
    g_w = jnp.asarray(rng.normal(size=(b, 2 * d)).astype(np.float32))

    def loss_fused(*a_):
        return jnp.sum(mfa_astp_train(*a_, glob, True) * g_w)

    def loss_ref(*a_):
        return jnp.sum(mfa_astp_train_reference(*a_, glob=glob) * g_w)

    grads = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    wants = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    names = ["x2", "x3", "x4", "wm", "bm", "k1", "b1", "k2", "b2"]
    for nm, got, ref in zip(names, grads, wants):
        if nm == "b2":
            # analytically zero (softmax shift invariance): the custom bwd
            # returns exact zeros, autodiff returns f32 noise
            assert float(np.max(np.abs(np.asarray(got)))) == 0.0
            assert float(np.max(np.abs(np.asarray(ref)))) < 1e-2
            continue
        scale = max(float(np.max(np.abs(np.asarray(ref)))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(got) / scale, np.asarray(ref) / scale,
            atol=5e-4, rtol=5e-4, err_msg=f"grad mismatch: {nm}")


def test_fused_tail_train_module_matches_standard(monkeypatch):
    """ECAPA training forward+grads with the differentiable fused tail
    (interpret on CPU) must match autodiff through the same math on
    identical variables — embeddings, param grads, BN batch-stat updates.

    The oracle is the fused module with the kernel swapped for the jnp
    reference (identical split-accumulation order): comparing against the
    concat-based standard path instead is flaky, because a borderline relu
    element can legitimately flip between the two f32 accumulation orders
    and jump a full grad column. The standard-vs-fused *value* equivalence
    is covered by test_fused_mfa_astp_module_matches_standard."""
    import wespeaker_tpu.ops.mfa_astp_vjp as V
    from wespeaker_tpu.models.ecapa_tdnn import ECAPA_TDNN

    kw = dict(channels=128, feat_dim=24, embed_dim=32,
              global_context_att=True)
    fused = ECAPA_TDNN(**kw, fused_tail=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 50, 24)).astype(np.float32))
    variables = fused.init(jax.random.PRNGKey(0), x[:1, :32])
    params, stats = variables["params"], variables["batch_stats"]
    gw = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))

    def loss(p):
        emb, mut = fused.apply({"params": p, "batch_stats": stats}, x,
                               train=True, mutable=["batch_stats"])
        return jnp.sum(emb * gw), (emb, mut["batch_stats"])

    (l_f, (emb_f, bs_f)), g_f = jax.value_and_grad(
        loss, has_aux=True)(params)

    def ref_op(x2, x3, x4, wm, bm, k1, b1, k2, b2, glob, interpret):
        return V.mfa_astp_train_reference(x2, x3, x4, wm, bm, k1, b1, k2,
                                          b2, glob=glob)

    monkeypatch.setattr(V, "mfa_astp_train", ref_op)
    (l_s, (emb_s, bs_s)), g_s = jax.value_and_grad(
        loss, has_aux=True)(params)

    np.testing.assert_allclose(np.asarray(emb_f), np.asarray(emb_s),
                               atol=1e-4, rtol=1e-4)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_f))
    for path, ref in jax.tree_util.tree_leaves_with_path(g_s):
        got = flat_f[path]
        name = jax.tree_util.keystr(path)
        if "pool/linear2/bias" in name:
            # analytically zero (softmax shift invariance); custom bwd is
            # exact, autodiff is f32 noise
            assert float(np.max(np.abs(np.asarray(got)))) == 0.0
            continue
        scale = max(float(np.max(np.abs(np.asarray(ref)))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(got) / scale, np.asarray(ref) / scale,
            atol=1e-3, rtol=1e-3, err_msg=f"grad mismatch at {name}")
    for path, ref in jax.tree_util.tree_leaves_with_path(bs_s):
        got = dict(jax.tree_util.tree_leaves_with_path(bs_f))[path]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-4)


def test_fused_cam_dense_block_module_matches_standard():
    """CAMPPlus with the fused dense-block kernel (interpret on CPU) must
    equal the standard flax path on identical variables — unmasked and
    masked padded buckets."""
    from wespeaker_tpu.models.campplus import CAMPPlus

    std = CAMPPlus(feat_dim=40, embed_dim=32, fused_blocks=False)
    fused = CAMPPlus(feat_dim=40, embed_dim=32, fused_blocks=True)
    rng = np.random.default_rng(0)
    x224 = jnp.asarray(rng.normal(size=(2, 224, 40)).astype(np.float32))
    variables = std.init(jax.random.PRNGKey(0), x224[:, :64])
    import jax as _j
    bs = jax.tree_util.tree_map(
        lambda a: a + 0.1 * _j.random.normal(_j.random.PRNGKey(1), a.shape),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}

    def cos(a, b):
        return float(np.mean(np.sum(a * b, -1) / np.maximum(
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-9)))

    # T'=112 is sublane-aligned: no in-kernel pad path, tight bound
    want = np.asarray(std.apply(variables, x224))
    got = np.asarray(fused.apply(variables, x224))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)
    # T'=110 exercises the alignment-pad path (iota-masked context +
    # zeroed pad-frame y); the masked-mean reformulation reorders f32
    # sums, which compounds through 52 dense layers -> cosine-level bound
    x220 = x224[:, :220]
    want = np.asarray(std.apply(variables, x220))
    got = np.asarray(fused.apply(variables, x220))
    assert cos(got, want) > 0.99999, cos(got, want)
    np.testing.assert_allclose(got, want, atol=3e-3, rtol=3e-3)
    # masked padded bucket: pad frames excluded from the global and
    # segment context means exactly like the standard path
    m = np.ones((2, 220), np.float32)
    m[0, 150:] = 0.0
    mask = jnp.asarray(m)
    want_m = np.asarray(std.apply(variables, x220, mask=mask))
    got_m = np.asarray(fused.apply(variables, x220, mask=mask))
    assert cos(got_m, want_m) > 0.99999, cos(got_m, want_m)
    np.testing.assert_allclose(got_m, want_m, atol=3e-3, rtol=3e-3)


def test_fused_inv_bottleneck_stage_module_matches_standard():
    """Gemini_DF_ResNet with the fused whole-stage kernel (interpret on
    CPU) must equal the standard flax path on identical variables — both
    at a sublane-aligned T and at an unaligned T (in-kernel pad path,
    where boundary depthwise taps must read zeros exactly like XLA's SAME
    padding)."""
    from wespeaker_tpu.models.gemini_dfresnet import Gemini_DF_ResNet

    kw = dict(depths=(1, 1, 2, 1), dims=(8, 8, 16, 16, 32), feat_dim=16,
              embed_dim=24)
    std = Gemini_DF_ResNet(**kw)
    fused = Gemini_DF_ResNet(**kw, fused_stages=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 64, 16)).astype(np.float32))
    variables = std.init(jax.random.PRNGKey(0), x)
    import jax as _j
    bs = jax.tree_util.tree_map(
        lambda a: a + 0.1 * _j.random.normal(_j.random.PRNGKey(1), a.shape),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}

    want = np.asarray(std.apply(variables, x))
    got = np.asarray(fused.apply(variables, x))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)

    # unaligned T' (stride-2 time downsample halves T): T=58 -> stage T'
    # of 58/29 exercises the tpad path in both stages
    x2 = x[:, :58]
    want = np.asarray(std.apply(variables, x2))
    got = np.asarray(fused.apply(variables, x2))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)

    # the two paths must share one checkpoint: identical param tree
    vf = fused.init(jax.random.PRNGKey(0), x)
    a = jax.tree_util.tree_structure(variables["params"])
    b = jax.tree_util.tree_structure(vf["params"])
    assert a == b, (a, b)


def test_fused_inv_bottleneck_kernel_matches_reference():
    """Kernel (interpret) vs the plain-jnp reference on raw stacked
    weights, batch not divisible by BLOCK_B."""
    from wespeaker_tpu.ops.inv_bottleneck_pallas import (
        fused_inv_bottleneck_stage, inv_bottleneck_stage_reference)

    rng = np.random.default_rng(3)
    L, F, T, C = 2, 5, 24, 8
    x = jnp.asarray(rng.normal(size=(3, F, T, C)).astype(np.float32))
    args = [jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3)
            for s in [(L, C, 4 * C), (L, 4 * C), (L, 4 * C),
                      (L, 3, 3, 4 * C), (L, 4 * C), (L, 4 * C),
                      (L, 4 * C, C), (L, C), (L, C)]]
    want = np.asarray(inv_bottleneck_stage_reference(x, *args))
    got = np.asarray(fused_inv_bottleneck_stage(x, *args, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_fused_inv_bottleneck_roll_tap_matches_reference(monkeypatch):
    """The production TPU tap path (use_roll=True: pltpu.roll on the T
    axis + wrap mask) — forced in interpret mode via WESPEAKER_INVBN_ROLL=1
    so CI exercises the exact logic real-TPU runs use, not just the
    _shift2d fallback (round-4 advisor finding)."""
    from wespeaker_tpu.ops.inv_bottleneck_pallas import (
        fused_inv_bottleneck_stage, inv_bottleneck_stage_reference)

    monkeypatch.setenv("WESPEAKER_INVBN_ROLL", "1")
    jax.clear_caches()  # use_roll is baked in at trace time
    rng = np.random.default_rng(5)
    L, F, T, C = 2, 5, 21, 8  # T%16 != 0: exercises the pad+wrap-mask edge
    x = jnp.asarray(rng.normal(size=(3, F, T, C)).astype(np.float32))
    args = [jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3)
            for s in [(L, C, 4 * C), (L, 4 * C), (L, 4 * C),
                      (L, 3, 3, 4 * C), (L, 4 * C), (L, 4 * C),
                      (L, 4 * C, C), (L, C), (L, C)]]
    want = np.asarray(inv_bottleneck_stage_reference(x, *args))
    got = np.asarray(fused_inv_bottleneck_stage(x, *args, interpret=True))
    jax.clear_caches()  # don't leak roll-mode traces to other tests
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
